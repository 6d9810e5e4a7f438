"""Streaming-incremental near-dup detection — the foreachBatch twin of
`plans.llm_scale_queries.llm_dedup_minhash_lsh`.

A production corpus grows continuously; re-running batch MinHash-LSH over
the whole corpus per ingest is O(corpus) every time. The incremental form
is O(batch x collision-rate) per micro-batch:

- STATE (parquet, one sub-directory per micro-batch id): the
  (doc_id, band, bucket) band-key table and the (doc_id, text) doc table
  of everything seen so far. Band keys are the tiny index (4 rows/doc);
  texts are retained because the exact verify needs shingles of BOTH pair
  sides — recomputed only for a batch's CANDIDATE docs (the doc state is
  semi-join-pruned by candidate ids before any tokenize/explode, so
  per-batch verify cost tracks collisions, not corpus size).
- PER BATCH: band keys of the batch docs join against state ∪ batch —
  every emitted pair has >= 1 batch side, so a pair is emitted in exactly
  one batch (the batch where its LATER doc arrives) and the union of all
  emissions equals the one-shot batch result
  (`tests/test_streaming.py::test_incremental_minhash_pairs_matches_batch`).
- RETRY SAFETY: state writes go to deterministic ``batch_id=<n>``
  sub-directories in overwrite mode, so a foreachBatch replay rewrites
  the identical bytes instead of appending duplicates (duplicated doc
  rows would silently corrupt every future pair's jaccard denominator);
  reads EXCLUDE the current batch id, so a replay that crashed between
  the two state writes heals on re-execution. Replayed batches re-emit
  the same pairs — dedup on (doc_a, doc_b) at the sink, exactly like the
  K3 MERGE sink. State existence is probed by attempting the read (never
  a driver-local os.path check — state may live on HDFS/S3).

At 100 TB the band-key state is the classic inverted index: shuffle-keyed
by (band, bucket) and bounded by 4 rows/doc; the per-batch join touches
only the buckets the batch lands in.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException

from ..operators.graph import connected_components
from ..operators.pq import argmin_codes, pq_fullint, pq_subint
from ..plans.llm_scale_queries import (
    DUP_CLUSTER_THRESHOLD_PM,
    _shingles,
    minhash_bands,
    minhash_verify,
)


def _read_state(
    spark: SparkSession, path: str, exclude_batch_id: int
) -> DataFrame | None:
    """Read a batch_id-partitioned state table, excluding the (possibly
    half-written, replayed) current batch. Probe-by-read: works on any
    Hadoop-compatible filesystem, unlike a driver-local isdir check."""
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return None  # first batch: no state yet
    return df.filter(F.col("batch_id") != exclude_batch_id).drop("batch_id")


def incremental_minhash_pairs(
    spark: SparkSession,
    docs_batch: DataFrame,
    state_dir: str,
    batch_id: int = 0,
) -> DataFrame:
    """One micro-batch step: returns the VERIFIED near-dup pairs with at
    least one side in ``docs_batch`` (same columns as the batch query),
    then writes the batch's state under its ``batch_id`` partition.
    Pass foreachBatch's batch id for replay-safe state."""
    bands_path = f"{state_dir}/bands"
    docs_path = f"{state_dir}/docs"

    batch = docs_batch.select("doc_id", "text").localCheckpoint(eager=True)
    # minhash_bands checkpoints the signature frame internally; the band
    # explode above it is cheap, so no second materialization here
    bands_b = minhash_bands(_shingles(batch))

    prev_bands = _read_state(spark, bands_path, batch_id)
    prev_docs = _read_state(spark, docs_path, batch_id)
    bands_all = (
        bands_b if prev_bands is None else prev_bands.unionByName(bands_b)
    )
    docs_all = batch if prev_docs is None else prev_docs.unionByName(batch)

    left, right = bands_b.alias("l"), bands_all.alias("r")
    # normalize pair direction, then de-dup (a new-new pair matches in
    # both orientations; a new-old pair in one) BEFORE counting bands
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") != F.col("r.doc_id")),
        )
        .select(
            F.least(F.col("l.doc_id"), F.col("r.doc_id")).alias("doc_a"),
            F.greatest(F.col("l.doc_id"), F.col("r.doc_id")).alias("doc_b"),
            F.col("l.band").alias("band"),
        )
        .distinct()
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_bands"))
        .localCheckpoint(eager=True)
    )
    # prune the doc state to candidate docs BEFORE shingling: the verify
    # cost must track collisions, not corpus size (a semi-join above the
    # shingle Generate would not push down through it)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs_cand = docs_all.join(cand_ids, "doc_id", "left_semi")
    # verify BEFORE the state writes (docs_all lazily reads the state
    # parquet) and materialize the result for the same reason
    out = minhash_verify(cand, _shingles(docs_cand)).localCheckpoint(
        eager=True
    )

    # deterministic per-batch locations, overwrite mode: a replay
    # rewrites identical bytes (idempotent), never double-appends
    bands_b.write.mode("overwrite").parquet(
        f"{bands_path}/batch_id={batch_id}"
    )
    batch.write.mode("overwrite").parquet(f"{docs_path}/batch_id={batch_id}")
    return out


def clusters_finalize(pairs_all: DataFrame) -> DataFrame:
    """Near-dup CLUSTERS from the accumulated pair state — the streaming
    finalize of `plans.llm_scale_queries.llm_dedup_clusters` (r12: the
    one dedup-family member that lacked an incremental twin).

    `incremental_minhash_pairs` already emits every verified pair exactly
    once (in its later doc's arrival batch), and pairs are EDGES — a
    union-mergeable sum-algebra: connected components is a function of
    the edge SET alone, so finalize = threshold-filter the merged
    emissions and run the identical CC operator the batch query runs.
    Cross-batch components come for free: a component whose edges arrived
    in different micro-batches (even straddling a restart) is connected
    in the merged edge set iff it is connected in the one-shot batch
    graph, because the edge sets are equal — equality pinned by
    tests/test_round12_ext.py::test_incremental_clusters_soak_restart
    through the 12-batch mid-stream-restart protocol.

    Accepts the pair emissions AS WRITTEN by the batch sink (duplicate
    edges from a crash-replayed batch are harmless: the operator
    symmetrizes + distincts internally, so CC is idempotent in replays
    — same reason the K3 MERGE sink tolerates re-emission)."""
    edges = pairs_all.filter(
        F.col("jaccard_permille") >= DUP_CLUSTER_THRESHOLD_PM
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(edges)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id")
    )


def incremental_ahash_pairs(
    spark: SparkSession,
    media_batch: DataFrame,
    state_dir: str,
    batch_id: int = 0,
) -> DataFrame:
    """Streaming-incremental IMAGE near-dup detection — the foreachBatch
    twin of `plans.round6_ext_queries.llm_multimodal_image_neardup_pairs`.

    Simpler than the text twin because the verify needs only the 48-bit
    fingerprints: STATE is just (doc_id, ahash) — no payload retention at
    all (the codec runs once per image, in its arrival batch, and the raw
    bytes never re-enter the pipeline). Per batch: fingerprint the batch
    (map-only Arrow codec), band the batch against state ∪ batch on the
    4x12-bit band keys, verify candidates with xor/bit_count. Every
    emitted pair has >= 1 batch side, so each pair is emitted exactly once
    (in its LATER doc's batch) and the union of emissions equals the
    one-shot batch query. Same replay-safe batch_id-partitioned overwrite
    state as `incremental_minhash_pairs`.
    """
    from ..plans.llm_multimodal import ahash_image
    from ..plans.round6_ext_queries import (
        AHASH_BAND_BITS,
        AHASH_BANDS,
        AHASH_HAM_MAX,
    )

    fps_path = f"{state_dir}/fps"
    fp_b = (
        ahash_image(media_batch)
        .filter(F.col("ok"))
        .select("doc_id", "ahash")
        .localCheckpoint(eager=True)
    )
    prev = _read_state(spark, fps_path, batch_id)
    fp_all = fp_b if prev is None else prev.unionByName(fp_b)

    def bands(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            "ahash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("k"),
                            F.expr(
                                f"(ahash div {1 << (AHASH_BAND_BITS * k)})"
                                f" % {1 << AHASH_BAND_BITS}"
                            ).alias("bv"),
                        )
                        for k in range(AHASH_BANDS)
                    ]
                )
            ).alias("b"),
        ).select("doc_id", "ahash", "b.k", "b.bv")

    left, right = bands(fp_b).alias("l"), bands(fp_all).alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") != F.col("r.doc_id")),
        )
        .select(
            F.least(F.col("l.doc_id"), F.col("r.doc_id")).alias("doc_a"),
            F.greatest(F.col("l.doc_id"), F.col("r.doc_id")).alias("doc_b"),
            F.least(F.col("l.ahash"), F.col("r.ahash")).alias("ha"),
            F.greatest(F.col("l.ahash"), F.col("r.ahash")).alias("hb"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(ha ^ hb)")
    out = (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= AHASH_HAM_MAX)
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            (F.col("hamming") == 0).alias("is_exact"),
        )
        .localCheckpoint(eager=True)  # materialize before the state write
    )
    fp_b.write.mode("overwrite").parquet(f"{fps_path}/batch_id={batch_id}")
    return out


def incremental_winnow_pairs(
    spark: SparkSession,
    docs_batch: DataFrame,
    state_dir: str,
    batch_id: int = 0,
) -> DataFrame:
    """Streaming-incremental winnowing near-dup candidates — the
    foreachBatch twin of `plans.round6_ext_queries.llm_winnow_fingerprints`.

    STATE is (doc_id, f) fingerprint rows plus the (doc_id, n_fp) size
    table — no payload retention (fingerprint selection runs once per doc
    in its arrival batch; text never re-enters the pipeline). Per batch:
    the batch's fingerprints join state ∪ batch, so every emitted pair has
    >= 1 batch side and is emitted exactly once, in its LATER doc's batch;
    shared_fp / n_fp_* / overlap_pm are fixed at that moment, so the union
    of emissions equals the one-shot CAPLESS batch run
    (``winnow_pairs(fp, max_df=None)``).

    The MOSS df cap is deliberately NOT applied here: the cap is
    retroactive — a fingerprint crossing ``WINNOW_MAX_DF`` as the corpus
    grows would RETRACT pairs it once supported, which an append-only
    emission stream cannot express (the A1 diff/retract pattern could; the
    honest streaming contract is capless emission + downstream re-filter).
    Same replay-safe batch_id-partitioned overwrite state as the minhash
    twin.
    """
    from ..plans.round6_ext_queries import (
        WINNOW_MIN_SHARED,
        winnow_fingerprint_rows,
    )

    fps_path = f"{state_dir}/fps"
    fp_b = winnow_fingerprint_rows(
        docs_batch.select("doc_id", "text")
    ).localCheckpoint(eager=True)
    prev = _read_state(spark, fps_path, batch_id)
    fp_all = fp_b if prev is None else prev.unionByName(fp_b)

    sizes = fp_all.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp")
    )
    left, right = fp_b.alias("l"), fp_all.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.f") == F.col("r.f"))
            & (F.col("l.doc_id") != F.col("r.doc_id")),
        )
        .select(
            F.least(F.col("l.doc_id"), F.col("r.doc_id")).alias("doc_a"),
            F.greatest(F.col("l.doc_id"), F.col("r.doc_id")).alias("doc_b"),
            F.col("l.f").alias("f"),
        )
        .distinct()  # new-new pairs match in both orientations
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
        .filter(F.col("shared_fp") >= WINNOW_MIN_SHARED)
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "n_fp", "n_fp_a"
    )
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "n_fp", "n_fp_b"
    )
    out = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            "n_fp_a",
            "n_fp_b",
            F.expr("(1000 * shared_fp) div least(n_fp_a, n_fp_b)").alias(
                "overlap_pm"
            ),
        )
        .localCheckpoint(eager=True)  # materialize before the state write
    )
    fp_b.write.mode("overwrite").parquet(f"{fps_path}/batch_id={batch_id}")
    return out


def bm25_index_partials(docs_batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One micro-batch's BM25 index contribution: the (doc_id, dl, term,
    tf) inverted-index rows for the query vocabulary (append-only — docs
    are immutable, so a doc's rows are final in its arrival batch) and
    the mergeable 1-row (n, a) corpus-stats partial. The streaming
    accumulate side of `plans.round6_ext_queries.llm_bm25_topk`."""
    from ..plans.round6_ext_queries import bm25_tf_rows

    tf = bm25_tf_rows(docs_batch)
    stats = docs_batch.select(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("a"),
    )
    return tf, stats


def bm25_finalize(
    spark: SparkSession, tf_all: DataFrame, stats_all: DataFrame
) -> DataFrame:
    """Merge accumulated index partials into the one-shot BM25 top-K:
    union'ed tf rows pass through unchanged (df is DERIVED from them, so
    no df state exists to go stale), stats partials fold by SUM. Equal to
    the batch query over the concatenated corpus
    (tests/test_round6_ext.py::test_incremental_bm25_index_matches_batch).
    """
    from ..plans.round6_ext_queries import bm25_query_frame, bm25_score_topk

    g = stats_all.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("a"),
    )
    return bm25_score_topk(
        tf_all.localCheckpoint(), g, bm25_query_frame(spark)
    )


def pq_train_partials(emb_batch: DataFrame, codebook: DataFrame) -> DataFrame:
    """One micro-batch's PQ-training contribution: the (m, cid, pos, s, n)
    sufficient statistics of a Lloyd step — component SUMS and member
    COUNTS of the batch's vectors under their nearest-codeword assignment
    against the GIVEN (broadcast) codebook. The streaming accumulate side
    of `operators.pq.pq_trained_codebook_int`.

    The codebook is an INPUT, like bm25's query frame: a Lloyd step's
    assignment depends only on (vector, current codebook), so per-batch
    partials are independent and merge by per-(m, cid, pos) ADDITION —
    the centroid mean's numerator and denominator are both sum-algebras.
    One streaming pass accumulates one step's statistics; the NEXT step
    re-broadcasts the finalized codebook (multi-step training is
    multi-pass, honestly — the batch query does the same, one
    checkpointed broadcast per iteration). s as decimal(28,0): the same
    overflow headroom as the batch trainer (~4e21 at 1e12 members)."""
    assign = argmin_codes(pq_subint(pq_fullint(emb_batch)), codebook)
    return (
        assign.select(
            "m", "cid", F.posexplode(F.col("xint")).alias("pos", "xi")
        )
        .groupBy("m", "cid", "pos")
        .agg(
            F.sum(F.col("xi").cast("decimal(28,0)")).alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


def pq_train_finalize(parts: DataFrame) -> DataFrame:
    """Merge accumulated training partials into the trained codebook
    (m, cid, qarr): fold s and n by SUM per (m, cid, pos) — exactly the
    one map-combined hash agg the batch trainer runs — then the floored
    integer mean and the position-sorted array assembly. Equal to
    `pq_trained_codebook_int` over the concatenated corpus
    (tests/test_round11_ext.py::test_incremental_pq_training_soak_restart).
    """
    comp = parts.groupBy("m", "cid", "pos").agg(
        F.sum("s").alias("s"), F.sum("n").alias("n")
    )
    return (
        comp.select("m", "cid", "pos", F.expr("s div n").alias("q"))
        .groupBy("m", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "q"))),
                lambda sq: sq.q,
            ).alias("qarr")
        )
    )
