"""Streaming-incremental near-dup detection — the foreachBatch twin of
`plans.llm_scale_queries.llm_dedup_minhash_lsh`.

A production corpus grows continuously; re-running batch MinHash-LSH over
the whole corpus per ingest is O(corpus) every time. The incremental form
is O(batch x collision-rate) per micro-batch:

- STATE (parquet, append-only): the (doc_id, band, bucket) band-key table
  and the (doc_id, text) doc table of everything seen so far. Band keys
  are the tiny index (4 rows/doc); texts are retained because the exact
  verify needs shingles of BOTH pair sides, recomputed only for the
  candidate docs of a batch (semi-join prune — the stored-shingle
  alternative trades that recompute for ~50x more state).
- PER BATCH: band keys of the batch docs join against state ∪ batch —
  every emitted pair has >= 1 batch side, so a pair is emitted in exactly
  one batch (the batch where its LATER doc arrives) and the union of all
  emissions equals the one-shot batch result
  (`tests/test_streaming.py::test_incremental_minhash_pairs_matches_batch`).
- Exactly-once across retries: both state appends happen AFTER the output
  frame is materialized, and batch_fn runs under foreachBatch's
  checkpointed batch ids (the runner's upsert pattern; a re-delivered
  batch with the same docs would re-emit the same pairs — dedup on
  (doc_a, doc_b) at the sink, exactly like the K3 MERGE sink).

At 100 TB the band-key state is the classic inverted index: shuffle-keyed
by (band, bucket) and bounded by 4 rows/doc; the per-batch join touches
only the buckets the batch lands in.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..plans.llm_scale_queries import _shingles, minhash_bands, minhash_verify


def incremental_minhash_pairs(
    spark: SparkSession, docs_batch: DataFrame, state_dir: str
) -> DataFrame:
    """One micro-batch step: returns the VERIFIED near-dup pairs with at
    least one side in ``docs_batch`` (same columns as the batch query),
    then appends the batch to the band-key and doc state tables."""
    bands_path = os.path.join(state_dir, "bands")
    docs_path = os.path.join(state_dir, "docs")

    batch = docs_batch.select("doc_id", "text").localCheckpoint(eager=True)
    bands_b = minhash_bands(_shingles(batch)).localCheckpoint(eager=True)

    if os.path.isdir(bands_path):
        bands_all = spark.read.parquet(bands_path).unionByName(bands_b)
        docs_all = spark.read.parquet(docs_path).unionByName(batch)
    else:
        bands_all, docs_all = bands_b, batch

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
    # verify BEFORE the state append (docs_all lazily reads the state
    # parquet — appending first would double-count the batch), and
    # materialize the result for the same reason
    out = minhash_verify(cand, _shingles(docs_all)).localCheckpoint(eager=True)

    bands_b.write.mode("append").parquet(bands_path)
    batch.write.mode("append").parquet(docs_path)
    return out
