"""Round-12 streaming-twin tests (r11 verdict items 4+5): the near-dup
CLUSTERING finalize over accumulated LSH pair state — the one
dedup-family member that had no incremental twin — driven through the
12-batch mid-stream-restart protocol, plus the first THROUGHPUT-scale
soak of a foreachBatch twin (x10 data, rows/s + state growth recorded
in SCALE.md rather than asserted here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_realtime4_spark import tables as T
from gmall_flink_realtime4_spark.plans.catalog import queries

from tests.test_round11_ext import SF, _rows, _soak_with_restart


def test_incremental_clusters_soak_restart(spark, tmp_path):
    """12-batch soak of the incremental MinHash-LSH index with a
    mid-stream restart, finalized to near-dup CLUSTERS: connected
    components over the union of all emitted pairs must equal the
    one-shot `llm_dedup_clusters` EXACTLY — including components whose
    edges arrived in different micro-batches and components straddling
    the restart seam (doc_id % 2 splits co-paired docs across the two
    stream halves by construction, so cross-seam edges exist). Also
    re-finalizes over the emissions WITH a simulated replay duplicate
    (one batch's rows unioned twice) to pin CC's replay idempotence."""
    from gmall_flink_realtime4_spark.streaming.incremental import (
        clusters_finalize,
        incremental_minhash_pairs,
    )

    expected = _rows(
        queries()["llm_dedup_clusters"](spark, SF), ["doc_id", "cluster_id"]
    )

    docs = T.load(spark, SF, "documents")
    state = str(tmp_path / "mh_state")
    sink = str(tmp_path / "mh_pairs")

    def accumulate(bdf, bid):
        incremental_minhash_pairs(spark, bdf, state, bid).write.mode(
            "overwrite"
        ).parquet(f"{sink}/batch_id={bid}")

    _soak_with_restart(spark, tmp_path, docs, accumulate)

    pairs_all = spark.read.parquet(sink).drop("batch_id")
    got = _rows(clusters_finalize(pairs_all), ["doc_id", "cluster_id"])
    assert got == expected and expected

    # replay tolerance: a crash-replayed batch re-emits its pairs; CC
    # over edges-with-duplicates must be unchanged (set semantics)
    some_batch = spark.read.parquet(sink).select(
        F.min("batch_id").alias("b")
    ).collect()[0]["b"]
    dup = spark.read.parquet(sink).filter(F.col("batch_id") == some_batch)
    replayed = pairs_all.unionByName(dup.drop("batch_id"))
    got_replay = _rows(
        clusters_finalize(replayed), ["doc_id", "cluster_id"]
    )
    assert got_replay == expected
