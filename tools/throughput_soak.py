"""Throughput-scale soak of a foreachBatch incremental twin (r12,
verdict item 5): every restart soak in tests/ runs at fixture scale
(sf0.001, 5k docs); this drives the incremental MinHash-LSH twin over
x-N-replicated documents in ~12 real Structured Streaming micro-batches
and reports per-batch wall time, docs/s, emitted pairs, and cumulative
state-table growth — the first VOLUME evidence for the foreachBatch
family (correctness at this scale is separately pinned: the union of
emissions equals the one-shot batch query by the r11 soak protocol, and
clusters_finalize over the emissions equals llm_dedup_clusters).

Usage: python tools/throughput_soak.py [sf_dir] [n_batches]
  sf_dir default /tmp/spark_graft_scale_x10 (create via
  `python tools/scale_sanity.py 10` first); prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.session import get_spark  # noqa: E402
from gmall_flink_realtime4_spark.streaming.incremental import (  # noqa: E402
    incremental_minhash_pairs,
)
from gmall_flink_realtime4_spark.streaming.runner import (  # noqa: E402
    empty_stream_dir,
    stream_parquet_source,
)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_x10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("throughput_soak")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    work = tempfile.mkdtemp(prefix="tp_soak_")
    try:
        src = empty_stream_dir(work)
        # n_batches files -> n_batches micro-batches (1 file/trigger);
        # round-robin repartition keeps batch sizes ~equal
        docs.repartition(n_batches).write.mode("append").parquet(src)
        state = f"{work}/state"
        sink = f"{work}/pairs"
        batches: list[dict] = []

        def accumulate(bdf, bid):
            t0 = time.perf_counter()
            bdf = bdf.localCheckpoint(eager=True)  # charge the source read
            n_docs = bdf.count()
            t1 = time.perf_counter()
            out = incremental_minhash_pairs(spark, bdf, state, bid)
            out.write.mode("overwrite").parquet(f"{sink}/batch_id={bid}")
            dt = time.perf_counter() - t0
            n_pairs = spark.read.parquet(f"{sink}/batch_id={bid}").count()
            batches.append(
                {
                    "batch": bid,
                    "docs": n_docs,
                    "pairs": n_pairs,
                    "sec": round(dt, 2),
                    "docs_per_sec": round(n_docs / max(dt, 1e-9)),
                    "state_bands_bytes": _du(f"{state}/bands"),
                    "state_docs_bytes": _du(f"{state}/docs"),
                    "src_read_sec": round(t1 - t0, 2),
                }
            )
            print(
                f"# batch {bid}: {n_docs} docs, {n_pairs} pairs,"
                f" {dt:.2f}s ({n_docs / max(dt, 1e-9):.0f} docs/s),"
                f" state bands={batches[-1]['state_bands_bytes']}B"
                f" docs={batches[-1]['state_docs_bytes']}B",
                file=sys.stderr,
            )

        q = (
            stream_parquet_source(spark, src, docs.schema)
            .writeStream.foreachBatch(accumulate)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

        total_docs = sum(b["docs"] for b in batches)
        total_sec = sum(b["sec"] for b in batches)
        total_pairs = sum(b["pairs"] for b in batches)
        bands_rows = spark.read.parquet(f"{state}/bands").count()
        docs_rows = spark.read.parquet(f"{state}/docs").count()
        print(
            json.dumps(
                {
                    "twin": "incremental_minhash_pairs",
                    "sf_dir": sf_dir,
                    "n_batches": len(batches),
                    "total_docs": total_docs,
                    "total_pairs": total_pairs,
                    "total_sec": round(total_sec, 2),
                    "docs_per_sec_overall": round(
                        total_docs / max(total_sec, 1e-9)
                    ),
                    "state_bands_rows": bands_rows,
                    "state_docs_rows": docs_rows,
                    "batches": batches,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
