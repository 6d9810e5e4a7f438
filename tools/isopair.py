"""Isolated warm-pair timing: one query, one codebase, one fresh session.

The SCALE.md arbitration methodology in executable form: start a FRESH
JVM/session, run the bench-identical query-neutral warm-up (scan + shuffle
hash-agg + broadcast join + Arrow worker spin-up), one untimed rep of the
query itself, then N timed reps; print min/median so an old-vs-new pair of
invocations (alternated, same machine window) reads as a controlled
comparison rather than a sweep-adjacency artifact.

Usage: python tools/isopair.py <repo_dir> <sf_dir> <query> [reps=5]
Prints one JSON line: {"query", "repo", "sf_dir", "reps": [...], "best",
"median", "load1": <1-min load avg before the session exists>}.

CAVEAT (measured r13, dq_referential_integrity): the timed action is
count(), the bench-identical methodology — but for a query whose plan is
a UNION OF GLOBAL AGGREGATES, count() lets the optimizer answer from the
one-row-per-branch cardinality without computing the aggregate VALUES
(old dq_ref read 1.3 s at x30 under count() vs ~6 s under the noop sink).
For such shapes, arbitrate with a noop-sink A/B instead; count() numbers
on them are only comparable to other count() numbers of the SAME shape.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    repo, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    load1 = os.getloadavg()[0]  # read BEFORE the JVM exists (r7 bench rule)
    sys.path.insert(0, repo)
    import pyspark.sql.functions as F

    from gmall_flink_realtime4_spark.plans.catalog import queries
    from gmall_flink_realtime4_spark.session import get_spark

    spark = get_spark("isopair")
    qs = queries()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        li.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .join(F.broadcast(nat), F.col("l_suppkey") % 25 == F.col("n_nationkey"))
        .count()
    )
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()
    qs[name](spark, sf_dir).count()  # untimed first-plan rep (codegen)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "query": name,
                "repo": repo,
                "sf_dir": sf_dir,
                "reps": times,
                "best": min(times),
                "median": statistics.median(times),
                "load1": round(load1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
