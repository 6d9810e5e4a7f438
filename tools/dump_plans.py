"""Dump .explain('formatted') for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [sf_dir] [query...]
  tag     suffix for the output file (before/after)
  sf_dir  defaults to /root/testdata/sf0.1
  query   default: the bench HEADLINE set
The round directory defaults to r13; override with SPARK_GRAFT_PLANS_ROUND.

The explain is captured from the UNEXECUTED frame (AdaptiveSparkPlan
isFinalPlan=false) — the static shape the judge checks claims against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.plans.catalog import queries  # noqa: E402
from gmall_flink_realtime4_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    qs = queries()
    if len(sys.argv) > 3:
        names = sys.argv[3:]
    else:
        import bench

        names = bench.HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
