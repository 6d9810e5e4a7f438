"""One-session A/B: two-phase top-k SALT 32 vs 8 across the ANN family.

Flips llm_queries.ANN_TOPK_SALT and llm_pipeline_queries.TOPK_SALT between
interleaved reps in ONE session (both helpers read the module global at
plan-build time). Times the noop sink (guide §1.4) after one untimed warm
rep per arm; prints min-of-N per arm per query. Motivation: r12 verdict
item 2 — phase 1's (qid, vec_id % 32) window costs a 256-partition-group
exchange at tiny SF; SALT=8 keeps the removed 8-way ceiling (8 -> 64-way)
at a quarter of the slice count.

Usage: python tools/exp_topk_salt_ab.py <sf_dir> [reps] [query...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.plans import llm_pipeline_queries as LP  # noqa: E402
from gmall_flink_realtime4_spark.plans import llm_queries as LQ  # noqa: E402
from gmall_flink_realtime4_spark.plans.catalog import queries  # noqa: E402
from gmall_flink_realtime4_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "llm_ann_cosine_topk",
    "llm_ann_ivf",
    "llm_ann_ivf_trained_recall",
    "llm_ann_pq_adc_recall",
    "llm_lsh_tuning_curve",
]


def set_salt(v: int) -> None:
    LQ.ANN_TOPK_SALT = v
    LP.TOPK_SALT = v


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or DEFAULT
    spark = get_spark(app_name="exp_topk_salt_ab")
    reg = queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"topk_salt_ab:{name}")
        fn = reg[name]
        times = {"s32": [], "s8": []}
        for arm, v in (("s32", 32), ("s8", 8)):
            set_salt(v)
            run_once(spark, fn, sf_dir)  # untimed warm rep per arm
        for _ in range(reps):
            for arm, v in (("s32", 32), ("s8", 8)):
                set_salt(v)
                times[arm].append(run_once(spark, fn, sf_dir))
        set_salt(32)
        b32, b8 = min(times["s32"]), min(times["s8"])
        out[name] = {
            "s32_best": round(b32, 3),
            "s8_best": round(b8, 3),
            "delta_pct": round(100.0 * (b8 - b32) / b32, 1),
            "s32": [round(t, 3) for t in times["s32"]],
            "s8": [round(t, 3) for t in times["s8"]],
        }
        print(
            f"# {name}: s32={b32:.3f} s8={b8:.3f} "
            f"({out[name]['delta_pct']:+.1f}%)",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
