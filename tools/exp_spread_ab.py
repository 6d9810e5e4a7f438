"""One-session A/B: loader spread Exchange ON vs OFF, per headline query.

Flips ``tables.load.__defaults__`` (and the three adapters') between reps so
both variants run in the SAME session, interleaved (spread burst noise lands
on both arms). Times the noop sink (guide §1.4) after one untimed warm rep
per arm; prints min-of-N per arm per query. This measures "universal
spread=False" — a regression here means at least one of the query's load
sites needs the spread (heavy map-side compute), not that none do.

Usage: python tools/exp_spread_ab.py <sf_dir> [reps] [query...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark import tables as T  # noqa: E402
from gmall_flink_realtime4_spark.plans.catalog import queries  # noqa: E402
from gmall_flink_realtime4_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "dws_trade_sku_order_window",
    "dwd_trade_order_detail",
    "dwd_trade_order_pay_suc_detail",
    "dws_trade_province_order_window",
    "dws_traffic_vc_ch_ar_is_new_page_view_window",
    "dws_user_user_login_window",
    "dwd_base_log_page",
    "llm_dedup_exact",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_minhash_lsh",
    "llm_ann_cosine_topk",
    "llm_ann_ivf",
    "llm_dedup_embedding_cells",
    "llm_dedup_containment_lsh",
    "llm_corpus_final",
    "llm_multimodal_decode",
    "llm_dedup_simhash",
    "dws_sliding_window_events",
    "dws_session_window_events",
    "dws_user_event_funnel",
]


def set_spread(on: bool) -> None:
    T.load.__defaults__ = (on,)
    T.order_info.__defaults__ = (on,)
    T.order_detail.__defaults__ = (on,)
    T.events_log.__defaults__ = (on,)


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or HEADLINE
    spark = get_spark(app_name="exp_spread_ab")
    reg = queries()
    if names == ["REST"]:  # every registered query not in the headline set
        names = [n for n in reg if n not in HEADLINE]
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"spread_ab:{name}")
        fn = reg[name]
        times = {"on": [], "off": []}
        # untimed warm rep per arm
        for arm, on in (("on", True), ("off", False)):
            set_spread(on)
            run_once(spark, fn, sf_dir)
        for _ in range(reps):
            for arm, on in (("on", True), ("off", False)):
                set_spread(on)
                times[arm].append(run_once(spark, fn, sf_dir))
        set_spread(True)
        on_b, off_b = min(times["on"]), min(times["off"])
        out[name] = {
            "on_best": round(on_b, 3),
            "off_best": round(off_b, 3),
            "delta_pct": round(100.0 * (off_b - on_b) / on_b, 1),
            "on": [round(t, 3) for t in times["on"]],
            "off": [round(t, 3) for t in times["off"]],
        }
        print(
            f"# {name}: on={on_b:.3f} off={off_b:.3f} "
            f"({out[name]['delta_pct']:+.1f}%)",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
