"""Tumbling-window aggregation helper (SURVEY.md §2.5 A2-A5, §2.6).

Only tumbling windows exist in the reference (10 s / 5 s / 1 h / 480 min);
every DWS app emits stt/edt (window bounds) + cur_date. The reference's
cur_date uses processing time (System.currentTimeMillis, F-date4) — here it
derives from the window end for determinism (documented deviation,
SURVEY §7).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_event_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """W1 — bounded out-of-orderness watermark, applied ONCE per stream,
    BEFORE any stateful operator (dedup/join/window) so their state is
    evicted by it. Casts TIMESTAMP_NTZ (the batch-determinism carrier) to
    TIMESTAMP — value-preserving under the engine's pinned UTC session tz.
    Spark disallows redefining a watermark downstream, so pipelines call
    this at the source boundary and pass watermark=None to tumble()."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, delay)


def tumble(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[Column | str] = (),
    aggs: Sequence[Column] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window groupBy emitting stt/edt/cur_date + keys + aggs.

    Batch and streaming share this plan; pass ``watermark`` (e.g.
    "5 seconds") for the streaming twin (W1 bounded out-of-orderness —
    reference delays: 15 s topic_db, 5 s most DWS, 3 s/2 s traffic).
    Un-keyed calls mirror windowAll (A5) without the parallelism-1
    bottleneck: Spark still runs distributed partial aggregation (A9).
    """
    if watermark is not None:
        df = with_event_watermark(df, ts_col, watermark)
    w = F.window(ts_col, duration).alias("w")
    out = df.groupBy(w, *keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("stt"),
        F.col("w.end").alias("edt"),
        F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("cur_date"),
        *[c for c in out.columns if c != "w"],
    )
