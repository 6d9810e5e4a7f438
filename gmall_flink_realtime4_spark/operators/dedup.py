"""Dedup operators (SURVEY.md §2.5 A1/A8).

The reference implements two recurring stateful dedups with keyed Flink
state; here each has a batch-deterministic form (window functions /
aggregation — usable under the DuckDB oracle) and a streaming form
(dropDuplicates under watermark — state auto-evicted).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def dedup_upserts(
    df: DataFrame,
    id_cols: Sequence[str],
    order_col: str | None = None,
    streaming: bool = False,
) -> DataFrame:
    """A1 — net out re-emitted upsert rows, keeping one row per id.

    Reference: DwsTradeSkuOrderWindow.java:77-118 keeps MapState of last-seen
    amounts per order_detail_id and emits deltas so duplicates cancel out.
    Spark-first: keep the FIRST row per id (duplicates of an upsert stream
    carry the same final amounts once left-join enrichment is append-mode,
    SURVEY §2.5 A1 note). Batch: row_number over (id ORDER BY order_col)
    for a deterministic keeper; streaming: dropDuplicates (requires a
    watermark upstream for state eviction, W4).
    """
    if streaming or order_col is None:
        return df.dropDuplicates(list(id_cols))
    # total order: order_col first, every remaining column as tie-break —
    # two rows with equal id AND equal order_col but different payload
    # must still pick the same keeper under any partitioning/arrival order
    rest = [c for c in df.columns if c not in id_cols and c != order_col]
    w = Window.partitionBy(*id_cols).orderBy(order_col, *rest)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_within_watermark(
    df: DataFrame, id_cols: Sequence[str]
) -> DataFrame:
    """A1 with the reference's state TTL (W4) — duplicates are only netted
    out while their key's state is alive.

    Reference: DwsTradeSkuOrderWindow.java:77-118 keeps the last-seen
    amounts per order_detail_id under a 30 s TTL — re-emissions arrive
    within seconds, so bounded state suffices. Spark twin:
    ``dropDuplicatesWithinWatermark`` — state for a key is dropped once the
    watermark passes its event time + delay, giving O(watermark-window)
    state instead of O(stream). Requires a watermark upstream; duplicates
    farther apart than the watermark delay are NOT deduped (exactly the
    TTL semantics).
    """
    return df.dropDuplicatesWithinWatermark(list(id_cols))


def first_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Deterministic first-row-per-key (batch)."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_today(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    streaming: bool = False,
) -> DataFrame:
    """A8 — keep each key's first event per day ("今日首次", uv/uu dedup).

    Reference: keyed ValueState lastVisitDate compared with today
    (DwsTrafficVcChArIsNewPageViewWindow.java:61-105,
    DwsUserUserLoginWindow.java:73-107, DwsTradeCartAddUuWindow.java:76-97).
    Batch: min-ts row per (key, day); streaming: dropDuplicates on
    (key, day) under watermark (1-day state TTL falls out of the watermark).
    """
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("__day")
    with_day = df.withColumn("__day", day)
    if streaming:
        return with_day.dropDuplicates([key, "__day"]).drop("__day")
    return first_per_key(with_day, [key, "__day"], ts_col).drop("__day")
