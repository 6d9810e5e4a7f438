"""Join operators (SURVEY.md §2.4).

The reference's three dim-enrichment strategies (uncached map, Redis
sync-cache, Redis+async — DwsTradeSkuOrderWindow* variants, J5/J6) collapse
into ONE Spark mapping: a chain of broadcast hash joins. Caching, async I/O
and timeouts vanish — the dim snapshot ships to every executor once per
batch.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: Column,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """J3 — time-bounded equi join.

    Reference: DwdTradeOrderPaySucDetail.java:66-87 —
    ``p.row_time BETWEEN od.row_time - 15 min AND od.row_time + 5 s``.
    The time-range condition bounds state in streaming mode exactly like
    Flink's interval join (Spark requires it for stream-stream joins, W9).
    lower/upper are interval expressions, e.g. "interval 15 minutes".
    """
    cond = (
        key
        & (F.col(left_ts) >= F.col(right_ts) - F.expr(lower))
        & (F.col(left_ts) <= F.col(right_ts) + F.expr(upper))
    )
    return left.join(right, cond, how)


def dim_enrich(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str, str]],
    how: str = "left",
) -> DataFrame:
    """J5/J6 — multi-way broadcast dim-chain enrichment.

    ``dims`` is a sequence of (dim_df, fact_key, dim_key); joins apply in
    order, so later dims may key on columns added by earlier ones — exactly
    the reference's sku -> spu -> trademark -> cat3 -> cat2 -> cat1 chain
    (DwsTradeSkuOrderWindowAsyncCache.java:152-257). Each dim is broadcast:
    replaces per-record Redis GET / HBase GET / 24 h cache TTL / async
    waits (DimAsyncFunction.java:39-82) with zero external systems.
    """
    out = fact
    for dim_df, fact_key, dim_key in dims:
        out = out.join(
            F.broadcast(dim_df), out[fact_key] == dim_df[dim_key], how
        ).drop(dim_df[dim_key])
    return out
