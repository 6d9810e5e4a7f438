"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (+ LLM-pipeline extensions);
``oracle_sql()`` gives the DuckDB twin for the hash-match gate. All real
logic lives in ``gmall_flink_realtime4_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_flink_realtime4_spark.plans.catalog import (  # noqa: E402
    oracles as _oracles,
    queries as _queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    DwsTradeSkuOrderWindow twin: dedup + broadcast dim enrichment + 1-day
    tumbling windows (SURVEY.md §2 A1/A2/J5).
    """
    qs = _queries()
    return qs["dws_trade_sku_order_window"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return _oracles()
