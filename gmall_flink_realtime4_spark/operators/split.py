"""Stream splitting (SURVEY.md §2.9 W6 — side outputs)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def split_log(parsed: DataFrame) -> dict[str, DataFrame]:
    """W6 — split the parsed behavior log 1->5 (DwdBaseLog.java:110-161).

    The reference uses OutputTags from one process function; Spark-first
    this is N filtered/projected DataFrames off one parsed source (persist
    the batch or share one foreachBatch to keep a single scan).

    Returns page / start / err / display / action frames; displays/actions
    are denormalized with common+page+ts like DwdBaseLog.java:130-152
    (F-arr explode).
    """
    err = parsed.filter(F.col("err").isNotNull()).select(
        "common", "page", "err", "ts"
    )
    no_err = parsed.drop("err")
    start = no_err.filter(F.col("start").isNotNull()).select(
        "common", "start", "ts"
    )
    page_side = no_err.filter(F.col("start").isNull())
    display = page_side.filter(F.col("displays").isNotNull()).select(
        "common",
        "page",
        "ts",
        F.explode("displays").alias("display"),
    )
    action = page_side.filter(F.col("actions").isNotNull()).select(
        "common",
        "page",
        "ts",
        F.explode("actions").alias("action"),
    )
    page = page_side.drop("displays", "actions", "start")
    return {
        "err": err,
        "start": start,
        "display": display,
        "action": action,
        "page": page,
    }
