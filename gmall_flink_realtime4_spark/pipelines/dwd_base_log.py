"""DwdBaseLog — behavior-log parse, validity filter, is_new repair, 5-way split.

Reference: realtime-dwd/.../DwdBaseLog.java — flatMap JSON parse dropping
malformed rows (:39-58, P1), keyed is_new state machine (:72-108, W10),
side-output split into page/start/err/display/action (:110-161, W6) with
displays/actions denormalized (:130-152, F-arr).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.split import split_log
from ..operators.stateful import repair_is_new_batch, repair_is_new_streaming
from ..schemas import LOG_EVENT


def parse(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P1 — from_json (nulls on malformed) + required-key filter.

    The reference try-catches fastjson and requires mid/ts
    (DwdBaseLog.java:44-53); from_json yields NULL structs for malformed
    input, so the same drop is a declarative filter.
    """
    parsed = raw.select(F.from_json(F.col(value_col), LOG_EVENT).alias("j")).select(
        "j.*"
    )
    return parsed.filter(
        F.col("common").isNotNull()
        & F.col("common.mid").isNotNull()
        & F.col("ts").isNotNull()
    )


def transform(raw: DataFrame, streaming: bool = False) -> dict[str, DataFrame]:
    """Full DwdBaseLog: parse -> is_new repair -> 5-way split.

    Returns the five side-output frames keyed page/start/err/display/action
    (each maps to one dwd_traffic_* topic, Constant.java).
    """
    parsed = parse(raw)
    flat = parsed.withColumn("mid", F.col("common.mid")).withColumn(
        "is_new", F.col("common.is_new")
    )
    repaired = (
        repair_is_new_streaming(flat)
        if streaming
        # sid (event id) breaks millisecond ts ties deterministically;
        # the streaming twin resolves ties by arrival order (the
        # reference's own semantics)
        else repair_is_new_batch(flat, tie_cols=("common.sid",))
    )
    fixed = (
        repaired.withColumn(
            "common",
            F.col("common").withField("is_new", F.col("is_new")),
        )
        .drop("mid", "is_new")
    )
    return split_log(fixed)
