"""Beyond-reference window shapes: sliding (hopping) and session windows.

The reference only ever tumbles (SURVEY §2.6); a complete engine offers the
other two event-time window families Spark supports natively — registered
here as oracle-gated queries so the semantics are pinned, not just exposed.

Oracles: a sliding window assigns each row to size/slide buckets
(explicit unnest of the window starts); a session window is the classic
gaps-and-islands rewrite (LAG + cumulative sum of new-session flags).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .. import tables as T
from .catalog import query

SLIDE_SIZE_MIN = 60  # window size: 1 hour
SLIDE_STEP_MIN = 15  # hop: 15 minutes -> each event in 4 windows
SESSION_GAP_MIN = 30


@query(
    "dws_sliding_window_events",
    oracle=f"""
WITH e AS (
    SELECT event_type, epoch_ms(ts) AS ts_ms, value FROM events
), w AS (
    SELECT event_type, value,
           -- earliest window containing ts, then hop forward
           (ts_ms // ({SLIDE_STEP_MIN} * 60000)) * ({SLIDE_STEP_MIN} * 60000)
               - unnest(range(0, {SLIDE_SIZE_MIN // SLIDE_STEP_MIN}))
               * ({SLIDE_STEP_MIN} * 60000) AS wstart_ms
    FROM e
)
SELECT epoch_ms(wstart_ms)                                   AS stt,
       epoch_ms(wstart_ms + {SLIDE_SIZE_MIN} * 60000)        AS edt,
       event_type,
       COUNT(*)                                              AS ct,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)     AS val_sum
FROM w
WHERE wstart_ms >= 0
GROUP BY 1, 2, 3
""",
    tags=("window-sliding",),
)
def dws_sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window: 1 h windows every 15 min over events.

    `F.window(ts, size, slide)` — each event lands in size/slide windows;
    Spark expands map-side then aggregates with partial combine, so the
    ×4 row expansion never crosses the shuffle unaggregated.
    """
    e = T.load(spark, sf_dir, "events")
    w = F.window(
        "ts", f"{SLIDE_SIZE_MIN} minutes", f"{SLIDE_STEP_MIN} minutes"
    ).alias("w")
    return (
        e.groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).alias("ct"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("val_sum"),
        )
        .select(
            F.col("w.start").alias("stt"),
            F.col("w.end").alias("edt"),
            "event_type",
            "ct",
            "val_sum",
        )
    )


@query(
    "dws_session_window_events",
    oracle=f"""
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_MIN} MINUTE
                  OR lag(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), islands AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts)                                      AS session_start,
       MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE  AS session_end,
       COUNT(*)                                     AS n_events
FROM islands
GROUP BY user_id, session_id
""",
    tags=("window-session",),
)
def dws_session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window: per-user activity sessions closed by a 30 min gap.

    `F.session_window` — Spark merges overlapping per-row sessions in the
    state store (streaming) or via sort-based merge (batch). The oracle is
    the gaps-and-islands rewrite, which also documents the exact
    session-end semantics (last event + gap).
    """
    e = T.load(spark, sf_dir, "events")
    sw = F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw")
    return (
        e.groupBy(sw, "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
