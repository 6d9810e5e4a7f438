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
from pyspark.sql import DataFrame, SparkSession, Window

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
    ×4 row expansion never crosses the shuffle unaggregated. Windows are
    clipped to non-negative epoch starts on BOTH engines: Spark emits
    pre-epoch hop windows for events near 1970 while the oracle's integer
    arithmetic starts at 0 (and `//` truncation differs from floor on
    negatives) — the shared clip makes near/pre-epoch data well-defined.
    """
    e = T.load(spark, sf_dir, "events", spread=False)
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
        .filter(F.col("w.start") >= F.to_timestamp(F.lit("1970-01-01 00:00:00")))
        .select(
            F.col("w.start").alias("stt"),
            F.col("w.end").alias("edt"),
            "event_type",
            "ct",
            "val_sum",
        )
    )


@query(
    "llm_corpus_rollup",
    oracle="""
SELECT COALESCE(lang, '<all>')    AS lang,
       COALESCE(source, '<all>')  AS source,
       CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid,
       COUNT(*)                   AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY ROLLUP (lang, source)
""",
    tags=("llm-text", "rollup"),
)
def llm_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats with ROLLUP (lang, source) — subtotal + grand-total
    rows in one pass (beyond-reference: the warehouse has no grouping
    sets). GROUPING() disambiguates rollup-NULL from data-NULL; Spark
    computes rollup via Expand before the single aggregation shuffle."""
    d = T.load(spark, sf_dir, "documents", spread=False)
    rolled = d.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        (F.grouping("lang") * 2 + F.grouping("source"))
        .cast("bigint")
        .alias("gid"),
    )
    return rolled.select(
        F.coalesce("lang", F.lit("<all>")).alias("lang"),
        F.coalesce("source", F.lit("<all>")).alias("source"),
        "gid",
        "n_docs",
        "total_tokens",
    )


@query(
    "dws_user_event_funnel",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS first_view
    FROM events
), click_after AS (
    SELECT user_id, first_view,
           min(CASE WHEN event_type = 'click' AND ts > first_view THEN ts END)
               AS first_click
    FROM seq GROUP BY user_id, first_view
), buy_after AS (
    SELECT s.user_id, c.first_view, c.first_click,
           min(CASE WHEN s.event_type = 'purchase' AND s.ts > c.first_click
                    THEN s.ts END) AS first_buy
    FROM seq s JOIN click_after c ON s.user_id = c.user_id
    GROUP BY s.user_id, c.first_view, c.first_click
)
SELECT CAST(COUNT(*) AS BIGINT)                              AS n_users,
       CAST(COUNT(first_view) AS BIGINT)                     AS viewed,
       CAST(COUNT(first_click) AS BIGINT)                    AS clicked_after_view,
       CAST(COUNT(first_buy) AS BIGINT)                      AS bought_after_click
FROM buy_after
""",
    tags=("window-analytic",),
)
def dws_user_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase via analytic
    window functions (beyond-reference: the warehouse has no OVER windows).

    Stage timestamps chain: first view, first click strictly after it,
    first purchase strictly after that — each a conditional MIN, so the
    whole funnel is two keyed aggregations (no per-user sort-explode)."""
    e = T.load(spark, sf_dir, "events", spread=False)
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(
            Window.partitionBy("user_id")
        ).alias("first_view"),
    )
    click_after = seq.groupBy("user_id", "first_view").agg(
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")),
                F.col("ts"),
            )
        ).alias("first_click")
    )
    buy_after = (
        seq.select("user_id", "event_type", "ts")
        .join(click_after, "user_id")
        .groupBy("user_id", "first_view", "first_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("first_click")),
                    F.col("ts"),
                )
            ).alias("first_buy")
        )
    )
    return buy_after.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("viewed"),
        F.count("first_click").alias("clicked_after_view"),
        F.count("first_buy").alias("bought_after_click"),
    )


@query(
    "dws_session_window_events",
    oracle=f"""
WITH flagged AS (
    SELECT user_id, ts,
           -- STRICT >: Spark's session_window merges events exactly
           -- gap-distance apart (the window end is start + gap,
           -- half-open, and a point ON the end extends the session)
           CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
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
    e = T.load(spark, sf_dir, "events", spread=False)
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


@query(
    "dws_time_hierarchy_rollup",
    oracle="""
SELECT COALESCE(strftime(ts, '%Y-%m'), '<all>')         AS month,
       COALESCE(strftime(ts, '%Y-%m-%d'), '<all>')      AS day,
       COALESCE(strftime(ts, '%Y-%m-%d %H'), '<all>')   AS hour,
       CAST(GROUPING(strftime(ts, '%Y-%m')) * 4
            + GROUPING(strftime(ts, '%Y-%m-%d')) * 2
            + GROUPING(strftime(ts, '%Y-%m-%d %H')) AS BIGINT) AS gid,
       COUNT(*)                                         AS ct,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
FROM events
GROUP BY ROLLUP (strftime(ts, '%Y-%m'), strftime(ts, '%Y-%m-%d'),
                 strftime(ts, '%Y-%m-%d %H'))
""",
    tags=("rollup", "hypertable"),
)
def dws_time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: ONE pass produces the
    hour, day, month and grand-total aggregate levels via
    ROLLUP(month, day, hour) — the time-bucket hierarchy TimescaleDB
    materializes per level, here as a single Expand + one aggregation
    shuffle (beyond-reference; pairs with llm_corpus_rollup's categorical
    rollup). GROUPING() disambiguates rollup-NULL from data-NULL; time
    buckets emitted as strings (determinism contract: no DateType at the
    boundary).
    """
    d = T.load(spark, sf_dir, "events", spread=False).select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        "value",
    )
    rolled = d.rollup("month", "day", "hour").agg(
        F.count(F.lit(1)).alias("ct"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("val_sum"),
        (
            F.grouping("month") * 4 + F.grouping("day") * 2 + F.grouping("hour")
        )
        .cast("bigint")
        .alias("gid"),
    )
    return rolled.select(
        F.coalesce("month", F.lit("<all>")).alias("month"),
        F.coalesce("day", F.lit("<all>")).alias("day"),
        F.coalesce("hour", F.lit("<all>")).alias("hour"),
        "gid",
        "ct",
        "val_sum",
    )


@query(
    "dws_user_retention_cohort",
    oracle="""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
    FROM events WHERE user_id IS NOT NULL
), c AS (
    SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY 1
)
SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', c.cohort, ud.day) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud JOIN c ON ud.user_id = c.user_id
GROUP BY 1, 2
""",
    tags=("window-analytic",),
)
def dws_user_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N retention cohorts (beyond-reference analytics): users grouped
    by first-active day; n_users at each day offset from their cohort day.

    Scale shape: collapse to DISTINCT (user, day) FIRST — the fact stream
    shrinks to at most users x days before anything else touches it — then
    one groupBy(user) for the cohort anchor and a user-keyed join that
    co-partitions with it (same key, no extra shuffle under AQE), and the
    final small (cohort, offset) agg. Dates leave as 'yyyy-MM-dd' strings
    (no DateType at the boundary, per the catalog contract).
    """
    e = T.load(spark, sf_dir, "events", spread=False).filter(F.col("user_id").isNotNull())
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    c = ud.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        ud.join(c, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "dws_gap_fill_locf_daily_orders",
    oracle="""
WITH src AS (
    SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM orders WHERE o_orderkey % 61 = 0
    GROUP BY 1, 2
), bounds AS (
    SELECT prio, MIN(day) AS d0, MAX(day) AS d1 FROM src GROUP BY 1
), spine AS (
    SELECT prio, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
    FROM bounds
), joined AS (
    SELECT s.prio, s.day, src.ct FROM spine s
    LEFT JOIN src ON s.prio = src.prio AND s.day = src.day
)
SELECT prio, strftime(day, '%Y-%m-%d') AS day,
       CAST(last_value(ct IGNORE NULLS) OVER (
            PARTITION BY prio ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS ct_filled,
       CAST(CASE WHEN ct IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
FROM joined
""",
    tags=("window-analytic", "timeseries"),
)
def dws_gap_fill_locf_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward
    (the hypertable `time_bucket_gapfill + locf` pattern): a sparse daily
    series per order priority is densified onto a generated date spine,
    missing days carry the last seen value, and each row reports whether
    it was observed or filled.

    Scale shape: the spine is generated PER KEY from that key's own
    [min, max] day bounds (sequence + explode — rows appear only where
    needed, no global calendar cross join); the LOCF window partitions by
    key, so fill parallelism is the key cardinality. Dates leave as
    strings per the catalog contract.
    """
    src = (
        T.load(spark, sf_dir, "orders", spread=False)
        .filter(F.col("o_orderkey") % 61 == 0)
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    spine = (
        src.groupBy("prio")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "prio",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    joined = spine.join(src, ["prio", "day"], "left")
    w = (
        Window.partitionBy("prio")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "prio",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("ct", ignorenulls=True).over(w).cast("bigint").alias("ct_filled"),
        F.when(F.col("ct").isNull(), 1).otherwise(0).cast("int").alias("was_gap"),
    )


@query(
    "dim_scd2_user_event_intervals",
    oracle="""
WITH src AS (
    SELECT user_id, event_type, ts, event_id
    FROM events WHERE user_id IS NOT NULL AND user_id % 997 = 0
), iv AS (
    SELECT user_id, event_type, ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
    FROM src
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       COALESCE(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00')
           AS valid_to,
       CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM iv
""",
    tags=("window-analytic", "scd"),
)
def dim_scd2_user_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 materialization from a change stream: each change row
    becomes a validity interval [valid_from, valid_to) via lead() over the
    per-key change order (tie-broken on event_id for duplicate
    timestamps), open intervals marked current — the standard
    slowly-changing-dimension build every warehouse runs over CDC.

    Scale shape: ONE shuffle on the dimension key, one window pass —
    the change history per key is the partition, so skew follows key
    activity (bounded here; salting applies if a key's history explodes).
    Timestamps leave as strings per the catalog contract.
    """
    src = T.load(spark, sf_dir, "events", spread=False).filter(
        F.col("user_id").isNotNull() & (F.col("user_id") % 997 == 0)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = src.select(
        "user_id", "event_type", "ts", F.lead("ts").over(w).alias("next_ts")
    )
    return iv.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        F.when(F.col("next_ts").isNull(), 1).otherwise(0).cast("int").alias(
            "is_current"
        ),
    )
