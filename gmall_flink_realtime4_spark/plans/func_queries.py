"""Scalar-function and validity-filter queries (SURVEY.md §2.3 P1, §2.8 F-*)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .. import tables as T
from .catalog import query


@query(
    "p1_json_parse_validity_filter",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       user_id,
       event_type
FROM events
WHERE props IS NOT NULL
  AND json_extract_string(props, '$.k') IS NOT NULL
  AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
  AND user_id IS NOT NULL
  AND event_type IS NOT NULL AND event_type <> ''
""",
    tags=("P1", "F-json1"),
)
def p1_json_parse_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parse + drop-malformed validity filter.

    Reference: the try-parse + required-key filter repeated in every app
    (DimApp.java:64-75, DwdBaseLog.java:39-58, DwsTradeSkuOrderWindow.java:
    45-61). Spark-first: ``get_json_object`` yields NULL on malformed input
    (no exceptions, no UDF); a conjunctive ``filter`` drops invalid rows and
    is pushed to the scan.
    """
    e = T.load(spark, sf_dir, "events")
    # integral-guard before the cast: under Spark 4's default ANSI mode a
    # non-integral payload ('5.0') would RAISE instead of nulling, while
    # DuckDB's CAST rounds — the regex pins identical drop-the-row
    # semantics on both engines
    ks = F.get_json_object("props", "$.k")
    k = F.when(ks.rlike("^-?[0-9]+$"), ks.cast("int"))
    return e.select(
        "event_id", k.alias("k"), "user_id", "event_type"
    ).filter(
        F.col("props").isNotNull()
        & F.col("k").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & (F.col("event_type") != "")
    )


@query(
    "f_date_formats",
    oracle="""
SELECT o_orderkey                                AS id,
       strftime(o_orderdate, '%Y-%m-%d')          AS date_id,
       strftime(o_orderdate, '%Y%m%d')            AS date_compact,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS create_time,
       CAST(epoch(o_orderdate) AS BIGINT)         AS ts_seconds,
       CAST(epoch(o_orderdate) AS BIGINT) * 1000  AS ts_millis
FROM orders
""",
    tags=("F-date1", "F-date2", "F-date3"),
)
def f_date_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time format surface.

    Reference: DateFormatUtil.java:21-64 (epoch ms <-> yyyy-MM-dd /
    yyyy-MM-dd HH:mm:ss / yyyyMMdd) and TO_TIMESTAMP_LTZ (SQLUtil.java:39);
    the reference multiplies CDC epoch-seconds by 1000 downstream
    (DwsTradeSkuOrderWindow.java:54) — mirrored by ts_millis. All built-in
    JVM-side functions; session tz pinned UTC for oracle parity.
    """
    o = T.load(spark, sf_dir, "orders", spread=False)
    ts_sec = F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).cast("bigint")
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_id"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("date_compact"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("create_time"),
        ts_sec.alias("ts_seconds"),
        (ts_sec * 1000).alias("ts_millis"),
    )


@query(
    "f_conditional_cast_math",
    oracle="""
SELECT l_orderkey * 8 + l_linenumber                      AS id,
       CASE WHEN l_linestatus = 'O' THEN 'open' ELSE 'closed' END AS status_name,
       CAST(trunc(l_quantity) AS BIGINT)                   AS qty_int,
       l_extendedprice * l_tax                             AS tax_amount,
       l_extendedprice - l_extendedprice * l_discount      AS net_price
FROM lineitem
""",
    tags=("F-cond", "F-cast", "F-math"),
)
def f_conditional_cast_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression, casts, BigDecimal arithmetic.

    Reference: ``if(cond,a,b)`` (DwdTradeCartAdd.java:27), casts
    (DwsTrafficSourceKeywordPageViewWindow.java:55-57), BigDecimal
    multiply/subtract (DwsTradeSkuOrderWindow.java:99-132). Decimal-exact
    row-wise math, whole-stage-codegen friendly.
    """
    l = T.load(spark, sf_dir, "lineitem", spread=False)
    price = F.col("l_extendedprice")
    return l.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
        F.when(F.col("l_linestatus") == "O", "open")
        .otherwise("closed")
        .alias("status_name"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        (price * F.col("l_tax")).alias("tax_amount"),
        (price - price * F.col("l_discount")).alias("net_price"),
    )


@query(
    "f_asof_join_latest_order",
    oracle="""
WITH r AS (
    SELECT o_custkey, o_orderdate,
           MAX(o_orderkey)                    AS asof_orderkey,
           MAX_BY(o_totalprice, o_orderkey)   AS asof_totalprice
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.event_type,
       r.asof_orderkey,
       r.asof_totalprice,
       strftime(r.o_orderdate, '%Y-%m-%d') AS asof_orderdate
FROM events e
ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
""",
    tags=("asof-join",),
)
def f_asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) enrichment: each event picks the customer's
    LATEST order at-or-before the event time — the time-series lookup every
    feature-backfill pipeline needs and Spark has no native operator for
    (beyond-reference; DuckDB validates via its native ASOF JOIN).

    The right side is pre-reduced to one row per (customer, date) with a
    deterministic keeper (max orderkey; max_by for its payload) so the
    as-of pick is total-ordered on both engines. The operator itself
    (operators/joins.py::asof_join) is the log-merge formulation: one
    shuffle on the key, linear window pass, no range-join pair blowup.
    """
    e = T.load(spark, sf_dir, "events", spread=False).select(
        "event_id", "user_id", "event_type", "ts"
    )
    r = (
        T.load(spark, sf_dir, "orders", spread=False)
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("asof_orderkey"),
            F.expr("max_by(o_totalprice, o_orderkey)").alias("asof_totalprice"),
        )
        .withColumn(
            "asof_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd")
        )
    )
    from ..operators.joins import asof_join

    return asof_join(
        e,
        r,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["asof_orderkey", "asof_totalprice", "asof_orderdate"],
    ).drop("ts")


@query(
    "dq_audit_warehouse",
    oracle="""
SELECT 'lineitem' AS table_name, 'orphan_orderkey' AS check_name,
       CAST(COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT)
           AS n_violations,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem', 'duplicate_line_ids',
       CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 8 + l_linenumber)
            AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders', 'null_orderdate',
       CAST(COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'events', 'null_user_id',
       CAST(COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM events
UNION ALL
SELECT 'part', 'price_out_of_range',
       CAST(COUNT(CASE WHEN p_retailprice < 900 OR p_retailprice >= 1000
                       THEN 1 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM part
UNION ALL
SELECT 'customer', 'orphan_nationkey',
       CAST(COUNT(CASE WHEN n.n_nationkey IS NULL THEN 1 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
""",
    tags=("func", "data-quality"),
)
def dq_audit_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly data-quality audit: one row per declared constraint with its
    violation count — referential integrity (orphan FKs), key uniqueness,
    null contracts, and value ranges, across five tables in one plan.

    The expectation-suite shape (Great-Expectations/dbt-test family) as a
    single engine query. Scale shape: every check is one scan + one
    aggregate; true-dim FK edges (nation) broadcast, while the
    lineitem->orders FK edge is a shuffled hash join on the key-only
    orders projection — orders is a fact, and broadcasting a growing side
    is the one plan that cannot survive 100 TB (the key-sketch variant —
    llm_sketch_kmv_distinct's machinery — is the probabilistic fallback
    when even the key shuffle is too hot). The
    key-uniqueness check intentionally CATCHES the testdata's synthesized
    duplicate lineitem ids (l_orderkey*8 + l_linenumber collides by
    construction) — a real finding, not a tautology.
    """
    li = T.load(spark, sf_dir, "lineitem", spread=False)
    o = T.load(spark, sf_dir, "orders", spread=False)
    ev = T.load(spark, sf_dir, "events", spread=False)
    p = T.load(spark, sf_dir, "part", spread=False)
    c = T.load(spark, sf_dir, "customer", spread=False)
    n = T.load(spark, sf_dir, "nation", spread=False)

    def row(tbl, check, viol, total):
        return (
            F.lit(tbl).alias("table_name"),
            F.lit(check).alias("check_name"),
            viol.cast("bigint").alias("n_violations"),
            total.cast("bigint").alias("n_rows"),
        )

    orphan_li = li.join(
        o.select("o_orderkey").hint("shuffle_hash"),
        li.l_orderkey == F.col("o_orderkey"),
        "left",
    ).agg(
        *row(
            "lineitem",
            "orphan_orderkey",
            F.count(F.when(F.col("o_orderkey").isNull(), 1)),
            F.count(F.lit(1)),
        )
    )
    dup_li = li.agg(
        *row(
            "lineitem",
            "duplicate_line_ids",
            F.count(F.lit(1))
            - F.countDistinct(F.col("l_orderkey") * 8 + F.col("l_linenumber")),
            F.count(F.lit(1)),
        )
    )
    null_od = o.agg(
        *row(
            "orders",
            "null_orderdate",
            F.count(F.when(F.col("o_orderdate").isNull(), 1)),
            F.count(F.lit(1)),
        )
    )
    null_uid = ev.agg(
        *row(
            "events",
            "null_user_id",
            F.count(F.when(F.col("user_id").isNull(), 1)),
            F.count(F.lit(1)),
        )
    )
    price_rng = p.agg(
        *row(
            "part",
            "price_out_of_range",
            F.count(
                F.when(
                    (F.col("p_retailprice") < 900)
                    | (F.col("p_retailprice") >= 1000),
                    1,
                )
            ),
            F.count(F.lit(1)),
        )
    )
    orphan_c = c.join(
        F.broadcast(n.select("n_nationkey")),
        c.c_nationkey == F.col("n_nationkey"),
        "left",
    ).agg(
        *row(
            "customer",
            "orphan_nationkey",
            F.count(F.when(F.col("n_nationkey").isNull(), 1)),
            F.count(F.lit(1)),
        )
    )
    out = orphan_li
    for part_df in (dup_li, null_od, null_uid, price_rng, orphan_c):
        out = out.unionByName(part_df)
    return out


@query(
    "f_json_props_extract",
    oracle="""
SELECT event_type,
       CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT)
           AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS max_k
FROM events
WHERE props IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
  AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
GROUP BY 1, 2
""",
    tags=("func", "json"),
)
def f_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-json1 on REAL driver data: extract a typed field from the
    events.props JSON payload, bucket it, and aggregate a money-style
    measure — the semi-structured projection every log pipeline starts
    with (the reference does the same to topic_log via fastjson,
    dwd_base_log family).

    Scale shape: extraction is a per-row JVM expression inside the scan
    stage (whole-stage codegen, no UDF); invalid/missing JSON is filtered
    BEFORE the shuffle; the value sum is DECIMAL inside the agg, DOUBLE at
    the boundary per the catalog money contract.
    """
    e = T.load(spark, sf_dir, "events")
    # ANSI-safe integral guard (see p1): non-integral k drops the row on
    # BOTH engines instead of raising here / rounding in DuckDB; every
    # cast sits behind the guard so no evaluation order can surface it
    _kg = (
        "case when get_json_object(props, '$.k') rlike '^-?[0-9]+$'"
        " then cast(get_json_object(props, '$.k') as bigint) end"
    )
    k = F.expr(_kg)
    return (
        e.filter(F.col("props").isNotNull() & k.isNotNull())
        .groupBy(
            "event_type",
            F.expr(f"cast(({_kg}) div 10 as bigint)").alias("k_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )
