"""DIM layer — config-table-driven dimension router.

Reference: realtime-dim/.../DimApp.java — data plane parses topic_db CDC
(:64-75), control plane streams table_process_dim config via MySQL CDC
(:79-139, with HBase DDL side effects), broadcast-connects the two
(:144-202), prunes columns per config (:206-217) and upserts into HBase
with Redis invalidation (DimHBaseSinkFunc.java:36-73).

Spark-first: the config is a small DataFrame broadcast-joined per batch
(foreachBatch re-reads it for dynamism, W5); the sink is a parquet/Delta
MERGE per dim table (sinks.upsert_parquet); DDL side effects become
CREATE TABLE IF NOT EXISTS in the catalog. No Redis — broadcast joins
downstream make the cache layer moot (SURVEY §2.4 J5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def filter_cdc(cdc: DataFrame, database: str = "gmall") -> DataFrame:
    """Data-plane validity filter (DimApp.java:64-75): right database,
    non-null data payload, and drop Maxwell bootstrap-start/complete
    (the reference's 'bootstarp'(sic) filter keeps bootstrap-insert)."""
    return cdc.filter(
        (F.col("database") == database)
        & F.col("table").isNotNull()
        & F.col("data").isNotNull()
        & F.col("type").isin("insert", "update", "delete", "bootstrap-insert")
    )


def broadcast_config(config: DataFrame, *extra_cols: str):
    """Shared router-config prep (dim router + base_db fact router): the
    broadcast side always carries source_table + split sink_columns; each
    router adds its own key/routing columns. One place to fix
    sink_columns semantics (e.g. whitespace trimming) for BOTH routers."""
    return F.broadcast(
        config.select(
            "source_table",
            *extra_cols,
            F.split("sink_columns", ",").alias("cols"),
        )
    )


def prune_to_cols(data_col: str = "data"):
    """P6 column prune against the broadcast config's ``cols`` array —
    the declarative twin of the reference's entrySet().removeIf."""
    return F.map_filter(
        data_col, lambda k, _: F.array_contains(F.col("cols"), k)
    )


def route_dims(cdc: DataFrame, config: DataFrame) -> DataFrame:
    """Broadcast-join CDC rows to their dim config and prune columns.

    Output: one row per routed change with
    (sink_table, row_key, type, ts, data) where ``data`` keeps only the
    configured sink_columns (P6 — DimApp.java:206-217; map_filter is the
    declarative twin of the reference's entrySet().removeIf).
    """
    cfg = broadcast_config(config, "sink_table", "sink_row_key")
    joined = filter_cdc(cdc).join(
        cfg, F.col("table") == F.col("source_table"), "inner"
    )
    return joined.select(
        "sink_table",
        F.element_at(F.col("data"), F.col("sink_row_key")).alias("row_key"),
        "type",
        "ts",
        prune_to_cols().alias("data"),
    )


def apply_config_ddl(
    spark, config: DataFrame, location_root: str | None = None
) -> list[str]:
    """K6 — the HBase DDL side effects, Spark-catalog twin.

    Reference: DimApp.java:99-139 + HBaseUtil.java:32-66 — when a config
    row appears the dim table is created (idempotent); when the row is
    deleted the table is dropped. Here each configured sink_table becomes a
    catalog table (row_key + string-cell map, the HBase column-family
    shape); both statements are idempotent (IF [NOT] EXISTS) so config
    replays are safe. Returns the tables ensured, for the caller's
    drop-diff: tables previously ensured but absent from the new config
    should be dropped via ``drop_dim_table``.
    """
    ensured = []
    for row in config.select("sink_table").distinct().collect():
        name = row["sink_table"]
        loc = (
            f" LOCATION '{location_root}/{name}'" if location_root else ""
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} "
            f"(row_key STRING, data MAP<STRING, STRING>) USING parquet{loc}"
        )
        ensured.append(name)
    return ensured


def drop_dim_table(spark, name: str) -> None:
    """K6 — config-row deletion side effect (DimApp.java:123-131)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def apply_dim_batch(
    routed: DataFrame, sink_table: str
) -> DataFrame:
    """Materialize one dim table's latest state from routed changes.

    Batch twin of the HBase put/delete semantics (DimHBaseSinkFunc.java:
    36-73): last change per row_key wins; a trailing delete removes the
    row. Streaming: sinks.upsert_parquet applies the same MERGE per batch.
    """
    from ..operators.dedup import first_per_key

    # CDC ts is epoch SECONDS, so a delete + re-insert of one row_key can
    # share a ts. The keeper prefers the non-delete at equal ts (del_rank
    # inside the composite order) — a bare column tie-break would sort
    # 'delete' < 'insert' alphabetically and drop the live row.
    changes = routed.filter(F.col("sink_table") == sink_table).withColumn(
        "__ord",
        F.struct(
            (-F.col("ts")).alias("neg_ts"),
            (F.col("type") == "delete").cast("int").alias("del_rank"),
        ),
    )
    latest = first_per_key(changes, ["row_key"], "__ord").drop("__ord")
    return latest.filter(F.col("type") != "delete").select("row_key", "data")
