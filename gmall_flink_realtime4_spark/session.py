"""SparkSession factory and runtime conf normalization.

The reference builds a ``StreamExecutionEnvironment`` per app
(``realtime-common/.../base/BaseAPP.java:20-66``); here one SparkSession
serves every pipeline. Confs are split into:

- BUILD_CONFS: set at builder time when *we* own the session (tests, bench).
- RUNTIME_CONFS: safe to set on an externally-created session (the driver's
  verify harness builds its own SparkSession and passes it in) — session
  timezone, parquet nanos handling, AQE/shuffle sizing.

Determinism notes (for the DuckDB oracle gate):
- session timezone is pinned to UTC so TIMESTAMP / date_format results are
  byte-identical to DuckDB's naive-timestamp view of the same parquet;
- ``spark.sql.legacy.parquet.nanosAsLong=true`` because the driver testdata's
  ``events.parquet`` carries TIMESTAMP(NANOS) which Spark 4 otherwise rejects
  (tables.events_table converts nanos -> TIMESTAMP_NTZ micros, matching
  DuckDB's nanos->micros truncation).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are legal to set on a live session (checked: all runtime-settable
# on Spark 4.1).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # the engine is built and tested under Spark 4's ANSI default; pin it
    # so a hostile session with ansi=false runs the tested configuration
    # (expressions are written to be mode-agnostic — in-range element_at,
    # overflow-free decimal accumulators, try_*/guarded casts — but the
    # pin removes the matrix)
    "spark.sql.ansi.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims (part/supplier/nation/region/config tables) are small: keep the
    # broadcast threshold generous so every dim-enrichment join broadcasts
    # (replaces the reference's Redis/HBase cache-aside + async I/O,
    # DimAsyncFunction.java:39-82).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # runtime-settable: the driver's own session defaults to 200 shuffle
    # partitions — size the shuffles to the box like our own sessions do
    # (AQE still coalesces below this; purely a perf normalization)
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}

BUILD_CONFS: dict[str, str] = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # local mode = one JVM; the default 1g heap cannot hold a 64 MB
    # broadcast's hashed relation next to execution memory (observed OOM
    # building broadcasts at 10x scale). Size for the box; harmless when a
    # session already exists (builder confs are ignored then, and the
    # runtime confs above still apply).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


# Marker conf recording a shuffle-partition count a caller PINNED
# explicitly (get_spark(shuffle_partitions=...)). apply_runtime_confs
# runs on every registered-query call and must not clobber it.
_PIN_CONF = "spark.gmall.pinnedShufflePartitions"


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Normalize an externally-created session (driver harness) in place."""
    try:
        pinned = spark.conf.get(_PIN_CONF, None)
    except Exception:
        pinned = None
    for k, v in RUNTIME_CONFS.items():
        if k == "spark.sql.shuffle.partitions" and pinned is not None:
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-settable on this build: keep going, individual queries
            # fall back to tz-independent expressions where possible.
            pass
    return spark


def get_spark(
    app_name: str = "gmall_flink_realtime4_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` outside a cluster.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = builder.getOrCreate()
    if shuffle_partitions is not None:
        # pin explicitly (getOrCreate may have returned a pre-existing
        # session whose builder confs were ignored) and mark the pin so
        # the per-query runtime normalization leaves it alone
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        spark.conf.set(_PIN_CONF, str(shuffle_partitions))
    return apply_runtime_confs(spark)
