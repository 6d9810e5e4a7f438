"""Micro-batch streaming harness.

The reference's BaseAPP wires env -> Kafka source -> handle() -> execute()
(realtime-common/.../base/BaseAPP.java:20-66). The Spark twin: a streaming
DataFrame from a source factory -> the SAME transform fn the batch plan
uses -> a sink. This module provides the file-backed source (tests/CI have
no Kafka; the kafka factories in sources/ are construct-only there) and a
run-to-completion memory-sink runner for deterministic assertions.

Watermark/out-of-orderness (W1-W3): handled inside the transforms via
``withWatermark``; files are fed maxFilesPerTrigger=1 so multi-file inputs
exercise real micro-batch boundaries and late-row dropping.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def stream_parquet_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based streaming source: one parquet file ~= one micro-batch.

    The streaming stand-in for the Kafka source (S1/S2) in environments
    without a broker; schemas must be explicit (streaming reads don't
    infer).
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_from_dataframe(
    df: DataFrame, n_files: int = 3, base_dir: str | None = None
) -> tuple[SparkSession, str]:
    """Materialize a batch DataFrame as n parquet files for replay as a
    micro-batch stream. Rows round-robin across files — fine for
    order-insensitive operators; watermark-sensitive tests should instead
    stage time_slices() into an empty_stream_dir() via run_to_memory's
    ``stages`` (deterministic arrival order)."""
    out = os.path.join(
        base_dir or tempfile.gettempdir(), f"stream_src_{uuid.uuid4().hex[:12]}"
    )
    df.repartition(n_files).write.mode("overwrite").parquet(out)
    return df.sparkSession, out


def run_to_memory(
    streaming_df: DataFrame,
    output_mode: str = "append",
    name: str | None = None,
    stages=None,
) -> DataFrame:
    """Run a streaming query to completion against the memory sink and
    return the collected result as a (batch) DataFrame.

    'Completion' = processAllAvailable on a bounded file source — the test
    twin of a forever-running Kafka job. ``stages`` (optional) is a list of
    callables that each append more input to the source; the runner drains
    the query between stages, so stage boundaries ARE micro-batch
    boundaries — deterministic arrival order regardless of how the file
    source sorts files (mtime ties make pre-written multi-file dirs
    order-flaky)."""
    qname = name or f"q_{uuid.uuid4().hex[:12]}"
    query = (
        streaming_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), f"ckpt_{qname}"),
        )
        .start()
    )
    try:
        for stage in stages or ():
            stage()
            query.processAllAvailable()
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination()
    return streaming_df.sparkSession.table(qname)


def time_slices(df: DataFrame, n: int, order_col: str) -> list[DataFrame]:
    """Split a batch DataFrame into n contiguous event-time slices (the
    in-order arrival pattern a Kafka topic would deliver)."""
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    sliced = df.withColumn(
        "__slice", F.ntile(n).over(Window.orderBy(order_col))
    ).cache()
    sliced.count()
    return [
        sliced.filter(F.col("__slice") == i).drop("__slice") for i in range(1, n + 1)
    ]


def empty_stream_dir(base_dir: str | None = None) -> str:
    """A fresh directory to stream from; stages append files into it."""
    out = os.path.join(
        base_dir or tempfile.gettempdir(), f"stream_src_{uuid.uuid4().hex[:12]}"
    )
    os.makedirs(out, exist_ok=True)
    return out


def run_foreach_batch(
    streaming_df: DataFrame,
    batch_fn,
    output_mode: str = "update",
    stages=None,
) -> None:
    """foreachBatch runner (W5 config-rejoin / K3-K5 merge sinks live in
    batch_fn; see sinks.upsert_parquet). ``stages`` (optional) mirrors
    run_to_memory: callables that each append more input to the source,
    drained between stages so stage boundaries ARE micro-batch boundaries —
    required for ORDER-SENSITIVE state (e.g. the per-user last-event state
    behind incremental path transitions), where round-robin file splits
    would deliver history out of order."""
    qname = f"fb_{uuid.uuid4().hex[:12]}"
    query = (
        streaming_df.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), f"ckpt_{qname}"),
        )
        .start()
    )
    try:
        for stage in stages or ():
            stage()
            query.processAllAvailable()
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination()
