"""Storage-layout operators: partitioned writes and bucketed tables.

The two layout levers a 100 TB warehouse lives on:

- **Hive-style partitioning** (``partitionBy`` on write): coarse,
  low-cardinality keys (date, lang, topic). Partition pruning turns a
  predicate on the partition column into "don't even list those
  directories" — zero I/O for excluded partitions, visible as
  ``PartitionFilters`` in the scan node.
- **Bucketing** (``bucketBy`` on a managed table): high-cardinality join
  keys. Two tables bucketed the same way on the same key join WITHOUT a
  shuffle — the exchange disappears from the plan entirely, which at
  100 TB is the difference between a map-side merge and re-shuffling the
  whole fact table every query.

Reference parity note: the reference warehouse leans on Kafka topic
routing + HBase region keys for the same locality goals
(FlinkSinkUtil.java topic-per-table routing); in a Spark warehouse the
equivalents are exactly these two writers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: Sequence[str]) -> None:
    """Write ``df`` as hive-partitioned parquet (one directory level per
    partition column, low-cardinality keys only — every distinct tuple is
    a directory and a file-listing entry)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int,
    sort_key: str | None = None,
) -> None:
    """Save ``df`` as a managed bucketed table (parquet). Joining two
    tables bucketed identically on the join key skips the shuffle; adding
    ``sort_key`` also skips the sort of a sort-merge join."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_key)
    if sort_key is not None:
        w = w.sortBy(sort_key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Inner-join two co-bucketed managed tables on their bucket key.

    With both sides bucketed identically this plans as a shuffle-free
    sort-merge (or merge) join — no Exchange on either side; the guard
    test pins that property.
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction — the maintenance job every streaming sink
    needs: micro-batch appends leave hundreds of KB-sized files per
    partition, and at 100 TB the file-listing + per-file open cost starts
    to dominate scans. Rewrites only the partitions whose file count
    exceeds what their byte size justifies, each into
    ``ceil(bytes / target_file_bytes)`` files.

    Scale shape: the driver only LISTS files (cheap metadata; on HDFS/S3
    this walk is the FileSystem/ListObjects API — same loop); the data
    move is a distributed partition-pruned read + repartition + dynamic
    partition overwrite, so concurrent readers of other partitions are
    untouched and each rewrite replaces exactly one directory. Returns
    {partitions_compacted, files_before, files_after}.
    """
    import math
    import os

    # partition dir -> (n_files, total_bytes); local-FS walk stands in for
    # the FileSystem API at scale. Only well-formed k=v/... directories
    # matching partition_cols participate — stray root-level files or
    # foreign directory shapes are reported, never crashed on.
    parts: dict[str, tuple[int, int]] = {}
    skipped_dirs = 0
    for root, _dirs, files in os.walk(path):
        pq = [f for f in files if f.endswith(".parquet")]
        if not pq:
            continue
        rel = os.path.relpath(root, path)
        segs = [] if rel == "." else rel.split(os.sep)
        if len(segs) != len(partition_cols) or not all(
            "=" in s for s in segs
        ) or [s.split("=", 1)[0] for s in segs] != list(partition_cols):
            skipped_dirs += 1
            continue
        n = len(pq)
        size = sum(os.path.getsize(os.path.join(root, f)) for f in pq)
        parts[rel] = (n, size)

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    compacted = files_before = files_after = 0
    try:
        for rel, (n, size) in parts.items():
            files_before += n
            want = max(1, math.ceil(size / target_file_bytes))
            if n <= want:
                files_after += n
                continue
            # read ONLY this partition's directory, with basePath so the
            # partition columns come back type-inferred from the k=v path
            # (NULL values — k=__HIVE_DEFAULT_PARTITION__ — included);
            # foreign/stray directories under the root are never touched
            part = spark.read.option("basePath", path).parquet(
                os.path.join(path, rel)
            )
            # an all-NULL partition dir infers its partition column as
            # VOID, which partitionBy refuses — cast to string (the value
            # is only ever the directory name; NULL round-trips to
            # __HIVE_DEFAULT_PARTITION__ whatever the declared type)
            for k in partition_cols:
                if dict(part.dtypes).get(k) == "void":
                    part = part.withColumn(k, part[k].cast("string"))
            # materialize BEFORE the write: Spark (rightly) refuses to
            # overwrite a location it is still reading, and even the
            # dynamic-overwrite commit must not race the scan. At real
            # scale the same decoupling is a temp-dir write + rename.
            part = part.localCheckpoint(eager=True)
            (
                part.repartition(want)
                .write.mode("overwrite")
                .partitionBy(*partition_cols)
                .parquet(path)
            )
            compacted += 1
            files_after += want
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return {
        "partitions_compacted": compacted,
        "files_before": files_before,
        "files_after": files_after,
        "skipped_dirs": skipped_dirs,
    }
