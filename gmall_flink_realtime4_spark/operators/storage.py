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
