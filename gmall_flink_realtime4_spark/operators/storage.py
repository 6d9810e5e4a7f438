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


def _recover_stranded_swaps(path: str) -> int:
    """Repair swaps interrupted between ``compact_partitions``' two
    renames (single-writer assumption — see its docstring): a partition
    directory that is MISSING while a ``._compact_old_<leaf>`` (the
    intact original) or a ``._compact_tmp_<leaf>`` with a ``_SUCCESS``
    marker (the fully-committed rewrite) sits beside it gets that copy
    renamed back into place; leftovers whose target exists are orphans
    from a completed swap and are deleted. Run eagerly at the start of
    every compaction so no crash window survives more than one run."""
    import os
    import shutil

    actions: list[tuple[str, str, str]] = []  # (kind, src, target)
    for root, dirs, _files in os.walk(path):
        # don't descend into the swap dirs themselves
        keep = []
        for d in dirs:
            for prefix, kind in (
                ("._compact_old_", "old"),
                ("._compact_tmp_", "tmp"),
            ):
                if d.startswith(prefix):
                    actions.append(
                        (kind, os.path.join(root, d),
                         os.path.join(root, d[len(prefix):]))
                    )
                    break
            else:
                keep.append(d)
        dirs[:] = keep
    recovered = 0
    # restore from the intact original first; a complete tmp is equivalent
    # (same rows), so whichever lands first wins and the other is cleaned
    for kind, src, target in sorted(actions, key=lambda a: a[0] != "old"):
        if os.path.exists(target):
            shutil.rmtree(src)  # orphan of a completed swap
            continue
        if kind == "tmp" and not os.path.exists(
            os.path.join(src, "_SUCCESS")
        ):
            continue  # incomplete rewrite: leave for the old-dir restore
        os.rename(src, target)
        recovered += 1
    return recovered


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
    move is a distributed partition-pruned read + a write to a HIDDEN
    temp directory, then two directory renames swap the compacted data
    in. Durability contract (SINGLE WRITER — one compaction job per
    dataset at a time, the norm for a maintenance job): the source
    partition is read-only until the temp write has fully committed, so
    losing an executor mid-write just re-runs tasks against the intact
    source (no checkpoint-block recompute hazard). A crash between the
    two renames leaves the partition temporarily invisible, with BOTH
    complete copies preserved in dot-prefixed siblings;
    ``_recover_stranded_swaps`` runs at the start of every call and
    promotes the original (or the _SUCCESS-marked rewrite) back into
    place, so the window never survives a subsequent run and no cleanup
    ever deletes the only copy. Concurrent readers of other partitions
    are untouched. Returns {partitions_compacted, files_before,
    files_after, skipped_dirs, recovered_swaps} with files_after COUNTED
    from the swapped directory (not assumed from repartition's target).
    """
    import math
    import os
    import shutil

    if not partition_cols:
        raise ValueError(
            "compact_partitions requires >=1 partition column: the swap "
            "renames one k=v directory per rewrite; compacting an "
            "unpartitioned root would need a temp dir outside `path`"
        )

    recovered = _recover_stranded_swaps(path)

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

    compacted = files_before = files_after = 0
    for rel, (n, size) in parts.items():
        files_before += n
        want = max(1, math.ceil(size / target_file_bytes))
        if n <= want:
            files_after += n
            continue
        target_dir = os.path.join(path, rel)
        parent, leaf = os.path.split(target_dir)
        # dot-prefixed siblings: invisible to Spark's file listing AND to
        # this function's own k=v walk, so a crash mid-swap leaves only
        # ignorable leftovers (cleaned up eagerly on the next run)
        tmp_dir = os.path.join(parent, f"._compact_tmp_{leaf}")
        old_dir = os.path.join(parent, f"._compact_old_{leaf}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(old_dir, ignore_errors=True)
        # read ONLY this partition's directory; the partition VALUES live
        # in the directory name (which the rename preserves verbatim —
        # incl. k=__HIVE_DEFAULT_PARTITION__ for NULL), so the rewritten
        # files carry only the data columns, exactly like the originals
        part = spark.read.option("basePath", path).parquet(target_dir)
        (
            part.drop(*partition_cols)
            .repartition(want)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        # swap: original stays intact until the temp write is fully
        # committed; each rename is a single metadata op on the same FS
        os.rename(target_dir, old_dir)
        os.rename(tmp_dir, target_dir)
        shutil.rmtree(old_dir)
        compacted += 1
        files_after += len(
            [f for f in os.listdir(target_dir) if f.endswith(".parquet")]
        )
    return {
        "partitions_compacted": compacted,
        "files_before": files_before,
        "files_after": files_after,
        "skipped_dirs": skipped_dirs,
        "recovered_swaps": recovered,
    }
