"""Storage-layout guards: partition pruning and shuffle-free bucketed joins.

These pin the two plan properties 100 TB layouts buy — a partition-column
predicate must prune at file-listing time, and co-bucketed tables must
join without an Exchange — so neither can silently regress.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from gmall_flink_realtime4_spark import tables as T
from gmall_flink_realtime4_spark.operators.storage import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    docs = T.load(spark, SF, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])
    # one directory per lang on disk
    dirs = {d for d in os.listdir(path) if d.startswith("lang=")}
    assert len(dirs) >= 3

    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = _explain(back)
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "lang" in pf  # predicate reached the listing, not a post-scan filter
    assert back.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_has_no_shuffle(spark):
    orders = T.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = T.load(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    for tbl in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8, sort_key="o_orderkey")
    write_bucketed(li, "t_lineitem_b", "o_orderkey", 8, sort_key="o_orderkey")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at sf0.001 Catalyst would broadcast the tiny side, which hides
        # what bucketing buys; at real scale neither side is broadcastable,
        # so force the non-broadcast path the layout is designed for.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey").filter(
            F.col("l_quantity") > 0
        )
        plan = _explain(j)
        tree = plan.split("\n\n")[0]
        assert "Exchange" not in tree, tree  # the whole point of bucketing
        assert "SortMergeJoin" in tree, tree
        # and the result is the plain join's result
        expected = orders.join(li, "o_orderkey").filter(F.col("l_quantity") > 0)
        assert j.count() == expected.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        for tbl in ("t_orders_b", "t_lineitem_b"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucket_pruning_on_key_predicate(spark):
    """An equality predicate on the bucket key must scan ONE bucket, not
    all of them (SelectedBucketsCount 1 out of n)."""
    orders = T.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    spark.sql("DROP TABLE IF EXISTS t_orders_bp")
    write_bucketed(orders, "t_orders_bp", "o_orderkey", 8)
    auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        # the auto heuristic drops the bucketed scan for filter-only plans
        # (it only values output distribution); turn it off to exercise
        # bucket PRUNING — scanning 1/n of the files on a key predicate.
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        key = orders.limit(1).collect()[0]["o_orderkey"]
        q = spark.table("t_orders_bp").filter(F.col("o_orderkey") == key)
        plan = _explain(q)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert q.count() >= 1
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", auto)
        spark.sql("DROP TABLE IF EXISTS t_orders_bp")


def test_compact_partitions_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction must rewrite ONLY the fragmented partitions into the
    byte-justified file count, leave already-compact partitions' files
    untouched, and preserve every row exactly."""
    import os

    from gmall_flink_realtime4_spark.operators.storage import (
        compact_partitions,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 2000).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS lang"
    )
    # lang=0 written fragmented (20 appends of 1 file each), lang=1 compact
    frag = df.filter("lang = '0'")
    for i in range(20):
        frag.filter((frag.id / 2) % 20 == i).coalesce(1).write.mode(
            "append"
        ).partitionBy("lang").parquet(path)
    df.filter("lang = '1'").coalesce(1).write.mode("append").partitionBy(
        "lang"
    ).parquet(path)

    def nfiles(sub):
        d = os.path.join(path, f"lang={sub}")
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    before = spark.read.parquet(path).orderBy("id").collect()
    assert nfiles("0") == 20 and nfiles("1") == 1

    stats = compact_partitions(
        spark, path, ["lang"], target_file_bytes=64 * 1024 * 1024
    )
    assert stats["partitions_compacted"] == 1
    assert stats["files_before"] == 21
    assert nfiles("0") == 1  # tiny bytes -> 1 target file
    assert nfiles("1") == 1  # untouched
    after = spark.read.parquet(path).orderBy("id").collect()
    assert after == before

    # idempotent: second run finds nothing to do
    stats2 = compact_partitions(spark, path, ["lang"])
    assert stats2["partitions_compacted"] == 0


def test_compact_partitions_null_partition_and_stray_files(spark, tmp_path):
    """NULL partition values (k=__HIVE_DEFAULT_PARTITION__) must prune via
    IS NULL and really compact; stray parquet files outside the k=v layout
    are counted as skipped, never crashed on or miscounted as compacted."""
    import os

    from gmall_flink_realtime4_spark.operators.storage import (
        compact_partitions,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 200).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN NULL ELSE 'x' END AS lang"
    )
    for i in range(5):  # fragment BOTH partitions incl. the NULL one
        df.filter(df.id % 5 == i).coalesce(1).write.mode(
            "append"
        ).partitionBy("lang").parquet(path)
    # a stray non-partitioned parquet next to the partition dirs
    spark.range(3).coalesce(1).write.parquet(str(tmp_path / "t" / "stray"))

    before = spark.read.parquet(
        os.path.join(path, "lang=__HIVE_DEFAULT_PARTITION__")
    ).count()
    stats = compact_partitions(spark, path, ["lang"])
    assert stats["partitions_compacted"] == 2
    assert stats["skipped_dirs"] == 1  # the stray dir
    null_dir = os.path.join(path, "lang=__HIVE_DEFAULT_PARTITION__")
    assert (
        len([f for f in os.listdir(null_dir) if f.endswith(".parquet")]) == 1
    )
    assert spark.read.parquet(null_dir).count() == before


def test_compact_partitions_recovers_interrupted_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the partition dir
    missing and both copies in dot-prefixed siblings; the next run must
    promote a copy back into place (no silent data loss) and then finish
    the compaction normally."""
    import os
    import shutil

    from gmall_flink_realtime4_spark.operators.storage import (
        compact_partitions,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 400).selectExpr("id", "CAST(id % 2 AS STRING) AS lang")
    for i in range(4):
        df.filter(df.id % 4 == i).coalesce(1).write.mode("append").partitionBy(
            "lang"
        ).parquet(path)
    before = spark.read.parquet(path).count()

    # simulate the crash window: lang=0 renamed aside (rename #1 done),
    # rewrite committed to the tmp dir (_SUCCESS), rename #2 never ran
    target = os.path.join(path, "lang=0")
    old = os.path.join(path, "._compact_old_lang=0")
    tmp = os.path.join(path, "._compact_tmp_lang=0")
    shutil.copytree(target, tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    os.rename(target, old)
    assert not os.path.exists(target)  # the partition is invisible

    stats = compact_partitions(spark, path, ["lang"])
    assert stats["recovered_swaps"] == 1
    assert os.path.isdir(target)
    assert spark.read.parquet(path).count() == before
    # the interrupted partition was then compacted like any other
    assert stats["partitions_compacted"] == 2
    # no stranded swap dirs survive a successful run
    leftovers = [d for d in os.listdir(path) if d.startswith("._compact_")]
    assert leftovers == []


def test_compact_partitions_incomplete_tmp_is_discarded(spark, tmp_path):
    """A tmp dir WITHOUT _SUCCESS next to an intact partition (crash
    mid-write) is an orphan: recovery deletes it and the partition
    compacts from the original."""
    import os

    from gmall_flink_realtime4_spark.operators.storage import (
        compact_partitions,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id", "'a' AS lang")
    for i in range(3):
        df.filter(df.id % 3 == i).coalesce(1).write.mode("append").partitionBy(
            "lang"
        ).parquet(path)
    tmp = os.path.join(path, "._compact_tmp_lang=a")
    os.makedirs(tmp)
    open(os.path.join(tmp, "part-junk.parquet"), "w").close()  # no _SUCCESS
    before = spark.read.parquet(path).count()
    stats = compact_partitions(spark, path, ["lang"])
    assert not os.path.exists(tmp)
    assert stats["recovered_swaps"] == 0
    assert spark.read.parquet(path).count() == before
