"""Equivalence tests for the skew-mitigation operators: each salted/two-
phase form must produce exactly the plain form's result on skewed data."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.operators.skew import (
    salted_collect_set,
    salted_join,
    two_phase_distinct_count,
)


def _skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [("hot", i, f"v{i % 7}") for i in range(900)] + [
        (f"k{i}", i, f"v{i % 5}") for i in range(100)
    ]
    return spark.createDataFrame(rows, "key string, seq long, val string")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], "key string, name string"
    )
    plain = big.join(small, "key").select("key", "seq", "name")
    salted = salted_join(big, small, "key", n_salts=4).select("key", "seq", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_outer(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", "HOT")], "key string, name string")
    plain = big.join(small, "key", "left").select("key", "seq", "name")
    salted = salted_join(big, small, "key", n_salts=4, how="left").select(
        "key", "seq", "name"
    )
    assert sorted(map(tuple, salted.collect(), )) == sorted(
        map(tuple, plain.collect())
    )


def test_two_phase_distinct_count(spark):
    df = _skewed(spark)
    plain = df.groupBy("key").agg(F.countDistinct("val").alias("distinct_count"))
    two = two_phase_distinct_count(df, ["key"], "val")
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_collect_set(spark):
    df = _skewed(spark)
    plain = df.groupBy("key").agg(F.array_sort(F.collect_set("val")).alias("values"))
    salted = salted_collect_set(df, ["key"], "val", n_salts=4)
    a = {r["key"]: list(r["values"]) for r in plain.collect()}
    b = {r["key"]: list(r["values"]) for r in salted.collect()}
    assert a == b


def test_two_phase_distinct_count_null_semantics(spark):
    """Must match SQL COUNT(DISTINCT x): NULL is not a value, and an
    all-NULL key still appears with count 0."""
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "x"), ("b", None)],
        "key string, val string",
    )
    got = {
        r.key: r.distinct_count
        for r in two_phase_distinct_count(df, ["key"], "val").collect()
    }
    ref = {
        r.key: r.c
        for r in df.groupBy("key")
        .agg(F.countDistinct("val").alias("c"))
        .collect()
    }
    assert got == ref == {"a": 1, "b": 0}


def test_two_phase_distinct_count_null_key_group(spark):
    """SQL GROUP BY treats NULL keys as one real group: a NULL-key group
    whose distinct_col has real values must keep its true count (a plain
    using-columns join would null-match it down to 0)."""
    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), (None, None), ("a", "x")],
        "key string, val string",
    )
    got = {
        r.key: r.distinct_count
        for r in two_phase_distinct_count(df, ["key"], "val").collect()
    }
    ref = {
        r.key: r.c
        for r in df.groupBy("key")
        .agg(F.countDistinct("val").alias("c"))
        .collect()
    }
    assert got == ref == {None: 2, "a": 1}


def test_salted_join_rejects_small_side_preserving_modes(spark):
    """right/full outer would emit unmatched small-side rows once per salt
    replica — the operator must refuse instead of silently duplicating."""
    import pytest as _pt

    big = spark.createDataFrame([("k", 1)], "key string, seq int")
    small = spark.createDataFrame([("k", "n")], "key string, name string")
    for bad in ("right", "full", "outer"):
        with _pt.raises(ValueError):
            salted_join(big, small, "key", how=bad)


def test_replicate_skew_plants_documented_hot_keys(spark, tmp_path, monkeypatch):
    """The skew evidence in SCALE.md is only as good as the replication it
    ran on — pin `replicate_skew`'s contract at n=2 over sf0.001: (a) every
    even doc_id lands in ONE hot domain and nobody else does, (b) every
    20th doc gains the fixed UNSALTED sentence so exactly those docs share
    one shingle's posting list (it must grow ~25*n — the planted x100-hot
    pair-join key), (c) one user absorbs every 15th event, (d) dims and
    row counts are untouched replication."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ))
    import scale_sanity

    monkeypatch.setattr(scale_sanity, "SRC", "/root/testdata/sf0.001")
    out = str(tmp_path / "x2skew")
    scale_sanity.replicate_skew(spark, 2, out)

    docs = spark.read.parquet(f"{out}/documents.parquet")
    assert docs.count() == 1000  # 500 base docs x 2 replicas
    # (a) hot domain == exactly the even doc_ids (10M replica shift is
    # even, so base parity survives replication)
    hot = docs.filter(F.col("source") == "srchot")
    assert hot.count() == 500
    assert hot.filter(F.col("doc_id") % 2 != 0).count() == 0
    assert docs.filter(
        (F.col("doc_id") % 2 == 0) & (F.col("source") != "srchot")
    ).count() == 0
    # non-hot sources keep the per-replica salt (growth, not duplication)
    assert (
        docs.filter(F.col("source") != "srchot")
        .filter(~F.col("source").rlike("_r[01]$"))
        .count()
        == 0
    )
    # (b) the hot shingle's posting list: exactly the doc_id%20==0 docs
    # carry the unsalted sentence (25 per replica x 2 — and because the
    # sentence is appended AFTER token salting, its interior 3-shingle is
    # IDENTICAL across replicas: one join key with a 50-doc posting list)
    marked = docs.filter(F.col("text").contains("hotkey alpha beta gamma"))
    assert marked.count() == 50
    assert marked.filter(F.col("doc_id") % 20 != 0).count() == 0
    assert docs.filter(
        (F.col("doc_id") % 20 == 0)
        & ~F.col("text").endswith(" hotkey alpha beta gamma hotkey")
    ).count() == 0
    # (c) one hot user holds >= the reassigned 1/15 share of all events
    ev = spark.read.parquet(f"{out}/events.parquet")
    assert ev.count() == 2000
    hot_user_events = (
        ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert hot_user_events >= 2000 // 15
    # (d) dims copied byte-identical
    assert spark.read.parquet(f"{out}/region.parquet").count() == (
        spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()
    )
