"""Unit tests for operators/joins.py::asof_join (backward point-in-time)."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.operators.joins import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 5, "e1"),
            ("u1", 10, "e2"),   # == right ts -> inclusive match
            ("u1", 17, "e3"),
            ("u2", 3, "e4"),    # before any right row -> NULL
            ("u3", 9, "e5"),    # key absent on right -> NULL
        ],
        "uid string, ts long, ev string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 2, 100.0),
            ("u1", 10, 200.0),
            ("u1", 15, 300.0),
            ("u2", 8, 400.0),
        ],
        "key string, rts long, price double",
    )
    return left, right


def test_asof_backward_inclusive_and_left_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, "uid", "key", "ts", "rts",
        right_cols=["price"],
    )
    got = {r["ev"]: r["price"] for r in out.collect()}
    assert got == {
        "e1": 100.0,   # latest right at ts<=5 is rts=2
        "e2": 200.0,   # rts=10 == ts=10 inclusive
        "e3": 300.0,   # rts=15
        "e4": None,    # no right row at ts<=3
        "e5": None,    # key never on right
    }
    assert out.count() == left.count()  # left join keeps all rows


def test_asof_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, "uid", "key", "ts", "rts",
        right_cols=["price"], how="inner",
    )
    assert sorted(r["ev"] for r in out.collect()) == ["e1", "e2", "e3"]


def test_asof_single_shuffle_no_range_join(spark):
    """Plan guard: the log-merge formulation must not produce a nested-loop
    or cartesian range join — one exchange on the key, one window."""
    left, right = _frames(spark)
    plan = asof_join(
        left, right, "uid", "key", "ts", "rts", right_cols=["price"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_asof_join_null_payload_fields_not_stitched(spark):
    """The matched right ROW must arrive atomically: a NULL field in the
    latest right row must stay NULL, not be filled from an older row —
    and an inner join must keep a match whose payload fields are NULL."""
    from gmall_flink_realtime4_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("k", 3), ("k", 0)], "id string, lts int"
    )
    right = spark.createDataFrame(
        [("k", 1, 5, 1), ("k", 2, None, 2)],
        "rid string, rts int, a int, b int",
    )
    got = {
        r.lts: (r.a, r.b)
        for r in asof_join(
            left, right, "id", "rid", "lts", "rts", ["a", "b"], how="inner"
        ).collect()
    }
    # lts=3 matches the rts=2 row WHOLE: a stays NULL (no reach-back to
    # the rts=1 row's a=5); lts=0 has no match and inner drops it
    assert got == {3: (None, 2)}
