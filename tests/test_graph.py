"""Connected-components operator: the two algorithms (min-label propagate
to fixpoint, alternating large-star/small-star) must be exact and agree —
on the real near-dup pair graph AND on the adversarial chain topology the
star variant exists for. Also pins the max_rounds escape-hatch contract."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.operators.graph import connected_components

SF = "/root/testdata/sf0.001"


def _labels(df):
    return {r.node: r.lab for r in df.collect()}


def _expected(edges):
    """Reference union-find on collected edges (tiny test graphs only)."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_matches_propagate_on_chain(spark):
    """A pure chain is the propagate worst case (diameter = n); star must
    still produce exactly the min-id labels, and both must agree."""
    n = 40
    chain = [(i, i + 1) for i in range(1, n)]
    # two extra components: a triangle and an isolated pair
    extra = [(100, 101), (101, 102), (100, 102), (200, 201)]
    edges = spark.createDataFrame(chain + extra, "src long, dst long")
    prop = _labels(connected_components(edges, algorithm="propagate"))
    star = _labels(connected_components(edges, algorithm="star"))
    assert prop == star == _expected(chain + extra)


def test_star_matches_propagate_on_real_pair_graph(spark):
    """Agreement on the actual MinHash-LSH near-dup pair graph the
    registered llm_dedup_clusters query clusters."""
    from gmall_flink_realtime4_spark.plans.catalog import queries

    qs = queries()
    prop = {
        (r.doc_id, r.cluster_id)
        for r in qs["llm_dedup_clusters"](spark, SF).collect()
    }
    star = {
        (r.doc_id, r.cluster_id)
        for r in qs["llm_dedup_clusters"](spark, SF, algorithm="star").collect()
    }
    assert prop == star and prop


def test_max_rounds_bounds_jobs_star_stays_exact(spark):
    """max_rounds is the documented propagate escape hatch: on a chain
    longer than the bound it terminates early with labels that are valid
    per-node upper bounds (>= the true min) but not all minimal —
    switching to star restores exactness with bounded rounds."""
    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long"
    )
    capped = _labels(connected_components(edges, max_rounds=3))
    exact = _labels(connected_components(edges, algorithm="star"))
    assert exact == {i: 1 for i in range(1, n + 1)}
    assert capped != exact  # the cap really did stop early on a chain
    assert all(capped[k] >= 1 and capped[k] <= k for k in capped)


def test_self_loop_only_node_kept_by_both_algorithms(spark):
    """A node whose only edge is a self-loop must appear (as its own
    component) under BOTH algorithms — the star passes drop degenerate
    edges internally, so the node set is restored from the input."""
    edges = spark.createDataFrame(
        [(7, 7), (1, 2)], "src long, dst long"
    )
    want = {7: 7, 1: 1, 2: 1}
    assert _labels(connected_components(edges, algorithm="propagate")) == want
    assert _labels(connected_components(edges, algorithm="star")) == want


def test_max_rounds_is_exact(spark):
    """max_rounds bounds propagate rounds EXACTLY: after k rounds on a
    chain, label(i) == max(1, i - k) — not rounded up to the checkpoint
    cadence."""
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long"
    )
    for k in (1, 2, 4):
        got = _labels(connected_components(edges, max_rounds=k))
        assert got == {i: max(1, i - k) for i in range(1, n + 1)}, k


def test_propagate_sweep_count_is_distance_plus_one(caplog, spark):
    """r13 per-sweep convergence: propagate must stop after exactly
    (max min-label distance + 1) sweeps — the +1 is the unavoidable
    no-change confirmation sweep (the old 3-sweeps-per-check cadence
    paid up to 3 extra sweeps past convergence)."""
    import logging

    # distance 3: chain 1-2-3-4 (label 1 reaches node 4 in 3 sweeps)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    with caplog.at_level(
        logging.INFO, logger="gmall_flink_realtime4_spark.operators.graph"
    ):
        got = _labels(connected_components(edges, algorithm="propagate"))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
    sweeps = [
        int(r.message.rsplit(" ", 2)[-2])
        for r in caplog.records
        if "sweeps" in r.message
    ]
    assert sweeps == [4]  # 3 to converge + 1 confirmation
