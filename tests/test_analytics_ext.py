"""Round-4 analytics extensions: operator contracts.

Correctness vs DuckDB is tools/parity.py's job; here we pin the operator
CONTRACTS: the mixture respects its budget, rare-ratio is a valid
per-mille, the checksum is deterministic and row-sensitive, z-scores are
centered, unpivot round-trips the pivot, FK audit counts add up, and every
event appears exactly once in the transition matrix.
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.plans.catalog import queries

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return queries()[name](spark, sf).collect()


def test_mix_domains_budget_and_bounds(spark):
    """Realized sample stays near/under the half-corpus budget; rates are
    valid per-milles; a source never samples more docs than it has."""
    rows = _rows(spark, "llm_mix_domains")
    assert rows, "no sources"
    total_docs = sum(r.n_docs for r in rows)
    total_sampled = sum(r.n_sampled for r in rows)
    for r in rows:
        assert 0 <= r.rate_permille <= 1000, r
        assert 0 <= r.n_sampled <= r.n_docs, r
    # Bernoulli realization of a <= budget target: allow hash-sampling
    # variance but the mixture must not blow past the budget materially.
    assert total_sampled <= int(0.62 * total_docs), (total_sampled, total_docs)


def test_mix_domains_temperature_flattens(spark):
    """alpha=0.5 upweights small sources: the smallest source's acceptance
    rate must be >= the largest source's."""
    rows = sorted(_rows(spark, "llm_mix_domains"), key=lambda r: r.n_docs)
    if len(rows) >= 2 and rows[0].n_docs < rows[-1].n_docs:
        assert rows[0].rate_permille >= rows[-1].rate_permille


def test_rare_token_ratio_is_valid_permille(spark):
    rows = _rows(spark, "llm_text_rare_token_ratio")
    assert rows
    for r in rows:
        assert 0 <= r.n_rare <= r.n_tokens, r
        assert 0 <= r.rare_permille <= 1000, r
        assert r.rare_permille == (1000 * r.n_rare) // r.n_tokens, r


def test_checksum_partition_deterministic_and_row_sensitive(spark):
    """Same input -> identical checksums across runs; different sources
    (different row sets) -> the fingerprint actually discriminates (no
    global collision across all sources)."""
    a = {r.source: r.content_checksum for r in _rows(spark, "dq_checksum_partition")}
    b = {r.source: r.content_checksum for r in _rows(spark, "dq_checksum_partition")}
    assert a == b
    assert len(set(a.values())) > 1 or len(a) == 1


def test_anomaly_zscore_centered_per_type(spark):
    """z-scores within an event type must roughly sum to zero (floor(1000z)
    biases each term down by <1), and each (type, day) appears once."""
    rows = _rows(spark, "dws_event_anomaly_zscore")
    assert rows
    seen = set()
    by_type: dict[str, list] = {}
    for r in rows:
        key = (r.event_type, r.day)
        assert key not in seen
        seen.add(key)
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        s = sum(r.z_milli for r in rs)
        # sum of true z is 0; flooring subtracts <1 per row
        assert -len(rs) <= s <= 0 or all(r.z_milli == 0 for r in rs), (t, s)
        for r in rs:
            # is_anomaly tests abs(z) >= 2.0 on the FLOAT; z_milli is
            # floor(1000z), so the negative boundary is ambiguous at
            # exactly -2000 (z in [-2.0, -1.999) all floor there) —
            # assert only where the milli value determines the flag
            if r.z_milli >= 2000 or r.z_milli <= -2001:
                assert r.is_anomaly == 1, r
            elif -2000 < r.z_milli < 2000:
                assert r.is_anomaly == 0, r


def test_unpivot_round_trips_pivot_mass(spark):
    """Total unpivoted counts == total events; shape == days x 5 types."""
    from gmall_flink_realtime4_spark import tables as T

    rows = _rows(spark, "f_unpivot_event_day")
    n_events = T.load(spark, SF, "events").count()
    assert sum(r.ct for r in rows) == n_events
    days = {r.day for r in rows}
    assert len(rows) == len(days) * 5


def test_referential_integrity_counts_add_up(spark):
    """n_child matches the child table size for every edge; orphans+nulls
    never exceed the child count; driver testdata is referentially clean."""
    from gmall_flink_realtime4_spark import tables as T

    sizes = {
        t: T.load(spark, SF, t).count()
        for t in ("lineitem", "orders", "customer", "supplier", "nation")
    }
    rows = _rows(spark, "dq_referential_integrity")
    assert len(rows) == 7
    for r in rows:
        child = r.fk_name.split(".")[0]
        assert r.n_child == sizes[child], r
        assert r.n_null_fk + r.n_orphans <= r.n_child, r


def test_path_transitions_conserve_events(spark):
    """Every event is exactly one 'next' in its user's sequence, so
    sum(n_transitions) == |events|; '_start' rows == |distinct users|."""
    from gmall_flink_realtime4_spark import tables as T

    rows = _rows(spark, "dws_user_path_transitions")
    ev = T.load(spark, SF, "events")
    assert sum(r.n_transitions for r in rows) == ev.count()
    n_users = ev.select("user_id").distinct().count()
    start_total = sum(
        r.n_transitions for r in rows if r.prev_event_type == "_start"
    )
    assert start_total == n_users
