"""Round-6 extension operators: perceptual image dedup (aHash),
skew-resistant per-domain cap sampling, z-order layout audit.

Correctness is the oracle gate's job (all three are parity-gated); these
pin the plan properties (codec materialized once, salted two-phase window,
single-shuffle audit) and the algebraic invariants (two-phase top-K ==
one-window top-K, aHash python-model equivalence, z-curve locality) a
refactor could silently lose.
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.plans.catalog import queries
from gmall_flink_realtime4_spark.plans.round6_ext_queries import (
    CAP_NSALT,
    DOMAIN_CAP,
    ZB,
    ZB_BITS,
    _interleave_sql,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# plan guards
# ---------------------------------------------------------------------------


def test_image_dedup_codec_materialized_once(spark):
    """The aHash fingerprint frame feeds the group agg AND the join-back;
    it must be localCheckpoint'ed so the mapInPandas codec runs ONCE — the
    final plan reads the checkpoint (ExistingRDD) and never rescans
    documents or re-enters Python."""
    plan = _plan(spark, "llm_multimodal_image_dedup")
    assert "ExistingRDD" in plan
    assert plan.count("documents.parquet") == 0
    assert "MapInPandas" not in plan  # already ran, inside the checkpoint
    assert "CartesianProduct" not in plan


def test_domain_cap_two_windows_salted(spark):
    """The cap plan must be the two-phase form: two Window/row_number
    passes, the first partitioned by (source, salt) — not one global
    window per domain (the skew hazard the operator exists to avoid)."""
    plan = _plan(spark, "llm_sample_domain_cap")
    assert plan.count("Window") >= 2
    # phase-1 partition expression carries the doc_id % NSALT salt
    assert f"% {CAP_NSALT}" in plan or f"% cast({CAP_NSALT}" in plan.lower()


def test_zorder_audit_one_agg_shuffle(spark):
    """Scan -> generate (2 rows per input) -> one (layout, file_id) agg:
    no join, and the only exchanges are the input spread + the single
    aggregation shuffle."""
    plan = _plan(spark, "f_zorder_layout_audit")
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree
    assert tree.count("Exchange") <= 2


# ---------------------------------------------------------------------------
# algebraic invariants
# ---------------------------------------------------------------------------


def test_domain_cap_two_phase_equals_one_window(spark):
    """Global top-K per domain == top-K of per-(domain, salt) top-Ks.
    Compare the registered two-phase plan against the textbook single
    window over the same deterministic rank key."""
    got = {
        (r["source"], r["pick_rank"], r["doc_id"])
        for r in queries()["llm_sample_domain_cap"](spark, SF).collect()
    }
    from gmall_flink_realtime4_spark import tables as T
    from gmall_flink_realtime4_spark.plans.llm_scale_queries import (
        _hexval_sql,
    )
    from pyspark.sql import Window

    d = (
        T.load(spark, SF, "documents")
        .select(
            "source",
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("hx"),
        )
        .withColumn("u", F.expr(_hexval_sql("hx", "instr")))
    )
    w = Window.partitionBy("source").orderBy("u", "doc_id")
    ref = {
        (r["source"], r["pick_rank"], r["doc_id"])
        for r in d.withColumn(
            "pick_rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("pick_rank") <= DOMAIN_CAP)
        .select("source", "pick_rank", "doc_id")
        .collect()
    }
    assert got == ref and len(got) > 0


def test_image_dedup_ahash_python_model(spark):
    """Reproduce every fingerprint from scratch in Python (the container
    construction rule -> luma -> integer mean threshold -> bit pack) and
    require exact agreement with the Spark codec path."""
    rows = queries()["llm_multimodal_image_dedup"](spark, SF).collect()
    got = {r["doc_id"]: (r["ahash_hex"], r["n_ones"]) for r in rows}
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    model = {}
    for rec in t:
        if rec["doc_id"] % 3 != 0:
            continue
        plane = (rec["text"] + "x" * 144)[:144].encode()
        luma = [
            plane[3 * i] + plane[3 * i + 1] + plane[3 * i + 2]
            for i in range(48)
        ]
        total = sum(luma)
        bits = [1 if 48 * v >= total else 0 for v in luma]
        ah = 0
        for b in bits:
            ah = (ah << 1) | b
        model[rec["doc_id"]] = (format(ah, "012x"), sum(bits))
    assert got == model and len(model) > 0


def test_image_dedup_keeper_is_group_min(spark):
    """Dedup contract: keeper is the minimum doc_id of its hash group, and
    exactly group_size-1 members are flagged dup."""
    rows = queries()["llm_multimodal_image_dedup"](spark, SF).collect()
    by_hash: dict[str, list] = {}
    for r in rows:
        by_hash.setdefault(r["ahash_hex"], []).append(r)
    for members in by_hash.values():
        keeper = min(m["doc_id"] for m in members)
        assert all(m["keeper_doc_id"] == keeper for m in members)
        assert all(m["group_size"] == len(members) for m in members)
        assert sum(m["is_dup"] for m in members) == len(members) - 1


def test_zorder_interleave_model_and_locality(spark):
    """(a) the generated interleave template matches a from-scratch Python
    bit interleave on the full bucket grid edge rows; (b) the audit output
    exhibits the z-curve property the op exists for: z-order files span
    ~sqrt(cells) in BOTH dims while linear files span the full b2 range."""
    # (a) template == python model, via a tiny in-memory frame
    probe = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 200)]
    df = spark.createDataFrame(probe, "b1 int, b2 int").withColumn(
        "z", F.expr(_interleave_sql("b1", "b2", "div"))
    )
    for r in df.collect():
        z = 0
        for i in range(ZB_BITS):
            z |= ((r["b1"] >> i) & 1) << (2 * i + 1)
            z |= ((r["b2"] >> i) & 1) << (2 * i)
        assert r["z"] == z
    # (b) locality: per-file spans from the registered query
    rows = queries()["f_zorder_layout_audit"](spark, SF).collect()
    zo = [r for r in rows if r["layout"] == "zorder"]
    li = [r for r in rows if r["layout"] == "linear"]
    assert zo and li
    zmax = max(max(r["span_b1"], r["span_b2"]) for r in zo)
    assert zmax <= 32  # square 32x32 tiles (1024 cells / file)
    assert max(r["span_b2"] for r in li) > 2 * zmax


def test_domain_cap_rank_key_matches_md5(spark):
    """The pick order really is the 48-bit md5(doc_id) prefix: recompute it
    in Python for every kept row."""
    rows = queries()["llm_sample_domain_cap"](spark, SF).collect()
    assert rows
    for r in rows:
        hx = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:12]
        assert r["u"] == int(hx, 16)
