"""Physical-plan regression guards.

Correctness is the oracle gate's job; these tests pin the PLAN properties
that matter at 100 TB — filters reaching the parquet scan, dims broadcast
instead of shuffled, column-pruned scans, no accidental cartesian products —
so a refactor can't silently trade them away.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.plans.catalog import queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filters_push_to_scan(spark):
    """P2/P4 predicates must reach the parquet reader (PushedFilters), not
    evaluate post-scan."""
    plan = _plan(spark, "dwd_trade_order_cancel_detail")
    assert "PushedFilters: [" in plan
    # the status/returnflag predicates specifically
    assert "EqualTo(o_orderstatus,F)" in plan or "o_orderstatus" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]


def test_scan_is_column_pruned(spark):
    """A 2-column text query must not read the whole documents schema."""
    plan = _plan(spark, "llm_text_fingerprint")
    scan = plan.split("ReadSchema")[1].split("\n")[0]
    assert "text" in scan and "doc_id" in scan
    assert "n_chars" not in scan and "lang" not in scan and "source" not in scan


def test_dim_joins_broadcast(spark):
    """J5: the dim enrichment must be broadcast hash joins — never a
    shuffled sort-merge of fact x dim (the whole point of replacing the
    reference's Redis/HBase cache chain)."""
    for name in ("dws_trade_sku_order_window", "dwd_trade_order_detail"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_no_cartesian_products(spark):
    """No query may degenerate to an unconstrained cross join; the only
    intended cross join is IVF's vector x centroid assignment (bounded by
    the 16-centroid broadcast)."""
    for name in (
        "dwd_trade_order_detail",
        "dws_trade_province_order_window",
        "llm_dedup_minhash_lsh",
        "llm_dedup_ngram_jaccard",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_ivf_centroids_broadcast(spark):
    """IVF assignment must broadcast the centroids (a 16-row table), never
    shuffle the base vectors against them."""
    plan = _plan(spark, "llm_ann_ivf")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_partial_aggregation_before_shuffle(spark):
    """A9: windowed aggs must show map-side partial aggregation (two
    HashAggregate phases around the exchange)."""
    plan = _plan(spark, "dws_traffic_vc_ch_ar_is_new_page_view_window")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_neardup_candidate_joins_are_equi(spark):
    """Multi-probe LSH + centroid-cell candidate generation must stay
    equi-joins on the probe/bucket key — a nested-loop pair join would be
    the O(n^2) degeneration these operators exist to avoid."""
    for name in ("llm_dedup_embedding_cosine", "llm_dedup_embedding_cells"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        # the only nested-loop allowed is the broadcast centroid
        # assignment (cells); the bucket/probe join itself must hash
        assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or (
            "ShuffledHashJoin" in plan
        ), name


def test_ivf_assignment_is_map_only(spark):
    """The IVF coarse-quantizer assignment must be MAP-ONLY (_topcells):
    centroids collapse to one broadcast array row and the argmax/
    top-nprobe is ranked in-row — a Window.partitionBy(vec_id) here would
    shuffle N x K scored rows (N^1.5 under the sqrt(N)-centroid rule).
    Since round 8 the skinny (vec_id, _top) assignment is CHECKPOINTED
    (two consumers, much smaller than its derivation), so the final plan
    must read it as ExistingRDD — computed once, never re-derived per
    consumer — and the only real Windows left are the TWO phases of the
    final per-query top-k rank (r12: the salted phase-1 slice rank plus
    the phase-2 rank over <= SALT*k survivors — a single qid window
    capped the ranking stage at 8-way parallelism at any cluster size).
    The assignment sub-plan itself is guarded map-only: one
    BroadcastNestedLoopJoin, no Window, no shuffle Exchange."""
    import contextlib
    import io
    import re

    import pyspark.sql.functions as F

    from gmall_flink_realtime4_spark import tables as T
    from gmall_flink_realtime4_spark.plans.llm_queries import _dot
    from gmall_flink_realtime4_spark.plans.llm_scale_queries import (
        IVF_N_CENTROIDS,
        IVF_NPROBE,
        _topcells,
    )

    plan = _plan(spark, "llm_ann_ivf")
    tree = plan.split("\n\n")[0]
    real_windows = re.findall(r"\bWindow \(", tree)
    assert len(real_windows) == 2, tree
    assert tree.count("Scan ExistingRDD") >= 1  # checkpointed assignment
    assert "SortMergeJoin" not in tree
    assert "CartesianProduct" not in plan

    # the assignment sub-plan (what the checkpoint materializes)
    emb = T.load(spark, SF, "embeddings")
    embn = emb.select(
        "vec_id",
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("n2"),
    )
    cent = embn.filter(F.col("vec_id") < IVF_N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("n2").alias("cn2"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _topcells(embn, cent, IVF_NPROBE).select("vec_id", "_top").explain(
            "formatted"
        )
    atree = buf.getvalue().split("\n\n")[0]
    assert "Window" not in atree
    assert atree.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in atree and "ShuffledHashJoin" not in atree
    # the only Exchanges are the two loader spreads (base + centroid
    # scans) and the 16-row centroid collect_list agg — none grows
    # superlinearly with the corpus; the N-row side never shuffles
    assert len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", atree)) <= 3


def test_embedding_cells_pair_space_never_shuffles(spark):
    """llm_dedup_embedding_cells at the sqrt(N)-centroid scale rule: the
    within-cell pair space (~N^1.5 rows) must exist only INSIDE the cell
    join — scored in the join projection and threshold-filtered, never
    exchanged, never joined back against the corpus. With SemDeDup step-0
    compression the checkpointed rep assignment means the final plan has
    NO parquet scan, NO Window, and only the rep-level exchanges: the
    cell join plus the two thresholded-candidate membership-expansion
    joins (candidate-count-sized, never pair-space-sized)."""
    plan = _plan(spark, "llm_dedup_embedding_cells")
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "Scan parquet" not in tree
    assert tree.count("Exchange") <= 4
    assert "CartesianProduct" not in plan


def test_kmeans_step_assignment_is_map_only(spark):
    """The Lloyd-step assignment must be the same map-only _topcells shape:
    no Window, no assign->embeddings join-back (the vector rides along in
    the projection) — one scan feeds the (cell, dim) aggregation."""
    plan = _plan(spark, "llm_embedding_kmeans_step")
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert tree.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in tree and "BroadcastHashJoin" not in tree


def test_time_rollup_single_expand_single_shuffle(spark):
    """The hypertable rollup must be one Expand + one aggregation shuffle,
    not a union of per-level aggregates."""
    plan = _plan(spark, "dws_time_hierarchy_rollup")
    tree = plan.split("\n\n")[0]
    assert tree.count("Expand") == 1
    assert "Union" not in plan


def test_kmv_sketch_is_partial_agg_fold_no_window(spark):
    """KMV's k-th order statistic must come from the salted k-min
    partial-aggregate fold (collect per bucket, slice to k, merge) — a
    per-group distinct-sort Window would single-thread on a hot
    event_type at scale. Covers BOTH output arms since the r9 fold: the
    per-type rows and the merged ``(all)`` union row share this plan, so
    the sketch-union path must also stay in the fold world (the former
    test_kmv_union_no_window guard).

    Since the fold, the registered query's sketch is localCheckpointed,
    which TRUNCATES the sketch's derivation out of the explained plan
    (it shows as Scan ExistingRDD) — so the fold-not-Window property
    must be pinned on the GENERATOR's own plan, pre-checkpoint, or the
    guard is vacuous (r9 review finding)."""
    import contextlib
    import io

    import pyspark.sql.functions as F

    from gmall_flink_realtime4_spark import tables as T
    from gmall_flink_realtime4_spark.plans.llm_scale_queries import (
        _kmv_group_sketch,
    )

    # 1) the sketch generator itself (pre-checkpoint): the salted fold,
    # never a Window/row_number over the hash universe
    e = T.load(spark, SF, "events").filter(F.col("user_id").isNotNull())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _kmv_group_sketch(e).explain("formatted")
    sk = buf.getvalue()
    assert "Window" not in sk
    assert "row_number" not in sk
    # bucket collect + per-group merge (collect_set plans as
    # ObjectHashAggregate), two aggregation levels
    assert sk.count("ObjectHashAggregate") >= 2

    # 2) the registered query (post-checkpoint): both consumer arms stay
    # fold-world too, and the group-sketch frame feeds them through ONE
    # checkpoint — re-deriving it per consumer would double the events
    # hash scans
    plan = _plan(spark, "llm_sketch_kmv_distinct")
    assert "row_number" not in plan
    assert "Window" not in plan
    assert plan.count("ObjectHashAggregate") + plan.count("HashAggregate") >= 2
    assert "Scan ExistingRDD" in plan


def test_range_band_join_is_hash_not_nested_loop(spark):
    """The bucketized range join must run as an equi hash join on the
    coarse bucket — never the BroadcastNestedLoopJoin a raw non-equi
    BETWEEN condition degenerates to."""
    plan = _plan(spark, "f_range_band_join")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_broadcasts_eval_side(spark):
    """Contamination check = map-side join: the (small) eval shingle set is
    broadcast; the training shingle stream is never shuffled for the join."""
    plan = _plan(spark, "llm_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_no_global_window(spark):
    """The distributed prefix sum must keep the per-doc window PARTITIONED
    (by bucket); the only unpartitioned ordered step runs on the tiny
    bucket-totals frame (after an aggregation), never on the raw docs."""
    import re

    plan = _plan(spark, "llm_pack_sequences")
    tree = plan.split("\n\n")[0]
    details = plan.split("\n\n", 1)[1] if "\n\n" in plan else plan
    # two Window nodes: bucket offsets (unpartitioned, post-agg) and
    # within-bucket cumsum (partitioned by bkt)
    assert tree.count("Window") == 2
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", details)
    partitioned = [s for s in specs if s.strip().startswith("bkt")]
    assert partitioned, specs  # the raw-doc window is keyed by bucket


def test_repetition_score_is_map_only(spark):
    """The repetition score is pure array arithmetic over the scan — no
    exchange, no explode-generated row blowup anywhere in the plan."""
    plan = _plan(spark, "llm_text_repetition")
    tree = plan.split("\n\n")[0]
    assert "Generate" not in tree  # no explode
    assert "HashAggregate" not in tree  # no per-ngram aggregation
    # the only allowed exchange is tables.load's small-input spread
    assert tree.count("Exchange") <= 1


def test_corpus_final_broadcasts_contamination(spark):
    """The composed corpus DAG must apply decontamination as broadcast
    joins (eval shingles in, contaminated ids out) — the big training side
    is never shuffled for either."""
    plan = _plan(spark, "llm_corpus_final")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pq_codebook_broadcast_assignment_map_only(spark):
    """PQ encoding must broadcast the (M x K subvector) codebook — the
    per-(vector, subspace) assignment join is map-side, never a shuffle of
    the vector corpus against the codebook."""
    plan = _plan(spark, "llm_ann_pq_encode")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_adc_search_never_scans_base_vectors_at_query_time(spark):
    """ADC candidate scoring must be codes x broadcast distance-table —
    map-side join + one sum — for ALL FOUR paths (seed, Lloyd step 1,
    Lloyd step 2, IVF-PQ); every Lloyd step must be broadcast/map-only
    (map-combined (m, cid, pos) hash agg + broadcast-codebook
    re-assignment). No sort-merge join and no cartesian anywhere in the
    whole plan. The residual join-back's shuffle_hash pin is NOT
    assertable here — the frame is eagerly checkpointed, so its join is
    laundered to ExistingRDD in this plan (the r9 census blind spot);
    test_ivfpq_residual_join_back_runtime_honest guards it on the
    un-checkpointed frame instead."""
    plan = _plan(spark, "llm_ann_pq_adc_recall")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # trained codebooks (x4), distance tables (x4+), probes, top-k frames
    # all broadcast; checkpoints feed consumers as ExistingRDD scans
    assert plan.count("BroadcastExchange") >= 3


def test_ivfpq_residual_join_back_runtime_honest(spark):
    """The IVF-PQ residual build (subspace frame x coarse assignment) is
    fact-fact on vec_id and shuffle_hash-pinned; inside the registered
    query the frame is eagerly checkpointed, so neither the static census
    nor the query's own FINAL adaptive plan can see the join (the r9
    ExistingRDD laundering blind spot — confirmed live in r11: the naive
    'ShuffledHashJoin in _plan(query)' assert fails). Guard the
    UN-CHECKPOINTED frame the query checkpoints: its final adaptive plan
    must keep the ShuffledHashJoin (no AQE broadcast promotion of the
    corpus-sized assignment) and carry no raw fact file on any broadcast
    side."""
    from gmall_flink_realtime4_spark import tables as T
    from gmall_flink_realtime4_spark.plans.llm_pipeline_queries import (
        ivfpq_residual_frame,
    )
    from tools.plan_audit import _final_plan, runtime_broadcast_findings

    emb = T.load(spark, SF, "embeddings")
    final = _final_plan(ivfpq_residual_frame(emb))
    assert "isFinalPlan=true" in final
    assert "ShuffledHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    # the ONLY broadcast is the 16 x M coarse-centroid frame (ccb),
    # derived from the fullint checkpoint — no raw fact file on any
    # broadcast side (the coarse ASSIGNMENT, which is corpus-sized,
    # must be the probe side of the SHJ, never broadcast)
    findings = runtime_broadcast_findings(final)
    assert all(not f["facts"] for f in findings), findings


def test_containment_lsh_candidates_materialized_once(spark):
    """llm_dedup_containment_lsh fans its LSH candidate frame out to three
    consumers; the frame must be localCheckpoint'ed so the minhash pipeline
    runs ONCE (r03 census: 92 Exchanges / 44 scans without it). Guard: the
    final plan reads the checkpoint (ExistingRDD) and scans `documents`
    only for the shingle pass — at most 2 parquet scans of documents."""
    plan = _plan(spark, "llm_dedup_containment_lsh")
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    n_doc_scans = plan.count("documents.parquet")
    assert n_doc_scans <= 2, f"{n_doc_scans} documents scans (expected <= 2)"


def test_scale_sanity_covers_whole_registry():
    """Every registered query must have a scale-sanity row — a query
    without one has never been watched growing, which is how scale
    regressions hide."""
    from tools.scale_sanity import QUERIES as SCALE_QUERIES

    missing = sorted(set(queries()) - set(SCALE_QUERIES))
    assert not missing, f"queries with no scale_sanity coverage: {missing}"
    unknown = sorted(set(SCALE_QUERIES) - set(queries()))
    assert not unknown, f"scale_sanity names not in registry: {unknown}"


def test_null_profile_single_pass(spark):
    """The 6-column profile must be ONE scan + one Expand-based aggregation
    — not six passes like the oracle spells."""
    plan = _plan(spark, "dq_null_profile")
    tree = plan.split("\n\n")[0]
    assert tree.count("Expand") == 1
    assert plan.count("orders.parquet") == 1


def test_pixel_stats_map_only(spark):
    """Pixel statistics is scan -> Arrow batch -> one row per image: no
    aggregation shuffle anywhere (the only allowed exchange is
    tables.load's small-input spread)."""
    plan = _plan(spark, "llm_multimodal_pixel_stats")
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree
    assert "HashAggregate" not in tree
    assert tree.count("Exchange") <= 1


def test_resize_map_only(spark):
    """Resize (identity + 2x variants) is two map-only passes unioned:
    MapInPandas present, no aggregation/join shuffle anywhere (the only
    allowed exchanges are tables.load's small-input spread, one per
    union branch)."""
    plan = _plan(spark, "llm_multimodal_resize")
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree
    assert "HashAggregate" not in tree
    assert "Join" not in tree
    assert tree.count("Exchange") <= 2


def test_audio_stats_map_only(spark):
    """Audio feature extraction is scan -> JVM WAV construction -> Arrow
    batch -> one row per payload: no shuffle at any scale."""
    plan = _plan(spark, "llm_multimodal_audio_stats")
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" in tree
    assert "HashAggregate" not in tree
    assert tree.count("Exchange") <= 1


def test_mix_domains_rates_broadcast(spark):
    """The per-source rate table (a handful of rows) must broadcast to the
    sampling scan — shuffling the corpus against it would be a full extra
    shuffle at 100 TB. The count pass is localCheckpoint'ed (ExistingRDD),
    so documents is scanned at most twice (count pass + sample pass)."""
    plan = _plan(spark, "llm_mix_domains")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("documents.parquet") <= 2


def test_rare_token_ratio_freq_materialized(spark):
    """The vocab frequency table feeds both the scalar threshold and the
    per-doc join; it must be localCheckpoint'ed (ExistingRDD in the plan)
    so the token explode runs once per consumer path, bounding documents
    scans at 2 (freq derivation happens pre-checkpoint)."""
    plan = _plan(spark, "llm_text_rare_token_ratio")
    assert "ExistingRDD" in plan
    assert plan.count("documents.parquet") <= 2
    assert "CartesianProduct" not in plan


def test_checksum_partition_single_map_combined_pass(spark):
    """The table fingerprint is ONE scan + one map-combined shuffle on
    source — two HashAggregate phases, one parquet scan, no joins."""
    plan = _plan(spark, "dq_checksum_partition")
    tree = plan.split("\n\n")[0]
    assert plan.count("documents.parquet") == 1
    assert tree.count("HashAggregate") >= 2
    assert "Join" not in tree


def test_anomaly_zscore_stats_broadcast_no_window(spark):
    """Sufficient statistics (|event_types| rows) broadcast back to the
    daily frame; no Window anywhere (a per-type Window over all days would
    serialize on hot types); partial aggregation before the daily shuffle."""
    plan = _plan(spark, "dws_event_anomaly_zscore")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in plan
    assert "Window" not in tree
    # the daily frame is localCheckpoint'ed: stats + join both read it,
    # so the fact is aggregated ONCE (one events scan, not two)
    assert "ExistingRDD" in plan
    assert plan.count("events.parquet") <= 1


def test_unpivot_is_generate_over_pivot(spark):
    """stack() compiles to a Generate over the pivoted row — the fact table
    is scanned ONCE (the pivot's pass); unpivoting must not trigger a
    second pass over events."""
    plan = _plan(spark, "f_unpivot_event_day")
    tree = plan.split("\n\n")[0]
    assert "Generate" in tree
    assert plan.count("events.parquet") == 1


def test_referential_integrity_no_cartesian_dims_broadcast(spark):
    """Every FK probe is an equi left join on the key; dim-sized parents
    (nation/region/supplier/part/customer at test sf) broadcast. No
    cartesian degeneration on any of the 7 probes."""
    plan = _plan(spark, "dq_referential_integrity")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_path_transitions_window_keyed_by_user(spark):
    """The lag() window must partition by user_id (maximum-cardinality key
    -> scales out; an unpartitioned window would serialize the corpus) and
    the transition count must be map-combined."""
    plan = _plan(spark, "dws_user_path_transitions")
    tree = plan.split("\n\n")[0]
    assert "Window" in tree
    assert "windowspecdefinition(user_id" in plan
    assert tree.count("HashAggregate") >= 2


def test_minhash_lsh_corpus_derived_once(spark):
    """The minhash signature/candidate/pruned-shingle frames are
    localCheckpoint'ed: the final plan reads checkpoints (ExistingRDD) and
    never re-scans documents (r4 census before: 8 scans / 16 Exchanges —
    the shingle explode + 12-way min-agg re-ran per join side and per
    verify consumer)."""
    plan = _plan(spark, "llm_dedup_minhash_lsh")
    assert "ExistingRDD" in plan
    assert plan.count("documents.parquet") == 0
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 10


def test_simhash_pairs_fingerprints_derived_once(spark):
    """The simhash fingerprint pipeline feeds both sides of the block
    self-join; it must be checkpointed so the final plan reads the
    materialized frame (ExistingRDD) and never re-scans documents."""
    plan = _plan(spark, "llm_dedup_simhash_pairs")
    assert "ExistingRDD" in plan
    assert plan.count("documents.parquet") == 0


def test_pii_redact_map_only_single_scan(spark):
    """PII scrub is one codegen projection over one scan: no shuffle, no
    join, no Python in the plan (the only allowed exchange is
    tables.load's small-input spread)."""
    plan = _plan(spark, "llm_pii_redact")
    tree = plan.split("\n\n")[0]
    assert plan.count("documents.parquet") == 1
    assert "HashAggregate" not in tree and "Join" not in tree
    assert tree.count("Exchange") <= 1


def test_skyline_broadcast_frontier_no_sort_merge(spark):
    """The skyline's frontier join-back and the supplier name join must
    both be broadcast hash joins over the dim-bounded frames — never a
    sort-merge shuffle of the per-supplier agg; one corpus shuffle only
    (the l_suppkey agg)."""
    plan = _plan(spark, "f_skyline_pareto_suppliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cooccurrence_pairs_map_side_no_self_join(spark):
    """Pair generation must be the basket-array explode (Generate), not a
    self-join of the collapsed frame: no sort-merge join anywhere, and the
    marginals/basket-count joins all broadcast."""
    plan = _plan(spark, "dws_event_cooccurrence_lift")
    tree = plan.split("\n\n")[0]
    assert "Generate" in tree
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_readability_map_only_single_scan(spark):
    """Readability is one codegen projection over one pruned scan: no
    shuffle, no join (the only allowed exchange is tables.load's
    small-input spread), and only doc_id/text read."""
    plan = _plan(spark, "llm_text_readability")
    tree = plan.split("\n\n")[0]
    assert plan.count("documents.parquet") == 1
    assert "HashAggregate" not in tree and "Join" not in tree
    assert tree.count("Exchange") <= 1
    scan = plan.split("ReadSchema")[1].split("\n")[0]
    assert "text" in scan and "n_chars" not in scan and "lang" not in scan


def test_reservoir_two_phase_windows(spark):
    """The sample must be salted-partial then final: exactly two Window
    ops, the first partitioned (per-salt top-K) so the unpartitioned
    final ranks only the bounded survivor frame."""
    plan = _plan(spark, "llm_sample_reservoir")
    # phase 1 compiles to the partial/final WindowGroupLimit pushdown (the
    # per-salt top-K never buffers a full partition) and phase 2 to
    # TakeOrderedAndProject over the bounded survivors — no global sort of
    # the corpus anywhere
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("row_number() windowspecdefinition") == 2


def test_pca_power_step_no_dxd_and_no_join_back(spark):
    """The scatter matvec must use the algebraic collapse: row sums ride
    in the same projection as quantization (no join back onto the
    embeddings), no D x D pair explode (a single posexplode Generate),
    and the (N, T) globals broadcast."""
    import contextlib
    import io

    from gmall_flink_realtime4_spark import tables as T
    from gmall_flink_realtime4_spark.plans.round7_ext_queries import (
        pca_dim_frame,
    )

    # the corpus-touching pipeline (pre-checkpoint): one scan, the row
    # sums fused into the quantization projection (no join-back), one
    # posexplode Generate, one pos-keyed aggregation exchange
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pca_dim_frame(T.load(spark, SF, "embeddings")).explain("formatted")
    dplan = buf.getvalue()
    dtree = dplan.split("\n\n")[0]
    assert dplan.count("embeddings.parquet") == 1
    assert "Join" not in dplan
    assert dtree.count("Generate") == 1
    assert dtree.count("Exchange") <= 2  # loader spread + pos agg
    # the assembled query: dim checkpointed once, (N, T) broadcast back —
    # never a sort-merge join
    plan = _plan(spark, "llm_embedding_pca_power_step")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_fact_fact_joins_never_broadcast(spark):
    """A fact table (orders/lineitem — grows with the corpus) must never
    be the broadcast-built side of a join: the lineitem |><| orders edges
    are pinned shuffle_hash (ShuffledHashJoin — Flink keyed-state
    stream-stream analog), dims stay broadcast. Catalyst's file-size
    estimate WOULD broadcast orders at bench scale, which is measured
    1.8x slower at x30 and strictly worse with growth."""
    for name in (
        "dwd_trade_order_detail",
        "dwd_trade_order_cancel_detail",
        "dwd_trade_order_pay_suc_detail",
        "dws_trade_trademark_category_user_refund_window",
        "dq_audit_warehouse",
    ):
        plan = _plan(spark, name)
        tree = plan.split("\n\n")[0]
        assert "ShuffledHashJoin" in tree, name
        assert "SortMergeJoin" not in tree, name
        assert "CartesianProduct" not in tree, name
        # no BroadcastExchange may sit over an unaggregated fact scan:
        # every broadcast subtree must be a dim or an aggregate. Reuses
        # the census rule itself (tools/plan_audit.py) so the test and
        # the audit cannot drift apart; none of these five queries is in
        # BOUNDED_BY_DESIGN, so anything detected is a failure.
        from tools.plan_audit import BOUNDED_BY_DESIGN, raw_fact_broadcasts

        assert name not in BOUNDED_BY_DESIGN, name
        assert raw_fact_broadcasts(plan) == [], name


def test_shingle_pair_joins_runtime_honest(spark):
    """The r9 ngram-jaccard/containment rewrite, pinned at the RUNTIME
    plan level (the static explain cannot see either property):

    - the posting-list self-join must stay ShuffledHashJoin in the FINAL
      adaptive plan — before the rewrite, AQE promoted the checkpointed
      (ExistingRDD-laundered) posting list to a broadcast build side at
      every SF where it fit, so the plan's shape silently flipped with
      scale and the static fact-broadcast census was blind to it;
    - the posting list must be derived ONCE: both join sides share one
      shingle-partitioned exchange via ReuseExchange (this is what
      replaced the localCheckpoint — the shuffle write IS the
      materialization, with no 3x-corpus local-disk copy);
    - zero BroadcastExchange subtrees anywhere (posting list, pair frame
      and per-doc counts are all corpus-sized; the sizes branch whose
      doc-cardinality frames used to broadcast is gone entirely).

    Uses the runtime-census helpers from tools/plan_audit.py so this
    guard and the --runtime audit cannot drift apart."""
    from tools.plan_audit import _final_plan, runtime_broadcast_findings

    for name in ("llm_dedup_ngram_jaccard", "llm_dedup_containment"):
        final = _final_plan(queries()[name](spark, SF))
        assert "isFinalPlan=true" in final, name
        assert "ShuffledHashJoin" in final, name
        assert "ReusedExchange" in final, name
        assert "CartesianProduct" not in final, name
        assert runtime_broadcast_findings(final) == [], name


def test_chunk_dedup_join_back_runtime_honest(spark):
    """r10 closure of the r9 verdict's runtime-census watch item: the
    chunk-dedup join-back (occurrences x distinct-chunk keepers) is
    fact-fact, and the x10 runtime census proved the sf0.001 ledger's
    self-demotion assumption WRONG — AQE still broadcast the raw exploded
    side at x10 under the repo's 64 MB threshold. Now shuffle_hash-pinned
    (r7 fact-fact rule); the FINAL adaptive plan must carry zero broadcast
    subtrees at any SF."""
    from tools.plan_audit import _final_plan, runtime_broadcast_findings

    final = _final_plan(queries()["llm_chunk_dedup"](spark, SF))
    assert "isFinalPlan=true" in final
    assert "ShuffledHashJoin" in final
    assert "CartesianProduct" not in final
    assert runtime_broadcast_findings(final) == []


def test_rare_token_join_shuffled_not_token_stream_broadcast(spark):
    """The per-doc token |><| vocab join must be a ShuffledHashJoin on
    token — Catalyst otherwise broadcast-builds the exploded TOKEN STREAM
    (the largest frame in the query) when the checkpointed vocab estimate
    exceeds the scan's file-size estimate."""
    plan = _plan(spark, "llm_text_rare_token_ratio")
    tree = plan.split("\n\n")[0]
    assert "ShuffledHashJoin" in tree


def test_quality_classifier_plan_map_side_broadcast_model(spark):
    """llm_quality_classifier must stay the cheapest possible shape:
    one pruned (doc_id, text) scan of documents, ZERO corpus shuffles
    (the only Exchange is the loader's small-file spread), and the
    1-row weights frame on the broadcast side of a
    BroadcastNestedLoopJoin — never a shuffle join, never a fact
    broadcast."""
    import re

    plan = _plan(spark, "llm_quality_classifier")
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" in tree
    assert "SortMergeJoin" not in tree
    assert "ShuffledHashJoin" not in tree
    assert "CartesianProduct" not in tree
    assert tree.count("Scan parquet") == 1
    # loader spread only — no shuffle introduced by the query itself
    assert len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", tree)) == 1
    # column pruning reached the scan
    schema = re.search(r"ReadSchema: (.*)", plan).group(1)
    assert "doc_id" in schema and "text" in schema
    assert "lang" not in schema and "source" not in schema
    # the broadcast build is the constant model, not a fact
    from tools.plan_audit import raw_fact_broadcasts

    assert raw_fact_broadcasts(plan) == []


def test_quality_train_step_single_pass_no_expand(spark):
    """llm_quality_train_step must be ONE map-combined pass: a pruned
    (text, lang) scan — doc_id is dropped before the design projection
    and pruning must reach the reader — a partial-aggregated ungrouped
    HashAggregate (every partition folds to a single 28-number row
    map-side), exactly one SinglePartition exchange beyond the loader
    spread, the 27-row stack on the 1-row result, and NO Expand (a
    grouping-sets-style Gram would replicate the corpus 27x)."""
    import re

    plan = _plan(spark, "llm_quality_train_step")
    tree = plan.split("\n\n")[0]
    assert "Expand" not in plan
    assert tree.count("Scan parquet") == 1
    assert "CartesianProduct" not in tree
    assert len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", tree)) == 2
    assert "SinglePartition" in plan
    assert "partial_sum" in plan  # map-side combine is on
    schema = re.search(r"ReadSchema: (.*)", plan).group(1)
    assert "text" in schema and "lang" in schema
    assert "doc_id" not in schema and "source" not in schema
    from tools.plan_audit import raw_fact_broadcasts

    assert raw_fact_broadcasts(plan) == []
