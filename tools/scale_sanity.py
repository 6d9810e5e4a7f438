"""Scale-sanity harness: replicate sf0.1 N-fold and re-run the headline
queries, verifying the plans HOLD as data grows (near-linear wall-clock, no
OOM, no plan flip to cartesian/sort-merge-of-dims).

Replication is key-aware so the workload scales like real growth, not like
a degenerate duplicate pile:

- facts (lineitem/orders/events) shift their keys per replica; dims
  (region/nation/customer/supplier/part) stay fixed — fact/dim ratio grows
  like a real warehouse, dim joins stay broadcast.
- documents: every token is salted per replica, so shingle/minhash/simhash
  candidate spaces scale ~linearly instead of quadratically across replicas
  (10 exact copies of every doc would mean a 100x pair blowup — growth, not
  scale).
- embeddings: vec_id shifts; query set stays replica-0 (fixed query budget
  over a growing base — the ANN serving pattern).

Usage: python tools/scale_sanity.py [N] [query ...]
(with query names given, only those run — for re-measuring a changed plan)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from gmall_flink_realtime4_spark.plans.catalog import queries  # noqa: E402
from gmall_flink_realtime4_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
QUERIES = [
    "dws_trade_sku_order_window",
    "dwd_trade_order_detail",
    "dws_trade_province_order_window",
    "dwd_base_log_page",
    "llm_dedup_exact",
    "llm_dedup_minhash_lsh",
    "llm_dedup_simhash",
    "llm_dedup_simhash_pairs",
    "llm_dedup_embedding_cosine",
    "llm_dedup_clusters",
    "llm_ann_cosine_topk",
    "llm_ann_ivf",
    "llm_text_quality_score",
    "llm_multimodal_decode",
    "llm_sample_stratified",
    "llm_pack_sequences",
    "llm_decontaminate",
    "llm_ann_pq_encode",
    "llm_ann_pq_adc_recall",
    "llm_dedup_edit_distance_verify",
    # round 3
    "llm_chunk_dedup",
    "llm_ngram_heavy_hitters",
    "llm_tfidf_top_terms",
    "llm_dedup_containment",
    "f_bloom_prefilter_semi_join",
    "f_pivot_event_day",
    "f_window_suite_orders",
    "dws_cube_event_stats",
    "llm_split_train_val_test",
    "llm_type_token_ratio",
    "llm_dedup_containment_lsh",
    "f_top_users_per_event_type",
    "dq_outlier_mad_events",
    "llm_length_decile_curriculum",
    "dq_reconcile_orders_lineitem",
    "f_set_ops_source_overlap",
    "llm_dup_span_coverage",
    "llm_embedding_covariance",
    # round 4: full registry coverage — every registered query gets a x-N row
    "dwd_base_db_router",
    "dwd_interaction_comment_info",
    "dwd_trade_cart_add",
    "dwd_trade_order_cancel_detail",
    "dwd_trade_order_pay_suc_detail",
    "dwd_trade_order_refund",
    "dws_trade_cart_add_uu_window",
    "dws_trade_order_window",
    "dws_trade_payment_suc_window",
    "dws_trade_trademark_category_user_refund_window",
    "dws_traffic_home_detail_page_view_window",
    "dws_traffic_source_keyword_page_view_window",
    "dws_traffic_vc_ch_ar_is_new_page_view_window",
    "dws_user_user_login_window",
    "dws_user_user_register_window",
    "p1_json_parse_validity_filter",
    "f_asof_join_latest_order",
    "f_conditional_cast_math",
    "f_date_formats",
    "f_json_props_extract",
    "dq_audit_warehouse",
    "llm_ann_ivf_trained_recall",
    "llm_dedup_embedding_cells",
    "llm_embedding_kmeans_step",
    "llm_multimodal_frame_sample",
    "llm_neardup_recall",
    "llm_sketch_histogram_quantiles",
    "llm_sketch_kmv_distinct",
    "llm_dedup_ngram_jaccard",
    "llm_text_token_count",
    "llm_text_langid",
    "llm_text_length_quantiles",
    "llm_corpus_prepare",
    "llm_text_fingerprint",
    "f_range_band_join",
    "llm_text_repetition",
    "llm_corpus_final",
    "dwd_base_log_start",
    "dwd_base_log_err",
    "dwd_base_log_display",
    "dwd_base_log_action",
    "dim_app_router",
    "dim_app_materialize",
    "dws_sliding_window_events",
    "llm_corpus_rollup",
    "dws_user_event_funnel",
    "dws_session_window_events",
    "dws_time_hierarchy_rollup",
    "dws_user_retention_cohort",
    "dws_gap_fill_locf_daily_orders",
    "dim_scd2_user_event_intervals",
    # new in round 4
    # (llm_sketch_kmv_union folded into llm_sketch_kmv_distinct in r9)
    "llm_multimodal_pixel_stats",
    "dq_null_profile",
    "llm_mix_domains",
    "llm_text_rare_token_ratio",
    "dq_checksum_partition",
    "dws_event_anomaly_zscore",
    "f_unpivot_event_day",
    "dq_referential_integrity",
    "dws_user_path_transitions",
    # new in round 5
    "llm_multimodal_resize",
    "llm_multimodal_audio_stats",
    "llm_pii_redact",
    "llm_text_unigram_surprisal",
    "llm_text_bigram_surprisal",
    "llm_bpe_pair_counts",
    "f_entity_resolution_customers",
    "llm_sketch_countmin",
    "llm_dedup_url_normalize",
    "llm_multimodal_image_dedup",
    "llm_multimodal_image_neardup_pairs",
    "llm_sample_domain_cap",
    "llm_embedding_quantize_int8",
    "f_zorder_layout_audit",
    "dq_table_stats_profile",
    "dq_sketch_join_cardinality",
    "llm_bpe_train_merges",
    "llm_bpe_encode_corpus",
    "dws_event_type_pagerank",
    "llm_sketch_hll_distinct",
    "llm_bm25_topk",
    "llm_winnow_fingerprints",
    "dq_distribution_drift_ks",
    "dq_vocab_drift",
    "dq_langid_eval",
    "llm_lsh_tuning_curve",
    "dq_benford_first_digit",
    "llm_sample_pps",
    "llm_multimodal_audio_resample",
    "dws_dau_wau_stickiness",
    # round 7
    "f_skyline_pareto_suppliers",
    "dws_event_cooccurrence_lift",
    "llm_text_readability",
    "llm_sample_reservoir",
    "llm_embedding_pca_power_step",
    # round 8
    "llm_quality_classifier",
    # round 9
    "llm_quality_train_step",
]

DIMS = ["region", "nation", "customer", "supplier", "part"]


def replicate(spark, n: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    okey_span = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1

    def _union(parts):
        out_df = parts[0]
        for p in parts[1:]:
            out_df = out_df.unionByName(p)
        return out_df

    _union(
        [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * okey_span))
            for i in range(n)
        ]
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    _union(
        [
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * okey_span)
            )
            for i in range(n)
        ]
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    _union(
        [
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
            for i in range(n)
        ]
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    _union(
        [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            .withColumn(
                "text",
                F.regexp_replace("text", " ", f" s{i}") if i else F.col("text"),
            )
            for i in range(n)
        ]
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    _union(
        [
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            for i in range(n)
        ]
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scaled = f"/tmp/spark_graft_scale_x{n}"
    spark = get_spark("scale_sanity")
    if not os.path.exists(f"{scaled}/embeddings.parquet"):
        print(f"# replicating sf0.1 x{n} -> {scaled}", file=sys.stderr)
        replicate(spark, n, scaled)
    qs = queries()
    missing = sorted(set(qs) - set(QUERIES))
    if missing:  # registry drift: a query with no scale row is invisible
        print(f"# WARNING not scale-covered: {missing}", file=sys.stderr)
    unknown = [a for a in sys.argv[2:] if a not in qs]
    if unknown:  # a typo must not silently fall back to the FULL x-N sweep
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        sys.exit(2)
    run_list = list(sys.argv[2:]) or QUERIES
    # Untimed warm-up (the bench.py discipline): JVM JIT, parquet footers,
    # Arrow/Python workers, and whole-stage codegen all first-touch on
    # someone — without this the sweep charged ~10 s of session warm-up to
    # run_list[0] (dws_trade_sku_order_window read 13.5 s in-sweep vs ~2 s
    # warm in round 8's ×10 sweep). The warm-up is QUERY-NEUTRAL since r9
    # (r8 ADVICE): r8 warmed with a full untimed rep of run_list[0], which
    # gave that one query a dedicated warm rep (its own shuffle files,
    # codegen, broadcast reuse) no other query received — its in-sweep
    # number read systematically warmer than the rest. Now a fixed
    # NON-registered plan exercises the same machinery classes (scan,
    # shuffle hash-agg, broadcast join, codegen, Arrow workers) without
    # favoring any registered query; run_list[0] absorbs whatever residual
    # session warm-up remains (noted in SCALE.md).
    li = spark.read.parquet(f"{scaled}/lineitem.parquet")
    nat = spark.read.parquet(f"{scaled}/nation.parquet")
    (
        li.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .join(F.broadcast(nat), F.col("l_suppkey") % 25 == F.col("n_nationkey"))
        .count()
    )
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()
    results = {}
    for name in run_list:
        t0 = time.perf_counter()
        cnt = qs[name](spark, scaled).count()
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": dt, "rows": cnt}
        print(f"# {name}: {cnt} rows in {dt}s", file=sys.stderr)
    print(json.dumps({"scale": f"sf0.1 x{n}", "results": results}))


if __name__ == "__main__":
    main()
