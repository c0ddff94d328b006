"""Driver-proven query names from prior rounds.

The driver's per-round CORRECTNESS check records only the first ~50 REGISTRY
entries (dict order).  ``plans/__init__`` therefore sorts queries that do not
yet have a driver row FIRST, so each round proves a fresh batch.  A name
belongs here once some CORRECTNESS_r{N}.json contains its row (green hash
match, or the rows-only result for declared rows-only queries).
"""

# Round 1 (CORRECTNESS_r01.json): all 50 recorded entries.
PROVEN: frozenset[str] = frozenset({
    "add_column_positional",
    "agg_first_last_ordered",
    "agg_list_ordered",
    "agg_set_sorted",
    "anti_join_not_exists",
    "approx_count_distinct",
    "asof_join_events",
    "broadcast_dim_join",
    "cast_types",
    "clean_missing_drop_column",
    "clean_missing_drop_row",
    "clean_missing_fill_mean",
    "clean_missing_fill_median",
    "clean_missing_fill_mode",
    "clean_missing_fill_value",
    "count_rows_total",
    "cross_join_dims",
    "cube_two_dims",
    "date_functions",
    "distinct_subset",
    "except_all_bag",
    "filter_pandas_query",
    "flagship_revenue_by_nation",
    "groupby_agg_dict",
    "groupby_count_sugar",
    "intersect_all_bag",
    "intersect_distinct",
    "join_inner_multikey",
    "join_left_outer",
    "join_right_outer",
    "map_column",
    "pivot_status",
    "range_join_incidents",
    "rename_drop",
    "replace_values",
    "rollup_two_dims",
    "sample_exact_n",
    "sample_hash_n",
    "select_expression",
    "select_project",
    "semi_join_exists",
    "sort_with_rank",
    "split_randomly",
    "string_functions",
    "subtract_distinct",
    "take_ordered",
    "topk_per_group",
    "tpch_q1_pricing_summary",
    "union_by_name",
    "union_positional",
})


# Queries that existed in round 1 but got NO driver row (the file stopped at
# 50 entries).  VERDICT.md round-1 task #1: prove these next — they outrank
# round-2 additions for the ~50 per-round slots.
R1_UNPROVEN: tuple[str, ...] = (
    "math_functions", "json_functions", "window_running_sum",
    "window_lag_lead", "tumbling_window_agg", "session_window_agg",
    "interval_join_events", "hypertable_rollup_time",
    "tpch_q3_unshipped_orders", "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume_customer", "stats_corr_cov", "crosstab_long",
    "describe_column", "freq_items_exact", "ks_test_uniform",
    "ks_test_normal", "dedup_exact_hash", "dedup_exact_survivors",
    "text_token_stats", "text_quality_score", "text_lang_distribution",
    "text_language_id", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_minhash_md5", "dedup_simhash_md5", "dedup_ngram_jaccard",
    "embedding_near_dup", "similarity_topk_exact", "similarity_topk_lsh",
    "similarity_topk_ivf", "multimodal_bytes", "multimodal_features",
    "ml_kmeans_lloyd_fixed_init", "ml_kmeans_sizes", "ml_knn_predict",
    "ml_logreg_gd", "ml_logreg_confusion", "ml_simple_linreg",
    "ml_regression_metrics", "ml_classification_metrics", "ml_fpgrowth",
    "ml_tfidf_norm", "ml_tfidf_norm_exact", "graph_pagerank",
    "graph_pagerank_symmetric", "geo_within_rect", "stdbscan_events",
)

# Round-2 additions answering VERDICT.md tasks 2/3/7 (feature-op,
# estimator, io/facade oracle queries) — second in line for driver slots;
# remaining round-2 additions (extra TPC-H shapes, window/stats extras)
# follow in registration order.
R2_PRIORITY: tuple[str, ...] = (
    "ml_tokenizer", "ml_stopwords_ngram", "ml_count_vectorizer",
    "ml_string_indexer", "ml_onehot", "ml_binarizer", "ml_minmax_scaler",
    "ml_maxabs_scaler", "ml_standard_scaler", "ml_poly_expansion",
    "ml_pca_project", "ml_gaussian_nb", "ml_linear_svc_confusion",
    "ml_assoc_rules", "ml_dbscan_core_sizes", "ml_dbscan_point_classes",
    "io_csv_roundtrip", "io_json_roundtrip", "parallelize_literal",
    "import_compss_data_union", "partitioning_invariance",
    "shapefile_roundtrip_attrs", "graph_connected_components",
    "text_repetition_stats", "text_pii_redact", "decontaminate_corpus",
    "dedup_lsh_cc_survivors", "pipeline_curation_full",
    "io_partitioned_pruning",
)
