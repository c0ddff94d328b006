"""Driver-proven query names — static FALLBACK sets + this round's edits.

The driver's per-round CORRECTNESS check records only the first ~50 REGISTRY
entries (dict order).  ``plans/__init__`` therefore sorts queries that do not
yet have a driver row FIRST, so each round proves a fresh batch.

Since round 8 the authoritative proven set is DERIVED at import time from
the ``CORRECTNESS_r*.json`` artifacts themselves
(:func:`._depmap.proven_from_artifacts` — a name is proven iff its most
recent driver row is green), because hand-maintained per-round frozensets
rot: round 7 never wrote a ``PROVEN_R7``, which would have burned the
round-8 window re-proving the already-green r7 batch.  The frozensets
below are kept ONLY as the fallback for a round-1 / corrupted-artifact
tree.  What this module still maintains by hand each round:
:data:`CHANGED_MODULES` (drives tier-2 re-proving) and
:data:`SLOT_PRIORITY` (rare hand-pins).
"""

# Rounds 1-5 (CORRECTNESS_r0{1..5}.json): every recorded row that was green
# or declared-rows-only.  After r5 the cumulative status is 162 hash-green,
# 16 rows-only, 0 red — every pre-r6 registry query has a driver row.
PROVEN: frozenset[str] = frozenset({
    "add_column_positional",
    "agg_bitwise_boolean",
    "agg_exact_percentiles",
    "agg_first_last_ordered",
    "agg_list_ordered",
    "agg_moments",
    "agg_regression_family",
    "agg_set_sorted",
    "ansi_safe_functions",
    "anti_join_not_exists",
    "approx_count_distinct",
    "array_map_functions",
    "asof_join_events",
    "asof_join_forward",
    "asof_join_tolerance",
    "broadcast_dim_join",
    "cast_types",
    "clean_missing_drop_column",
    "clean_missing_drop_row",
    "clean_missing_fill_mean",
    "clean_missing_fill_median",
    "clean_missing_fill_mode",
    "clean_missing_fill_value",
    "cohort_retention_weekly",
    "count_rows_total",
    "cross_join_dims",
    "crosstab_long",
    "cube_two_dims",
    "date_functions",
    "date_spine_gapfill",
    "decontaminate_corpus",
    "dedup_duplicate_spans",
    "dedup_exact_hash",
    "dedup_exact_survivors",
    "dedup_lsh_cc_survivors",
    "dedup_minhash_lsh",
    "dedup_minhash_md5",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_md5",
    "describe_column",
    "distinct_subset",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "except_all_bag",
    "filter_pandas_query",
    "flagship_revenue_by_nation",
    "freq_items_exact",
    "funnel_view_click_purchase",
    "geo_within_rect",
    "graph_connected_components",
    "graph_pagerank",
    "graph_pagerank_symmetric",
    "graph_triangle_count",
    "groupby_agg_dict",
    "groupby_count_sugar",
    "grouping_sets_mixed",
    "histogram_fixed_width",
    "hypertable_rollup_time",
    "import_compss_data_union",
    "intersect_all_bag",
    "intersect_distinct",
    "interval_join_events",
    "io_compaction",
    "io_csv_roundtrip",
    "io_json_roundtrip",
    "io_orc_roundtrip",
    "io_partitioned_pruning",
    "io_schema_merge",
    "join_inner_multikey",
    "join_left_outer",
    "join_right_outer",
    "json_functions",
    "ks_test_normal",
    "ks_test_uniform",
    "map_column",
    "math_functions",
    "ml_assoc_rules",
    "ml_binarizer",
    "ml_classification_metrics",
    "ml_count_vectorizer",
    "ml_dbscan_core_sizes",
    "ml_dbscan_point_classes",
    "ml_fpgrowth",
    "ml_gaussian_nb",
    "ml_kmeans_lloyd_fixed_init",
    "ml_kmeans_sizes",
    "ml_knn_predict",
    "ml_linear_svc_confusion",
    "ml_logreg_confusion",
    "ml_logreg_gd",
    "ml_maxabs_scaler",
    "ml_minmax_scaler",
    "ml_onehot",
    "ml_pca_project",
    "ml_poly_expansion",
    "ml_regression_metrics",
    "ml_simple_linreg",
    "ml_standard_scaler",
    "ml_stopwords_ngram",
    "ml_string_indexer",
    "ml_tfidf_norm",
    "ml_tfidf_norm_exact",
    "ml_tokenizer",
    "multimodal_bytes",
    "multimodal_features",
    "multimodal_probe_headers",
    "null_semantics",
    "parallelize_literal",
    "partitioning_invariance",
    "pipeline_corpus_curation",
    "pipeline_curation_full",
    "pipeline_span_dedup_curation",
    "pivot_status",
    "quantiles_exact",
    "range_join_incidents",
    "regexp_functions",
    "rename_drop",
    "replace_values",
    "rollup_two_dims",
    "sample_exact_n",
    "sample_hash_n",
    "select_expression",
    "select_project",
    "semi_join_exists",
    "session_window_agg",
    "sessionize_events",
    "shapefile_roundtrip_attrs",
    "similarity_topk_exact",
    "similarity_topk_ivf",
    "similarity_topk_lsh",
    "sliding_window_agg",
    "sort_with_rank",
    "split_randomly",
    "stats_corr_cov",
    "stdbscan_events",
    "stratified_sample_hash",
    "string_distance_functions",
    "string_functions",
    "subtract_distinct",
    "take_ordered",
    "text_lang_distribution",
    "text_language_id",
    "text_pii_redact",
    "text_quality_score",
    "text_repetition_stats",
    "text_token_stats",
    "topk_per_group",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_lines_by_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_pred",
    "tpch_q1_pricing_summary",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_unshipped_orders",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tumbling_window_agg",
    "union_by_name",
    "union_positional",
    "unpivot_measures",
    "window_lag_lead",
    "window_ntile_percent_rank",
    "window_running_sum",
    "wordcount_top_terms",
})

# Round-6 additions (every r6 CORRECTNESS row was green or declared
# rows-only; cumulative after r6: all 210 registered queries have a driver
# row — 194 hash-green, 16 rows-only, 0 red).
PROVEN_R6: frozenset[str] = frozenset({
    "dedup_duplicate_lines",
    "dedup_set_similarity_join",
    "dedup_fuzzy_name_pairs",
    "dedup_bloom_membership",
    "graph_connected_components_star",
    "graph_k_core",
    "multimodal_png_pixel_stats",
    "multimodal_wav_sample_stats",
    "similarity_topk_lsh_md5",
    "similarity_topk_ivf_md5",
    "similarity_topk_ivfpq_md5",
    "stats_count_min_sketch",
    "stats_hyperloglog",
    "stats_hll_per_group",
    "stats_chi_square",
    "stats_welch_ttest",
    "stats_spearman",
    "stats_mann_whitney",
    "stdbscan_core_sizes",
    "stdbscan_point_classes",
    "ml_pca_project_2d",
    "ml_robust_scaler",
    "ml_quantile_discretizer",
    "ml_multinomial_nb",
    "ml_feature_hashing_md5",
    "ml_hash_folds",
    "ks_test_normal_poly",
    "text_bpe_token_count",
    "text_corpus_drift_kl",
    "timeseries_resample_ffill",
    "timeseries_resample_interpolate",
    "timeseries_rolling_zscore",
})

# Package modules whose implementation changed THIS round (maintained by
# hand as the round progresses; package-relative dotted names, e.g.
# "llm.dedup").  plans/__init__ re-slots every proven query whose
# transitive dependency set (see _depmap) intersects this — so a refactor
# of a shared helper re-proves its dependents in the driver window even
# though their own bodies did not change.
CHANGED_MODULES: frozenset[str] = frozenset({
    # round 13 edits (updated as the round touches modules — the r12
    # VERDICT's #1 finding was that the optimization round never updated
    # this set, so the driver window skipped exactly the queries whose
    # bodies changed):
    "llm.similarity",         # ivfpq: dim from provided quantizer (no
                              # first() job); ADC/py4j build-cost trims
    "llm.packing",            # pack_sequences: width-guarded tokenize stage
    "graph.pagerank",         # size-gated broadcast-ranks + AQE-off loop gates
    "graph._scoped_conf",     # scoped_aqe_disabled + parse_byte_size added
    "llm.dedup",              # exact-collapse rep filter moved off the text
                              # table onto the narrow signature table
})

# Round-12 CHANGED_MODULES (kept for the record — NOTE: this set was
# written during the inherited BUILD window and never updated for the
# round-12 OPTIMIZATION edits (llm.sampling, ml.clustering,
# llm.similarity, llm.dedup, llm.bpe, graph.*, width, session), so the
# r12 driver window did not re-prove their dependents; the r13
# SLOT_PRIORITY pins below repay that debt with driver ground truth):
_CHANGED_MODULES_R12: frozenset[str] = frozenset({
    "llm.multimodal",         # ahash hamming-0 pair count in DECIMAL(38,0)
                              # (LongType product wrapped silently past ~3e9
                              # duplicates of one hash — r11 ADVICE)
})

# Round-11 CHANGED_MODULES (kept for the record; all re-slots consumed in
# the r11 window — every row green):
_CHANGED_MODULES_R11: frozenset[str] = frozenset({
    "llm.dedup",              # simhash_pairs max_bucket arm: count-first +
                              # semi-join (no per-bucket collect_list buffer)
    "llm.multimodal",         # ahash hamming-0 count in integer DIV (exact
                              # past 2^53)
    "functions.statistics",   # quantiles_exact_selection ±inf rank handling
    "streaming.windows",      # replay harness: RocksDB state store (heap
                              # state OOM'd a 24g JVM at 15M session keys)
})

# Round-10 CHANGED_MODULES (kept for the record; all re-slots consumed in
# the r10 window — every row green):
_CHANGED_MODULES_R10: frozenset[str] = frozenset({
    "llm.dedup",              # two-tier semantic cluster guard (warn band);
                              # decontaminate honors benchmark_grams_hint
    "ml.classification",      # new: linear_svc_gd (hinge-subgradient twin)
    "operators.joins",        # AQE scope lock hoisted; truly-unset conf restore
    "functions.statistics",   # new: quantiles_exact_selection (rank-selection
                              # exact quantiles — additive, but re-prove deps)
})

# Round-9 CHANGED_MODULES (kept for the record; all re-slots consumed in
# the r9 window — every row green):
_CHANGED_MODULES_R9: frozenset[str] = frozenset({
    "llm.dedup",              # semantic verdict-tail refactor + SRP variant;
                              # decontaminate benchmark_grams_hint
    "operators.joins",        # salted_join SHUFFLE_HASH pin
    "operators.timeseries",   # ewma_bounded join_partitions knob (default None)
    "streaming.stateful",     # streaming_ewma round_dp + chunk-concat ordering
    "ml.evaluation",          # regression error metrics re-rounded to 2 dp
})

# Round-8 CHANGED_MODULES (kept for the record; all re-slots consumed in
# the r8 window — every row green):
_CHANGED_MODULES_R8: frozenset[str] = frozenset({
    "geo.geo",                # neighbor_pairs antimeridian cell-width fix
    "functions.statistics",   # histogram_quantiles lower-bound clamp
    "llm.text",               # skipgram PMI double cast; HOF plan guard
    "sources.io",             # atomic write_binary_files overwrite, id sanitization
    "graph.pagerank",         # fused edge/node count aggregate, edges_unique contract
    "llm.dedup",              # minhash index build/probe split
})

# Round-7 CHANGED_MODULES (kept for the record; the r7 window was consumed
# by 50 new queries, so these re-slots never ran and roll into the r8
# canary rotation instead):
_CHANGED_MODULES_R7: frozenset[str] = frozenset({
    # round 7 edits:
    "functions.statistics",   # localCheckpoint boundary pinning, chi² nulls
    "functions.sketches",     # null-key contract
    "llm.bloom",              # null keys, sharded build
    "llm.multimodal",         # wav id passthrough, real JPEG decode wiring
    "llm.jpeg",               # new baseline JPEG codec
    "ml.classification",      # NB prior-argmax fallback, KNN LSH route
    "llm.dedup",              # fuzzy short-string path, LSH md5 twin
    "graph.pagerank",         # loop-scope AQE pinning
    "graph._scoped_conf",     # coalescing pinned off in loop scopes
    # round 7, second wave:
    "llm.text",               # gopher rules, zipf fit, keywords, PMI
    "llm.bpe",                # new: distributed BPE trainer
    "llm.similarity",         # int8 quantization
    "llm.sampling",           # domain cap, weighted sampling
    "operators.aggregation",  # ntile_distributed, RFM, transition matrix
    "operators.cdc",          # new: changelog apply, SCD2
    "operators.timeseries",   # bounded EWMA banded join
    "graph.lpa",              # new: label propagation, BFS layers
    "sources.io",             # text source/sink
    "geo.geo",                # geohash encoding
    "llm.multimodal",         # WAV decimation (second r7 touch)
    # round 7, third wave:
    "ml.evaluation",          # new: exact tie-corrected ROC AUC
    "llm.retrieval",          # new: BM25 retrieval
    "functions.quality",      # new: declarative expectations suite
    "functions.statistics",   # PSI drift monitor (second r7 touch)
    "operators.cdc",          # snapshot_diff (second r7 touch)
    "graph.lpa",              # weighted SSSP (second r7 touch)
    "llm.similarity",         # embedding outlier screen (second r7 touch)
    "llm.sampling",           # water-filling mixture allocation (second r7 touch)
    "llm.multimodal",         # perceptual aHash (third r7 touch)
    # round 7, fourth wave:
    "llm.dedup",              # SemDeDup, MinHash index/probe, shingles zip_with
    "llm.sampling",           # DSIR importance resampling
    "llm.text",               # KN bigram LM, normalize_text, ngrams/_pair_stream rewrite
    "llm.similarity",         # hard-negative mining
    "sources.io",             # binaryFile source/sink
    "graph.components",       # distinct-count regime gate
    "graph.pagerank",         # distinct-count regime gate (second r7 touch)
})

# Hand-pinned re-slots beyond what the dependency map finds (rarely
# needed now; kept for queries whose behavior depends on state the static
# map cannot see, e.g. fixture layout changes).
#
# Round 13: the six queries whose bodies the round-12 OPTIMIZATION
# changed but which sat outside the r12 driver window because
# CHANGED_MODULES was never updated for the optimization edits (the r12
# VERDICT's #1 finding).  All six passed the builder's own sf0.01 oracle
# gate in round 12; this pin gets them driver ground truth.
SLOT_PRIORITY: tuple[str, ...] = (
    "llm_dsir_select",               # r12 item 1+8: full-outer bucket join,
                                     # shared widened raw scan
    "ml_kmeans_lloyd_fixed_init",    # r12 item 2: per-iteration checkpoint
    "similarity_topk_ivf",           # r12 item 9: dedup removed, F.expr
    "dedup_semantic_scaled",         # r12 item 10: SHJ under the session conf
    "text_bpe_train_merges",         # r12 item 4: checkpoint release in loop
    "dedup_lsh_cc_survivors",        # r12 item 4: collapse-barrier release
)

# Round-12 SLOT_PRIORITY (kept for the record; all rows landed green in
# CORRECTNESS_r12 — 50/50 hash-green).
#
# Round 12: the graph fixture family moves to collision-free even/odd
# node ids (the r11 VERDICT caught the pagerank fixtures still on the
# +1e6 additive offset r10 retired for LPA/BFS — above 10⁶ customers the
# benchmark graph silently merged customer k+10⁶ with supplier k), plus
# the two r11-ADVICE query-body fixes (operator-derived fill-mean check,
# DECIMAL pair count).  All are plan-body changes the dep map cannot see
# from module diffs, so every one is hand-pinned into the driver window.
_SLOT_PRIORITY_R12: tuple[str, ...] = (
    "graph_pagerank",                # even/odd node ids (_cust_supp_edges)
    "graph_pagerank_symmetric",      # even/odd node ids + oracle base
    "graph_pagerank_personalized",   # even/odd node ids; seed set now
                                     # node < 100 AND even ≡ custkey < 50
    "graph_sssp_weighted",           # even/odd node ids; seeds 2·custkey
    "graph_connected_components",    # even/odd node ids (superlinear oracle
                                     # — rows-only at the driver, value parity
                                     # in tests at sf0.001)
    "graph_connected_components_star",  # same fixture, star strategy
    "graph_k_core",                  # even/odd node ids (superlinear oracle)
    "clean_missing_fill_mean",       # operator-derived check: MIN/MAX of the
                                     # filled column over originally-null rows
                                     # must equal the closed-form mean (r11
                                     # ADVICE: the closed form alone no longer
                                     # verified the fill VALUE)
    "multimodal_ahash_pair_stats",   # hamming-0 pair count in DECIMAL(38,0)
    # round-12 exact-cents hardening: every magnitude-bearing money/value
    # aggregate moved off ROUND(SUM(double), k) onto exact integer cents
    # after tpch_q5 digest-flipped at sfgen100 (summation-order error at
    # ~1e12 group sums dwarfs the 2-dp round unit)
    "tpch_q5_local_supplier_volume",   # confirmed sfgen100 flip -> cents
    "tpch_q6_forecast_revenue",        # global 4-dp sum -> cents4 (lossless)
    "tpch_q17_small_quantity_revenue", # global /7 avg -> cents + 0-dp round
    "broadcast_dim_join",              # 25 brand groups ~1e12 each -> cents
    "events_last_touch_attribution",   # channel sums over millions -> cents
    "tumbling_window_agg",             # 43k window groups -> cents
    "cdc_temporal_join",               # state groups over millions -> cents
)

# Round-11 SLOT_PRIORITY (kept for the record; all rows landed green in
# CORRECTNESS_r11):
_SLOT_PRIORITY_R11: tuple[str, ...] = (
    "graph_pagerank_symmetric",      # oracle unrolled (recursive CTE spilled
                                     # >45 GB at gen100) — re-pin the new SQL
    "clean_missing_fill_mean",       # gen1000 sweep catch: 600M-row double
                                     # sum flipped the 2-dp round; closed-form
                                     # exact-cents rewrite
    "dedup_simhash",                 # max_bucket arm: count-first + semi-join
    "dedup_simhash_md5",             # same operator, md5 hash-family twin
    "multimodal_ahash_pair_stats",   # hamming-0 pair count in integer DIV
    "quantiles_exact_scaled",        # ±inf rank handling in the selection path
    "quantiles_exact",               # sibling contract (same module)
)

# Round-10 SLOT_PRIORITY (kept for the record; all rows landed green in
# CORRECTNESS_r10):
_SLOT_PRIORITY_R10: tuple[str, ...] = (
    "null_semantics",                # EXACT integer-cents sum_coalesced (gen100 digest
                                     # sweep catch: one-group SUM over 2/3 of orders,
                                     # 2.5e12 — 2-dp round inside summation ulp)
    "io_csv_roundtrip",              # EXACT integer-cents total (same sweep catch:
                                     # 3 status groups at 1.9e12; audit had called
                                     # this site group-bounded — it is not)
    "graph_label_propagation",       # even/odd node-id spaces (gen100 sweep catch:
                                     # +1e6 supplier offset collided with custkeys
                                     # past 1e6 — self-loop asymmetry vs oracle)
    "graph_bfs_layers",              # same edge-base change (consistent re-proof)
    "tpch_q1_pricing_summary",       # EXACT money sums (integer-cents/DECIMAL, unrounded)
    "embedding_mean_pool",           # +0.0 after round: signed-zero canon split (gen10 catch)
    "ml_poly_expansion",             # +0.0 after round: same signed-zero class (gen10 catch, p4 cross-term)
    "flagship_revenue_by_nation",    # EXACT integer-cents revenue (gen100 sample catch: 4-dp round ulp-flips at 3.7e10)
    "join_bloom_runtime_filter",     # EXACT integer-cents revenue (gen100 money audit: 3 coarse groups at ~1e11, 3/3 rows flipped)
    "stream_tumbling_replay",        # watermark=_WM now explicit (was default 10m)
    "stream_sliding_replay",         # watermark=_WM now explicit
    "stream_session_replay",         # watermark=_WM now explicit
)

# Round-9 SLOT_PRIORITY (kept for the record; all rows landed green in
# CORRECTNESS_r09):
_SLOT_PRIORITY_R9: tuple[str, ...] = (
    "embedding_random_projection",   # r8 RED row: proj now sig_csv-serialized
    "dedup_semantic_scaled",         # NEW: k∝n SRP quantizer headline
    "embedding_near_dup_scaled",     # NEW: oracled k∝n near-dup blocking
    "skew_salted_join",              # NEW: hot-key fixture over salted_join
    "skew_aqe_join",                 # NEW: same fixture via AQE runtime split
    "stream_tumbling_replay",        # NEW: real-stream window-state merge
    "stream_sliding_replay",         # NEW: overlapping-window merge
    "stream_session_replay",         # NEW: session windows, single-batch
    "stream_dedup_replay",           # NEW: dropDuplicatesWithinWatermark
    "stream_stateful_running_totals",  # NEW: applyInPandasWithState
    "stream_ewma_sequential",        # NEW: bit-deterministic recurrence
    "stream_interval_join_replay",   # NEW: stream-stream join state
    "session_window_agg",            # oracle gap comparator >= -> > (Spark merges touching sessions)
    "tpch_q1_pricing_summary",       # money sums re-rounded to 2 dp (16th-digit ulp at gen-SF magnitude)
    "window_ntile_percent_rank",     # pr/cd now unrounded bit-exact divisions
    "agg_regression_family",         # day-scaled x: slope off its rounding quantum
    "ml_regression_metrics",         # error metrics 2 dp (label-scaled magnitudes)
    "dedup_semantic_md5",            # verdict tail refactored (shared helper)
    "embedding_near_dup",            # pair path unchanged-but-retouched module
    "timeseries_ewma",               # join_partitions param (default None)
    "decontaminate_corpus",          # benchmark_grams_hint arm added
    "pipeline_curation_full",        # composite over decontaminate
)
