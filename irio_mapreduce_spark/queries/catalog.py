"""Registry mapping query name -> (Spark callable, optional DuckDB oracle SQL).

Every operator declared done in SURVEY.md §2 has an entry here; the driver
runs the Spark callable and the oracle SQL side-by-side at sf0.01 and
hash-compares results (CORRECTNESS_r{N}.json). Conventions that make the
comparison meaningful:

* every computed/aggregate column is aliased identically on both sides
  (the driver sorts columns BY NAME before hashing);
* floating-point aggregates are ``round()``-ed on both sides (Spark and
  DuckDB sum in different orders; unrounded doubles would hash-mismatch);
* no raw timestamp columns in outputs — formatted to strings on both sides
  (timezone-independent);
* results are sets: any ORDER BY inside a query exists only to make limits /
  ranks deterministic (unique tie-breaks), never for output order;
* integer-valued ``sum()`` is CAST to BIGINT in the oracle (DuckDB types an
  integer sum / ``list_sum`` as HUGEINT, which pandas materializes as
  float64 -> ``5995.0`` vs Spark's ``5995`` hash-mismatches);
* double sums needing rounding accumulate as ``DECIMAL(38,10)`` on BOTH
  sides then cast back to double — decimal addition is exact and
  partition-merge-order-insensitive, so the subsequent ``round`` can never
  straddle a boundary run-to-run; prefer rounding the DECIMAL itself and
  casting after (``round(dec, 2)::DOUBLE``): rounding the cast double
  still hits exact half-boundary values that the engines break
  differently (found at sf0.1 by q11: 290998.915 → .92 vs .91);
* no array/map/struct columns in any output — even rows-only checks
  canonicalize via pandas ``sort_values``, which crashes on unhashable
  cells; wrap with ``to_json`` / ``array_join`` / explode to rows;
* when per-term values are rational, prefer FIXED-POINT BIGINT arithmetic
  (``(num * 10^k) div den``, exact integer sums) over casting the double
  quotient to DECIMAL: the double→DECIMAL cast itself rounds differently
  between engines in the last ulp (Spark rounds the exact BigDecimal
  expansion, DuckDB the double-scaled product), and DuckDB's
  DECIMAL→DOUBLE conversion double-rounds where Spark's is correctly
  rounded — both observed (pagerank 5/1600 nodes; OLS moments). Casting
  an exact BIGINT to double is correctly rounded in both engines, so a
  fixed sequence of scalar IEEE ops on integer moments can even
  hash-match UNROUNDED doubles (``stats_ols_price_vs_qty``).

* INDEPENDENT DERIVATION (the r10 month-encoding lesson): the oracle
  must not share data-shaping fragments (axis encodings, bucketing
  formulas, series construction) with the query under test — a shared
  fragment makes the hash blind to same-wrong-value bugs (the yyyyMM
  month axis deflated every cross-year Theil-Sen slope ~89x ON BOTH
  ENGINES and would have hash-matched). Where sharing a fragment is the
  point (the Welch / OLS-2 Cramer templates, formatted into both engines
  so the IEEE op trees are structurally identical and unrounded doubles
  hash-match), the shared formula itself must be pinned against FIRST
  PRINCIPLES by a property test (an independent implementation or
  invariant — tests/test_properties.py, "Shared-fragment oracle sweep"
  section); mirrored-but-independently-written formulas with zero
  rounding slack get the same treatment.

These conventions are enforced by tests/test_conventions.py.

Queries whose semantics are intentionally approximate or non-SQL (HLL counts,
LSH bucketing, streaming state) register with ``oracle=None`` -> the driver
records a weaker rows-only check and pytest covers them with bound checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# The external correctness driver checks the FIRST 50 entries of
# ``all_queries()`` per round, so listing order is the scoreboard rotation
# dial. This list pins the front of the window explicitly; everything else
# follows in module-registration order. Since round 11 (the r1-r10
# driver-green union covers the ENTIRE catalog), rotation is a REFRESH
# cycle — this round's fresh entries lead (never driver-checked, the r11
# deferred pair first per the overflow valve), and the remaining slots go
# to the entries whose latest
# driver-green row is OLDEST (the r3/r4 vintage), so attestation
# freshness stays bounded. Rotated-out entries keep their standing driver
# rows and stay fully oracle-tested in tests/test_oracle.py.
# tests/test_conventions.py asserts both the registry consistency and the
# refresh discipline (window refresh slots = globally oldest-attested).
FRONT_WINDOW: list[str] = [
    # round-12 head: the two entries that landed after the r11 window
    # filled (DEFERRED_TO_NEXT_WINDOW last round — the mandatory head per
    # the overflow valve), then round-12 additions appended as each lands
    # with a green oracle test; every addition evicts refresh entries
    # from the TAIL (newest-vintage, then alphabetically-last) to keep 50.
    "window_range_frame_trailing",
    "fn_selective_agg_family",
    "join_cbo_stats_broadcast",
    "layout_cached_multi_consumer",
    "stream_rocksdb_changelog_resume",
    "ml_isotonic_pav",
    "ml_target_encoding_loo",
    "source_jsonl_gzip",
    "stats_benjamini_hochberg",
    "events_allen_interval_relations",
    "multimodal_real_qoi",
    "stats_brown_forsythe",
    "ml_random_forest_stumps",
    "graph_local_max_matching",
    "fn_parameterized_sql",
    "graph_functional_scc",
    "stats_wilcoxon_signed_rank",
    "stats_cochran_armitage",
    "dedup_prefix_filter_jaccard",
    "source_parquet_agg_pushdown",
    "source_parquet_nested_pruning",
    "stats_mcnemar_paired",
    "stats_kruskal_wallis",
    "stats_jonckheere_terpstra",
    "events_m4_downsample",
    "stats_gini_concentration",
    "ml_cumulative_gains_deciles",
    "graph_ktruss_peel_rounds",
    "sim_mmr_rerank",
    "stats_logrank_test",
    "text_rake_keywords",
    "ml_kfold_cv_stump",
    "join_cbo_reorder_3way",
    "fn_regexp_family",
    "window_ignore_nulls_locf",
    "sort_limit_offset_pagination",
    "events_ohlc_candles",
    "events_max_drawdown",
    # refresh cycle: the remaining slots hold the catalog entries with
    # the oldest driver-green rows — the 10 r3-vintage entries, then the
    # alphabetically-first r4-vintage block. tests/test_conventions.py
    # enforces the staleness invariant (no attested entry outside the
    # window is staler than one inside), so this prose never has to be
    # trusted.
    "stream_static_join_rollup",
    "stream_stream_join_attrib",
    "stream_tumbling_rollup",
    "text_decontamination",
    "text_quality_filter",
    "text_token_stats",
    "udf_grouped_agg",
    "udf_grouped_map",
    "udf_pandas_scalar",
    "udf_python_udtf",
    "agg_approx_distinct",
    "agg_collect_list_orders",
]

# Round-11 window, kept for the audit trail (all 50 driver-green in
# CORRECTNESS_r11.json; rotated out of the checked window in round 12).
_R11_WINDOW: list[str] = [
    "stream_kmeans_model_rounds",
    "layout_bucketed_agg",
    "agg_aqe_coalesce_partitions",
    "stream_checkpoint_kill_resume",
    "stream_tws_list_state",
    "source_xml_attributes_escaping",
    "graph_closeness_centrality",
    "join_range_bucket_expansion",
    "multimodal_real_aiff",
    "agg_unpivot_metrics",
    "multimodal_zip_archive",
    "stats_mad_robust",
    "ml_matthews_corrcoef",
    "source_fixed_width",
    "multimodal_gif_frame_sample",
    "fn_group_by_all",
    "sample_neyman_allocation",
    "stream_foreachbatch_dual_sink",
    "join_interval_overlap_pairs",
    "agg_grouping_sets",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "dedup_exact_sha",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "events_json_props",
    "events_session_window",
    "events_sliding_window",
    "events_tumbling_window",
    "filter_in_like_between",
    "fn_array_higher_order",
    "fn_datetime_family",
    "fn_hash_family",
    "fn_map_family",
    "fn_math_conditional",
    "fn_string_family",
    "global_stats",
    "mr_wordcount",
    "multimodal_payload_stats",
    "pipeline_curation_end_to_end",
    "q10_returned_items",
    "sample_hash_mod",
    "sample_per_source_quota",
    "sim_centroid_per_label",
    "sim_cosine_topk",
    "sort_global_total_order",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "stats_skew_kurtosis",
    "stream_stateful_dedup",
]

# Round-10 window, kept for the audit trail (all 50 driver-green in
# CORRECTNESS_r10.json — completing the full-catalog driver-green union;
# rotated out of the checked window in round 11).
_R10_WINDOW: list[str] = [
    "events_sliding_distinct_users",
    "ml_confusion_threshold_sweep",
    "text_bpe_apply_tokens",
    "agg_mode_exact",
    "events_changepoint_sse",
    "graph_hits_hubs_authorities",
    "stats_mann_whitney_u",
    "join_null_skew_isolation",
    "udf_pandas_scalar_iter",
    "stats_permutation_test",
    "stats_spearman_rank",
    "stats_anova_oneway",
    "stats_kendall_tau_grouped",
    "stats_bootstrap_poisson",
    "stats_theil_sen_grouped",
    "events_kaplan_meier",
    "events_peak_concurrency",
    "agg_weighted_median",
    "graph_jaccard_link_prediction",
    "graph_degree_assortativity",
    "source_binaryfile_ingest",
    "source_glob_recursive_lookup",
    "source_csv_multiline_quoted",
    "udf_arrow_python_scalar",
    "stream_stream_right_outer",
    "stream_windowed_distinct_users",
    "multimodal_real_tga",
    "multimodal_real_ico",
    "multimodal_real_tiff_deflate",
    "multimodal_wav_mulaw",
    "window_count_distinct_running",
    "agg_multi_bucket_single_scan",
    "events_acf_multilag",
    "ml_perceptron_batch_rounds",
    "text_hashing_trick_features",
    "udf_pandas_agg_over_window",
    "join_manual_bloom_semireduction",
    "join_asof_tolerance",
    "stats_two_proportion_z",
    "multimodal_real_wav_stereo",
    "ml_cohens_kappa",
    "quality_distribution_drift_l1",
    "sample_negative_pairs",
    "graph_modularity_components",
    "multimodal_real_png_adam7",
    "stream_tws_map_state",
]

# How many entries at the HEAD of FRONT_WINDOW are fresh this round
# (newly added or freshly rotated in) — bench.py runs exactly this many
# unmeasured warm-up passes so first-use machinery cost (JVM codegen,
# pandas-worker spawn, streaming scheduler) never lands on the rows a
# verdict diff scrutinizes. MUST be updated together with FRONT_WINDOW
# at each rotation (r10 ADVICE.md: a hard-coded literal in bench.py
# silently warmed the wrong count after rotation). Round 12: the 2
# deferred-head entries + fresh round-12 entries (grows as each lands).
WINDOW_WARMUP_COUNT: int = 38

# Entries that did not fit the current 50-slot window and therefore form
# the MANDATORY head of the NEXT round's window (tests/test_conventions.py
# asserts the plan). Empty while the round-12 window has free budget
# (the r11 deferred pair now leads FRONT_WINDOW); additions beyond the
# budget append HERE (never displacing the window head) and stay fully
# oracle-tested per-entry in tests/test_oracle.py meanwhile.
DEFERRED_TO_NEXT_WINDOW: list[str] = []

# Round-9 window, kept for the audit trail (all 50 driver-green in
# CORRECTNESS_r09.json; rotated out of the checked window in round 10).
_R9_WINDOW: list[str] = [
    "graph_pagerank_personalized",
    "sim_ann_lsh_multiprobe",
    "udf_cogrouped_map",
    "join_asof_nearest",
    "events_cross_correlation_lag",
    "stream_dedup_within_watermark",
    "multimodal_real_bmp_rle8",
    "fn_sql_udf_family",
    "source_dirtail_partitioned_stream",
    "ml_tree_predict_rollup",
    "layout_compact_small_files",
    "source_malformed_json",
    "quality_observe_metrics",
    "ml_adaboost_stumps",
    "stream_tws_stateful_totals",
    "stream_dedup_index_maintenance",
    "stream_asof_nearest_attrib",
    "fn_variant_family",
    "fn_execute_immediate",
    "source_partition_range_pruning",
    "ml_kmeans_parallel_init",
    "text_bm25_rational_topk",
    "join_dynamic_partition_pruning",
    "stream_tws_session_timers",
    "stream_observe_metrics",
    "join_strategy_hints",
    "pipeline_backfill_incremental",
    "quality_rowcount_drift",
    "mr_secondary_sort",
    "sample_stratified_lrm",
    "source_rowgroup_stats_pruning",
    "subq_not_in_null_semantics",
    "text_bpe_train_merges",
    "graph_sssp_weighted",
    "join_salted_skew",
    "events_interval_union",
    "events_pattern_match_regex",
    "stream_stream_left_semi",
    "multimodal_real_netpbm",
    "ml_ridge_shrinkage",
    "sink_dynamic_partition_overwrite",
    "mr_distributed_grep",
    "events_anomaly_3sigma",
    "events_seasonal_decompose",
    "ml_gbt_residual_stumps",
    "quality_benford_first_digit",
    "quality_id_gap_ranges",
    "layout_hilbert_tiles",
    "events_session_capped",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle SQL) to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    front = {n: _QUERIES[n] for n in FRONT_WINDOW if n in _QUERIES}
    back = {n: f for n, f in _QUERIES.items() if n not in front}
    return {**front, **back}


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)
