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
# follows in module-registration order. Round-4 rotation (VERDICT.md item
# 1): every entry WITHOUT a green CORRECTNESS row from round 3 — the 13
# never-driver-checked entries, the 28 last green in r1/r2, and the 7
# reshaped approximate entries (now oracle-checkable) — fills the window;
# r3-green entries rotate out on their standing rows, staying fully
# oracle-tested in tests/test_oracle.py. tests/test_conventions.py asserts
# this list stays consistent with the registry.
FRONT_WINDOW: list[str] = [
    # never driver-checked before round 4
    "udf_row_at_a_time",
    "events_multires_rollup",
    "text_langid_stopwords",
    "text_fingerprint",
    "text_bpe_ish_tokens",
    "dedup_exact_prefix",
    "dedup_incremental_batch",
    "sim_pairs_bruteforce",
    "source_dirtext_wordcount",
    "sample_train_val_split",
    "sample_token_budget_batches",
    "agg_unpivot_part_metrics",
    "fn_generator_family",
    # reshaped approximate entries: first possible hash-green rows
    "dedup_simhash",
    "sim_ann_ivf_topk",
    "sim_ann_lsh_topk",
    "agg_sketch_suite",
    "agg_approx_distinct",
    "agg_percentiles_approx",
    "multimodal_decode_features",
    # new this round: the reference's JSON batch-file client surface
    "mr_batch_json_wordcount",
    # last green in r1/r2, outside r3's window
    "mr_wordcount_top20",
    "join_left_outer_nation_customers",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_right_outer_orders_customers",
    "join_full_outer_nation_activity",
    "join_cross_theta_acctbal",
    "join_range_price_bands",
    "join_asof_order_events",
    "join_asof_bucketed",
    "setops_customer_keys",
    "setops_multiset_priorities",
    "window_topk_orders_per_customer",
    "window_rank_functions",
    "window_running_and_moving",
    "window_lag_lead_gaps",
    "window_lead_next_order",
    "agg_collect_list_orders",
    "agg_rollup_flag_status",
    "agg_cube_flag_status",
    "agg_pivot_status_by_flag",
    "agg_percentiles_collect",
    "agg_salted_skew_sum",
    "subq_above_average_spenders",
    "subq_orders_vs_customer_avg",
    "distinct_part_brand_type",
    # round-4 additions: three shape-diverse representatives of the new
    # adapted-TPC-H module take the window's remaining slots
    "q4_priority_exists",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
]

# Round-4 additions that do NOT fit the 50-slot window (47 slots carry the
# rotation debt from rounds 1-3, 3 carry the new module's representatives).
# These are fully oracle-tested per-entry in tests/test_oracle.py and are
# first in line for the round-5 window rotation.
DEFERRED_TO_NEXT_WINDOW: list[str] = [
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q19_bracketed_or_revenue",
    "q22_idle_customers",
    "source_orc_roundtrip",
    "text_chunk_windows",
    "text_repetition_metrics",
    "text_pii_redaction",
    "stream_session_rollup",
    "sample_mixture_weights",
    "join_null_safe_eq",
    "q11_important_part_value",
    "agg_histogram_totalprice",
    "stream_custom_stateful_totals",
    "q2_min_cost_supplier",
    "q12_shipmode_priority",
    "q16_supplier_part_counts",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_daily_gap_fill",
    "udf_grouped_map_arrow",
    "events_variant_props",
    "recursive_cte_hierarchy",
    "text_tfidf_top_terms",
    "sample_weighted_priority",
    "events_type_change_intervals",
    "sim_int8_quantization",
    "sim_ann_pq_topk",
    "stats_chisq_contingency",
    "dedup_bloom_prefilter",
    "dedup_substring_spans",
    "text_unigram_surprisal",
    "graph_pagerank_purchases",
    "merge_scd1_upsert",
    "text_normalize_c4",
    "source_hive_partitioned_pruned",
    "window_time_range_revenue",
    "sim_matryoshka_recall",
    "profile_documents_columns",
    "stats_ols_price_vs_qty",
    "events_markov_transitions",
    "stream_cdc_upsert",
    "multimodal_real_roundtrip",
    "multimodal_real_resize",
    "dedup_cluster_pick_best",
    "multimodal_real_segments",
    "source_malformed_csv",
    "source_schema_evolution",
    "fn_bitwise_family",
    "window_distribution_ranks",
    "quality_fk_conformance",
    "pipeline_ingest_end_to_end",
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
