"""The operator-inventory query catalog.

``REGISTRY`` maps query name -> Q(fn, oracle). ``__spark_entry__.py``
exposes it to the correctness driver; ``bench.py`` runs the headline subset.
"""

from __future__ import annotations

from cassandra_sql_spark.queries import (
    aggregates,
    analytics_r6c,
    behavior,
    expressions,
    joins,
    json_ops,
    modern_sql,
    modern_sql_r6,
    more_sql,
    pipeline_queries,
    pipeline_r6,
    relational,
    selection_queries,
    setops,
    streaming_queries,
    subqueries,
    temporal_queries,
    tpch,
    tpch_extra,
    windows,
)
from cassandra_sql_spark.queries.base import Q

_MODULES = (
    tpch,
    tpch_extra,
    relational,
    joins,
    aggregates,
    windows,
    setops,
    subqueries,
    expressions,
    json_ops,
    modern_sql,
    modern_sql_r6,
    more_sql,
    pipeline_queries,
    selection_queries,
    streaming_queries,
    temporal_queries,
    behavior,
    pipeline_r6,
    analytics_r6c,
)

# The correctness driver grades only the FIRST 50 registry entries. The
# window ROTATES per round so every oracle-checked entry eventually gets a
# hard-signal driver row (r1-r5 graded 166 distinct entries, all green at
# latest grading; see CORRECTNESS_r0*.json). Round-6 window = the 15
# round-5 additions staged in the r5 NEXT_WINDOW (never driver-graded) +
# the 3 r5 hash-boundary canaries re-graded + the 4 fixtures de-vacuated
# this round (output changed -> must re-grade) + 28 regression picks
# drawn from the entries whose latest driver row is OLDEST (all last
# graded in r2 — oldest evidence first). After this round the driver-
# graded union covers every oracle-checked entry that existed at round-6
# start. ``tests/test_registry.py`` pins this composition.
PRIORITY: tuple[str, ...] = (
    # The 15 round-5 additions — first driver grading.
    "stream_session_window",
    "qualify_topn",
    "qualify_alias_filter",
    "win_ignore_nulls_fill",
    "agg_within_group",
    "agg_bool_countif",
    "agg_listagg",
    "sketch_shard_merge",
    "event_anomaly_batch",
    "agg_stats_regression",
    "expr_bitwise",
    "agg_bitwise",
    "expr_try_cast",
    "win_filter_clause",
    "pred_like_any_all",
    # r5 hash-boundary canaries, re-graded once more.
    "array_agg_per_group",
    "emb_quantize_int8",
    "stream_static_join",
    # De-vacuated this round (predicates moved onto the fixture's real
    # value domain so the result is non-empty — output changed).
    "pred_like",
    "join_anti",
    "setop_except",
    "subq_scalar_where",
    # Regression picks: oldest-evidence entries (last graded r2).
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q11_important_parts",
    "q12_ship_priority",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q19_discounted_revenue",
    "q20_volume_suppliers",
    "q21_waiting_supplier",
    "q22_global_sales",
    "agg_count_distinct",
    "agg_groupby_multi",
    "agg_having",
    "join_inner",
    "join_left_outer",
    "join_right_outer",
    "join_semi",
    "join_multiway",
    "pred_between",
    "pred_comparisons",
    "pred_in",
    "pred_null",
    "sort_limit_offset",
)

# Oracle-checked entries queued for the ROUND-7 window: the remaining
# oldest-evidence (r2-graded) entries that did not fit the 50-slot r6
# window, plus any entries ADDED during round 6. Keep in sync as round-6
# work lands; tests/test_registry.py enforces that window + NEXT_WINDOW
# + graded union covers every oracle-checked entry.
NEXT_WINDOW: tuple[str, ...] = (
    # added during round 6
    "agg_group_by_all",
    "select_star_except",
    "unpivot_measures",
    "subq_quantified",
    "expr_string_funcs2",
    "expr_regexp_funcs",
    "sketch_countmin_hh",
    "stream_countmin_hh",
    "event_funnel",
    "event_retention_cohort",
    "event_purchase_then_error",
    "graph_pagerank",
    "text_tfidf_topterms",
    "dedup_url_canonical",
    "series_gap_fill_interp",
    "asof_join_forward",
    "expr_interval_typed",
    "expr_width_bucket",
    "explode_ordinality",
    "expr_ansi_string_spellings",
    "agg_mode_deterministic",
    "scd2_intervals",
    "event_path_trigrams",
    "agg_higher_moments",
    "win_ratio_to_report",
    "pivot_native",
    "dedup_fuzzy_names",
    "sketch_kmv_distinct",
    "sample_weighted",
    "series_resample_ohlc",
    "stream_resample_ohlc",
    "fetch_with_ties",
    "agg_grouping_function",
    "text_oov_rate",
    "win_rolling_corr",
    "stat_chi_square",
    "stat_ab_welch_z",
    "agg_mad_robust",
    "agg_trimmed_mean",
    "series_pct_change",
    "win_leave_one_out",
    "text_char_entropy",
    "graph_triangle_count",
    "text_pmi_collocations",
    "text_zipf_fit",
    "series_ewma",
    "win_cumprod_growth",
    "event_markov_transitions",
    "win_rolling_median",
    "graph_degree_distribution",
    "text_ttr_diversity",
    "event_rfm_segmentation",
    "event_interarrival_stats",
    # r2-graded, deferred from the r6 window
    "agg_expr",
    "agg_global",
    "join_cross",
    "join_orderby_limit",
    "join_self",
    "limit_zero",
    "literal_select",
    "point_lookup",
    "pred_or_not",
    "sort_multicol",
)

_ALL: dict[str, Q] = {}
for _m in _MODULES:
    for _name, _q in _m.QUERIES.items():
        if _name in _ALL:
            raise ValueError(f"duplicate query name: {_name}")
        _ALL[_name] = _q

_missing = [n for n in PRIORITY if n not in _ALL]
if _missing:
    raise ValueError(f"PRIORITY names not registered: {_missing}")

REGISTRY: dict[str, Q] = {n: _ALL[n] for n in PRIORITY}
for _name, _q in _ALL.items():
    if _name not in REGISTRY:
        REGISTRY[_name] = _q
