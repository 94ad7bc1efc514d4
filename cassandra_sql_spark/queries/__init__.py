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
    r7_ops,
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
    r7_ops,
)

# The correctness driver grades only the FIRST 50 registry entries. The
# window ROTATES per round so every oracle-checked entry eventually gets a
# hard-signal driver row (r1-r6 graded 181 distinct entries, all green at
# latest grading; see CORRECTNESS_r0*.json). Round-7 window = 50 of the
# 53 round-6 additions that have never been driver-graded (the r6 verdict's
# top task: oldest / highest-novelty first — graph, behavioral, series,
# text, and modern-SQL entries), in the order they were staged in the r6
# NEXT_WINDOW. The 3 that do not fit plus the 10 r2-graded regression
# leftovers are staged at the FRONT of the r8 window below.
# ``tests/test_registry.py`` pins this composition and caps the
# never-graded tail at one window's capacity.
PRIORITY: tuple[str, ...] = (
    # Round-6 additions, never driver-graded — first driver grading.
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
)

# Oracle-checked entries queued for the ROUND-8 window: the 3 round-6
# additions that did not fit the 50-slot r7 window, the 10 r2-graded
# regression leftovers deferred since r6, then any entries ADDED during
# round 7 (appended as they land). Keep in sync as round-7 work lands;
# tests/test_registry.py enforces that window + NEXT_WINDOW + graded
# union covers every oracle-checked entry AND that this queue never
# exceeds one window's capacity.
NEXT_WINDOW: tuple[str, ...] = (
    # round-6 additions that did not fit the r7 window
    "text_ttr_diversity",
    "event_rfm_segmentation",
    "event_interarrival_stats",
    # r2-graded, deferred from the r6/r7 windows
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
    # round-7 additions/conversions, in landing order
    "sim_lsh_topk",      # rows-only -> oracle-checked (embedded-plane oracle)
    "decontam_bloom",    # rows-only -> oracle-checked (md5 probe family)
    "expr_interval_arith",  # typed DayTimeInterval column arithmetic
    "multimodal_decode_real",  # real BMP decode+box-resize kernel
    "sim_lsh_multiprobe",   # multi-probe LSH, embedded-plane oracle
    "series_drawdown",      # running peak / max drawdown
    "series_autocorr",      # daily-count ACF at lags 1 and 7
    "event_attribution",    # first-touch attribution
    "stat_ks_two_sample",   # Kolmogorov-Smirnov D
    "stat_gini",            # Gini concentration per event type
    "agg_percentile_disc",  # PERCENTILE_DISC semantics
    "order_cohort_ltv",     # first-order-month cohort revenue
    "stat_mann_whitney",    # rank-sum U + tie-corrected z
    "basket_pair_lift",     # market-basket pair lift
    "pred_is_distinct_from",  # ANSI null-safe inequality
    "graph_reciprocity",    # reverse-edge fraction of page graph
    "text_readability_fk",  # Flesch-Kincaid grade (exact rational)
    "stat_benford_first_digit",  # Benford audit, literal expectations
    "series_cusum_changepoint",  # CUSUM argmax day, scaled-int exact
    "asof_join_nearest",    # nearest-in-time as-of, ties backward
    "agg_weighted_median",  # integer-threshold weighted median
    "stat_pareto_share",    # parts covering 80% of brand revenue
    "expr_business_days",   # integer-day weekday-span formula
    "series_gaps_islands",  # longest consecutive-day run per user
    "stat_spearman_corr",   # midrank Spearman from integer power sums
    "event_session_conversion",  # 30-min sessions, purchase share
    "dedup_substring_winnow",  # rows-only -> oracle-checked (md5 grams)
    "dedup_simhash",        # rows-only -> oracle-checked (md5 bit votes)
    "emb_kmeans_clusters",  # rows-only -> oracle-checked (exact-int Lloyd)
    "sim_ivf_topk",         # rows-only -> oracle-checked (int-L2 IVF)
    "sim_pq_topk",          # rows-only -> oracle-checked (int ADC PQ)
    "stream_benford_digits",  # streaming first-digit audit, 9-row state
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
