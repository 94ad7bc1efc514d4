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
    r8_ops,
    r8b_ops,
    r9_ops,
    r9b_ops,
    r10_ops,
    r11_ops,
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
    r8_ops,
    r8b_ops,
    r9_ops,
    r9b_ops,
    r10_ops,
    r11_ops,
)

# The correctness driver grades only the FIRST 50 registry entries. The
# window ROTATES per round so every oracle-checked entry eventually gets a
# hard-signal driver row (r1-r10 graded 342 distinct entries, all green at
# latest grading; see CORRECTNESS_r*.json). Round-11 window = the full
# 17-entry round-10 NEXT_WINDOW queue (the 16 oracle-checked round-10
# additions, none with a driver row yet, plus the stat_kruskal_wallis
# representation canary), the 2 rows-only entries (their ONLY structural
# option is the driver's weaker rows-only record — after this round every
# registry entry has a driver row of the strongest kind it supports), and
# the 31 alphabetically-first entries of the oldest-graded cohort (latest
# driver row r4; 14 remain for r12). ``tests/test_registry.py`` pins this
# composition and caps the never-graded tail at one window's capacity.
PRIORITY: tuple[str, ...] = (
    # round-10 additions, never driver-graded, in landing order
    "jpeg_color_decode_real",  # REAL color 4:2:0 JPEG (codec #6)
    "order_revenue_gini",      # Lorenz inequality, 1e-15 share grid
    "stat_grubbs_outlier",     # max-deviation outlier + argmax day
    "series_max_drawdown",     # peak-to-trough on the day domain
    "graph_adamic_adar_topk",  # link prediction over capped wedges
    "stat_kaplan_meier",       # censored conversion survival (log S)
    "basket_lift_brand_pairs",  # market-basket lift, bounded fan-out
    "dedup_edit_distance",     # levenshtein-verified blocked pairs
    "emb_simplified_silhouette",  # centroid-based cluster quality
    "event_new_vs_returning",  # growth panel via first-seen window
    "order_repeat_purchase",   # repeat share + exact median gap
    "emb_mahalanobis_outliers",  # diagonal Mahalanobis (r11 scale fix:
    #   the r10 form floor-quantized every term to 0 — ADVICE high)
    "emb_duplicate_vectors",   # grid-hash exact vector dedup
    "stream_new_users_daily",  # stateful first-seen stream twin
    "stat_friedman_test",      # blocked weekday ranks, tie-corrected
    "event_frequency_migration",  # lifecycle band transition matrix
    # representation canary: ulp-snap added to h_stat/h_tie_corrected
    # after the sf10 gate caught cross-engine last-ulp drift (r10);
    # regrade under the new representation (only driver row is r9)
    "stat_kruskal_wallis",
    # the 2 rows-only entries (float-iterative PCA; ARRAY-output int8
    # vectors — structurally outside the hash boundary, COVERAGE.md):
    # a driver rows-only record is the strongest signal they can carry
    "emb_pca_top_component",
    "emb_quantize_int8_vec",
    # oldest-graded regrades (latest driver row r4; alphabetical first
    # 31 of the 45-entry cohort — the remaining 14 queue for r12)
    "agg_approx_percentile_bound",
    "agg_manual_pivot",
    "agg_over_join",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "emb_label_centroids",
    "emb_random_projection",
    "event_sessionize_batch",
    "explode_tokens",
    "expr_cast",
    "expr_coalesce_nullif",
    "expr_concat",
    "expr_datediff_format",
    "expr_math",
    "expr_math_transcendental",
    "expr_string_funcs",
    "expr_time_bucket_agg",
    "json_extract_scalar",
    "multimodal_binary_meta",
    "multimodal_frame_sample",
    "pack_token_budget",
    "pred_null_safe_eq",
    "range_join_events",
    "sample_md5_split",
    "series_calendar_fill",
    "setop_intersect",
    "setop_union_distinct",
    "sim_topk_bruteforce",
    "stream_dedup",
    "stream_stream_join",
    "stream_stream_left_join",
)

# Oracle-checked entries queued for the ROUND-12 window: entries ADDED
# during round 11 are appended as they land, followed by the oldest
# regrades if slots remain. tests/test_registry.py enforces that
# window + NEXT_WINDOW + graded union covers every oracle-checked entry
# AND that this queue never exceeds one window's capacity.
NEXT_WINDOW: tuple[str, ...] = (
    "jpeg_progressive_decode_real",  # REAL progressive JPEG (codec #7)
    "event_activity_gini",  # user-activity Lorenz via sharded_rank
    "stat_page_trend",      # ordered-alternative companion to Friedman
    "event_pingpong_rate",  # A->B->A bounce share, path-quality filter
    "gif_animated_frame_sample",  # REAL animated GIF (codec #8) + stride sampling
    "emb_cosine_pair_histogram",  # representation-collapse diagnostic
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
