"""The sf10 scale-correctness gate, as a machine-readable list.

Through round 11 the gate's membership lived in COVERAGE.md prose (103
entries hash-green at sf10). This script makes it executable: every name
in ``GATE`` runs on Spark at the sf10 decade (500k docs / 60M lineitem /
~10M events — ``scripts/make_sf1.py``'s 100 key-offset copies of sf0.1)
and its DuckDB oracle replays on the same parquet, compared with the
driver-faithful strict hash (``cassandra_sql_spark.testing.compare``).

Why a separate gate when sf0.01 already hash-checks everything: three
defect classes are INVISIBLE at small scale and were each caught here —
(1) accumulation-order ulp drift crossing the 9-sig-digit boundary only
at sf10 magnitudes (stat_kruskal_wallis, r10), (2) int64 overflow in
moment/guard arithmetic that small counts never reach
(emb_mahalanobis_outliers, r10), (3) RangePartitioner boundary reseeding
that only splits differently once partitions are full
(operators/global_order, r11).

Entries whose DIRECT oracle is brute-force-infeasible at 500k docs run
through ``scripts/verify_sf10_dedup.py``'s copy-expansion oracle
(DELEGATED below); entries whose Spark plan is bounded but whose DuckDB
replay is not are SPARK_ONLY with the documented reason (the driver
still sees their sf0.01 hash row; this gate then checks rows execute and
row counts are sane at sf10).

Usage:
  PYTHONUNBUFFERED=1 python scripts/sf10_gate.py [sf10_dir] [--new] [name ...]
    --new   run only the round-12 additions (R12_ADDITIONS)

(PYTHONUNBUFFERED matters: the harness block-buffers under a pipe and a
stalled oracle can eat a whole wave's output — COVERAGE.md, r11.)
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from cassandra_sql_spark.io import TABLES  # noqa: E402
from cassandra_sql_spark.queries import REGISTRY  # noqa: E402
from cassandra_sql_spark.session import get_spark  # noqa: E402
from cassandra_sql_spark.testing import compare  # noqa: E402

# --- gate membership --------------------------------------------------------

# r9: the full 20-query bench headline set (SCALE.md §9)
BENCH_SET = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q9_product_profit", "q10_returned_items",
    "q18_large_volume_customer", "agg_count_distinct", "agg_rollup",
    "win_topk_per_group", "win_running_agg", "subq_correlated",
    "setop_union_distinct", "json_filter_agg", "expr_time_bucket_agg",
    "decontam_ngram_overlap", "text_repetition_filter", "sim_topk_bruteforce",
]

# r10: rewritten scale-hazard entries, the 16 r10 additions, the graph
# family, and the r9 stat/series/text tier (COVERAGE.md r10 block)
R10_WAVE = [
    "order_fulfillment_lag", "sketch_kmv_intersection", "order_revenue_hhi",
    "series_lead_lag_xcorr",
    "jpeg_color_decode_real", "order_revenue_gini", "stat_grubbs_outlier",
    "series_max_drawdown", "graph_adamic_adar_topk", "stat_kaplan_meier",
    "basket_lift_brand_pairs", "dedup_edit_distance",
    "emb_simplified_silhouette", "event_new_vs_returning",
    "order_repeat_purchase", "emb_mahalanobis_outliers",
    "emb_duplicate_vectors", "stream_new_users_daily", "stat_friedman_test",
    "event_frequency_migration",
    "graph_pagerank", "graph_triangle_count", "graph_clustering_coeff",
    "graph_jaccard_neighbors",
    "stat_runs_test", "stat_levene_brown_forsythe", "stat_jarque_bera",
    "stat_durbin_watson", "stat_ljung_box", "stat_mi_cramers_v",
    "stat_kendall_tau", "stat_theil_sen", "stat_ols_trend",
    "stat_kruskal_wallis", "series_bollinger_bands", "series_theil_u2",
    "series_seasonal_strength", "event_user_entropy",
    "text_simpson_diversity", "text_js_divergence_sources",
    "emb_dim_variance_topk", "event_decayed_revenue",
]

# r11: the full r8 behavioral/event family + dedup/selection/text wave
R11_WAVE = [
    "event_funnel", "event_retention_cohort", "event_rfm_segmentation",
    "event_attribution", "event_sessionize_batch", "event_markov_transitions",
    "event_interarrival_stats", "event_churn_weekly", "event_stickiness",
    "event_audience_overlap", "event_max_concurrent_sessions",
    "event_bounce_rate_daily", "event_debounce_audit", "event_time_to_convert",
    "event_path_trigrams", "event_purchase_then_error", "event_anomaly_batch",
    "event_session_conversion",
    "dedup_exact", "dedup_url_canonical", "dedup_fuzzy_names",
    "dedup_repeated_chunks", "decontam_bloom", "sample_global_shuffle",
    "sample_md5_split", "sample_source_quota", "sample_stratified",
    "sample_stratified_quota", "sample_temperature", "sample_weighted",
    "dsir_importance", "sample_unimax", "mix_source_kl", "pack_token_budget",
    "text_novelty", "text_gopher_filters", "text_quality_classifier",
    "text_oov_rate", "text_length_histogram",
]

# r12: the rest of the stat/series/graph/emb families (the exact-integer
# stat grids are precisely where sf10 ulp drift hides — r11 verdict #4),
# the r11 additions, and the order/basket/sketch/skyline remainder.
R12_ADDITIONS = [
    # stat remainder
    "stat_ab_welch_z", "stat_anova_weekday", "stat_benford_first_digit",
    "stat_chi_square", "stat_gini", "stat_ks_two_sample",
    "stat_mann_whitney", "stat_page_trend", "stat_pareto_share",
    "stat_spearman_corr", "stat_wilcoxon_signed_rank",
    # series remainder
    "series_autocorr", "series_calendar_fill", "series_cusum_changepoint",
    "series_drawdown", "series_ewma", "series_gap_fill_interp",
    "series_gaps_islands", "series_pct_change", "series_peak_detection",
    "series_resample_ohlc", "series_revenue_mom_yoy", "series_seasonal_naive",
    # graph remainder (shortest_hops stays a documented oracle skip)
    "graph_degree_assortativity", "graph_degree_distribution",
    "graph_reciprocity",
    # emb remainder (kmeans/pca are rows-only; the rest are oracle-checked)
    "emb_centroid_drift", "emb_cosine_pair_histogram", "emb_knn_label_vote",
    "emb_label_centroids", "emb_label_dispersion", "emb_norm_quantiles",
    "emb_participation_ratio", "emb_quantize_int8", "emb_quantize_int8_vec",
    "emb_random_projection",
    # round-11 additions not already above
    "jpeg_progressive_decode_real", "gif_animated_frame_sample",
    "event_activity_gini", "event_pingpong_rate",
    # order/basket/sketch/skyline remainder
    "order_cohort_ltv", "basket_pair_lift", "skyline_pareto_2d",
    "sketch_kmv_distinct", "sketch_countmin_hh", "sketch_mg_heavy_hitters",
    "sketch_shard_merge",
]

# Verified through scripts/verify_sf10_dedup.py's copy-expansion oracle
# (direct all-pairs oracles are O(n^2)-infeasible at 500k docs).
DELEGATED = [
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_containment",
    "text_sentence_dedup",
]

# Spark side runs at sf10; DuckDB replay skipped for documented
# ORACLE cost (not operator cost). The gate executes the Spark side and
# checks the row count is positive.
SPARK_ONLY = {
    "sketch_bloom_fpr_audit": "3-scan md5 bitmap over 10M rows in DuckDB",
    "graph_shortest_hops": "recursive CTE re-derives the 10M-row edge "
    "list per BFS frontier",
    "dedup_survivor_selection": "oracle's recursive cluster derivation "
    ">20 min at 500k docs",
    "dedup_cross_source_audit": "same recursive-oracle class",
}

GATE = (
    BENCH_SET + R10_WAVE + R11_WAVE + R12_ADDITIONS + sorted(SPARK_ONLY)
)


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    new_only = "--new" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/repo/.scale/sf10"
    only = set(argv[1:])

    names = R12_ADDITIONS if new_only else GATE
    if only:
        names = [n for n in names if n in only]

    spark = get_spark("sf10-gate")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name in SPARK_ONLY:
            ok = len(rows) > 0
            print(
                f"{'PASS' if ok else 'FAIL'} {name}: spark-only "
                f"{len(rows)} rows [{t_spark:.1f}s] "
                f"(oracle skip: {SPARK_ONLY[name]})"
            )
            n_pass += ok
            n_fail += not ok
            continue
        try:
            rel = con.sql(q.oracle)
            ocols = list(rel.columns)
            orows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = compare(rows, cols, orows, ocols, strict=True)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(
                f"PASS {name}: {len(rows)} rows "
                f"[spark {t_spark:.1f}s, total {time.time() - t0:.1f}s]"
            )
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail "
          f"({len(DELEGATED)} delegated to verify_sf10_dedup.py)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
