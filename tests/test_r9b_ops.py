"""Semantic property checks for the round-9 second-wave entries —
invariants that hold for ANY input (the oracle hash gate proves engine
agreement, not semantic sanity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.queries import REGISTRY


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_jarque_bera_identity_and_counts(spark, sf_dir):
    rows = _rows(spark, sf_dir, "stat_jarque_bera")
    by_type = {r.event_type: r for r in rows}
    counts = {
        r.event_type: r.n
        for r in load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(by_type) == set(counts)
    for t, r in by_type.items():
        assert r.n == counts[t]
        assert r.jb_stat >= 0
        # jb is DERIVED from the published (grid-snapped) skew/kurt —
        # the exact identity, not just plausibility
        expect = r.n / 6.0 * (
            r.skewness**2 + r.excess_kurtosis**2 / 4.0
        )
        assert abs(r.jb_stat - expect) < 1e-4, (t, r.jb_stat, expect)


def test_durbin_watson_in_range(spark, sf_dir):
    rows = _rows(spark, sf_dir, "stat_durbin_watson")
    assert rows
    for r in rows:
        # DW lives in [0, 4]; 2 = no serial correlation
        assert 0.0 <= r.dw_stat <= 4.0, r
        assert r.n_days >= 2


def test_mi_cramers_v_bounds(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "stat_mi_cramers_v")
    # MI >= 0 up to the 1e-6 snap; NMI and V live in [0, 1]
    assert r.mi_nats >= -1e-6
    assert -1e-6 <= r.nmi <= 1.0 + 1e-6
    assert r.chi2 >= 0
    assert -1e-6 <= r.cramers_v <= 1.0 + 1e-6
    # MI is bounded by each marginal entropy; ln(min cardinality) bounds
    # both (5 langs) — a mis-normalized MI would blow past ln(5)
    assert r.mi_nats <= math.log(5) + 1e-6
    assert r.n_cells >= 2


def test_bollinger_bands_geometry(spark, sf_dir):
    rows = _rows(spark, sf_dir, "series_bollinger_bands")
    assert rows
    for r in rows:
        assert r.bb_lower <= r.bb_mid <= r.bb_upper, r
        assert 1 <= r.bb_n <= 7
        # breakout flag must agree with the published bands (snap-safe:
        # only check when clear of the 1e-6 snap grid)
        if abs(r.revenue_usd - r.bb_upper) > 1e-3 and (
            abs(r.revenue_usd - r.bb_lower) > 1e-3
        ):
            outside = (
                r.revenue_usd > r.bb_upper or r.revenue_usd < r.bb_lower
            )
            assert r.is_breakout == outside, r
    # a full 7-row frame containing its own point can never flag it
    # beyond 2 sigma unless the others are tight; at least the frame
    # must warm up monotonically at the start
    assert rows[0].bb_n == 1 and rows[0].bb_mid == rows[0].revenue_usd


def test_theil_u2_positive_and_counts(spark, sf_dir):
    rows = _rows(spark, sf_dir, "series_theil_u2")
    assert rows
    for r in rows:
        assert r.theil_u2 >= 0
        assert r.n_terms >= 1


def test_user_entropy_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "event_user_entropy")
    assert rows
    for r in rows:
        # 0 <= H <= ln(n_types), with 1e-6 slack for the per-term grid
        assert -1e-6 <= r.entropy_nats <= math.log(r.n_types) + 1e-6, r
        assert r.n_types <= r.n_events
        if r.n_types == 1:
            assert abs(r.entropy_nats) < 1e-6


def test_simpson_diversity_identities(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_simpson_diversity")
    assert rows
    for r in rows[:50]:
        assert 0.0 <= r.simpson <= 1.0, r
        # inverse Simpson is an effective type count: 1 <= D <= n
        assert 1.0 - 1e-9 <= r.inv_simpson <= r.n_tokens + 1e-9, r


def test_dim_variance_topk_sorted_nonnegative(spark, sf_dir):
    rows = _rows(spark, sf_dir, "emb_dim_variance_topk")
    assert len(rows) == 10
    vs = [r.variance for r in rows]
    assert vs == sorted(vs, reverse=True)
    assert all(v >= 0 for v in vs)
    assert all(0 <= r.dim < 64 for r in rows)


def test_ljung_box_nonnegative_and_lag_count(spark, sf_dir):
    rows = _rows(spark, sf_dir, "stat_ljung_box")
    assert rows
    for r in rows:
        assert r.lb_q >= 0
        assert r.n_lags == 5
        assert r.n_days > r.n_lags


def test_bloom_fpr_audit_one_sided_error(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "sketch_bloom_fpr_audit")
    # Bloom filters never miss: every contaminated doc is flagged
    assert r.fn == 0
    assert r.tp == r.n_contaminated
    assert r.n_flagged == r.tp + r.fp
    assert r.n_train >= r.n_flagged
    assert 0.0 <= r.fpr <= 1.0


def test_stream_markov_matches_batch_entry(spark, sf_dir):
    stream = {
        (r.src, r.dst): (r.n, r.p)
        for r in _rows(spark, sf_dir, "stream_markov_transitions")
    }
    batch = {
        (r.src, r.dst): (r.n, r.p)
        for r in _rows(spark, sf_dir, "event_markov_transitions")
    }
    # the batch entry tolerates NULL user_id rows; the fixture has none,
    # so the maps must coincide exactly
    assert stream == batch


def test_shortest_hops_bfs_invariants(spark, sf_dir):
    rows = _rows(spark, sf_dir, "graph_shortest_hops")
    assert rows
    dists = {r.node: r.hops for r in rows}
    src = min(dists)  # source is MIN(a), which is also the min node seen
    assert dists[src] == 0
    assert all(0 <= h <= 4 for h in dists.values())
    # BFS frontier property: some node at each distance up to the max
    seen = set(dists.values())
    assert seen == set(range(max(seen) + 1))


def test_seasonal_strength_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "series_seasonal_strength")
    assert rows
    for r in rows:
        assert 0.0 <= r.seasonal_strength <= 1.0 + 1e-6, r
        assert r.var_total >= 0 and r.var_residual >= 0
        # residual variance (around a fitted component) can't exceed
        # total variance beyond grid slack
        assert r.var_residual <= r.var_total + 1.0, r


def test_decayed_revenue_bounds(spark, sf_dir):
    from pyspark.sql import functions as FF

    rows = _rows(spark, sf_dir, "event_decayed_revenue")
    assert rows
    totals = {
        r.user_id: r.total
        for r in load(spark, sf_dir, "events")
        .filter(FF.col("value").isNotNull() & FF.col("ts").isNotNull())
        .groupBy("user_id")
        .agg((FF.sum("value")).alias("total"))
        .collect()
    }
    for r in rows:
        # decay weights are in (0, 1]: decayed <= undecayed total
        assert 0.0 <= r.decayed_usd <= totals[r.user_id] + 0.01, r


def test_kmv_intersection_sane(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "sketch_kmv_intersection")
    assert r.exact_intersection <= min(r.n_a, r.n_b)
    assert r.est_intersection >= 0
    # bottom-32 sketch on these set sizes: estimate within 3x
    if r.exact_intersection > 0:
        ratio = r.est_intersection / r.exact_intersection
        assert 1 / 3 <= ratio <= 3, r


def test_lead_lag_xcorr_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "series_lead_lag_xcorr")
    assert [r.lag for r in rows] == [-1, 0, 1]
    for r in rows:
        assert -1.0 - 1e-6 <= r.xcorr <= 1.0 + 1e-6
    # lag 0 uses all days; the shifted lags lose exactly one pair
    n0 = rows[1].n_pairs
    assert rows[0].n_pairs == n0 - 1 and rows[2].n_pairs == n0 - 1


def test_jsd_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_js_divergence_sources")
    assert rows
    for r in rows:
        # JSD in nats is bounded by ln 2
        assert -1e-6 <= r.jsd_nats <= math.log(2) + 1e-6, r
        assert r.n_tokens > 0


def test_lsh_bucket_skew_consistency(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "dedup_lsh_bucket_skew")
    assert r.n_singletons <= r.n_buckets
    assert r.max_bucket >= 1
    if r.max_bucket > 1:
        assert r.n_candidate_pairs >= r.max_bucket * (r.max_bucket - 1) // 2
    # every doc (with >= 3 tokens; the synthetic corpus has none shorter)
    # lands in exactly 4 band buckets, so bucket count <= 4 * docs
    docs = load(spark, sf_dir, "documents").count()
    assert r.n_buckets <= 4 * docs


def test_abc_classes_partition_revenue(spark, sf_dir):
    rows = {r.abc_class: r for r in _rows(spark, sf_dir, "part_revenue_abc")}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    shares = sum(r.revenue_share for r in rows.values())
    assert abs(shares - 1.0) < 1e-9
    # A reaches the 80% knee with FEWER parts per revenue dollar than C
    if "C" in rows:
        a, c = rows["A"], rows["C"]
        assert a.revenue_usd / a.n_parts > c.revenue_usd / c.n_parts


def test_fulfillment_lag_percentiles_ordered(spark, sf_dir):
    rows = _rows(spark, sf_dir, "order_fulfillment_lag")
    assert rows
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.p99_days, r
        assert r.n_lines > 0


def test_bigram_xent_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_bigram_perplexity")
    assert rows
    for r in rows[:100]:
        # add-1 smoothed bigram probability is in (0, 1]: H >= 0, and
        # bounded by ln(c1 + V) <= ln(total bigrams + vocab)
        assert r.cross_entropy_nats >= -1e-6, r
        assert r.n_bigrams >= 1


def test_participation_ratio_bounds(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "emb_participation_ratio")
    assert r.n_dims == 64
    # PR lives in [1, n_dims]
    assert 1.0 - 1e-6 <= r.participation_ratio <= 64.0 + 1e-6


def test_hhi_bounds(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "order_revenue_hhi")
    # HHI in [1/n, 1]; normalized in [0, 1]; top10 share <= 1
    assert 1.0 / r.n_customers - 1e-9 <= r.hhi <= 1.0 + 1e-9
    if r.hhi_normalized is not None:
        assert -1e-9 <= r.hhi_normalized <= 1.0 + 1e-9
    assert 0.0 <= r.top10_share <= 1.0 + 1e-9


def test_degree_assortativity_bounds_and_stub_count(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "graph_degree_assortativity")
    # Pearson correlation of stub degrees; NULL on a regular graph
    # (zero degree variance — the sf0.1 page graph is one)
    if r.assortativity is not None:
        assert -1.0 - 1e-6 <= r.assortativity <= 1.0 + 1e-6
    # both orientations of every undirected edge enter: m = 2|E|, and
    # sum of degrees = 2|E| too, so m_stubs must be even and positive
    assert r.m_stubs > 0 and r.m_stubs % 2 == 0
