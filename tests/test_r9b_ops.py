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


def test_degree_assortativity_bounds_and_stub_count(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "graph_degree_assortativity")
    # Pearson correlation of stub degrees
    assert -1.0 - 1e-6 <= r.assortativity <= 1.0 + 1e-6
    # both orientations of every undirected edge enter: m = 2|E|, and
    # sum of degrees = 2|E| too, so m_stubs must be even and positive
    assert r.m_stubs > 0 and r.m_stubs % 2 == 0
