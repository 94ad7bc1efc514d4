"""Hand-computed (numpy/pandas) triangulation of the round-10 stat
entries: the oracle compare proves Spark == DuckDB; these prove the
shared SQL actually computes the statistic it claims, via a third,
straight-line implementation over the same parquet fixtures."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from cassandra_sql_spark.queries import REGISTRY


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def test_gini_matches_numpy(spark, sf_dir):
    row = REGISTRY["order_revenue_gini"].fn(spark, sf_dir).collect()[0]
    o = _orders(sf_dir)
    o = o[o.o_custkey.notna()]
    cents = np.floor(o.o_totalprice.values * 100 + 0.5).astype(np.int64)
    d = (
        pd.DataFrame({"k": o.o_custkey.values, "c": cents})
        .groupby("k")["c"].sum()
    )
    dollars = np.floor(d.values / 100.0 + 0.5).astype(np.int64)
    x = np.sort(dollars)
    n, s = len(x), x.sum()
    gini = 2.0 * (np.arange(1, n + 1) / n * (x / s)).sum() - (n + 1) / n
    assert row.n_customers == n
    assert abs(row.gini - gini) < 1e-6, (row.gini, gini)


def test_grubbs_matches_numpy(spark, sf_dir):
    row = REGISTRY["stat_grubbs_outlier"].fn(spark, sf_dir).collect()[0]
    e = _events(sf_dir)
    e = e[e.ts.notna() & e.value.notna()]
    cents = np.floor(e.value.values * 100 + 0.5).astype(np.int64)
    daily = (
        pd.DataFrame({"day": e.ts.dt.date.values, "c": cents})
        .groupby("day")["c"].sum()
    )
    r = np.floor(daily.values / 100.0 + 0.5).astype(np.int64)
    n = len(r)
    # the entry's dollar-grid deviations
    z = np.floor((r * n - r.sum()) / n + 0.5).astype(np.int64)
    sd = math.sqrt((z * z).mean() - z.mean() ** 2)
    g = np.abs(z).max() / sd
    assert row.n_days == n
    assert abs(row.grubbs_g - g) < 1e-5, (row.grubbs_g, g)
    # peak day = argmax |z|, min-day tiebreak
    mz = np.abs(z).max()
    peak = min(d for d, zz in zip(daily.index, z) if abs(zz) == mz)
    assert row.peak_day == peak


def test_kaplan_meier_matches_hand_computation(spark, sf_dir):
    out = {
        r.t_days: r
        for r in REGISTRY["stat_kaplan_meier"].fn(spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    e = e[e.ts.notna() & e.user_id.notna()]
    subjects = []
    for _, g in e.groupby("user_id"):
        clicks = g[g.event_type == "click"]
        if clicks.empty:
            continue
        fc = clicks.ts.min()
        conv = g[(g.event_type == "purchase") & (g.ts >= fc)]
        if conv.empty:
            t = (g.ts.max().date() - fc.date()).days
            subjects.append((t, 0))
        else:
            t = (conv.ts.min().date() - fc.date()).days
            subjects.append((t, 1))
    subjects = pd.DataFrame(subjects, columns=["t", "ev"])
    log_s = 0.0
    dead = False
    for t in sorted(subjects.t.unique()):
        d = int(subjects[(subjects.t == t)].ev.sum())
        at_risk = int((subjects.t >= t).sum())
        if d == 0:
            continue
        row = out[t]
        assert row.n_at_risk == at_risk, (t, row.n_at_risk, at_risk)
        assert row.n_conversions == d
        if dead or d == at_risk:
            dead = True
            assert row.log_survival is None
            continue
        log_s += math.log(1.0 - d / at_risk)
        assert abs(row.log_survival - log_s) < 1e-5, (t, row.log_survival)
    assert set(out) == {
        int(t) for t in subjects.t.unique()
        if int(subjects[subjects.t == t].ev.sum()) > 0
    }


def test_max_drawdown_matches_numpy(spark, sf_dir):
    row = REGISTRY["series_max_drawdown"].fn(spark, sf_dir).collect()[0]
    e = _events(sf_dir)
    e = e[e.ts.notna() & e.value.notna()]
    cents = np.floor(e.value.values * 100 + 0.5).astype(np.int64)
    daily = (
        pd.DataFrame({"day": e.ts.dt.date.values, "c": cents})
        .groupby("day")["c"].sum().sort_index()
    )
    r = np.floor(daily.values / 100.0 + 0.5).astype(np.int64)
    peak = np.maximum.accumulate(r)
    dd = peak - r
    assert row.max_drawdown_usd == dd.max()
    trough = min(d for d, v in zip(daily.index, dd) if v == dd.max())
    assert row.trough_day == trough


def test_mahalanobis_matches_numpy(spark, sf_dir):
    out = REGISTRY["emb_mahalanobis_outliers"].fn(spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    Q = np.stack([
        np.floor(np.asarray(v, np.float64) * 1e6 + 0.5)
        for v in emb.embedding
    ]).astype(np.int64)
    n = Q.shape[0]
    s1 = Q.sum(axis=0).astype(np.float64)
    s2 = (Q.astype(np.float64) ** 2).sum(axis=0)
    var = s2 / n - (s1 / n) ** 2
    const = Q.min(axis=0) == Q.max(axis=0)
    dev = (Q.astype(np.float64) * n - s1) / n
    term = np.where(const, 0.0, dev * dev / np.where(const, 1.0, var))
    t = np.floor(term * 1e9 + 0.5).astype(np.int64)
    s = t.sum(axis=1)
    ranked = sorted(zip(-s, emb.vec_id.values))[:15]
    for row, (neg_s, vid) in zip(out, ranked):
        assert row.vec_id == vid, (row.vec_id, vid)
        expect = float(-neg_s) / 1e9
        assert abs(row.mahalanobis_sq - expect) < 1e-5, (
            row.mahalanobis_sq, expect
        )
    # magnitudes: expected Mahalanobis-sq ~ d for inliers; the top
    # entry must be a real outlier, not a floor-quantized zero
    assert out[0].mahalanobis_sq > Q.shape[1], out[0].mahalanobis_sq


def test_silhouette_matches_numpy(spark, sf_dir):
    rows = {
        r.label: r
        for r in REGISTRY["emb_simplified_silhouette"]
        .fn(spark, sf_dir).collect()
    }
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb.label.notna()]
    Q = np.stack([
        np.floor(np.asarray(v, np.float64) * 1e6 + 0.5)
        for v in emb.embedding
    ]).astype(np.int64)
    labels = emb.label.values.astype(int)
    uniq = sorted(set(labels))
    cent = {
        lb: (Q[labels == lb].sum(axis=0), (labels == lb).sum())
        for lb in uniq
    }
    per_label = {lb: [] for lb in uniq}
    for qv, lb in zip(Q, labels):
        dists = {}
        for cl, (sq, cnt) in cent.items():
            diff = (qv.astype(np.float64) * cnt - sq.astype(np.float64)) \
                / (1e6 * cnt)
            dists[cl] = np.floor(diff * diff * 1e12 + 0.5).sum()
        a = math.sqrt(dists[lb] / 1e12)
        b = math.sqrt(
            min(v for cl, v in dists.items() if cl != lb) / 1e12
        )
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        per_label[lb].append(math.floor(s * 1e9 + 0.5))
    for lb in uniq:
        mean_s = sum(per_label[lb]) / 1e9 / len(per_label[lb])
        assert abs(rows[lb].mean_silhouette - mean_s) < 1e-5, lb
        assert rows[lb].n_vectors == len(per_label[lb])
