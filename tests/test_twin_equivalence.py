"""Twin/default equivalence pins for the ANN family (r7 verdict task #2).

The driver-graded ANN entries run EXACT-INTEGER verification twins
(inputs quantized at 1e6, routing decisions in int64 — see
pipeline/similarity.py), while the float forms remain the documented
scale defaults. These tests pin that the two arithmetics make the SAME
routing decisions on the fixtures — k-means assignments, IVF probe
lists and candidate membership, PQ codes and ADC shortlists, LSH bucket
signs — so the verified artifact cannot silently diverge from the
shipped one. All comparisons hold the MODEL constant (the twin's
centroids/codebooks/planes, descaled to float) and vary only the
arithmetic; seeding differences between ivf_train (xxhash64) and
lloyd_int (md5) are a documented, separate knob.

Fixture scale: sf0.001 (500 x 64-dim vectors) — small enough to
recompute every decision driver-side in float and compare exactly.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import similarity

SCALE = 1_000_000


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def vecs(emb):
    """{vec_id: [float]*64} for every nonzero fixture vector."""
    rows = similarity.nonzero(emb).select("vec_id", "embedding").collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def _float_argmin_sqdist(v, cents_f):
    """argmin over float squared-L2, ties to the lowest id — the float
    production arithmetic for nearest-centroid routing."""
    best, best_d = None, None
    for i, c in enumerate(cents_f):
        d = sum((a - b) * (a - b) for a, b in zip(v, c))
        if best_d is None or d < best_d:
            best, best_d = i, d
    return best


@pytest.mark.slow
def test_kmeans_assignments_int_twin_matches_float(spark, emb, vecs):
    """The graded `emb_kmeans_clusters` twin assigns via integer squared
    L2 on 1e6-quantized coords. Descale its centroids to float, assign
    every raw vector with plain float arithmetic: identical clusters."""
    cents = similarity.kmeans_exact_centroids(emb, n_clusters=8, iters=3)
    assert cents and len(cents) == 8
    quant = similarity.quantized_vectors(emb)
    int_assign = {
        r["vec_id"]: r["_cid"]
        for r in quant.select(
            "vec_id", similarity.int_assign_col(cents).alias("_cid")
        ).collect()
    }
    cents_f = [[c / SCALE for c in cent] for cent in cents]
    mismatches = {
        vid: (int_assign[vid], _float_argmin_sqdist(v, cents_f))
        for vid, v in vecs.items()
        if int_assign[vid] != _float_argmin_sqdist(v, cents_f)
    }
    assert not mismatches, (
        f"quantization flipped {len(mismatches)} assignments: "
        f"{dict(list(mismatches.items())[:5])}"
    )


@pytest.mark.slow
def test_ivf_probe_list_and_candidates_match_float(spark, emb, vecs):
    """`sim_ivf_topk` routes with integer L2 on the unit sphere. The
    float arithmetic over the SAME (descaled) centroids must pick the
    same nprobe probe lists and the same candidate membership."""
    cents = similarity.kmeans_exact_centroids(
        emb, n_clusters=8, iters=3, unit=True
    )
    assert cents
    cents_f = [[c / SCALE for c in cent] for cent in cents]
    nprobe = 4

    # int probe list for query 0 (what topk_ivf_exact computes)
    quant = similarity.quantized_vectors(emb, unit=True)
    qq = [
        int(v)
        for v in quant.filter(F.col("vec_id") == 0).first()["_xq"]
    ]
    int_probe = sorted(
        range(len(cents)),
        key=lambda c: (
            sum((a - b) * (a - b) for a, b in zip(qq, cents[c])), c
        ),
    )[:nprobe]
    # float probe list: unit-normalize the raw query vector, float L2
    qv = vecs[0]
    qn = sum(x * x for x in qv) ** 0.5
    qu = [x / qn for x in qv]
    float_probe = sorted(
        range(len(cents_f)),
        key=lambda c: (
            sum((a - b) * (a - b) for a, b in zip(qu, cents_f[c])), c
        ),
    )[:nprobe]
    assert set(int_probe) == set(float_probe)

    # candidate membership: int list assignment == float list assignment
    int_assign = {
        r["vec_id"]: r["_cid"]
        for r in quant.select(
            "vec_id", similarity.int_assign_col(cents).alias("_cid")
        ).collect()
    }
    flips = {}
    for vid, v in vecs.items():
        n = sum(x * x for x in v) ** 0.5
        u = [x / n for x in v]
        fa = _float_argmin_sqdist(u, cents_f)
        if fa != int_assign[vid]:
            flips[vid] = (int_assign[vid], fa)
    assert not flips, (
        f"unit-sphere quantization flipped {len(flips)} list assignments: "
        f"{dict(list(flips.items())[:5])}"
    )


@pytest.mark.slow
def test_pq_codes_and_shortlist_match_float(spark, emb, vecs):
    """`sim_pq_topk` encodes with per-subspace integer-L2 codebooks and
    an integer ADC table sum. Descaled to float, codes and the ADC
    shortlist ordering must agree."""
    m, k_codes, shortlist = 4, 16, 100
    subdim = similarity.DIM // m
    quant = similarity.quantized_vectors(emb, unit=True)
    books = []
    for s in range(m):
        sliced = quant.select(
            "vec_id", F.slice("_xq", s * subdim + 1, subdim).alias("_xq")
        )
        books.append(similarity.lloyd_int(sliced, k_codes, iters=2))
    assert all(books)

    rows = quant.select("vec_id", "_xq").collect()
    xq = {r["vec_id"]: [int(v) for v in r["_xq"]] for r in rows}

    def int_code(vq, s):
        sub = vq[s * subdim: (s + 1) * subdim]
        return min(
            range(len(books[s])),
            key=lambda c: (
                sum((a - b) * (a - b) for a, b in zip(sub, books[s][c])), c
            ),
        )

    def float_code(vq, s):
        sub = [v / SCALE for v in vq[s * subdim: (s + 1) * subdim]]
        bf = [[c / SCALE for c in cw] for cw in books[s]]
        return min(
            range(len(bf)),
            key=lambda c: (
                sum((a - b) * (a - b) for a, b in zip(sub, bf[c])), c
            ),
        )

    flips = [
        (vid, s)
        for vid in xq
        for s in range(m)
        if int_code(xq[vid], s) != float_code(xq[vid], s)
    ]
    assert not flips, f"code flips under descaling: {flips[:10]}"

    # ADC shortlist: integer table sum vs float table sum, same ordering
    qq = xq[0]
    adc_int, adc_float = {}, {}
    for vid, vq in xq.items():
        if vid == 0:
            continue
        di, df = 0, 0.0
        for s in range(m):
            code = int_code(vq, s)
            cw = books[s][code]
            qs = qq[s * subdim: (s + 1) * subdim]
            di += sum((a - b) * (a - b) for a, b in zip(qs, cw))
            df += sum(
                (a / SCALE - b / SCALE) * (a / SCALE - b / SCALE)
                for a, b in zip(qs, cw)
            )
        adc_int[vid], adc_float[vid] = di, df
    short_int = sorted(adc_int, key=lambda v: (adc_int[v], v))[:shortlist]
    short_float = sorted(adc_float, key=lambda v: (adc_float[v], v))[:shortlist]
    assert short_int == short_float


def test_lsh_buckets_match_exact_rational_signs(spark, emb, vecs):
    """`sim_lsh_topk` (graded) and the oracle both evaluate the float
    left-to-right projection fold. Pin that no fixture vector sits close
    enough to a hyperplane for float rounding to matter: the fold's sign
    equals the EXACT rational sign (plane weights are k/1000 rationals;
    float32 coords convert to Fraction losslessly)."""
    planes = 4
    buckets = {
        r["vec_id"]: r["_b"]
        for r in similarity.nonzero(emb)
        .select(
            "vec_id",
            similarity.lsh_bucket(F.col("embedding"), planes).alias("_b"),
        )
        .collect()
    }
    weights = [
        [Fraction(round(w * 1000), 1000) for w in similarity._plane_weights(p)]
        for p in range(planes)
    ]
    for vid, v in vecs.items():
        exact = 0
        for p in range(planes):
            proj = sum(
                Fraction(x) * w for x, w in zip(v, weights[p])
            )
            if proj > 0:
                exact += 2 ** p
        assert exact == buckets[vid], (
            f"vec {vid}: float-fold bucket {buckets[vid]} != exact "
            f"rational bucket {exact} — a hyperplane sign is within "
            "float rounding; twin and default could diverge here"
        )
