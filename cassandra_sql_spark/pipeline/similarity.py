"""Similarity search over embedding columns (north-star extension; absent
from the reference — SURVEY §2.10).

- brute-force cosine top-k: the exact baseline. Dot products via
  zip_with + aggregate (JVM lambdas, sequential fold -> bit-deterministic
  and engine-comparable), query vector broadcast, TakeOrderedAndProject
  for the top-k (no full sort).
- threshold self-join: exact pair search; candidate cap for 100 TB comes
  from the LSH variant below.
- random-hyperplane LSH (sign-bit bucketing): deterministic planes derived
  from xxhash64(plane, dim) — no stored model, reproducible on any cluster.
  Buckets partition the space; search probes only the query's bucket
  (optionally multi-probe). This is the scale path: candidates per query
  drop from N to N/2^planes on average.

All math in double precision; cosine is rounded through DECIMAL(18,6) and
then CAST back to DOUBLE where results cross the engine boundary: the decimal
hop kills last-ulp libm skew, and shipping DOUBLE (not DECIMAL) means every
fetch path renders the value identically — scaled-decimal strings like
`0.450000` vs `0.45` hash differently in float64-style fetches even when the
values are equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def nonzero(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Drop zero-norm vectors: they have no direction, so cosine against
    them is 0/0 (an ANSI divide-by-zero, and NaN-comparison semantics
    differ across engines). Excluding them is the similarity-search
    analog of NULL join keys matching nothing — applied map-side at the
    entry of every cosine path, and mirrored in the DuckDB oracles."""
    return df.filter(dot(F.col(vec_col), F.col(vec_col)) > 0)


def topk_bruteforce(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs one stored vector, query inlined as a literal.

    The query vector is a bounded 1-row fetch (same model-sized collect
    policy as the IVF centroids); its norm is a CONSTANT, so both are
    inlined driver-side. The scan then does exactly two array folds per
    corpus row (dot(v,q) and dot(v,v)) instead of three — the broadcast
    join and the per-row recomputation of the query's own norm are gone
    entirely. At 100 TB this is a map-only scan + TakeOrdered(k)."""
    import math

    emb = nonzero(emb, vec_col)
    qrow = emb.filter(F.col(id_col) == query_id).select(vec_col).first()
    empty = emb.select(
        id_col, F.lit(0.0).alias("score")
    ).limit(0)
    if qrow is None or qrow[0] is None:
        return empty
    qv = [float(x) for x in qrow[0]]
    qnorm = math.sqrt(sum(x * x for x in qv))
    if qnorm == 0.0:
        return empty
    qlit = _flit_array(qv)
    scored = emb.filter(F.col(id_col) != query_id).select(
        id_col,
        (dot(F.col(vec_col), qlit)
         / (F.sqrt(dot(F.col(vec_col), F.col(vec_col))) * F.lit(qnorm)))
        .cast("decimal(18,6)").cast("double")
        .alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def threshold_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (O(n^2) verify — baseline only;
    use lsh_topk/bucketed candidates at scale)."""
    # Norms are per-vector, so compute them map-side BEFORE the pair join:
    # cosine per pair then costs one 64-dim fold (the dot), not three.
    emb = nonzero(emb, vec_col)
    a = emb.select(
        F.col(id_col).alias("da"),
        F.col(vec_col).alias("va"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("db"),
        F.col(vec_col).alias("vb"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("nb"),
    )
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        "da",
        "db",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .cast("decimal(18,6)").cast("double")
        .alias("score"),
    )
    return pairs.filter(F.col("score") >= threshold)


def _dot_lit_sql(vec_sql: str, w: list[float]) -> str:
    """SQL-string twin of _dot_lit (round 13): one parse instead of ~8
    py4j round trips per model vector. Same fold, same CAST-from-repr
    double literals — constant-folds to the identical plan."""
    arr = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in w)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), CAST('0.0' AS DOUBLE), "
        f"(acc, x) -> acc + x)"
    )


def band_buckets_sql(vec_sql: str, bands: int, rows: int) -> str:
    """SQL-string twin of band_buckets (round 13, guide §1.2 per-task
    work): the Column form issued ~2300 py4j round trips at the default
    16 bands x 2 rows x 64-dim planes — ~2.3s of driver time per
    construction, the dominant cost of the banded-LSH entries. ONE
    F.expr parse; same CASE/sum/struct tree, values identical (pinned
    by exceptAll in tests/test_similarity_multi.py)."""
    parts = []
    for b in range(bands):
        bucket = "CAST(0 AS BIGINT)"
        for r in range(rows):
            proj = _dot_lit_sql(vec_sql, _plane_weights(b * rows + r))
            bucket += (
                f" + (CASE WHEN {proj} > 0 THEN {2 ** r} ELSE 0 END)"
            )
        parts.append(f"named_struct('band', {b}, 'bucket', {bucket})")
    return f"array({', '.join(parts)})"


def band_buckets(vec: Column | str, bands: int, rows: int) -> Column:
    """Array of (band, bucket) structs for banded sign-LSH.

    Band b's bucket is the `rows`-bit signature from hyperplanes
    [b*rows, (b+1)*rows) — same deterministic xxhash-derived planes as
    ``lsh_bucket``. Two vectors are candidates iff they share ANY band's
    bucket (OR-of-ANDs amplification, the MinHash-LSH shape).

    A ``str`` argument (bare column name) takes the single-parse
    ``band_buckets_sql`` path — cheap construction, same values; Column
    inputs keep the original form as the equivalence reference."""
    if isinstance(vec, str):
        return F.expr(
            band_buckets_sql("`" + vec.replace("`", "``") + "`", bands, rows)
        )
    out = []
    for b in range(bands):
        bucket = F.lit(0).cast("long")
        for r in range(rows):
            bucket = bucket + F.when(
                _projection(vec, b * rows + r) > 0, F.lit(2**r)
            ).otherwise(F.lit(0))
        out.append(
            F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    return F.array(*out)


def threshold_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    bands: int = 16,
    rows: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via banded LSH candidates + exact verify.

    The 100 TB path for ``threshold_pairs``: instead of an O(n^2) cross
    join, explode each vector into `bands` (band, bucket) keys, self-join
    on bucket equality (shuffle bounded by bands*n + candidate pairs, never
    all pairs), dedupe the candidate (da, db) set, then fetch vectors and
    verify exact cosine >= threshold — so every emitted pair is exact.

    Recall: a pair at angle theta collides per plane with p = 1 - theta/pi,
    per band with p^rows, and is missed only with (1 - p^rows)^bands. At
    production near-dup thresholds (cos >= 0.8, p >= 0.8) the defaults give
    miss < 1e-6 with strong pruning. The synthetic fixture corpus has no
    planted dups — its >= 0.45 pairs are the random tail (~3.6 sigma in
    64-dim), where p ~= 0.65; bands=16 x rows=2 still drives per-pair miss
    to (1 - 0.42)^16 ~= 1.6e-4, and the deterministic planes make the
    result reproducible — tests pin recall == 1 vs the exact baseline on
    the fixtures. Pruning is necessarily weak at that near-random
    threshold; on real near-dup corpora the same banding prunes hard.
    """
    # No checkpoint here, deliberately (contrast minhash_lsh_pairs): the
    # self-join's two sides are IDENTICAL subplans, so ReuseExchange
    # already computes the banded projection once — a localCheckpoint of
    # ex/norms measured 17% SLOWER (6.24s vs 5.33s at sf0.1), pure added
    # materialization. Minhash benefits because its shingle table feeds
    # three DIFFERENT projections that no exchange reuse covers.
    emb = nonzero(emb, vec_col)
    ex = emb.select(
        F.col(id_col).alias("_id"),
        F.explode(band_buckets(vec_col, bands, rows)).alias("_bb"),
    )
    cands = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a._bb") == F.col("b._bb"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("da"), F.col("b._id").alias("db"))
        .distinct()
    )
    # Map-side norms (see threshold_pairs): one fold per candidate pair.
    va = emb.select(
        F.col(id_col).alias("da"),
        F.col(vec_col).alias("_va"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("_na"),
    )
    vb = emb.select(
        F.col(id_col).alias("db"),
        F.col(vec_col).alias("_vb"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("_nb"),
    )
    verified = (
        cands.join(va, "da")
        .join(vb, "db")
        .select(
            "da",
            "db",
            (dot(F.col("_va"), F.col("_vb"))
             / (F.col("_na") * F.col("_nb")))
            .cast("decimal(18,6)").cast("double")
            .alias("score"),
        )
    )
    return verified.filter(F.col("score") >= threshold)


def projection_signs(
    in_dim: int, out_dim: int, seed: int = 0
) -> list[list[float]]:
    """Deterministic ±1 projection matrix (Achlioptas-style) derived from
    md5 — reproducible on any engine/cluster, no RNG state. Shared with
    the DuckDB oracle as an inline literal."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] % 2 == 0
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a sign matrix:
    y_j = dot(x, R_j) / sqrt(out_dim).

    The matrix is a driver-side constant inlined into the plan — map-only,
    no shuffle, no model state; at 100 TB this is a pure scan-bandwidth
    operator. Output rounded to 6 decimals (sequential fold on both
    engines makes the raw sums bit-identical; rounding is belt and
    braces)."""
    R = projection_signs(in_dim, out_dim, seed)
    norm = out_dim ** 0.5
    return emb.select(
        F.col(id_col),
        *[
            F.round(_dot_lit(F.col(vec_col), R[j]) / norm, 6).alias(f"p{j:02d}")
            for j in range(out_dim)
        ],
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = 127/max|x|,
    q_i = floor(x_i * scale + 0.5) (round-half-up, engine-portable).

    The scale is zipped alongside the elements (array_repeat) rather than
    referenced inside the lambda, so the max-abs reduction runs once per
    row, not once per element (higher-order lambdas are interpreted; an
    inlined max would make quantization O(dim^2) per row)."""
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.lit(127.0) / F.greatest(maxabs, F.lit(1e-30))
    zipped = F.arrays_zip(
        F.transform(v, lambda x: x.cast("double")).alias("x"),
        F.array_repeat(scale, F.size(v)).alias("s"),
    )
    q = F.transform(
        zipped, lambda e: F.floor(e["x"] * e["s"] + 0.5).cast("int")
    )
    return emb.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        q.alias("q"),
    )


DIM = 64  # fixture embedding dimensionality (hyperplane tables sized to it)


def _plane_weights(p: int, dim: int = DIM) -> list[float]:
    """Deterministic pseudo-random weights in [-1, 1) for plane p — derived
    from md5 DRIVER-SIDE and inlined as literals. The previous per-row
    derivation (xxhash64 of "plane{p}:{dim}" inside a zip_with lambda)
    evaluated planes x dim string-concat+hashes per row in an interpreted
    higher-order function — measured ~4x the cost of the whole banded-LSH
    pair query at 32 planes x 64 dims. The model is a constant; compute it
    once on the driver like projection_signs/IVF centroids."""
    import hashlib

    out = []
    for d in range(dim):
        h = int.from_bytes(
            hashlib.md5(f"plane{p}:{d}".encode()).digest()[:8], "big"
        )
        out.append((h % 2000 - 1000) / 1000.0)
    return out


def _projection(vec: Column, p: int, dim: int = DIM) -> Column:
    return _dot_lit(vec, _plane_weights(p, dim))


def lsh_bucket(vec: Column, planes: int = 8) -> Column:
    """Sign-bit bucket id from `planes` random hyperplanes (JVM lambdas)."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket + F.when(
            _projection(vec, p) > 0, F.lit(2**p)
        ).otherwise(F.lit(0))
    return bucket


def _flit_array(w: list[float]) -> Column:
    """A constant double-array column built with ONE F.expr parse
    (round 13, guide §1.2 per-task work): ``F.array(*[F.lit(x) ...])``
    issues one py4j round trip per element — ~70 per 64-dim model
    vector, the dominant CONSTRUCTION cost of every hyperplane/query
    literal consumer (measured: band_buckets alone cost ~2.3s of driver
    time per dedup_embedding_lsh construction). The CAST-from-repr form
    constant-folds to the identical double Literal (Python repr
    round-trips exactly; Java parses the same nearest double), so the
    optimized plan is unchanged."""
    return F.expr(
        "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in w)
        + ")"
    )


def _dot_lit(vec: Column, w: list[float]) -> Column:
    """Dot product against a driver-side constant vector (inlined literal
    array + zip_with/aggregate fold). The fold runs as an interpreted
    higher-order function, but REJECTED-faster-looking alternative: fully
    unrolling to element_at(i)*w_i multiply-adds blows the codegen method
    budget at 32 planes x 64 dims (2048-node tree) and measured 3.6x
    SLOWER (19.2s vs 5.3s on the banded-LSH pair query at sf0.1) — the
    literal-array fold is the right shape; keep the model constant small
    and let the lambda interpreter stream it."""
    arr = _flit_array(w)
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _unit(v: list[float]) -> list[float]:
    n = sum(x * x for x in v) ** 0.5
    return [x / n for x in v] if n else list(v)


def ivf_assign_col(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id as a pure map-side expression.

    Centroids are unit-normalized, so argmax over dot(v, c) equals argmax
    cosine similarity (|v| is constant per row). Ties resolve to the lowest
    centroid id (array_position finds the first maximum).
    """
    scores = F.array(*[_dot_lit(vec, c) for c in centroids])
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_train(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer (k-means with hash-seeded init).

    - Seeds: the `n_centroids` vectors with the smallest xxhash64(id) —
      reproducible on any cluster, no RNG state.
    - Lloyd iterations: assignment is the map-side expression above (zero
      shuffle); the mean step shuffles only (centroid, dim) pairs — k*d rows
      total regardless of data size, via posexplode + partial-agg AVG.
    - Model size is k*d floats on the driver: constant, broadcast-friendly.
    """
    seeds = (
        emb.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(n_centroids)
        .collect()
    )
    centroids = [_unit([float(x) for x in r[vec_col]]) for r in seeds]
    if not centroids:
        return []
    # a corpus smaller than n_centroids trains that many clusters, not k
    n_centroids = len(centroids)
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = emb.select(
            ivf_assign_col(F.col(vec_col), centroids).alias("_cid"),
            F.col(vec_col).alias("_v"),
        )
        means = (
            assigned.select("_cid", F.posexplode("_v"))
            .groupBy("_cid", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("m"))
            .collect()
        )
        by_cid: dict[int, list[float]] = {}
        for r in means:
            by_cid.setdefault(r["_cid"], [0.0] * dim)[r["pos"]] = r["m"]
        # empty clusters keep their previous centroid
        centroids = [
            _unit(by_cid.get(i, centroids[i])) for i in range(n_centroids)
        ]
    return centroids


def quantized_vectors(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    unit: bool = False,
) -> DataFrame:
    """(id, _xq) with _xq = round(x * scale) int64 coords — the shared
    input quantization of the exact-integer family (kmeans_exact,
    topk_ivf_exact); zero-norm vectors dropped like every cosine path.

    ``unit=True`` re-projects onto the scale-radius sphere:
    uq_i = round(xq_i * scale / sqrt(sum xq^2)). Still bit-exact across
    engines — the norm's radicand is an exact integer (so sqrt, being
    correctly rounded, is identical), xq_i * scale stays under 2^53 (so
    the dividend is exact), and one IEEE division of identical operands
    gives identical quotients. On the unit sphere L2 routing is
    monotone in cosine — the right geometry for cosine-IVF."""
    emb = nonzero(emb, vec_col)
    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + 0.5).cast("bigint"),
    )
    base = emb.select(F.col(id_col), xq.alias("_xq"))
    if not unit:
        return base
    # GREATEST(norm, 1): a nonzero integer vector has norm >= 1, so this
    # only fires for vectors that QUANTIZE to zero (denormal magnitudes
    # that pass the float nonzero() filter) — they stay all-zero instead
    # of dividing by zero (ANSI error on Spark, engine-specific on
    # DuckDB); caught by the adversarial embeddings net.
    norm = F.greatest(
        F.sqrt(
            F.aggregate(
                F.transform(F.col("_xq"), lambda a: a * a),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).cast("double")
        ),
        F.lit(1.0),
    )
    uq = F.transform(
        F.col("_xq"),
        lambda a: F.floor(
            a.cast("double") * scale / norm + 0.5
        ).cast("bigint"),
    )
    return base.select(id_col, uq.alias("_xq"))


def int_sq_dist(c: list, xq: Column | None = None) -> Column:
    """Integer squared Euclidean distance from the _xq column (or an
    explicit vector column, e.g. a slice) to a driver-side integer
    centroid (exact int64 fold)."""
    arr = F.array(*[F.lit(int(v)) for v in c])
    if xq is None:
        xq = F.col("_xq")
    return F.aggregate(
        F.zip_with(xq, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def int_assign_col(cents: list, xq: Column | None = None) -> Column:
    """Nearest integer centroid id, ties to the lowest id (first min)."""
    dists = F.array(*[int_sq_dist(c, xq) for c in cents])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _int_sq_dist_sql(c: list, xq_sql: str) -> str:
    """SQL-string twin of int_sq_dist (round 12): one expr parse instead
    of ~20 py4j round trips per centroid — the assignment expressions
    carry k*dim integer literals (512-1024 for the IVF/PQ defaults) and
    their Column-API construction cost 0.6-3.2s per query."""
    arr = ",".join(str(int(v)) for v in c)
    return (
        f"aggregate(zip_with({xq_sql}, array({arr}), "
        f"(a, b) -> (a - b) * (a - b)), 0L, (acc, t) -> acc + t)"
    )


def int_assign_sql(cents: list, xq_sql: str = "_xq") -> str:
    """SQL-string twin of int_assign_col: same nearest-centroid argmin
    (ties to the lowest id via array_position's first match).

    Round 13 (r12 verdict #3), two changes, values identical (same
    distances, same first-min tie rule — exceptAll-pinned against the
    Column twin, which keeps the plain form as the independent
    reference):

    1. the k-distance array and the input vector are lambda-BOUND, each
       evaluated ONCE per row — the previous form textually duplicated
       the distance array inside
       array_position(array(D), array_min(array(D))) (every centroid
       distance computed twice per row) and inlined ``xq_sql`` into
       every distance term, so a PQ slice() was re-materialized k times
       per row;
    2. the centroids ship as ONE array-of-arrays literal looped by a
       higher-order transform instead of k unrolled aggregate() calls —
       the k*dim-literal unrolled tree was far past codegen's size
       limits anyway (interpreted either way), and shrinking the
       expression ~k-fold cuts the per-iteration parse/analyze/plan
       cost that dominates these training loops once the data is small
       relative to the plan (interleaved A/B: a further 1.17-1.20x on
       emb_kmeans/sim_pq/sim_ivfpq on top of change 1's 1.2-1.6x)."""
    rows = ",".join(
        "array(" + ",".join(str(int(v)) for v in c) + ")" for c in cents
    )
    return (
        f"element_at(transform(array({xq_sql}), v -> "
        f"element_at(transform(array(transform(array({rows}), c -> "
        f"aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)), 0L, "
        f"(acc, t) -> acc + t))), d -> "
        f"CAST(array_position(d, array_min(d)) - 1 AS INT)), 1)), 1)"
    )


def pq_adc_sql(books: list, adc_tables: list, subdim: int) -> str:
    """The ADC shortlist distance as ONE parsed expression: for each
    subspace, code = integer-L2 argmin over the slice, then a lookup in
    the query's precomputed distance table. Value-identical to the
    Column-API sub_code/element_at chain it replaces (same argmin, same
    tables); single parse instead of ~3s of py4j construction."""
    terms = []
    for s, (book, table) in enumerate(zip(books, adc_tables)):
        code = int_assign_sql(
            book, f"slice(_xq, {s * subdim + 1}, {subdim})"
        )
        tbl = ",".join(str(int(v)) for v in table)
        terms.append(f"element_at(array({tbl}), ({code}) + 1)")
    return " + ".join(terms)


def seed_rows(base: DataFrame, n: int, id_col: str = "vec_id") -> list:
    """The n smallest (md5(id), id) rows' _xq coordinate lists — the
    shared Lloyd seeding. The ordering depends only on the id, never on
    the coordinates, so one fetch of max(k) rows serves every consumer
    (coarse quantizer AND all m subspace codebooks slice the same rows;
    a smaller k's seeds are a prefix). Round 12: the composed IVF+PQ
    path previously paid 5 separate seed collects per query."""
    return [
        list(r["_xq"])
        for r in base.withColumn(
            "_h", F.md5(F.col(id_col).cast("string"))
        )
        .orderBy("_h", id_col)
        .limit(n)
        .collect()
    ]


def lloyd_int(
    base: DataFrame,
    n_clusters: int,
    iters: int,
    id_col: str = "vec_id",
    seeds: list | None = None,
) -> list:
    """The exact-integer Lloyd loop over an already-quantized
    (id, _xq int64 list) frame — shared by kmeans_exact_centroids (full
    vectors) and pq_train_exact (per-subspace slices). Seeds are the
    n_clusters smallest (md5(id), id) rows' coordinates (``seeds``
    passes them pre-fetched — see seed_rows)."""
    cents = (
        [list(c) for c in seeds[:n_clusters]]
        if seeds is not None
        else seed_rows(base, n_clusters, id_col)
    )
    if not cents:
        return []
    dim = len(cents[0])
    for _ in range(iters):
        # The assignment is lambda-BOUND, not a sibling projection of the
        # generator: an expression beside explode() is re-evaluated per
        # OUTPUT row (dim times per vector — ~150M interpreted ops per
        # iteration at 5k x 64 x k=8; measured ~4s/iter, round 12), while
        # the bound form computes the k*dim-literal argmin once per INPUT
        # row. Single-parse SQL string for the same reason as the dedup
        # builders. Values are unchanged: same (cid, pos) sum/count grid.
        assign = int_assign_sql(cents)
        bound = F.expr(
            f"transform(array({assign}), c -> "
            f"transform(_xq, (x, i) -> struct(c AS _cid, i AS pos, "
            f"x AS col)))[0]"
        )
        stats = (
            base.select(F.explode(bound).alias("_e"))
            .groupBy(
                F.col("_e._cid").alias("_cid"), F.col("_e.pos").alias("pos")
            )
            .agg(F.sum("_e.col").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # k*dim rows: bounded model fetch
        )
        by: dict[int, list] = {}
        for r in stats:
            by.setdefault(r["_cid"], [None] * dim)[r["pos"]] = (r["s"], r["n"])
        # Python // IS floor division: identical to the oracle's
        # (a - pmod(a, b)) / b spelling. Empty clusters keep their
        # previous centroid.
        cents = [
            [(2 * s + n) // (2 * n) for (s, n) in by[i]] if i in by else old
            for i, old in enumerate(cents)
        ]
    return cents


def pq_books_int(
    quant: DataFrame,
    m: int,
    subdim: int,
    k_codes: int,
    iters: int,
    id_col: str = "vec_id",
    seeds: list | None = None,
) -> list:
    """All m per-subspace exact-integer codebooks, trained with ONE
    distributed job per Lloyd iteration instead of m independent loops
    (round 12, guide §1.2 step 1: the per-subspace form ran m seed
    collects + m*iters serial stat jobs — 12 driver round trips for the
    PQ defaults — each replanning and rescanning its input; this form
    runs 1 + iters jobs over the same frame).

    Bit-identical to ``lloyd_int`` per slice (pinned in
    tests/test_similarity_multi.py): seeds are the same (md5(id), id)
    rows sliced per subspace, each iteration assigns with the same
    int_assign_col expression over the slice, and the (subspace, cid,
    pos) sum/count grid — collected as one m*k*subdim bounded fetch —
    feeds the same floor-division centroid update."""
    if seeds is None:
        seeds = seed_rows(quant, k_codes, id_col)
    if not seeds:
        return [[] for _ in range(m)]
    books = [
        [list(row[s * subdim: (s + 1) * subdim]) for row in seeds[:k_codes]]
        for s in range(m)
    ]
    for _ in range(iters):
        # element s of _cids = this row's nearest codeword in subspace s.
        # The _cids array is lambda-BOUND so the m k-codeword argmins run
        # once per INPUT row — as a sibling projection of the generator
        # they would re-run per OUTPUT row, dim times per vector (the
        # explode-duplication hazard documented in pipeline/dedup.py;
        # measured ~11s/iter vs <1s at sf0.01). Single-parse SQL string.
        cids = ",".join(
            int_assign_sql(
                books[s], f"slice(_xq, {s * subdim + 1}, {subdim})"
            )
            for s in range(m)
        )
        bound = F.expr(
            f"transform(array(array({cids})), c -> "
            f"transform(_xq, (x, i) -> struct("
            f"CAST(i / {subdim} AS INT) AS _s, "
            f"c[CAST(i / {subdim} AS INT)] AS _cid, "
            f"i % {subdim} AS _p, x AS col)))[0]"
        )
        stats = (
            quant.select(F.explode(bound).alias("_e"))
            .groupBy(
                F.col("_e._s").alias("_s"),
                F.col("_e._cid").alias("_cid"),
                F.col("_e._p").alias("_p"),
            )
            .agg(F.sum("_e.col").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # m*k*subdim rows: bounded model fetch
        )
        by: dict[tuple, list] = {}
        for r in stats:
            by.setdefault((r["_s"], r["_cid"]), [None] * subdim)[r["_p"]] = (
                r["s"],
                r["n"],
            )
        books = [
            [
                [(2 * s_ + n_) // (2 * n_) for (s_, n_) in by[(s, i)]]
                if (s, i) in by
                else old
                for i, old in enumerate(books[s])
            ]
            for s in range(m)
        ]
    return books


def kmeans_exact_centroids(
    emb: DataFrame,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    unit: bool = False,
) -> list:
    """The exact-integer Lloyd trainer (see kmeans_exact): returns the
    final k integer centroid coordinate lists."""
    base = quantized_vectors(emb, id_col, vec_col, scale, unit)
    return lloyd_int(base, n_clusters, iters, id_col)


def kmeans_exact(
    emb: DataFrame,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Lloyd k-means in EXACT integer arithmetic — the oracle-checkable
    clustering twin of ivf_train's float path.

    Every quantity either engine computes is an int64:
    - vectors quantize once to round(x * scale) (map-side, same FLOOR
      formula both engines);
    - assignment is argmin of the integer squared Euclidean distance
      (<= 64 * (4e6)^2 ~ 1e15, well inside int64), ties to the lowest
      cluster id;
    - the centroid update is round-half-up of the exact rational mean,
      floor((2*sum + n) / (2*n)), via true floor division — so centroids
      stay int64 coordinates and no float ever enters the loop;
    - seeds are the n_clusters smallest (md5(id), id) — the portable
      hash family.
    Distributed cost per iteration: one map-only assignment scan plus a
    (k x dim)-row exact integer shuffle; driver state is k*dim ints.
    A DuckDB oracle replays the whole loop bit-for-bit (the unrolled
    CTE chain in queries/pipeline_r6._KMEANS_ORACLE).
    """
    # One quantization pass materialized once (round 12): the previous
    # form built the quantized frame TWICE (assignment + training) and
    # every Lloyd iteration replanned a fresh scan+quantize — iters+2
    # parquet scans for a frame that is id + 64 int64s. localCheckpoint
    # keeps every training/assignment job on the materialized rows;
    # recomputed per invocation, never across runs.
    base = quantized_vectors(emb, id_col, vec_col, scale).localCheckpoint(
        eager=True
    )
    cents = lloyd_int(base, n_clusters, iters, id_col)
    if not cents:
        return base.select(
            id_col, F.lit(None).cast("long").alias("cluster_key")
        ).limit(0)
    # assigned feeds BOTH the relabel aggregate and the join; without
    # materialization the k*dim-literal argmin scan runs twice (no common
    # subplan reuse across an agg and its consumer). Tiny frame: two ints
    # per vector.
    assigned = base.select(
        id_col, F.expr(int_assign_sql(cents)).alias("_cid")
    ).localCheckpoint(eager=True)
    relabel = assigned.groupBy("_cid").agg(F.min(id_col).alias("cluster_key"))
    return (
        assigned.join(F.broadcast(relabel), "_cid")
        .select(
            id_col, F.col("cluster_key").cast("long").alias("cluster_key")
        )
        .orderBy(id_col)
    )


def topk_ivf_exact(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """L2-IVF approximate top-k with the exact-integer coarse quantizer
    (FAISS IndexIVFFlat shape): kmeans_exact centroids trained on
    UNIT-quantized vectors (quantized_vectors unit=True — on the sphere
    L2 is monotone in cosine, the right routing geometry for cosine
    retrieval), integer-L2 list assignment and probe selection, exact
    cosine re-score of the probed lists only. Because every routing
    decision is int64 arithmetic (and the unit projection is itself
    bit-exact cross-engine), the WHOLE pipeline — training included —
    replays in DuckDB (the oracle extends the k-means CTE chain with
    probe + scoring); the cosine scores take the usual DECIMAL(18,6)
    hop. Scan cost: nprobe/k of the corpus, same as the float topk_ivf;
    at rest the lists are pruned partitions (topk_ivf_pruned)."""
    import math

    # One unit-quantized frame, materialized once, feeds training, the
    # query fetch and the candidate scan (round 12 — was two independent
    # scan+quantize plans, one per Lloyd iteration plus one per consumer).
    quant = quantized_vectors(emb, id_col, vec_col, unit=True)
    quant = quant.localCheckpoint(eager=True)
    cents = lloyd_int(quant, n_centroids, iters, id_col)
    emb = nonzero(emb, vec_col)
    qrow = emb.filter(F.col(id_col) == query_id).select(vec_col).first()
    empty = emb.select(id_col, F.lit(0.0).alias("score")).limit(0)
    if not cents or qrow is None or qrow[0] is None:
        return empty
    qv = [float(x) for x in qrow[0]]
    qnorm = math.sqrt(sum(x * x for x in qv))
    if qnorm == 0.0:
        return empty
    qq = [
        int(v)
        for v in quant.filter(F.col(id_col) == query_id).first()["_xq"]
    ]  # 1-row bounded fetch: the query's unit-quantized coords
    probe = sorted(
        range(len(cents)),
        key=lambda c: (
            sum((a - b) * (a - b) for a, b in zip(qq, cents[c])), c
        ),
    )[:nprobe]
    base = quant.join(emb.select(id_col, vec_col), id_col)
    cands = base.filter(
        F.expr(int_assign_sql(cents)).isin(probe)
        & (F.col(id_col) != query_id)
    )
    qlit = _flit_array(qv)
    scored = cands.select(
        id_col,
        (
            dot(F.col(vec_col), qlit)
            / (F.sqrt(dot(F.col(vec_col), F.col(vec_col))) * F.lit(qnorm))
        ).cast("decimal(18,6)").cast("double").alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def pq_topk_exact(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 100,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN in exact integer arithmetic: each of the
    m subspaces trains its own 16-codeword codebook via the exact-int
    Lloyd on unit-quantized subvector slices, codes are integer-L2
    argmins, and the ADC shortlist distance is a sum of m precomputed
    integer table lookups — so codebooks, codes, shortlist membership,
    and shortlist order are all engine-portable, and the final exact
    cosine re-rank takes the usual DECIMAL hop. Same compression story
    as pq_topk_rerank (the float path kept for the codes-table format):
    the scored scan reads m small codes per row, ~1/64 the vector bytes;
    only the |shortlist| survivors read their full vectors."""
    import math

    # Materialized once + merged per-iteration training (round 12): the
    # m independent Lloyd loops were m seed collects + m*iters serial
    # stat jobs, each rescanning parquet; pq_books_int runs 1 + iters
    # jobs over the checkpointed frame, bit-identical per slice.
    quant = quantized_vectors(emb, id_col, vec_col, unit=True)
    quant = quant.localCheckpoint(eager=True)
    dim = DIM
    subdim = dim // m
    books = pq_books_int(quant, m, subdim, k_codes, iters, id_col)
    emb = nonzero(emb, vec_col)
    qrow = emb.filter(F.col(id_col) == query_id).select(vec_col).first()
    empty = emb.select(id_col, F.lit(0.0).alias("score")).limit(0)
    if not books or not books[0] or qrow is None or qrow[0] is None:
        return empty
    qv = [float(x) for x in qrow[0]]
    qnorm = math.sqrt(sum(x * x for x in qv))
    if qnorm == 0.0:
        return empty
    qq = [
        int(v)
        for v in quant.filter(F.col(id_col) == query_id).first()["_xq"]
    ]
    # ADC lookup tables: dist from the query subvector to every codeword
    adc_tables = [
        [
            sum(
                (a - b) * (a - b)
                for a, b in zip(qq[s * subdim: (s + 1) * subdim], cw)
            )
            for cw in books[s]
        ]
        for s in range(m)
    ]

    # single-parse ADC expression (round 12): the Column-API chain cost
    # ~3s of py4j per query at m=4, k_codes=16; value-identical argmin
    adc = F.expr(pq_adc_sql(books, adc_tables, subdim))
    short = (
        quant.filter(F.col(id_col) != query_id)
        .select(id_col, adc.alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col))
        .limit(shortlist)
    )
    qlit = _flit_array(qv)
    rer = short.join(emb.select(id_col, vec_col), id_col).select(
        id_col,
        (
            dot(F.col(vec_col), qlit)
            / (F.sqrt(dot(F.col(vec_col), F.col(vec_col))) * F.lit(qnorm))
        ).cast("decimal(18,6)").cast("double").alias("score"),
    )
    return rer.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def topk_ivfpq_exact(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 4,
    shortlist: int = 50,
    m: int = 4,
    k_codes: int = 16,
    iters_coarse: int = 3,
    iters_pq: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ COMPOSED (the FAISS IVFPQ query shape, r12): coarse
    integer-L2 routing prunes to the ``nprobe`` nearest lists, the
    integer ADC shortlist ranks ONLY those lists' rows by summed
    codebook lookups, and the exact cosine re-rank reads full vectors
    for the ``shortlist`` survivors alone. This is how production ANN
    runs at 100 TB — the two prunings MULTIPLY: nprobe/n_centroids of
    the rows x m-codes-instead-of-vector bytes, with the partitioned
    at-rest form in write_ivfpq_index/topk_ivfpq_pruned.

    Every routing decision (coarse assignment, probe pick, codebooks,
    codes, ADC order with vec_id ties) is exact int64 arithmetic on the
    unit-quantized grid, so the WHOLE pipeline — both trainings
    included — replays in DuckDB; only the final cosine takes the
    DECIMAL(18,6) hop. Models are k*d-sized driver fetches of the
    ivf_train class."""
    import math

    # Round 12 (guide §1.2 step 1): this composed path ran ~19 serial
    # driver-blocking jobs — 5 seed collects (coarse + 4 subspaces, all
    # selecting the SAME md5-ordered rows), 3 coarse + 4*2 subspace stat
    # jobs and 2 first() fetches, every one replanning a fresh parquet
    # scan + quantize. Now: ONE materialized unit-quantized frame, ONE
    # seed fetch (coarse seeds are a prefix of the codebook seeds), the
    # coarse Lloyd over the checkpointed frame, and one merged job per
    # PQ iteration (pq_books_int). Measured 28-50s -> ~8s at sf0.01;
    # every centroid/codeword/probe decision is bit-identical (same
    # int64 arithmetic over the same rows — twin-pinned in tests).
    quant = quantized_vectors(emb, id_col, vec_col, unit=True)
    quant = quant.localCheckpoint(eager=True)
    dim = DIM
    subdim = dim // m
    seeds = seed_rows(quant, max(n_centroids, k_codes), id_col)
    # Round 13 (guide §2.6 overlap independent jobs): the coarse Lloyd
    # and the PQ codebook training are INDEPENDENT given the shared
    # pre-fetched seeds and the materialized quant frame — each is a
    # serial chain of (one distributed job + one bounded model collect)
    # per iteration, so running them from two driver threads overlaps
    # one chain's barrier with the other's compute and the composed
    # wall-clock is max(coarse, pq) instead of their sum. Results are
    # bit-identical: each thread's jobs are sequential within itself
    # and the trainings share no mutable state.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_cents = pool.submit(
            lloyd_int, quant, n_centroids, iters_coarse, id_col, seeds
        )
        f_books = pool.submit(
            pq_books_int, quant, m, subdim, k_codes, iters_pq, id_col, seeds
        )
        cents = f_cents.result()
        books = f_books.result()
    emb = nonzero(emb, vec_col)
    qrow = emb.filter(F.col(id_col) == query_id).select(vec_col).first()
    empty = emb.select(id_col, F.lit(0.0).alias("score")).limit(0)
    if not cents or not books or not books[0] or qrow is None \
            or qrow[0] is None:
        return empty
    qv = [float(x) for x in qrow[0]]
    qnorm = math.sqrt(sum(x * x for x in qv))
    if qnorm == 0.0:
        return empty
    qq = [
        int(v)
        for v in quant.filter(F.col(id_col) == query_id).first()["_xq"]
    ]
    probe = sorted(
        range(len(cents)),
        key=lambda c: (
            sum((a - b) * (a - b) for a, b in zip(qq, cents[c])), c
        ),
    )[:nprobe]
    adc_tables = [
        [
            sum(
                (a - b) * (a - b)
                for a, b in zip(qq[s * subdim:(s + 1) * subdim], cw)
            )
            for cw in books[s]
        ]
        for s in range(m)
    ]

    # single-parse ADC + routing expressions (round 12): the Column-API
    # forms cost ~4s of py4j per query; value-identical argmins
    adc = F.expr(pq_adc_sql(books, adc_tables, subdim))
    # the composition: ADC runs over the PROBED lists only
    cand = quant.filter(
        F.expr(int_assign_sql(cents)).isin(probe)
        & (F.col(id_col) != query_id)
    )
    short = (
        cand.select(id_col, adc.alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col))
        .limit(shortlist)
    )
    qlit = _flit_array(qv)
    rer = short.join(emb.select(id_col, vec_col), id_col).select(
        id_col,
        (
            dot(F.col(vec_col), qlit)
            / (F.sqrt(dot(F.col(vec_col), F.col(vec_col))) * F.lit(qnorm))
        ).cast("decimal(18,6)").cast("double").alias("score"),
    )
    return rer.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def topk_ivf(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only the `nprobe` nearest inverted lists.

    Scale path (100 TB): `ivf_train` cost is constant in data size per
    iteration scan; the assigned table is written once, partitioned by
    `_cid`, so each probe is partition-pruned to ~nprobe/k of the data.
    Here the assignment is computed inline (same plan shape, no
    materialization step) to keep the query self-contained.
    """
    emb = nonzero(emb, vec_col)
    centroids = ivf_train(emb, n_centroids, 2, id_col, vec_col)
    q = emb.filter(F.col(id_col) == query_id).select(id_col, vec_col).collect()
    if not q:
        # missing (or zero-norm) query id: empty result, same contract as
        # the LSH probe — not a driver-side IndexError
        return emb.sparkSession.createDataFrame(
            [], f"{id_col} bigint, score double"
        )
    qv = [float(x) for x in q[0][vec_col]]
    qn = _unit(qv)
    probe_ids = sorted(
        range(len(centroids)),
        key=lambda i: -sum(a * b for a, b in zip(qn, centroids[i])),
    )[:nprobe]
    assigned = emb.withColumn(
        "_cid", ivf_assign_col(F.col(vec_col), centroids)
    )
    cands = assigned.filter(
        F.col("_cid").isin(probe_ids) & (F.col(id_col) != query_id)
    )
    scored = cands.select(
        id_col,
        (
            _dot_lit(F.col(vec_col), qv)
            / (F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
               * F.lit(sum(x * x for x in qv) ** 0.5))
        ).cast("decimal(18,6)").cast("double").alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def write_lsh_partitioned(
    emb: DataFrame,
    path: str,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the embedding corpus hive-partitioned by LSH bucket —
    the ANN index build step for the 100 TB layout.

    Each of the 2^planes buckets becomes a partition directory; a probe
    then reads ONLY the query's bucket via partition pruning (asserted in
    tests/test_plans.py: the scan's partition filters carry _bucket and
    the other partitions are never listed). Bucket assignment is the same
    deterministic hyperplane expression as lsh_bucket, so index and query
    always agree; rebuilding is a map-only full scan."""
    emb.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes)).write.mode(
        "overwrite"
    ).partitionBy("_bucket").parquet(path)


def topk_lsh_pruned(
    spark,
    path: str,
    query_vec: list,
    k: int = 10,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a write_lsh_partitioned index: compute the query's bucket
    driver-side (constant fold of the same plane expression), filter the
    partition column with a LITERAL so Catalyst prunes to one directory,
    then exact-score only that bucket."""
    qdf = spark.createDataFrame([(query_vec,)], f"{vec_col} array<double>")
    qbucket = qdf.select(
        lsh_bucket(F.col(vec_col), planes).alias("b")
    ).collect()[0]["b"]
    bucketed = nonzero(
        spark.read.parquet(path).filter(F.col("_bucket") == qbucket),
        vec_col,
    )
    qarr = _flit_array(query_vec)
    scored = bucketed.select(
        id_col,
        cosine(F.col(vec_col), qarr).cast("decimal(18,6)").cast("double").alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def write_ivf_partitioned(
    emb: DataFrame,
    path: str,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Materialize the IVF index: train the coarse quantizer, assign each
    vector map-side, hive-partition by centroid id. Returns the centroid
    model (k*d floats — caller persists it beside the data; here it is
    deterministic, so retraining reproduces it bit-for-bit).

    A probe then reads only the `nprobe` nearest partitions via partition
    pruning — nprobe/k of the corpus, the IVF contract at any scale."""
    centroids = ivf_train(emb, n_centroids, iters, id_col, vec_col)
    emb.withColumn(
        "_cid", ivf_assign_col(F.col(vec_col), centroids)
    ).write.mode("overwrite").partitionBy("_cid").parquet(path)
    return centroids


def topk_ivf_pruned(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a write_ivf_partitioned index: rank centroids driver-side,
    IN-list filter the partition column with literals (Catalyst prunes to
    the nprobe directories), exact-score only those lists."""
    qn = _unit([float(x) for x in query_vec])
    probe_ids = sorted(
        range(len(centroids)),
        key=lambda i: -sum(a * b for a, b in zip(qn, centroids[i])),
    )[:nprobe]
    lists = spark.read.parquet(path).filter(F.col("_cid").isin(probe_ids))
    qarr = [float(x) for x in query_vec]
    qnorm = sum(x * x for x in qarr) ** 0.5
    scored = lists.select(
        id_col,
        (
            _dot_lit(F.col(vec_col), qarr)
            / (F.sqrt(dot(F.col(vec_col), F.col(vec_col))) * F.lit(qnorm))
        ).cast("decimal(18,6)").cast("double").alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def topk_lsh(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    ``multiprobe > 0`` additionally probes the buckets at Hamming
    distance 1 from the query's (flip each of the first `multiprobe` sign
    bits) — the standard recall/cost knob: a near neighbor that landed
    just across one hyperplane is recovered for (multiprobe+1)/2^planes
    of the data scanned instead of a full pass.

    At 100 TB the bucketed table is written partitioned by bucket
    (write_lsh_partitioned) so each probed bucket is a pruned
    single-partition scan — multiprobe turns into an IN-list partition
    filter, still never a full pass.
    """
    bucketed = emb.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    probes = F.array(
        F.col("_bucket"),
        *[
            F.col("_bucket").bitwiseXOR(F.lit(2**p))
            for p in range(min(multiprobe, planes))
        ],
    )
    bucketed = nonzero(bucketed, vec_col)
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qv"), probes.alias("_qbs")
    )
    cands = bucketed.join(
        F.broadcast(q), F.array_contains(F.col("_qbs"), F.col("_bucket"))
    ).filter(F.col(id_col) != query_id)
    scored = cands.select(
        id_col,
        cosine(F.col(vec_col), F.col("_qv"))
        .cast("decimal(18,6)").cast("double")
        .alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def range_search_lsh(
    emb: DataFrame,
    query_id: int,
    threshold: float = 0.4,
    planes: int = 4,
    multiprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Threshold (range) similarity search: every vector with cosine >=
    threshold against the query, scanning only the query's LSH bucket
    plus `multiprobe` Hamming-1 neighbors — the radius-query complement
    of topk_lsh (same bucketing, same pruning, no k cut). The filter
    applies to the DECIMAL(18,6)-hopped score so the >= boundary is
    engine-exact. At rest the probe is a pruned partition IN-list
    (write_lsh_partitioned), identical to the top-k path."""
    bucketed = emb.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    probes = F.array(
        F.col("_bucket"),
        *[
            F.col("_bucket").bitwiseXOR(F.lit(2**p))
            for p in range(min(multiprobe, planes))
        ],
    )
    bucketed = nonzero(bucketed, vec_col)
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qv"), probes.alias("_qbs")
    )
    cands = bucketed.join(
        F.broadcast(q), F.array_contains(F.col("_qbs"), F.col("_bucket"))
    ).filter(F.col(id_col) != query_id)
    scored = cands.select(
        id_col,
        cosine(F.col(vec_col), F.col("_qv"))
        .cast("decimal(18,6)").cast("double")
        .alias("score"),
    )
    return scored.filter(F.col("score") >= threshold).orderBy(
        F.col("score").desc(), F.col(id_col)
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou/Douze/Schmid, "Product Quantization for
# Nearest Neighbor Search", PAMI 2011). The vector is split into M
# subvectors; each subspace gets its own K-centroid codebook, so a vector
# compresses to M small codes (M*log2(K) bits vs dim*32) and query
# distance is an M-term table lookup (ADC) instead of a dim-term fold.
# The memory/bandwidth lever for ANN at 100 TB: the codes table is ~1/64
# the size of the raw vectors, so the scored scan reads that instead.
# Same determinism discipline as ivf_train: hash-seeded init, no RNG.
# ---------------------------------------------------------------------------


def _pq_assign(sub: Column, codebook: list) -> Column:
    """Nearest-codeword index for one subvector, map-side.

    argmin ||s - c||^2 == argmin (|c|^2 - 2<s,c>): |s|^2 is constant per
    row, |c|^2 is a driver-side literal — one _dot_lit fold per codeword.
    Ties resolve to the lowest code (array_position's first minimum)."""
    dists = F.array(
        *[
            F.lit(float(sum(x * x for x in c))) - 2.0 * _dot_lit(sub, c)
            for c in codebook
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """M codebooks of k_codes centroids over dim/m subvectors.

    - Init: the k_codes vectors with the smallest xxhash64(id) seed all M
      codebooks jointly (deterministic on any cluster, no RNG state).
    - Lloyd step: ALL subspaces update in ONE scan per iteration — each
      row emits m (subspace, code, subvector) structs, posexplode twice,
      then a (m x k x subdim)-bounded partial+final AVG; the collect is
      model-sized, never data-sized.
    - Model: m * k_codes * subdim floats on the driver, inlined as plan
      literals downstream (broadcast-free, like ivf_train).
    """
    seeds = (
        emb.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k_codes)
        .collect()
    )
    if not seeds:
        return []
    dim = len(seeds[0][vec_col])
    m = min(m, dim)
    sub = dim // m
    books = [
        [
            [float(x) for x in r[vec_col]][j * sub : (j + 1) * sub]
            for r in seeds
        ]
        for j in range(m)
    ]
    k_codes = len(seeds)
    for _ in range(iters):
        sliced = emb.select(
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            _pq_assign(
                                F.slice(F.col(vec_col), j * sub + 1, sub),
                                books[j],
                            ).alias("c"),
                            F.slice(F.col(vec_col), j * sub + 1, sub).alias(
                                "v"
                            ),
                        )
                        for j in range(m)
                    ]
                )
            )
        )
        means = (
            sliced.select(
                F.col("pos").alias("j"),
                F.col("col.c").alias("c"),
                F.posexplode("col.v"),
            )
            .groupBy("j", "c", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("mu"))
            .collect()
        )
        nxt = [
            [list(books[j][c]) for c in range(k_codes)] for j in range(m)
        ]
        for r in means:  # empty codes keep their previous codeword
            nxt[r["j"]][r["c"]][r["pos"]] = r["mu"]
        books = nxt
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — map-only, no shuffle: each subspace's
    code is an independent argmin fold against plan-literal codewords."""
    return emb.select(
        F.col(id_col), pq_codes_col(F.col(vec_col), codebooks).alias("codes")
    )


def pq_topk_adc(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list | None = None,
) -> DataFrame:
    """Approximate top-k by Asymmetric Distance Computation: the query
    stays exact; each candidate's distance is sum_j LUT[j][code_j], where
    LUT[j][c] = ||q_sub_j - codebook_j[c]||^2 is computed once driver-side
    (m x k_codes doubles) and inlined. The scored scan touches only the
    codes column — at 100 TB that is the entire point: encode once
    (pq_encode, map-only, ~50x smaller than the vectors), then every
    query is a lookup-fold over the codes table, re-ranking optional."""
    emb = nonzero(emb, vec_col)
    books = codebooks or pq_train(emb, m, k_codes, iters, id_col, vec_col)
    q = emb.filter(F.col(id_col) == query_id).select(vec_col).collect()
    if not books or not q:
        return emb.sparkSession.createDataFrame(
            [], f"{id_col} bigint, approx_dist double"
        )
    qv = [float(x) for x in q[0][vec_col]]
    m = len(books)
    sub = len(books[0][0])
    lut = [
        [
            sum((qv[j * sub + i] - c[i]) ** 2 for i in range(sub))
            for c in books[j]
        ]
        for j in range(m)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(float(d)) for d in row]) for row in lut]
    )
    codes = pq_encode(
        emb.filter(F.col(id_col) != query_id), books, id_col, vec_col
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"), lut_lit, lambda c, l: F.element_at(l, c + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes.select(
            id_col,
            dist.cast("decimal(18,6)").cast("double").alias("approx_dist"),
        )
        .orderBy("approx_dist", id_col)
        .limit(k)
    )


def pq_topk_rerank(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 50,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list | None = None,
) -> DataFrame:
    """PQ-ADC shortlist + exact re-rank — the standard two-stage ANN.

    Stage 1 scans only the codes (ADC fold, ~50x less bandwidth than the
    vectors) for a `shortlist`-sized candidate set; stage 2 computes the
    EXACT L2 distance for just those candidates (broadcast semi-join back
    to the vector table). Recall is governed by shortlist/n, cost by the
    codes scan — the knob a 100 TB index actually exposes."""
    emb = nonzero(emb, vec_col)
    books = codebooks or pq_train(emb, m, k_codes, iters, id_col, vec_col)
    cand = pq_topk_adc(
        emb, query_id, shortlist, m, k_codes, iters, id_col, vec_col, books
    ).select(id_col)
    q = emb.filter(F.col(id_col) == query_id).select(vec_col).collect()
    if not q:
        return emb.sparkSession.createDataFrame(
            [], f"{id_col} bigint, dist double"
        )
    qv = [float(x) for x in q[0][vec_col]]
    qq = float(sum(x * x for x in qv))
    exact = emb.join(F.broadcast(cand), id_col).select(
        F.col(id_col),
        # ||q - v||^2 = |q|^2 - 2<q,v> + |v|^2 (one fold per term)
        (
            F.lit(qq)
            - 2.0 * _dot_lit(F.col(vec_col), qv)
            + dot(F.col(vec_col), F.col(vec_col))
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("dist"),
    )
    return exact.orderBy("dist", id_col).limit(k)


def pq_codes_col(vec: Column, codebooks: list) -> Column:
    """The codes array<int> for one vector as a pure expression (shared
    by pq_encode and the materialized index writer)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    return F.array(
        *[
            _pq_assign(F.slice(vec, j * sub + 1, sub), codebooks[j])
            for j in range(m)
        ]
    )


def write_pq_index(
    emb: DataFrame,
    path: str,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Materialize the PQ index: train, then write (id, codes, vector) as
    one parquet table — codes and vector side by side so the ADC scan is
    column-pruned to the tiny codes column while the re-rank stage reads
    vectors only for the shortlist (predicate-pushed id join). Returns
    the codebooks (deterministic — retraining reproduces them)."""
    books = pq_train(emb, m, k_codes, iters, id_col, vec_col)
    emb.withColumn("_codes", pq_codes_col(F.col(vec_col), books)).write.mode(
        "overwrite"
    ).parquet(path)
    return books


def pq_topk_pruned(
    spark,
    path: str,
    codebooks: list,
    query_vec: list,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a write_pq_index table. Stage 1 (the full scan) reads ONLY
    (id, codes) — parquet column pruning keeps the big vector column on
    disk, which at 100 TB is the entire bandwidth story (~50x less read).
    Stage 2 reads vectors for just the broadcast shortlist ids and ranks
    by exact L2."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    qv = [float(x) for x in query_vec]
    lut = [
        [
            sum((qv[j * sub + i] - c[i]) ** 2 for i in range(sub))
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(float(d)) for d in row]) for row in lut]
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("_codes"), lut_lit, lambda c, l: F.element_at(l, c + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        spark.read.parquet(path)
        .select(id_col, "_codes")
        .select(F.col(id_col), dist.alias("_adc"))
        .orderBy("_adc", id_col)
        .limit(shortlist)
        .select(id_col)
    )
    qq = float(sum(x * x for x in qv))
    exact = (
        spark.read.parquet(path)
        .select(id_col, vec_col)
        .join(F.broadcast(cand), id_col)
        .select(
            F.col(id_col),
            (
                F.lit(qq)
                - 2.0 * _dot_lit(F.col(vec_col), qv)
                + dot(F.col(vec_col), F.col(vec_col))
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("dist"),
        )
    )
    return exact.orderBy("dist", id_col).limit(k)


def write_ivfpq_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 8,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple:
    """IVF-PQ composite index (the FAISS IVFPQ shape): rows are
    hive-partitioned by coarse centroid AND carry their PQ codes beside
    the raw vector. A probe multiplies the two prunings — it opens only
    the ``nprobe`` nearest partitions (directory pruning) and scans only
    the codes column inside them (column pruning): nprobe/k x ~1/50 of
    the corpus bytes, which is the I/O equation that makes ANN over
    100 TB a sub-second scan. Returns (centroids, codebooks); both are
    deterministic hash-seeded models, so rebuilds reproduce them."""
    centroids = ivf_train(emb, n_centroids, iters, id_col, vec_col)
    books = pq_train(emb, m, k_codes, iters, id_col, vec_col)
    (
        emb.withColumn("_codes", pq_codes_col(F.col(vec_col), books))
        .withColumn("_cid", ivf_assign_col(F.col(vec_col), centroids))
        .write.mode("overwrite")
        .partitionBy("_cid")
        .parquet(path)
    )
    return centroids, books


def topk_ivfpq_pruned(
    spark,
    path: str,
    centroids: list,
    codebooks: list,
    query_vec: list,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a write_ivfpq_index table: rank centroids driver-side,
    IN-list the partition column (pruned to nprobe directories), ADC
    lookup-fold over the codes column only, exact L2 re-rank of the
    broadcast shortlist (which is the only read of the vector column)."""
    qn = _unit([float(x) for x in query_vec])
    probe_ids = sorted(
        range(len(centroids)),
        key=lambda i: -sum(a * b for a, b in zip(qn, centroids[i])),
    )[:nprobe]
    qv = [float(x) for x in query_vec]
    m = len(codebooks)
    sub = len(codebooks[0][0])
    lut = [
        [
            sum((qv[j * sub + i] - c[i]) ** 2 for i in range(sub))
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(float(d)) for d in row]) for row in lut]
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("_codes"), lut_lit, lambda c, l: F.element_at(l, c + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lists = spark.read.parquet(path).filter(F.col("_cid").isin(probe_ids))
    cand = (
        lists.select(id_col, "_codes")
        .select(F.col(id_col), dist.alias("_adc"))
        .orderBy("_adc", id_col)
        .limit(shortlist)
        .select(id_col)
    )
    qq = float(sum(x * x for x in qv))
    exact = (
        lists.select(id_col, vec_col)
        .join(F.broadcast(cand), id_col)
        .select(
            F.col(id_col),
            (
                F.lit(qq)
                - 2.0 * _dot_lit(F.col(vec_col), qv)
                + dot(F.col(vec_col), F.col(vec_col))
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("dist"),
        )
    )
    return exact.orderBy("dist", id_col).limit(k)


def pca_top_component(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 24,
) -> DataFrame:
    """Top principal direction of the (centered) embedding cloud via
    distributed power iteration — the dominant eigenvector of X'X
    without ever materializing the covariance matrix.

    Per iteration, ONE corpus scan computes y = sum_i <x_i - mu, v>
    (x_i - mu): the projection w_i is a per-row literal-vector fold
    (`_dot_lit` shape), and the per-dimension partial sums travel as
    exact scaled integers (FLOOR(t*1e6 + 0.5) per term), so the shuffle
    carries d rows per partition and the result is bit-identical under
    any partitioning. The d-vector y is collected (model-sized, like
    the IVF centroids), normalized driver-side, quantized to 9dp, and
    sign-fixed (first nonzero component positive) so the iterate — and
    therefore the output — is fully deterministic. Cost at 100 TB:
    iters scans, each map-only + a |dims|-row shuffle; no state beyond
    the d-vector.

    Returns (pos, component) rows, pos 0-based.

    Convergence: the direction error shrinks as (l2/l1)^k, but the
    captured VARIANCE (Rayleigh quotient) shrinks as the square — on a
    near-degenerate spectrum (the synthetic fixture has l2/l1 = 0.93)
    24 iterations put the Rayleigh quotient within 1% of l1 even
    where the specific eigenvector is still rotating inside the
    near-tied top subspace; the variance-capture guarantee is the
    meaningful one there (pinned in tests/test_r6b_ops.py).
    """
    import hashlib

    n = emb.count()
    ex = emb.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
    mu_rows = (
        ex.groupBy("pos")
        .agg(
            (
                F.sum(
                    F.floor(F.col("x").cast("double") * 1000000 + 0.5)
                    .cast("bigint")
                ).cast("double")
                / 1000000
                / n
            ).alias("m")
        )
        .collect()
    )
    mu = [0.0] * len(mu_rows)
    for r in mu_rows:
        mu[r.pos] = round(r.m, 9)
    d = len(mu)

    # deterministic seed direction from md5 (same trick as the LSH
    # plane weights), normalized
    def _seed(i: int) -> float:
        h = hashlib.md5(f"pca:{i}".encode()).hexdigest()
        return int(h[:12], 16) / float(16**12) - 0.5

    v = [_seed(i) for i in range(d)]

    def _norm(vec: list[float]) -> list[float]:
        s = sum(t * t for t in vec) ** 0.5
        if s == 0.0:
            return vec
        out = [round(t / s, 9) for t in vec]
        for t in out:
            if t != 0.0:
                return out if t > 0 else [-u for u in out]
        return out

    v = _norm(v)
    centered = F.zip_with(
        F.col(vec_col),
        F.array(*[F.lit(m) for m in mu]),
        lambda x, m: x.cast("double") - m,
    )
    for _ in range(iters):
        w = F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(t) for t in v]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        y_rows = (
            emb.select(w.alias("_w"), centered.alias("_c"))
            .select("_w", F.posexplode(F.col("_c")).alias("pos", "x"))
            .groupBy("pos")
            .agg(
                F.sum(
                    F.floor(F.col("_w") * F.col("x") * 1000000 + 0.5)
                    .cast("bigint")
                ).alias("s6")
            )
            .collect()
        )
        y = [0.0] * d
        for r in y_rows:
            y[r.pos] = r.s6 / 1000000.0
        v = _norm(y)

    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i, v[i]) for i in range(d)], "pos INT, component DOUBLE"
    )
