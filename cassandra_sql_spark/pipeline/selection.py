"""Data-selection / corpus-mixing operators for training pipelines
(north-star extension; the reference engine has no corpus tooling —
SURVEY §2 scope note). Public techniques:

- Unigram-LM perplexity scoring + head/middle/tail bucketing (CCNet,
  Wenzek et al. 2020): score each document by its mean negative log
  probability under a corpus language model, then keep the low-perplexity
  tiers. The LM here is an add-½-smoothed unigram model trained on the
  corpus itself; a production 5-gram KenLM drops into the same slot (a
  broadcast token->logprob table).
- DSIR importance weighting (Xie et al. 2023): hashed n-gram features,
  per-document importance weight log p_target(f)/p_raw(f) summed over
  feature occurrences, then top-k resampling toward the target domain.
- UniMax budget allocation (Chung et al. 2023): closed-form waterfilling
  of a token/document budget across sources such that no source exceeds
  a max epoch count — the mixing policy used for mC4-scale corpora.
- Per-label embedding dispersion: within-cluster diversity statistics
  (mean squared distance to the centroid) — the signal behind
  diversity-aware selection (e.g. DiverseEvol-style pruning).

All pure JVM expressions (split / higher-order array ops / window
functions) — no Python UDFs; models (vocab logprob tables, bucket weight
tables) are small aggregates broadcast to the scoring join, so the
corpus-sized side streams map-only at 100 TB.

Determinism contract (SURVEY §5): every double that crosses the oracle
boundary is either (a) a single arithmetic expression over exact integers
— bit-identical in any engine — or (b) a transcendental rounded to 6dp
via the scaled-integer hop (FLOOR(x*1e6+0.5) summed as BIGINT), the same
convention as queries/base.dsum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cassandra_sql_spark.pipeline.dedup import tokens, word_ngrams
from cassandra_sql_spark.pipeline.similarity import dot

_SCALE = 1_000_000


def _s6(col: Column) -> Column:
    """6dp scaled-integer rounding: the order-independent summation unit."""
    return F.floor(col * _SCALE + F.lit(0.5)).cast("bigint")


# ---------------------------------------------------------------------------
# Unigram LM scoring (CCNet perplexity tiers)


def unigram_lm_table(df: DataFrame, text_col: str) -> DataFrame:
    """Train the corpus unigram LM: (tok, lp6) where lp6 is the 6dp
    scaled-integer ln p(tok) under add-½ smoothing.

    One explode + one groupBy (shuffle bounded by |vocab|); the totals are
    a 1-row broadcast. At 100 TB the vocab table is frequency-capped with
    an UNK bucket before broadcasting (same shape, bounded size)."""
    cnt = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    )
    p = (F.col("c").cast("double") + 0.5) / (
        F.col("N").cast("double") + 0.5 * F.col("V").cast("double")
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "tok", _s6(F.log(p)).alias("lp6")
    )


def unigram_nll(
    df: DataFrame, id_col: str, text_col: str, lm: DataFrame
) -> DataFrame:
    """Per-document mean negative log probability (nats) under ``lm``.

    The LM is broadcast; the corpus explodes once and aggregates by doc —
    partial aggregation keeps the shuffle at one row per document."""
    ex = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    return (
        ex.join(F.broadcast(lm), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp6").alias("_s6"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (
                -F.col("_s6").cast("double")
                / _SCALE
                / F.col("n_tokens").cast("double")
            ).alias("nll"),
        )
    )


def perplexity_buckets(
    scored: DataFrame, id_col: str, nll_col: str = "nll"
) -> DataFrame:
    """CCNet head/middle/tail tiers by NLL tertile — EXACT, with no
    unpartitioned window (r11 verdict #3: this entry carried a prose
    "shard fallback" note; now the shipped plan IS the sharded one).

    The global rank over the total order (nll, id) comes from
    operators.global_order.sharded_rank (range-shard + per-shard window
    + broadcast prefix offsets), and NTILE(3) collapses to its closed
    form over (rank, n): the first n%3 buckets take n div 3 + 1 rows,
    the rest n div 3 — integer-exact, so the assignment matches the
    oracle's NTILE bit-for-bit. ``perplexity_buckets_approx`` remains
    the sampling-based variant CCNet itself uses when approximate tier
    boundaries are acceptable."""
    from cassandra_sql_spark.operators.global_order import sharded_rank

    d = sharded_rank(
        scored,
        [F.col(nll_col), F.col(id_col)],
        rank_col="_rk",
        total_col="_n",
    )
    # NTILE(k) closed form (ISO semantics, k=3): bucket sizes are
    # n div k + 1 for the first n mod k buckets, n div k after. When
    # n < k the ELSE branch (div by n div k = 0) is unreachable: every
    # rank satisfies rk <= (n mod k) * 1 = n.
    tier = F.expr(
        "CASE WHEN _rk <= (_n % 3) * (_n div 3 + 1) "
        "THEN (_rk - 1) div (_n div 3 + 1) + 1 "
        "ELSE _n % 3 + (_rk - (_n % 3) * (_n div 3 + 1) - 1) "
        "div (_n div 3) + 1 END"
    )
    return d.select(
        *scored.columns,
        F.when(tier == 1, "head")
        .when(tier == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def perplexity_buckets_approx(
    scored: DataFrame,
    nll_col: str = "nll",
    accuracy: int = 10_000,
) -> DataFrame:
    """The at-scale tier assignment: tertile cutpoints from
    approx_percentile (one aggregate pass, mergeable sketch state),
    broadcast into a map-side CASE — no global sort, no single-partition
    window, corpus touched exactly twice (sketch + label), both
    shuffle-free beyond the sketch's constant-size partials. This is how
    CCNet itself buckets (cutoffs from a sample); tier boundaries are
    approximate within the sketch's rank error (1/accuracy), which only
    ever reassigns docs within that band of the cutpoint. Tier-agreement
    vs the exact NTILE form is pinned in tests."""
    cuts = scored.agg(
        F.percentile_approx(
            nll_col, [1.0 / 3.0, 2.0 / 3.0], accuracy
        ).alias("_cuts")
    )
    c = F.col("_cuts")
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            *scored.columns,
            F.when(F.col(nll_col) <= c[0], "head")
            .when(F.col(nll_col) <= c[1], "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR hashed-ngram importance resampling

DSIR_BUCKETS = 256


def hashed_bigram_bucket(gram: Column) -> Column:
    """Feature bucket in [0, 256): the first two hex digits of md5(gram).

    md5 + digit arithmetic is the one hash family Spark and DuckDB spell
    identically (no shared integer-hash builtin); two digits give the 256
    buckets the DSIR paper's hashed generative model defaults to scale
    down to."""
    h = F.md5(gram)
    d1 = F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit("0123456789abcdef"), F.substring(h, 2, 1)) - 1
    return (d1 * 16 + d2).cast("int")


def dsir_bucket_weights(
    df: DataFrame, text_col: str, target_filter: Column
) -> DataFrame:
    """Per-bucket importance log-weight table: (b, lw6) with
    lw6 = 6dp-scaled [ln p_target(b) - ln p_raw(b)], add-1 smoothed.

    Two aggregations over the exploded bigrams (shuffle bounded by 256
    buckets after partial agg); the result is a 256-row broadcast."""
    bg = df.select(
        target_filter.alias("_t"),
        F.explode(word_ngrams(text_col, 2)).alias("g"),
    ).select("_t", hashed_bigram_bucket(F.col("g")).alias("b"))
    per = bg.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
    )
    tot = per.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    lp_t = F.log(
        (F.col("ct").cast("double") + 1.0)
        / (F.col("nt").cast("double") + float(DSIR_BUCKETS))
    )
    lp_r = F.log(
        (F.col("cr").cast("double") + 1.0)
        / (F.col("nr").cast("double") + float(DSIR_BUCKETS))
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "b", _s6(lp_t - lp_r).alias("lw6")
    )


def dsir_doc_weights(
    df: DataFrame, id_col: str, text_col: str, weights: DataFrame
) -> DataFrame:
    """Per-document importance log-weight: sum of the broadcast bucket
    weights over the doc's bigram occurrences. Docs too short to have a
    bigram keep weight 0 (they carry no domain evidence either way)."""
    bg = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, 2)).alias("g")
    ).select(F.col(id_col), hashed_bigram_bucket(F.col("g")).alias("b"))
    scored = (
        bg.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lw6").alias("_w6"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            (
                F.coalesce("_w6", F.lit(0)).cast("double") / _SCALE
            ).alias("logw"),
        )
    )


def dsir_select_topk(
    weighted: DataFrame, id_col: str, frac: float = 0.25
) -> DataFrame:
    """Deterministic DSIR selection: keep the top ``frac`` by importance
    weight (id tiebreak). The paper adds Gumbel noise for sampled-without-
    replacement semantics; a seeded md5-uniform Gumbel plugs into the same
    rank expression when sampling (rather than top-k) is wanted. The
    corpus rank runs through operators.global_order.sharded_rank (r11) —
    per-shard ROW_NUMBER + broadcast prefix offsets, no single-reducer
    sort — so the former "documented shard fallback" note is the shipped
    plan. The cut count rides the SAME pass: sharded_rank's total_col
    exposes |rows| (the last prefix offset, already on the driver), so
    the upstream weighting pipeline is evaluated exactly once (r11
    ADVICE: a separate count() re-ran it)."""
    from cassandra_sql_spark.operators.global_order import sharded_rank

    ranked = sharded_rank(
        weighted,
        [F.col("logw").desc(), F.col(id_col)],
        rank_col="_rk",
        total_col="_n",
    )
    cut = F.ceil(F.col("_n") * F.lit(float(frac)))
    return ranked.select(
        *[c for c in weighted.columns],
        (F.col("_rk") <= cut).alias("keep"),
    )


# ---------------------------------------------------------------------------
# UniMax budget allocation

UNIMAX_SQL = """
WITH s AS (
  SELECT {source} AS source, CAST(COUNT(*) AS BIGINT) AS n
  FROM {table} GROUP BY {source}
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ns,
         CAST(FLOOR(SUM(n) * {budget_frac} + 0.5) AS BIGINT) AS budget
  FROM s
), r AS (
  SELECT source, n, n * {max_epochs} AS cap,
         ROW_NUMBER() OVER (ORDER BY n * {max_epochs}, source) AS i,
         COALESCE(SUM(n * {max_epochs}) OVER (
           ORDER BY n * {max_epochs}, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS pre
  FROM s
), f AS (
  SELECT r.source, r.n, r.cap, r.i, r.pre, t.ns, t.budget,
         CASE WHEN r.cap * (t.ns - r.i + 1) + r.pre < t.budget
              THEN 1 ELSE 0 END AS capped
  FROM r, t
), m AS (
  SELECT COALESCE(SUM(capped), 0) AS n_capped,
         COALESCE(SUM(CASE WHEN capped = 1 THEN cap ELSE 0 END), 0) AS csum
  FROM f
)
SELECT f.source, f.n AS n_docs, CAST(f.cap AS BIGINT) AS capacity,
       CASE WHEN f.capped = 1 THEN CAST(f.cap AS DOUBLE)
            ELSE CAST(f.budget - m.csum AS DOUBLE)
                 / CAST(f.ns - m.n_capped AS DOUBLE) END AS alloc,
       CASE WHEN f.capped = 1 THEN CAST({max_epochs} AS DOUBLE)
            ELSE CAST(f.budget - m.csum AS DOUBLE)
                 / CAST(f.ns - m.n_capped AS DOUBLE)
                 / CAST(f.n AS DOUBLE) END AS epochs
FROM f, m
ORDER BY f.source
"""
# UniMax (Chung et al. 2023, alg. 1): visit sources in increasing
# capacity; give each min(cap_i, remaining / sources_left). In the sorted
# order the "capped" test cap_i * (ns - i + 1) + pre_i < budget is
# monotone (caps ascend while the fair share descends), so the sequential
# loop collapses to one window pass + one scalar aggregate — no
# iteration, engine-agnostic ANSI SQL, and every alloc is a single
# division of exact integers (bit-identical across engines). The window
# runs over one row per SOURCE (thousands at most), never per document.


def unimax_allocation_sql(
    table: str = "documents",
    source: str = "source",
    budget_frac: float = 0.9,
    max_epochs: int = 2,
) -> str:
    """The UniMax waterfilling as one ANSI-SQL statement (DuckDB runs it
    verbatim as the registry entry's oracle; the Spark side now runs
    ``unimax_allocation`` on the sharded global-order primitive)."""
    return UNIMAX_SQL.format(
        table=table,
        source=source,
        budget_frac=budget_frac,
        max_epochs=max_epochs,
    )


def unimax_allocation(
    df: DataFrame,
    source: str = "source",
    budget_frac: float = 0.9,
    max_epochs: int = 2,
) -> DataFrame:
    """UniMax waterfilling as a DataFrame plan with NO unpartitioned
    window (r11 verdict #3). The per-source capacity rank ``i`` and the
    exclusive prefix ``pre`` both ride ONE ``sharded_multi`` pass
    (range-shard on (cap, source), per-shard window, broadcast prefix
    offsets), so the plan holds even when "source" is a fine-grained
    dimension (domain, shard-of-origin) with millions of values — the
    case the old per-source window serialized. Totals and the capped
    mass are 1-row broadcast aggregates; every alloc is a single
    division of exact integers (bit-identical to the oracle SQL).
    """
    from cassandra_sql_spark.operators.global_order import sharded_multi

    s = (
        df.groupBy(F.col(source).alias("source"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("cap", (F.col("n") * F.lit(int(max_epochs))).cast("long"))
    )
    t = s.agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.floor(F.sum("n") * F.lit(float(budget_frac)) + F.lit(0.5))
        .cast("long")
        .alias("budget"),
    )
    ranked = sharded_multi(
        s,
        [F.col("cap"), F.col("source")],
        [
            (F.row_number(), F.count(F.lit(1)).cast("long"), "i"),
            (
                F.sum("cap"),
                F.coalesce(F.sum("cap"), F.lit(0)).cast("long"),
                "cum",
            ),
        ],
    )
    f = (
        ranked.withColumn("pre", F.col("cum") - F.col("cap"))
        .crossJoin(F.broadcast(t))
        .withColumn(
            "capped",
            F.when(
                F.col("cap") * (F.col("ns") - F.col("i") + 1) + F.col("pre")
                < F.col("budget"),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    m = f.agg(
        F.coalesce(F.sum("capped"), F.lit(0)).cast("long").alias("n_capped"),
        F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("cap")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("csum"),
    )
    fair = (F.col("budget") - F.col("csum")).cast("double") / (
        F.col("ns") - F.col("n_capped")
    ).cast("double")
    return f.crossJoin(F.broadcast(m)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("cap").cast("long").alias("capacity"),
        F.when(F.col("capped") == 1, F.col("cap").cast("double"))
        .otherwise(fair)
        .alias("alloc"),
        F.when(F.col("capped") == 1, F.lit(float(max_epochs)))
        .otherwise(fair / F.col("n").cast("double"))
        .alias("epochs"),
    )


# ---------------------------------------------------------------------------
# Per-label embedding dispersion


def label_dispersion(
    emb: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """Within-label diversity: (label, n_vecs, mean_sq_norm,
    centroid_sq_norm, dispersion) where dispersion is the mean squared
    distance to the label centroid, via E||x - c||^2 = E||x||^2 - ||c||^2.

    Two aggregation passes, both shuffle-bounded by |labels| * dim after
    partial agg: per-row squared norms (sequential-fold dot, 6dp-rounded,
    exact BIGINT sum) and per-component scaled sums for the centroid. The
    centroid's squared norm folds components in ascending-position order,
    so both engines sum the same 6dp-rounded means in the same order."""
    e = emb.select(
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    per = (
        e.select(
            "label", _s6(dot(F.col("v"), F.col("v"))).alias("ssq6")
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("ssq6").alias("_ssq6"),
        )
    )
    comp = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.sum(_s6(F.col("x"))).alias("cs6"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "label",
            "pos",
            (
                F.col("cs6").cast("double") / _SCALE / F.col("cnt")
            ).alias("m"),
        )
    )
    c2 = (
        comp.groupBy("label")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "m"))
            ).alias("_cm")
        )
        .select(
            "label",
            (
                _s6(
                    F.aggregate(
                        F.col("_cm"),
                        F.lit(0.0),
                        lambda acc, s: acc + s["m"] * s["m"],
                    )
                ).cast("double")
                / _SCALE
            ).alias("centroid_sq_norm"),
        )
    )
    mean_sq = F.col("_ssq6").cast("double") / _SCALE / F.col("n_vecs")
    return (
        per.join(c2, "label")
        .select(
            "label",
            "n_vecs",
            mean_sq.alias("mean_sq_norm"),
            "centroid_sq_norm",
            (mean_sq - F.col("centroid_sq_norm")).alias("dispersion"),
        )
    )
