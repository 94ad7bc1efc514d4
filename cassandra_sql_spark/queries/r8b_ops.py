"""Round-8 operator entries, part 2.

- stat_anova_weekday: one-way ANOVA F over the 7 weekday groups of the
  daily series. The 7 group keys are FIXED literals, so the
  between-group sum of squares is a fixed-order nested expression —
  never an unordered SUM over double terms (IEEE addition is not
  associative; the fold-vs-SUM trap in the determinism notes).
- stat_wilcoxon_signed_rank: paired first-half/second-half user spend,
  doubled midranks over |diff| (exact ints end to end).
- shard_assignment: deterministic md5 sharding of the corpus — the
  write-side step of every distributed training-data layout.
- pipeline_filter_funnel: FineWeb-style quality-filter chain with
  first-failing-rule attribution, single map-side scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import Q, df_q, sql_q

# -- one-way ANOVA across weekday groups ---------------------------------
# Integer power sums per weekday (pivoted to fixed columns via MAX CASE
# over at most 7 rows); SST's pieces are integer sums (associative, SUM
# is safe); only the 7 SSB terms are doubles, combined left-to-right.

_WD = list(range(7))


def _anova_sql(dd: str) -> str:
    piv = ",\n         ".join(
        f"COALESCE(MAX(CASE WHEN weekday = {w} THEN {c} END), 0) AS {c}{w}"
        for w in _WD
        for c in ("nw", "sw", "qw")
    )
    ssb_terms = " + ".join(
        f"(CASE WHEN nw{w} > 0 THEN CAST(sw{w} AS DOUBLE)"
        f" * CAST(sw{w} AS DOUBLE) / CAST(nw{w} AS DOUBLE)"
        f" ELSE 0.0 END)"
        for w in _WD
    )
    k_eff = " + ".join(f"(CASE WHEN nw{w} > 0 THEN 1 ELSE 0 END)"
                       for w in _WD)
    n_tot = " + ".join(f"nw{w}" for w in _WD)
    s_tot = " + ".join(f"sw{w}" for w in _WD)
    q_tot = " + ".join(f"qw{w}" for w in _WD)
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
wd AS (
  SELECT CAST({dd} AS BIGINT) % 7 AS weekday, y FROM daily
),
g AS (
  SELECT weekday, CAST(COUNT(*) AS BIGINT) AS nw,
         CAST(SUM(y) AS BIGINT) AS sw, CAST(SUM(y * y) AS BIGINT) AS qw
  FROM wd GROUP BY weekday
),
p AS (
  SELECT {piv}
  FROM g
),
c AS (
  SELECT CAST({n_tot} AS BIGINT) AS n, CAST({s_tot} AS BIGINT) AS s,
         CAST({q_tot} AS BIGINT) AS q, CAST({k_eff} AS BIGINT) AS k,
         ({ssb_terms}) AS ssb_raw
  FROM p
)
SELECT n AS n_days, k AS n_groups,
       ssb_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
         AS ss_between,
       CAST(q AS DOUBLE)
         - ssb_raw AS ss_within,
       ((ssb_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          / CAST(k - 1 AS DOUBLE))
         / ((CAST(q AS DOUBLE) - ssb_raw) / CAST(n - k AS DOUBLE))
         AS f_stat
FROM c
WHERE k >= 2 AND n > k AND CAST(q AS DOUBLE) - ssb_raw > 0
"""


# -- Wilcoxon signed-rank on paired user spend ----------------------------
def _wilcoxon_sql(dd: str) -> str:
    return f"""
WITH base AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
ed AS (SELECT user_id, CAST({dd} AS BIGINT) AS ed, c FROM base),
rng AS (
  SELECT CAST(FLOOR((MIN(ed) + MAX(ed)) / 2.0) AS BIGINT) AS mid FROM ed
),
pu AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ed <= rng.mid THEN c ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(SUM(CASE WHEN ed > rng.mid THEN c ELSE 0 END) AS BIGINT)
           AS c2
  FROM ed, rng GROUP BY user_id
),
dif AS (SELECT c2 - c1 AS dd FROM pu WHERE c2 - c1 <> 0),
ad AS (
  SELECT ABS(dd) AS a, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp
  FROM dif GROUP BY ABS(dd)
),
mr AS (
  SELECT a, t, tp,
         COALESCE(2 * SUM(t) OVER (ORDER BY a
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS dr
  FROM ad
),
agg AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(tp * dr) AS BIGINT) AS w2,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie
  FROM mr
)
SELECT n AS n_pairs, CAST(w2 AS DOUBLE) / 2 AS w_plus,
       (CAST(2 * w2 - n * (n + 1) AS DOUBLE) / 4)
         / SQRT(CAST(2 * n * (n + 1) * (2 * n + 1) - tie AS DOUBLE) / 48)
         AS z_score
FROM agg WHERE n > 0
"""


# -- deterministic md5 sharding -------------------------------------------
_SHARD_SPARK = """
WITH s AS (
  SELECT doc_id, n_chars,
         PMOD(CAST(CONV(SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 15),
                        16, 10) AS BIGINT), 16) AS shard
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT)
         AS max_doc
FROM s GROUP BY shard ORDER BY shard
"""

_SHARD_DUCK = """
WITH s AS (
  SELECT doc_id, n_chars,
         ((('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16)
          + 16) % 16 AS shard
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT)
         AS max_doc
FROM s GROUP BY shard ORDER BY shard
"""

# -- quality-filter funnel with first-failing-rule attribution ------------
# Rules in precedence order (a doc is attributed to the FIRST rule it
# fails): too_short (< 200 chars), too_few_words (< 30), word-length
# band (mean word length outside [3, 10] — cross-multiplied, no
# division), symbol_heavy (letters+digits+spaces < 70% of chars).
# One map-side scan; the shuffle carries 5 rows.


def _funnel_sql(ntok: str, alnum: str) -> str:
    return f"""
WITH m AS (
  SELECT doc_id,
         length(text) AS nch,
         {ntok} AS ntok,
         length(replace(text, ' ', '')) AS nosp,
         {alnum} AS nalnum
  FROM documents
),
r AS (
  SELECT doc_id,
         CASE
           WHEN nch < 200 THEN 'r1_too_short'
           WHEN ntok < 30 THEN 'r2_too_few_words'
           WHEN nosp < 3 * ntok OR nosp > 10 * ntok
             THEN 'r3_word_length_band'
           WHEN 10 * nalnum < 7 * nch THEN 'r4_symbol_heavy'
           ELSE 'keep'
         END AS rule
  FROM m
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r)
SELECT rule, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS DOUBLE) / tot.n AS share
FROM r, tot GROUP BY rule, tot.n ORDER BY rule
"""


# Oracle for the WAV pitch detector: replay the square-wave samples
# (s_i = +-1500 by (i // h) % 2, h = 3 + id%5, n = 96) per lag, take
# argmax with ties to the lowest lag. The Spark side decodes REAL RIFF
# bytes; only the oracle touches the closed form.
_PITCH_ORACLE = """
WITH d AS (
  SELECT doc_id, 3 + doc_id % 5 AS h FROM documents WHERE doc_id < 200
),
lag AS (SELECT UNNEST(generate_series(2, 16)) AS l),
s AS (
  SELECT doc_id, h, l, UNNEST(generate_series(0, 95 - l)) AS i
  FROM d, lag
),
v AS (
  SELECT doc_id, l,
         (CASE WHEN (i // h) % 2 = 0 THEN 1500 ELSE -1500 END)
         * (CASE WHEN ((i + l) // h) % 2 = 0 THEN 1500 ELSE -1500 END)
           AS p
  FROM s
),
r AS (SELECT doc_id, l, CAST(SUM(p) AS BIGINT) AS rl FROM v GROUP BY doc_id, l),
best AS (
  SELECT doc_id, l, rl,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY rl DESC, l) AS rk
  FROM r
),
e AS (
  SELECT doc_id, CAST(96 AS BIGINT) AS n_samples,
         CAST(96 * 1500 * 1500 AS BIGINT) AS r0
  FROM d
)
SELECT e.doc_id, e.n_samples, CAST(b.l AS BIGINT) AS best_lag,
       b.rl AS r_best, e.r0
FROM best b JOIN e ON b.doc_id = e.doc_id WHERE b.rk = 1
"""

# Local maxima of the daily series (strict peaks) — the alerting
# primitive under every monitoring dashboard. ANSI, same-string.
_PEAKS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
l AS (
  SELECT d, n,
         LAG(n) OVER (ORDER BY d) AS pn,
         LEAD(n) OVER (ORDER BY d) AS nn
  FROM daily
)
SELECT d AS peak_day, n AS n_events
FROM l
WHERE pn IS NOT NULL AND nn IS NOT NULL AND n > pn AND n > nn
ORDER BY peak_day
"""

QUERIES: dict[str, Q] = {
    "audio_pitch_autocorr": df_q(
        lambda spark, sf: multimodal.audio_pitch_wav(
            multimodal.synth_wav_square(
                load(spark, sf, "documents")
                .select("doc_id")
                .filter(F.col("doc_id") < 200)
            )
        ),
        ("documents",),
        oracle=_PITCH_ORACLE,
    ),
    "series_peak_detection": sql_q(_PEAKS_SQL, ("events",)),
    "stat_anova_weekday": sql_q(
        _anova_sql("DATEDIFF(d, DATE'1969-12-29')"),
        ("events",),
        oracle=_anova_sql("date_diff('day', DATE '1969-12-29', d)"),
    ),
    "stat_wilcoxon_signed_rank": sql_q(
        _wilcoxon_sql("DATEDIFF(d, DATE'1969-12-29')"),
        ("events",),
        oracle=_wilcoxon_sql("date_diff('day', DATE '1969-12-29', d)"),
    ),
    "shard_assignment": sql_q(
        _SHARD_SPARK, ("documents",), oracle=_SHARD_DUCK
    ),
    "pipeline_filter_funnel": sql_q(
        _funnel_sql(
            ntok="size(split(trim(text), '\\\\s+'))",
            alnum="length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))",
        ),
        ("documents",),
        oracle=_funnel_sql(
            ntok="len(string_split_regex(trim(text), '\\s+'))",
            alnum="length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))",
        ),
    ),
}


# -- embedding-space decontamination ---------------------------------------
# The semantic complement of the n-gram/Bloom decontam family: corpus
# vectors within cosine >= 0.25 (a 2-sigma tail for these near-random 64-dim fixtures) of ANY benchmark vector (vec_id < 20
# plays the benchmark set) are flagged. The benchmark side is always
# broadcast-small; the corpus streams map-side — at 100 TB this is the
# same shape as the broadcast 5-gram decontam. Scores take the
# DECIMAL(18,6) hop so the >= boundary is engine-exact.
_DECONTAM_EMB_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
),
bench AS (SELECT vec_id AS bid, v AS bv FROM e WHERE vec_id < 20),
corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 20),
hits AS (
  SELECT c.vec_id, b.bid,
         CAST(CAST(list_dot_product(c.v, b.bv)
                   / (sqrt(list_dot_product(c.v, c.v))
                      * sqrt(list_dot_product(b.bv, b.bv)))
                   AS DECIMAL(18,6)) AS DOUBLE) AS score
  FROM corpus c, bench b
)
SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_benchmark_hits,
       MAX(score) AS max_score
FROM hits WHERE score >= 0.25
GROUP BY vec_id ORDER BY vec_id
"""


def _decontam_embedding(spark, sf):
    from cassandra_sql_spark.pipeline.similarity import cosine, nonzero

    emb = nonzero(load(spark, sf, "embeddings"))
    bench = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("bv")
    )
    corpus = emb.filter(F.col("vec_id") >= 20)
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        cosine(F.col("embedding"), F.col("bv"))
        .cast("decimal(18,6)").cast("double").alias("score"),
    )
    return (
        scored.filter(F.col("score") >= 0.25)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_benchmark_hits"),
            F.max("score").alias("max_score"),
        )
        .orderBy("vec_id")
    )


# -- n-gram vocabulary coverage --------------------------------------------
# What fraction of all corpus trigram OCCURRENCES do the top-k distinct
# trigrams cover? The head-coverage curve point behind tokenizer and
# cache sizing. Exact integer cumulative counts; ties broken
# (count DESC, gram) for a total order. Only ranks <= max(k) are ever
# read, so the cumulative window runs over a pre-limited top-{head_k}
# head (Spark plans the ORDER BY+LIMIT as TakeOrderedAndProject —
# per-partition partial top-k, no global sort) and the corpus-wide
# total comes from a scalar aggregate. The former full-vocab
# unpartitioned window was a single-reducer sort over the entire
# distinct-trigram vocabulary — billions of rows at 100 TB
# (r8 verdict, What's wrong #2); this head is <= 1000 rows at any scale.
_COVERAGE_BODY = """
WITH g AS (
  SELECT {gram} AS gram FROM {src}
),
c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY gram),
t AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS tot,
         CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM c
),
head AS (
  SELECT gram, cnt FROM c ORDER BY cnt DESC, gram LIMIT {head_k}
),
r AS (
  SELECT SUM(cnt) OVER (ORDER BY cnt DESC, gram
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, gram) AS rk
  FROM head
),
ks AS (SELECT {grid} AS k)
SELECT CAST(ks.k AS BIGINT) AS top_k,
       CAST(MAX(CASE WHEN rk = ks.k THEN cum END) AS BIGINT) AS covered,
       CAST(MAX(t.tot) AS BIGINT) AS total_occurrences,
       CAST(MAX(CASE WHEN rk = ks.k THEN cum END) AS DOUBLE)
         / MAX(t.tot) AS coverage
FROM r, ks, t
WHERE ks.k <= t.n_grams
GROUP BY ks.k ORDER BY top_k
"""

# CASE guard: Spark sequence(1, 0) DESCENDS to [1, 0] (the empty-media
# trap) and would index past short token arrays — docs under 3 tokens
# contribute no grams, matching DuckDB's empty range().
_COV_SPARK_SRC = (
    "(SELECT explode(CASE WHEN size(w) >= 3 THEN"
    " transform(sequence(1, size(w) - 2),"
    " i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"
    " ELSE array() END) AS gram FROM"
    " (SELECT split(trim(text), '\\\\s+') AS w FROM documents) t)"
)
_COV_DUCK_SRC = (
    "(SELECT UNNEST([w[i] || ' ' || w[i+1] || ' ' || w[i+2]"
    " for i in range(1, len(w) - 1)]) AS gram FROM"
    " (SELECT string_split_regex(trim(text), '\\s+') AS w"
    " FROM documents) t)"
)

QUERIES.update(
    {
        "decontam_embedding": df_q(
            _decontam_embedding, ("embeddings",),
            oracle=_DECONTAM_EMB_ORACLE,
        ),
        "text_ngram_coverage": sql_q(
            _COVERAGE_BODY.format(
                gram="gram", src=_COV_SPARK_SRC, head_k=1000,
                grid="explode(array(10, 100, 1000))",
            ),
            ("documents",),
            oracle=_COVERAGE_BODY.format(
                gram="gram", src=_COV_DUCK_SRC, head_k=1000,
                grid="UNNEST([10, 100, 1000])",
            ),
        ),
    }
)


# -- conversion latency percentiles ----------------------------------------
# Time from each user's first signup to their first subsequent purchase,
# in whole seconds (exact integers — CAST(interval AS BIGINT) on Spark
# == FLOOR(epoch(...)) on DuckDB for non-negative gaps), p25/p50/p75/p90
# via the integer-threshold rule over the DISTINCT latency values.
_TTC_BODY = """
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
  FROM events WHERE ts IS NOT NULL GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase, f.first_signup
  FROM events e JOIN f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
    AND f.first_signup IS NOT NULL AND e.ts >= f.first_signup
  GROUP BY e.user_id, f.first_signup
),
lat AS (
  SELECT {secs} AS s FROM p
),
dist AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS t FROM lat GROUP BY s),
w AS (
  SELECT s,
         SUM(t) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cw,
         SUM(t) OVER () AS tw
  FROM dist
),
g AS (SELECT {grid} AS q)
SELECT CAST(g.q AS BIGINT) AS pct,
       CAST(MIN(CASE WHEN 100 * w.cw >= g.q * w.tw THEN w.s END)
            AS BIGINT) AS latency_s
FROM g, w GROUP BY g.q ORDER BY pct
"""

QUERIES.update(
    {
        "event_time_to_convert": sql_q(
            _TTC_BODY.format(
                secs="CAST(first_purchase - first_signup AS BIGINT)",
                grid="explode(array(25, 50, 75, 90))",
            ),
            ("events",),
            oracle=_TTC_BODY.format(
                secs=(
                    "CAST(FLOOR(epoch(first_purchase - first_signup))"
                    " AS BIGINT)"
                ),
                grid="UNNEST([25, 50, 75, 90])",
            ),
        ),
    }
)
