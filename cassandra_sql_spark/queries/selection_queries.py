"""Registry entries for the data-selection / corpus-mixing operators
(pipeline/selection.py): CCNet perplexity tiers, DSIR importance
resampling, UniMax budget allocation, per-label embedding dispersion.

Each entry has a full DuckDB oracle; doubles cross the boundary only as
single divisions of exact integers or 6dp scaled-integer-rounded
transcendentals (the queries/base.py convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import selection
from cassandra_sql_spark.queries.base import Q, df_q, sql_q


def _unigram_lm(spark, sf):
    docs = load(spark, sf, "documents")
    lm = selection.unigram_lm_table(docs, "text")
    scored = selection.unigram_nll(docs, "doc_id", "text", lm)
    return selection.perplexity_buckets(scored, "doc_id")


_UNIGRAM_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
), cnt AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
  FROM cnt
), vocab AS (
  SELECT tok,
         CAST(FLOOR(ln((c::DOUBLE + 0.5) / (n::DOUBLE + 0.5 * v::DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS lp6
  FROM cnt, tot
), doc AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         SUM(v.lp6) AS s6
  FROM toks t JOIN vocab v USING (tok) GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       -CAST(s6 AS DOUBLE) / 1000000 / CAST(n_tokens AS DOUBLE) AS nll,
       CASE NTILE(3) OVER (
              ORDER BY -CAST(s6 AS DOUBLE) / 1000000
                       / CAST(n_tokens AS DOUBLE), doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS bucket
FROM doc
"""


def _dsir(spark, sf):
    docs = load(spark, sf, "documents")
    w = selection.dsir_bucket_weights(docs, "text", F.col("lang") == "en")
    d = selection.dsir_doc_weights(docs, "doc_id", "text", w)
    return selection.dsir_select_topk(d, "doc_id", 0.25)


_DSIR_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w
  FROM documents
), bg AS (
  SELECT doc_id, lang,
         unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
  FROM toks
), bb AS (
  SELECT doc_id, lang,
         CAST((instr('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
              + (instr('0123456789abcdef', substr(md5(g), 2, 1)) - 1)
              AS INTEGER) AS b
  FROM bg
), per AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
  FROM bb GROUP BY b
), tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
  FROM per
), wtab AS (
  SELECT b,
         CAST(FLOOR((ln((ct::DOUBLE + 1.0) / (nt::DOUBLE + 256.0))
                     - ln((cr::DOUBLE + 1.0) / (nr::DOUBLE + 256.0)))
                    * 1000000 + 0.5) AS BIGINT) AS lw6
  FROM per, tot
), doc AS (
  SELECT bb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
         SUM(w2.lw6) AS w6
  FROM bb JOIN wtab w2 USING (b) GROUP BY bb.doc_id
), allw AS (
  SELECT d.doc_id,
         COALESCE(doc.n_feats, 0) AS n_feats,
         CAST(COALESCE(doc.w6, 0) AS DOUBLE) / 1000000 AS logw
  FROM documents d LEFT JOIN doc ON doc.doc_id = d.doc_id
)
SELECT doc_id, n_feats, logw,
       ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id)
         <= CEIL(COUNT(*) OVER () * 0.25) AS keep
FROM allw
"""


_DISPERSION_ORACLE = """
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
), per AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         SUM(CAST(FLOOR(list_dot_product(v, v) * 1000000 + 0.5)
                  AS BIGINT)) AS ssq6
  FROM e GROUP BY label
), comp AS (
  SELECT label, i,
         SUM(CAST(FLOOR(v[i] * 1000000 + 0.5) AS BIGINT)) AS cs6,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM e, UNNEST(generate_series(1, len(v))) AS t(i)
  GROUP BY label, i
), cent AS (
  SELECT label, i, CAST(cs6 AS DOUBLE) / 1000000 / cnt AS m FROM comp
), c2 AS (
  SELECT label,
         CAST(CAST(FLOOR(
           list_reduce(list_prepend(0.0, list(m * m ORDER BY i)),
                       (a, b) -> a + b) * 1000000 + 0.5) AS BIGINT)
           AS DOUBLE) / 1000000 AS centroid_sq_norm
  FROM cent GROUP BY label
)
SELECT per.label, per.n_vecs,
       CAST(ssq6 AS DOUBLE) / 1000000 / n_vecs AS mean_sq_norm,
       c2.centroid_sq_norm,
       CAST(ssq6 AS DOUBLE) / 1000000 / n_vecs - c2.centroid_sq_norm
         AS dispersion
FROM per JOIN c2 USING (label)
"""


def _source_kl(spark, sf):
    """Per-source KL(p_source || p_corpus) over the token unigram
    distribution — the mixing diagnostic that tells you which sources are
    distributionally far from the blend. Shuffle bounded by
    |sources| x |vocab| after partial agg; per-term contributions are
    9dp scaled-int rounded so the exact BIGINT sum is order-independent."""
    docs = load(spark, sf, "documents")
    from cassandra_sql_spark.pipeline.dedup import tokens

    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    per = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cs"))
    corpus = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = corpus.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    stot = per.groupBy("source").agg(F.sum("cs").alias("ns"))
    j = (
        per.join(F.broadcast(corpus), "tok")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(totals))
    )
    ps = (F.col("cs").cast("double") + 0.5) / (
        F.col("ns").cast("double") + 0.5 * F.col("v").cast("double")
    )
    p = (F.col("c").cast("double") + 0.5) / (
        F.col("n").cast("double") + 0.5 * F.col("v").cast("double")
    )
    term9 = F.floor(
        ps * (F.log(ps) - F.log(p)) * 1_000_000_000 + F.lit(0.5)
    ).cast("bigint")
    return (
        j.select("source", F.col("ns").cast("long").alias("n_tokens"), term9.alias("_t9"))
        .groupBy("source", "n_tokens")
        .agg(
            (F.sum("_t9").cast("double") / 1_000_000_000).alias("kl_nats")
        )
    )


_SOURCE_KL_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
), per AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cs
  FROM tok GROUP BY source, tok
), corpus AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok
), totals AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
  FROM corpus
), stot AS (
  SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM per GROUP BY source
)
SELECT per.source, stot.ns AS n_tokens,
       CAST(SUM(CAST(FLOOR(
         ((cs::DOUBLE + 0.5) / (ns::DOUBLE + 0.5 * v::DOUBLE))
         * (ln((cs::DOUBLE + 0.5) / (ns::DOUBLE + 0.5 * v::DOUBLE))
            - ln((c::DOUBLE + 0.5) / (n::DOUBLE + 0.5 * v::DOUBLE)))
         * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000
         AS kl_nats
FROM per
JOIN corpus USING (tok)
JOIN stot ON stot.source = per.source
CROSS JOIN totals
GROUP BY per.source, stot.ns
"""


QUERIES: dict[str, Q] = {
    # CCNet-style (Wenzek et al. 2020) LM scoring: every doc's mean
    # negative log prob under the corpus unigram LM, tiered head/middle/
    # tail. The LM is a broadcast token->logprob table; a KenLM 5-gram
    # drops into the same slot.
    "text_unigram_lm": df_q(
        _unigram_lm, ("documents",), oracle=_UNIGRAM_LM_ORACLE
    ),
    # DSIR (Xie et al. 2023): hashed-bigram importance weights toward the
    # lang='en' target slice; deterministic top-25% selection.
    "dsir_importance": df_q(_dsir, ("documents",), oracle=_DSIR_ORACLE),
    # UniMax (Chung et al. 2023) epoch-capped budget allocation across
    # sources. Allocation dimension is `lang` (the corpus' skewed
    # grouping: `source` is uniform in the synthetic data, which would
    # never exercise the capped branch); small languages hit the 2-epoch
    # cap, the big one absorbs the remaining budget. The Spark side runs
    # the sharded_multi form (rank + prefix-sum in one shard pass, no
    # unpartitioned window — r12); DuckDB runs the one-statement ANSI
    # form as the oracle.
    "sample_unimax": df_q(
        lambda spark, sf: selection.unimax_allocation(
            load(spark, sf, "documents"),
            source="lang",
            budget_frac=1.8,
            max_epochs=2,
        ),
        ("documents",),
        oracle=selection.unimax_allocation_sql(
            table="documents", source="lang",
            budget_frac=1.8, max_epochs=2,
        ),
    ),
    # Mixing diagnostic: which sources sit distributionally far from the
    # corpus blend (drives re-weighting decisions alongside sample_unimax
    # / sample_temperature).
    "mix_source_kl": df_q(
        _source_kl, ("documents",), oracle=_SOURCE_KL_ORACLE
    ),
    # Within-label embedding diversity: mean squared distance to the
    # label centroid via E||x-c||^2 = E||x||^2 - ||c||^2, exact
    # scaled-integer sums on both sides.
    "emb_label_dispersion": df_q(
        lambda spark, sf: selection.label_dispersion(
            load(spark, sf, "embeddings"), "label", "embedding"
        ),
        ("embeddings",),
        oracle=_DISPERSION_ORACLE,
    ),
}
