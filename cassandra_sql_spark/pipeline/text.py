"""Text-analysis operators for training-data pipelines (north-star
extension; the reference has no text functions beyond LIKE/concat —
SURVEY §2.8).

All pure JVM expressions (split / filter / aggregate lambdas) — the hot
path for 100 TB text stays in whole-stage codegen, no Python exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_sql_spark.pipeline.dedup import tokens

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
FINGERPRINT_MOD = 1_000_000_007


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def stopword_ratio(col: Column) -> Column:
    w = tokens(col)
    hits = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(w)


def avg_token_len(col: Column) -> Column:
    w = tokens(col)
    total = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / F.size(w)


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: long-enough docs with a natural stopword
    ratio and mid-length tokens score high. Deterministic rational math."""
    w = tokens(col)
    n = F.size(w)
    len_score = F.least(n.cast("double") / 50.0, F.lit(1.0))
    stop = stopword_ratio(col)
    stop_score = F.when(stop > 0.02, F.lit(1.0)).otherwise(F.lit(0.5))
    short_ratio = (
        F.size(F.filter(w, lambda t: F.length(t) <= 2)).cast("double") / n
    )
    return (len_score * 0.5 + stop_score * 0.3 + (1.0 - short_ratio) * 0.2)


def langid(col: Column) -> Column:
    """Marker-token language heuristic (n-gram class). The synthetic corpus
    carries no script signal, so this is exercised as a deterministic
    classifier shape: stopword-marker hit rates -> label."""
    w = tokens(col)
    en = F.size(F.filter(w, lambda t: t.isin("the", "a", "of", "and")))
    de = F.size(F.filter(w, lambda t: t.isin("der", "die", "das", "und")))
    fr = F.size(F.filter(w, lambda t: t.isin("le", "la", "les", "et")))
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("unk"))
    )


def fingerprint(col: Column, prefix_len: int = 128) -> Column:
    """Polynomial rolling hash over the first prefix_len characters.

    h = fold(h*131 + ascii(c)) mod 1e9+7 — exact integer math, portable
    across engines (the DuckDB oracle reproduces it with list_reduce).
    """
    p = F.substring(col, 1, prefix_len)
    codes = F.transform(
        F.sequence(F.lit(1), F.length(p)),
        lambda i: F.ascii(p.substr(i, F.lit(1))),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, c: (h * 131 + c) % FINGERPRINT_MOD,
    )


# GPT-2-shaped pretokenizer, minus the trailing-whitespace lookahead (RE2,
# used by the DuckDB oracle, has no lookahead; the simplification only
# changes how runs of spaces split, which BPE merges anyway).
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: pretokenizer segments, the standard fast proxy
    for LLM token budgeting (real BPE merges only ever reduce the count
    within a segment)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0)).cast(
        "long"
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword relevance over a document table, fully declarative.

    Corpus stats (N, avgdl, per-term document frequency) are one global
    aggregate producing a single row that broadcasts back over the corpus —
    at 100 TB that's one partial+final agg pass plus a map-side scored scan,
    no per-term shuffles. IDF uses the standard
    ln(1 + (N - df + 0.5)/(df + 0.5)) form; scores round to 6 decimals so
    the last-ulp of ln() can't differ across engines.
    """
    w = tokens(F.col(text_col))
    dl = F.size(w).cast("double")
    docs = df.select(F.col(id_col), w.alias("_w"), dl.alias("_dl"))
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum(
                F.when(F.array_contains("_w", t), F.lit(1.0)).otherwise(0.0)
            ).alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = docs.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl") / F.col("_n")
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = F.size(F.filter("_w", lambda x: x == F.lit(t))).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
        )
        score = score + idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("_dl") / avgdl)
        )
    return (
        scored.select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
    )


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars"),
        F.round(avg_token_len(c), 6).alias("avg_tok_len"),
        F.round(stopword_ratio(c), 6).alias("stop_ratio"),
        F.round(quality_score(c), 6).alias("quality"),
        langid(c).alias("lang_pred"),
        fingerprint(c).alias("fp"),
    )
