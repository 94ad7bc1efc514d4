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
