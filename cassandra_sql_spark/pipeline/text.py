"""Text-analysis operators for training-data pipelines (north-star
extension; the reference has no text functions beyond LIKE/concat —
SURVEY §2.8).

All pure JVM expressions (split / filter / aggregate lambdas) — the hot
path for 100 TB text stays in whole-stage codegen, no Python exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_sql_spark.pipeline.dedup import _let, spread, tokens, word_ngrams

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


def quality_logistic(col: Column) -> Column:
    """Linear quality classifier: sigmoid over the heuristic features —
    the fasttext-style model-scoring slot. Weights are a driver-side
    constant inlined into the plan (a trained model's coefficients drop in
    the same way); evaluation is one map-side JVM expression per doc, no
    shuffle, no UDF. Probability goes through the DECIMAL(18,6)->DOUBLE
    hop so exp()'s last ulp can't differ across engines."""
    w = tokens(col)
    n = F.size(w).cast("double")
    len_feat = F.least(n / 50.0, F.lit(1.0))
    stop = stopword_ratio(col)
    short_ratio = (
        F.size(F.filter(w, lambda t: F.length(t) <= 2)).cast("double") / n
    )
    z = (
        F.lit(-1.0)
        + F.lit(2.0) * len_feat
        + F.lit(3.0) * stop
        - F.lit(0.5) * short_ratio
    )
    return (
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        .cast("decimal(18,6)")
        .cast("double")
    )


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
    # split-to-chars materializes the prefix once per row; indexing with
    # p.substr(i, 1) inside the lambda would re-evaluate the substring
    # expression per element (O(len^2) in the interpreted lambda engine).
    codes = F.transform(F.split(p, ""), F.ascii)
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


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, dup_threshold: float = 0.06
) -> DataFrame:
    """Gopher-style within-document repetition metrics.

    duplicate 2-gram fraction (1 - distinct/total) and top-2-gram fraction
    (most frequent 2-gram's share) — the standard repetition quality gates
    for LLM corpora.

    Shape: ZERO-shuffle map-only — per doc, sort the int64-hashed 2-gram
    array and fold it once (run-length scan tracking distinct count and
    max run), all inside codegen. The previous explode -> count per
    (doc, gram) -> per-doc rollup shape shuffled every gram of the corpus
    twice; this one shuffles nothing (measured equal output, ~30% faster
    at sf0.1, and the at-scale delta is the entire (doc, gram) exchange).
    The per-doc sort is O(n log n) on in-row longs — cache-resident next
    to the string work that produced the grams. The fold runs under a
    _let binding: an unpinned gram array would be re-evaluated per fold
    step by CollapseProject inlining (the historical 400x trap).
    """
    w = tokens(F.col(text_col))
    grams = F.array_sort(
        F.transform(word_ngrams(text_col, 2), lambda g: F.xxhash64(g))
    )

    def stats(g: Column) -> Column:
        init = F.struct(
            F.lit(0).cast("long").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("maxrun"),
            F.lit(0).alias("distinct"),
            F.lit(True).alias("first"),
        )

        def step(acc: Column, x: Column) -> Column:
            same = (~acc["first"]) & (x == acc["prev"])
            run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["maxrun"], run).alias("maxrun"),
                (acc["distinct"] + F.when(same, 0).otherwise(1)).alias(
                    "distinct"
                ),
                F.lit(False).alias("first"),
            )

        folded = F.aggregate(g, init, step)
        return F.struct(
            F.size(g).alias("total"),
            folded["maxrun"].alias("maxrun"),
            folded["distinct"].alias("distinct"),
        )

    s = _let(grams, stats)
    total = F.col("_s.total").cast("double")
    dup_frac = 1.0 - F.col("_s.distinct").cast("double") / total
    return (
        spread(df)
        .filter(F.size(w) >= 2)
        .select(F.col(id_col), s.alias("_s"))
        .select(
            F.col(id_col),
            F.col("_s.total").cast("long").alias("n_2grams"),
            F.round(dup_frac, 6).alias("dup_2gram_frac"),
            F.round(
                F.col("_s.maxrun").cast("double") / total, 6
            ).alias("top_2gram_frac"),
            (dup_frac > dup_threshold).alias("is_repetitive"),
        )
    )


def chunk_sliding(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding-window token chunking (training-sequence preparation).

    Chunk k covers tokens [1 + k*stride, 1 + k*stride + size); the last
    window may be short. Emits (id, chunk_idx, start_token, n_chunk_tokens,
    chunk_md5) — the chunk text itself is hashed, not carried, so the
    exploded output stays narrow. Pure map-side explode: no shuffle, output
    rows ~ n_tokens/stride per doc at any scale.
    """
    w = tokens(F.col(text_col))
    n = F.size(w)
    last = F.greatest(
        F.ceil((n - F.lit(size)).cast("double") / stride).cast("int"),
        F.lit(0),
    )
    return (
        df.select(F.col(id_col), w.alias("_w"), n.alias("_n"), last.alias("_last"))
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.col("_last"))).alias("chunk_idx"),
            F.col("_w"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride + 1).cast("long").alias("start_token"),
            F.size(F.slice("_w", F.col("chunk_idx") * stride + 1, size))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.md5(
                F.concat_ws(
                    " ", F.slice("_w", F.col("chunk_idx") * stride + 1, size)
                )
            ).alias("chunk_md5"),
        )
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"


def redact_pii(col: Column) -> Column:
    """Replace email addresses and phone-shaped tokens with typed tags."""
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def pii_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc PII scrub report: match counts + hash of the redacted text.

    Map-only (regex per row, no shuffle); the redacted text is hashed so the
    result stays narrow regardless of document size.
    """
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(redact_pii(c)).alias("redacted_md5"),
    )


def gopher_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 25,
    max_tokens: int = 5_000,
    min_avg_len: float = 3.0,
    max_avg_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
    max_symbol_ratio: float = 0.1,
) -> DataFrame:
    """Gopher-style rule-based document filter (Rae et al. 2021, table A1),
    the standard pretraining quality gate: per-document metrics, one boolean
    per rule, and the conjunction as ``keep``.

    Rules (thresholds tuned so the synthetic corpus exercises both sides):
    token count in [min,max]; mean word length in [min,max]; >=80% of words
    contain an alphabetic character; >=2 stopword hits; symbol('#','...')
    -to-word ratio below 0.1.

    Map-only: one split per doc, higher-order-function lambdas, no shuffle,
    no UDF — at 100 TB this is a pure scan-side filter that composes with
    any downstream op without adding an exchange.
    """
    c = F.col(text_col)
    w = tokens(c)
    n = F.size(w)
    nd = n.cast("double")
    avg_len = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ).cast("double") / nd
    alpha_ratio = (
        F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]"))).cast("double") / nd
    )
    stop_hits = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS))).cast("long")
    symbol_ratio = (
        F.size(F.filter(w, lambda t: (t == "#") | (t == "..."))).cast(
            "double"
        )
        / nd
    )
    out = df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_tok_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
    )
    rules = {
        "ok_n_tokens": (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens),
        "ok_avg_len": (F.col("avg_tok_len") >= min_avg_len)
        & (F.col("avg_tok_len") <= max_avg_len),
        "ok_alpha": F.col("alpha_ratio") >= min_alpha_ratio,
        "ok_stopwords": F.col("stop_hits") >= min_stop_hits,
        "ok_symbols": F.col("symbol_ratio") < max_symbol_ratio,
    }
    keep = F.lit(True)
    for name, pred in rules.items():
        out = out.withColumn(name, pred)
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


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
