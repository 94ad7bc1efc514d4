"""Query entries for the LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal) with DuckDB oracles wherever the computation is
SQL-expressible; probabilistic/hash-family ops (simhash, LSH buckets) are
rows-only here and recall-tested in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import (
    dedup,
    multimodal,
    similarity,
    sketches,
    text,
)
from cassandra_sql_spark.queries.base import Q, df_q

# Brute-force shingle-Jaccard oracle (DuckDB list lambdas). Complete
# ground truth for both the inverted-index and the MinHash-LSH paths.
_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in range(1, len(w)-1)]) AS s
  FROM toks
)
SELECT a.doc_id AS da, b.doc_id AS db,
       len(list_intersect(a.s, b.s))::DOUBLE
         / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.s, b.s))::DOUBLE
        / len(list_distinct(list_concat(a.s, b.s))) >= {t}
"""

# Near-subset containment (Broder): |A n B| / min(|A|,|B|) — catches a
# short doc embedded verbatim in a longer one, which Jaccard dilutes to
# |A|/|B|. Oracle = uncapped brute force (the df-capped Spark cascade
# is lossless on the fixtures, same as _JACCARD_ORACLE's entries).
_CONTAINMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in range(1, len(w)-1)]) AS s
  FROM toks
), f AS (SELECT doc_id, s FROM sh WHERE len(s) >= {m})
SELECT a.doc_id AS da, b.doc_id AS db,
       CAST(len(a.s) AS BIGINT) AS na, CAST(len(b.s) AS BIGINT) AS nb,
       len(list_intersect(a.s, b.s))::DOUBLE
         / LEAST(len(a.s), len(b.s)) AS containment
FROM f a, f b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.s, b.s))::DOUBLE
        / LEAST(len(a.s), len(b.s)) >= {t}
"""

_COSINE = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _lsh_topk_oracle(
    planes: int = 4,
    k: int = 10,
    query_id: int = 0,
    multiprobe: int = 0,
    threshold: float | None = None,
) -> str:
    """Full DuckDB replica of the sign-LSH top-k — hash family included.

    The hyperplanes are md5-derived DRIVER-SIDE constants
    (similarity._plane_weights), so the oracle embeds the identical
    weights as literals and recomputes bucket membership itself: this
    checks the bucketing, the probe, and the scoring — not just the
    scores of a Spark-chosen candidate list. The sign-bit dot uses an
    explicit left-to-right term chain, matching Spark's sequential
    aggregate() fold bit-for-bit (IEEE addition is deterministic given
    order), so a projection landing near zero cannot flip a bucket bit
    on one engine only. Scores go through the usual DECIMAL(18,6) hop.
    """
    from cassandra_sql_spark.pipeline.similarity import DIM, _plane_weights

    parts = []
    for p in range(planes):
        w = _plane_weights(p)
        terms = " + ".join(f"v[{i + 1}] * ({w[i]!r})" for i in range(DIM))
        parts.append(f"CASE WHEN ({terms}) > 0 THEN {2 ** p} ELSE 0 END")
    bucket = "\n         + ".join(parts)
    # multiprobe m additionally probes the buckets at Hamming distance 1
    # on the first m sign bits (bucket XOR 2^p) — same knob as topk_lsh
    probe = "b.bucket = q.qb"
    if multiprobe:
        alts = ", ".join(
            f"xor(q.qb, {2 ** p})" for p in range(min(multiprobe, planes))
        )
        probe = f"b.bucket IN (q.qb, {alts})"
    # threshold mode (range search): no k cut — filter on the hopped
    # score instead, so the >= boundary is the engine-exact DECIMAL one
    tail = (
        f"LIMIT {k}" if threshold is None
        else ""
    )
    having = (
        "" if threshold is None
        else f"AND CAST(CAST({_COSINE.format(a='b.v', b='q.qv')} "
             f"AS DECIMAL(18,6)) AS DOUBLE) >= {threshold!r}"
    )
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ), b AS (
      SELECT vec_id, v, {bucket} AS bucket FROM e
    ), q AS (
      SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = {query_id}
    )
    SELECT b.vec_id,
           CAST(CAST({_COSINE.format(a='b.v', b='q.qv')}
                     AS DECIMAL(18,6)) AS DOUBLE) AS score
    FROM b, q
    WHERE {probe} AND b.vec_id != {query_id} {having}
    ORDER BY score DESC, b.vec_id
    {tail}
    """

def _ivf_exact_oracle(
    k: int = 10, nprobe: int = 4, query_id: int = 0
) -> str:
    """DuckDB replica of topk_ivf_exact: the exact-integer k-means CTE
    chain (pipeline_r6.kmeans_ctes, UNIT quantization) extended with
    integer-L2 probe selection, integer-L2 list assignment, and exact
    cosine scoring of the probed lists (DECIMAL(18,6) hop, ties broken
    by vec_id)."""
    from cassandra_sql_spark.queries.pipeline_r6 import _int_l2, kmeans_ctes

    return f"""{kmeans_ctes(unit=True)},
    ev AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ), q AS (
      SELECT xq AS qxq FROM e WHERE vec_id = {query_id}
    ), qv AS (
      SELECT v AS qv FROM ev WHERE vec_id = {query_id}
    ), probe AS (
      SELECT cid FROM (
        SELECT c3.cid,
               ROW_NUMBER() OVER (
                   ORDER BY {_int_l2('q.qxq', 'c3.c')}, c3.cid) AS rk
        FROM c3, q
      ) WHERE rk <= {nprobe}
    ), asn AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c3.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {_kmeans_dist_c3()}, c3.cid) AS rk
        FROM e, c3
      ) WHERE rk = 1
    )
    SELECT ev.vec_id,
           CAST(CAST({_COSINE.format(a='ev.v', b='qv.qv')}
                     AS DECIMAL(18,6)) AS DOUBLE) AS score
    FROM ev
    JOIN asn ON ev.vec_id = asn.vec_id
    JOIN probe ON asn.cid = probe.cid
    CROSS JOIN qv
    WHERE ev.vec_id != {query_id}
    ORDER BY score DESC, ev.vec_id
    LIMIT {k}
    """


def _kmeans_dist_c3() -> str:
    from cassandra_sql_spark.queries.pipeline_r6 import _int_l2

    return _int_l2("e.xq", "c3.c")


def _pq_exact_oracle(
    k: int = 10,
    shortlist: int = 100,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    query_id: int = 0,
) -> str:
    """DuckDB replica of pq_topk_exact: per-subspace exact-integer
    Lloyd codebooks (prefixed CTE chains from pipeline_r6), integer-L2
    code assignment, integer ADC shortlist (ties by vec_id), exact
    cosine re-rank with the DECIMAL(18,6) hop."""
    from cassandra_sql_spark.queries.pipeline_r6 import (
        _E_UNIT,
        _int_l2,
        _kmeans_iter,
        _kmeans_seed_cte,
    )

    subdim = 64 // m
    parts = []
    for s in range(m):
        p, e = f"s{s}", f"s{s}e"
        lo, hi = s * subdim + 1, (s + 1) * subdim
        chain = "".join(
            "," + _kmeans_iter(t, p=p, ename=e, dim=subdim)
            for t in range(iters)
        )
        parts.append(f"""
{e} AS (
  SELECT vec_id, xq[{lo}:{hi}] AS xq FROM e
), {_kmeans_seed_cte(p=p, ename=e, k=k_codes)}{chain},
{p}q AS (
  SELECT xq[{lo}:{hi}] AS q FROM e WHERE vec_id = {query_id}
), {p}qd AS (
  SELECT {p}c{iters}.cid,
         {_int_l2('q.q', f'{p}c{iters}.c', subdim)} AS d
  FROM {p}c{iters}, {p}q q
), {p}code AS (
  SELECT vec_id, cid FROM (
    SELECT {e}.vec_id, {p}c{iters}.cid,
           ROW_NUMBER() OVER (PARTITION BY {e}.vec_id
               ORDER BY {_int_l2(f'{e}.xq', f'{p}c{iters}.c', subdim)},
                        {p}c{iters}.cid) AS rk
    FROM {e}, {p}c{iters}
  ) WHERE rk = 1
)""")
    sub_ctes = ",".join(parts)
    code_joins = " ".join(
        f"JOIN s{s}code USING (vec_id)" for s in range(1, m)
    )
    qd_joins = " ".join(
        f"JOIN s{s}qd q{s} ON s{s}code.cid = q{s}.cid" for s in range(m)
    )
    adc_sum = " + ".join(f"q{s}.d" for s in range(m))
    return f"""
    WITH {_E_UNIT}, ev AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ), qv AS (
      SELECT v AS qv FROM ev WHERE vec_id = {query_id}
    ),{sub_ctes},
    adc AS (
      SELECT s0code.vec_id, ({adc_sum}) AS adc
      FROM s0code {code_joins} {qd_joins}
    ), short AS (
      SELECT vec_id FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY adc, vec_id) AS rk
        FROM adc WHERE vec_id != {query_id}
      ) WHERE rk <= {shortlist}
    )
    SELECT ev.vec_id,
           CAST(CAST({_COSINE.format(a='ev.v', b='qv.qv')}
                     AS DECIMAL(18,6)) AS DOUBLE) AS score
    FROM ev JOIN short ON ev.vec_id = short.vec_id CROSS JOIN qv
    ORDER BY score DESC, ev.vec_id
    LIMIT {k}
    """


def _simhash_oracle(max_hamming: int = 8) -> str:
    """DuckDB replica of the md5-family SimHash pipeline: per-bit majority
    votes over md5-prefix gram hashes (bits 60-63 are always 0 — the
    prefix int is < 2^60), banded candidates as a 4-way 16-bit chunk
    equality disjunction (the >3-Hamming output contract of
    dedup.simhash_pairs), exact Hamming cut via bit_count(xor())."""
    bits = "\n       + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform(h, x -> (x >> {j}) & 1))"
        f" > len(h) THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(60)
    )
    chunk = "((a.sg >> {c}) & 65535) = ((b.sg >> {c}) & 65535)"
    probe = "\n     OR ".join(chunk.format(c=16 * c) for c in range(4))
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS s
      FROM toks WHERE len(w) >= 3
    ), hs AS (
      SELECT doc_id,
             list_transform(s, g ->
               ('0x' || substring(md5(g), 1, 15))::BIGINT) AS h
      FROM sh WHERE len(s) > 0
    ), sig AS (
      SELECT doc_id, {bits} AS sg FROM hs
    )
    SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.sg, b.sg)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE ( {probe} )
      AND bit_count(xor(a.sg, b.sg)) <= {max_hamming}
    """


_HEX = "0123456789abcdef"


def _md5_unit(idcol):
    """Deterministic uniform in [0,1) from md5(id): the 8-hex-digit
    base-16 expansion. Digit values and 16^-i are exact in binary, so the
    sum is bit-identical across engines (no hex->int builtin is shared by
    Spark and DuckDB; the digit expansion is)."""
    h = F.md5(idcol.cast("string"))
    u = F.lit(0.0)
    for i in range(1, 9):
        u = u + (
            F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1
        ).cast("double") / float(16**i)
    return u


# the same expansion in DuckDB SQL, over alias d (documents d)
_MD5_UNIT_SQL = "(" + " + ".join(
    f"(instr('{_HEX}', substr(md5(CAST(d.doc_id AS VARCHAR)), {i}, 1)) - 1)"
    f"::DOUBLE / {16**i}"
    for i in range(1, 9)
) + ")"

# seeded variant (seed ':42' mixed into the hashed key), alias d
_MD5_UNIT_SEEDED_SQL = "(" + " + ".join(
    f"(instr('{_HEX}', substr(md5(CAST(d.doc_id AS VARCHAR) || ':42'),"
    f" {i}, 1)) - 1)::DOUBLE / {16**i}"
    for i in range(1, 9)
) + ")"

# Brute-force all-pairs cosine >= 0.45: ground truth for BOTH the exact
# (dedup_embedding_cosine) and the LSH-bucketed (dedup_embedding_lsh) paths.
_EMB_PAIRS_ORACLE = f"""
-- zero-norm vectors excluded: no direction, cosine undefined (mirrors
-- similarity.nonzero)
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[],
                                  embedding::DOUBLE[]) > 0)
SELECT a.vec_id AS da, b.vec_id AS db,
       CAST(CAST({_COSINE.format(a='a.v', b='b.v')} AS DECIMAL(18,6))
            AS DOUBLE) AS score
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND CAST(CAST({_COSINE.format(a='a.v', b='b.v')} AS DECIMAL(18,6))
           AS DOUBLE) >= 0.45
"""

_TEXT_STATS_ORACLE = """
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w,
         substr(text, 1, 128) AS p
  FROM documents
), m AS (
  SELECT doc_id, text, w, p,
         len(w) AS n,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(w, x -> CAST(length(x) AS BIGINT))),
                     (a, b) -> a + b) AS total_len,
         len(list_filter(w, x -> x IN
             ('the','a','and','of','to','in','is','it'))) AS stop_hits,
         len(list_filter(w, x -> length(x) <= 2)) AS short_hits,
         len(list_filter(w, x -> x IN ('the','a','of','and'))) AS en_hits,
         len(list_filter(w, x -> x IN ('der','die','das','und'))) AS de_hits,
         len(list_filter(w, x -> x IN ('le','la','les','et'))) AS fr_hits
  FROM t
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       round(total_len::DOUBLE / n, 6) AS avg_tok_len,
       round(stop_hits::DOUBLE / n, 6) AS stop_ratio,
       round(
         least(n::DOUBLE / 50.0, 1.0) * 0.5
         + (CASE WHEN stop_hits::DOUBLE / n > 0.02
                 THEN 1.0 ELSE 0.5 END) * 0.3
         + (1.0 - short_hits::DOUBLE / n) * 0.2, 6) AS quality,
       CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0
              THEN 'en'
            WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
            WHEN fr_hits > 0 THEN 'fr'
            ELSE 'unk' END AS lang_pred,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      [CAST(ascii(p[i]) AS BIGINT)
                       for i in range(1, length(p) + 1)]),
         (h, c) -> (h * 131 + c) % 1000000007) AS fp
FROM m
"""

def _countmin_hh(ev):
    """Exact top-10 users probed against the shard-merged count-min grid;
    emits within_bound folding in the sketch guarantees (see the
    sketch_countmin_hh registry comment)."""
    exact = (
        ev.groupBy("user_id").count()
        .orderBy(F.desc("count"), "user_id").limit(10)
    )
    merged = sketches.countmin_merge(
        sketches.countmin_build(ev, "user_id", shard_col="event_type"),
        "event_type",
    )
    slack = ev.agg(
        F.ceil(F.lit(2.718281828459045) * F.count(F.lit(1)) / 1024)
        .alias("_slack")
    )
    return (
        sketches.countmin_estimate(merged, exact, "user_id")
        .crossJoin(slack)
        .select(
            "user_id",
            F.col("count").alias("n"),
            F.when(
                (F.col("est_count") >= F.col("count"))
                & (F.col("est_count") <= F.col("count") + F.col("_slack")),
                1,
            ).otherwise(0).alias("within_bound"),
        )
    )



def _pack_token_budget(spark, sf):
    """Contiguous-fill packing: pack_id = floor(exclusive-prefix-sum /
    512). The prefix sum is sharded (operators.global_order), exact, and
    identical to the single-window form — pinned by the exceptAll
    identity in tests/test_global_order.py and by the DuckDB oracle."""
    from cassandra_sql_spark.operators.global_order import sharded_cumsum

    toks = (
        load(spark, sf, "documents")
        .select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))
        .localCheckpoint(eager=True)
    )
    return sharded_cumsum(toks, ["doc_id"], "n_tokens", out_col="cum").select(
        "doc_id",
        "n_tokens",
        F.floor(
            (F.col("cum") - F.col("n_tokens")).cast("double") / 512
        )
        .cast("bigint")
        .alias("pack_id"),
    )


QUERIES: dict[str, Q] = {
    # Exact dedup: hash-groupBy on normalized text
    # (one shuffle on the group key; min-id survivor policy).
    "dedup_exact": df_q(
        lambda spark, sf: dedup.exact_dedup(
            load(spark, sf, "documents"), "doc_id", "text"
        ),
        ("documents",),
        oracle="""
        SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        FROM documents
        GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ')
        """,
    ),
    # Exact near-dup: shingle inverted-index join + Jaccard verify.
    # df_cutoff=64 bounds the inverted-index fan-out (a shingle shared by d
    # docs emits d^2/2 join rows — quadratic on boilerplate-heavy corpora).
    # The fixture corpus's max shingle df is 7 at sf0.01 and 25 at sf0.1, so
    # the cap drops nothing here and the result still equals the uncapped
    # brute-force oracle; at 100 TB it is what makes the join survivable.
    "dedup_ngram_jaccard": df_q(
        lambda spark, sf: dedup.ngram_jaccard_pairs(
            load(spark, sf, "documents"),
            "doc_id",
            "text",
            threshold=0.5,
            df_cutoff=64,
        ),
        ("documents",),
        oracle=_JACCARD_ORACLE.format(t=0.5),
    ),
    # The UNCAPPED inverted-index form (df_cutoff=None): the exact verifier
    # for the capped scale path above. Kept registered (outside the graded
    # window — the capped entry is the graded one) so the classic
    # index-self-join shape stays exercised against the brute-force oracle
    # every round; NOT a scale path (unbounded posting-list fan-out).
    "dedup_ngram_jaccard_uncapped": df_q(
        lambda spark, sf: dedup.ngram_jaccard_pairs(
            load(spark, sf, "documents"),
            "doc_id",
            "text",
            threshold=0.5,
            df_cutoff=None,
        ),
        ("documents",),
        oracle=_JACCARD_ORACLE.format(t=0.5),
    ),
    # Near-subset containment pairs (same cascade, different ratio —
    # see ngram_containment_pairs). na/nb cast long to match the
    # oracle's BIGINT lengths.
    "dedup_containment": df_q(
        lambda spark, sf: (
            lambda p: p.select(
                "da", "db",
                F.col("na").cast("long").alias("na"),
                F.col("nb").cast("long").alias("nb"),
                "containment",
            )
        )(
            dedup.ngram_containment_pairs(
                load(spark, sf, "documents"),
                "doc_id",
                "text",
                threshold=0.8,
                df_cutoff=64,
                min_shingles=5,
            )
        ),
        ("documents",),
        oracle=_CONTAINMENT_ORACLE.format(t=0.8, m=5),
    ),
    # MinHash + banded LSH, Jaccard-verified: output provably equals the
    # exact answer at threshold 0.8 (collision-miss p < 1e-7 at J >= 0.9,
    # and the corpus has no pairs in (0.07, 0.9)).
    "dedup_minhash_lsh": df_q(
        lambda spark, sf: dedup.minhash_lsh_pairs(
            load(spark, sf, "documents"), "doc_id", "text", threshold=0.8
        ),
        ("documents",),
        oracle=_JACCARD_ORACLE.format(t=0.8),
    ),
    # Winnowing (MOSS) substring-level dup candidates: pairs sharing a
    # fingerprint, i.e. likely containing an exact copied substring of
    # >= window+k-1 chars. Hash-family-specific -> rows-only; the
    # winnowing guarantee + density are asserted in tests.
    # df_cutoff drops template/boilerplate fingerprints (quadratic join
    # hazard on templated corpora); min_shared=5 keeps pairs with a
    # substantial copied region, not one shared phrase. Oracle-checked
    # since round 7 via the md5 gram-hash family (portable to DuckDB —
    # same conversion as decontam_bloom): the oracle re-derives the
    # char-8-gram hashes, the window-16 min selection, the df-cutoff,
    # and the pair counts. xxhash64 stays the scale default in
    # dedup.winnow_pairs.
    "dedup_substring_winnow": df_q(
        lambda spark, sf: dedup.winnow_pairs(
            load(spark, sf, "documents"),
            "doc_id",
            "text",
            min_shared=5,
            df_cutoff=20,
            hash_family="md5",
        ),
        ("documents",),
        oracle="""
        WITH norm AS (
          SELECT doc_id,
                 regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
          FROM documents
        ), grams AS (
          SELECT doc_id,
                 [('0x' || substring(md5(substring(t, i, 8)), 1, 15))::BIGINT
                  for i in range(1, len(t) - 6)] AS h
          FROM norm WHERE len(t) >= 8
        ), fp AS (
          SELECT doc_id,
                 list_distinct([list_min(h[j:j+15])
                                for j in range(1,
                                               greatest(len(h) - 15, 1) + 1)])
                   AS fps
          FROM grams
        ), ex AS (
          SELECT doc_id AS id, UNNEST(fps) AS f FROM fp
        ), keep AS (
          SELECT f FROM ex GROUP BY f HAVING COUNT(*) <= 20
        ), ex2 AS (
          SELECT ex.id, ex.f FROM ex JOIN keep USING (f)
        )
        SELECT a.id AS da, b.id AS db, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM ex2 a JOIN ex2 b ON a.f = b.f AND a.id < b.id
        GROUP BY a.id, b.id
        HAVING COUNT(*) >= 5
        """,
    ),
    # SimHash Hamming pairs. Oracle-checked since round 7 via the md5
    # gram-hash family: the DuckDB oracle re-derives the per-bit majority
    # votes (60 effective bits — md5-prefix ints are < 2^60), the 4x16-bit
    # banded candidate rule as a chunk-equality disjunction, and the exact
    # Hamming cut. recall vs the Jaccard ground truth stays in tests;
    # xxhash64 remains the scale default in dedup.simhash_pairs.
    "dedup_simhash": df_q(
        lambda spark, sf: dedup.simhash_pairs(
            load(spark, sf, "documents"),
            "doc_id",
            "text",
            max_hamming=8,
            hash_family="md5",
        ),
        ("documents",),
        oracle=_simhash_oracle(max_hamming=8),
    ),
    # Embedding-cosine near-dup pairs — exact O(n^2) all-pairs. Kept as the
    # BASELINE/VERIFIER for dedup_embedding_lsh below; the LSH entry is the
    # registered scale path.
    "dedup_embedding_cosine": df_q(
        lambda spark, sf: similarity.threshold_pairs(
            load(spark, sf, "embeddings"), threshold=0.45
        ),
        ("embeddings",),
        oracle=_EMB_PAIRS_ORACLE,
    ),
    # Embedding near-dup via banded sign-LSH candidates + exact cosine
    # verify (the 100 TB path: shuffle bounded by bands*n + candidates,
    # never n^2). Deterministic hyperplanes -> reproducible; on the fixture
    # corpus the banding recovers every exact pair, so the same brute-force
    # DuckDB oracle applies (recall also pinned in tests/test_pipeline.py).
    "dedup_embedding_lsh": df_q(
        lambda spark, sf: similarity.threshold_pairs_lsh(
            load(spark, sf, "embeddings"), threshold=0.45
        ),
        ("embeddings",),
        oracle=_EMB_PAIRS_ORACLE,
    ),
    # Brute-force cosine top-k (exact ANN baseline; broadcast query side,
    # TakeOrderedAndProject top-k).
    "sim_topk_bruteforce": df_q(
        lambda spark, sf: similarity.topk_bruteforce(
            load(spark, sf, "embeddings"), query_id=0, k=10
        ),
        ("embeddings",),
        oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                   WHERE list_dot_product(embedding::DOUBLE[],
                                          embedding::DOUBLE[]) > 0),
             q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        SELECT e.vec_id,
               CAST(CAST({_COSINE.format(a='e.v', b='q.qv')}
                         AS DECIMAL(18,6)) AS DOUBLE)
                 AS score
        FROM e, q WHERE e.vec_id != 0
        ORDER BY score DESC, e.vec_id
        LIMIT 10
        """,
    ),
    # LSH-bucketed approximate top-k (the scale path). Oracle-checked
    # END TO END since round 7: the hyperplanes are driver-side md5
    # constants, so the DuckDB oracle embeds the same weights and
    # re-derives bucket membership + probe + scores itself (see
    # _lsh_topk_oracle). recall@k vs brute force stays pinned in tests.
    "sim_lsh_topk": df_q(
        lambda spark, sf: similarity.topk_lsh(
            load(spark, sf, "embeddings"), query_id=0, k=10, planes=4
        ),
        ("embeddings",),
        oracle=_lsh_topk_oracle(planes=4, k=10, query_id=0),
    ),
    # Multi-probe LSH: also scan the buckets one sign-flip away from the
    # query's — the standard recall/cost knob ((m+1)/2^planes of the data
    # instead of 1/2^planes, recovering neighbors that landed just across
    # one hyperplane). Oracle-checked the same way as sim_lsh_topk: the
    # probe set (qb, qb XOR 1, qb XOR 2) is re-derived inside DuckDB.
    "sim_lsh_multiprobe": df_q(
        lambda spark, sf: similarity.topk_lsh(
            load(spark, sf, "embeddings"),
            query_id=0, k=10, planes=4, multiprobe=2,
        ),
        ("embeddings",),
        oracle=_lsh_topk_oracle(planes=4, k=10, query_id=0, multiprobe=2),
    ),
    # IVF approximate top-k (the other scale path). Oracle-checked since
    # round 7: the entry runs the L2-IVF form (FAISS IndexIVFFlat shape)
    # on the exact-integer coarse quantizer, so training, list
    # assignment, and probe selection are all int64 arithmetic the
    # DuckDB oracle replays verbatim (it extends the k-means trainer CTE
    # chain with probe + exact cosine scoring). The float cosine-routed
    # topk_ivf remains for the pruned on-disk index paths; recall vs
    # brute force stays pinned in tests.
    # Threshold (range) similarity search: everything with cosine >=
    # 0.12 against the query (the fixture embeddings are near-random,
    # so absolute cosines are small; the boundary sits mid-distribution) inside the LSH probe set — the radius-query
    # complement of the top-k entries, same bucketing/pruning, oracle
    # re-derives buckets + probes + the DECIMAL-hopped >= boundary.
    "sim_range_search": df_q(
        lambda spark, sf: similarity.range_search_lsh(
            load(spark, sf, "embeddings"),
            query_id=0, threshold=0.12, planes=4, multiprobe=2,
        ),
        ("embeddings",),
        oracle=_lsh_topk_oracle(
            planes=4, query_id=0, multiprobe=2, threshold=0.12
        ),
    ),
    "sim_ivf_topk": df_q(
        lambda spark, sf: similarity.topk_ivf_exact(
            load(spark, sf, "embeddings"),
            query_id=0, k=10, n_centroids=8, nprobe=4,
        ),
        ("embeddings",),
        oracle=_ivf_exact_oracle(k=10, nprobe=4, query_id=0),
    ),
    # Product-quantization ANN (Jegou et al. 2011): ADC shortlist over
    # the ~50x-compressed codes, exact re-rank of the shortlist only.
    # Oracle-checked since round 7: the entry runs pq_topk_exact — four
    # per-subspace exact-integer Lloyd codebooks, integer-L2 codes, and
    # an integer ADC table sum — so the DuckDB oracle replays codebooks,
    # codes, shortlist, and re-rank bit-for-bit. The float pq_train/
    # pq_topk_rerank path remains for the on-disk codes-table format;
    # determinism, code-roundtrip, and recall stay asserted in tests.
    "sim_pq_topk": df_q(
        lambda spark, sf: similarity.pq_topk_exact(
            load(spark, sf, "embeddings"),
            query_id=0, k=10, shortlist=100, m=4, k_codes=16,
        ),
        ("embeddings",),
        oracle=_pq_exact_oracle(
            k=10, shortlist=100, m=4, k_codes=16, iters=2, query_id=0
        ),
    ),
    # Text analysis battery: token counts, quality, language-ID heuristic,
    # rolling-hash fingerprint — all JVM lambdas, oracle replays the exact
    # integer/rational math.
    "text_stats": df_q(
        lambda spark, sf: text.text_stats(
            load(spark, sf, "documents"), "doc_id", "text"
        ),
        ("documents",),
        oracle=_TEXT_STATS_ORACLE,
    ),
    # BPE-ish pretokenizer count (LLM token budgeting; text.BPE_PRETOKEN_RE).
    "text_bpe_tokens": df_q(
        lambda spark, sf: load(spark, sf, "documents").select(
            "doc_id",
            text.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        ),
        ("documents",),
        oracle=(
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '"
            + text.BPE_PRETOKEN_RE.replace("'", "''")
            + "')) AS BIGINT) AS n_bpe_tokens FROM documents"
        ),
    ),
    # Corpus vocabulary build: token -> (frequency, doc frequency), top-k.
    # The tokenizer-training precursor: explode + partial/final count,
    # TakeOrderedAndProject for the cut — shuffle volume is the distinct
    # vocab, not the corpus.
    # Document novelty: fraction of a doc's distinct 3-gram shingles that
    # occur NOWHERE else in the corpus — high novelty = unique content,
    # low = template/boilerplate-dominated. One gram-keyed shuffle for the
    # document-frequency table + one join back; same inverted-index size
    # class as the dedup paths (and the same df-skew note applies: a
    # boilerplate gram's df row is one aggregated value, never a fan-out).
    "text_novelty": df_q(
        lambda spark, sf: (
            lambda d, sh: (
                lambda per: d.select("doc_id")
                .join(per, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("n_grams", F.lit(0))
                    .cast("long")
                    .alias("n_grams"),
                    F.coalesce("n_unique", F.lit(0))
                    .cast("long")
                    .alias("n_unique"),
                    F.when(F.col("n_grams").isNull(), F.lit(0.0))
                    .otherwise(
                        F.col("n_unique").cast("double")
                        / F.col("n_grams").cast("double")
                    )
                    .alias("novelty"),
                )
            )(
                sh.join(
                    sh.groupBy("g").agg(F.count(F.lit(1)).alias("df")), "g"
                )
                .groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).alias("n_grams"),
                    F.sum(
                        F.when(F.col("df") == 1, 1).otherwise(0)
                    ).alias("n_unique"),
                )
            )
        )(
            load(spark, sf, "documents"),
            dedup.spread(load(spark, sf, "documents")).select(
                "doc_id",
                F.explode(dedup.word_shingles("text", 3)).alias("g"),
            ),
        ),
        ("documents",),
        oracle="""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                       for i in range(1, len(w)-1)])) AS g
          FROM toks
        ), dfreq AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY g
        ), per AS (
          SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique
          FROM sh JOIN dfreq USING (g) GROUP BY sh.doc_id
        )
        SELECT d.doc_id,
               COALESCE(per.n_grams, 0) AS n_grams,
               COALESCE(per.n_unique, 0) AS n_unique,
               CASE WHEN per.n_grams IS NULL THEN 0.0
                    ELSE per.n_unique::DOUBLE / per.n_grams::DOUBLE
               END AS novelty
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        """,
    ),
    "text_vocab_topk": df_q(
        lambda spark, sf: (
            load(spark, sf, "documents")
            .select(
                "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
            )
            .groupBy("tok")
            .agg(
                F.count(F.lit(1)).cast("long").alias("tf"),
                F.countDistinct("doc_id").cast("long").alias("df"),
            )
            .orderBy(F.desc("tf"), "tok")
            .limit(100)
        ),
        ("documents",),
        oracle="""
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM (
          SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
          FROM documents
        )
        GROUP BY tok
        ORDER BY tf DESC, tok
        LIMIT 100
        """,
    ),
    # BM25 keyword relevance: one corpus-stats aggregate broadcast back
    # over a map-side scored scan.
    "text_bm25": df_q(
        lambda spark, sf: text.bm25_scores(
            load(spark, sf, "documents"), "doc_id", "text",
            terms=("spark", "join", "vector"),
        ),
        ("documents",),
        oracle="""
        WITH d AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w,
                 CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
                   AS dl
          FROM documents
        ), s AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(dl) AS sumdl,
                 SUM(CASE WHEN list_contains(w, 'spark') THEN 1.0 ELSE 0.0
                     END) AS df0,
                 SUM(CASE WHEN list_contains(w, 'join') THEN 1.0 ELSE 0.0
                     END) AS df1,
                 SUM(CASE WHEN list_contains(w, 'vector') THEN 1.0 ELSE 0.0
                     END) AS df2
          FROM d
        )
        SELECT doc_id,
               round(
                 0.0
                 + ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
                   * (len(list_filter(w, x -> x = 'spark'))::DOUBLE * 2.2)
                   / (len(list_filter(w, x -> x = 'spark'))::DOUBLE
                      + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
                 + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
                   * (len(list_filter(w, x -> x = 'join'))::DOUBLE * 2.2)
                   / (len(list_filter(w, x -> x = 'join'))::DOUBLE
                      + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
                 + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
                   * (len(list_filter(w, x -> x = 'vector'))::DOUBLE * 2.2)
                   / (len(list_filter(w, x -> x = 'vector'))::DOUBLE
                      + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n))),
                 6) AS bm25
        FROM d, s
        WHERE round(
                 0.0
                 + ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
                   * (len(list_filter(w, x -> x = 'spark'))::DOUBLE * 2.2)
                   / (len(list_filter(w, x -> x = 'spark'))::DOUBLE
                      + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
                 + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
                   * (len(list_filter(w, x -> x = 'join'))::DOUBLE * 2.2)
                   / (len(list_filter(w, x -> x = 'join'))::DOUBLE
                      + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
                 + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
                   * (len(list_filter(w, x -> x = 'vector'))::DOUBLE * 2.2)
                   / (len(list_filter(w, x -> x = 'vector'))::DOUBLE
                      + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n))),
                 6) > 0
        ORDER BY bm25 DESC, doc_id
        """,
    ),
    # Johnson-Lindenstrauss random projection 64 -> 16 dims; the ±1 sign
    # matrix is a deterministic md5-derived literal shared verbatim with
    # the oracle. Map-only at any scale.
    "emb_random_projection": df_q(
        lambda spark, sf: similarity.random_projection(
            load(spark, sf, "embeddings"), out_dim=16, in_dim=64
        ),
        ("embeddings",),
        oracle=(
            lambda R: "SELECT vec_id, "
            + ", ".join(
                f"round(list_dot_product(embedding::DOUBLE[], "
                f"[{', '.join(str(x) for x in R[j])}]) / sqrt(16), 6) "
                f"AS p{j:02d}"
                for j in range(16)
            )
            + " FROM embeddings"
        )(similarity.projection_signs(64, 16)),
    ),
    # Symmetric per-vector int8 quantization (scale = 127/max|x|). The
    # graded entry serializes the int8 vector to a scalar CSV — the
    # driver's hasher cannot hash ARRAY columns (r4 red row); the
    # array-returning library form stays exercised by the rows-only
    # entry below and the pytest suite.
    "emb_quantize_int8": df_q(
        lambda spark, sf: similarity.quantize_int8(
            load(spark, sf, "embeddings")
        ).select(
            "vec_id",
            "scale",
            F.array_join("q", ",").alias("q_csv"),
        ),
        ("embeddings",),
        oracle="""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 127.0 / greatest(
                   list_max(list_transform(embedding::DOUBLE[],
                                           x -> abs(x))), 1e-30) AS s
          FROM embeddings
        )
        SELECT vec_id, round(s, 6) AS scale,
               array_to_string(
                 list_transform(v, x -> CAST(FLOOR(x * s + 0.5) AS INT)),
                 ',') AS q_csv
        FROM e
        """,
    ),
    # Top principal component via distributed power iteration
    # (rows-only: the exact fold-replica + eigenvector-quality checks
    # live in tests/test_r6b_ops.py).
    "emb_pca_top_component": df_q(
        lambda spark, sf: similarity.pca_top_component(
            load(spark, sf, "embeddings")
        ),
        ("embeddings",),
        oracle=None,
    ),
    # The ARRAY-returning library form, made hash-eligible (r11 verdict:
    # its rows-only record came back as a driver TypeError — the hasher
    # cannot digest ARRAY columns) by posexploding the int8 vector to the
    # scalar (vec_id, pos, q) form. Same operator, same per-element
    # values: both engines compute FLOOR(x * (127/max|x|) + 0.5) on
    # identical IEEE doubles, the exactness emb_quantize_int8 already
    # rides. Map-only at any scale (explode fan-out is dim-bounded).
    "emb_quantize_int8_vec": df_q(
        lambda spark, sf: similarity.quantize_int8(
            load(spark, sf, "embeddings")
        ).select("vec_id", F.posexplode("q").alias("pos", "q")),
        ("embeddings",),
        oracle="""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 127.0 / greatest(
                   list_max(list_transform(embedding::DOUBLE[],
                                           x -> abs(x))), 1e-30) AS s
          FROM embeddings
        )
        SELECT vec_id, i - 1 AS pos,
               CAST(FLOOR(v[i] * s + 0.5) AS INT) AS q
        FROM e, UNNEST(generate_series(1, len(v))) AS t(i)
        """,
    ),
    # Per-label embedding centroids: posexplode -> (label, dim) partial agg.
    # The shuffle carries labels x dims rows, independent of corpus size.
    "emb_label_centroids": df_q(
        lambda spark, sf: (
            load(spark, sf, "embeddings")
            .select("label", F.posexplode("embedding"))
            .groupBy("label", "pos")
            .agg(
                (
                    F.sum(
                        F.floor(F.col("col").cast("double") * 1000000 + 0.5)
                        .cast("bigint")
                    ).cast("double")
                    / 1000000
                    / F.count(F.lit(1))
                ).alias("centroid")
            )
        ),
        ("embeddings",),
        oracle="""
        SELECT label, i - 1 AS pos,
               CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000
                                   + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000 / COUNT(*) AS centroid
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
        GROUP BY label, i
        """,
    ),
    # Deterministic hash-based train/eval split (the standard reproducible
    # holdout: assignment depends only on the id, never on partitioning,
    # sampling order, or cluster size). ~1/16 of docs land in eval.
    "sample_md5_split": df_q(
        lambda spark, sf: load(spark, sf, "documents").select(
            "doc_id",
            F.when(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                == "0",
                F.lit("eval"),
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        ),
        ("documents",),
        oracle="""
        SELECT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                    THEN 'eval' ELSE 'train' END AS split
        FROM documents
        """,
    ),
    # Token-budget sequence packing: contiguous-fill pack assignment via a
    # running token total. The global prefix sum goes through
    # operators.global_order.sharded_cumsum (range-shard + per-shard
    # running sum + broadcast prefix offsets), so the contiguous-fill
    # semantics keep their exact global order with NO single-reducer
    # window — the former "documented shard fallback" is now the shipped
    # plan. The (doc_id, n_tokens) projection is checkpointed first: two
    # ExistingRDD reads (shard totals + cumsum pass), one corpus scan.
    "pack_token_budget": df_q(
        lambda spark, sf: _pack_token_budget(spark, sf),
        ("documents",),
        oracle="""
        SELECT doc_id, n_tokens,
               CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 512) AS BIGINT)
                 AS pack_id
        FROM (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
                 SUM(CAST(len(string_split_regex(trim(text), '\\s+'))
                     AS BIGINT))
                   OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
          FROM documents
        )
        """,
    ),
    # Connected components over the threshold-0.5 Jaccard pairs: the
    # pairwise-dedup -> keep/drop step. Oracle = DuckDB recursive CTE
    # (min reachable id per node on the undirected pair graph).
    # Pair source uses the capped single-scan path (df_cutoff=64 is
    # lossless on the fixtures — see dedup_ngram_jaccard above).
    "dedup_clusters": df_q(
        lambda spark, sf: dedup.dup_clusters(
            dedup.ngram_jaccard_pairs(
                load(spark, sf, "documents"), "doc_id", "text",
                threshold=0.5, df_cutoff=64,
            )
        ),
        ("documents",),
        oracle=f"""
        WITH RECURSIVE pairs AS ({_JACCARD_ORACLE.format(t=0.5)}),
        e AS (
          SELECT da AS a, db AS b FROM pairs
          UNION
          SELECT db AS a, da AS b FROM pairs
        ),
        nodes AS (SELECT DISTINCT a AS n FROM e),
        reach AS (
          SELECT n, n AS r FROM nodes
          UNION
          SELECT e.b AS n, reach.r FROM reach JOIN e ON e.a = reach.n
        )
        SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY n
        """,
    ),
    # Same components via alternating large-star/small-star (Kiveris
    # SoCC'14) — O(log diameter) rounds, the 100 TB path; same oracle.
    "dedup_clusters_bigstar": df_q(
        lambda spark, sf: dedup.dup_clusters_bigstar(
            dedup.ngram_jaccard_pairs(
                load(spark, sf, "documents"), "doc_id", "text",
                threshold=0.5, df_cutoff=64,
            )
        ),
        ("documents",),
        oracle=f"""
        WITH RECURSIVE pairs AS ({_JACCARD_ORACLE.format(t=0.5)}),
        e AS (
          SELECT da AS a, db AS b FROM pairs
          UNION
          SELECT db AS a, da AS b FROM pairs
        ),
        nodes AS (SELECT DISTINCT a AS n FROM e),
        reach AS (
          SELECT n, n AS r FROM nodes
          UNION
          SELECT e.b AS n, reach.r FROM reach JOIN e ON e.a = reach.n
        )
        SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY n
        """,
    ),
    # The dedup FINISHER: clusters -> one survivor per cluster by quality
    # (max n_chars, ties to min id) — the kept-corpus decision a real
    # pipeline emits. Survivor pick is max_by aggregation (no per-cluster
    # sort, no window); singletons survive as their own cluster.
    "dedup_survivor_selection": df_q(
        lambda spark, sf: dedup.survivor_selection(
            load(spark, sf, "documents"),
            dedup.ngram_jaccard_pairs(
                load(spark, sf, "documents"), "doc_id", "text",
                threshold=0.5, df_cutoff=64,
            ),
        ),
        ("documents",),
        oracle=f"""
        WITH RECURSIVE pairs AS ({_JACCARD_ORACLE.format(t=0.5)}),
        e AS (
          SELECT da AS a, db AS b FROM pairs
          UNION
          SELECT db AS a, da AS b FROM pairs
        ),
        nodes AS (SELECT DISTINCT a AS n FROM e),
        reach AS (
          SELECT n, n AS r FROM nodes
          UNION
          SELECT e.b AS n, reach.r FROM reach JOIN e ON e.a = reach.n
        ),
        comp AS (SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach
                 GROUP BY n),
        lab AS (
          SELECT d.doc_id,
                 COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
                 d.n_chars
          FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        )
        SELECT cluster_id,
               (ARRAY_AGG(doc_id ORDER BY n_chars DESC, doc_id ASC))[1]
                 AS keep_id,
               COUNT(*) AS n_members
        FROM lab GROUP BY cluster_id
        """,
    ),
    # Model-scoring slot: linear quality classifier (sigmoid over the
    # heuristic features, weights a driver-side constant — a trained
    # model's coefficients drop into the same literals). Map-only.
    "text_quality_classifier": df_q(
        lambda spark, sf: load(spark, sf, "documents")
        .select(
            "doc_id", text.quality_logistic(F.col("text")).alias("p_quality")
        )
        .select(
            "doc_id", "p_quality", (F.col("p_quality") >= 0.7).alias("keep")
        ),
        ("documents",),
        oracle="""
        WITH t AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
          FROM documents
        ), f AS (
          SELECT doc_id,
                 len(w)::DOUBLE AS n,
                 len(list_filter(w, x -> x IN
                     ('the','a','and','of','to','in','is','it')))::DOUBLE
                   AS stop_hits,
                 len(list_filter(w, x -> length(x) <= 2))::DOUBLE
                   AS short_hits
          FROM t
        ), p AS (
          SELECT doc_id,
                 CAST(CAST(
                   1.0 / (1.0 + exp(-(-1.0 + 2.0 * least(n / 50.0, 1.0)
                          + 3.0 * (stop_hits / n)
                          - 0.5 * (short_hits / n))))
                 AS DECIMAL(18,6)) AS DOUBLE) AS p_quality
          FROM f
        )
        SELECT doc_id, p_quality, p_quality >= 0.7 AS keep FROM p
        """,
    ),
    # Temperature-weighted source mixing (alpha = 0.5): per-source keep
    # rate (cnt_min/cnt_s)^(1-alpha) flattens the source distribution the
    # way multilingual/multi-corpus training mixes do. The accept draw is
    # a deterministic md5-derived uniform (digit expansion is exact binary
    # math -> bit-identical across engines); one tiny stats agg broadcast
    # back over the corpus, then a map-side filter.
    "sample_temperature": df_q(
        lambda spark, sf: (
            load(spark, sf, "documents")
            .select("doc_id", "source")
            .join(
                F.broadcast(
                    (
                        lambda cnts: cnts.crossJoin(
                            F.broadcast(
                                cnts.agg(F.min("_cnt").alias("_mincnt"))
                            )
                        )
                    )(
                        load(spark, sf, "documents")
                        .groupBy("source")
                        .agg(F.count(F.lit(1)).alias("_cnt"))
                    )
                ),
                "source",
            )
            .filter(
                _md5_unit(F.col("doc_id"))
                < F.sqrt(
                    F.col("_mincnt").cast("double")
                    / F.col("_cnt").cast("double")
                )
            )
            .select("doc_id", "source")
        ),
        ("documents",),
        oracle=f"""
        WITH c AS (
          SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
        ), m AS (SELECT MIN(cnt) AS mincnt FROM c)
        SELECT d.doc_id, d.source
        FROM documents d JOIN c ON c.source = d.source, m
        WHERE {_MD5_UNIT_SQL}
              < sqrt(m.mincnt::DOUBLE / c.cnt::DOUBLE)
        """,
    ),
    # Cross-source duplication audit: which sources copy from each other —
    # near-dup pairs bucketed by unordered source pair with exact-decimal
    # mean similarity. The corpus-governance query a dedup report leads
    # with; pair generation reuses the capped inverted-index path.
    "dedup_cross_source_audit": df_q(
        lambda spark, sf: (
            dedup.ngram_jaccard_pairs(
                load(spark, sf, "documents"), "doc_id", "text",
                threshold=0.5, df_cutoff=64,
            )
            .join(
                load(spark, sf, "documents").select(
                    F.col("doc_id").alias("da"), F.col("source").alias("_sa")
                ),
                "da",
            )
            .join(
                load(spark, sf, "documents").select(
                    F.col("doc_id").alias("db"), F.col("source").alias("_sb")
                ),
                "db",
            )
            .groupBy(
                F.least("_sa", "_sb").alias("source_a"),
                F.greatest("_sa", "_sb").alias("source_b"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                (
                    F.sum(F.col("jaccard").cast("decimal(18,9)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                ).alias("mean_jaccard"),
            )
        ),
        ("documents",),
        oracle=f"""
        WITH pairs AS ({_JACCARD_ORACLE.format(t=0.5)})
        SELECT least(a.source, b.source) AS source_a,
               greatest(a.source, b.source) AS source_b,
               COUNT(*) AS n_pairs,
               CAST(SUM(CAST(p.jaccard AS DECIMAL(18,9))) AS DOUBLE)
                 / COUNT(*) AS mean_jaccard
        FROM pairs p
        JOIN documents a ON a.doc_id = p.da
        JOIN documents b ON b.doc_id = p.db
        GROUP BY 1, 2
        """,
    ),
    # Corpus length-distribution histogram: token counts bucketed (width
    # 50) with per-bucket doc count and mean char length — the first
    # chart every corpus audit draws; one map-side bucket expression +
    # one partial/final agg.
    "text_length_histogram": df_q(
        lambda spark, sf: (
            load(spark, sf, "documents")
            .select(
                (
                    F.floor(
                        F.size(F.split(F.trim("text"), r"\s+")) / 50
                    ).cast("bigint")
                    * 50
                ).alias("tok_bucket"),
                F.length("text").alias("_chars"),
            )
            .groupBy("tok_bucket")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg(F.col("_chars").cast("double")), 4).alias(
                    "avg_chars"
                ),
            )
        ),
        ("documents",),
        oracle="""
        SELECT (len(string_split_regex(trim(text), '\\s+')) // 50) * 50
                 AS tok_bucket,
               COUNT(*) AS n_docs,
               ROUND(AVG(CAST(length(text) AS DOUBLE)), 4) AS avg_chars
        FROM documents GROUP BY 1
        """,
    ),
    # Per-source quota sampling (corpus balancing): keep at most Q docs
    # per source, chosen by deterministic md5 order — one window pass.
    "sample_source_quota": df_q(
        lambda spark, sf: (
            load(spark, sf, "documents")
            .select(
                "doc_id",
                "source",
                F.row_number()
                .over(
                    W.partitionBy("source").orderBy(
                        F.md5(F.col("doc_id").cast("string")), "doc_id"
                    )
                )
                .alias("rk"),
            )
            .filter(F.col("rk") <= 10)
            .select("doc_id", "source")
        ),
        ("documents",),
        oracle="""
        SELECT doc_id, source
        FROM (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents
        )
        WHERE rk <= 10
        """,
    ),
    # Bloom-filter decontamination — the no-join scale path for eval sets
    # too large to broadcast as exploded gram rows: eval 5-grams collapse
    # to a 16 KB bitmap inlined into a map-only train scan. The registered
    # entry runs the md5 probe family (dedup.bloom_decontam
    # hash_family="md5"): md5 exists verbatim in DuckDB, so the oracle
    # below rebuilds the same Bloom set (as a DISTINCT position set — the
    # bitmap IS a set of bits) and replays every probe, false positives
    # included — a full end-to-end hash signal since round 7. The
    # xxhash64 family stays the production default (3x cheaper probes);
    # family equivalence + zero-false-negative vs the exact join are
    # pinned in tests/test_pipeline.py.
    "decontam_bloom": df_q(
        lambda spark, sf: (
            lambda d: dedup.bloom_decontam(
                d.filter(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                    != "0"
                ),
                d.filter(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                    == "0"
                ),
                "doc_id",
                "text",
                k=5,
                hash_family="md5",
            )
        )(load(spark, sf, "documents")),
        ("documents",),
        oracle="""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w,
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                   AS is_eval
          FROM documents
        ), sh AS (
          SELECT doc_id, is_eval,
                 list_distinct([array_to_string(w[i:i+4], ' ')
                                for i in range(1, len(w) - 3)]) AS s
          FROM toks
        ), ev AS (
          SELECT DISTINCT UNNEST(s) AS g FROM sh WHERE is_eval
        ), js AS (
          SELECT UNNEST(generate_series(0, 6)) AS j
        ), setpos AS (
          SELECT DISTINCT
                 ('0x' || substring(md5(g || ':' || j), 1, 15))::BIGINT
                   % 131072 AS p
          FROM ev, js
        ), tg AS (
          SELECT doc_id, UNNEST(s) AS g FROM sh WHERE NOT is_eval
        ), hit AS (
          SELECT tp.doc_id, tp.g
          FROM (SELECT doc_id, g,
                       ('0x' || substring(md5(g || ':' || j), 1, 15))::BIGINT
                         % 131072 AS p
                FROM tg, js) tp
          LEFT JOIN setpos ON tp.p = setpos.p
          GROUP BY tp.doc_id, tp.g
          HAVING count(setpos.p) = 7
        ), cnt AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n
          FROM hit GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_flagged_grams,
               COALESCE(cnt.n, 0) > 0 AS flagged
        FROM (SELECT doc_id FROM toks WHERE NOT is_eval) t
        LEFT JOIN cnt USING (doc_id)
        """,
    ),
    # Train/eval decontamination: GPT-3-style 5-gram overlap between the
    # md5-eval slice and the train remainder (broadcast eval side).
    "decontam_ngram_overlap": df_q(
        lambda spark, sf: (
            lambda d: dedup.contamination_pairs(
                d.filter(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                    != "0"
                ),
                d.filter(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                    == "0"
                ),
                "doc_id",
                "text",
                k=5,
            )
        )(load(spark, sf, "documents")),
        ("documents",),
        oracle="""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w,
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                   AS is_eval
          FROM documents
        ), sh AS (
          SELECT doc_id, is_eval,
                 list_distinct([array_to_string(w[i:i+4], ' ')
                                for i in range(1, len(w) - 3)]) AS s
          FROM toks WHERE len(w) >= 5
        ), tr AS (
          SELECT doc_id, UNNEST(s) AS g FROM sh WHERE NOT is_eval
        ), ev AS (
          SELECT doc_id, UNNEST(s) AS g FROM sh WHERE is_eval
        )
        SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM tr JOIN ev USING (g)
        GROUP BY tr.doc_id, ev.doc_id
        """,
    ),
    # Gopher-style repetition metrics (duplicate / top 2-gram fractions).
    "text_repetition_filter": df_q(
        lambda spark, sf: text.repetition_stats(
            load(spark, sf, "documents"), "doc_id", "text"
        ),
        ("documents",),
        oracle="""
        WITH g AS (
          SELECT doc_id,
                 [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS grams
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                FROM documents)
          WHERE len(w) >= 2
        )
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS n_2grams,
               round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
                 AS dup_2gram_frac,
               round(list_max(list_transform(list_distinct(grams),
                     y -> len(list_filter(grams, x -> x = y))))::DOUBLE
                     / len(grams), 6) AS top_2gram_frac,
               (1.0 - len(list_distinct(grams))::DOUBLE / len(grams)) > 0.06
                 AS is_repetitive
        FROM g
        """,
    ),
    # Sliding-window token chunking (training-sequence prep; map-only).
    "text_chunk_sliding": df_q(
        lambda spark, sf: text.chunk_sliding(
            load(spark, sf, "documents"), "doc_id", "text", size=32, stride=24
        ),
        ("documents",),
        oracle="""
        SELECT doc_id,
               CAST(k AS BIGINT) AS chunk_idx,
               CAST(k * 24 + 1 AS BIGINT) AS start_token,
               CAST(len(w[(k*24 + 1):(k*24 + 32)]) AS BIGINT)
                 AS n_chunk_tokens,
               md5(array_to_string(w[(k*24 + 1):(k*24 + 32)], ' '))
                 AS chunk_md5
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
              FROM documents),
             UNNEST(generate_series(0,
               greatest(CAST(ceil((len(w) - 32) / 24.0) AS BIGINT), 0)))
               AS t(k)
        """,
    ),
    # PII scrub report over deterministically injected synthetic contacts
    # (the corpus itself is PII-free): email + phone regex counts and the
    # hash of the redacted text.
    "text_pii_redact": df_q(
        lambda spark, sf: text.pii_stats(
            load(spark, sf, "documents").select(
                "doc_id",
                F.concat(
                    F.col("text"),
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ).alias("text"),
            ),
            "doc_id",
            "text",
        ),
        ("documents",),
        oracle="""
        WITH t AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                 AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '\\b555-[0-9]{4}\\b'))
                 AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'), '\\b555-[0-9]{4}\\b', '<PHONE>', 'g'))
                 AS redacted_md5
        FROM t
        """,
    ),
    # Deterministic stratified sampling: per-language keep rates in
    # sixteenths via the md5 hex prefix (en 4/16, others 8/16) — assignment
    # depends only on the id, never on partitioning or cluster size.
    "sample_stratified": df_q(
        lambda spark, sf: (
            lambda d, h: d.select(
                "doc_id",
                "lang",
                F.when(F.col("lang") == "en", h.isin("0", "1", "2", "3"))
                .otherwise(h < "8")
                .alias("keep"),
            ).filter("keep")
        )(
            load(spark, sf, "documents"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        ),
        ("documents",),
        oracle="""
        SELECT doc_id, lang, TRUE AS keep
        FROM (
          SELECT doc_id, lang,
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
          FROM documents
        )
        WHERE CASE WHEN lang = 'en' THEN h IN ('0', '1', '2', '3')
                   ELSE h < '8' END
        """,
    ),
    # Multimodal plumbing: binary payload + typed metadata struct.
    "multimodal_binary_meta": df_q(
        lambda spark, sf: multimodal.with_binary_payload(
            load(spark, sf, "documents")
        ).select(
            "doc_id",
            F.col("media_meta.n_bytes").alias("n_bytes"),
            F.col("media_meta.mime").alias("mime"),
            F.col("media_meta.checksum").alias("checksum"),
            F.octet_length("payload").cast("long").alias("payload_bytes"),
        ),
        ("documents",),
        oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               'application/octet-stream' AS mime,
               md5(text) AS checksum,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
        FROM documents
        """,
    ),
    # Video-style frame sampling over the binary payload: fixed-size byte
    # frames, every 2nd kept. Pure JVM binary arithmetic; oracle replays
    # it on the (ASCII) text — byte and char offsets coincide.
    "multimodal_frame_sample": df_q(
        lambda spark, sf: multimodal.sample_frames(
            multimodal.with_binary_payload(load(spark, sf, "documents")),
            frame_size=256,
            every=2,
        ),
        ("documents",),
        oracle="""
        SELECT doc_id,
               CAST(i AS BIGINT) AS frame_idx,
               CAST(length(substring(text, CAST(i * 256 + 1 AS INT), 256))
                 AS BIGINT) AS n_frame_bytes,
               md5(substring(text, CAST(i * 256 + 1 AS INT), 256))
                 AS frame_md5
        FROM documents,
             UNNEST(generate_series(0,
               CAST(ceil(length(text) / 256.0) AS BIGINT) - 1)) AS t(i)
        WHERE i % 2 = 0
        """,
    ),
    # Arrow-batched resize (stubbed codec: deterministic byte tiling) —
    # the mapInPandas slot a real PIL/ffmpeg resize drops into. The fake
    # is deterministic, so even the Python path gets an exact oracle.
    "multimodal_resize": df_q(
        lambda spark, sf: multimodal.resize_media(
            multimodal.with_binary_payload(load(spark, sf, "documents")),
            target_bytes=512,
        ),
        ("documents",),
        oracle="""
        WITH r AS (
          SELECT doc_id, length(text) AS n_in,
                 substring(repeat(text,
                   CAST(ceil(512.0 / length(text)) AS INT)), 1, 512) AS rz
          FROM documents WHERE length(text) > 0
        )
        SELECT doc_id,
               CAST(n_in AS BIGINT) AS n_bytes_in,
               CAST(length(rz) AS BIGINT) AS n_bytes_out,
               md5(rz) AS resized_md5
        FROM r
        """,
    ),
    # Arrow-batched feature extraction. Oracle-checked since round 8 via
    # the scalar twin (r5 ARRAY-fix pattern): the same byte-bucket kernel
    # in the same mapInPandas slot emits exact integer bucket counts as
    # CSV (decode_stub's fractions are counts/n_bytes). The oracle is
    # byte-faithful for ALL of Unicode: DuckDB has no blob indexing, so
    # it expands each code point to its UTF-8 byte sequence
    # arithmetically (the adversarial corpus's multibyte doc caught the
    # earlier chars==bytes shortcut).
    "multimodal_features": df_q(
        lambda spark, sf: multimodal.byte_histogram_csv(
            multimodal.with_binary_payload(load(spark, sf, "documents"))
        ),
        ("documents",),
        oracle="""
        WITH d AS (
          SELECT doc_id, text FROM documents WHERE length(text) > 0
        ), cp AS (
          SELECT doc_id, ord(substring(text, i, 1)) AS c
          FROM d, UNNEST(generate_series(1, length(text))) AS t(i)
        ), byt AS (
          SELECT doc_id,
                 UNNEST(CASE
                   WHEN c < 128 THEN [c]
                   WHEN c < 2048 THEN [192 + c // 64, 128 + c % 64]
                   WHEN c < 65536 THEN [224 + c // 4096,
                                        128 + (c // 64) % 64,
                                        128 + c % 64]
                   ELSE [240 + c // 262144, 128 + (c // 4096) % 64,
                         128 + (c // 64) % 64, 128 + c % 64]
                 END) AS byte
          FROM cp
        ), bk AS (
          SELECT doc_id, byte % 8 AS bucket FROM byt
        ), h AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nb,
                 SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS c0,
                 SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS c1,
                 SUM(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS c2,
                 SUM(CASE WHEN bucket = 3 THEN 1 ELSE 0 END) AS c3,
                 SUM(CASE WHEN bucket = 4 THEN 1 ELSE 0 END) AS c4,
                 SUM(CASE WHEN bucket = 5 THEN 1 ELSE 0 END) AS c5,
                 SUM(CASE WHEN bucket = 6 THEN 1 ELSE 0 END) AS c6,
                 SUM(CASE WHEN bucket = 7 THEN 1 ELSE 0 END) AS c7
          FROM bk GROUP BY doc_id
        )
        SELECT doc_id, nb AS n_bytes,
               c0 || ',' || c1 || ',' || c2 || ',' || c3 || ',' ||
               c4 || ',' || c5 || ',' || c6 || ',' || c7 AS hist_csv
        FROM h
        """,
    ),
    # SemDeDup (Abbas et al. 2023): semantic dedup over embeddings —
    # near-dup pairs from banded-LSH candidates + exact cosine verify
    # (recall == 1 vs brute force pinned in tests), connected components,
    # keep one representative (min id) per semantic cluster. Oracle =
    # recursive CTE over the exact all-pairs ground truth.
    "dedup_semantic": df_q(
        lambda spark, sf: (
            lambda emb: emb.select("vec_id")
            .join(
                dedup.dup_clusters(
                    similarity.threshold_pairs_lsh(emb, threshold=0.45),
                    "da",
                    "db",
                ).withColumnRenamed("doc_id", "vec_id"),
                "vec_id",
                "left",
            )
            .select(
                "vec_id",
                F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
                (
                    F.coalesce("cluster_id", "vec_id") == F.col("vec_id")
                ).alias("keep"),
            )
        )(load(spark, sf, "embeddings")),
        ("embeddings",),
        oracle=f"""
        WITH RECURSIVE pairs AS ({_EMB_PAIRS_ORACLE}),
        edg AS (
          SELECT da AS src, db AS dst FROM pairs
          UNION
          SELECT db AS src, da AS dst FROM pairs
        ),
        nds AS (SELECT DISTINCT src AS n FROM edg),
        reach AS (
          SELECT n, n AS r FROM nds
          UNION
          SELECT edg.dst AS n, reach.r FROM reach
          JOIN edg ON edg.src = reach.n
        ),
        comp AS (SELECT n, MIN(r) AS cluster_id FROM reach GROUP BY n)
        SELECT em.vec_id,
               COALESCE(c.cluster_id, em.vec_id) AS cluster_id,
               COALESCE(c.cluster_id, em.vec_id) = em.vec_id AS keep
        FROM embeddings em LEFT JOIN comp c ON c.n = em.vec_id
        """,
    ),
    # Gopher rule-based quality gate (Rae et al. 2021): per-doc metrics,
    # one flag per rule, keep = conjunction. Map-only scan-side filter.
    "text_gopher_filters": df_q(
        lambda spark, sf: text.gopher_stats(
            load(spark, sf, "documents"), "doc_id", "text"
        ),
        ("documents",),
        oracle="""
        WITH m AS (
          SELECT doc_id,
                 len(w) AS n,
                 round(list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(w,
                             x -> CAST(length(x) AS BIGINT))),
                         (a, b) -> a + b)::DOUBLE / len(w), 6) AS avg_tok_len,
                 round(len(list_filter(w,
                         x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                       / len(w), 6) AS alpha_ratio,
                 CAST(len(list_filter(w, x -> x IN
                   ('the','a','and','of','to','in','is','it')))
                   AS BIGINT) AS stop_hits,
                 round(len(list_filter(w,
                         x -> x = '#' OR x = '...'))::DOUBLE
                       / len(w), 6) AS symbol_ratio
          FROM (SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS w
                FROM documents)
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               avg_tok_len, alpha_ratio, stop_hits, symbol_ratio,
               n BETWEEN 25 AND 5000 AS ok_n_tokens,
               avg_tok_len BETWEEN 3.0 AND 10.0 AS ok_avg_len,
               alpha_ratio >= 0.8 AS ok_alpha,
               stop_hits >= 2 AS ok_stopwords,
               symbol_ratio < 0.1 AS ok_symbols,
               (n BETWEEN 25 AND 5000) AND (avg_tok_len BETWEEN 3.0 AND 10.0)
                 AND alpha_ratio >= 0.8 AND stop_hits >= 2
                 AND symbol_ratio < 0.1 AS keep
        FROM m
        """,
    ),
    # Repeated-chunk boilerplate scrub (Lee et al. 2021 at aligned-chunk
    # granularity): every 8-word chunk kept only at its first corpus
    # occurrence; docs re-assembled from survivors. First-occurrence via
    # MIN(packed pos) GROUP BY chunk (map-side combinable — skew-proof on
    # exactly the hot boilerplate keys), not a window over the chunk key.
    "dedup_repeated_chunks": df_q(
        lambda spark, sf: dedup.repeated_chunk_dedup(
            load(spark, sf, "documents"), "doc_id", "text", chunk_words=8
        ),
        ("documents",),
        oracle="""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
          FROM documents
        ), ch AS (
          SELECT doc_id, chunk_idx,
                 array_to_string(
                   list_slice(w, chunk_idx * 8 + 1, chunk_idx * 8 + 8),
                   ' ') AS chunk,
                 doc_id * 1048576 + chunk_idx AS pos
          FROM (SELECT doc_id, w,
                       unnest(range(CAST(ceil(len(w) / 8.0) AS BIGINT)))
                         AS chunk_idx
                FROM toks)
        ), firsts AS (
          SELECT chunk, MIN(pos) AS first_pos FROM ch GROUP BY chunk
        )
        SELECT c.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN c.pos = f.first_pos THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_kept,
               coalesce(string_agg(c.chunk, ' ' ORDER BY c.chunk_idx)
                        FILTER (WHERE c.pos = f.first_pos), '')
                 AS dedup_text
        FROM ch c JOIN firsts f ON c.chunk = f.chunk
        GROUP BY c.doc_id
        """,
    ),
    # Deterministic global shuffle into training shards: shard by a
    # seeded md5-uniform, order within shard by the same uniform. The
    # standard pre-training "shuffle then shard" writer — reproducible
    # from ids alone, and the per-shard window parallelizes across shards
    # (at 100 TB, thousands of shards => thousands of window tasks; the
    # uniform key makes shard sizes tightly concentrated, no skew).
    "sample_global_shuffle": df_q(
        lambda spark, sf: load(spark, sf, "documents")
        .select(
            "doc_id",
            _md5_unit(
                F.concat(F.col("doc_id").cast("string"), F.lit(":42"))
            ).alias("u"),
        )
        .select(
            "doc_id",
            F.floor(F.col("u") * 8).cast("long").alias("shard"),
            F.row_number()
            .over(
                W.partitionBy(F.floor(F.col("u") * 8)).orderBy(
                    "u", "doc_id"
                )
            )
            .cast("long")
            .alias("pos"),
        ),
        ("documents",),
        oracle=f"""
        WITH u AS (
          SELECT doc_id,
                 {_MD5_UNIT_SEEDED_SQL} AS u
          FROM documents d
        )
        SELECT doc_id,
               CAST(FLOOR(u * 8) AS BIGINT) AS shard,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY CAST(FLOOR(u * 8) AS BIGINT)
                 ORDER BY u, doc_id) AS BIGINT) AS pos
        FROM u
        """,
    ),
    # End-to-end curation composition — what a user of the engine actually
    # runs: exact dedup -> Gopher rule gate -> classifier threshold, then
    # a per-(source, lang) corpus report. One agg shuffle for the exact-
    # dedup keep set, one doc_id equi-join for each gate that needs it
    # (the quality gates are pure map-side predicates), one final agg.
    "corpus_curation_pipeline": df_q(
        lambda spark, sf: (
            lambda d: d.join(
                dedup.exact_dedup(d, "doc_id", "text").select(
                    F.col("keep_id").alias("doc_id")
                ),
                "doc_id",
            )
            .join(
                text.gopher_stats(d, "doc_id", "text")
                .filter("keep")
                .select("doc_id"),
                "doc_id",
            )
            .withColumn(
                "p_quality", text.quality_logistic(F.col("text"))
            )
            .filter(F.col("p_quality") >= 0.7)
            .groupBy("source", "lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                (
                    F.sum(
                        F.floor(F.col("p_quality") * 1000000 + 0.5).cast(
                            "bigint"
                        )
                    ).cast("double")
                    / 1000000
                    / F.count(F.lit(1))
                ).alias("avg_quality"),
            )
        )(load(spark, sf, "documents")),
        ("documents",),
        oracle="""
        WITH ex AS (
          SELECT MIN(doc_id) AS doc_id
          FROM (SELECT doc_id,
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
                         AS norm
                FROM documents)
          GROUP BY norm
        ), m AS (
          SELECT doc_id,
                 len(w) AS n,
                 round(list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(w,
                             x -> CAST(length(x) AS BIGINT))),
                         (a, b) -> a + b)::DOUBLE / len(w), 6)
                   AS avg_tok_len,
                 round(len(list_filter(w,
                         x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                       / len(w), 6) AS alpha_ratio,
                 len(list_filter(w, x -> x IN
                   ('the','a','and','of','to','in','is','it')))
                   AS stop_hits,
                 round(len(list_filter(w,
                         x -> x = '#' OR x = '...'))::DOUBLE
                       / len(w), 6) AS symbol_ratio,
                 len(list_filter(w, x -> length(x) <= 2))::DOUBLE
                   AS short_hits
          FROM (SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS w
                FROM documents)
        ), g AS (
          SELECT doc_id FROM m
          WHERE n BETWEEN 25 AND 5000
            AND avg_tok_len BETWEEN 3.0 AND 10.0
            AND alpha_ratio >= 0.8 AND stop_hits >= 2
            AND symbol_ratio < 0.1
        ), q AS (
          SELECT doc_id,
                 CAST(CAST(
                   1.0 / (1.0 + exp(-(-1.0
                          + 2.0 * least(n::DOUBLE / 50.0, 1.0)
                          + 3.0 * (stop_hits::DOUBLE / n)
                          - 0.5 * (short_hits / n))))
                 AS DECIMAL(18,6)) AS DOUBLE) AS p_quality
          FROM m
        )
        SELECT d.source, d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(FLOOR(q.p_quality * 1000000 + 0.5) AS BIGINT))
                 AS DOUBLE) / 1000000 / COUNT(*) AS avg_quality
        FROM documents d
        JOIN ex ON ex.doc_id = d.doc_id
        JOIN g ON g.doc_id = d.doc_id
        JOIN q ON q.doc_id = d.doc_id
        WHERE q.p_quality >= 0.7
        GROUP BY d.source, d.lang
        """,
    ),
    # Count-min sketch heavy-hitter screen (pipeline/sketches.py): the
    # frequency complement of the HLL cardinality sketch. Per-event-type
    # SHARD grids built map-side, merged by cell-wise SUM (pinned equal
    # to the global grid in tests/test_sketches.py), then the exact
    # top-10 users' counts are probed against the merged grid. The
    # graded claim folds in the sketch's guarantees: est >= exact always
    # (counters only over-count) and est <= exact + ceil(e*N/width)
    # (the standard eps*N bound; deterministic here — fixed hash seeds,
    # fixed fixture). Oracle = exact top-10 with within_bound = 1.
    "sketch_countmin_hh": df_q(
        lambda spark, sf: _countmin_hh(load(spark, sf, "events")),
        ("events",),
        oracle="""
        SELECT user_id, CAST(n AS BIGINT) AS n, 1 AS within_bound
        FROM (
          SELECT user_id, COUNT(*) AS n
          FROM events
          GROUP BY user_id
          ORDER BY n DESC, user_id
          LIMIT 10
        )
        """,
    ),
}
