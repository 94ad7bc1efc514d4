"""sf10 scale-correctness for the dedup pair entries via a
copy-expansion oracle.

The brute-force all-pairs DuckDB oracle (`_JACCARD_ORACLE`) is O(n²)
list intersections — feasible at sf0.1 (5,000 docs, ~16 min) and
structurally impossible at sf10 (500,000 docs → 10,000× the pairs).
But sf10's CONSTRUCTION makes an exact oracle cheap:

1. sf10 = 100 key-offset copies of sf0.1's corpus (offset 10,000,000),
   where copy i > 0 prefixes every word with the tag ``c<i>_``
   (scripts/make_sf1.py).
2. The per-copy word map w -> 'c<i>_' + w is INJECTIVE, so the induced
   trigram-shingle map is injective too: every within-copy shingle-set
   size, intersection, and union — hence every Jaccard value — equals
   copy 0's exactly.
3. Tags are prefix-free ('c' || i || '_'), so distinct copies share NO
   tokens and therefore no shingles: cross-copy pairs have Jaccard 0
   and can never reach any threshold.

Therefore the exact sf10 answer is copy 0's brute-force answer repeated
100 times with both ids offset by i * 10,000,000 — which this script
computes in DuckDB (brute force over the doc_id < 10,000,000 slice,
cross-joined with the copy range) and compares against the Spark
entry run on the FULL sf10 corpus, using the driver-faithful strict
compare. The Spark side gets no shortcut: it shingles all 500k docs,
builds the full index, and generates candidates corpus-wide.

Usage: python scripts/verify_sf10_dedup.py [sf10_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from cassandra_sql_spark.queries import REGISTRY  # noqa: E402
from cassandra_sql_spark.session import get_spark  # noqa: E402
from cassandra_sql_spark.testing import compare  # noqa: E402

OFF = 10_000_000
COPIES = 100

_BASE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE doc_id < {off}
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in range(1, len(w)-1)]) AS s
  FROM toks
), base AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         len(list_intersect(a.s, b.s))::DOUBLE
           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.s, b.s))::DOUBLE
          / len(list_distinct(list_concat(a.s, b.s))) >= {t}
)
SELECT base.da + i * {off} AS da,
       base.db + i * {off} AS db,
       jaccard
FROM base, (SELECT range AS i FROM range({copies}))
"""

ENTRIES = {
    "dedup_ngram_jaccard": 0.5,
    "dedup_minhash_lsh": 0.8,
}

# Round-10 extension: the same copy-expansion argument covers the other
# two corpus-pair/sentence entries whose direct DuckDB oracles are
# infeasible at 500k docs. Containment: the injective per-copy word map
# preserves every shingle-set size and intersection, so within-copy
# (da, db, na, nb, containment) rows equal copy 0's, and prefix-free
# tags give cross-copy pairs zero shared shingles (containment 0 < any
# threshold). Sentence dedup: the word map is injective on whole
# sentences, so within-copy duplicate-sentence counts equal copy 0's,
# and a tagged sentence never equals a sentence from any other copy —
# per-doc (n_sents, n_dup_sents, dup_ratio) rows are copy 0's with the
# id offset.
_CONTAIN_BASE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE doc_id < {off}
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in range(1, len(w)-1)]) AS s
  FROM toks
), f AS (SELECT doc_id, s FROM sh WHERE len(s) >= {m}),
base AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(len(a.s) AS BIGINT) AS na, CAST(len(b.s) AS BIGINT) AS nb,
         len(list_intersect(a.s, b.s))::DOUBLE
           / LEAST(len(a.s), len(b.s)) AS containment
  FROM f a, f b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.s, b.s))::DOUBLE
          / LEAST(len(a.s), len(b.s)) >= {t}
)
SELECT base.da + i * {off} AS da, base.db + i * {off} AS db,
       na, nb, containment
FROM base, (SELECT range AS i FROM range({copies}))
"""

_SENT_BASE = """
WITH s AS (
  SELECT doc_id, trim(sv) AS sent FROM (
    SELECT doc_id, UNNEST(string_split(text, '.')) AS sv
    FROM documents WHERE doc_id < {off}
  ) t
),
f AS (SELECT doc_id, sent FROM s WHERE sent <> ''),
c AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY sent) AS cnt FROM f
),
base AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_sents,
         CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_sents,
         CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS dup_ratio
  FROM c GROUP BY doc_id
)
SELECT base.doc_id + i * {off} AS doc_id, n_sents, n_dup_sents,
       dup_ratio
FROM base, (SELECT range AS i FROM range({copies}))
"""

EXPANSION_ENTRIES = {
    "dedup_containment": _CONTAIN_BASE.format(
        off=OFF, copies=COPIES, t=0.8, m=5
    ),
    "text_sentence_dedup": _SENT_BASE.format(off=OFF, copies=COPIES),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    spark = get_spark("verify-sf10-dedup")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    n_fail = 0
    jobs = [
        (name, _BASE.format(off=OFF, copies=COPIES, t=t))
        for name, t in ENTRIES.items()
    ] + list(EXPANSION_ENTRIES.items())
    only = set(sys.argv[2:])
    unknown = only - {name for name, _ in jobs}
    if unknown:
        print(f"ERROR: filter names match no job: {sorted(unknown)}")
        return 2
    n_run = 0
    for name, oracle_sql in jobs:
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        rel = con.sql(oracle_sql)
        ocols = list(rel.columns)
        orows = rel.fetchall()
        problems = compare(rows, cols, orows, ocols, strict=True)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(
                f"PASS {name}: {len(rows)} rows "
                f"[spark {t_spark:.1f}s, total {time.time()-t0:.1f}s]"
            )
    print(f"\n{n_run - n_fail} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
