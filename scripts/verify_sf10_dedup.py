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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    spark = get_spark("verify-sf10-dedup")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    n_fail = 0
    for name, t in ENTRIES.items():
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        rel = con.sql(_BASE.format(off=OFF, copies=COPIES, t=t))
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
    print(f"\n{len(ENTRIES) - n_fail} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
