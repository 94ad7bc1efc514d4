"""Materialize scaled datasets (sf1 ~6M lineitem rows, sf10 ~60M) for
the scale curve, derived from the read-only driver fixtures at sf0.1.

The driver provides sf0.001/0.01/0.1 only; SCALE.md's curve needs
points where the data term clears the ~4s orchestration floor. sfN is
built as 10N key-offset copies of sf0.1 (offset 10,000,000 per copy —
far above every real key) so all FK relationships hold within each
copy and the join/agg cardinality profile scales linearly, exactly
like TPC-H's own scaling rules (region/nation stay fixed).

Text/dedup realism: a verbatim copy would give every document exact
clones — candidate generation then scales quadratically in the copy
count, which is a property of the COPYING, not the corpus. Each copy
i>0 therefore prefixes every WORD with a copy tag ("c<i>"): the
transformation is uniform within a copy, so within-copy near-dup
structure (shingle sets, Jaccard values, cluster sizes) is preserved
EXACTLY, while cross-copy vocabularies are disjoint — zero shared
shingles, zero cross-copy candidates. (A word-order rotation was tried
first and rejected: rotating a sequence breaks only the ~2k shingles
at the cut points, so long documents stayed >0.8 Jaccard across
copies. Building sf10 from sf1 was also rejected: re-tagging sf1's
copy 0 with 'c2' would collide with sf1's own 'c2' vocabulary and
fabricate cross-copy near-dups — every scale builds straight from
sf0.1 with globally distinct tags.) n_chars is recomputed from the
tagged text. Deterministic.

Usage: python scripts/make_sf1.py [out_dir] [copies]
       (defaults .scale/sf1, 10 copies; sf10 = 100 copies)
Output: parquet per table, same schemas as the driver fixtures.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000  # per-copy key offset; > any sf0.1 key (max 149,999)

# per-table: columns to offset by copy_index * OFF
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]  # TPC-H scaling keeps these constant


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1",
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = f"(SELECT range AS i FROM range({copies})) r"

    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        proj = ", ".join(
            f"t.{c} + r.i * {OFF} AS {c}" if c in keys else f"t.{c}"
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {proj} FROM '{SRC}/{t}.parquet' t CROSS JOIN "
            f"{rng}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    # documents: offset doc_id AND tag every word with the copy index
    # (copy 0 is verbatim sf0.1).
    # '_' delimiter makes tags prefix-free for any copy count: without it
    # 'c1' || '0word' == 'c10' || 'word', so at >=10 copies a corpus token
    # '0'+w alongside w could fabricate cross-copy shingle collisions.
    tagged = (
        "array_to_string(list_transform(string_split(t.text, ' '), "
        "w -> 'c' || r.i || '_' || w), ' ')"
    )
    con.sql(
        f"""
        COPY (
          SELECT t.doc_id + r.i * {OFF} AS doc_id,
                 CASE WHEN r.i = 0 THEN t.text ELSE {tagged} END AS text,
                 t.lang, t.source,
                 CASE WHEN r.i = 0 THEN t.n_chars
                      ELSE len({tagged})::BIGINT END AS n_chars
          FROM '{SRC}/documents.parquet' t CROSS JOIN {rng}
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )

    for t in list(KEYED) + FIXED + ["documents"]:
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
