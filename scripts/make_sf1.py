"""Materialize an sf1-scale dataset (~6M lineitem rows) for the scale
curve, derived from the read-only driver fixtures at sf0.1.

The driver provides sf0.001/0.01/0.1 only; SCALE.md's curve needs a
point where the data term clears the ~4s orchestration floor. sf1 is
built as TEN key-offset copies of sf0.1 (offset 10,000,000 per copy —
far above every real key) so all FK relationships hold within each
copy and the join/agg cardinality profile scales linearly, exactly
like TPC-H's own scaling rules (region/nation stay fixed).

Text/dedup realism: a verbatim 10x copy would give every document nine
exact clones — candidate generation then scales quadratically in the
copy count, which is a property of the COPYING, not the corpus. Each
copy i>0 therefore prefixes every WORD with a copy tag ("c<i>"): the
transformation is uniform within a copy, so within-copy near-dup
structure (shingle sets, Jaccard values, cluster sizes) is preserved
EXACTLY, while cross-copy vocabularies are disjoint — zero shared
shingles, zero cross-copy candidates. (A word-order rotation was tried
first and rejected: rotating a sequence breaks only the ~2k shingles
at the cut points, so long documents stayed >0.8 Jaccard across
copies.) n_chars is recomputed from the tagged text. Deterministic.

Usage: python scripts/make_sf1.py [out_dir]   (default .scale/sf1)
Output: parquet per table, same schemas as the driver fixtures.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
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
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

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
        selects = []
        for i in range(COPIES):
            proj = ", ".join(
                f"{c} + {i * OFF} AS {c}" if c in keys else c for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        con.sql(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    # documents: offset doc_id AND tag every word with the copy index
    # (copy 0 is verbatim sf0.1).
    selects = []
    for i in range(COPIES):
        if i == 0:
            selects.append(f"SELECT * FROM '{SRC}/documents.parquet'")
            continue
        selects.append(
            f"""
            SELECT doc_id + {i * OFF} AS doc_id,
                   array_to_string(
                     list_transform(string_split(text, ' '),
                                    w -> 'c{i}' || w), ' ') AS text,
                   lang, source,
                   len(array_to_string(
                     list_transform(string_split(text, ' '),
                                    w -> 'c{i}' || w), ' '))::BIGINT
                     AS n_chars
            FROM '{SRC}/documents.parquet'
            """
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(selects)}) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )

    for t in list(KEYED) + FIXED + ["documents"]:
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
