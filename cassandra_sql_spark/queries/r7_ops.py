"""Round-7 operator entries.

- expr_interval_arith: end-to-end arithmetic on STORED DayTimeIntervalType
  columns (timestamp difference -> interval column -> compare / ts +- it /
  reduce), pinning the typed-interval semantics introduced when INTERVAL
  columns moved off strings (the reference stores intervals as ISO strings
  and cannot compute with them, kv/TableMetadata.java:348-349).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import Q, df_q, sql_q

QUERIES: dict[str, Q] = {
    # Typed-interval arithmetic on a STORED interval column: ts - LAG(ts)
    # materializes a DayTimeIntervalType column, then the query compares
    # it against an INTERVAL literal, adds/subtracts it back onto
    # timestamps, and reduces it per group. Boundary stays scalar:
    # Spark CAST(interval AS BIGINT) yields whole seconds, matching
    # DuckDB FLOOR(epoch(gap)) (gaps are non-negative by the LAG order,
    # so truncation == floor).
    "expr_interval_arith": sql_q(
        """
        WITH g AS (
          SELECT user_id, event_id, ts,
                 ts - LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS gap
          FROM events WHERE ts IS NOT NULL
        )
        SELECT user_id,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(COUNT_IF(gap > INTERVAL 1 HOUR) AS BIGINT)
                 AS n_long_gaps,
               CAST(SUM(CAST(gap AS BIGINT)) AS BIGINT) AS total_gap_s,
               CAST(MAX(ts + gap) AS TIMESTAMP) AS latest_due,
               CAST(MIN(ts - gap) AS TIMESTAMP) AS earliest_back
        FROM g
        GROUP BY user_id
        ORDER BY user_id
        LIMIT 200
        """,
        ("events",),
        oracle="""
        WITH g AS (
          SELECT user_id, event_id, ts,
                 ts - LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS gap
          FROM events WHERE ts IS NOT NULL
        )
        SELECT user_id,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(COUNT(*) FILTER (gap > INTERVAL 1 HOUR) AS BIGINT)
                 AS n_long_gaps,
               CAST(SUM(CAST(FLOOR(epoch(gap)) AS BIGINT)) AS BIGINT)
                 AS total_gap_s,
               MAX(ts + gap) AS latest_due,
               MIN(ts - gap) AS earliest_back
        FROM g
        GROUP BY user_id
        ORDER BY user_id
        LIMIT 200
        """,
    ),
    # REAL multimodal codec behind the REAL-CODEC.md seam: deterministic
    # 8x8 BMP fixtures (pixel values closed-form in doc_id, encoded with
    # the real bottom-up/BGR/padded writer) are decoded by the real
    # parser and box-resized to 4x4 inside mapInPandas; the output is a
    # position-weighted per-channel sum over the resized blocks. The
    # oracle recomputes the same statistic symbolically from doc_id — a
    # decoder that skips the bottom-up flip, the BGR swap, or the row
    # stride reads different pixels and hash-mismatches. All arithmetic
    # is quarter-integer, float64-exact on both engines.
    "multimodal_decode_real": df_q(
        lambda spark, sf: multimodal.decode_resize_bmp(
            multimodal.synth_bmp_payload(
                load(spark, sf, "documents")
                .select("doc_id")
                .filter(F.col("doc_id") < 200),
                side=8,
            ),
            out_side=4,
        ),
        ("documents",),
        oracle="""
        WITH d AS (
          SELECT doc_id FROM documents WHERE doc_id < 200
        ), b AS (
          SELECT UNNEST(generate_series(0, 15)) AS blk
        ), c AS (
          SELECT UNNEST(generate_series(0, 3)) AS cell
        ), px AS (
          SELECT doc_id, blk,
                 ((blk // 4) * 2 + cell // 2) * 8
                   + ((blk % 4) * 2 + cell % 2) AS i
          FROM d, b, c
        ), m AS (
          SELECT doc_id, blk,
                 CAST(SUM((doc_id * 31 + i) % 256) AS DOUBLE) / 4 AS mr,
                 CAST(SUM((doc_id * 17 + 2 * i) % 251) AS DOUBLE) / 4 AS mg,
                 CAST(SUM((doc_id * 7 + 3 * i) % 253) AS DOUBLE) / 4 AS mb
          FROM px GROUP BY doc_id, blk
        )
        SELECT doc_id,
               CAST(8 AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               CAST(246 AS BIGINT) AS n_bytes,
               SUM(mr * (blk + 1)) AS wsum_r,
               SUM(mg * (blk + 1)) AS wsum_g,
               SUM(mb * (blk + 1)) AS wsum_b
        FROM m GROUP BY doc_id
        """,
    ),
}
