"""Round-9 operator entries.

- png_decode_real: REAL codec #3 behind the REAL-CODEC.md seam — the
  BMP/WAV recipe's third modality (r8 verdict task #5), feasible without
  image libraries because stdlib zlib covers DEFLATE. The reference has
  no media handling (opaque BLOB storage, kv/TableMetadata.java); this
  is the north-star training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import df_q

QUERIES = {
    # REAL PNG codec behind the REAL-CODEC.md seam: deterministic 8x8
    # RGB fixtures (pixels closed-form in doc_id, DIFFERENT formula
    # family from the BMP fixtures) are encoded with the real png_encode
    # — per-row filter type (id+y)%5 cycles ALL FIVE PNG filters, IDAT
    # split in two on odd ids, ancillary tEXt on ids%3==0 — then decoded
    # by the real chunk-walking/CRC-checking/defiltering png_decode and
    # box-resized to 4x4 inside mapInPandas. The oracle recomputes the
    # position-weighted channel sums symbolically from doc_id and the
    # chunk count from the fixture's chunk-layout rule: a decoder that
    # botches any filter predictor, skips the CRC walk, or reads only the
    # first IDAT reconstructs different pixels (or dies) and mismatches.
    # Quarter-integer arithmetic, float64-exact on both engines.
    "png_decode_real": df_q(
        lambda spark, sf: multimodal.decode_resize_png(
            multimodal.synth_png_payload(
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
                 CAST(SUM((doc_id * 13 + 5 * i) % 256) AS DOUBLE) / 4 AS mr,
                 CAST(SUM((doc_id * 29 + 3 * i) % 254) AS DOUBLE) / 4 AS mg,
                 CAST(SUM((doc_id * 11 + 7 * i) % 249) AS DOUBLE) / 4 AS mb
          FROM px GROUP BY doc_id, blk
        )
        SELECT doc_id,
               CAST(8 AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               CAST(3 + doc_id % 2
                    + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_chunks,
               SUM(mr * (blk + 1)) AS wsum_r,
               SUM(mg * (blk + 1)) AS wsum_g,
               SUM(mb * (blk + 1)) AS wsum_b
        FROM m GROUP BY doc_id
        """,
    ),
}
