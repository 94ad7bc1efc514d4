"""Round-10 operator entries.

REAL codec #6 behind the multimodal seam: baseline 4:2:0 COLOR JPEG
(pipeline/multimodal.py) — the grayscale Huffman/DCT kernel extended
with the scaled-integer JFIF color transform, 2x2 chroma subsampling,
and interleaved-MCU entropy coding with per-component DC predictors.
The reference has no codecs at all (it is a row-interpreter OLTP
engine, sql/SelectExecutor.java); this is north-star training-data
surface. Fixtures are flat 16x16 MCUs with the green channel snapped
onto the exact-reconstruction grid (argmin-k search, documented in
synth_jpeg_color_payload), so the DuckDB oracle recomputes the decoded
colors from doc_id through the ENTIRE integer arithmetic chain —
forward transform, DC quantization, dequant+reconstruction, inverse
transform — never echoing constants. Channel swaps, predictor-chain
losses, upsampling-order bugs, and luma-only decoding all mismatch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import df_q

_JPEG_COLOR_ORACLE = """
WITH d AS (
  SELECT doc_id FROM documents WHERE doc_id < 200
), m AS (
  SELECT UNNEST(generate_series(0, 1)) AS mi
), n AS (
  SELECT UNNEST(generate_series(0, 1)) AS mj
), kk AS (
  SELECT UNNEST(generate_series(0, 16)) AS k
), cand AS (
  SELECT doc_id, mi, mj, k,
         (doc_id * 13 + mi * 7 + mj * 3) % 256 AS r,
         (doc_id * 17 + mi * 5 + mj * 11) % 230 + k AS g,
         (doc_id * 29 + mi * 3 + mj * 13) % 256 AS b
  FROM d, m, n, kk
), ycc AS (
  -- scaled-integer forward transform (>> 8 == FLOOR(x/256)), clipped
  SELECT doc_id, mi, mj, k,
         LEAST(255, GREATEST(0, CAST(FLOOR(
           (77 * r + 150 * g + 29 * b + 128) / 256.0) AS BIGINT))) AS y,
         LEAST(255, GREATEST(0, CAST(FLOOR(
           (-43 * r - 85 * g + 128 * b + 128) / 256.0) AS BIGINT)
           + 128)) AS cb,
         LEAST(255, GREATEST(0, CAST(FLOOR(
           (128 * r - 107 * g - 21 * b + 128) / 256.0) AS BIGINT)
           + 128)) AS cr
  FROM cand
), dcs AS (
  -- quantized DCs of a flat block: coef = 8*(v-128); luma q 16,
  -- chroma q 17 (Annex-K [0][0] entries)
  SELECT *,
         CAST(FLOOR((y - 128) / 2.0 + 0.5) AS BIGINT) AS dcy,
         CAST(FLOOR(8 * (cb - 128) / 17.0 + 0.5) AS BIGINT) AS dcb,
         CAST(FLOOR(8 * (cr - 128) / 17.0 + 0.5) AS BIGINT) AS dcr
  FROM ycc
), valid AS (
  -- the fixture's argmin-k grid snap: even luma (exact /16 quant),
  -- no chroma DC on the mod-8 reconstruction tie
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY doc_id, mi, mj ORDER BY k)
           AS rk
  FROM dcs
  WHERE y % 2 = 0
    AND ((dcb % 8) + 8) % 8 <> 4
    AND ((dcr % 8) + 8) % 8 <> 4
), px AS (
  -- dequant + IDCT of a DC-only block: flat value q*dc/8 + 128
  SELECT doc_id, mi, mj,
         LEAST(255, GREATEST(0, 2 * dcy + 128)) AS yr,
         LEAST(255, GREATEST(0, CAST(FLOOR(
           17 * dcb / 8.0 + 128.5) AS BIGINT))) AS cbr,
         LEAST(255, GREATEST(0, CAST(FLOOR(
           17 * dcr / 8.0 + 128.5) AS BIGINT))) AS crr
  FROM valid WHERE rk = 1
), rgbout AS (
  -- scaled-integer inverse transform, clipped
  SELECT doc_id, mi, mj,
         LEAST(255, GREATEST(0, yr + CAST(FLOOR(
           (359 * (crr - 128) + 128) / 256.0) AS BIGINT))) AS ro,
         LEAST(255, GREATEST(0, yr - CAST(FLOOR(
           (88 * (cbr - 128) + 183 * (crr - 128) + 128) / 256.0)
           AS BIGINT))) AS go,
         LEAST(255, GREATEST(0, yr + CAST(FLOOR(
           (454 * (cbr - 128) + 128) / 256.0) AS BIGINT))) AS bo
  FROM px
)
SELECT doc_id,
       CAST(32 AS BIGINT) AS width,
       CAST(32 AS BIGINT) AS height,
       CAST(4 AS BIGINT) AS n_mcus,
       SUM(CAST(ro AS DOUBLE) * (mi * 2 + mj + 1)) AS wsum_r,
       SUM(CAST(go AS DOUBLE) * (mi * 2 + mj + 1)) AS wsum_g,
       SUM(CAST(bo AS DOUBLE) * (mi * 2 + mj + 1)) AS wsum_b
FROM rgbout GROUP BY doc_id
"""

QUERIES = {
    "jpeg_color_decode_real": df_q(
        lambda spark, sf: multimodal.decode_features_jpeg_color(
            multimodal.synth_jpeg_color_payload(
                load(spark, sf, "documents")
                .select("doc_id")
                .filter(F.col("doc_id") < 200),
                mcus=2,
            )
        ),
        ("documents",),
        oracle=_JPEG_COLOR_ORACLE,
    ),
}
