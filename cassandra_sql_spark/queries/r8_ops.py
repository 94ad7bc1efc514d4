"""Round-8 operator entries.

- audio_decode_real: REAL codec #2 behind the REAL-CODEC.md seam — the
  round-7 BMP recipe transplanted to RIFF/WAVE PCM16 audio (r7 verdict
  task #3). The reference has no media handling at all (its closest
  analog is opaque BLOB storage, kv/TableMetadata.java); this is part of
  the north-star training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import Q, df_q

# The oracle replays the WHOLE pipeline symbolically from the fixture's
# closed form: samples s_i = ((id*37 + i*13) % 4001) - 2000, n and the
# sample rate varying by id, JUNK chunk (20 bytes) on odd ids. The Spark
# side must genuinely chunk-walk the RIFF bytes and read the fmt header
# — an offset-44 shortcut or an echoed sample rate diverges on half the
# fixtures. RMS radicands are exact int64 sums, so SQRT is correctly
# rounded and identical on both engines.
_AUDIO_ORACLE = """
WITH d AS (
  SELECT doc_id,
         64 + (doc_id % 3) * 32 AS n,
         8000 + (doc_id % 2) * 3050 AS sr
  FROM documents WHERE doc_id < 200
), s AS (
  SELECT doc_id, n, sr, UNNEST(generate_series(0, n - 1)) AS i
  FROM d
), v AS (
  SELECT doc_id, n, sr, i,
         ((doc_id * 37 + i * 13) % 4001) - 2000 AS x,
         (i * 4) // n AS q
  FROM s
), l AS (
  SELECT doc_id, n, sr, x, q,
         LAG(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
  FROM v
), a AS (
  SELECT doc_id, MAX(n) AS n, MAX(sr) AS sr,
         MAX(ABS(x)) AS peak,
         COUNT(*) FILTER (px IS NOT NULL AND x * px < 0) AS zc,
         SUM(CASE WHEN q = 0 THEN x * x ELSE 0 END) AS ss1,
         SUM(CASE WHEN q = 1 THEN x * x ELSE 0 END) AS ss2,
         SUM(CASE WHEN q = 2 THEN x * x ELSE 0 END) AS ss3,
         SUM(CASE WHEN q = 3 THEN x * x ELSE 0 END) AS ss4
  FROM l GROUP BY doc_id
)
SELECT doc_id,
       CAST(sr AS BIGINT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(44 + 2 * n + 20 * (doc_id % 2) AS BIGINT) AS n_bytes,
       CAST(peak AS BIGINT) AS peak_abs,
       CAST(zc AS BIGINT) AS zero_crossings,
       SQRT(CAST(ss1 AS DOUBLE) / (n // 4)) AS rms_q1,
       SQRT(CAST(ss2 AS DOUBLE) / (n // 4)) AS rms_q2,
       SQRT(CAST(ss3 AS DOUBLE) / (n // 4)) AS rms_q3,
       SQRT(CAST(ss4 AS DOUBLE) / (n // 4)) AS rms_q4
FROM a
"""

QUERIES: dict[str, Q] = {
    "audio_decode_real": df_q(
        lambda spark, sf: multimodal.audio_features_wav(
            multimodal.synth_wav_payload(
                load(spark, sf, "documents")
                .select("doc_id")
                .filter(F.col("doc_id") < 200)
            )
        ),
        ("documents",),
        oracle=_AUDIO_ORACLE,
    ),
}
