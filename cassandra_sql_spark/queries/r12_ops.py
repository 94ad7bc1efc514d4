"""Round-12 additions: restart-interval JPEG decode (REAL codec #9) and
the IVF+PQ composed ANN path.

Reference scope note: the reference engine has no media or vector
tooling at all (SURVEY §2 scope — its closest surface is BLOB storage,
storage/RowCodec.java); these are north-star extensions for the
LLM-data-pipeline workload, same determinism discipline as the r9-r11
entries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import Q, df_q

QUERIES: dict[str, Q] = {}


# -- REAL codec #9: DRI/RSTm restart intervals --------------------------------
# Fixtures: flat even 8x8 blocks (exact reconstruction) on a 3x3 block
# grid; EVEN ids baseline DRI=2 (4 markers), ODD ids progressive DRI=3
# (2 markers x 6 scans = 12). The oracle replays the decoded weighted
# block-mean sum closed-form from doc_id — identical to the
# jpeg_decode_real argument — plus the marker-count arithmetic. The DC
# predictor reset at each RSTm is what the weighted sum pins: a decoder
# that realigns but keeps its predictor reconstructs wrong levels for
# every post-marker block.
_JPEG_RESTART_ORACLE = """
WITH d AS (
  SELECT doc_id FROM documents WHERE doc_id < 200
), b AS (
  SELECT UNNEST(generate_series(0, 2)) AS by
), c AS (
  SELECT UNNEST(generate_series(0, 2)) AS bx
), blk AS (
  SELECT doc_id, by, bx,
         2 * ((doc_id * 7 + by * 3 + bx * 5) % 100) + 40 AS v
  FROM d, b, c
)
SELECT doc_id,
       CAST(24 AS BIGINT) AS width,
       CAST(24 AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 12 END AS BIGINT)
         AS n_restarts,
       SUM(CAST(v AS DOUBLE) * (by * 3 + bx + 1)) AS wsum_gray
FROM blk GROUP BY doc_id
"""

QUERIES["jpeg_restart_interval_decode_real"] = df_q(
    lambda spark, sf: multimodal.decode_features_jpeg_restart(
        multimodal.synth_jpeg_restart_payload(
            load(spark, sf, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") < 200),
            blocks=3,
        )
    ),
    ("documents",),
    oracle=_JPEG_RESTART_ORACLE,
)
