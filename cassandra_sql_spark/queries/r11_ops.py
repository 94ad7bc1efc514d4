"""Round-11 registry entries.

REAL codec #7 behind the multimodal seam: PROGRESSIVE grayscale JPEG
(SOF2, spectral selection + successive approximation) — see
pipeline/multimodal.py. The fixtures reuse the baseline JPEG closed-form
image (flat EVEN 8x8 blocks -> the whole lossy pipeline reproduces the
source exactly), so the oracle replays decode symbolically from doc_id;
what the entry PROVES is the progressive entropy layer: six scans whose
DC/AC first+refinement passes, EOB runs, and positional correction bits
must all land for the weighted block means to match. n_scans pins the
scan count (a decoder that bails after the first DC scan fails both
columns). Reference anchor: the reference engine stores media as opaque
blobs with no codec layer at all (SURVEY §2 multimodal scoping); this
extends the Spark-side seam the way a training-data pipeline needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import Q, df_q  # noqa: F401

_JPEG_PROG_ORACLE = """
WITH d AS (
  SELECT doc_id FROM documents WHERE doc_id < 200
), b AS (
  SELECT UNNEST(generate_series(0, 1)) AS by
), c AS (
  SELECT UNNEST(generate_series(0, 1)) AS bx
), blk AS (
  SELECT doc_id, by, bx,
         2 * ((doc_id * 7 + by * 3 + bx * 5) % 100) + 40 AS v
  FROM d, b, c
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(6 AS BIGINT) AS n_scans,
       SUM(CAST(v AS DOUBLE) * (by * 2 + bx + 1)) AS wsum_gray
FROM blk GROUP BY doc_id
"""

QUERIES: dict[str, Q] = {
    "jpeg_progressive_decode_real": df_q(
        lambda spark, sf: multimodal.decode_features_jpeg_progressive(
            multimodal.synth_jpeg_progressive_payload(
                load(spark, sf, "documents")
                .select("doc_id")
                .filter(F.col("doc_id") < 200),
                blocks=2,
            )
        ),
        ("documents",),
        oracle=_JPEG_PROG_ORACLE,
    ),
}
