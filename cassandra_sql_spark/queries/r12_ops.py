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
from cassandra_sql_spark.pipeline import multimodal, similarity
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


# -- IVF+PQ composed top-k (r11 verdict #6) -----------------------------------
# The two prunings production ANN multiplies at 100 TB: coarse lists
# cut the ROWS (nprobe/n_centroids), PQ codes cut the BYTES (m codes
# instead of the vector); only the shortlist reads full vectors. Every
# routing decision — both exact-integer Lloyd trainings, coarse
# assignment, probe pick, codes, ADC order — is int64 arithmetic on the
# unit-quantized grid, so DuckDB replays the ENTIRE pipeline (the
# oracle below composes the kmeans CTE chain with the per-subspace
# codebook chains and restricts ADC to the probed lists); the final
# cosine takes the DECIMAL(18,6) hop. Citing the r7 sim_ivf_topk /
# sim_pq_topk oracles this builder composes.


def _ivfpq_exact_oracle(
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 50,
    m: int = 4,
    k_codes: int = 16,
    iters_pq: int = 2,
    query_id: int = 0,
) -> str:
    from cassandra_sql_spark.queries.pipeline_queries import _COSINE
    from cassandra_sql_spark.queries.pipeline_r6 import (
        _int_l2,
        _kmeans_iter,
        _kmeans_seed_cte,
        kmeans_ctes,
    )

    subdim = 64 // m
    parts = []
    for s in range(m):
        p, e = f"s{s}", f"s{s}e"
        lo, hi = s * subdim + 1, (s + 1) * subdim
        chain = "".join(
            "," + _kmeans_iter(t, p=p, ename=e, dim=subdim)
            for t in range(iters_pq)
        )
        parts.append(f"""
{e} AS (
  SELECT vec_id, xq[{lo}:{hi}] AS xq FROM e
), {_kmeans_seed_cte(p=p, ename=e, k=k_codes)}{chain},
{p}q AS (
  SELECT xq[{lo}:{hi}] AS q FROM e WHERE vec_id = {query_id}
), {p}qd AS (
  SELECT {p}c{iters_pq}.cid,
         {_int_l2('q.q', f'{p}c{iters_pq}.c', subdim)} AS d
  FROM {p}c{iters_pq}, {p}q q
), {p}code AS (
  SELECT vec_id, cid FROM (
    SELECT {e}.vec_id, {p}c{iters_pq}.cid,
           ROW_NUMBER() OVER (PARTITION BY {e}.vec_id
               ORDER BY {_int_l2(f'{e}.xq', f'{p}c{iters_pq}.c', subdim)},
                        {p}c{iters_pq}.cid) AS rk
    FROM {e}, {p}c{iters_pq}
  ) WHERE rk = 1
)""")
    sub_ctes = ",".join(parts)
    code_joins = " ".join(
        f"JOIN s{s}code USING (vec_id)" for s in range(1, m)
    )
    qd_joins = " ".join(
        f"JOIN s{s}qd q{s} ON s{s}code.cid = q{s}.cid" for s in range(m)
    )
    adc_sum = " + ".join(f"q{s}.d" for s in range(m))
    # kmeans_ctes(unit=True) provides e (unit grid) and c0..c3 (coarse)
    return f"""{kmeans_ctes(unit=True)},
    ev AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ), cq AS (
      SELECT xq AS qxq FROM e WHERE vec_id = {query_id}
    ), qv AS (
      SELECT v AS qv FROM ev WHERE vec_id = {query_id}
    ), probe AS (
      SELECT cid FROM (
        SELECT c3.cid,
               ROW_NUMBER() OVER (
                   ORDER BY {_int_l2('cq.qxq', 'c3.c')}, c3.cid) AS rk
        FROM c3, cq
      ) WHERE rk <= {nprobe}
    ), asn AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c3.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {_int_l2('e.xq', 'c3.c')}, c3.cid) AS rk
        FROM e, c3
      ) WHERE rk = 1
    ),{sub_ctes},
    adc AS (
      SELECT s0code.vec_id, ({adc_sum}) AS adc
      FROM s0code {code_joins} {qd_joins}
      JOIN asn ON asn.vec_id = s0code.vec_id
      JOIN probe ON asn.cid = probe.cid
    ), short AS (
      SELECT vec_id FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY adc, vec_id) AS rk
        FROM adc WHERE vec_id != {query_id}
      ) WHERE rk <= {shortlist}
    )
    SELECT ev.vec_id,
           CAST(CAST({_COSINE.format(a='ev.v', b='qv.qv')}
                     AS DECIMAL(18,6)) AS DOUBLE) AS score
    FROM ev JOIN short ON ev.vec_id = short.vec_id CROSS JOIN qv
    ORDER BY score DESC, ev.vec_id
    LIMIT {k}
    """


QUERIES["sim_ivfpq_topk"] = df_q(
    lambda spark, sf: similarity.topk_ivfpq_exact(
        load(spark, sf, "embeddings"), query_id=0
    ),
    ("embeddings",),
    oracle=_ivfpq_exact_oracle(),
)
