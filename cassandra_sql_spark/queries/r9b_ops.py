"""Round-9 second-wave operator entries: distribution diagnostics and
graph structure audits a training-data pipeline runs before trusting a
corpus or an event stream.

The reference has none of this surface (its aggregate set stops at
COUNT/SUM/AVG/MIN/MAX, sql/SelectExecutor.java) — these extend the
north-star analytics layer with the same determinism discipline the
r7/r8 stat entries proved: exact integer power sums for everything
order-sensitive, one double division (or sqrt) at the end, and a
DECIMAL(18,6) snap wherever a bounded-cardinality double sum or a libm
`ln` crosses the engine boundary.
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import sql_q
from cassandra_sql_spark.queries.r8_ops import _EDGES

# -- Jarque-Bera normality test ----------------------------------------------
# Per event_type on the per-event value distribution (NOT daily revenue:
# per-event values are bounded 0.01..490 at EVERY scale factor, so the
# whole-dollar deviation grid below keeps z^4 power sums inside int64 at
# sf10 and beyond — daily-revenue deviations grow with sf and would
# overflow). Two exact passes: (1) integer cents sum -> deviations
# quantized to whole dollars via the n-scaled trick (cents*n - S1 is an
# exact BIGINT; one correctly-rounded double division by 100n, identical
# on both engines); (2) integer power sums of z. The residual mean of z
# (|zbar| <= 0.5 from quantization) is folded back with the standard
# central-moment expansion rather than assumed zero. skew uses
# m2*sqrt(m2), never POWER(x, 1.5) — sqrt is IEEE-correctly-rounded,
# pow is not. JB = n/6 * (skew^2 + exkurt^2/4).
_JB_SQL = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), s AS (
  SELECT event_type, COUNT(*) AS n, SUM(cents) AS s1
  FROM c GROUP BY event_type
), z AS (
  SELECT c.event_type,
         CAST(FLOOR((c.cents * s.n - s.s1) / (100.0 * s.n) + 0.5)
              AS BIGINT) AS z
  FROM c JOIN s ON c.event_type = s.event_type
), p AS (
  SELECT event_type, COUNT(*) AS n, SUM(z) AS z1, SUM(z * z) AS z2,
         SUM(z * z * z) AS z3, SUM(z * z * z * z) AS z4
  FROM z GROUP BY event_type
), mom AS (
  SELECT event_type, n,
         CAST(z1 AS DOUBLE) / n AS m1, CAST(z2 AS DOUBLE) / n AS r2,
         CAST(z3 AS DOUBLE) / n AS r3, CAST(z4 AS DOUBLE) / n AS r4
  FROM p
), cm AS (
  SELECT event_type, n, r2 - m1 * m1 AS m2,
         r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS m3,
         r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2
            - 3 * m1 * m1 * m1 * m1 AS m4
  FROM mom
), st AS (
  -- snap skew/kurt onto an exact 1e-6 integer grid BEFORE combining:
  -- JB multiplies their squares by n, amplifying sub-snap engine-codegen
  -- ulp skew (FMA contraction of the moment polynomial) above the final
  -- snap. From the grid integers, JB is one exact integer expression
  -- and a single correctly-rounded multiply/divide.
  SELECT event_type, n,
         CAST(FLOOR(m3 / (m2 * SQRT(m2)) * 1000000 + 0.5) AS BIGINT)
           AS ski,
         CAST(FLOOR((m4 / (m2 * m2) - 3) * 1000000 + 0.5) AS BIGINT)
           AS eki
  FROM cm
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(ski AS DOUBLE) / 1e6 AS skewness,
       CAST(eki AS DOUBLE) / 1e6 AS excess_kurtosis,
       CAST(CAST(CAST(n AS DOUBLE)
                 * CAST(4 * ski * ski + eki * eki AS DOUBLE)
                 / 24e12 AS DECIMAL(18,6)) AS DOUBLE) AS jb_stat
FROM st ORDER BY event_type
"""

# -- Durbin-Watson autocorrelation test --------------------------------------
# First-order serial correlation of daily revenue residuals, per
# event_type: DW = sum((e_t - e_{t-1})^2) / sum(e_t^2), e = deviation
# from the type's mean daily revenue, quantized to whole dollars (daily
# revenue at sf10 is ~1.6e9 cents; dollar-grid squares stay < 2^63 with
# a wide margin, cent-grid ones would not). The LAG runs over at most
# |days| rows per type — a domain-bounded window, never the event log.
_DW_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(FLOOR(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0
              + 0.5) AS BIGINT) AS r
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY event_type, CAST(ts AS DATE)
), s AS (
  SELECT event_type, COUNT(*) AS nd, SUM(r) AS s1
  FROM daily GROUP BY event_type
), e AS (
  SELECT d.event_type, d.day,
         CAST(FLOOR((d.r * s.nd - s.s1) / (1.0 * s.nd) + 0.5)
              AS BIGINT) AS e
  FROM daily d JOIN s ON d.event_type = s.event_type
), l AS (
  SELECT event_type, e,
         LAG(e) OVER (PARTITION BY event_type ORDER BY day) AS pe
  FROM e
), agg AS (
  SELECT event_type, COUNT(*) AS n_days,
         SUM(CASE WHEN pe IS NULL THEN 0
             ELSE (e - pe) * (e - pe) END) AS num,
         SUM(e * e) AS den
  FROM l GROUP BY event_type
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(CAST(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS dw_stat
FROM agg ORDER BY event_type
"""

# -- Mutual information + Cramér's V -----------------------------------------
# Association strength between the two document categoricals (lang x
# source): MI in nats, normalized MI (geometric-mean entropy), chi2 and
# Cramér's V — the columns a mixture-design pass reads before treating
# lang and source as independent sampling axes. Contingency cells are
# exact integer counts (one groupBy over the corpus — the only
# full-data pass); every derived sum ranges over the ~|langs|*|sources|
# cell table, so the window sums and the double/ln terms are
# bounded-cardinality and the DECIMAL(18,6) snap absorbs libm ulp skew
# (the text_bm25 discipline). MI terms use ln(o*n/(rt*ct)); o*n and
# rt*ct stay exact BIGINTs (< 2^63 up to ~3e9 docs).
_MI_SQL = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS o
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY lang, source
), m AS (
  SELECT lang, source, o,
         SUM(o) OVER (PARTITION BY lang) AS rt,
         SUM(o) OVER (PARTITION BY source) AS ct,
         SUM(o) OVER () AS n
  FROM cells
), terms AS (
  SELECT o, rt, ct, n,
         CAST(o AS DOUBLE) / n
           * LN(CAST(o * n AS DOUBLE) / CAST(rt * ct AS DOUBLE)) AS mi_t,
         (o - CAST(rt * ct AS DOUBLE) / n)
           * (o - CAST(rt * ct AS DOUBLE) / n)
           / (CAST(rt * ct AS DOUBLE) / n) AS chi_t
  FROM m
), marg AS (
  SELECT (SELECT COUNT(DISTINCT lang) FROM cells) AS nl,
         (SELECT COUNT(DISTINCT source) FROM cells) AS ns,
         (SELECT -SUM(CAST(rt AS DOUBLE) / n * LN(CAST(rt AS DOUBLE) / n))
          FROM (SELECT lang, SUM(o) AS rt,
                       (SELECT SUM(o) FROM cells) AS n
                FROM cells GROUP BY lang) lm) AS hl,
         (SELECT -SUM(CAST(ct AS DOUBLE) / n * LN(CAST(ct AS DOUBLE) / n))
          FROM (SELECT source, SUM(o) AS ct,
                       (SELECT SUM(o) FROM cells) AS n
                FROM cells GROUP BY source) sm) AS hs
), tot AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_cells,
         SUM(mi_t) AS mi, SUM(chi_t) AS chi2
  FROM terms
)
SELECT t.n, t.n_cells,
       CAST(CAST(t.mi AS DECIMAL(18,6)) AS DOUBLE) AS mi_nats,
       CAST(CAST(t.mi / SQRT(g.hl * g.hs) AS DECIMAL(18,6)) AS DOUBLE)
         AS nmi,
       CAST(CAST(t.chi2 AS DECIMAL(18,6)) AS DOUBLE) AS chi2,
       CAST(CAST(SQRT(t.chi2 / (t.n * (CASE WHEN g.nl < g.ns THEN g.nl
                                       ELSE g.ns END - 1)))
            AS DECIMAL(18,6)) AS DOUBLE) AS cramers_v
FROM tot t, marg g
"""

# -- Degree assortativity ----------------------------------------------------
# Newman's degree-assortativity coefficient of the page-transition
# graph (same canonical undirected edge set as the r8 graph entries):
# Pearson correlation of endpoint degrees over directed edge stubs.
# Both orientations of every edge enter, so the j and k marginals
# coincide and r = (Sjk/m - (Sj/m)^2) / (Sj2/m - (Sj/m)^2) with all
# sums exact BIGINTs (degrees are bounded by the page-id domain, the
# same bound the wedge entries document). Edge/degree tables are
# |edges|-sized — the event log is scanned once to build hops.
_ASSORT_BODY = """
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges
  ) stubs GROUP BY node
), de AS (
  SELECT da.d AS j, db.d AS k
  FROM edges e
  JOIN deg da ON e.a = da.node
  JOIN deg db ON e.b = db.node
), stub2 AS (
  SELECT j, k FROM de UNION ALL SELECT k AS j, j AS k FROM de
), s AS (
  SELECT COUNT(*) AS m, SUM(j) AS sj, SUM(j * k) AS sjk,
         SUM(j * j) AS sj2
  FROM stub2
)
SELECT CAST(m AS BIGINT) AS m_stubs,
       CAST(CAST(
         (CAST(sjk AS DOUBLE) / m
            - (CAST(sj AS DOUBLE) / m) * (CAST(sj AS DOUBLE) / m))
         / (CAST(sj2 AS DOUBLE) / m
            - (CAST(sj AS DOUBLE) / m) * (CAST(sj AS DOUBLE) / m))
         AS DECIMAL(18,6)) AS DOUBLE) AS assortativity
FROM s
"""

_SPARK_K = "TRY_CAST(get_json_object(props, '$.k') AS BIGINT)"
_DUCK_K = (
    "TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)"
    " THEN JSON_EXTRACT_STRING(props, '$.k') END AS BIGINT)"
)

_ASSORT_SPARK = f"WITH {_EDGES.format(k=_SPARK_K)}, {_ASSORT_BODY}"
_ASSORT_DUCK = f"WITH {_EDGES.format(k=_DUCK_K)}, {_ASSORT_BODY}"


QUERIES = {
    "stat_jarque_bera": sql_q(_JB_SQL, ("events",)),
    "stat_durbin_watson": sql_q(_DW_SQL, ("events",)),
    "stat_mi_cramers_v": sql_q(_MI_SQL, ("documents",)),
    "graph_degree_assortativity": sql_q(
        _ASSORT_SPARK, ("events",), oracle=_ASSORT_DUCK
    ),
}
