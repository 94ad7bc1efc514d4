"""Round-8 operator entries.

- audio_decode_real: REAL codec #2 behind the REAL-CODEC.md seam — the
  round-7 BMP recipe transplanted to RIFF/WAVE PCM16 audio (r7 verdict
  task #3). The reference has no media handling at all (its closest
  analog is opaque BLOB storage, kv/TableMetadata.java); this is part of
  the north-star training-data-pipeline surface.
- graph depth (clustering coefficient, neighbor Jaccard) on the same
  page-transition graph as graph_pagerank/graph_triangle_count.
- robust/rank statistics (Kendall tau-b, Theil-Sen, OLS,
  Kruskal-Wallis) in the exact-integer midrank/power-sum discipline.
- event_stickiness (DAU/MAU), the classic engagement ratio.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import Q, df_q, sql_q

# Page-transition graph shared with behavior.py's entries: nodes are
# props.$.k ids, edges are consecutive same-user events, canonicalized
# undirected (a < b). The json extraction is the only dialect split.
_SPARK_K = "TRY_CAST(get_json_object(props, '$.k') AS BIGINT)"
_DUCK_K = (
    "TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)"
    " THEN JSON_EXTRACT_STRING(props, '$.k') END AS BIGINT)"
)

_EDGES = """
pages AS (
  SELECT user_id, ts, event_id, {k} AS page
  FROM events WHERE ts IS NOT NULL
),
hops AS (
  SELECT page AS src,
         LEAD(page) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM pages
),
edges AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM hops
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
)"""

# Per-node local clustering coefficient: closed wedges / possible
# wedges. Triangles enumerate once over the canonical edge set (the
# same two-join shape as graph_triangle_count — |edges| shuffle rows,
# never the event log), then each triangle credits its three corners.
# 2T and d(d-1) are exact ints; one double division per node.
_CLUSTERING_BODY = f"""
WITH {_EDGES},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcnt AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS t
  FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y AS node FROM tri
    UNION ALL SELECT z AS node FROM tri
  ) tn GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges
  ) dn GROUP BY node
)
SELECT deg.node AS page, deg.d AS degree,
       CAST(COALESCE(tcnt.t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN CAST(2 * COALESCE(tcnt.t, 0) AS DOUBLE)
                 / (deg.d * (deg.d - 1))
            ELSE 0.0 END AS clustering_coeff
FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node
ORDER BY page
"""

# Structural-equivalence mining: page pairs ranked by neighbor-set
# Jaccard. Candidates come from the wedge join (pairs sharing >= 1
# neighbor — sum(deg^2) fan-out, the usual degree-cap lever at scale),
# |A union B| = dA + dB - shared, all exact ints.
_JACCARD_NEIGHBORS_BODY = f"""
WITH {_EDGES},
und AS (
  SELECT a AS u, b AS v FROM edges UNION ALL SELECT b AS u, a AS v FROM edges
),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u),
wedge AS (
  SELECT n1.u AS p, n2.u AS q
  FROM und n1 JOIN und n2 ON n1.v = n2.v AND n1.u < n2.u
),
shared AS (
  SELECT p, q, CAST(COUNT(*) AS BIGINT) AS c FROM wedge GROUP BY p, q
)
SELECT s.p AS page_a, s.q AS page_b, s.c AS shared_neighbors,
       da.d AS deg_a, db.d AS deg_b,
       CAST(s.c AS DOUBLE) / (da.d + db.d - s.c) AS jaccard
FROM shared s
JOIN deg da ON s.p = da.u
JOIN deg db ON s.q = db.u
ORDER BY jaccard DESC, page_a, page_b
LIMIT 20
"""

# Kendall tau-b over the daily event-count series: x = calendar day
# (distinct, so no x-ties), y = count. Concordance/discordance from the
# pairwise join over the DAILY reduction (bounded by calendar size,
# like series_autocorr); tie correction n2 = sum t(t-1)/2 over tied
# counts. Every term is an exact int64; the one sqrt has an
# exactly-representable product radicand (n0 < 2^26 at any horizon).
_KENDALL_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
pairs AS (
  SELECT CASE WHEN b.n > a.n THEN 1
              WHEN b.n < a.n THEN -1 ELSE 0 END AS s
  FROM daily a JOIN daily b ON a.d < b.d
),
agg AS (
  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS dd,
         CAST(COUNT(*) AS BIGINT) AS n0
  FROM pairs
),
ties AS (
  SELECT CAST(COALESCE(CAST(FLOOR(SUM(t * (t - 1)) / 2) AS BIGINT), 0)
              AS BIGINT) AS n2
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY n) g
  WHERE t > 1
)
SELECT agg.n0 AS n_pairs, agg.c AS concordant, agg.dd AS discordant,
       ties.n2 AS y_tie_pairs,
       CAST(agg.c - agg.dd AS DOUBLE)
         / SQRT(CAST(agg.n0 AS DOUBLE) * CAST(agg.n0 - ties.n2 AS DOUBLE))
         AS tau_b
FROM agg, ties
"""

# Theil-Sen robust trend: the median of all pairwise slopes of the
# daily series. Slopes stay (dy BIGINT, dx BIGINT) pairs; ordering is
# by the IEEE quotient (exact int operands -> identical on both
# engines) with (dy, dx) tie-breaks for a deterministic total order;
# the median is the lower-middle order statistic (no averaging).
_THEIL_SEN_BODY = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
slopes AS (
  SELECT b.n - a.n AS dy, CAST({dd} AS BIGINT) AS dx
  FROM daily a JOIN daily b ON a.d < b.d
),
ranked AS (
  SELECT dy, dx, CAST(dy AS DOUBLE) / dx AS slope,
         ROW_NUMBER() OVER (
           ORDER BY CAST(dy AS DOUBLE) / dx, dy, dx) AS rn,
         COUNT(*) OVER () AS m
  FROM slopes
)
SELECT CAST(m AS BIGINT) AS n_pairs, CAST(dy AS BIGINT) AS med_dy,
       CAST(dx AS BIGINT) AS med_dx, slope AS theil_sen_slope
FROM ranked WHERE rn = CAST(FLOOR((m + 1) / 2.0) AS BIGINT)
"""

# OLS trend per event type from integer power sums: x = days since
# 2024-01-01 (centered anchor keeps every sum far inside int64), y =
# daily count. slope/intercept/r^2 are the closed forms over exact
# integer sums; r^2 squares in double (operands < 2^53, so the products
# are correctly rounded identically on both engines).
_OLS_BODY = """
WITH daily0 AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, CAST(ts AS DATE)
),
daily AS (
  SELECT event_type, CAST({dd} AS BIGINT) AS x, y FROM daily0
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM daily GROUP BY event_type
)
SELECT event_type, n AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       (CAST(n * sxy - sx * sy AS DOUBLE)
        * CAST(n * sxy - sx * sy AS DOUBLE))
         / (CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
FROM s
WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY event_type
"""

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

# Kruskal-Wallis H across event types over exact integer cents.
# Doubled midranks (2*cum_before + cnt + 1) are exact ints; centering
# by the mean doubled rank (N+1) keeps per-group sums small enough
# that their squares are exact in double (|Sg| < 2^40 at any realistic
# N). H = 3/(N(N+1)) * sum Sg^2/ng over doubled centered ranks; the
# tie correction divides by 1 - sum(t^3 - t)/(N^3 - N).
_KRUSKAL_SQL = """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
dist AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY c
),
mr AS (
  SELECT c, t,
         2 * (SUM(t) OVER (ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) + t + 1
           AS dr2
  FROM dist
),
mr0 AS (
  SELECT c, t, COALESCE(dr2, t + 1) AS dr FROM mr
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
g AS (
  SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(mr0.dr - (n.n + 1)) AS BIGINT) AS sg
  FROM v JOIN mr0 ON v.c = mr0.c CROSS JOIN n
  GROUP BY v.event_type
),
h AS (
  SELECT CAST(SUM(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
               / CAST(ng AS DOUBLE)) AS DOUBLE) AS ssq,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM g
),
tie AS (
  SELECT CAST(SUM(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
               - CAST(t AS DOUBLE)) AS DOUBLE) AS tsum
  FROM dist WHERE t > 1
)
SELECT n.n AS n_obs, h.k AS n_groups,
       -- DECIMAL(18,6) snap: ssq is a 5-term double SUM whose
       -- accumulation order differs between engines; at sf10 the
       -- last-ulp drift crossed the 9-sig-digit hash boundary
       -- (caught by the round-10 sf10 gate — invisible at sf0.01)
       CAST(CAST(
         3.0 / (CAST(n.n AS DOUBLE) * CAST(n.n + 1 AS DOUBLE)) * h.ssq
         AS DECIMAL(18,6)) AS DOUBLE) AS h_stat,
       CAST(CAST(
         (3.0 / (CAST(n.n AS DOUBLE) * CAST(n.n + 1 AS DOUBLE)) * h.ssq)
         / (1.0 - COALESCE(tie.tsum, 0.0)
              / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)
                 * CAST(n.n AS DOUBLE) - CAST(n.n AS DOUBLE)))
         AS DECIMAL(18,6)) AS DOUBLE) AS h_tie_corrected
FROM n, h, tie
"""

# DAU/MAU stickiness per calendar month: the engagement ratio every
# product-analytics stack ships. Integer month key (y*12+m — the
# date_trunc dialect trap avoided), exact integer numerators, one
# double division.
_STICKINESS_SQL = """
WITH du AS (
  SELECT CAST(ts AS DATE) AS d, user_id
  FROM events WHERE ts IS NOT NULL
  GROUP BY CAST(ts AS DATE), user_id
),
m AS (
  SELECT CAST(EXTRACT(YEAR FROM d) * 12 + EXTRACT(MONTH FROM d)
              AS BIGINT) AS mkey,
         d, user_id
  FROM du
),
dau AS (
  SELECT mkey, d, CAST(COUNT(*) AS BIGINT) AS a FROM m GROUP BY mkey, d
),
mau AS (
  SELECT mkey, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM m GROUP BY mkey
),
s AS (
  SELECT mkey, CAST(SUM(a) AS BIGINT) AS sum_dau,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM dau GROUP BY mkey
)
SELECT s.mkey AS month_key, s.n_days, s.sum_dau, mau.mau,
       CAST(s.sum_dau AS DOUBLE) / (s.n_days * mau.mau) AS stickiness
FROM s JOIN mau ON s.mkey = mau.mkey
ORDER BY month_key
"""

# Sentence-level duplication audit (the C4 / RefinedWeb line-dedup
# primitive): split docs to sentences, count each sentence corpus-wide
# via a WINDOW over the exploded sentences — ONE corpus scan, one
# shuffle on sentence, one on doc_id (the first draft joined the
# exploded frame against its own aggregate: Catalyst has no
# common-subplan reuse there, so it re-scanned + re-exploded the whole
# corpus — the pagerank/ngram-cascade lesson again). Spark splits on
# the regex-escaped dot; DuckDB on the literal dot (same result).
_SENT_DEDUP_BODY = """
WITH s AS (
  SELECT doc_id, trim(sv) AS sent FROM {src}
),
f AS (SELECT doc_id, sent FROM s WHERE sent <> ''),
c AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY sent) AS cnt FROM f
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sents,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_sents,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_ratio
FROM c GROUP BY doc_id ORDER BY doc_id
"""

_SENT_SPARK_SRC = (
    "(SELECT doc_id, explode(split(text, '\\\\.')) AS sv FROM documents)"
)
_SENT_DUCK_SRC = (
    "(SELECT doc_id, UNNEST(string_split(text, '.')) AS sv"
    " FROM documents)"
)

# Approximate-quantile sketch with a hard rank-error bound check (the
# agg_approx_distinct_bound pattern): Spark's Greenwald-Khanna
# approx_percentile(accuracy=1000) must land within n/100 + 1/2 ranks
# of the true median (the half-rank slack is the discreteness floor —
# an ODD n makes |2*rank - n| >= 1 even for the perfect median) — the
# flag is computed from exact integer counts
# (50*|2*rank - n| <= n + 50), the oracle emits the literal 1 plus the same
# exact median. The exact median runs the cumulative window over the
# DISTINCT cent values (domain-bounded, never the row count).
_QUANTILE_BOUND_SPARK = """
WITH ap AS (
  SELECT approx_percentile(o_totalprice, 0.5, 1000) AS apx FROM orders
),
r AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o.o_totalprice <= ap.apx THEN 1 ELSE 0 END)
              AS BIGINT) AS rk
  FROM orders o CROSS JOIN ap
  WHERE o.o_totalprice IS NOT NULL
),
cents AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
dist AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM cents GROUP BY v),
w AS (
  SELECT v,
         SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cw,
         SUM(t) OVER () AS tw
  FROM dist
),
med AS (SELECT MIN(CASE WHEN 2 * cw >= tw THEN v END) AS med_c FROM w)
SELECT r.n, CAST(med.med_c AS DOUBLE) / 100 AS exact_median,
       CASE WHEN 50 * ABS(2 * r.rk - r.n) <= r.n + 50 THEN 1 ELSE 0 END
         AS within_bound
FROM r, med
"""

_QUANTILE_BOUND_ORACLE = """
WITH cents AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cents),
dist AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM cents GROUP BY v),
w AS (
  SELECT v,
         SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cw,
         SUM(t) OVER () AS tw
  FROM dist
),
med AS (SELECT MIN(CASE WHEN 2 * cw >= tw THEN v END) AS med_c FROM w)
SELECT n.n, CAST(med.med_c AS DOUBLE) / 100 AS exact_median,
       1 AS within_bound
FROM n, med
"""

# Weekday seasonal index of the event series: weekday via epoch-day
# mod 7 against the Monday anchor (EXTRACT(DOW) numbering differs
# between engines), index = weekday-mean / overall-mean via exact
# integer cross-products.
_SEASONAL_BODY = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
),
wd AS (SELECT CAST({dd} AS BIGINT) % 7 AS weekday, n FROM daily),
per AS (
  SELECT weekday, CAST(COUNT(*) AS BIGINT) AS nw,
         CAST(SUM(n) AS BIGINT) AS sw
  FROM wd GROUP BY weekday
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nt, CAST(SUM(n) AS BIGINT) AS st
  FROM wd
)
SELECT weekday, nw AS n_days,
       CAST(sw AS DOUBLE) / nw AS mean_count,
       CAST(sw * tot.nt AS DOUBLE) / CAST(per.nw * tot.st AS DOUBLE)
         AS seasonal_index
FROM per, tot ORDER BY weekday
"""

# Week-over-week churn: users active in week w but not w+1. Week key =
# epoch-days // 7 (Monday anchor); the last week is excluded (it has no
# successor to churn into). LEFT JOIN on (user, next week) keeps the
# shuffle on the distinct (week, user) reduction.
_CHURN_BODY = """
WITH act AS (
  SELECT DISTINCT
         CAST(FLOOR({dd} / 7.0) AS BIGINT) AS wk, user_id
  FROM (
    SELECT CAST(ts AS DATE) AS d, user_id
    FROM events WHERE ts IS NOT NULL
  ) e
),
r AS (
  SELECT a.wk, CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained
  FROM act a
  LEFT JOIN act b ON b.wk = a.wk + 1 AND b.user_id = a.user_id
  GROUP BY a.wk
),
mx AS (SELECT MAX(wk) AS last_wk FROM act)
SELECT r.wk AS week_key, r.n_active, r.n_retained,
       r.n_active - r.n_retained AS n_churned,
       CAST(r.n_active - r.n_retained AS DOUBLE) / r.n_active
         AS churn_rate
FROM r, mx WHERE r.wk < mx.last_wk ORDER BY week_key
"""

# Monthly revenue with month-over-month and year-over-year growth on
# the orders table (it spans 1992-1998; events span one month). Exact
# integer cents through both LAGs; growth ratios are single double
# divisions of exact ints. Integer y*12+m month keys (the date_trunc
# dialect trap avoided).
_REVENUE_MOM_YOY = """
WITH m AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
              + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders
  WHERE o_orderdate IS NOT NULL
  GROUP BY EXTRACT(YEAR FROM o_orderdate) * 12
           + EXTRACT(MONTH FROM o_orderdate)
),
l AS (
  SELECT mkey, rev_c,
         LAG(rev_c, 1) OVER (ORDER BY mkey) AS prev_m,
         LAG(rev_c, 12) OVER (ORDER BY mkey) AS prev_y
  FROM m
)
SELECT mkey AS month_key,
       CAST(rev_c AS DOUBLE) / 100 AS revenue,
       CAST(rev_c - prev_m AS DOUBLE) / prev_m AS mom_growth,
       CAST(rev_c - prev_y AS DOUBLE) / prev_y AS yoy_growth
FROM l ORDER BY month_key
"""

# SQL:2003 hypothetical-set aggregates — RANK/DENSE_RANK/PERCENT_RANK
# of a hypothetical value x WITHIN GROUP (ORDER BY value). Neither
# Spark nor DuckDB ships the ordered-aggregate syntax, so the entry
# implements the standard's defining formulas (rank = 1 + count(v<x),
# dense = 1 + count(distinct v<x), pct = (rank-1)/N) — identical
# counting SQL on both engines, exact ints until the one division.
_HYPOTHETICAL_RANK = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(1 + COUNT(CASE WHEN value < 500.0 THEN 1 END) AS BIGINT)
         AS rank_500,
       CAST(1 + COUNT(DISTINCT CASE WHEN value < 500.0 THEN value END)
            AS BIGINT) AS dense_rank_500,
       CAST(COUNT(CASE WHEN value < 500.0 THEN 1 END) AS DOUBLE)
         / COUNT(*) AS percent_rank_500
FROM events
WHERE value IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""

# Embedding-norm decile audit (vector hygiene: truncated/denormal/
# blown-up rows show up as distribution tails before they poison
# training). Norms quantize to exact int64 (sum of squared 1e6-scaled
# coords); deciles via the integer-threshold rule over the DISTINCT
# norm values (domain-bounded window, never the row count).
_NORM_QUANTILES_BODY = """
WITH norms AS (
  SELECT {n2} AS n2 FROM embeddings
),
dist AS (SELECT n2, CAST(COUNT(*) AS BIGINT) AS t FROM norms GROUP BY n2),
w AS (
  SELECT n2,
         SUM(t) OVER (ORDER BY n2 ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cw,
         SUM(t) OVER () AS tw
  FROM dist
),
g AS (SELECT {grid} AS q)
SELECT CAST(g.q AS BIGINT) AS decile,
       CAST(MIN(CASE WHEN 10 * w.cw >= g.q * w.tw THEN w.n2 END)
            AS BIGINT) AS norm_sq
FROM g, w GROUP BY g.q ORDER BY decile
"""

_NORM_SPARK_N2 = (
    "aggregate(transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
    " * 1000000 + 0.5) AS BIGINT)), CAST(0 AS BIGINT),"
    " (acc, y) -> acc + y * y)"
)
_NORM_DUCK_N2 = (
    "CAST(list_sum(list_transform(list_transform(embedding::DOUBLE[],"
    " x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)), y -> y * y))"
    " AS BIGINT)"
)

def _canonical_edges(spark, sf, view: str):
    """Build the canonical undirected page-transition edge list ONCE
    from the event log and localCheckpoint it (model-sized: at most
    |pages|^2 rows). The pure-SQL CTE form re-expands `edges` under
    Catalyst's CTE inlining — clustering-coefficient references it four
    times and neighbor-Jaccard five, i.e. 4-5 full scans of the raw log
    at 100 TB (the same trap _pagerank documented and dodged)."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").filter(F.col("ts").isNotNull())
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.expr(_SPARK_K).alias("src"), "user_id", "ts", "event_id"
    ).select("src", F.lead("src").over(w_user).alias("dst"))
    edges = (
        seq.filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges.createOrReplaceTempView(view)
    return edges


_CLUSTERING_TAIL = """
WITH tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM {v} e1
  JOIN {v} e2 ON e1.b = e2.a
  JOIN {v} e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcnt AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS t
  FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y AS node FROM tri
    UNION ALL SELECT z AS node FROM tri
  ) tn GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (
    SELECT a AS node FROM {v} UNION ALL SELECT b AS node FROM {v}
  ) dn GROUP BY node
)
SELECT deg.node AS page, deg.d AS degree,
       CAST(COALESCE(tcnt.t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN CAST(2 * COALESCE(tcnt.t, 0) AS DOUBLE)
                 / (deg.d * (deg.d - 1))
            ELSE 0.0 END AS clustering_coeff
FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node
ORDER BY page
"""

_JACCARD_TAIL = """
WITH und AS (
  SELECT a AS u, b AS v FROM {v} UNION ALL SELECT b AS u, a AS v FROM {v}
),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u),
wedge AS (
  SELECT n1.u AS p, n2.u AS q
  FROM und n1 JOIN und n2 ON n1.v = n2.v AND n1.u < n2.u
),
shared AS (
  SELECT p, q, CAST(COUNT(*) AS BIGINT) AS c FROM wedge GROUP BY p, q
)
SELECT s.p AS page_a, s.q AS page_b, s.c AS shared_neighbors,
       da.d AS deg_a, db.d AS deg_b,
       CAST(s.c AS DOUBLE) / (da.d + db.d - s.c) AS jaccard
FROM shared s
JOIN deg da ON s.p = da.u
JOIN deg db ON s.q = db.u
ORDER BY jaccard DESC, page_a, page_b
LIMIT 20
"""


# Hot-node guard for the wedge joins (r8 verdict, What's wrong #4):
# wedge enumeration costs sum(d^2) over shared endpoints, so ONE hub in
# a power-law graph dominates the join. degree_cap=N applies hub
# removal — drop every node of degree > N (and its edges) BEFORE the
# wedge join, the standard bounded-fan-out discipline (mirrors the
# dedup family's df_cutoff: a trigram in >64 docs is evidence of
# boilerplate, a page touching >cap others is a nav hub, neither is
# signal). The registry entries run UNCAPPED because this page graph is
# domain-bounded — |pages| = 100 by construction, so d <= 99 and the
# wedge join is <= |V| * 99^2 rows at ANY data volume (same bound class
# as series_autocorr's calendar); SCALE.md documents the bound and the
# cap is the knob a true power-law graph would set.
_CAP_PREFIX = """
rawdeg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM {v} UNION ALL SELECT b AS node FROM {v}) rn
  GROUP BY node
),
capped AS (
  SELECT e.a, e.b FROM {v} e
  JOIN rawdeg da ON e.a = da.node AND da.d <= {cap}
  JOIN rawdeg db ON e.b = db.node AND db.d <= {cap}
)"""


def _with_cap(tail: str, view: str, degree_cap: int | None) -> str:
    if degree_cap is None:
        return tail.format(v=view)
    prefix = _CAP_PREFIX.format(v=view, cap=int(degree_cap))
    return tail.format(v="capped").replace(
        "WITH ", "WITH" + prefix + ",\n", 1
    )


def _clustering_df(spark, sf, degree_cap: int | None = None):
    _canonical_edges(spark, sf, "r8_edges_ccoef")
    return spark.sql(
        _with_cap(_CLUSTERING_TAIL, "r8_edges_ccoef", degree_cap)
    )


def _jaccard_neighbors_df(spark, sf, degree_cap: int | None = None):
    _canonical_edges(spark, sf, "r8_edges_jacc")
    return spark.sql(
        _with_cap(_JACCARD_TAIL, "r8_edges_jacc", degree_cap)
    )


QUERIES: dict[str, Q] = {
    "series_revenue_mom_yoy": sql_q(_REVENUE_MOM_YOY, ("orders",)),
    "agg_hypothetical_rank": sql_q(_HYPOTHETICAL_RANK, ("events",)),
    "emb_norm_quantiles": sql_q(
        _NORM_QUANTILES_BODY.format(
            n2=_NORM_SPARK_N2, grid="explode(sequence(1, 9))"
        ),
        ("embeddings",),
        oracle=_NORM_QUANTILES_BODY.format(
            n2=_NORM_DUCK_N2, grid="UNNEST(generate_series(1, 9))"
        ),
    ),
    # Hapax legomena share per source — the classic vocabulary-quality
    # signal (a source whose vocabulary is mostly one-off tokens is
    # OCR noise or boilerplate-free prose; one drifting upward is
    # degenerating). Shuffle carries (source, token) pairs.
    "text_hapax_ratio": df_q(
        lambda spark, sf: (
            load(spark, sf, "documents")
            .select(
                "source",
                F.explode(
                    F.split(F.trim(F.col("text")), r"\s+")
                ).alias("tok"),
            )
            .groupBy("source", "tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("vocab"),
                F.sum((F.col("c") == 1).cast("long"))
                .cast("long").alias("hapax"),
                (
                    F.sum((F.col("c") == 1).cast("long")).cast("double")
                    / F.count(F.lit(1))
                ).alias("hapax_ratio"),
            )
            .orderBy("source")
        ),
        ("documents",),
        oracle="""
        WITH tc AS (
          SELECT source, tok, COUNT(*) AS c FROM (
            SELECT source,
                   UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents
          ) t GROUP BY source, tok
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hapax,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS hapax_ratio
        FROM tc GROUP BY source ORDER BY source
        """,
    ),
    # Term burstiness (Church/Gale): variance-to-mean ratio of per-doc
    # counts over ALL docs (zeros included — algebraically folded in:
    # VMR = (N*sum(x^2) - (sum x)^2) / (N*sum x), every term an exact
    # int64). Top-20 by corpus frequency; function words sit near
    # Poisson (VMR ~ 1), topical words burst (VMR >> 1).
    "text_burstiness": df_q(
        lambda spark, sf: (
            lambda docs: (
                docs.select(
                    "doc_id",
                    F.explode(
                        F.split(F.trim(F.col("text")), r"\s+")
                    ).alias("tok"),
                )
                .groupBy("tok", "doc_id")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("tok")
                .agg(
                    F.sum("c").cast("long").alias("s"),
                    F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
                    F.count(F.lit(1)).cast("long").alias("nd"),
                )
                .crossJoin(
                    F.broadcast(
                        docs.agg(
                            F.count(F.lit(1)).cast("long").alias("nn")
                        )
                    )
                )
                .select(
                    "tok",
                    F.col("s").alias("total_tf"),
                    F.col("nd").alias("n_docs_present"),
                    (
                        (F.col("nn") * F.col("ss") - F.col("s") * F.col("s"))
                        .cast("double")
                        / (F.col("nn") * F.col("s")).cast("double")
                    ).alias("vmr"),
                )
                .orderBy(F.desc("total_tf"), "tok")
                .limit(20)
            )
        )(load(spark, sf, "documents")),
        ("documents",),
        oracle="""
        WITH tc AS (
          SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT doc_id,
                   UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents
          ) t GROUP BY tok, doc_id
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
        a AS (
          SELECT tok, CAST(SUM(c) AS BIGINT) AS s,
                 CAST(SUM(c * c) AS BIGINT) AS ss,
                 CAST(COUNT(*) AS BIGINT) AS nd
          FROM tc GROUP BY tok
        )
        SELECT tok, s AS total_tf, nd AS n_docs_present,
               CAST(nn.nn * a.ss - a.s * a.s AS DOUBLE)
                 / CAST(nn.nn * a.s AS DOUBLE) AS vmr
        FROM a, nn
        ORDER BY total_tf DESC, tok LIMIT 20
        """,
    ),
    "series_seasonal_naive": sql_q(
        _SEASONAL_BODY.format(dd="DATEDIFF(d, DATE'1969-12-29')"),
        ("events",),
        oracle=_SEASONAL_BODY.format(
            dd="date_diff('day', DATE '1969-12-29', d)"
        ),
    ),
    "event_churn_weekly": sql_q(
        _CHURN_BODY.format(dd="DATEDIFF(d, DATE'1969-12-29')"),
        ("events",),
        oracle=_CHURN_BODY.format(
            dd="date_diff('day', DATE '1969-12-29', d)"
        ),
    ),
    "text_sentence_dedup": sql_q(
        _SENT_DEDUP_BODY.format(src=_SENT_SPARK_SRC),
        ("documents",),
        oracle=_SENT_DEDUP_BODY.format(src=_SENT_DUCK_SRC),
    ),
    "sketch_approx_quantile_bound": sql_q(
        _QUANTILE_BOUND_SPARK,
        ("orders",),
        oracle=_QUANTILE_BOUND_ORACLE,
    ),
    "graph_clustering_coeff": df_q(
        _clustering_df,
        ("events",),
        oracle=_CLUSTERING_BODY.format(k=_DUCK_K),
    ),
    "graph_jaccard_neighbors": df_q(
        _jaccard_neighbors_df,
        ("events",),
        oracle=_JACCARD_NEIGHBORS_BODY.format(k=_DUCK_K),
    ),
    "stat_kendall_tau": sql_q(_KENDALL_SQL, ("events",)),
    "stat_theil_sen": sql_q(
        _THEIL_SEN_BODY.format(dd="DATEDIFF(b.d, a.d)"),
        ("events",),
        oracle=_THEIL_SEN_BODY.format(dd="date_diff('day', a.d, b.d)"),
    ),
    "stat_ols_trend": sql_q(
        _OLS_BODY.format(dd="DATEDIFF(d, DATE'2024-01-01')"),
        ("events",),
        oracle=_OLS_BODY.format(
            dd="date_diff('day', DATE '2024-01-01', d)"
        ),
    ),
    "stat_kruskal_wallis": sql_q(_KRUSKAL_SQL, ("events",)),
    "event_stickiness": sql_q(_STICKINESS_SQL, ("events",)),
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
