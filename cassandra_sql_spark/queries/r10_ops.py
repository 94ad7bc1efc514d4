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


# ---------------------------------------------------------------------------
# Round-10 analytics wave: inequality/outlier panels, link prediction,
# market-basket lift, censored survival, cluster quality, and a
# levenshtein-verified dedup pass. Same determinism discipline as the
# r7-r9 stat entries: exact integer power sums / per-term 1e-9..1e-15
# grids for anything order-sensitive, one correctly-rounded double
# division (or sqrt/ln on the grid) at the boundary, DECIMAL snap on
# bounded-cardinality outputs.
# ---------------------------------------------------------------------------

from cassandra_sql_spark.queries.base import sql_q  # noqa: E402
from cassandra_sql_spark.queries.r9b_ops import _HHI_CUST  # noqa: E402

# -- Gini coefficient of customer revenue -------------------------------------
# The Lorenz-curve inequality panel next to order_revenue_hhi: G =
# 2*sum((i/n)*(x_i/S)) - (n+1)/n over ascending per-customer dollars.
# Every term (i/n)*(x_i/S) is two correctly-rounded divisions + one
# multiply of exact integers, quantized onto the 1e-15 grid (term sum
# <= 1e15 + n/2 at ANY n — no raw i*x_i BIGINT products, which pass
# 2^63 near sf10). The full rank vector over the CUSTOMER rollup is
# genuinely the semantics (every customer contributes a Lorenz term),
# but the rank itself runs through operators.global_order.sharded_rank
# — per-shard ROW_NUMBER after a range repartition plus broadcast
# prefix-count offsets — so there is NO single-reducer global sort
# even at the ~1.5B-customer 100 TB point (the r10 verdict's What's
# wrong #1; the rollup is checkpointed and read twice: shard totals +
# rank pass). Ties on equal dollars carry the o_custkey tiebreak; the
# quantized term-sum is permutation-invariant within a tied block, so
# the tiebreak never changes the output. The DuckDB oracle keeps the
# plain global window — the sharded form must MATCH it (also pinned by
# tests/test_global_order.py's exceptAll identity at sf0.1/sf1).
_GINI_TAIL = """
WITH f AS (
  -- a customer whose every order price is NULL has no revenue total
  -- (SUM over all-NULL is NULL) and no place on the Lorenz curve;
  -- excluded EXPLICITLY because a NULL d would otherwise rank first
  -- in Spark ASC and last in DuckDB, shifting every rank by one (the
  -- event-sequence NULL-ordering trap, caught by the adversarial
  -- TPC-H suite)
  SELECT o_custkey, d FROM {v} WHERE d IS NOT NULL
), s AS (
  SELECT COUNT(*) AS n, SUM(d) AS s1 FROM f
), r AS (
  {ranked}
), t AS (
  SELECT CAST(FLOOR(
           (CAST(r.i AS DOUBLE) / s.n)
           * (CAST(r.d AS DOUBLE) / CAST(s.s1 AS DOUBLE))
           * 1e15 + 0.5) AS BIGINT) AS q
  FROM r CROSS JOIN s
), lz AS (
  SELECT SUM(q) AS sq FROM t
)
SELECT CAST(s.n AS BIGINT) AS n_customers,
       CAST(CAST(
         2.0 * (CAST(lz.sq AS DOUBLE) / 1e15) - (s.n + 1.0) / s.n
         AS DECIMAL(18,9)) AS DOUBLE) AS gini,
       CASE WHEN s.n = 1 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(CAST(
              (2.0 * (CAST(lz.sq AS DOUBLE) / 1e15)
               - (s.n + 1.0) / s.n) * s.n / (s.n - 1.0)
              AS DECIMAL(18,9)) AS DOUBLE)
       END AS gini_normalized
FROM s CROSS JOIN lz
"""


def _gini(spark, sf):
    """Reuses the checkpointed HHI customer rollup shape: one orders
    scan at build, ExistingRDD reads in the tail. The Lorenz rank is
    sharded_rank (no SinglePartition sort, see module comment)."""
    from cassandra_sql_spark.operators.global_order import sharded_rank

    cust = spark.sql(_HHI_CUST).localCheckpoint(eager=True)
    ranked = sharded_rank(
        cust.filter(F.col("d").isNotNull()).select("o_custkey", "d"),
        ["d", "o_custkey"],
        rank_col="i",
    )
    ranked.createOrReplaceTempView("gini_ranked")
    cust.createOrReplaceTempView("gini_cust")
    return spark.sql(
        _GINI_TAIL.format(v="gini_cust", ranked="SELECT d, i FROM gini_ranked")
    )


_GINI_DUCK = (
    "WITH gc AS ("
    + _HHI_CUST
    + "), "
    + _GINI_TAIL.format(
        v="gc",
        ranked="SELECT d, ROW_NUMBER() OVER (ORDER BY d, o_custkey) AS i FROM f",
    ).replace("WITH ", "", 1)
)

# -- Grubbs max-deviation outlier test ----------------------------------------
# Is the most extreme daily-revenue day a statistical outlier? G =
# max|x - xbar| / s on the n-scaled integer deviation grid (the
# stat_durbin_watson trick: x*n - s1 exact BIGINT, one division by n,
# FLOOR to whole dollars, so the power sums are exact; largest is
# n*z2 ~ 1.2e18 at sf10, the documented sf100 path is a 10-dollar
# grid). The critical value needs a t-quantile, so the entry reports
# the STATISTIC plus the offending day — the argmax with a min-day
# tiebreak, picked by an ORDER BY/LIMIT over the day-domain table.
_GRUBBS_TAIL = """
WITH w AS (
  SELECT day, r, COUNT(*) OVER () AS n, SUM(r) OVER () AS s1 FROM {v}
), z AS (
  SELECT day, r, n,
         CAST(FLOOR((r * n - s1) / (1.0 * n) + 0.5) AS BIGINT) AS z
  FROM w
), p AS (
  SELECT MAX(n) AS n, SUM(z) AS z1, SUM(z * z) AS z2,
         MAX(ABS(z)) AS mz
  FROM z
), peak AS (
  SELECT z.day AS peak_day, z.r AS peak_revenue
  FROM z CROSS JOIN p WHERE ABS(z.z) = p.mz
  ORDER BY z.day LIMIT 1
)
SELECT CAST(p.n AS BIGINT) AS n_days,
       CASE WHEN p.n < 3 OR p.n * p.z2 = p.z1 * p.z1
            THEN CAST(NULL AS DOUBLE)
            ELSE CAST(CAST(
              CAST(p.mz AS DOUBLE)
              / SQRT(CAST(p.z2 AS DOUBLE) / p.n
                     - (CAST(p.z1 AS DOUBLE) / p.n)
                       * (CAST(p.z1 AS DOUBLE) / p.n))
              AS DECIMAL(18,6)) AS DOUBLE)
       END AS grubbs_g,
       peak.peak_day,
       CAST(peak.peak_revenue AS BIGINT) AS peak_revenue
FROM p CROSS JOIN peak
"""

_DAILY_REVENUE = """
  SELECT CAST(ts AS DATE) AS day,
         CAST(FLOOR(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0
              + 0.5) AS BIGINT) AS r
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY CAST(ts AS DATE)
"""


def _grubbs(spark, sf):
    """Day table checkpointed once: the tail reads it for both the
    moment pass and the argmax pass (CTE inlining would re-scan the
    event log per reference)."""
    daily = spark.sql(_DAILY_REVENUE).localCheckpoint(eager=True)
    daily.createOrReplaceTempView("grubbs_daily")
    return spark.sql(_GRUBBS_TAIL.format(v="grubbs_daily"))


_GRUBBS_DUCK = (
    "WITH gd AS ("
    + _DAILY_REVENUE
    + "), "
    + _GRUBBS_TAIL.format(v="gd").replace("WITH ", "", 1)
)

# -- Max drawdown of daily revenue --------------------------------------------
# Worst drop from the running daily-revenue peak, with the trough day
# (min-day tiebreak) — the volatility panel next to Bollinger. Running
# max + difference are exact integers over the day domain; the argmax
# is an ORDER BY/LIMIT over the checkpointed day table.
_DRAWDOWN_TAIL = """
WITH dd AS (
  SELECT day, r, MAX(r) OVER (ORDER BY day) AS peak FROM {v}
), mx AS (
  SELECT MAX(peak - r) AS maxdd, COUNT(*) AS n FROM dd
), pick AS (
  SELECT dd.day AS trough_day, dd.r AS trough_revenue,
         dd.peak AS peak_revenue
  FROM dd CROSS JOIN mx WHERE dd.peak - dd.r = mx.maxdd
  ORDER BY dd.day LIMIT 1
)
SELECT CAST(mx.n AS BIGINT) AS n_days,
       CAST(mx.maxdd AS BIGINT) AS max_drawdown_usd,
       pick.trough_day,
       CAST(pick.trough_revenue AS BIGINT) AS trough_revenue,
       CAST(pick.peak_revenue AS BIGINT) AS peak_revenue
FROM mx CROSS JOIN pick
"""


def _drawdown(spark, sf):
    daily = spark.sql(_DAILY_REVENUE).localCheckpoint(eager=True)
    daily.createOrReplaceTempView("ddown_daily")
    return spark.sql(_DRAWDOWN_TAIL.format(v="ddown_daily"))


_DRAWDOWN_DUCK = (
    "WITH dd0 AS ("
    + _DAILY_REVENUE
    + "), "
    + _DRAWDOWN_TAIL.format(v="dd0").replace("WITH ", "", 1)
)

# -- Adamic-Adar link prediction ----------------------------------------------
# Top-20 NON-edge page pairs by Adamic-Adar score sum(1/ln(deg(w)))
# over common neighbors w — the classic link-prediction index one tier
# above neighbor-Jaccard (graph_jaccard_neighbors): low-degree shared
# neighbors count for more. Candidates come from the same wedge join
# (sum(deg^2) fan-out; the degree-cap/hub-removal knob and the
# |pages|<=100 domain bound are documented at the r8 wedge entries);
# existing edges are anti-joined out. A shared neighbor has degree
# >= 2 by construction, so ln(deg) > 0 always. Per-wedge 1/ln terms
# quantize onto the 1e-9 grid — the ORDER BY runs on the exact integer
# term sum, so the top-20 cut is grid-deterministic.
_AA_TAIL = """
WITH und AS (
  SELECT a AS u, b AS v FROM {v}
  UNION ALL SELECT b AS u, a AS v FROM {v}
),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u),
wedge AS (
  SELECT n1.u AS p, n2.u AS q, n1.v AS w
  FROM und n1 JOIN und n2 ON n1.v = n2.v AND n1.u < n2.u
),
contrib AS (
  SELECT wg.p, wg.q,
         CAST(FLOOR(1e9 / LN(CAST(dw.d AS DOUBLE)) + 0.5) AS BIGINT)
           AS t
  FROM wedge wg JOIN deg dw ON wg.w = dw.u
),
aa AS (
  SELECT c.p, c.q, CAST(COUNT(*) AS BIGINT) AS cn, SUM(c.t) AS s
  FROM contrib c GROUP BY c.p, c.q
),
nonedge AS (
  SELECT aa.p, aa.q, aa.cn, aa.s
  FROM aa LEFT JOIN {v} e ON aa.p = e.a AND aa.q = e.b
  WHERE e.a IS NULL
)
SELECT p AS page_a, q AS page_b, cn AS common_neighbors,
       CAST(CAST(CAST(s AS DOUBLE) / 1e9 AS DECIMAL(18,6)) AS DOUBLE)
         AS adamic_adar
FROM nonedge
ORDER BY s DESC, page_a, page_b
LIMIT 20
"""


def _adamic_adar(spark, sf):
    """Canonical edge list built once and checkpointed (the tail
    references it four times; CTE inlining would re-scan the raw log
    per reference — the r8 graph-entry discipline)."""
    from cassandra_sql_spark.queries.r8_ops import _canonical_edges

    _canonical_edges(spark, sf, "aa_edges")
    return spark.sql(_AA_TAIL.format(v="aa_edges"))


def _aa_duck():
    from cassandra_sql_spark.queries.r8_ops import _DUCK_K, _EDGES

    return (
        "WITH "
        + _EDGES.format(k=_DUCK_K)
        + ", "
        + _AA_TAIL.format(v="edges").replace("WITH ", "", 1)
    )


# -- Kaplan-Meier conversion survival -----------------------------------------
# Censored time-to-convert: subjects are users with >= 1 click; the
# event is the first purchase AT/AFTER the first click (day-granular);
# users who never convert are right-CENSORED at their last seen event
# — the piece event_time_to_convert (which drops non-converters)
# cannot express. One event-log scan: first-click/last-seen come from
# keyed per-user windows, the risk-set and survival windows run over
# the bounded lag-day domain. S(t) = prod(1 - d/n) is carried as LOG
# survival on the 1e-9 per-term grid (exp is not correctly rounded,
# the sum of grid terms is exact); when d = n_at_risk the survival
# hits exact zero and log S is NULL from that day on.
_KM_BODY = """
WITH w AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id) AS fc,
         MAX(ts) OVER (PARTITION BY user_id) AS last_seen
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), per_user AS (
  SELECT user_id, MIN(fc) AS fc, MIN(last_seen) AS last_seen,
         MIN(CASE WHEN event_type = 'purchase' AND ts >= fc THEN ts END)
           AS cts
  FROM w GROUP BY user_id
), subjects AS (
  SELECT user_id,
         CASE WHEN cts IS NOT NULL THEN {dd_conv} ELSE {dd_cens} END
           AS t,
         CASE WHEN cts IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM per_user WHERE fc IS NOT NULL
), grid AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM subjects GROUP BY t
), km AS (
  SELECT t, d,
         SUM(c) OVER (ORDER BY t DESC) AS n_at_risk
  FROM grid
), terms AS (
  SELECT t, d, n_at_risk,
         CASE WHEN d = n_at_risk THEN CAST(NULL AS BIGINT)
              ELSE CAST(FLOOR(
                LN(1.0 - CAST(d AS DOUBLE) / n_at_risk) * 1e9 + 0.5)
                AS BIGINT) END AS q,
         CASE WHEN d = n_at_risk THEN 1 ELSE 0 END AS dies
  FROM km WHERE d > 0
), surv AS (
  SELECT t, d, n_at_risk,
         SUM(q) OVER (ORDER BY t) AS cq,
         SUM(dies) OVER (ORDER BY t) AS cd
  FROM terms
)
SELECT CAST(t AS BIGINT) AS t_days,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_conversions,
       CASE WHEN cd > 0 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(CAST(CAST(cq AS DOUBLE) / 1e9
                 AS DECIMAL(18,6)) AS DOUBLE)
       END AS log_survival
FROM surv ORDER BY t_days
"""

_KM_SPARK = _KM_BODY.format(
    dd_conv="DATEDIFF(CAST(cts AS DATE), CAST(fc AS DATE))",
    dd_cens="DATEDIFF(CAST(last_seen AS DATE), CAST(fc AS DATE))",
)
_KM_DUCK = _KM_BODY.format(
    dd_conv="(CAST(cts AS DATE) - CAST(fc AS DATE))",
    dd_cens="(CAST(last_seen AS DATE) - CAST(fc AS DATE))",
)

# -- Market-basket lift over part brands --------------------------------------
# Which part brands co-occur in orders beyond chance? lift(a,b) =
# P(ab) / (P(a) P(b)) over order baskets at BRAND granularity — the
# association-rule screen before a recommender fits anything. The
# basket table (DISTINCT order x brand) is bounded by lines-per-order
# (<= 7 in TPC-H), so the per-order pair fan-out is <= C(7,2) = 21 —
# linear in orders at any scale. The basket is checkpointed (four tail
# consumers); counts are exact, lift is one correctly-rounded double
# expression of exact integers, and the top-15 cut totals on
# (lift DESC, brand pair).
_BASKET = """
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
"""

_LIFT_TAIL = """
WITH nb AS (
  SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM {v}
), bc AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM {v} GROUP BY brand
), pairs AS (
  SELECT a.brand AS b1, b.brand AS b2, CAST(COUNT(*) AS BIGINT) AS cab
  FROM {v} a JOIN {v} b ON a.ok = b.ok AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT p.b1 AS brand_a, p.b2 AS brand_b,
       p.cab AS n_orders_both, ca.c AS n_orders_a, cb.c AS n_orders_b,
       CAST(CAST(
         CAST(p.cab AS DOUBLE) * nb.n / (ca.c * cb.c)
         AS DECIMAL(18,6)) AS DOUBLE) AS lift
FROM pairs p
JOIN bc ca ON p.b1 = ca.brand
JOIN bc cb ON p.b2 = cb.brand
CROSS JOIN nb
WHERE p.cab >= 5
ORDER BY lift DESC, brand_a, brand_b
LIMIT 15
"""


def _basket_lift(spark, sf):
    basket = spark.sql(_BASKET).localCheckpoint(eager=True)
    basket.createOrReplaceTempView("lift_basket")
    return spark.sql(_LIFT_TAIL.format(v="lift_basket"))


_LIFT_DUCK = (
    "WITH bk AS ("
    + _BASKET
    + "), "
    + _LIFT_TAIL.format(v="bk").replace("WITH ", "", 1)
)

# -- Levenshtein-verified near-duplicate pass ---------------------------------
# The edit-distance tier of the dedup cascade: block on (lang, 24-char
# prefix) — near-identical copies share it — cap blocks at 32 docs
# (the df_cutoff discipline: a prefix shared by more docs is
# boilerplate, not signal), pair within blocks, and verify with
# levenshtein over the 80-char head (bounded O(80^2) per pair; both
# engines implement classic unweighted edit distance). Output is the
# distance histogram of verified pairs at distance <= 8. The blocked
# doc table is checkpointed: the self-join reads it twice.
_EDITDIST_TAIL = """
WITH pairs AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb,
         levenshtein(a.head, b.head) AS lev
  FROM {v} a JOIN {v} b
    ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT CAST(lev AS BIGINT) AS prefix_edit_distance,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs WHERE lev <= 8
GROUP BY lev ORDER BY prefix_edit_distance
"""

_EDITDIST_BLOCKS = """
  SELECT doc_id, lang, blk, head FROM (
    SELECT doc_id, lang,
           substring(text, 1, 24) AS blk,
           substring(text, 1, 80) AS head,
           COUNT(*) OVER (PARTITION BY lang, substring(text, 1, 24))
             AS bs
    FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
  ) t WHERE bs <= 32
"""


def _editdist_dedup(spark, sf):
    blocks = spark.sql(_EDITDIST_BLOCKS).localCheckpoint(eager=True)
    blocks.createOrReplaceTempView("editdist_blocks")
    return spark.sql(_EDITDIST_TAIL.format(v="editdist_blocks"))


_EDITDIST_DUCK = (
    "WITH eb AS ("
    + _EDITDIST_BLOCKS
    + "), "
    + _EDITDIST_TAIL.format(v="eb").replace("WITH ", "", 1)
)

# -- Simplified silhouette score ----------------------------------------------
# Cluster quality of the embedding labels: per point, a = distance to
# own label centroid, b = nearest other centroid, s = (b-a)/max(a,b);
# reported as per-label means. Centroid coordinates are exact
# rationals on the 1e-6 coordinate grid (sum of grid ints / (1e6*n) —
# one correctly-rounded division), per-dim squared deviations quantize
# onto the 1e-12 grid (exact BIGINT sums, order-free), sqrt is
# IEEE-correct, per-point s snaps to 1e-9 before the mean. TWO
# embedding scans by design (centroid fit + scoring pass — the
# standard two-pass cluster-eval shape; a checkpoint of the n x d
# exploded table would cost more than the second columnar scan). The
# scoring join fans each point out to k centroids via broadcast
# (k*d rows), partial-aggregated before the one (vec, label) shuffle.
_SILHOUETTE_TAIL = """
cent AS (
  SELECT label AS clabel, pos, SUM(q) AS sq,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM expl GROUP BY label, pos
), dpairs AS (
  SELECT e.vec_id, e.label, c.clabel,
         CAST(FLOOR(
           ((CAST(e.q AS DOUBLE) * c.cnt - CAST(c.sq AS DOUBLE))
            / (1000000.0 * c.cnt))
           * ((CAST(e.q AS DOUBLE) * c.cnt - CAST(c.sq AS DOUBLE))
              / (1000000.0 * c.cnt)) * 1e12 + 0.5) AS BIGINT) AS qd
  FROM expl e JOIN cent c ON e.pos = c.pos
), d2 AS (
  SELECT vec_id, label, clabel, SUM(qd) AS dq
  FROM dpairs GROUP BY vec_id, label, clabel
), ab AS (
  SELECT vec_id, label,
         MIN(CASE WHEN clabel = label THEN dq END) AS own,
         MIN(CASE WHEN clabel <> label THEN dq END) AS other
  FROM d2 GROUP BY vec_id, label
), sil AS (
  SELECT vec_id, label,
         SQRT(CAST(own AS DOUBLE) / 1e12) AS a,
         SQRT(CAST(other AS DOUBLE) / 1e12) AS b
  FROM ab WHERE other IS NOT NULL
), sq2 AS (
  SELECT label,
         CASE WHEN GREATEST(a, b) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(FLOOR((b - a) / GREATEST(a, b) * 1e9 + 0.5)
                   AS BIGINT) END AS qs
  FROM sil
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(CAST(CAST(SUM(qs) AS DOUBLE) / 1e9 / COUNT(*)
            AS DECIMAL(18,6)) AS DOUBLE) AS mean_silhouette
FROM sq2 GROUP BY label ORDER BY label
"""

_SIL_SPARK = (
    """
WITH expl AS (
  SELECT vec_id, label, pos,
         CAST(FLOOR(CAST(col AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           AS q
  FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, col
  WHERE label IS NOT NULL
), """
    + _SILHOUETTE_TAIL
)

_SIL_DUCK = (
    """
WITH expl AS (
  SELECT vec_id, label, i - 1 AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS q
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
  WHERE label IS NOT NULL
), """
    + _SILHOUETTE_TAIL
)

QUERIES.update(
    {
        "order_revenue_gini": df_q(_gini, ("orders",), oracle=_GINI_DUCK),
        "stat_grubbs_outlier": df_q(
            _grubbs, ("events",), oracle=_GRUBBS_DUCK
        ),
        "series_max_drawdown": df_q(
            _drawdown, ("events",), oracle=_DRAWDOWN_DUCK
        ),
        "graph_adamic_adar_topk": df_q(
            _adamic_adar, ("events",), oracle=_aa_duck()
        ),
        "stat_kaplan_meier": sql_q(
            _KM_SPARK, ("events",), oracle=_KM_DUCK
        ),
        "basket_lift_brand_pairs": df_q(
            _basket_lift, ("lineitem", "part"), oracle=_LIFT_DUCK
        ),
        "dedup_edit_distance": df_q(
            _editdist_dedup, ("documents",), oracle=_EDITDIST_DUCK
        ),
        "emb_simplified_silhouette": sql_q(
            _SIL_SPARK, ("embeddings",), oracle=_SIL_DUCK
        ),
    }
)

# -- New vs returning users daily ----------------------------------------------
# The growth panel: per day, how many active users are seen for the
# FIRST time vs returning, plus the returning share. One scan: the
# first-seen day comes from a keyed per-user window (MIN(day) OVER),
# the rollup is day-domain. LAST 30 days by day order to keep the
# output bounded and the cut total-ordered.
_NEW_RETURNING_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), tagged AS (
  SELECT day, user_id,
         MIN(day) OVER (PARTITION BY user_id) AS first_day
  FROM act
)
SELECT day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users,
       CAST(CAST(
         CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END)
              AS DOUBLE) / COUNT(*)
         AS DECIMAL(18,6)) AS DOUBLE) AS returning_share
FROM tagged GROUP BY day
ORDER BY day DESC LIMIT 30
"""

# -- Repeat-purchase panel -----------------------------------------------------
# Share of customers with 2+ orders and the exact median inter-order
# gap in days — computed on the distinct-value percentile idiom
# (GROUP BY gap first: the gap domain is bounded by the order-date
# calendar, so the cumulative window input is day-domain-sized, the
# order_fulfillment_lag discipline). Customer order sequences shard
# on o_custkey.
_REPEAT_PURCHASE_BODY = """
WITH seq AS (
  SELECT o_custkey,
         {gapdays} AS gap
  FROM (
    SELECT o_custkey, o_orderdate,
           LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
             AS prev_dt
    FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  ) t WHERE prev_dt IS NOT NULL
), cust AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY o_custkey
), share AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repeat
  FROM cust
), g AS (
  SELECT gap, COUNT(*) AS c FROM seq GROUP BY gap
), r AS (
  SELECT gap, c,
         SUM(c) OVER (ORDER BY gap) AS cum,
         SUM(c) OVER () AS tot
  FROM g
), med AS (
  SELECT CAST(MIN(CASE WHEN cum * 2 >= tot THEN gap END) AS BIGINT)
           AS median_gap_days,
         CAST(MAX(tot) AS BIGINT) AS n_gaps
  FROM r
)
SELECT s.n_customers, s.n_repeat,
       CAST(CAST(CAST(s.n_repeat AS DOUBLE) / s.n_customers
            AS DECIMAL(18,6)) AS DOUBLE) AS repeat_share,
       m.median_gap_days, m.n_gaps
FROM share s CROSS JOIN med m
"""

_REPEAT_SPARK = _REPEAT_PURCHASE_BODY.format(
    gapdays="DATEDIFF(CAST(o_orderdate AS DATE), CAST(prev_dt AS DATE))"
)
_REPEAT_DUCK = _REPEAT_PURCHASE_BODY.format(
    gapdays="(CAST(o_orderdate AS DATE) - CAST(prev_dt AS DATE))"
)

# -- Diagonal-Mahalanobis embedding outliers ------------------------------------
# Vector-hygiene outlier ranking: per-dim mean and variance on the
# exact 1e-6 coordinate grid (the emb_label_centroids discipline),
# then each vector's diagonal Mahalanobis distance sum((x-mu)^2 /
# var), per-dim terms quantized onto the 1e-9 grid (exact BIGINT
# sums), top-15 by the INTEGER sum (grid-deterministic cut). Two
# embedding scans by design (moment fit + scoring — the silhouette
# note). Moment sums SUM(q*q) stay inside int64 through ~sf3000
# (coords are unit-scale, so q*q <= 3.4e11 per row); the
# zero-variance guard is MIN=MAX, never an n*s2 product. Zero-variance dims contribute 0 (a constant dim carries no
# outlier signal), mirroring the NULL-guard discipline.
_MAHALANOBIS_TAIL = """
mom AS (
  SELECT pos, CAST(COUNT(*) AS BIGINT) AS n, SUM(q) AS s1,
         SUM(q * q) AS s2, MIN(q) AS mn, MAX(q) AS mx
  FROM expl GROUP BY pos
), terms AS (
  SELECT e.vec_id,
         -- zero variance <=> all grid values equal: MIN = MAX is the
         -- exact test with NO big products (the n*s2 = s1*s1 spelling
         -- overflows int64 at sf10 row counts — caught by the sf10
         -- gate on the Spark side under ANSI mode)
         CASE WHEN m.mn = m.mx THEN CAST(0 AS BIGINT)
              ELSE CAST(FLOOR(
                ((CAST(e.q AS DOUBLE) * m.n - CAST(m.s1 AS DOUBLE))
                 / m.n)
                * ((CAST(e.q AS DOUBLE) * m.n - CAST(m.s1 AS DOUBLE))
                   / m.n)
                / (CAST(m.s2 AS DOUBLE) / m.n
                   - (CAST(m.s1 AS DOUBLE) / m.n)
                     * (CAST(m.s1 AS DOUBLE) / m.n))
                * 1e9 + 0.5) AS BIGINT) END AS t
  FROM expl e JOIN mom m ON e.pos = m.pos
), sc AS (
  SELECT vec_id, SUM(t) AS s FROM terms GROUP BY vec_id
)
SELECT vec_id,
       CAST(CAST(CAST(s AS DOUBLE) / 1e9 AS DECIMAL(18,6)) AS DOUBLE)
         AS mahalanobis_sq
FROM sc ORDER BY s DESC, vec_id LIMIT 15
"""

_MAHA_SPARK = (
    """
WITH expl AS (
  SELECT vec_id, pos,
         CAST(FLOOR(CAST(col AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           AS q
  FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, col
), """
    + _MAHALANOBIS_TAIL
)

_MAHA_DUCK = (
    """
WITH expl AS (
  SELECT vec_id, i - 1 AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS q
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
), """
    + _MAHALANOBIS_TAIL
)

# -- Exact-duplicate embedding vectors ------------------------------------------
# The vector tier of exact dedup: group by the md5 of the 1e-6-grid
# coordinate string (quantization makes float-noise twins collide;
# the grid is the same one every embedding entry quantizes on), report
# groups with 2+ members. One shuffle on the hash key — the
# dedup_exact shape lifted to vectors. The base corpus has no true
# duplicates (random vectors never collide), so the scan is UNIONed
# with a deterministic re-ingest overlay — every 37th vector appears
# again under an offset id, the double-delivery a resumed ingest job
# produces — and the operator's job is to find exactly those groups
# (a trivially-empty result would grade nothing).
_DUPVEC_BODY = """
WITH src AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000000000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 37 = 0
), keyed AS (
  SELECT vec_id, md5({key}) AS vkey
  FROM src
), grp AS (
  SELECT vkey, CAST(COUNT(*) AS BIGINT) AS n_copies,
         CAST(MIN(vec_id) AS BIGINT) AS canonical_id
  FROM keyed GROUP BY vkey
)
SELECT vkey AS vector_hash, n_copies, canonical_id
FROM grp WHERE n_copies >= 2
ORDER BY n_copies DESC, canonical_id
LIMIT 50
"""

_DUPVEC_SPARK = _DUPVEC_BODY.format(
    key="array_join(transform(embedding, x -> CAST(CAST(FLOOR("
        "CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS STRING)), ',')"
)
_DUPVEC_DUCK = _DUPVEC_BODY.format(
    key="array_to_string(list_transform(embedding, x -> CAST(CAST(FLOOR("
        "CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS VARCHAR)), ',')"
)

QUERIES.update(
    {
        "event_new_vs_returning": sql_q(_NEW_RETURNING_SQL, ("events",)),
        "order_repeat_purchase": sql_q(
            _REPEAT_SPARK, ("orders",), oracle=_REPEAT_DUCK
        ),
        "emb_mahalanobis_outliers": sql_q(
            _MAHA_SPARK, ("embeddings",), oracle=_MAHA_DUCK
        ),
        "emb_duplicate_vectors": sql_q(
            _DUPVEC_SPARK, ("embeddings",), oracle=_DUPVEC_DUCK
        ),
    }
)

# -- Friedman rank test across weekday groups -----------------------------------
# Nonparametric repeated-measures ANOVA: does revenue differ by weekday
# once week-to-week level shifts are blocked out? Each COMPLETE week is
# a block; weekday revenues rank within their block (ties get average
# ranks, carried as 2x-rank integers so everything stays exact), chi2_F
# = 12/(n k (k+1)) sum(Rj^2) - 3 n (k+1), plus the tie-corrected
# variant (the Kruskal-Wallis denominator). Day-of-week comes from
# arithmetic on the epoch-Monday day number ({dd} % 7), not from
# dayofweek() — Spark numbers Sunday=1, DuckDB Sunday=0 (the dialect
# trap series_seasonal_naive documents). Windows run over 7-row blocks
# of the day-domain table; sums are exact BIGINTs (2x-ranks <= 15 per
# cell, sr2^2 <= ~1e7 at centuries of weeks).
_FRIEDMAN_WK = """
  SELECT d, r,
         CAST(FLOOR({dd} / 7.0) AS BIGINT) AS week,
         CAST({dd} % 7 + 1 AS BIGINT) AS dow
  FROM (
    SELECT CAST(ts AS DATE) AS d,
           CAST(FLOOR(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                / 100.0 + 0.5) AS BIGINT) AS r
    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY CAST(ts AS DATE)
  ) daily
"""

_FRIEDMAN_TAIL = """
WITH wk AS (SELECT * FROM {v}), fullw AS (
  SELECT week FROM wk GROUP BY week HAVING COUNT(*) = 7
), ranked AS (
  SELECT wk.week, wk.dow,
         RANK() OVER (PARTITION BY wk.week ORDER BY wk.r) AS rk,
         COUNT(*) OVER (PARTITION BY wk.week, wk.r) AS tie
  FROM wk JOIN fullw ON wk.week = fullw.week
), r2 AS (
  -- average rank under ties, times 2: RANK + (tie-1)/2 -> 2rk + tie - 1
  SELECT week, dow, 2 * rk + tie - 1 AS r2, tie FROM ranked
), sums AS (
  SELECT dow, SUM(r2) AS sr2 FROM r2 GROUP BY dow
), nb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM fullw
), ties AS (
  -- per-block tie correction: sum(t^3 - t) over tie GROUPS (each
  -- group of t tied values contributes once — divide the per-row
  -- count by t)
  SELECT COALESCE(SUM((tie * tie * tie - tie) / tie), 0) AS tsum,
         COUNT(*) AS nr
  FROM r2 WHERE tie > 1
), stat AS (
  SELECT nb.n,
         12.0 / (nb.n * 7 * 8) * (CAST(SUM(s.sr2 * s.sr2) AS DOUBLE) / 4.0)
           - 3.0 * nb.n * 8 AS chi2,
         ties.tsum
  FROM sums s CROSS JOIN nb CROSS JOIN ties
  GROUP BY nb.n, ties.tsum
)
SELECT CAST(n AS BIGINT) AS n_weeks, CAST(7 AS BIGINT) AS k_groups,
       CAST(CAST(chi2 AS DECIMAL(18,6)) AS DOUBLE) AS friedman_chi2,
       CASE WHEN 1.0 - CAST(tsum AS DOUBLE) / (n * 7 * 48) <= 0
            THEN CAST(NULL AS DOUBLE)
            ELSE CAST(CAST(
              chi2 / (1.0 - CAST(tsum AS DOUBLE) / (n * 7 * 48))
              AS DECIMAL(18,6)) AS DOUBLE)
       END AS friedman_chi2_tie_corrected
FROM stat
"""

def _friedman(spark, sf):
    """Week-keyed day table checkpointed once: the block filter, the
    rank join, and the tie scan all re-reference it, and CTE inlining
    re-scanned the event log FIVE times in the pure-SQL form (the
    r9b scan-multiplier trap; plan-pinned to zero parquet scans)."""
    wk = spark.sql(
        _FRIEDMAN_WK.format(dd="DATEDIFF(d, DATE'1969-12-29')")
    ).localCheckpoint(eager=True)
    wk.createOrReplaceTempView("friedman_wk")
    return spark.sql(_FRIEDMAN_TAIL.format(v="friedman_wk"))


_FRIEDMAN_DUCK = (
    "WITH fw AS ("
    + _FRIEDMAN_WK.format(dd="date_diff('day', DATE '1969-12-29', d)")
    + "), "
    + _FRIEDMAN_TAIL.format(v="fw").replace("WITH ", "", 1)
)

# -- Purchase-frequency band migration ------------------------------------------
# Customer-lifecycle transition matrix: each user's purchase count in
# the FIRST half of the observed span vs the SECOND half, banded
# none/one/few(2-3)/many(4+) — fixed exact-integer band edges, so no
# quantile machinery is needed and the matrix is deterministic at any
# scale. One event scan (the span midpoint is a broadcast scalar);
# the matrix groups a 4x4 domain.
_FREQ_MIGRATION_BODY = """
WITH span AS (
  SELECT MIN({us}) AS mn, MAX({us}) AS mx FROM events e
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
), halves AS (
  -- first vs second half of the observed span by exact integer
  -- microseconds: (t - mn) * 2 < (mx - mn). Spark unix_micros and
  -- DuckDB epoch_us are both exact BIGINT epochs (unix_timestamp /
  -- epoch() truncate or fractionalize seconds and diverge)
  SELECT e.user_id,
         SUM(CASE WHEN e.event_type = 'purchase'
                  AND ({us} - s.mn) * 2 < s.mx - s.mn
             THEN 1 ELSE 0 END) AS p1,
         SUM(CASE WHEN e.event_type = 'purchase'
                  AND ({us} - s.mn) * 2 >= s.mx - s.mn
             THEN 1 ELSE 0 END) AS p2
  FROM events e CROSS JOIN span s
  WHERE e.ts IS NOT NULL AND e.user_id IS NOT NULL
  GROUP BY e.user_id
), banded AS (
  SELECT CASE WHEN p1 = 0 THEN 'none' WHEN p1 = 1 THEN 'one'
              WHEN p1 <= 3 THEN 'few' ELSE 'many' END AS band_h1,
         CASE WHEN p2 = 0 THEN 'none' WHEN p2 = 1 THEN 'one'
              WHEN p2 <= 3 THEN 'few' ELSE 'many' END AS band_h2
  FROM halves
), m AS (
  SELECT band_h1, band_h2, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM banded GROUP BY band_h1, band_h2
)
SELECT band_h1, band_h2, n_users,
       CAST(CAST(
         CAST(n_users AS DOUBLE) / SUM(n_users) OVER ()
         AS DECIMAL(18,6)) AS DOUBLE) AS share
FROM m ORDER BY band_h1, band_h2
"""

_FREQ_MIGRATION_SPARK = _FREQ_MIGRATION_BODY.format(us="unix_micros(e.ts)")
_FREQ_MIGRATION_DUCK = _FREQ_MIGRATION_BODY.format(us="epoch_us(e.ts)")

QUERIES.update(
    {
        "stat_friedman_test": df_q(
            _friedman, ("events",), oracle=_FRIEDMAN_DUCK
        ),
        "event_frequency_migration": sql_q(
            _FREQ_MIGRATION_SPARK, ("events",),
            oracle=_FREQ_MIGRATION_DUCK,
        ),
    }
)
