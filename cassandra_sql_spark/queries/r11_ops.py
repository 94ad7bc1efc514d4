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
from cassandra_sql_spark.queries.base import Q, df_q, sql_q  # noqa: F401

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


# -- User-activity Gini ---------------------------------------------------------
# Inequality of engagement: the Lorenz/Gini panel (order_revenue_gini's
# exact 1e-15 term grid) applied to per-user EVENT COUNTS — the
# "how concentrated is our traffic" panel next to event_stickiness.
# Counts are exact BIGINTs (no cent grid needed); the rank runs through
# operators.global_order.sharded_rank (third entry family on the
# primitive), so there is no single-reducer sort over the user rollup
# (~1e9 users at the 100 TB point). The DuckDB oracle keeps the plain
# global window — the sharded form must match it exactly.
_ACT_GINI_ROLLUP = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id
"""

_ACT_GINI_TAIL = """
WITH s AS (
  SELECT COUNT(*) AS n, SUM(c) AS s1 FROM {v}
), r AS (
  {ranked}
), t AS (
  SELECT CAST(FLOOR(
           (CAST(r.i AS DOUBLE) / s.n)
           * (CAST(r.c AS DOUBLE) / CAST(s.s1 AS DOUBLE))
           * 1e15 + 0.5) AS BIGINT) AS q
  FROM r CROSS JOIN s
), lz AS (
  SELECT SUM(q) AS sq FROM t
)
SELECT CAST(s.n AS BIGINT) AS n_users,
       CAST(s.s1 AS BIGINT) AS n_events,
       CAST(CAST(
         2.0 * (CAST(lz.sq AS DOUBLE) / 1e15) - (s.n + 1.0) / s.n
         AS DECIMAL(18,9)) AS DOUBLE) AS gini
FROM s CROSS JOIN lz
"""


def _activity_gini(spark, sf):
    # df_q registers the events view before this runs
    from cassandra_sql_spark.operators.global_order import sharded_rank

    cust = spark.sql(_ACT_GINI_ROLLUP).localCheckpoint(eager=True)
    ranked = sharded_rank(cust, ["c", "user_id"], rank_col="i")
    ranked.createOrReplaceTempView("act_gini_ranked")
    cust.createOrReplaceTempView("act_gini_users")
    return spark.sql(_ACT_GINI_TAIL.format(
        v="act_gini_users", ranked="SELECT c, i FROM act_gini_ranked"
    ))


_ACT_GINI_DUCK = (
    "WITH u AS ("
    + _ACT_GINI_ROLLUP
    + "), "
    + _ACT_GINI_TAIL.format(
        v="u",
        ranked="SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) AS i FROM u",
    ).replace("WITH ", "", 1)
)

QUERIES["event_activity_gini"] = df_q(
    _activity_gini, ("events",), oracle=_ACT_GINI_DUCK
)


# -- Page's trend test across weekdays ------------------------------------------
# The ORDERED-alternative companion to stat_friedman_test: Friedman asks
# "does weekday matter at all?", Page's L asks "does revenue trend
# MONOTONICALLY across the week (Mon < Tue < ... < Sun)?" — strictly
# more powerful when the alternative is ordered. Reuses Friedman's
# checkpointed complete-week rank table verbatim (same 2x-rank exact
# integers, same epoch-Monday weekday arithmetic — r10_ops._FRIEDMAN_WK);
# L = sum_j j * R_j lands on the exact 0.5 grid (sum of dow * 2x-rank,
# halved once), and the normal approximation z = (L - n*k*(k+1)^2/4) /
# sqrt(n * k^2(k-1)(k+1)^2 / 144) keeps the radicand exact-integer
# (n * 18816 / 144 for k=7) with one sqrt + DECIMAL snap at the
# boundary. z is the NO-TIE permutation null (ties shift the variance
# slightly; L and the rank sums themselves are exact under average
# ranks — the same documentation honesty as the KW tie note).
_PAGE_TAIL = """
WITH wk AS (SELECT * FROM {v}), fullw AS (
  SELECT week FROM wk GROUP BY week HAVING COUNT(*) = 7
), ranked AS (
  SELECT wk.week, wk.dow,
         RANK() OVER (PARTITION BY wk.week ORDER BY wk.r) AS rk,
         COUNT(*) OVER (PARTITION BY wk.week, wk.r) AS tie
  FROM wk JOIN fullw ON wk.week = fullw.week
), r2 AS (
  SELECT week, dow, 2 * rk + tie - 1 AS r2 FROM ranked
), sums AS (
  SELECT dow, SUM(r2) AS sr2 FROM r2 GROUP BY dow
), nb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM fullw
), stat AS (
  SELECT nb.n,
         CAST(SUM(s.dow * s.sr2) AS DOUBLE) / 2.0 AS l
  FROM sums s CROSS JOIN nb GROUP BY nb.n
)
SELECT CAST(n AS BIGINT) AS n_weeks,
       CAST(7 AS BIGINT) AS k_groups,
       CAST(l AS DOUBLE) AS page_l,
       CAST(CAST(
         (l - 112.0 * n) / SQRT(CAST(n * 18816 AS DOUBLE) / 144.0)
         AS DECIMAL(18,6)) AS DOUBLE) AS page_z
FROM stat
"""


def _page_trend(spark, sf):
    from cassandra_sql_spark.queries.r10_ops import _FRIEDMAN_WK

    wk = spark.sql(
        _FRIEDMAN_WK.format(dd="DATEDIFF(d, DATE'1969-12-29')")
    ).localCheckpoint(eager=True)
    wk.createOrReplaceTempView("page_wk")
    return spark.sql(_PAGE_TAIL.format(v="page_wk"))


def _page_duck():
    from cassandra_sql_spark.queries.r10_ops import _FRIEDMAN_WK

    return (
        "WITH pw AS ("
        + _FRIEDMAN_WK.format(dd="date_diff('day', DATE '1969-12-29', d)")
        + "), "
        + _PAGE_TAIL.format(v="pw").replace("WITH ", "", 1)
    )


QUERIES["stat_page_trend"] = df_q(
    _page_trend, ("events",), oracle=_page_duck()
)

# -- Ping-pong transition rate ----------------------------------------------------
# Session path quality: the share of A->B->A bounces among all length-3
# event windows per user — the oscillation signature bot filters and
# UI-loop audits key on (a training-data pipeline drops high-pingpong
# sessions the way it drops high-repetition text). Two LEADs over the
# per-user (ts, event_id) order (keyed window: shards by user), a 4x4-
# bounded pair rollup, total-ordered top cut. NULL ts/user/type rows
# identify no transition and are excluded (the NULL-ordering trap).
_PINGPONG_ROLLUP = """
WITH seq AS (
  SELECT event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS b,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS c
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND event_type IS NOT NULL
)
SELECT a, b, CASE WHEN a = c AND a != b THEN 1 ELSE 0 END AS pp,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE c IS NOT NULL
GROUP BY a, b, CASE WHEN a = c AND a != b THEN 1 ELSE 0 END
"""

_PINGPONG_TAIL = """
WITH g AS (SELECT * FROM {v}), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_triples FROM g
)
SELECT g.a, g.b, g.n AS n_pingpong,
       CAST(CAST(
         CAST(g.n AS DOUBLE) / tot.n_triples
         AS DECIMAL(18,9)) AS DOUBLE) AS share_of_all_triples
FROM g CROSS JOIN tot
WHERE g.pp = 1
ORDER BY n_pingpong DESC, g.a, g.b
LIMIT 10
"""


def _pingpong(spark, sf):
    """The (a, b, pp) rollup is bounded by |event types|^2 x 2 and is
    referenced twice (total + pair cut) — checkpointed so CTE inlining
    cannot re-scan the event log (the r9b scan-multiplier trap; one
    parquet scan, pinned)."""
    g = spark.sql(_PINGPONG_ROLLUP).localCheckpoint(eager=True)
    g.createOrReplaceTempView("pingpong_g")
    return spark.sql(_PINGPONG_TAIL.format(v="pingpong_g"))


_PINGPONG_DUCK = (
    "WITH pg AS ("
    + _PINGPONG_ROLLUP
    + "), "
    + _PINGPONG_TAIL.format(v="pg").replace("WITH ", "", 1)
)

QUERIES["event_pingpong_rate"] = df_q(
    _pingpong, ("events",), oracle=_PINGPONG_DUCK
)


# -- REAL codec #8: animated GIF frame sampling ----------------------------------
# The temporal-container entry: decode a real multi-frame GIF89a
# (NETSCAPE loop extension, per-frame Graphic Control delays,
# mid-stream comment extensions on ids % 3 == 0), stride-sample frames
# 0,2,4,..., and report frame-position-weighted channel means + the
# container metadata. Everything is closed-form in (doc_id, frame):
# the oracle replays frame selection, palette mapping, and the delay
# walk symbolically. A decoder that ignores the GCE blocks gets
# total_delay_cs wrong; one that mis-orders or drops frames gets the
# weighted sums wrong; one that misses the loop extension gets
# loop_count wrong.
_GIF_ANIM_ORACLE = """
WITH d AS (
  SELECT doc_id FROM documents WHERE doc_id < 200
), fr AS (
  SELECT doc_id, f
  FROM d, UNNEST(generate_series(0, 5)) AS t(f)
  WHERE f < 2 + doc_id % 4
), samp AS (
  SELECT doc_id, f // 2 AS si, (doc_id * 3 + 5 * f) % 8 AS k
  FROM fr WHERE f % 2 = 0
), agg AS (
  SELECT doc_id,
         CAST(SUM(((doc_id * 7 + 11 * k) % 256) * (si + 1)) AS BIGINT)
           AS wsum_r,
         CAST(SUM(((doc_id * 19 + 5 * k) % 251) * (si + 1)) AS BIGINT)
           AS wsum_g,
         CAST(SUM(((doc_id * 23 + 13 * k) % 247) * (si + 1)) AS BIGINT)
           AS wsum_b,
         CAST(COUNT(*) AS BIGINT) AS n_sampled
  FROM samp GROUP BY doc_id
), del AS (
  SELECT doc_id,
         CAST(SUM(4 + (doc_id + f) % 7) AS BIGINT) AS total_delay_cs,
         CAST(COUNT(*) AS BIGINT) AS n_frames
  FROM fr GROUP BY doc_id
)
SELECT a.doc_id, del.n_frames, a.n_sampled, del.total_delay_cs,
       CAST(a.doc_id % 3 AS BIGINT) AS loop_count,
       a.wsum_r, a.wsum_g, a.wsum_b
FROM agg a JOIN del ON a.doc_id = del.doc_id
"""

QUERIES["gif_animated_frame_sample"] = df_q(
    lambda spark, sf: multimodal.sample_frames_gif(
        multimodal.synth_gif_animated_payload(
            load(spark, sf, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") < 200)
        ),
        stride=2,
    ),
    ("documents",),
    oracle=_GIF_ANIM_ORACLE,
)


# -- Cosine-similarity histogram over adjacent pairs ------------------------------
# Embedding-health diagnostic: the distribution of pairwise cosines is
# the standard representation-collapse signal (healthy random-ish
# embeddings concentrate near 0; a collapsed encoder pushes mass toward
# 1). Pairing is deterministic (vec i with vec i+1 — id-adjacent, no
# sampling machinery) so the histogram is exact and oracle-replayable:
# coordinates quantize to the repo's 1e-6 grid, dot products and norms
# are exact BIGINT sums (|q|<=2^20ish, 64 dims — far inside int64), the
# cosine is the identical IEEE expression on both engines (two
# correctly-rounded sqrts — the audio-RMS discipline), and bins are
# 0.1-wide on [-1, 1] (bin edges are far from any accumulated-error
# scale). sqrt rounding can push |c| a few ulps past 1, so the bin is
# clamped on BOTH ends (GREATEST(LEAST(.,19),0)) to keep the output
# inside the documented [-1,1] bin domain (r11 ADVICE: the top end
# alone left bin=-1/bin_lo=-1.1 reachable). One explode + one pos-equijoin shuffle; output is a bounded
# <=20-row histogram. Zero-norm vectors carry no direction and are
# excluded by the NULL guard.
_COS_HIST_TAIL = """
pairs AS (
  SELECT a.vec_id AS ia,
         CAST(SUM(a.q * b.q) AS BIGINT) AS d,
         CAST(SUM(a.q * a.q) AS BIGINT) AS na,
         CAST(SUM(b.q * b.q) AS BIGINT) AS nb
  FROM expl a JOIN expl b
    ON b.vec_id = a.vec_id + 1 AND b.pos = a.pos
  GROUP BY a.vec_id
), cosv AS (
  SELECT CASE WHEN na = 0 OR nb = 0 THEN CAST(NULL AS DOUBLE)
              ELSE CAST(d AS DOUBLE)
                   / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE)))
         END AS c
  FROM pairs
), binned AS (
  SELECT GREATEST(LEAST(CAST(FLOOR((c + 1.0) * 10) AS BIGINT), 19), 0) AS bin
  FROM cosv WHERE c IS NOT NULL
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM binned
)
SELECT b.bin,
       CAST(-1.0 + b.bin * 0.1 AS DOUBLE) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(
         CAST(COUNT(*) AS DOUBLE) / tot.n_pairs
         AS DECIMAL(18,9)) AS DOUBLE) AS share
FROM binned b CROSS JOIN tot
GROUP BY b.bin, tot.n_pairs
ORDER BY b.bin
"""

_COS_HIST_SPARK = (
    """
WITH expl AS (
  SELECT vec_id, pos,
         CAST(FLOOR(CAST(col AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           AS q
  FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, col
), """
    + _COS_HIST_TAIL
)

_COS_HIST_DUCK = (
    """
WITH expl AS (
  SELECT vec_id, i - 1 AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS q
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
), """
    + _COS_HIST_TAIL
)

QUERIES["emb_cosine_pair_histogram"] = sql_q(
    _COS_HIST_SPARK, ("embeddings",), oracle=_COS_HIST_DUCK
)
