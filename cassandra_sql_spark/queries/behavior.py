"""Coverage batch 7 (round 6): behavioral / sequence analytics over the
events table — funnel conversion, cohort retention, ordered-sequence
pattern detection, and PageRank over the click-stream page graph.

The reference engine (kv/CalciteSqlParser.java grammar) can express none
of these shapes — they need window functions and multi-stage CTE
pipelines its executor lacks; they are the bread-and-butter of product
analytics and of link-graph quality scoring in web-corpus curation
(PageRank features gate document quality in Common-Crawl-scale
pipelines). All four are pure ANSI SQL on both engines and Catalyst
plans them as a handful of hash aggregates + one window exchange each.

Scale notes (100 TB):
- funnel: ONE scan and one user_id exchange — both running-MIN windows
  share the same partitioning+ordering, and the stage counts are
  filtered COUNT(DISTINCT)s over the windowed rows.
- retention: one scan; the cohort week is an unordered per-user window
  MIN (no join back), then one DISTINCT + one aggregate.
- sequence detection: a single window pass per user ordered by time;
  one shuffle on user_id, no self-join (the naive formulation is an
  event×event self-join — quadratic in the hot users).
- pagerank: the graph is |pages|² at most (page domain is small by
  construction); each iteration is one join + one aggregate on the
  edge list, never touching the raw event log again. Rank sums use the
  9dp scaled-integer idiom so results are order-independent and
  engine-exact (same idiom as mix_source_kl).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.queries.base import Q, df_q, sql_q

# ---------------------------------------------------------------------------
# PageRank SQL is built programmatically: same text both engines except
# the JSON field extraction. damping 0.85, 3 unrolled iterations, each
# rank quantized to 9dp (FLOOR(x*1e9+0.5) — exact on both engines for
# these magnitudes) so iteration k+1 starts from identical inputs.

_SCALE = 1000000000


def _q9(expr: str) -> str:
    """Quantize a double expression to 9dp, staying DOUBLE-typed."""
    return (
        f"CAST(CAST(FLOOR(({expr}) * {_SCALE} + 0.5) AS BIGINT) AS DOUBLE)"
        f" / {_SCALE}"
    )


def _pr_iter(prev: str, cur: str) -> str:
    """One PageRank iteration: cur = (1-d)/N + d * sum_in(prev * w)."""
    insum = (
        f"CAST(SUM(CAST(FLOOR(r.pr * w.wt * {_SCALE} + 0.5) AS BIGINT))"
        f" AS DOUBLE) / {_SCALE}"
    )
    rank = _q9("0.15 / nc.n + 0.85 * COALESCE(s.insum, 0.0)")
    return f"""{cur} AS (
  SELECT nodes.page, {rank} AS pr
  FROM nodes CROSS JOIN nc
  LEFT JOIN (
    SELECT w.dst AS page, {insum} AS insum
    FROM w JOIN {prev} r ON w.src = r.page
    GROUP BY w.dst
  ) s ON nodes.page = s.page
)"""


def _pagerank_sql(json_k: str) -> str:
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_id, {json_k} AS page
  FROM events
),
seq AS (
  SELECT page AS src,
         LEAD(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev
),
edges AS (
  SELECT src, dst, COUNT(*) AS cnt
  FROM seq WHERE src IS NOT NULL AND dst IS NOT NULL
  GROUP BY src, dst
),
outdeg AS (
  SELECT src, CAST(SUM(cnt) AS BIGINT) AS deg FROM edges GROUP BY src
),
w AS (
  SELECT e.src, e.dst, e.cnt / CAST(o.deg AS DOUBLE) AS wt
  FROM edges e JOIN outdeg o ON e.src = o.src
),
nodes AS (
  SELECT DISTINCT page FROM (
    SELECT src AS page FROM edges
    UNION SELECT dst AS page FROM edges
  ) np
),
nc AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (
  SELECT page, {_q9("1.0 / nc.n")} AS pr FROM nodes CROSS JOIN nc
),
{_pr_iter("r0", "r1")},
{_pr_iter("r1", "r2")},
{_pr_iter("r2", "r3")}
SELECT page, pr FROM r3 ORDER BY pr DESC, page
"""


_DUCK_K = (
    "CAST(CASE WHEN props IS NOT NULL AND json_valid(props)"
    " THEN JSON_EXTRACT_STRING(props, '$.k') END AS BIGINT)"
)


def _pagerank(spark, sf):
    """DataFrame PageRank: the event log is scanned ONCE to build the
    weighted edge list, which is localCheckpoint-ed (it is at most
    |pages|² rows — model-sized, not data-sized); the three rank
    iterations then join only the materialized graph. The equivalent
    pure-SQL CTE chain re-expands `edges` under Catalyst's CTE inlining
    into 22 scans of the raw log — measured here, and fatal at 100 TB.
    The oracle keeps the CTE form (DuckDB materializes CTEs).

    Math matches the oracle bit-for-bit: every per-edge term and every
    rank is quantized to 9dp via FLOOR(x*1e9+0.5) on doubles, so sums
    are order-independent and Python/JVM/DuckDB compute identical IEEE
    results."""
    ev = load(spark, sf, "events")
    page = F.get_json_object("props", "$.k").cast("bigint")
    from pyspark.sql import Window

    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        page.alias("src"), F.col("user_id"), F.col("ts"), F.col("event_id")
    ).select("src", F.lead("src").over(w_user).alias("dst"))
    edges = (
        seq.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    outdeg = edges.groupBy("src").agg(F.sum("cnt").cast("long").alias("deg"))
    wdf = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.col("cnt") / F.col("deg").cast("double")).alias("wt"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        wdf.select(F.col("src").alias("page"))
        .union(wdf.select(F.col("dst").alias("page")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    scale = float(_SCALE)

    def q9_lit(x: float) -> float:
        return math.floor(x * scale + 0.5) / scale

    def q9_col(c):
        return (
            F.floor(c * F.lit(scale) + F.lit(0.5)).cast("bigint").cast("double")
            / F.lit(scale)
        )

    ranks = nodes.select("page", F.lit(q9_lit(1.0 / n)).alias("pr"))
    teleport = 0.15 / n
    for _ in range(3):
        contrib = (
            wdf.join(ranks, wdf.src == ranks.page)
            .select(
                "dst",
                F.floor(F.col("pr") * F.col("wt") * F.lit(scale) + F.lit(0.5))
                .cast("bigint")
                .alias("_term"),
            )
            .groupBy("dst")
            .agg(
                (F.sum("_term").cast("double") / F.lit(scale)).alias("insum")
            )
        )
        ranks = nodes.join(
            contrib, nodes.page == contrib.dst, "left"
        ).select(
            "page",
            q9_col(
                F.lit(teleport)
                + F.lit(0.85) * F.coalesce(F.col("insum"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks.orderBy(F.desc("pr"), "page")


QUERIES: dict[str, Q] = {
    # Ordered conversion funnel view -> click -> purchase: each later
    # stage must happen strictly after the user's earliest prior-stage
    # event, and the whole journey must close within 30 days of the
    # first view. Single-pass formulation: two running-MIN windows over
    # the SAME (user_id, time) partitioning -- one exchange, one scan --
    # then three filtered COUNT(DISTINCT)s. (The per-stage CTE cascade
    # re-expands under Catalyst inlining into 7 scans of the log; the
    # running-min form is equivalent because a user's global first view
    # is exactly the first view preceding any qualifying later event.)
    "event_funnel": sql_q(
        """
        WITH seq AS (
          SELECT user_id, ts, event_id, event_type,
                 MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER w AS first_view
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        seq2 AS (
          SELECT user_id, ts, event_type, first_view,
                 MIN(CASE WHEN event_type = 'click'
                          AND ts > first_view THEN ts END)
                   OVER w2 AS first_click
          FROM seq
          WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT COUNT(DISTINCT CASE WHEN event_type = 'view'
                                   THEN user_id END) AS stage_view,
               COUNT(DISTINCT CASE WHEN event_type = 'click'
                                   AND ts > first_view
                                   THEN user_id END) AS stage_click,
               COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                   AND ts > first_click
                                   AND ts <= first_view + INTERVAL 30 DAY
                                   THEN user_id END) AS stage_purchase
        FROM seq2
        """,
        ("events",),
    ),
    # Weekly cohort retention: cohort = ISO week of the user's first
    # event; active_users(cohort, n) = distinct users from that cohort
    # seen again n whole weeks later. Single scan: the cohort week is an
    # unordered per-user window MIN, so no second pass over the log and
    # no join. datediff() argument order is the one dialect split.
    "event_retention_cohort": sql_q(
        """
        WITH act AS (
          SELECT DISTINCT user_id, cohort_week,
                 CAST(FLOOR(DATEDIFF(CAST(ts AS DATE), cohort_week)
                            / 7) AS BIGINT) AS week_n
          FROM (
            SELECT user_id, ts,
                   CAST(DATE_TRUNC('WEEK',
                        MIN(ts) OVER (PARTITION BY user_id)) AS DATE)
                     AS cohort_week
            FROM events
          ) f
        )
        SELECT cohort_week, week_n, COUNT(*) AS active_users
        FROM act GROUP BY cohort_week, week_n
        ORDER BY cohort_week, week_n
        """,
        ("events",),
        oracle="""
        WITH act AS (
          SELECT DISTINCT user_id, cohort_week,
                 CAST(FLOOR(DATEDIFF('day', cohort_week, CAST(ts AS DATE))
                            / 7) AS BIGINT) AS week_n
          FROM (
            SELECT user_id, ts,
                   CAST(DATE_TRUNC('WEEK',
                        MIN(ts) OVER (PARTITION BY user_id)) AS DATE)
                     AS cohort_week
            FROM events
          ) f
        )
        SELECT cohort_week, week_n, COUNT(*) AS active_users
        FROM act GROUP BY cohort_week, week_n
        ORDER BY cohort_week, week_n
        """,
    ),
    # Ordered-sequence pattern (the MATCH_RECOGNIZE shape): purchases
    # whose very next event for the same user is an error within one
    # hour. One LEAD window pass — not a self-join.
    "event_purchase_then_error": sql_q(
        """
        WITH seq AS (
          SELECT user_id, event_id, ts, event_type,
                 LEAD(event_type) OVER w AS next_type,
                 LEAD(ts) OVER w AS next_ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id, ts, next_ts
        FROM seq
        WHERE event_type = 'purchase' AND next_type = 'error'
          AND next_ts <= ts + INTERVAL 1 HOUR
        ORDER BY user_id, event_id
        """,
        ("events",),
    ),
    # SCD2 validity intervals from a change log: per-entity versions
    # with valid_from / valid_to / is_current / version — the warehouse
    # "slowly changing dimension" reconstruction. One LEAD pass per
    # entity; at 100 TB one shuffle on the entity key.
    "scd2_intervals": sql_q(
        """
        SELECT user_id, ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               LEAD(ts) OVER w IS NULL AS is_current,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
               value AS attr
        FROM events WHERE event_type = 'signup'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, version
        """,
        ("events",),
    ),
    # Top session paths: 30-minute-gap sessions, event-type trigrams in
    # session order, global top-10. The || concat propagates NULL on
    # both engines (CONCAT does not: DuckDB's skips NULLs), so
    # incomplete trigrams at session tails drop out identically.
    "event_path_trigrams": sql_q(
        """
        WITH flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL '30' MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        assigned AS (
          SELECT user_id, ts, event_id, event_type,
                 SUM(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
          FROM flagged
        ),
        tri AS (
          SELECT event_type || '>' || LEAD(event_type) OVER w2
                 || '>' || LEAD(event_type, 2) OVER w2 AS path
          FROM assigned
          WINDOW w2 AS (PARTITION BY user_id, session_no
                        ORDER BY ts, event_id)
        )
        SELECT path, COUNT(*) AS n
        FROM tri WHERE path IS NOT NULL
        GROUP BY path
        ORDER BY n DESC, path
        LIMIT 10
        """,
        ("events",),
    ),
    # PageRank (damping 0.85, 3 unrolled iterations) over the page
    # transition graph: nodes = props.k page ids, edges = consecutive
    # events of the same user, edge weight = transition count /
    # out-degree. Dangling pages keep their teleport share (no
    # redistribution) — identical simplification both engines.
    "graph_pagerank": df_q(
        _pagerank,
        ("events",),
        oracle=_pagerank_sql(_DUCK_K),
    ),
    # Triangle counting on the undirected page-transition graph (the
    # standard clustering-coefficient / community-density primitive).
    # The raw log collapses to the DISTINCT canonical edge set first
    # (a < b), so the two triangle joins shuffle |edges| rows — bounded
    # by |pages|^2 — and never re-touch the event log. At scale, order
    # edge endpoints by degree before the joins (the compact-forward
    # trick) to bound per-key fan-out; the page domain here is small
    # enough that the plain form is the right plan. TRY_CAST hardens
    # the JSON extraction against non-numeric props under ANSI mode.
    "graph_triangle_count": sql_q(
        """
        WITH pages AS (
          SELECT user_id, ts, event_id, TRY_CAST(get_json_object(props, '$.k') AS BIGINT) AS page FROM events
        ),
        hops AS (
          SELECT page AS src,
                 LEAD(page) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
          FROM pages
        ),
        edges AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM hops
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e1.b = e2.a
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        ("events",),
        oracle="""
        WITH pages AS (
          SELECT user_id, ts, event_id, TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props) THEN JSON_EXTRACT_STRING(props, '$.k') END AS BIGINT) AS page FROM events
        ),
        hops AS (
          SELECT page AS src,
                 LEAD(page) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
          FROM pages
        ),
        edges AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM hops
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e1.b = e2.a
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
    ),
}
