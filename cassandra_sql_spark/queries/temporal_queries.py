"""Registry entries for the temporal operators (as-of join, range join).

DuckDB has both as native joins (ASOF JOIN, inequality join) — ideal
oracles for our composition-based Spark implementations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.operators.temporal import asof_join, range_join_within
from cassandra_sql_spark.queries.base import Q, df_q


def _asof(spark, sf):
    ev = load(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("purchase_ts"),
        F.col("value_asof").alias("purchase_value"),
    )


def _range(spark, sf):
    ev = load(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id",
        F.col("ts").alias("err_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    out = range_join_within(
        errors, clicks, on="user_id", left_ts="err_ts",
        right_ts="click_ts", tolerance_seconds=600,
    )
    return out.select("err_id", "click_id", "user_id")


QUERIES: dict[str, Q] = {
    # Backward as-of join: most recent purchase at or before each click.
    "asof_join_purchases": df_q(
        _asof,
        ("events",),
        oracle="""
        WITH c AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), p AS (
          SELECT user_id, ts AS pts, value FROM events
          WHERE event_type = 'purchase'
        )
        SELECT c.event_id, c.user_id, c.ts,
               p.pts AS purchase_ts, p.value AS purchase_value
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND p.pts <= c.ts
        """,
    ),
    # Batch gap-based sessionization (30-min inactivity gap): lag ->
    # new-session flag -> running sum -> per-session rollup. The exact
    # batch complement of the rows-only streaming applyInPandasWithState
    # sessionizer; one shuffle on user_id, window + agg share it.
    # Batch complement of streaming/events.anomalies (same prior-window
    # z-score semantics, expressed as running window aggregates — the
    # cross-engine-checkable form of the stateful operator; the Welford
    # fold in the streaming path computes the identical prior-statistics
    # sequence). The z-score lands as DECIMAL(18,4) so the comparison is
    # immune to var_samp's last-ulp differences between engines; the
    # >3 cut runs on the raw value in both.
    "event_anomaly_batch": df_q(
        lambda spark, sf: (
            lambda _: spark.sql(
                """
                WITH stats AS (
                  SELECT user_id, ts, event_id, value,
                         COUNT(value) OVER wprev AS n_prev,
                         AVG(value) OVER wprev AS mean_prev,
                         VAR_SAMP(value) OVER wprev AS var_prev
                  FROM events_anom
                  WHERE value IS NOT NULL
                  WINDOW wprev AS (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                )
                SELECT user_id, ts, value,
                       CAST(CAST((value - mean_prev) / SQRT(var_prev)
                            AS DECIMAL(18,4)) AS DOUBLE) AS zscore
                FROM stats
                WHERE n_prev >= 10 AND var_prev > 0
                  AND ABS((value - mean_prev) / SQRT(var_prev)) > 3.0
                """
            )
        )(
            load(spark, sf, "events").createOrReplaceTempView("events_anom")
        ),
        ("events",),
        oracle="""
                WITH stats AS (
                  SELECT user_id, ts, event_id, value,
                         COUNT(value) OVER wprev AS n_prev,
                         AVG(value) OVER wprev AS mean_prev,
                         VAR_SAMP(value) OVER wprev AS var_prev
                  FROM events
                  WHERE value IS NOT NULL
                  WINDOW wprev AS (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                )
                SELECT user_id, ts, value,
                       CAST(CAST((value - mean_prev) / SQRT(var_prev)
                            AS DECIMAL(18,4)) AS DOUBLE) AS zscore
                FROM stats
                WHERE n_prev >= 10 AND var_prev > 0
                  AND ABS((value - mean_prev) / SQRT(var_prev)) > 3.0
        """,
    ),
    "event_sessionize_batch": df_q(
        lambda spark, sf: (
            lambda ev: spark.sql(
                """
                WITH flagged AS (
                  SELECT user_id, ts, event_id,
                         CASE WHEN LAG(ts) OVER w IS NULL
                                OR ts - LAG(ts) OVER w > INTERVAL '30' MINUTE
                              THEN 1 ELSE 0 END AS new_sess
                  FROM events_sess
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
                ), assigned AS (
                  SELECT user_id, ts,
                         SUM(new_sess) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_no
                  FROM flagged
                )
                SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
                       CAST(COUNT(*) AS BIGINT) AS n_events,
                       MIN(ts) AS session_start, MAX(ts) AS session_end
                FROM assigned
                GROUP BY user_id, session_no
                """
            )
        )(
            load(spark, sf, "events").createOrReplaceTempView("events_sess")
        ),
        ("events",),
        oracle="""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL '30' MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), assigned AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_no
          FROM flagged
        )
        SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM assigned
        GROUP BY user_id, session_no
        """,
    ),
    # Banded range join: error events within 10 minutes of a click by the
    # same user (whole-second semantics on both sides).
    "range_join_events": df_q(
        _range,
        ("events",),
        oracle="""
        SELECT a.event_id AS err_id, b.event_id AS click_id, a.user_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'error' AND b.event_type = 'click'
         AND ABS(FLOOR(epoch(a.ts)) - FLOOR(epoch(b.ts))) <= 600
        """,
    ),
    # Forward as-of join: the NEXT purchase at or after each click (the
    # "time-to-conversion" shape). Same union+window merge as backward
    # with the time axis reversed; DuckDB's ASOF picks the direction
    # from the inequality.
    "asof_join_forward": df_q(
        lambda spark, sf: (
            lambda ev: asof_join(
                ev.filter(F.col("event_type") == "click").select(
                    "event_id", "user_id", "ts"
                ),
                ev.filter(F.col("event_type") == "purchase").select(
                    "user_id", "ts", "value"
                ),
                on="user_id",
                left_ts="ts",
                right_ts="ts",
                value_cols=["value"],
                direction="forward",
            ).select(
                "event_id",
                "user_id",
                "ts",
                F.col("ts_asof").alias("next_purchase_ts"),
                F.col("value_asof").alias("next_purchase_value"),
            )
        )(load(spark, sf, "events")),
        ("events",),
        oracle="""
        WITH c AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), p AS (
          SELECT user_id, ts AS pts, value FROM events
          WHERE event_type = 'purchase'
        )
        SELECT c.event_id, c.user_id, c.ts,
               p.pts AS next_purchase_ts, p.value AS next_purchase_value
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND p.pts >= c.ts
        """,
    ),
    # Nearest-in-time as-of (pandas merge_asof direction="nearest"):
    # whichever of the backward/forward purchase is closer to the click,
    # ties backward. One shuffle on user_id, two in-partition window
    # passes; the oracle composes DuckDB's two directed ASOF joins and
    # applies the identical gap rule.
    "asof_join_nearest": df_q(
        lambda spark, sf: (
            lambda ev: asof_join(
                ev.filter(F.col("event_type") == "click").select(
                    "event_id", "user_id", "ts"
                ),
                ev.filter(F.col("event_type") == "purchase").select(
                    "user_id", "ts", "value"
                ),
                on="user_id",
                left_ts="ts",
                right_ts="ts",
                value_cols=["value"],
                direction="nearest",
            ).select(
                "event_id",
                "user_id",
                "ts",
                F.col("ts_asof").alias("near_purchase_ts"),
                F.col("value_asof").alias("near_purchase_value"),
            )
        )(load(spark, sf, "events")),
        ("events",),
        oracle="""
        WITH c AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), p AS (
          SELECT user_id, ts AS pts, value FROM events
          WHERE event_type = 'purchase'
        )
        -- chained ASOF joins keep exactly one output row per click row
        -- (a b-join-f self-join would multiply duplicate event ids)
        SELECT c.event_id, c.user_id, c.ts,
               CASE WHEN f.pts IS NULL
                         OR (b.pts IS NOT NULL
                             AND (c.ts - b.pts) <= (f.pts - c.ts))
                    THEN b.pts ELSE f.pts END AS near_purchase_ts,
               CASE WHEN f.pts IS NULL
                         OR (b.pts IS NOT NULL
                             AND (c.ts - b.pts) <= (f.pts - c.ts))
                    THEN b.value ELSE f.value END AS near_purchase_value
        FROM c
        ASOF LEFT JOIN p b ON c.user_id = b.user_id AND b.pts <= c.ts
        ASOF LEFT JOIN p f ON c.user_id = f.user_id AND f.pts >= c.ts
        """,
    ),
}
