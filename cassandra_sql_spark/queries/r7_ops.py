"""Round-7 operator entries.

- expr_interval_arith: end-to-end arithmetic on STORED DayTimeIntervalType
  columns (timestamp difference -> interval column -> compare / ts +- it /
  reduce), pinning the typed-interval semantics introduced when INTERVAL
  columns moved off strings (the reference stores intervals as ISO strings
  and cannot compute with them, kv/TableMetadata.java:348-349).
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, sql_q

QUERIES: dict[str, Q] = {
    # Typed-interval arithmetic on a STORED interval column: ts - LAG(ts)
    # materializes a DayTimeIntervalType column, then the query compares
    # it against an INTERVAL literal, adds/subtracts it back onto
    # timestamps, and reduces it per group. Boundary stays scalar:
    # Spark CAST(interval AS BIGINT) yields whole seconds, matching
    # DuckDB FLOOR(epoch(gap)) (gaps are non-negative by the LAG order,
    # so truncation == floor).
    "expr_interval_arith": sql_q(
        """
        WITH g AS (
          SELECT user_id, event_id, ts,
                 ts - LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS gap
          FROM events WHERE ts IS NOT NULL
        )
        SELECT user_id,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(COUNT_IF(gap > INTERVAL 1 HOUR) AS BIGINT)
                 AS n_long_gaps,
               CAST(SUM(CAST(gap AS BIGINT)) AS BIGINT) AS total_gap_s,
               CAST(MAX(ts + gap) AS TIMESTAMP) AS latest_due,
               CAST(MIN(ts - gap) AS TIMESTAMP) AS earliest_back
        FROM g
        GROUP BY user_id
        ORDER BY user_id
        LIMIT 200
        """,
        ("events",),
        oracle="""
        WITH g AS (
          SELECT user_id, event_id, ts,
                 ts - LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS gap
          FROM events WHERE ts IS NOT NULL
        )
        SELECT user_id,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(COUNT(*) FILTER (gap > INTERVAL 1 HOUR) AS BIGINT)
                 AS n_long_gaps,
               CAST(SUM(CAST(FLOOR(epoch(gap)) AS BIGINT)) AS BIGINT)
                 AS total_gap_s,
               MAX(ts + gap) AS latest_due,
               MIN(ts - gap) AS earliest_back
        FROM g
        GROUP BY user_id
        ORDER BY user_id
        LIMIT 200
        """,
    ),
}
