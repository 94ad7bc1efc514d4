"""Registry entries for Structured Streaming operators.

The windowed aggregation drains the file stream with Trigger.AvailableNow
and returns the sink contents — which must equal the batch GROUP BY
date_trunc('hour') the DuckDB oracle runs. Sessionization is stateful with
no SQL equivalent: rows-only (semantics pinned in tests/test_streaming.py).
"""

from __future__ import annotations

import tempfile

from cassandra_sql_spark.queries.base import Q
from cassandra_sql_spark.streaming import events as ev


def _windowed(spark, sf_dir):
    ckpt = tempfile.mkdtemp(prefix="spark-graft-stream-")
    return ev.streaming_event_window_counts(spark, sf_dir, ckpt)


def _sessions(spark, sf_dir):
    ckpt = tempfile.mkdtemp(prefix="spark-graft-sess-")
    stream = ev.read_events_stream(spark, sf_dir)
    sess = ev.sessionize(stream, gap_minutes=30, watermark="1 minute")
    ev.run_available_now(sess, "sessions_q", ckpt, mode="append")
    return spark.table("sessions_q")


QUERIES: dict[str, Q] = {
    "stream_window_agg": Q(
        _windowed,
        """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
                 AS sum_value
        FROM events
        GROUP BY 1, 2
        """,
    ),
    "stream_sessionize": Q(_sessions, None),
}
