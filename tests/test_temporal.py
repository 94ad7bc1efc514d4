"""As-of join and banded range join semantics on constructed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sql_spark.operators.temporal import asof_join, range_join_within


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_asof_backward_with_ties_and_missing(spark):
    left = _ts(
        spark,
        [
            (1, 7, "2024-01-01 10:00:00"),   # after p@09:00 -> 100
            (2, 7, "2024-01-01 12:00:00"),   # tie with p@12:00 -> 200
            (3, 7, "2024-01-01 08:00:00"),   # before any purchase -> NULL
            (4, 8, "2024-01-01 10:00:00"),   # other key, no purchases -> NULL
        ],
        "event_id long, user_id long, ts string",
    )
    right = _ts(
        spark,
        [
            (7, "2024-01-01 09:00:00", 100.0),
            (7, "2024-01-01 12:00:00", 200.0),
        ],
        "user_id long, ts string, value double",
    )
    out = {
        r.event_id: (r.value_asof)
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["value"]
        ).collect()
    }
    assert out == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_range_join_within_tolerance(spark):
    left = _ts(
        spark,
        [(1, 7, "2024-01-01 10:00:00"), (2, 7, "2024-01-01 23:00:00")],
        "err_id long, user_id long, ts string",
    ).withColumnRenamed("ts", "err_ts")
    right = _ts(
        spark,
        [
            (10, 7, "2024-01-01 10:04:59"),  # within 5 min of err 1
            (11, 7, "2024-01-01 10:05:01"),  # just outside
            (12, 9, "2024-01-01 10:00:00"),  # wrong key
        ],
        "click_id long, user_id long, ts string",
    ).withColumnRenamed("ts", "click_ts")
    out = {
        (r.err_id, r.click_id)
        for r in range_join_within(
            left, right, "user_id", "err_ts", "click_ts", 300
        ).collect()
    }
    assert out == {(1, 10)}


def test_range_join_bin_boundary(spark):
    # pair straddling a bin boundary must still be found (the ±1 explode)
    left = _ts(
        spark, [(1, 5, "2024-01-01 10:09:59")],
        "err_id long, user_id long, ts string",
    ).withColumnRenamed("ts", "err_ts")
    right = _ts(
        spark, [(20, 5, "2024-01-01 10:10:01")],
        "click_id long, user_id long, ts string",
    ).withColumnRenamed("ts", "click_ts")
    out = range_join_within(
        left, right, "user_id", "err_ts", "click_ts", 600
    ).collect()
    assert len(out) == 1


def test_asof_forward_with_ties_and_missing(spark):
    left = _ts(
        spark,
        [
            (1, 7, "2024-01-01 10:00:00"),   # next purchase @12:00 -> 200
            (2, 7, "2024-01-01 12:00:00"),   # tie with p@12:00 -> 200
            (3, 7, "2024-01-01 13:00:00"),   # after the last purchase -> NULL
            (4, 8, "2024-01-01 10:00:00"),   # other key, no purchases -> NULL
            (5, 7, "2024-01-01 08:00:00"),   # earliest following is @09:00
        ],
        "event_id long, user_id long, ts string",
    )
    right = _ts(
        spark,
        [
            (7, "2024-01-01 09:00:00", 100.0),
            (7, "2024-01-01 12:00:00", 200.0),
        ],
        "user_id long, ts string, value double",
    )
    out = {
        r.event_id: (r.value_asof)
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["value"],
            direction="forward",
        ).collect()
    }
    assert out == {1: 200.0, 2: 200.0, 3: None, 4: None, 5: 100.0}
