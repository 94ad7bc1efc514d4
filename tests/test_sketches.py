"""Count-min sketch properties (pipeline/sketches.py):

1. MERGE EXACTNESS: per-shard grids summed cell-wise == the global
   grid, exactly (counters are plain sums) — the property that makes
   the sketch a per-shard/day artifact at 100 TB.
2. ONE-SIDED ERROR: estimate >= true count for EVERY value, always
   (counters only over-count) — a hard guarantee, not probabilistic.
3. eps*N BOUND: estimate <= true + ceil(e*N/width) for the probed
   values (probabilistic over hash choice; deterministic here with the
   fixed xxhash64 row seeds and fixture data).
4. PLAN SHAPE: the estimate probe broadcasts the grid — the values
   side is never shuffled.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import sketches


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load(spark, sf_dir, "events")


def test_shard_merge_equals_global(events):
    shard = sketches.countmin_build(
        events, "user_id", shard_col="event_type"
    )
    merged = sketches.countmin_merge(shard, "event_type")
    glob = sketches.countmin_build(events, "user_id")
    diff = (
        merged.join(
            glob.withColumnRenamed("_cnt", "_g"),
            ["_row", "_col"],
            "full",
        )
        .filter(
            F.coalesce("_cnt", F.lit(-1)) != F.coalesce("_g", F.lit(-2))
        )
        .count()
    )
    assert diff == 0


def test_estimate_never_undercounts(events):
    # EVERY distinct user, not just the heavy ones
    exact = events.groupBy("user_id").count()
    grid = sketches.countmin_build(events, "user_id")
    est = sketches.countmin_estimate(grid, exact, "user_id")
    under = est.filter(F.col("est_count") < F.col("count")).count()
    assert under == 0


def test_estimate_within_eps_n(events):
    n = events.count()
    slack = math.ceil(math.e * n / sketches.DEFAULT_WIDTH)
    exact = events.groupBy("user_id").count()
    grid = sketches.countmin_build(events, "user_id")
    est = sketches.countmin_estimate(grid, exact, "user_id")
    over = est.filter(
        F.col("est_count") > F.col("count") + F.lit(slack)
    ).count()
    assert over == 0


def test_probe_broadcasts_grid(events):
    exact = events.groupBy("user_id").count()
    grid = sketches.countmin_build(events, "user_id")
    est = sketches.countmin_estimate(grid, exact, "user_id")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_grid_size_bounded(events):
    grid = sketches.countmin_build(
        events, "user_id", width=64, depth=3
    )
    assert grid.count() <= 64 * 3


def test_stream_grid_equals_batch_grid(spark, sf_dir, events):
    """The streaming count-min's drained complete-mode grid must equal
    the batch-built grid cell-for-cell (count is associative across
    micro-batches) — and its state is the grid itself, bounded by
    construction."""
    import tempfile

    from cassandra_sql_spark.streaming import events as ev

    ckpt = tempfile.mkdtemp(prefix="cm-eq-")
    stream = ev.read_events_stream(spark, sf_dir)
    grid = ev.countmin_stream(stream, "user_id")
    ev.run_available_now(grid, "cm_eq_grid", ckpt, mode="complete")
    stream_grid = spark.table("cm_eq_grid")
    batch_grid = sketches.countmin_build(events, "user_id")
    diff = (
        stream_grid.join(
            batch_grid.withColumnRenamed("_cnt", "_b"),
            ["_row", "_col"],
            "full",
        )
        .filter(
            F.coalesce("_cnt", F.lit(-1)) != F.coalesce("_b", F.lit(-2))
        )
        .count()
    )
    assert diff == 0
    assert stream_grid.count() <= 1024 * 4
