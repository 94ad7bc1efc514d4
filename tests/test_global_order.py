"""operators.global_order: the sharded global-rank / running-sum
primitives must be VALUE-IDENTICAL to the single-partition window form
(exceptAll both ways), and the plans they produce must contain no
unpartitioned window over unbounded input — the r10 verdict's Gini
finding, fixed at the operator level."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.operators.global_order import (
    sharded_cumsum,
    sharded_rank,
)
from cassandra_sql_spark.queries import REGISTRY

_SF1 = ".scale/sf1"


def _tokens(spark, sf_dir):
    from cassandra_sql_spark.pipeline import text

    return load(spark, sf_dir, "documents").select(
        "doc_id", text.token_count(F.col("text")).alias("n_tokens")
    )


def _identical(a, b):
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_sharded_rank_equals_global_window(spark, sf_dir):
    base = _tokens(spark, sf_dir)
    got = sharded_rank(base, ["doc_id"], rank_col="i")
    want = base.withColumn(
        "i", F.row_number().over(Window.orderBy("doc_id")).cast("long")
    )
    _identical(got, want)


def test_sharded_cumsum_equals_global_window(spark, sf_dir):
    base = _tokens(spark, sf_dir)
    got = sharded_cumsum(base, ["doc_id"], "n_tokens", out_col="cum")
    want = base.withColumn(
        "cum",
        F.sum("n_tokens")
        .over(
            Window.orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long"),
    )
    _identical(got, want)


def test_sharded_rank_desc_and_multi_column(spark, sf_dir):
    """dsir-style ordering: DESC weight with an id tiebreak."""
    base = _tokens(spark, sf_dir)
    order = [F.col("n_tokens").desc(), F.col("doc_id")]
    got = sharded_rank(base, order, rank_col="i")
    want = base.withColumn(
        "i", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    _identical(got, want)


def test_sharded_rank_empty_input(spark, sf_dir):
    base = _tokens(spark, sf_dir).filter(F.lit(False))
    assert sharded_rank(base, ["doc_id"]).count() == 0


@pytest.mark.slow
def test_sharded_identity_at_sf1(spark):
    """The VERDICT's A/B bar: exceptAll identity at a second SF, where
    the range partitioner actually produces many populated shards."""
    if not os.path.isdir(_SF1):
        pytest.skip("run scripts/make_sf1.py first")
    base = _tokens(spark, _SF1)
    got = sharded_cumsum(base, ["doc_id"], "n_tokens", out_col="cum")
    want = base.withColumn(
        "cum",
        F.sum("n_tokens")
        .over(
            Window.orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long"),
    )
    _identical(got, want)


@pytest.mark.parametrize("name", ["order_revenue_gini", "pack_token_budget"])
def test_switched_entries_have_no_single_partition_sort(spark, sf_dir, name):
    """The two entries switched onto global_order must show neither a
    SinglePartition exchange nor an unpartitioned window anywhere in
    their executed plan."""
    from tests.test_plans import _unbounded_unpartitioned_windows

    df = REGISTRY[name].fn(spark, sf_dir)
    assert _unbounded_unpartitioned_windows(df) == 0
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange SinglePartition" not in plan, plan
