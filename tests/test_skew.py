"""Salted-join semantics: result equality with the plain join, left-outer
null padding, and rejection of outer modes that would duplicate rows."""

from __future__ import annotations

import pytest

from cassandra_sql_spark.io import load
from cassandra_sql_spark.operators import skew


def _norm(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_inner_equals_plain(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    )
    salted = skew.salted_equi_join(
        orders, customer, [("o_custkey", "c_custkey")], salt=4
    )
    cols = ["o_orderkey", "c_custkey", "c_name"]
    assert _norm(salted, cols) == _norm(plain, cols)


def test_salted_left_keeps_unmatched_once(spark, sf_dir):
    customer = load(spark, sf_dir, "customer")
    # restrict orders so some customers have no match
    orders = load(spark, sf_dir, "orders").filter("o_totalprice > 300000")
    plain = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    )
    salted = skew.salted_equi_join(
        customer, orders, [("c_custkey", "o_custkey")], salt=4, how="left"
    )
    cols = ["c_custkey", "o_orderkey"]
    assert _norm(salted, cols) == _norm(plain, cols)


def test_salted_rejects_right_and_full(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            skew.salted_equi_join(
                orders, customer, [("o_custkey", "c_custkey")], how=how
            )


def test_salt_distributes_hot_key(spark, sf_dir):
    """All rows of one key must spread across multiple salt values."""
    from pyspark.sql import functions as F

    orders = load(spark, sf_dir, "orders")
    hot = orders.limit(1).collect()[0]["o_custkey"]
    one_key = orders.filter(F.col("o_custkey") == hot)
    if one_key.count() < 4:
        pytest.skip("fixture key too rare")
    salted = one_key.withColumn(
        skew.SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in one_key.columns]), F.lit(8)),
    )
    n_salts = salted.select(skew.SALT_COL).distinct().count()
    assert n_salts >= 2
