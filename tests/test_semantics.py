"""Pinned semantics decisions (SURVEY §7.3 "Genuinely hard: semantics
pinning") — the PostgreSQL-vs-Spark divergences we resolved, asserted so a
behavior change in a future Spark upgrade is caught.

Deliberately NOT replicated from the reference (documented hazards):
- 1000-row default SELECT limit / 100k ORDER BY scan cap
  (reference kv/KvQueryExecutor.java:1010-1015) — silent wrong results.
- DECIMAL stored as int-or-double (reference kv/ValueEncoder.java:176-191)
  — we keep real DecimalType.
- MIN/MAX numeric-only coercion (reference kv/KvQueryExecutor.java:3782)
  — ours are type-generic.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_integer_division_yields_double(spark):
    # Spark (like DuckDB, unlike PostgreSQL): int / int -> double.
    r = spark.sql("SELECT 7 / 2 AS q, 7 DIV 2 AS d").collect()[0]
    assert r.q == 3.5 and r.d == 3


def test_cast_double_to_int_truncates(spark):
    # Spark truncates toward zero (PostgreSQL/DuckDB round) — pinned:
    # our oracle SQL wraps with TRUNC to match.
    r = spark.sql(
        "SELECT CAST(2.7 AS BIGINT) AS a, CAST(-2.7 AS BIGINT) AS b"
    ).collect()[0]
    assert (r.a, r.b) == (2, -2)


def test_null_sort_order_defaults(spark):
    # Spark: NULLS FIRST on ASC, NULLS LAST on DESC (PostgreSQL default is
    # the opposite on ASC). Order-insensitive hashing makes this moot for
    # the gate; pinned here for documentation.
    df = spark.createDataFrame([(1,), (None,), (2,)], "v int")
    asc = [r.v for r in df.orderBy(F.col("v").asc()).collect()]
    desc = [r.v for r in df.orderBy(F.col("v").desc()).collect()]
    assert asc == [None, 1, 2]
    assert desc == [2, 1, None]


def test_sum_of_ints_is_long_no_overflow_wrap(spark):
    r = spark.sql(
        "SELECT SUM(x) AS s FROM VALUES (2147483647), (1) AS t(x)"
    ).collect()[0]
    assert r.s == 2147483648


def test_string_min_max_type_generic(spark):
    # Exceeds the reference: MIN/MAX work on strings.
    r = spark.sql(
        "SELECT MIN(s) AS lo, MAX(s) AS hi FROM VALUES ('b'),('a'),('c') t(s)"
    ).collect()[0]
    assert (r.lo, r.hi) == ("a", "c")


def test_count_distinct_supported(spark):
    # Absent in the reference (AggregateFunction.java:8-14 has no DISTINCT
    # flag); first-class here.
    r = spark.sql(
        "SELECT COUNT(DISTINCT x) AS n FROM VALUES (1),(1),(2) t(x)"
    ).collect()[0]
    assert r.n == 2


def test_like_is_case_sensitive_ilike_not(spark):
    r = spark.sql(
        "SELECT 'Abc' LIKE 'a%' AS l, 'Abc' ILIKE 'a%' AS il"
    ).collect()[0]
    assert (r.l, r.il) == (False, True)


def test_division_by_zero_returns_null_non_ansi(spark):
    # Pinned: with ANSI off (our session default), x/0 -> NULL. The
    # reference errors (kv/CalciteSqlParser.java:626-652 div-by-zero);
    # DuckDB x/0 -> NULL as well, so the gate is consistent.
    assert spark.conf.get("spark.sql.ansi.enabled") in ("false", "true")
    mode = spark.conf.get("spark.sql.ansi.enabled")
    if mode == "false":
        r = spark.sql("SELECT 1 / 0 AS q").collect()[0]
        assert r.q is None


def test_limit_zero_valid(spark):
    assert spark.sql("SELECT 1 LIMIT 0").count() == 0


def test_hll_shard_union_merge_error_bounded(spark, sf_dir):
    """The 100 TB sketch contract: unioning per-source HLL sketches
    estimates the corpus-wide distinct count as well as one global
    sketch pass — so per-shard sketch persistence replaces corpus
    rescans for distinct statistics. DataSketches' union goes through a
    composite estimator, so the merged estimate is NOT bit-identical to
    the direct sketch (measured 503 vs 496 on 500 exact at sf0.01);
    both must sit inside the HLL error envelope of the exact count."""
    from cassandra_sql_spark.io import register

    register(spark, sf_dir, "documents")
    merged = spark.sql(
        """SELECT hll_sketch_estimate(hll_union_agg(s)) AS nd FROM (
             SELECT source, hll_sketch_agg(text) AS s
             FROM documents GROUP BY source)"""
    ).first()["nd"]
    direct = spark.sql(
        "SELECT hll_sketch_estimate(hll_sketch_agg(text)) AS nd "
        "FROM documents"
    ).first()["nd"]
    exact = spark.sql(
        "SELECT COUNT(DISTINCT text) AS n FROM documents"
    ).first()["n"]
    assert abs(merged - exact) / exact < 0.05, (merged, exact)
    assert abs(direct - exact) / exact < 0.05, (direct, exact)
