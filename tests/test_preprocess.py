"""Unit tests for the pg-ism SQL preprocessor (no Spark needed)."""

from __future__ import annotations

from cassandra_sql_spark.sqlfront.preprocess import map_pg_type, preprocess


def test_cast_operator():
    assert preprocess("SELECT x::INT FROM t") == "SELECT CAST(x AS INT) FROM t"
    assert (
        preprocess("SELECT '1.5'::NUMERIC(5,2)")
        == "SELECT CAST('1.5' AS DECIMAL(5,2))"
    )
    assert (
        preprocess("SELECT (a + b)::DOUBLE PRECISION FROM t")
        == "SELECT CAST((a + b) AS DOUBLE) FROM t"
    )
    # chained casts resolve innermost-first
    assert (
        preprocess("SELECT x::TEXT::INT FROM t")
        == "SELECT CAST(CAST(x AS STRING) AS INT) FROM t"
    )


def test_json_arrows():
    assert (
        preprocess("SELECT j->>'k' FROM t")
        == "SELECT get_json_object(j, '$.k') FROM t"
    )
    assert (
        preprocess("SELECT j->'a'->>'b' FROM t")
        == "SELECT get_json_object(get_json_object(j, '$.a'), '$.b') FROM t"
    )
    assert (
        preprocess("SELECT j#>>'{a,b}' FROM t")
        == "SELECT get_json_object(j, '$.a.b') FROM t"
    )
    assert (
        preprocess("SELECT j->0 FROM t")
        == "SELECT get_json_object(j, '$[0]') FROM t"
    )


def test_regex_match():
    assert preprocess("WHERE a ~ '^x'") == "WHERE a RLIKE '^x'"
    assert preprocess("WHERE a !~ '^x'") == "WHERE a NOT RLIKE '^x'"


def test_function_aliases():
    assert "instr(" in preprocess("SELECT strpos(s, 'a')")
    assert "ceil(" in preprocess("SELECT ceiling(x)")
    assert "json_array_length(" in preprocess("SELECT jsonb_array_length(j)")
    assert "pg_to_char(" in preprocess("SELECT to_char(ts, 'YYYY')")
    assert "current_timestamp()" in preprocess("SELECT now()")


def test_type_mapping():
    assert map_pg_type("TEXT") == "STRING"
    assert map_pg_type("varchar(10)") == "STRING"
    assert map_pg_type("NUMERIC(10,2)") == "DECIMAL(10,2)"
    assert map_pg_type("NUMERIC") == "DECIMAL(38,18)"
    assert map_pg_type("double precision") == "DOUBLE"
    assert map_pg_type("BIGSERIAL") == "BIGINT"
    assert map_pg_type("bytea") == "BINARY"
    assert map_pg_type("TIMESTAMPTZ") == "TIMESTAMP"
    assert map_pg_type("INT") == "INT"


def test_plain_sql_untouched():
    sql = "SELECT a, SUM(b) AS s FROM t WHERE c LIKE 'x%' GROUP BY a"
    assert preprocess(sql) == sql


def test_operators_inside_literals_never_rewritten():
    # literal masking: ::, ->, ->>, ~, function names inside strings stay
    for sql in (
        "SELECT 'a::b' AS s",
        "SELECT 'it''s::fine' AS s",
        "SELECT 'j ->> k' AS s",
        "SELECT 'x ~ y' AS s",
        "SELECT 'length(z)' AS s",
        "SELECT 'now()' AS s",
    ):
        assert preprocess(sql) == sql
    # mixed: operator OUTSIDE a literal rewritten, INSIDE untouched
    assert (
        preprocess("SELECT j ->> 'k' FROM t WHERE note = 'cast::int'")
        == "SELECT get_json_object(j, '$.k') FROM t "
           "WHERE note = 'cast::int'"
    )


def test_cast_nested_parens_and_calls():
    assert (
        preprocess("SELECT ((a + b) * (c - d))::INT FROM t")
        == "SELECT CAST(((a + b) * (c - d)) AS INT) FROM t"
    )
    assert (
        preprocess("SELECT f(a, b)::TEXT")
        == "SELECT CAST(f(a, b) AS STRING)"
    )
    assert (
        preprocess("SELECT (SELECT max(x) FROM u)::BIGINT")
        == "SELECT CAST((SELECT max(x) FROM u) AS BIGINT)"
    )
    assert (
        preprocess("SELECT (a::INT + b)::TEXT FROM t")
        == "SELECT CAST((CAST(a AS INT) + b) AS STRING) FROM t"
    )


def test_case_end_cast_operand():
    assert (
        preprocess("SELECT CASE WHEN a > 1 THEN 'x' ELSE 'y' END::TEXT "
                   "FROM t")
        == "SELECT CAST(CASE WHEN a > 1 THEN 'x' ELSE 'y' END AS STRING) "
           "FROM t"
    )
    # nested CASE and idents merely ending in 'end'
    assert preprocess(
        "SELECT CASE WHEN a THEN CASE WHEN b THEN 1 ELSE 2 END "
        "ELSE 3 END::INT FROM t"
    ) == (
        "SELECT CAST(CASE WHEN a THEN CASE WHEN b THEN 1 ELSE 2 END "
        "ELSE 3 END AS INT) FROM t"
    )
    assert preprocess("SELECT trend::INT FROM t") == (
        "SELECT CAST(trend AS INT) FROM t"
    )


def test_fetch_first_rewrites():
    assert (
        preprocess("SELECT a FROM t ORDER BY a FETCH FIRST 5 ROWS ONLY")
        == "SELECT a FROM t ORDER BY a LIMIT 5"
    )
    assert (
        preprocess("SELECT a FROM t ORDER BY a OFFSET 10 FETCH NEXT 5 ROWS ONLY")
        == "SELECT a FROM t ORDER BY a LIMIT 5 OFFSET 10"
    )
    assert (
        preprocess("SELECT a FROM t ORDER BY a OFFSET 10 ROWS "
                   "FETCH FIRST 1 ROW ONLY")
        == "SELECT a FROM t ORDER BY a LIMIT 1 OFFSET 10"
    )
    assert (
        preprocess("SELECT a FROM t ORDER BY a OFFSET 3 ROWS")
        == "SELECT a FROM t ORDER BY a OFFSET 3"
    )
    # inside a literal: untouched
    assert preprocess("SELECT 'FETCH FIRST 5 ROWS ONLY' AS s") == (
        "SELECT 'FETCH FIRST 5 ROWS ONLY' AS s"
    )


def test_between_symmetric_rewrites():
    assert (
        preprocess("SELECT * FROM t WHERE x BETWEEN SYMMETRIC 10 AND 3")
        == "SELECT * FROM t WHERE x BETWEEN least(10, 3)"
        " AND greatest(10, 3)"
    )
    # NOT form: NOT precedes BETWEEN, no special case needed
    assert (
        preprocess("SELECT * FROM t WHERE x NOT BETWEEN SYMMETRIC b AND a")
        == "SELECT * FROM t WHERE x NOT BETWEEN least(b, a)"
        " AND greatest(b, a)"
    )
    # plain BETWEEN untouched; SYMMETRIC inside a literal untouched
    assert preprocess("SELECT x BETWEEN 1 AND 2 FROM t") == (
        "SELECT x BETWEEN 1 AND 2 FROM t"
    )
    assert preprocess("SELECT 'BETWEEN SYMMETRIC 1 AND 2' AS s") == (
        "SELECT 'BETWEEN SYMMETRIC 1 AND 2' AS s"
    )


def test_preprocess_property_literals_invariant():
    """Property: whatever operator soup a literal holds, the literal
    survives preprocess byte-for-byte (the round-2 ordered-replace hazard)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    literal_body = st.text(
        alphabet="abc:>~-#(){},.$%_ 0123456789", min_size=0, max_size=20
    ).map(lambda s: s.replace("'", ""))

    @settings(max_examples=200, deadline=None)
    @given(body=literal_body)
    def check(body):
        sql = f"SELECT '{body}' AS s FROM t WHERE x ~ '{body}'"
        out = preprocess(sql)
        assert f"'{body}'" in out  # both literals intact
        assert out.count(f"'{body}'") == 2
        assert "RLIKE" in out  # the operator outside was still rewritten

    check()


def test_preprocess_property_casts_balanced():
    """Property: nested-paren cast operands of any depth rewrite to a
    CAST with balanced parentheses and no residual ``::``."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    expr = st.recursive(
        st.sampled_from(["a", "b.c", "f(a)", "1"]),
        lambda inner: st.tuples(inner, inner).map(
            lambda t: f"({t[0]} + {t[1]})"
        ),
        max_leaves=6,
    )

    @settings(max_examples=200, deadline=None)
    @given(e=expr, typ=st.sampled_from(["INT", "TEXT", "NUMERIC(5,2)"]))
    def check(e, typ):
        out = preprocess(f"SELECT {e}::{typ} FROM t")
        assert "::" not in out
        assert out.startswith("SELECT CAST(")
        assert out.count("(") == out.count(")")

    check()


def test_distinct_on_rewrite():
    from cassandra_sql_spark.sqlfront.preprocess import preprocess

    out = preprocess(
        "SELECT DISTINCT ON (a) a, b, c FROM t ORDER BY a, b DESC"
    )
    assert "ROW_NUMBER() OVER (PARTITION BY a ORDER BY a, b DESC)" in out
    assert out.startswith("SELECT a, b, c FROM (SELECT *,")
    assert out.endswith("ORDER BY a, b DESC")
    # no ORDER BY: keys order the window (deterministic, unlike pg)
    out = preprocess("SELECT DISTINCT ON (a, b) a, b, v FROM t")
    assert "PARTITION BY a, b ORDER BY a, b" in out
    # plain SELECT DISTINCT untouched
    assert preprocess("SELECT DISTINCT a FROM t") == "SELECT DISTINCT a FROM t"


def test_tablesample_rewrite():
    from cassandra_sql_spark.sqlfront.preprocess import preprocess

    assert (
        preprocess("SELECT * FROM t TABLESAMPLE BERNOULLI (10)")
        == "SELECT * FROM t TABLESAMPLE (10 PERCENT)"
    )
    assert "TABLESAMPLE (2.5 PERCENT)" in preprocess(
        "SELECT * FROM t TABLESAMPLE SYSTEM(2.5) WHERE x > 1"
    )


def test_qualify_rewrite_basic():
    out = preprocess(
        "SELECT id, k FROM t "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY id) <= 2"
    )
    assert out == (
        "SELECT * EXCEPT (__qualify) FROM (SELECT id, k, "
        "(ROW_NUMBER() OVER (PARTITION BY k ORDER BY id) <= 2) "
        "AS __qualify FROM t) WHERE __qualify"
    )


def test_qualify_rewrite_with_tail():
    out = preprocess(
        "SELECT id FROM t QUALIFY RANK() OVER (ORDER BY v) = 1 "
        "ORDER BY id LIMIT 5"
    )
    assert out.endswith("WHERE __qualify ORDER BY id LIMIT 5")
    assert "(RANK() OVER (ORDER BY v) = 1) AS __qualify" in out


def test_qualify_distinct_moves_outside():
    out = preprocess(
        "SELECT DISTINCT k FROM t "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY id) = 1"
    )
    assert out.startswith("SELECT DISTINCT * EXCEPT (__qualify) FROM (SELECT k,")


def test_qualify_in_subquery_and_cte():
    # QUALIFY nested inside a derived table or a CTE body is rewritten
    # at its own level; a string literal containing the word is never
    # touched
    q = (
        "SELECT * FROM (SELECT id FROM t "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY id) = 1) s"
    )
    import re as _re

    out = preprocess(q)
    assert not _re.search(r"\bQUALIFY\b", out, _re.I)
    assert out.startswith("SELECT * FROM (SELECT * EXCEPT (__qualify)")
    cte = (
        "WITH w AS (SELECT id FROM t "
        "QUALIFY RANK() OVER (ORDER BY id) <= 2) "
        "SELECT COUNT(*) AS n FROM w"
    )
    outc = preprocess(cte)
    assert not _re.search(r"\bQUALIFY\b", outc, _re.I)
    assert outc.startswith("WITH w AS (SELECT * EXCEPT (__qualify)")
    lit = "SELECT 'we qualify for this' AS s FROM t"
    assert preprocess(lit) == lit


def test_qualify_set_operation_untouched():
    q = (
        "SELECT id FROM a UNION ALL SELECT id FROM b "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY id) = 1"
    )
    assert preprocess(q) == q


# ---- QUALIFY differential battery (Spark-through-rewrite vs DuckDB
# native QUALIFY, same parquet) -------------------------------------------

QUALIFY_VARIANTS = [
    # inline window fn, base column not in select list
    """SELECT o_orderkey FROM orders
       QUALIFY ROW_NUMBER() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1""",
    # alias reference + trailing ORDER BY ... LIMIT
    """SELECT o_custkey, o_orderkey,
              RANK() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS r
       FROM orders QUALIFY r <= 2 ORDER BY o_custkey, o_orderkey LIMIT 40""",
    # WHERE + QUALIFY together
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderstatus = 'F'
       QUALIFY DENSE_RANK() OVER (ORDER BY o_totalprice DESC) <= 3""",
    # GROUP BY + window over aggregate (COUNT: exact in both dialects —
    # a SUM(double) here would hit the Spark-truncates/DuckDB-rounds
    # BIGINT cast divergence, which is base.py's isum() territory)
    """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
       FROM orders GROUP BY o_custkey
       QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
                                  o_custkey) <= 5""",
    # DISTINCT (evaluated after QUALIFY)
    """SELECT DISTINCT o_orderstatus FROM orders
       QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_orderkey) <= 2""",
    # boolean combination of two window fns
    """SELECT o_orderkey FROM orders
       QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderkey) = 1
           AND RANK() OVER (ORDER BY o_orderdate, o_orderkey) > 10""",
    # OFFSET tail
    """SELECT o_orderkey FROM orders
       QUALIFY ROW_NUMBER() OVER (ORDER BY o_orderkey) <= 30
       ORDER BY o_orderkey LIMIT 10 OFFSET 5""",
    # QUALIFY inside a derived table, aggregated outside
    """SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
         SELECT o_custkey FROM orders
         QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderkey) = 1) d""",
    # QUALIFY inside a CTE body
    """WITH tops AS (
         SELECT o_custkey, o_orderkey FROM orders
         QUALIFY RANK() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) = 1)
       SELECT o_custkey, o_orderkey FROM tops
       ORDER BY o_custkey LIMIT 25""",
]


import pytest as _pytest


@_pytest.mark.parametrize("i", range(len(QUALIFY_VARIANTS)))
def test_qualify_differential_vs_duckdb(i, spark, duck, sf_dir):
    from cassandra_sql_spark.io import register
    from cassandra_sql_spark.testing import compare

    sql = QUALIFY_VARIANTS[i]
    register(spark, sf_dir, "orders")
    df = spark.sql(preprocess(sql))
    srows = [tuple(r) for r in df.collect()]
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = compare(srows, df.columns, orows, ocols, strict=True)
    assert not problems, f"variant {i}: {problems}\nrewritten: {preprocess(sql)}"


def test_window_filter_rewrite():
    out = preprocess(
        "SELECT SUM(v) FILTER (WHERE v > 1) OVER (PARTITION BY k) AS s "
        "FROM t"
    )
    assert out == (
        "SELECT SUM(CASE WHEN v > 1 THEN v END) OVER (PARTITION BY k) "
        "AS s FROM t"
    )
    # COUNT(*) form, parenthesized predicate
    out = preprocess(
        "SELECT COUNT(*) FILTER (WHERE (a OR b)) OVER w AS n FROM t "
        "WINDOW w AS (ORDER BY id)"
    )
    assert "COUNT(CASE WHEN (a OR b) THEN 1 END) OVER w" in out
    # DISTINCT stays outside the CASE
    out = preprocess(
        "SELECT COUNT(DISTINCT x) FILTER (WHERE y = 1) OVER () FROM t"
    )
    assert "COUNT(DISTINCT CASE WHEN y = 1 THEN x END) OVER ()" in out
    # group-by FILTER (no OVER): untouched — Spark supports it natively
    q = "SELECT SUM(v) FILTER (WHERE v > 1) AS s FROM t GROUP BY k"
    assert preprocess(q) == q
    # literal containing the keyword: untouched
    lit = "SELECT 'FILTER (WHERE x) OVER' AS s FROM t"
    assert preprocess(lit) == lit


def test_quantified_rewrite():
    # > ALL -> scalar MAX subquery
    out = preprocess("SELECT a FROM t WHERE x > ALL (SELECT v FROM u)")
    assert "> (SELECT MAX(__qv) FROM (SELECT v FROM u) __q(__qv))" in out
    # < ANY -> scalar MAX; >= ANY -> MIN
    out = preprocess("SELECT a FROM t WHERE x < ANY (SELECT v FROM u)")
    assert "< (SELECT MAX(__qv)" in out
    out = preprocess("SELECT a FROM t WHERE x >= SOME (SELECT v FROM u)")
    assert ">= (SELECT MIN(__qv)" in out
    # = ANY -> IN, <> ALL -> NOT IN
    out = preprocess("SELECT a FROM t WHERE x = ANY (SELECT v FROM u)")
    assert "x IN (SELECT v FROM u)" in out
    out = preprocess("SELECT a FROM t WHERE x <> ALL (SELECT v FROM u)")
    assert "x NOT IN (SELECT v FROM u)" in out
    # nested parens inside subquery survive balanced extraction
    out = preprocess(
        "SELECT a FROM t WHERE x > ALL (SELECT max(v) FROM u WHERE f(v, 2) > 0)"
    )
    assert "FROM (SELECT max(v) FROM u WHERE f(v, 2) > 0) __q(__qv)" in out
    # two quantified predicates in one statement
    out = preprocess(
        "SELECT a FROM t WHERE x > ALL (SELECT v FROM u) "
        "AND y = ANY (SELECT w FROM z)"
    )
    assert "MAX(__qv)" in out and "y IN (SELECT w FROM z)" in out
    # literal containing the keyword: untouched
    lit = "SELECT '> ALL (SELECT v FROM u)' AS s FROM t"
    assert preprocess(lit) == lit
    # pg array form `= ANY('{1,2}')` does not match (no subquery paren)
    arr = "SELECT a FROM t WHERE x = ANY('{1,2}')"
    assert preprocess(arr) == arr


def test_fetch_with_ties_rewrites():
    got = preprocess(
        "SELECT a, b FROM t ORDER BY b DESC FETCH FIRST 5 ROWS WITH TIES"
    )
    assert got == (
        "SELECT * EXCEPT (__ties_rk) FROM (SELECT *, RANK() OVER "
        "(ORDER BY b DESC) AS __ties_rk FROM (SELECT a, b FROM t)) "
        "WHERE __ties_rk <= 5 ORDER BY b DESC"
    )
    # pg defaults the count to 1
    assert "__ties_rk <= 1 " in preprocess(
        "SELECT a FROM t ORDER BY a FETCH NEXT ROW WITH TIES"
    )
    # subquery ORDER BY is not mistaken for the ranking keys
    got = preprocess(
        "SELECT a FROM (SELECT a FROM u ORDER BY a) "
        "ORDER BY a DESC FETCH FIRST 2 ROWS WITH TIES"
    )
    assert "RANK() OVER (ORDER BY a DESC)" in got
    # ONLY form untouched by the ties rewrite
    assert "RANK()" not in preprocess(
        "SELECT a FROM t ORDER BY a FETCH FIRST 2 ROWS ONLY"
    )
    # WITH TIES requires ORDER BY
    import pytest
    with pytest.raises(ValueError):
        preprocess("SELECT a FROM t FETCH FIRST 2 ROWS WITH TIES")
