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
