"""Pin the hash-boundary contract helper against the exact round-4
driver failure modes: (a) ARRAY-typed Spark output columns (the driver's
pandas hasher raises ``TypeError: unhashable type: 'list'``), (b) DuckDB
oracles whose result types include HUGEINT (SUM over BIGINT) or DECIMAL —
both render float64-style in a pandas fetch and hash-mismatch despite
being value-equal.
"""

from __future__ import annotations

from cassandra_sql_spark.testing import boundary_problems


def test_flags_array_spark_column():
    # the r4 `array_agg_per_group` shape: ARRAY<STRING> output
    probs = boundary_problems(
        [("n_regionkey", "bigint"), ("nations", "array<string>")],
        ["n_regionkey", "nations"],
        ["BIGINT", "VARCHAR[]"],
    )
    assert any("nations" in p and "array" in p for p in probs)


def test_flags_map_spark_column():
    probs = boundary_problems(
        [("k", "string"), ("m", "map<string,bigint>")], ["k", "m"],
        ["VARCHAR", "MAP(VARCHAR, BIGINT)"],
    )
    assert any("m is map" in p for p in probs)


def test_flags_hugeint_oracle_column():
    # the r4 `stream_static_join` shape: uncast SUM(BIGINT) -> HUGEINT
    probs = boundary_problems(
        [("user_id", "bigint"), ("user_total_cents", "bigint")],
        ["user_id", "user_total_cents"],
        ["BIGINT", "HUGEINT"],
    )
    assert any("user_total_cents" in p and "HUGEINT" in p for p in probs)


def test_flags_decimal_oracle_column():
    # the r3 failure family: DECIMAL trailing-zero rendering drift
    probs = boundary_problems(
        [("x", "double")], ["x"], ["DECIMAL(25,2)"]
    )
    assert any("DECIMAL" in p for p in probs)


def test_clean_scalar_schema_passes():
    probs = boundary_problems(
        [("a", "bigint"), ("b", "double"), ("c", "string"),
         ("d", "date"), ("e", "timestamp"), ("f", "boolean")],
        ["a", "b", "c", "d", "e", "f"],
        ["BIGINT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"],
    )
    assert probs == []


def test_duckdb_live_types_match_expectation():
    """The helper must agree with what real DuckDB relations report —
    bind-time only, nothing executes."""
    import duckdb

    rel = duckdb.sql("SELECT SUM(x) AS s FROM (VALUES (1::BIGINT)) t(x)")
    probs = boundary_problems([("s", "bigint")], rel.columns, rel.types)
    assert any("HUGEINT" in p for p in probs)

    rel2 = duckdb.sql(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1::BIGINT)) t(x)"
    )
    assert boundary_problems([("s", "bigint")], rel2.columns, rel2.types) == []

    rel3 = duckdb.sql("SELECT list_sort(list(x)) AS l FROM (VALUES (1)) t(x)")
    probs3 = boundary_problems([("l", "array<int>")], rel3.columns, rel3.types)
    assert any("array" in p for p in probs3)
