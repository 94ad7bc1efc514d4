"""PostgreSQL-named scalar functions registered as Spark SQL UDFs
(M4 of the build plan — reference kv/MathFunctions.java,
kv/DateTimeFunctions.java, kv/JsonHelper.java surfaces under their pg
names).

These are SQL-body functions (Spark 4 `CREATE TEMPORARY FUNCTION ...
RETURN expr`) — inlined into the plan at analysis time, fully JVM/codegen;
no Python round-trip. Functions whose Spark built-in already matches the
pg name (abs, ceil, floor, sqrt, mod, power, concat, coalesce, extract,
date_trunc, split_part, initcap, ...) need no registration; the
``sqlfront.preprocess`` aliases cover spelled-differently cases (strpos,
ceiling, pow, jsonb_array_length).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS = [
    # psql handshake staples the reference fast-paths on the wire
    # (postgres/PostgresConnectionHandler.java:319,337,355). version() and
    # current_database() are Spark built-ins (non-replaceable), so the
    # preprocess aliases route the pg spellings to these pg_* functions;
    # the version string mirrors the reference's.
    """
    CREATE OR REPLACE TEMPORARY FUNCTION pg_version()
    RETURNS STRING RETURN
      'PostgreSQL 14.0 (Cassandra SQL Layer 1.0, Spark engine)'
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION pg_current_database()
    RETURNS STRING RETURN 'cassandra_sql'
    """,
    # JSON type inspection (reference kv/JsonHelper.java jsonb_typeof).
    # Heuristic on the raw JSON text — matches pg for well-formed values.
    """
    CREATE OR REPLACE TEMPORARY FUNCTION jsonb_typeof(j STRING)
    RETURNS STRING RETURN CASE
      WHEN j IS NULL THEN NULL
      WHEN trim(j) LIKE '{%' THEN 'object'
      WHEN trim(j) LIKE '[%' THEN 'array'
      WHEN trim(j) IN ('true', 'false') THEN 'boolean'
      WHEN trim(j) = 'null' THEN 'null'
      WHEN trim(j) RLIKE '^-?[0-9]+(\\\\.[0-9]+)?([eE][+-]?[0-9]+)?$'
        THEN 'number'
      ELSE 'string' END
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION jsonb_array_len(j STRING)
    RETURNS INT RETURN json_array_length(j)
    """,
    # age(a, b): interval between timestamps (reference
    # kv/DateTimeFunctions.java age).
    """
    CREATE OR REPLACE TEMPORARY FUNCTION age(a TIMESTAMP, b TIMESTAMP)
    RETURNS INTERVAL DAY TO SECOND RETURN a - b
    """,
    # (div(a, b) needs no registration — Spark's built-in already has pg
    # truncating-integer-division semantics.)
    # pg_to_char: translate the common pg datetime format tokens to
    # Spark's (YYYY->yyyy, DD->dd, HH24->HH, MI->mm, SS->ss; MM shared).
    # Spark's built-in to_char cannot be replaced by a SQL UDF, so the
    # engine facade rewrites to_char( -> pg_to_char( in preprocess.
    """
    CREATE OR REPLACE TEMPORARY FUNCTION pg_to_char(ts TIMESTAMP, fmt STRING)
    RETURNS STRING RETURN date_format(ts,
      replace(replace(replace(replace(replace(fmt,
        'YYYY', 'yyyy'), 'DD', 'dd'), 'HH24', 'HH'), 'MI', 'mm'),
        'SS', 'ss'))
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION last_day_of_month(d DATE)
    RETURNS DATE RETURN last_day(d)
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION first_day_of_month(d DATE)
    RETURNS DATE RETURN trunc(d, 'MM')
    """,
    # numeric truncation toward zero with scale (pg trunc(x, n)).
    """
    CREATE OR REPLACE TEMPORARY FUNCTION trunc_n(x DOUBLE, n INT)
    RETURNS DOUBLE RETURN CAST(CAST(x * power(10, n) AS BIGINT) AS DOUBLE)
      / power(10, n)
    """,
]


def register_pg_functions(spark: SparkSession) -> None:
    for ddl in _FUNCTIONS:
        spark.sql(ddl)
