"""Scalar expressions & functions (SURVEY §2.8; reference
kv/CalciteSqlParser.java:510-858, kv/MathFunctions.java,
kv/DateTimeFunctions.java).

All JVM-side built-ins inside whole-stage codegen — no Python UDFs. Where
Spark and DuckDB return different types for the same function (CEIL,
EXTRACT, string casts) results are CAST to a common type; transcendentals
go through DECIMAL(18,6) so last-ulp libm differences can't flip the hash,
then back to DOUBLE so no DECIMAL crosses the engine boundary (scaled
renderings like '0.450000' vs '0.45' hash differently in some fetch paths).
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, sql_q

QUERIES: dict[str, Q] = {
    # Searched + simple CASE (reference kv/CalciteSqlParser.java:566-573,
    # 701-811; kv/CaseExpressionTest.java).
    "expr_case": sql_q(
        """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 150000 THEN 'mid'
                    ELSE 'low' END AS bucket,
               CASE o_orderstatus WHEN 'F' THEN 'final'
                                  WHEN 'O' THEN 'open'
                                  ELSE 'other' END AS status_name
        FROM orders WHERE o_orderkey < 5000
        """,
        ("orders",),
    ),
    # || and CONCAT (reference kv/CalciteSqlParser.java:612-624).
    "expr_concat": sql_q(
        """
        SELECT n_nationkey,
               n_name || '-' || CAST(n_regionkey AS BIGINT) AS tagged,
               CONCAT(n_name, '/', n_name) AS doubled
        FROM nation
        """,
        ("nation",),
    ),
    # + - * / % with int and double operands
    # (reference kv/CalciteSqlParser.java:626-652).
    "expr_arithmetic": sql_q(
        """
        SELECT l_orderkey, l_linenumber,
               l_quantity + 1.0 AS q_plus,
               l_quantity - 0.5 AS q_minus,
               l_quantity * 2.0 AS q_times,
               l_quantity / 4 AS q_div,
               MOD(CAST(l_orderkey AS BIGINT), 7) AS k_mod,
               -l_quantity AS q_neg
        FROM lineitem WHERE l_orderkey < 1000
        """,
        ("lineitem",),
    ),
    # ROUND/CEIL/FLOOR/POWER/SQRT/ABS/SIGN (reference
    # kv/CalciteSqlParser.java:654-672, kv/MathFunctions.java:20-341).
    # CEIL/FLOOR cast to BIGINT (DuckDB returns double, Spark long).
    "expr_math": sql_q(
        """
        SELECT l_orderkey, l_linenumber,
               ABS(l_quantity - 25.0) AS dist25,
               CAST(CEIL(l_quantity / 4) AS BIGINT) AS q_ceil,
               CAST(FLOOR(l_quantity / 4) AS BIGINT) AS q_floor,
               ROUND(l_quantity / 4, 2) AS q_round,
               POWER(l_quantity, 2) AS q_sq,
               SQRT(l_quantity) AS q_sqrt,
               CAST(SIGN(l_quantity - 25.0) AS DOUBLE) AS s
        FROM lineitem WHERE l_orderkey < 1000
        """,
        ("lineitem",),
    ),
    # Transcendentals through DECIMAL(18,6) then back to DOUBLE: the decimal
    # hop kills last-ulp libm skew between engines; the DOUBLE output avoids
    # scaled-decimal rendering ('0.450000' vs '0.45') flipping value hashes
    # across fetch paths.
    "expr_math_transcendental": sql_q(
        """
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(LN(l_quantity + 1) AS DECIMAL(18,6)) AS DOUBLE)
                 AS ln_q,
               CAST(CAST(EXP(l_quantity / 50.0) AS DECIMAL(18,6)) AS DOUBLE)
                 AS exp_q,
               CAST(CAST(LOG10(l_quantity + 1) AS DECIMAL(18,6)) AS DOUBLE)
                 AS log10_q,
               CAST(CAST(SIN(l_quantity) AS DECIMAL(18,6)) AS DOUBLE)
                 AS sin_q,
               CAST(CAST(ATAN2(l_quantity, 10.0) AS DECIMAL(18,6)) AS DOUBLE)
                 AS atan2_q
        FROM lineitem WHERE l_orderkey < 500
        """,
        ("lineitem",),
    ),
    "expr_coalesce_nullif": sql_q(
        """
        SELECT o_orderkey,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS st,
               COALESCE(NULLIF(o_totalprice, 0.0), -1.0) AS price,
               GREATEST(o_totalprice, 100000.0) AS hi,
               LEAST(o_totalprice, 100000.0) AS lo
        FROM orders WHERE o_orderkey < 4000
        """,
        ("orders",),
    ),
    # String function battery (UPPER/LOWER/SUBSTR/LENGTH/TRIM/REPLACE/
    # LEFT/RIGHT/LPAD/INSTR — shared surface of both dialects).
    "expr_string_funcs": sql_q(
        """
        SELECT p_partkey,
               UPPER(p_brand) AS up,
               LOWER(p_type) AS lo,
               SUBSTR(p_name, 1, 8) AS prefix,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               TRIM(p_name) AS trimmed,
               REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
               LPAD(CAST(p_size AS STRING), 4, '0') AS size_pad,
               CAST(INSTR(p_name, 'a') AS BIGINT) AS first_a
        FROM part WHERE p_partkey < 500
        """,
        ("part",),
        oracle="""
        SELECT p_partkey,
               UPPER(p_brand) AS up,
               LOWER(p_type) AS lo,
               SUBSTR(p_name, 1, 8) AS prefix,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               TRIM(p_name) AS trimmed,
               REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
               LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
               CAST(INSTR(p_name, 'a') AS BIGINT) AS first_a
        FROM part WHERE p_partkey < 500
        """,
    ),
    # Type coercion battery (reference kv/KvQueryExecutor.java:4155-4300).
    # STRING vs VARCHAR spelling differs -> dialect-specific oracle.
    "expr_cast": sql_q(
        """
        SELECT o_orderkey,
               CAST(o_totalprice AS BIGINT) AS price_int,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                 AS price_dec,
               CAST(o_orderkey AS DOUBLE) AS key_dbl,
               CAST(o_orderkey AS STRING) AS key_str,
               CAST(o_orderdate AS DATE) AS order_day
        FROM orders WHERE o_orderkey < 2000
        """,
        ("orders",),
        oracle="""
        SELECT o_orderkey,
               CAST(TRUNC(o_totalprice) AS BIGINT) AS price_int,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                 AS price_dec,
               CAST(o_orderkey AS DOUBLE) AS key_dbl,
               CAST(o_orderkey AS VARCHAR) AS key_str,
               CAST(o_orderdate AS DATE) AS order_day
        FROM orders WHERE o_orderkey < 2000
        """,
    ),
    # EXTRACT + date_trunc + interval arithmetic (reference
    # kv/DateTimeFunctions.java:22-351).
    "expr_datetime": sql_q(
        """
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
               CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
               CAST(EXTRACT(HOUR FROM o_orderdate) AS BIGINT) AS h,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               DATE_TRUNC('week', o_orderdate) AS week_start,
               o_orderdate + INTERVAL '3' DAY AS plus3d,
               o_orderdate - INTERVAL '2' MONTH AS minus2m
        FROM orders WHERE o_orderkey < 2000
        """,
        ("orders",),
        oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
               CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
               CAST(EXTRACT(HOUR FROM o_orderdate) AS BIGINT) AS h,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP)
                 AS month_start,
               CAST(DATE_TRUNC('week', o_orderdate) AS TIMESTAMP)
                 AS week_start,
               o_orderdate + INTERVAL 3 DAY AS plus3d,
               o_orderdate - INTERVAL 2 MONTH AS minus2m
        FROM orders WHERE o_orderkey < 2000
        """,
    ),
    # Day-difference & formatting — dialects diverge (Spark datediff /
    # date_format vs DuckDB subtraction / strftime).
    "expr_datediff_format": sql_q(
        """
        SELECT l_orderkey, l_linenumber,
               DATEDIFF(CAST(l_shipdate AS DATE),
                        CAST(TIMESTAMP '1995-01-01 00:00:00' AS DATE))
                 AS days_since,
               DATE_FORMAT(l_shipdate, 'yyyy-MM') AS ship_month
        FROM lineitem WHERE l_orderkey < 800
        """,
        ("lineitem",),
        oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS INT)
                 AS days_since,
               STRFTIME(l_shipdate, '%Y-%m') AS ship_month
        FROM lineitem WHERE l_orderkey < 800
        """,
    ),
    # Grouping on a computed expression (monthly revenue rollup — the shape
    # behind a hypertable-style time bucket).
    "expr_time_bucket_agg": sql_q(
        """
        SELECT DATE_TRUNC('month', o_orderdate) AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100 AS revenue
        FROM orders
        GROUP BY DATE_TRUNC('month', o_orderdate)
        """,
        ("orders",),
        oracle="""
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100 AS revenue
        FROM orders
        GROUP BY DATE_TRUNC('month', o_orderdate)
        """,
    ),
}
