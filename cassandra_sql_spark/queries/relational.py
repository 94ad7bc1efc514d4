"""Scans, projections, predicates, sorts, limits (SURVEY §2.1, §2.2, §2.6).

Reference semantics: row-at-a-time WHERE over a full scan (reference
kv/KvQueryExecutor.java:1004-1136), predicate set =,!=,<,<=,>,>= / LIKE /
IN / BETWEEN / IS NULL / AND / OR / NOT (kv/CalciteSqlParser.java:992-1145),
ORDER BY + LIMIT/OFFSET (kv/KvQueryExecutor.java:1101-1119, 2771-2814).
We do NOT replicate the reference's silent 1000-row default limit or the
100k ORDER BY scan cap (kv/KvQueryExecutor.java:1010-1015) — documented
wrong-results hazards.

Scale notes: these compile to a single parquet scan stage; filters and
column pruning reach the scan (PushedFilters/ReadSchema in .explain), and
ORDER BY+LIMIT becomes TakeOrderedAndProject (no full sort shuffle).
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, sql_q

QUERIES: dict[str, Q] = {
    # Full scan + filter + projection; filter and pruning push to parquet.
    "scan_filter_project": sql_q(
        """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 45 AND l_returnflag = 'A'
        """,
        ("lineitem",),
    ),
    # PK-equality point lookup (reference kv/KvQueryExecutor.java:959-999);
    # on parquet this is scan + data-skipping, same declarative plan.
    "point_lookup": sql_q(
        "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
        ("customer",),
    ),
    "pred_comparisons": sql_q(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice >= 100000 AND o_totalprice < 150000
          AND o_orderstatus != 'P' AND o_custkey <= 1000
        """,
        ("orders",),
    ),
    "pred_between": sql_q(
        """
        SELECT l_orderkey, l_linenumber, l_discount
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07
          AND l_linenumber NOT BETWEEN 3 AND 5
        """,
        ("lineitem",),
    ),
    "pred_in": sql_q(
        """
        SELECT o_orderkey, o_orderpriority
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_orderstatus NOT IN ('P')
        """,
        ("orders",),
    ),
    "pred_like": sql_q(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_name LIKE '%ol%' AND p_type NOT LIKE 'PROMO%'
          AND p_brand LIKE 'Brand#_3'
        """,
        ("part",),
    ),
    "pred_null": sql_q(
        """
        SELECT o_orderkey,
               NULLIF(o_orderstatus, 'O') AS st
        FROM orders
        WHERE NULLIF(o_orderstatus, 'O') IS NULL
          AND o_totalprice IS NOT NULL
          AND o_orderkey < 3000
        """,
        ("orders",),
    ),
    "pred_or_not": sql_q(
        """
        SELECT l_orderkey, l_linenumber
        FROM lineitem
        WHERE (l_returnflag = 'R' OR l_linestatus = 'O')
          AND NOT (l_quantity > 10)
        """,
        ("lineitem",),
    ),
    # Deterministic total order (unique key last) -> stable LIMIT/OFFSET.
    "sort_limit_offset": sql_q(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25 OFFSET 10
        """,
        ("orders",),
    ),
    "sort_multicol": sql_q(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer
        ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey
        LIMIT 50
        """,
        ("customer",),
    ),
    # LIMIT 0 is valid and returns an empty, schema-stable result
    # (reference kv/KvQueryExecutor.java:1101-1119).
    "limit_zero": sql_q(
        "SELECT r_regionkey, r_name FROM region LIMIT 0",
        ("region",),
    ),
    # SELECT without FROM (reference kv/KvQueryExecutor.java:830-958,
    # LiteralHandler.java).
    "literal_select": sql_q(
        """
        SELECT 1 AS one, 'x' AS s, CAST(2.5 AS DOUBLE) AS d,
               TRUE AS b, CAST(NULL AS INT) AS n
        """,
        (),
    ),
}
