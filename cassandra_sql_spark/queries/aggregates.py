"""Aggregation (SURVEY §2.4; reference kv/KvQueryExecutor.java:3269-3989).

The reference does a single-pass in-heap hash aggregation keyed on a
concatenated string. Spark's groupBy is partial+final with spill — the
shuffle carries only one partially-aggregated row per (partition, key).
COUNT(DISTINCT), ROLLUP, CUBE and GROUPING SETS are deliberate upgrades the
reference lacks (no DISTINCT flag in AggregateFunction.java:8-14).
MIN/MAX here are type-generic (the reference coerces to double —
kv/KvQueryExecutor.java:3782-3822 — misbehaving on strings; not replicated).
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, davg, dsum, isum, sql_q

QUERIES: dict[str, Q] = {
    # Global aggregate, no GROUP BY (COUNT(*) / COUNT(col) / SUM / AVG /
    # MIN / MAX in one pass).
    "agg_global": sql_q(
        f"""
        SELECT COUNT(*) AS n_rows,
               COUNT(o_totalprice) AS n_price,
               {dsum('o_totalprice', 'sum_price')},
               {davg('o_totalprice', 'avg_price')},
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order
        FROM orders
        """,
        ("orders",),
    ),
    "agg_groupby_multi": sql_q(
        f"""
        SELECT l_returnflag, l_linestatus, l_linenumber,
               COUNT(*) AS cnt, {dsum('l_quantity', 'sum_qty')}
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus, l_linenumber
        """,
        ("lineitem",),
    ),
    # HAVING over aggregate expressions
    # (reference kv/KvQueryExecutor.java:3832-3989).
    "agg_having": sql_q(
        f"""
        SELECT o_custkey, COUNT(*) AS n_orders,
               {dsum('o_totalprice', 'total_spend')}
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) > 12 AND SUM(o_totalprice) > 1000000
        """,
        ("orders",),
    ),
    # Aggregate over an arithmetic expression (reference FIXTURES F2:
    # SUM(amount * quantity)); string MIN/MAX is type-generic here.
    "agg_expr": sql_q(
        f"""
        SELECT l_returnflag,
               {dsum('l_quantity * l_extendedprice', 'gross', 6)},
               MIN(l_linestatus) AS min_status,
               MAX(l_linestatus) AS max_status
        FROM lineitem
        GROUP BY l_returnflag
        """,
        ("lineitem",),
    ),
    # COUNT(DISTINCT) + multi-arg distinct — absent in the reference
    # (SURVEY §2.4 "NOT implemented"); Spark expands via expand+two-phase agg.
    "agg_count_distinct": sql_q(
        """
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT l_partkey) AS n_part
        FROM lineitem
        GROUP BY l_returnflag
        """,
        ("lineitem",),
    ),
    # Aggregation over a join base (reference kv/KvQueryExecutor.java:3282-3290).
    "agg_over_join": sql_q(
        f"""
        SELECT n_name, COUNT(*) AS n_customers, {dsum('c_acctbal', 'sum_bal')}
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
        ("customer", "nation"),
    ),
    # Aggregation over a derived table
    # (reference kv/KvQueryExecutor.java:5857-6048 — a second agg
    # implementation; one declarative path here).
    "agg_over_derived": sql_q(
        f"""
        SELECT big_spender, COUNT(*) AS n, {dsum('total_spend', 'spend')}
        FROM (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
                   AS total_spend,
                 CASE WHEN SUM(o_totalprice) > 1500000 THEN 'Y' ELSE 'N' END
                   AS big_spender
          FROM orders GROUP BY o_custkey
        ) t
        GROUP BY big_spender
        """,
        ("orders",),
    ),
    # ROLLUP / CUBE — upgrades over the reference (grouping-set shuffles
    # are a single expand + one shuffle in Spark).
    "agg_rollup": sql_q(
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               {isum('l_linenumber', 'sum_ln')}
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        ("lineitem",),
    ),
    "agg_cube": sql_q(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        ("orders",),
    ),
    "agg_where_then_group": sql_q(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n,
               {davg('o_totalprice', 'avg_price')}
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderstatus = 'F'
        GROUP BY o_orderpriority
        """,
        ("orders",),
    ),
    # Exact interpolated percentiles (linear interpolation matches
    # DuckDB quantile_cont bit-for-bit on the same doubles); at scale the
    # approx_percentile sketch is the alternative (agg_approx_distinct_bound
    # shows the sketch pattern).
    "agg_percentiles": sql_q(
        """
        SELECT l_returnflag,
               percentile(l_quantity, 0.25) AS p25,
               percentile(l_quantity, 0.5) AS p50,
               percentile(l_quantity, 0.75) AS p75,
               percentile(l_extendedprice, 0.9) AS p90
        FROM lineitem
        GROUP BY l_returnflag
        """,
        ("lineitem",),
        oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               quantile_cont(l_extendedprice, 0.9) AS p90
        FROM lineitem
        GROUP BY l_returnflag
        """,
    ),
}
