"""Headline analytical queries (TPC-H-shaped) — the engine's spine.

These exercise scan -> filter -> join -> agg -> having -> sort -> limit,
the same shape as the reference's demo workload (reference
demo-ecommerce.sh:144-240) and its KV executors (reference
kv/KvQueryExecutor.java:1004-1136 scan, kv/KvJoinExecutor.java joins,
kv/KvQueryExecutor.java:3269 hash aggregation).

Scale notes: every join here is dimension-to-fact with the small side well
under the broadcast threshold, so Catalyst plans broadcast-hash joins with no
fact-table shuffle; aggregates are partial+final (map-side combine). At 100 TB
the same plans hold — the only shuffle is on the (low-cardinality) group keys.

Join-order convention: FROM starts at the fact table (lineitem) and joins
dimensions left-deep. Without catalog stats Catalyst keeps the syntactic
order for inner joins, so this guarantees the fact table is the streamed
probe side and only (filtered) dims are broadcast-built — measured 2x faster
than dim-first at sf0.1, and exactly the shape that survives 100 TB (a
too-big right side demotes to shuffle join automatically; the fact table is
never the build side). Pinned by tests/test_plans.py.
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, davg, dsum, sql_q

Q1_PRICING_SUMMARY = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum('l_quantity', 'sum_qty')},
  {dsum('l_extendedprice', 'sum_base_price')},
  {dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', 6)},
  {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 6)},
  {davg('l_quantity', 'avg_qty')},
  {davg('l_extendedprice', 'avg_price')},
  {davg('l_discount', 'avg_disc', 6)},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

Q3_SHIPPING_PRIORITY = f"""
SELECT
  l_orderkey,
  {dsum('l_extendedprice * (1 - l_discount)', 'revenue', 6)},
  o_orderdate,
  o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

Q5_LOCAL_SUPPLIER_VOLUME = f"""
SELECT
  n_name,
  {dsum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC
"""

Q6_FORECAST_REVENUE = f"""
SELECT {dsum('l_extendedprice * l_discount', 'revenue', 6)}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""

Q10_RETURNED_ITEMS = f"""
SELECT
  c_custkey,
  c_name,
  {dsum('l_extendedprice * (1 - l_discount)', 'revenue', 6)},
  {dsum('c_acctbal', 'acctbal')},
  n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

QUERIES: dict[str, Q] = {
    "q1_pricing_summary": sql_q(Q1_PRICING_SUMMARY, ("lineitem",)),
    "q3_shipping_priority": sql_q(
        Q3_SHIPPING_PRIORITY, ("customer", "orders", "lineitem")
    ),
    "q5_local_supplier_volume": sql_q(
        Q5_LOCAL_SUPPLIER_VOLUME,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    ),
    "q6_forecast_revenue": sql_q(Q6_FORECAST_REVENUE, ("lineitem",)),
    "q10_returned_items": sql_q(
        Q10_RETURNED_ITEMS, ("customer", "orders", "lineitem", "nation")
    ),
}
