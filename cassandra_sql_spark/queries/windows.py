"""Window functions (SURVEY §2.5; reference window/WindowFunctionExecutor.java).

The reference partitions rows in heap, sorts each partition, then applies the
function with a hard-coded default frame (unbounded preceding -> current row,
WindowFrame.java:42-49). Spark's WindowExec shuffles once on the partition
key and sorts within partitions — at scale the partition key choice is the
whole game (low-skew keys; no ORDER BY over an un-partitioned window, which
would serialize into a single task).

Determinism: every ORDER BY inside OVER that feeds ROW_NUMBER / LAG /
running ROWS frames includes a unique tiebreaker; running double sums go
through DECIMAL so prefix sums are exact. NTILE / PERCENT_RANK / CUME_DIST /
NTH_VALUE are upgrades the reference lacks.
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, sql_q

QUERIES: dict[str, Q] = {
    # ROW_NUMBER / RANK / DENSE_RANK (reference
    # WindowFunctionExecutor.java:167,177,210). p_size ties exercise
    # rank-vs-dense-rank gaps; p_partkey breaks ties for row_number.
    "win_ranking": sql_q(
        """
        SELECT p_partkey, p_brand, p_size,
               ROW_NUMBER() OVER
                 (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS rn,
               RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
               DENSE_RANK() OVER
                 (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk
        FROM part
        """,
        ("part",),
    ),
    # Running aggregates with the reference's default frame pinned
    # explicitly (ROWS UNBOUNDED PRECEDING -> CURRENT ROW;
    # WindowFunctionExecutor.java:241-333). DECIMAL keeps prefix sums exact.
    "win_running_agg": sql_q(
        """
        SELECT c_custkey, c_nationkey,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) OVER (
                 PARTITION BY c_nationkey ORDER BY c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 100 AS running_bal,
               COUNT(*) OVER (
                 PARTITION BY c_nationkey ORDER BY c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running_cnt,
               MIN(c_acctbal) OVER (
                 PARTITION BY c_nationkey ORDER BY c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running_min,
               MAX(c_acctbal) OVER (
                 PARTITION BY c_nationkey ORDER BY c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running_max
        FROM customer
        """,
        ("customer",),
    ),
    # LAG / LEAD with offset + default (reference
    # WindowFunctionExecutor.java:339,363).
    "win_lag_lead": sql_q(
        """
        SELECT o_orderkey, o_custkey, o_totalprice,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
        FROM orders
        WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        ("orders",),
    ),
    # FIRST_VALUE / LAST_VALUE; with the running frame LAST_VALUE is the
    # current row — the reference's (surprising) default semantics
    # (WindowFunctionExecutor.java:387,403-412) — pinned here explicitly,
    # plus the full-frame variant a user actually wants.
    "win_first_last": sql_q(
        """
        SELECT s_suppkey, s_nationkey, s_acctbal,
               FIRST_VALUE(s_acctbal) OVER (
                 PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS top_bal,
               LAST_VALUE(s_acctbal) OVER (
                 PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cur_bal,
               LAST_VALUE(s_acctbal) OVER (
                 PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS bottom_bal
        FROM supplier
        """,
        ("supplier",),
    ),
    # Sliding ROWS frame (parsed-but-ignored in the reference,
    # WindowFrame.java:10-49 — implemented for real here): 3-row moving avg.
    "win_sliding_frame": sql_q(
        """
        SELECT l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) OVER (
                 PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS qty_3row,
               COUNT(*) OVER (
                 PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS cnt_3row
        FROM lineitem
        WHERE l_orderkey < 2000
        """,
        ("lineitem",),
    ),
    # RANGE frame with ties: all peers of the current ORDER BY value are in
    # frame, so the result is deterministic despite ties.
    "win_range_frame": sql_q(
        """
        SELECT p_partkey, p_brand, p_size,
               CAST(SUM(CAST(p_size AS BIGINT)) OVER (
                 PARTITION BY p_brand ORDER BY p_size
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_size
        FROM part
        """,
        ("part",),
    ),
    # NTILE / PERCENT_RANK / CUME_DIST / NTH_VALUE — beyond the reference
    # (SURVEY §2.5 "NOT implemented").
    "win_distribution": sql_q(
        """
        SELECT c_custkey, c_mktsegment, c_acctbal,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               NTH_VALUE(c_acctbal, 2) OVER (
                 PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS second_bal
        FROM customer
        WINDOW w AS
          (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        """,
        ("customer",),
    ),
    # Window over a join + filter on the windowed value via derived table
    # (top-2-per-group pattern; reference wires windows at
    # kv/KvQueryExecutor.java:2815-2832).
    "win_topk_per_group": sql_q(
        """
        SELECT n_name, s_name, s_acctbal
        FROM (
          SELECT n_name, s_name, s_acctbal,
                 ROW_NUMBER() OVER (
                   PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey
                 ) AS rn
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ) t
        WHERE rn <= 2
        """,
        ("supplier", "nation"),
    ),
    # NTH_VALUE over a full frame (⬆ — absent from the reference's window
    # function set, WindowFunctionExecutor.java): 2nd-highest balance per
    # nation alongside each row.
    "win_nth_value": sql_q(
        """
        SELECT s_suppkey, s_nationkey, s_acctbal,
               NTH_VALUE(s_acctbal, 2) OVER (
                 PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_bal
        FROM supplier
        """,
        ("supplier",),
    ),
    # Time-interval RANGE frame: events in the trailing hour per user —
    # the production sliding-window shape (rate limiting, rolling usage,
    # anomaly baselines). RANGE over a TIMESTAMP order key with an
    # INTERVAL bound parses and executes identically on both engines;
    # the sum goes through scaled-int cents so the frame's money math is
    # exact and order-independent.
    "win_time_range_frame": sql_q(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_last_hour,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                    AS DOUBLE) / 100 AS val_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        """,
        ("events",),
    ),
}
