"""Coverage batch 2: arrays, lateral explode, datetime extras, grouping
sets, manual pivot, regex predicates, distinct, values tables, recursive
CTE, approx-distinct (SURVEY §2.2/§2.4/§2.8 corners + deliberate upgrades).
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, isum, sql_q

QUERIES: dict[str, Q] = {
    # ARRAY construction + functions (reference ARRAY type,
    # kv/ValueEncoder.java:317-347; kv/ArrayTypeTest.java). Dialect oracle:
    # Spark array fns vs DuckDB list fns.
    "array_ops": sql_q(
        """
        SELECT doc_id,
               SIZE(SPLIT(TRIM(text), '\\\\s+')) AS n_tok,
               ELEMENT_AT(SPLIT(TRIM(text), '\\\\s+'), 1) AS first_tok,
               ELEMENT_AT(SPLIT(TRIM(text), '\\\\s+'), -1) AS last_tok,
               ARRAY_CONTAINS(SPLIT(TRIM(text), '\\\\s+'), 'spark') AS has_spark,
               SIZE(ARRAY_DISTINCT(SPLIT(TRIM(text), '\\\\s+'))) AS n_distinct,
               SIZE(SLICE(SPLIT(TRIM(text), '\\\\s+'), 1, 5)) AS n_head
        FROM documents
        """,
        ("documents",),
        oracle="""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tok,
               string_split_regex(trim(text), '\\s+')[1] AS first_tok,
               string_split_regex(trim(text), '\\s+')[-1] AS last_tok,
               list_contains(string_split_regex(trim(text), '\\s+'), 'spark')
                 AS has_spark,
               CAST(len(list_distinct(string_split_regex(trim(text), '\\s+')))
                 AS INT) AS n_distinct,
               CAST(len(string_split_regex(trim(text), '\\s+')[1:5]) AS INT)
                 AS n_head
        FROM documents
        """,
    ),
    # LATERAL explode (flatten) — token frequency table.
    "explode_tokens": sql_q(
        """
        SELECT tok, COUNT(*) AS n
        FROM documents
        LATERAL VIEW EXPLODE(SPLIT(TRIM(text), '\\\\s+')) t AS tok
        GROUP BY tok
        """,
        ("documents",),
        oracle="""
        SELECT tok, COUNT(*) AS n FROM (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
          FROM documents
        ) GROUP BY tok
        """,
    ),
    # Sorted array_agg per group (deterministic by sorting). The graded
    # entry serializes the array to a scalar CSV at the hash boundary —
    # the correctness driver's pandas-based hasher cannot hash ARRAY
    # columns (r4 red row); array-typed forms stay library-internal.
    "array_agg_per_group": sql_q(
        """
        SELECT n_regionkey,
               ARRAY_JOIN(SORT_ARRAY(COLLECT_LIST(n_name)), ',') AS nations
        FROM nation GROUP BY n_regionkey
        """,
        ("nation",),
        oracle="""
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), ',') AS nations
        FROM nation GROUP BY n_regionkey
        """,
    ),
    # Datetime extras: DOW/DOY/QUARTER (pg-compatible numbering in both),
    # LAST_DAY, epoch seconds.
    "expr_datetime_extras": sql_q(
        """
        SELECT o_orderkey,
               CAST(EXTRACT(DOW FROM o_orderdate) AS BIGINT) AS dow,
               CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS doy,
               CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
               LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
               UNIX_TIMESTAMP(o_orderdate) AS epoch_s
        FROM orders WHERE o_orderkey < 1500
        """,
        ("orders",),
        oracle="""
        -- Spark EXTRACT(DOW) is 1-7 with Sunday=1 (= dayofweek());
        -- DuckDB/pg DOW is 0-6 with Sunday=0 -> +1 to align.
        SELECT o_orderkey,
               CAST(EXTRACT(DOW FROM o_orderdate) + 1 AS BIGINT) AS dow,
               CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS doy,
               CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
               LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        FROM orders WHERE o_orderkey < 1500
        """,
    ),
    # GROUPING SETS + GROUPING() disambiguation (upgrade; SURVEY §2.4).
    "agg_grouping_sets": sql_q(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus) AS g_status,
               GROUPING(o_orderpriority) AS g_prio,
               COUNT(*) AS n, {isum('o_orderkey % 97', 'chk')}
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        ("orders",),
    ),
    # Manual pivot via conditional aggregation (engine-portable PIVOT).
    "agg_manual_pivot": sql_q(
        """
        SELECT o_orderpriority,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority
        """,
        ("orders",),
    ),
    # Regex predicate (the engine facade also accepts pg's `~`).
    "pred_regex": sql_q(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_name RLIKE '^(red|blue|hot) [a-z]+$' AND p_partkey < 1500
        """,
        ("part",),
        oracle="""
        SELECT p_partkey, p_name
        FROM part
        WHERE regexp_matches(p_name, '^(red|blue|hot) [a-z]+$')
          AND p_partkey < 1500
        """,
    ),
    "select_distinct": sql_q(
        """
        SELECT DISTINCT c_nationkey, c_mktsegment
        FROM customer WHERE c_acctbal > 9000
        """,
        ("customer",),
    ),
    # Null-safe equality (IS NOT DISTINCT FROM — both dialects).
    "pred_null_safe_eq": sql_q(
        """
        SELECT o_orderkey
        FROM orders
        WHERE NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL
        """,
        ("orders",),
    ),
    # VALUES table source (reference LiteralSelectTest / UNION literal).
    "values_table": sql_q(
        """
        SELECT t.k, t.v * 2 AS v2
        FROM (VALUES (1, 10), (2, 20), (3, 30)) AS t(k, v)
        WHERE t.k >= 2
        """,
        (),
    ),
    # Recursive CTE (absent in the reference; Spark 4 + DuckDB both run it).
    "recursive_cte": sql_q(
        """
        WITH RECURSIVE seq(n) AS (
          SELECT 1
          UNION ALL
          SELECT n + 1 FROM seq WHERE n < 10
        )
        SELECT n, n * n AS sq FROM seq
        """,
        (),
    ),
    # approx_count_distinct within declared error of the exact count —
    # the 100 TB cardinality-estimation path (HLL++ is deterministic for
    # fixed input, so the bound check is stable).
    "agg_approx_distinct_bound": sql_q(
        """
        SELECT COUNT(DISTINCT o_custkey) AS exact_n,
               CASE WHEN
                 ABS(APPROX_COUNT_DISTINCT(o_custkey, 0.01) -
                     COUNT(DISTINCT o_custkey)) / COUNT(DISTINCT o_custkey)
                   < 0.05
               THEN 1 ELSE 0 END AS within_bound
        FROM orders
        """,
        ("orders",),
        oracle="""
        SELECT COUNT(DISTINCT o_custkey) AS exact_n, 1 AS within_bound
        FROM orders
        """,
    ),
    # approx_percentile sketch bound-checked against the exact percentile
    # (same pattern as agg_approx_distinct_bound: the sketch answer is
    # engine-specific, the BOUND is checkable cross-engine). The sketch is
    # the 100 TB path — mergeable per-partition state, no global sort.
    "agg_approx_percentile_bound": sql_q(
        """
        SELECT l_returnflag,
               CAST(PERCENTILE(l_quantity, 0.5) AS DOUBLE) AS exact_p50,
               -- an all-NULL group has no data and no sketch error: the
               -- bound claim is vacuously true (matches the oracle's 1)
               CASE WHEN PERCENTILE(l_quantity, 0.5) IS NULL THEN 1
                    WHEN ABS(APPROX_PERCENTILE(l_quantity, 0.5, 10000)
                             - PERCENTILE(l_quantity, 0.5)) <= 1.0
               THEN 1 ELSE 0 END AS within_bound
        FROM lineitem GROUP BY l_returnflag
        """,
        ("lineitem",),
        oracle="""
        SELECT l_returnflag,
               CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS exact_p50,
               1 AS within_bound
        FROM lineitem GROUP BY l_returnflag
        """,
    ),
    # Hypertable-style multi-granularity time rollup: one pass produces
    # day, month, and grand-total aggregates via GROUPING SETS over time
    # buckets (the continuous-aggregate shape; at scale a single expand +
    # one shuffle instead of three scans).
    "hypertable_rollup": sql_q(
        """
        SELECT DATE_TRUNC('month', o_orderdate) AS month,
               DATE_TRUNC('day', o_orderdate) AS day,
               GROUPING(DATE_TRUNC('day', o_orderdate)) AS g_day,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100 AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY GROUPING SETS (
          (DATE_TRUNC('month', o_orderdate), DATE_TRUNC('day', o_orderdate)),
          (DATE_TRUNC('month', o_orderdate)),
          ()
        )
        """,
        ("orders",),
        oracle="""
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(DATE_TRUNC('day', o_orderdate) AS TIMESTAMP) AS day,
               GROUPING(DATE_TRUNC('day', o_orderdate)) AS g_day,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100 AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY GROUPING SETS (
          (DATE_TRUNC('month', o_orderdate), DATE_TRUNC('day', o_orderdate)),
          (DATE_TRUNC('month', o_orderdate)),
          ()
        )
        -- Spark emits NO rows for grouping sets over empty input where
        -- pg/DuckDB emit a zero grand-total () row; the engine contract
        -- is Spark's behavior, so the oracle drops that row
        HAVING COUNT(*) > 0
        """,
    ),
    # INTERSECT ALL / EXCEPT ALL (bag semantics — upgrade over reference).
    "setop_intersect_all": sql_q(
        """
        SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT ALL
        SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'O'
        """,
        ("lineitem",),
    ),
    "setop_except_all": sql_q(
        """
        SELECT l_linenumber AS k FROM lineitem WHERE l_orderkey < 500
        EXCEPT ALL
        SELECT l_linenumber AS k FROM lineitem
        WHERE l_orderkey < 500 AND l_returnflag = 'R'
        """,
        ("lineitem",),
    ),
    # pg string-function staples round 2: split_part / initcap /
    # translate / repeat / reverse / md5 / ascii (reference string library
    # kv/FunctionRegistry; same names in both dialects).
    "expr_string_extras": sql_q(
        """
        SELECT p_partkey,
               SPLIT_PART(p_type, ' ', 1) AS type_head,
               INITCAP(p_brand) AS brand_cap,
               TRANSLATE(p_brand, '#', '-') AS brand_dash,
               REPEAT(p_brand, 2) AS brand2,
               REVERSE(p_type) AS type_rev,
               MD5(p_name) AS name_md5,
               CAST(ASCII(p_name) AS INT) AS first_code
        FROM part WHERE p_partkey < 300
        """,
        ("part",),
        # DuckDB has no initcap: spell it as first-upper + rest-lower
        # (p_brand is single-word, so this matches Spark's per-word rule)
        oracle="""
        -- NULL guard: DuckDB split_part(NULL, ...) returns '' where
        -- Spark (and pg) return NULL
        SELECT p_partkey,
               CASE WHEN p_type IS NULL THEN NULL
                    ELSE SPLIT_PART(p_type, ' ', 1) END AS type_head,
               UPPER(SUBSTR(p_brand, 1, 1)) || LOWER(SUBSTR(p_brand, 2))
                 AS brand_cap,
               TRANSLATE(p_brand, '#', '-') AS brand_dash,
               REPEAT(p_brand, 2) AS brand2,
               REVERSE(p_type) AS type_rev,
               MD5(p_name) AS name_md5,
               CAST(ASCII(p_name) AS INT) AS first_code
        FROM part WHERE p_partkey < 300
        """,
    ),
    # generate_series (pg table function) re-expressed as
    # explode(sequence(...)): the calendar spine every reporting join
    # starts from — here left-joined to daily order counts so missing
    # days surface as zeros.
    "series_calendar_fill": sql_q(
        """
        SELECT d.day, COALESCE(o.n, CAST(0 AS BIGINT)) AS n_orders
        FROM (
          SELECT EXPLODE(SEQUENCE(DATE '1995-03-01', DATE '1995-03-31')) AS day
        ) d
        LEFT JOIN (
          SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
          FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ) o ON d.day = o.day
        ORDER BY d.day
        """,
        ("orders",),
        oracle="""
        SELECT CAST(gs.day AS DATE) AS day,
               COALESCE(o.n, CAST(0 AS BIGINT)) AS n_orders
        FROM generate_series(DATE '1995-03-01', DATE '1995-03-31',
                             INTERVAL 1 DAY) AS gs(day)
        LEFT JOIN (
          SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
          FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ) o ON CAST(gs.day AS DATE) = o.day
        ORDER BY day
        """,
    ),
    # SQL-standard named windows (pg WINDOW clause): one spec shared by
    # several window functions; executes as ONE Window exchange+sort, not
    # one per function. Same string on both engines. The running sum goes
    # through DECIMAL(25,2) (exact prefix sums, engine-independent).
    "win_named_window": sql_q(
        """
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER w AS rn,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) OVER w
                    AS DOUBLE) AS running_total
        FROM orders
        WHERE o_custkey <= 100
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_custkey, rn
        """,
        ("orders",),
    ),
    # pg LATERAL join (⬆): top-2 orders per customer via a correlated
    # LATERAL subquery with LIMIT — Catalyst decorrelates it into a
    # ranked window join, not a per-row nested loop; both engines parse
    # the comma-LATERAL spelling verbatim.
    "lateral_topn_per_key": sql_q(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey <= 50
        ORDER BY c.c_custkey, t.o_orderkey
        """,
        ("customer", "orders"),
    ),
    # Ordered string aggregation (pg string_agg ... ORDER BY): Spark 4's
    # listagg WITHIN GROUP == DuckDB's string_agg with ORDER BY. The
    # deterministic ORDER BY inside the aggregate is what makes the
    # result oracle-comparable at all.
    "agg_string_agg": sql_q(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                 AS nations
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
        """,
        ("nation",),
        oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
        """,
    ),
    # pg FILTER (WHERE ...) aggregate clause — per-aggregate predicates
    # without CASE scaffolding; same SQL both engines. The filtered money
    # sum goes through scaled-int cents (exact, order-independent).
    "agg_filter_clause": sql_q(
        """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) / 100
                 AS rev_o
        FROM orders GROUP BY o_orderpriority
        """,
        ("orders",),
    ),
    # Explicit NULLS FIRST/LAST with LIMIT: engine DEFAULTS diverge
    # (Spark: ASC nulls first / DESC nulls last; DuckDB: the reverse), so
    # any LIMIT over a nullable sort key is only well-defined with the
    # ordering spelled out — this entry pins the explicit form that users
    # must write, exercised with real NULLs in the adversarial net.
    "sort_explicit_null_order": sql_q(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        ORDER BY c_acctbal DESC NULLS LAST, c_custkey
        LIMIT 50
        """,
        ("customer",),
    ),
}
