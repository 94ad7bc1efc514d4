"""Coverage batch 5 (round 5): modern-SQL surface upgrades beyond the
reference's Calcite grammar — QUALIFY (through the pg/modern-SQL
preprocessor, so the graded rows exercise the rewrite end-to-end),
IGNORE NULLS window navigation, ordered-set aggregates
(``WITHIN GROUP``), boolean aggregates, and ``LISTAGG``.

The reference's window executor (window/WindowFunctionExecutor.java) has
no null-skipping navigation and its grammar (kv/CalciteSqlParser.java)
stops at plain aggregates; these are deliberate upgrades a training-data
pipeline reaches for constantly (LOCF gap-fill, exact medians, top-n
without a subquery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_sql_spark.io import register
from cassandra_sql_spark.queries.base import Q
from cassandra_sql_spark.sqlfront.preprocess import preprocess


def pg_q(sql: str, tables: tuple[str, ...], oracle: str) -> Q:
    """A query whose Spark side goes THROUGH ``preprocess`` — the graded
    entry covers the rewrite, not just the hand-rewritten output."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register(spark, sf_dir, *tables)
        return spark.sql(preprocess(sql))

    return Q(fn, oracle)


from cassandra_sql_spark.queries.base import sql_q  # noqa: E402

QUERIES: dict[str, Q] = {
    # QUALIFY: filter on a window function without the subquery
    # (DuckDB/Snowflake/BigQuery surface; _rewrite_qualify injects the
    # predicate into the same projection and peels it with * EXCEPT).
    # Top-2 orders per customer; o_orderkey breaks price ties so the kept
    # rows are a deterministic set.
    "qualify_topn": pg_q(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) <= 2
        """,
        ("orders",),
        oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) <= 2
        """,
    ),
    # QUALIFY referencing a select-list ALIAS: resolves via Spark's
    # lateral column aliases after the rewrite (native in DuckDB). RANK
    # keeps ties, so no tiebreaker is needed for determinism.
    "qualify_alias_filter": pg_q(
        """
        SELECT c_nationkey, c_custkey, c_acctbal,
               RANK() OVER (
                 PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
        FROM customer
        QUALIFY rnk = 1
        """,
        ("customer",),
        oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal,
               RANK() OVER (
                 PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
        FROM customer
        QUALIFY rnk = 1
        """,
    ),
    # IGNORE NULLS navigation: last-observation-carried-forward gap-fill
    # (the sensor/feature-backfill idiom) + the previous non-null value.
    # The sparse column is synthesized with NULLIF so the entry is
    # self-contained on NULL-free TPC-H data. Dialect split: Spark puts
    # IGNORE NULLS after the call, DuckDB inside the parens.
    "win_ignore_nulls_fill": sql_q(
        """
        SELECT o_orderkey, o_custkey,
               LAST_VALUE(CASE WHEN o_orderstatus = 'F'
                               THEN o_totalprice END) IGNORE NULLS OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_f_price,
               LAG(CASE WHEN o_orderstatus = 'F'
                        THEN o_totalprice END) IGNORE NULLS OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev_f_price
        FROM orders
        WHERE o_custkey < 500
        """,
        ("orders",),
        oracle="""
        SELECT o_orderkey, o_custkey,
               LAST_VALUE(CASE WHEN o_orderstatus = 'F'
                               THEN o_totalprice END IGNORE NULLS) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_f_price,
               LAG(CASE WHEN o_orderstatus = 'F'
                        THEN o_totalprice END IGNORE NULLS) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev_f_price
        FROM orders
        WHERE o_custkey < 500
        """,
    ),
    # Ordered-set aggregates: SQL-standard WITHIN GROUP spelling for
    # exact interpolated/discrete percentiles (same linear interpolation
    # both engines, see agg_percentiles precedent).
    "agg_within_group": sql_q(
        """
        SELECT l_returnflag,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
                 AS median_qty,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)
                 AS q1_qty,
               percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice)
                 AS p90_price
        FROM lineitem
        GROUP BY l_returnflag
        """,
        ("lineitem",),
    ),
    # Boolean aggregates + COUNT_IF (pg bool_and/bool_or; the reference
    # has no boolean aggregate at all).
    "agg_bool_countif": sql_q(
        """
        SELECT o_orderpriority,
               bool_and(o_totalprice > 1000.0) AS all_over_1k,
               bool_or(o_orderstatus = 'F') AS any_finished,
               CAST(count_if(o_totalprice > 150000.0) AS BIGINT) AS n_big
        FROM orders
        GROUP BY o_orderpriority
        """,
        ("orders",),
    ),
    # LIKE ANY / NOT LIKE ALL multi-pattern predicates (Spark-native
    # spelling; DuckDB has no LIKE ANY over a literal list, so the
    # oracle expands to the equivalent OR / AND-of-negations — which is
    # exactly what Catalyst rewrites the predicate into).
    # Patterns drawn from the fixture's actual domain (p_type in
    # ECONOMY/STANDARD/..., p_name 'red bolt'-style) so every predicate
    # arm both matches and prunes rows — tests/test_registry.py audits
    # the whole registry against 0-row fixtures.
    "pred_like_any_all": sql_q(
        """
        SELECT p_partkey, p_type
        FROM part
        WHERE p_type LIKE ANY ('ECO%', 'STA%')
          AND p_name NOT LIKE ALL ('%red%', '%blue%')
        """,
        ("part",),
        oracle="""
        SELECT p_partkey, p_type
        FROM part
        WHERE (p_type LIKE 'ECO%' OR p_type LIKE 'STA%')
          AND (p_name NOT LIKE '%red%' AND p_name NOT LIKE '%blue%')
        """,
    ),
    # FILTER (WHERE ...) on WINDOW aggregates: pg/DuckDB surface Spark
    # rejects outright ("filter predicate not supported yet") —
    # _rewrite_window_filter turns the predicate into the CASE argument
    # (exact equivalent: aggregates skip NULLs). The Spark side runs
    # THROUGH the preprocessor; DuckDB executes the native spelling.
    "win_filter_clause": pg_q(
        """
        SELECT o_orderkey, o_custkey,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F')
                 OVER w AS BIGINT) AS n_finished_so_far,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 FILTER (WHERE o_totalprice > 100000.0)
                 OVER w AS DOUBLE) / 100 AS big_total_so_far
        FROM orders
        WHERE o_custkey < 300
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        ("orders",),
        oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F')
                 OVER w AS BIGINT) AS n_finished_so_far,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 FILTER (WHERE o_totalprice > 100000.0)
                 OVER w AS DOUBLE) / 100 AS big_total_so_far
        FROM orders
        WHERE o_custkey < 300
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
    ),
    # TRY_CAST: error-safe coercion (NULL instead of failure/garbage) —
    # the ingestion-time idiom for semi-trusted columns. Cases stick to
    # clean-integer vs clearly-invalid strings: the engines agree there,
    # while fractional strings diverge (DuckDB rounds '3.9'->4, Spark
    # yields NULL) — that divergence is documented here, not graded.
    "expr_try_cast": sql_q(
        """
        SELECT o_orderkey,
               TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT)
                 AS prio_num,
               TRY_CAST(o_orderpriority AS BIGINT) AS junk_to_null,
               TRY_CAST(o_orderstatus AS BIGINT) AS status_to_null,
               COALESCE(TRY_CAST(o_orderstatus AS BIGINT), -1)
                 AS with_default
        FROM orders WHERE o_orderkey < 1000
        """,
        ("orders",),
    ),
    # Bitwise expression + aggregate family (absent from the reference's
    # expression set): operators &, |, xor, shifts, popcount, and the
    # bit_and/bit_or/bit_xor reduction aggregates. Dialect split on xor
    # (Spark infix ^, DuckDB xor()) and shifts (Spark shiftleft/right
    # functions, DuckDB << >>).
    "expr_bitwise": sql_q(
        """
        SELECT o_orderkey,
               CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
               CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
               CAST(o_orderkey ^ 170 AS BIGINT) AS xored,
               CAST(shiftleft(o_orderkey, 3) AS BIGINT) AS shl3,
               CAST(shiftright(o_orderkey, 2) AS BIGINT) AS shr2,
               CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        FROM orders WHERE o_orderkey < 2000
        """,
        ("orders",),
        oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
               CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
               CAST(xor(o_orderkey, 170) AS BIGINT) AS xored,
               CAST(o_orderkey << 3 AS BIGINT) AS shl3,
               CAST(o_orderkey >> 2 AS BIGINT) AS shr2,
               CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        FROM orders WHERE o_orderkey < 2000
        """,
    ),
    "agg_bitwise": sql_q(
        """
        SELECT o_orderpriority,
               CAST(bit_and(o_orderkey) AS BIGINT) AS key_and,
               CAST(bit_or(o_orderkey) AS BIGINT) AS key_or,
               CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor
        FROM orders GROUP BY o_orderpriority
        """,
        ("orders",),
    ),
    # Statistical aggregates (CORR / REGR_* / STDDEV): the bivariate
    # statistics family the reference's aggregate set lacks entirely.
    # Both engines accumulate co-moments whose final ulps depend on the
    # partial-merge order, so every statistic lands as DECIMAL(18,6) ->
    # DOUBLE (the dedup_embedding_cosine convention).
    "agg_stats_regression": sql_q(
        """
        SELECT l_returnflag,
               CAST(CAST(corr(l_extendedprice, l_quantity)
                    AS DECIMAL(18,6)) AS DOUBLE) AS price_qty_corr,
               CAST(CAST(regr_slope(l_extendedprice, l_quantity)
                    AS DECIMAL(18,6)) AS DOUBLE) AS slope,
               CAST(CAST(regr_intercept(l_extendedprice, l_quantity)
                    AS DECIMAL(18,6)) AS DOUBLE) AS intercept,
               CAST(CAST(regr_r2(l_extendedprice, l_quantity)
                    AS DECIMAL(18,6)) AS DOUBLE) AS r2,
               CAST(CAST(stddev_samp(l_quantity)
                    AS DECIMAL(18,6)) AS DOUBLE) AS qty_stddev
        FROM lineitem
        GROUP BY l_returnflag
        """,
        ("lineitem",),
    ),
    # Mergeable HLL sketches (Apache DataSketches via Spark 4
    # hll_sketch_agg / hll_union_agg): per-shard sketches unioned into
    # the corpus-wide distinct count WITHOUT rescanning shards — the
    # operating mode for distinct statistics at 100 TB (each ingest
    # batch persists its sketch; corpus cardinality is a union over
    # sketch blobs, never a COUNT DISTINCT over 100 TB). The estimate is
    # engine-specific, so the graded claim is the cross-engine-checkable
    # BOUND (same pattern as agg_approx_distinct_bound);
    # tests/test_semantics.py pins that the union of per-source sketches
    # estimates IDENTICALLY to one global sketch (lossless merge).
    # NULLIF(text, '') on BOTH sides: DataSketches ignores empty-string
    # updates (a no-op per its update(String) contract) while
    # COUNT(DISTINCT) counts '' — found by the adversarial corpus suite;
    # excluding empties makes the estimate and the exact count range
    # over the same key set. The bound carries a +-1 absolute floor for
    # tiny corpora where the union estimator's last-ulp wobble exceeds
    # 5% of a single-digit count.
    "sketch_shard_merge": sql_q(
        """
        WITH shard AS (
          SELECT source, hll_sketch_agg(NULLIF(text, '')) AS s
          FROM documents GROUP BY source
        ),
        exact AS (SELECT COUNT(DISTINCT NULLIF(text, '')) AS exact_texts
                  FROM documents)
        SELECT exact.exact_texts,
               CAST(COUNT(*) AS BIGINT) AS n_shards,
               CASE WHEN
                 ABS(hll_sketch_estimate(hll_union_agg(s))
                     - exact.exact_texts)
                 <= GREATEST(0.05 * exact.exact_texts, 1.0)
               THEN 1 ELSE 0 END AS within_bound
        FROM shard CROSS JOIN exact
        GROUP BY exact.exact_texts
        """,
        ("documents",),
        oracle="""
        SELECT COUNT(DISTINCT NULLIF(text, '')) AS exact_texts,
               (SELECT CAST(COUNT(DISTINCT source) AS BIGINT)
                FROM documents) AS n_shards,
               1 AS within_bound
        FROM documents
        """,
    ),
    # LISTAGG ... WITHIN GROUP (ORDER BY ...): the SQL-standard ordered
    # string aggregate (Spark 4 native; DuckDB spells it string_agg with
    # an inline ORDER BY).
    "agg_listagg": sql_q(
        """
        SELECT r.r_name, listagg(n.n_name, ',')
                 WITHIN GROUP (ORDER BY n.n_name) AS nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """,
        ("region", "nation"),
        oracle="""
        SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name)
                 AS nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """,
    ),
}
