"""Coverage batch 6 (round 6): modern-SQL surface upgrades — GROUP BY
ALL, SELECT * EXCEPT/EXCLUDE, UNPIVOT, quantified comparison
subqueries (ALL/ANY/SOME through the preprocessor: Spark has no
quantified comparisons, so ``x > ALL (sub)`` rewrites to a scalar
MIN/MAX subquery — `_rewrite_quantified`), and the string-function
tail (split_part / levenshtein / translate, regexp extract/replace).

The reference's Calcite grammar (kv/CalciteSqlParser.java) has none of
these; they are the everyday idioms of analyst SQL and training-data
wrangling (UNPIVOT for metric long-format, regexp for field
extraction, quantified subqueries for threshold screens).
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, sql_q
from cassandra_sql_spark.queries.modern_sql import pg_q

QUERIES: dict[str, Q] = {
    # GROUP BY ALL: every non-aggregate select item becomes a grouping
    # key (identical semantics both engines).
    "agg_group_by_all": sql_q(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS DOUBLE) / 100 AS revenue
        FROM orders
        GROUP BY ALL
        """,
        ("orders",),
    ),
    # SELECT * minus named columns — dialect split: Spark spells it
    # `* EXCEPT (...)`, DuckDB `* EXCLUDE (...)`.
    "select_star_except": sql_q(
        """
        SELECT * EXCEPT (o_orderdate, o_orderpriority)
        FROM orders
        WHERE o_orderkey < 500
        """,
        ("orders",),
        oracle="""
        SELECT * EXCLUDE (o_orderdate, o_orderpriority)
        FROM orders
        WHERE o_orderkey < 500
        """,
    ),
    # UNPIVOT to long format (same syntax both engines). Metric labels
    # are the source column names on both sides.
    "unpivot_measures": sql_q(
        """
        SELECT o_orderkey, metric, val
        FROM (
          SELECT o_orderkey,
                 o_totalprice AS price,
                 CAST(o_orderkey % 97 AS DOUBLE) AS checksum
          FROM orders WHERE o_orderkey < 400
        ) UNPIVOT (val FOR metric IN (price, checksum))
        """,
        ("orders",),
    ),
    # Quantified comparison subqueries: Spark side runs THROUGH the
    # preprocessor (`> ALL` -> scalar MAX subquery, `< ANY` -> scalar
    # MAX subquery, `= ANY` -> IN); DuckDB executes the native
    # quantified spelling. Fixture subqueries are non-empty and
    # NULL-free, where the rewrite is exact (divergence on empty/NULL
    # sets documented at `_rewrite_quantified`).
    "subq_quantified": pg_q(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > ALL (
                SELECT s_acctbal FROM supplier WHERE s_nationkey = 3
              )
          AND c_nationkey = ANY (
                SELECT n_nationkey FROM nation WHERE n_regionkey <= 2
              )
        """,
        ("customer", "supplier", "nation"),
        oracle="""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > ALL (
                SELECT s_acctbal FROM supplier WHERE s_nationkey = 3
              )
          AND c_nationkey = ANY (
                SELECT n_nationkey FROM nation WHERE n_regionkey <= 2
              )
        """,
    ),
    # String-function tail: split_part / levenshtein / translate agree
    # byte-for-byte across engines.
    # DuckDB quirk: split_part(NULL, ...) returns '' instead of NULL
    # (non-standard; Spark and Postgres both propagate NULL), so the
    # oracle guards the NULL case explicitly. Exposed by the adversarial
    # TPC-H fixture's NULL o_orderpriority rows.
    "expr_string_funcs2": sql_q(
        """
        SELECT o_orderkey,
               split_part(o_orderpriority, '-', 2) AS prio_word,
               CAST(levenshtein(o_orderstatus, 'OF') AS BIGINT) AS lev,
               translate(o_orderpriority, '12345', 'abcde') AS trans
        FROM orders WHERE o_orderkey < 600
        """,
        ("orders",),
        oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderpriority IS NULL THEN NULL
                    ELSE split_part(o_orderpriority, '-', 2) END AS prio_word,
               CAST(levenshtein(o_orderstatus, 'OF') AS BIGINT) AS lev,
               translate(o_orderpriority, '12345', 'abcde') AS trans
        FROM orders WHERE o_orderkey < 600
        """,
    ),
    # Regexp extraction/replacement. Spark's regexp_replace is global
    # by default; DuckDB needs the explicit 'g' flag.
    "expr_regexp_funcs": sql_q(
        """
        SELECT p_partkey,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
               regexp_replace(p_name, '[aeiou]', '_') AS devoweled
        FROM part WHERE p_partkey < 700
        """,
        ("part",),
        oracle="""
        SELECT p_partkey,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        FROM part WHERE p_partkey < 700
        """,
    ),
    # Typed INTERVAL arithmetic on timestamps and dates (the reference
    # stores intervals as ISO strings and cannot compute with them,
    # kv/TableMetadata.java:348-349; both engines here share the
    # `INTERVAL n UNIT` literal syntax). Results are cast to concrete
    # TIMESTAMP/DATE so output types agree.
    "expr_interval_typed": sql_q(
        """
        SELECT event_id,
               CAST(ts + INTERVAL 90 MINUTE AS TIMESTAMP) AS due,
               CAST(ts - INTERVAL 1 DAY AS TIMESTAMP) AS day_before,
               CAST(CAST(ts AS DATE) + INTERVAL 7 DAY AS DATE) AS review_day
        FROM events WHERE event_id < 300
        ORDER BY event_id
        """,
        ("events",),
    ),
    # width_bucket histogram (equi-width binning). DuckDB has no
    # width_bucket; the oracle spells out the same bucketing with the
    # bin width chosen binary-exact (8000/16 = 500) so the arithmetic
    # agrees to the last ulp.
    "expr_width_bucket": sql_q(
        """
        SELECT CAST(WIDTH_BUCKET(o_totalprice, 0, 8000, 16) AS BIGINT)
                 AS bucket,
               COUNT(*) AS n
        FROM orders
        GROUP BY WIDTH_BUCKET(o_totalprice, 0, 8000, 16)
        ORDER BY bucket
        """,
        ("orders",),
        oracle="""
        WITH b AS (
          SELECT CASE WHEN o_totalprice < 0 THEN 0
                      WHEN o_totalprice >= 8000 THEN 17
                      ELSE CAST(FLOOR(o_totalprice / 500) + 1 AS BIGINT)
                 END AS bucket
          FROM orders
        )
        SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket ORDER BY bucket
        """,
    ),
    # posexplode / UNNEST WITH ORDINALITY: element position travels with
    # the value. DuckDB lacks WITH ORDINALITY; generate_subscripts
    # zipped with unnest is the equivalent.
    "explode_ordinality": sql_q(
        """
        SELECT p_partkey, CAST(pos + 1 AS BIGINT) AS ord, word
        FROM part
        LATERAL VIEW POSEXPLODE(SPLIT(p_name, ' ')) t AS pos, word
        WHERE p_partkey < 300
        ORDER BY p_partkey, ord
        """,
        ("part",),
        oracle="""
        SELECT p_partkey, CAST(o AS BIGINT) AS ord, w AS word FROM (
          SELECT p_partkey,
                 UNNEST(string_split(p_name, ' ')) AS w,
                 generate_subscripts(string_split(p_name, ' '), 1) AS o
          FROM part WHERE p_partkey < 300
        ) x ORDER BY p_partkey, ord
        """,
    ),
    # ANSI-standard string spellings (SUBSTRING FROM/FOR, POSITION IN,
    # TRIM BOTH/LEADING FROM, OVERLAY PLACING): the keyword forms many
    # tools emit. DuckDB has no OVERLAY — the oracle composes it from
    # substr || replacement || substr.
    "expr_ansi_string_spellings": sql_q(
        """
        SELECT p_partkey,
               SUBSTRING(p_name FROM 2 FOR 5) AS sub,
               CAST(POSITION('a' IN p_name) AS BIGINT) AS pos_a,
               TRIM(BOTH 'x' FROM 'xx' || p_brand || 'xx') AS btrim,
               TRIM(LEADING '#' FROM '##' || p_type) AS ltrim_hash,
               OVERLAY(p_brand PLACING 'ZZ' FROM 1 FOR 2) AS overlaid
        FROM part WHERE p_partkey < 300
        ORDER BY p_partkey
        """,
        ("part",),
        oracle="""
        SELECT p_partkey,
               SUBSTRING(p_name FROM 2 FOR 5) AS sub,
               CAST(POSITION('a' IN p_name) AS BIGINT) AS pos_a,
               TRIM(BOTH 'x' FROM 'xx' || p_brand || 'xx') AS btrim,
               TRIM(LEADING '#' FROM '##' || p_type) AS ltrim_hash,
               'ZZ' || SUBSTR(p_brand, 3) AS overlaid
        FROM part WHERE p_partkey < 300
        ORDER BY p_partkey
        """,
    ),
    # Deterministic MODE: most frequent value per group with ties broken
    # by the value itself (both engines' native mode() picks an
    # unspecified row on ties, so the portable form is the windowed one).
    "agg_mode_deterministic": sql_q(
        """
        WITH c AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
          FROM orders GROUP BY o_orderstatus, o_orderpriority
        )
        SELECT o_orderstatus, o_orderpriority AS modal_priority, cnt
        FROM (
          SELECT o_orderstatus, o_orderpriority, cnt,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY cnt DESC, o_orderpriority) AS rn
          FROM c
        ) x
        WHERE rn = 1
        ORDER BY o_orderstatus
        """,
        ("orders",),
    ),
    # Higher-moment aggregates: skewness / excess kurtosis / covariance.
    # Spark's skewness/kurtosis are the POPULATION moments (g1 = m3/m2^1.5,
    # g2 = m4/m2^2 - 3) while DuckDB's builtins apply the sample
    # correction, so the oracle recomputes the population moments
    # (with a null-safe join: a NULL group key keeps its group)
    # explicitly from a two-pass centered AVG (numerically stable — no
    # raw-moment cancellation). covar_pop/covar_samp agree natively.
    # Quantized at 6 decimals (skew/kurt are O(1)) / 2 decimals (covar is
    # O(price*qty)) to absorb summation-order ulps on both engines.
    "agg_higher_moments": sql_q(
        """
        SELECT l_returnflag,
               CAST(CAST(skewness(l_quantity) AS DECIMAL(18,6))
                    AS DOUBLE) AS qty_skew,
               CAST(CAST(kurtosis(l_quantity) AS DECIMAL(18,6))
                    AS DOUBLE) AS qty_kurt,
               CAST(CAST(covar_pop(l_quantity, l_extendedprice)
                    AS DECIMAL(18,2)) AS DOUBLE) AS qp_covar_pop,
               CAST(CAST(covar_samp(l_quantity, l_extendedprice)
                    AS DECIMAL(18,2)) AS DOUBLE) AS qp_covar_samp
        FROM lineitem
        GROUP BY l_returnflag
        """,
        ("lineitem",),
        oracle="""
        WITH mu AS (
          SELECT l_returnflag, AVG(l_quantity) AS m
          FROM lineitem GROUP BY l_returnflag
        ),
        c AS (
          SELECT l.l_returnflag,
                 AVG(POWER(l.l_quantity - mu.m, 2)) AS m2,
                 AVG(POWER(l.l_quantity - mu.m, 3)) AS m3,
                 AVG(POWER(l.l_quantity - mu.m, 4)) AS m4,
                 covar_pop(l.l_quantity, l.l_extendedprice) AS cp,
                 covar_samp(l.l_quantity, l.l_extendedprice) AS cs
          FROM lineitem l JOIN mu
            ON l.l_returnflag IS NOT DISTINCT FROM mu.l_returnflag
          GROUP BY l.l_returnflag
        )
        SELECT l_returnflag,
               CAST(CAST(m3 / POWER(m2, 1.5) AS DECIMAL(18,6))
                    AS DOUBLE) AS qty_skew,
               CAST(CAST(m4 / (m2 * m2) - 3.0 AS DECIMAL(18,6))
                    AS DOUBLE) AS qty_kurt,
               CAST(CAST(cp AS DECIMAL(18,2)) AS DOUBLE) AS qp_covar_pop,
               CAST(CAST(cs AS DECIMAL(18,2)) AS DOUBLE) AS qp_covar_samp
        FROM c
        """,
    ),
    # Share-of-total / ratio_to_report: per-row fraction of the group
    # total plus the running cumulative share in descending-value order
    # (the "top customers' orders cover X% of their spend" report shape).
    # One window partition (= one shuffle on o_custkey) serves both
    # frames. Identical ANSI SQL on both engines.
    "win_ratio_to_report": sql_q(
        """
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice
                    / SUM(o_totalprice) OVER (PARTITION BY o_custkey)
                    AS DECIMAL(18,6)) AS DOUBLE) AS share,
               CAST(CAST(SUM(o_totalprice) OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      ROWS UNBOUNDED PRECEDING)
                    / SUM(o_totalprice) OVER (PARTITION BY o_custkey)
                    AS DECIMAL(18,6)) AS DOUBLE) AS cum_share
        FROM orders
        WHERE o_custkey < 200
        """,
        ("orders",),
    ),
    # FETCH FIRST n ROWS WITH TIES (pg / SQL standard; Spark has no
    # WITH TIES): the preprocessor rewrites to a RANK() <= n filter
    # under the same ordering, so boundary ties survive. Ordering on
    # l_quantity (50 distinct values) makes the tie semantics the whole
    # answer: the first 10 ranked rows share quantity 1, so every
    # quantity-1 row comes back, not 10 of them. Plan note: rank-limit
    # compiles to a WindowGroupLimit partial below the exchange — the
    # same top-n pushdown QUALIFY gets.
    "fetch_with_ties": pg_q(
        """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        ORDER BY l_quantity
        FETCH FIRST 10 ROWS WITH TIES
        """,
        ("lineitem",),
        oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity FROM (
          SELECT l_orderkey, l_linenumber, l_quantity,
                 RANK() OVER (ORDER BY l_quantity) AS rk
          FROM lineitem
        ) WHERE rk <= 10
        """,
    ),
    # GROUPING() disambiguates real NULL group keys from the NULLs
    # ROLLUP synthesizes for subtotal rows (identical semantics both
    # engines; Spark returns TINYINT, DuckDB BIGINT -> CAST to INT).
    "agg_grouping_function": sql_q(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        ("orders",),
    ),
    # Rolling lag-1 autocorrelation of the purchase value series: corr()
    # as a WINDOW aggregate over a 50-row sliding frame (one shuffle on
    # the partition key; the frame evaluation is streaming within each
    # partition). Rows before the frame fills are dropped by rank on
    # BOTH engines — DuckDB yields NaN and Spark NULL for degenerate
    # frames, so the portable form never emits them. Quantized 6dp.
    "win_rolling_corr": sql_q(
        """
        SELECT event_id, rc FROM (
          SELECT event_id,
                 ROW_NUMBER() OVER (ORDER BY ts) AS rn,
                 CAST(CAST(corr(value, prev_value) OVER (
                        ORDER BY ts
                        ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
                      AS DECIMAL(18,6)) AS DOUBLE) AS rc
          FROM (
            SELECT event_id, ts, value,
                   LAG(value) OVER (ORDER BY ts) AS prev_value
            FROM events WHERE event_type = 'purchase'
          ) lagged
        ) x WHERE rn >= 51
        """,
        ("events",),
    ),
    # Chi-square independence test (event_type x weekday contingency):
    # observed vs expected from the marginals, all exact integer counts
    # until the final ratio — one aggregation pass builds the cells, the
    # marginals are window sums over |cells| rows. The engines only
    # differ in the weekday expression (handled like pivot_native).
    "stat_chi_square": sql_q(
        """
        WITH cells AS (
          SELECT dayofweek(ts) - 1 AS dow, event_type,
                 COUNT(*) AS o
          FROM events GROUP BY dayofweek(ts) - 1, event_type
        ),
        m AS (
          SELECT dow, event_type, o,
                 SUM(o) OVER (PARTITION BY dow) AS row_tot,
                 SUM(o) OVER (PARTITION BY event_type) AS col_tot,
                 SUM(o) OVER () AS n
          FROM cells
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST((COUNT(DISTINCT dow) - 1)
                    * (COUNT(DISTINCT event_type) - 1) AS BIGINT) AS dof,
               CAST(CAST(SUM(
                 POWER(o - CAST(row_tot * col_tot AS DOUBLE) / n, 2)
                 / (CAST(row_tot * col_tot AS DOUBLE) / n)
               ) AS DECIMAL(18,6)) AS DOUBLE) AS chi2
        FROM m
        """,
        ("events",),
        oracle="""
        WITH cells AS (
          SELECT CAST(extract(dow FROM ts) AS INTEGER) AS dow, event_type,
                 COUNT(*) AS o
          FROM events
          GROUP BY CAST(extract(dow FROM ts) AS INTEGER), event_type
        ),
        m AS (
          SELECT dow, event_type, o,
                 SUM(o) OVER (PARTITION BY dow) AS row_tot,
                 SUM(o) OVER (PARTITION BY event_type) AS col_tot,
                 SUM(o) OVER () AS n
          FROM cells
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST((COUNT(DISTINCT dow) - 1)
                    * (COUNT(DISTINCT event_type) - 1) AS BIGINT) AS dof,
               CAST(CAST(SUM(
                 POWER(o - CAST(row_tot * col_tot AS DOUBLE) / n, 2)
                 / (CAST(row_tot * col_tot AS DOUBLE) / n)
               ) AS DECIMAL(18,6)) AS DOUBLE) AS chi2
        FROM m
        """,
    ),
    # Period-over-period change (the daily-revenue pct_change report):
    # exact scaled-integer daily totals, LAG ratio with a NULLIF guard
    # (a zero-revenue day must yield NULL, not an ANSI divide error).
    # One aggregation + one window over |days| rows. NULL-ts rows are
    # excluded: a date series has no NULL bucket, and the engines order
    # NULLs on opposite ends of the LAG window (adversarial net).
    "series_pct_change": sql_q(
        """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100 AS revenue
          FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL
          GROUP BY CAST(ts AS DATE)
        )
        SELECT day, revenue,
               CAST(CAST(
                 (revenue - LAG(revenue) OVER (ORDER BY day))
                 / NULLIF(LAG(revenue) OVER (ORDER BY day), 0)
               AS DECIMAL(18,6)) AS DOUBLE) AS pct_change
        FROM daily
        """,
        ("events",),
    ),
    # Leave-one-out group mean (the standard target-encoding /
    # peer-comparison transform: each row scored against its group
    # WITHOUT itself). Spark has no frame EXCLUDE CURRENT ROW; the
    # exact scaled-integer identity (group_sum - x) / (n - 1) gives the
    # same number deterministically — and is the better plan anyway
    # (one unbounded window, no per-row frame scan). Singleton groups
    # NULL out via NULLIF instead of raising under ANSI mode. The 6dp
    # quantization is the FLOOR(x*1e6+0.5) half-up form, NOT a DECIMAL
    # cast: the exact rational results land on dyadic ties (.0078125)
    # where Spark's HALF_UP and DuckDB's double->DECIMAL rounding
    # disagree on the 6th decimal.
    "win_leave_one_out": sql_q(
        """
        SELECT event_id, event_type,
               CAST(CAST(FLOOR(
                 CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        OVER (PARTITION BY event_type)
                      - CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                   AS DOUBLE) / 100
                 / NULLIF(COUNT(value) OVER (PARTITION BY event_type)
                          - 1, 0)
                 * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000
                 AS loo_mean
        FROM events
        WHERE value IS NOT NULL
        """,
        ("events",),
    ),
    # Median absolute deviation (the robust spread statistic quality
    # pipelines prefer over stddev on heavy-tailed metrics): two exact
    # percentile passes — group medians (a model-sized table), then the
    # median of |x - med| with the medians joined back. Spark's exact
    # percentile() and DuckDB's quantile_cont share the (n-1)p linear
    # interpolation bit-for-bit on DOUBLE input (probed; DECIMAL input
    # diverges, so the oracle never lets values decay to DECIMAL).
    "agg_mad_robust": sql_q(
        """
        WITH med AS (
          SELECT event_type, percentile(value, 0.5) AS med
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(CAST(MAX(med.med) AS DECIMAL(18,6)) AS DOUBLE)
                 AS median_v,
               CAST(CAST(percentile(ABS(e.value - med.med), 0.5)
                    AS DECIMAL(18,6)) AS DOUBLE) AS mad
        FROM events e JOIN med ON e.event_type = med.event_type
        GROUP BY e.event_type
        """,
        ("events",),
        oracle="""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(CAST(MAX(med.med) AS DECIMAL(18,6)) AS DOUBLE)
                 AS median_v,
               CAST(CAST(quantile_cont(ABS(e.value - med.med), 0.5)
                    AS DECIMAL(18,6)) AS DOUBLE) AS mad
        FROM events e JOIN med ON e.event_type = med.event_type
        GROUP BY e.event_type
        """,
    ),
    # 5-95 trimmed mean: per-group percentile cutoffs (model-sized,
    # broadcast back) then one filtered aggregation — the outlier-robust
    # mean for bid/latency/price metrics. The cutoff doubles are
    # identical on both engines (same interpolation), so the kept-row
    # set is identical; the mean uses the exact scaled-integer sum.
    "agg_trimmed_mean": sql_q(
        """
        WITH b AS (
          SELECT event_type,
                 percentile(value, 0.05) AS lo,
                 percentile(value, 0.95) AS hi
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(CAST(
                 CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100 / COUNT(*)
               AS DECIMAL(18,6)) AS DOUBLE) AS trimmed_mean
        FROM events e JOIN b ON e.event_type = b.event_type
        WHERE e.value BETWEEN b.lo AND b.hi
        GROUP BY e.event_type
        """,
        ("events",),
        oracle="""
        WITH b AS (
          SELECT event_type,
                 quantile_cont(value, 0.05) AS lo,
                 quantile_cont(value, 0.95) AS hi
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(CAST(
                 CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100 / COUNT(*)
               AS DECIMAL(18,6)) AS DOUBLE) AS trimmed_mean
        FROM events e JOIN b ON e.event_type = b.event_type
        WHERE e.value BETWEEN b.lo AND b.hi
        GROUP BY e.event_type
        """,
    ),
    # Two-sample A/B comparison (Welch z on the purchase value metric,
    # arms by user-id hash parity — the deterministic assignment every
    # experimentation pipeline uses): per-arm n/mean/variance partials
    # combine map-side; the z statistic is scalar math over the 2-row
    # aggregate. Identical ANSI SQL on both engines.
    "stat_ab_welch_z": sql_q(
        """
        WITH arms AS (
          SELECT user_id % 2 AS arm,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 AVG(value) AS mean_v,
                 var_samp(value) AS var_v
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id % 2
        )
        SELECT a.n AS n_a, b.n AS n_b,
               CAST(CAST(a.mean_v AS DECIMAL(18,6)) AS DOUBLE) AS mean_a,
               CAST(CAST(b.mean_v AS DECIMAL(18,6)) AS DOUBLE) AS mean_b,
               CAST(CAST((b.mean_v - a.mean_v)
                    / SQRT(a.var_v / a.n + b.var_v / b.n)
                    AS DECIMAL(18,6)) AS DOUBLE) AS welch_z
        FROM arms a JOIN arms b ON a.arm = 0 AND b.arm = 1
        """,
        ("events",),
    ),
    # Native PIVOT clause (long -> wide): day-of-week x event-type count
    # matrix. Spark spells value aliases inline; DuckDB names the output
    # columns after the bare IN literals — the aliases keep the two
    # column sets identical. Spark leaves a cell with NO source rows
    # NULL where DuckDB's COUNT writes 0 (adversarial net); COALESCE
    # restores count semantics. dayofweek(ts)-1 == DuckDB's extract(dow)
    # (0 = Sunday). At scale this is one hash aggregate on (dow) with
    # map-side partials — the pivot is a projection, not a shuffle.
    "pivot_native": sql_q(
        """
        SELECT dow,
               COALESCE(view, 0) AS view,
               COALESCE(click, 0) AS click,
               COALESCE(error, 0) AS error,
               COALESCE(purchase, 0) AS purchase,
               COALESCE(signup, 0) AS signup
        FROM (
          SELECT * FROM (
            SELECT dayofweek(ts) - 1 AS dow, event_type FROM events
          )
          PIVOT (COUNT(*) FOR event_type IN
                 ('view' AS view, 'click' AS click, 'error' AS error,
                  'purchase' AS purchase, 'signup' AS signup))
        )
        ORDER BY dow
        """,
        ("events",),
        oracle="""
        SELECT * FROM (
          SELECT CAST(extract(dow FROM ts) AS INTEGER) AS dow, event_type
          FROM events
        )
        PIVOT (COUNT(*) FOR event_type IN
               ('view', 'click', 'error', 'purchase', 'signup'))
        ORDER BY dow
        """,
    ),
}
