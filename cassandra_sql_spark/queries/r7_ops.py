"""Round-7 operator entries.

- expr_interval_arith: end-to-end arithmetic on STORED DayTimeIntervalType
  columns (timestamp difference -> interval column -> compare / ts +- it /
  reduce), pinning the typed-interval semantics introduced when INTERVAL
  columns moved off strings (the reference stores intervals as ISO strings
  and cannot compute with them, kv/TableMetadata.java:348-349).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_sql_spark.io import load
from cassandra_sql_spark.pipeline import multimodal
from cassandra_sql_spark.queries.base import Q, df_q, sql_q

# Benford expected first-digit probabilities, inlined as literals so
# neither engine's LOG10 (not guaranteed correctly rounded) enters the
# result — the constants are computed once here and parsed identically.
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {math.log10(1 + 1 / d)!r}" for d in range(1, 10)
)

_BENFORD_SQL = f"""
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                             AS {{strty}}), 1, 1) AS BIGINT) AS d1
  FROM orders WHERE o_totalprice > 0
), c AS (
  SELECT d1, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d1
), t AS (SELECT SUM(n) AS total FROM c)
SELECT d1, n,
       CAST(n AS DOUBLE) / CAST(t.total AS DOUBLE) AS observed_p,
       CAST(CASE d1 {_BENFORD_CASE} END AS DOUBLE) AS benford_p
FROM c, t ORDER BY d1
"""

# Business-day count via pure integer day arithmetic — no EXTRACT(DOW)
# (Spark numbers Sunday=1 where DuckDB numbers Sunday=0): with x = days
# since a Monday anchor (1969-12-29), f(x) = 5*floor(x/7) + min(x%7, 5)
# counts the Mon-Fri days in [anchor, anchor+x), and f(e) - f(s) is the
# business-day span. Everything is BIGINT until the final cast.
_FB = "(5 * FLOOR(({x}) / 7) + LEAST(({x}) % 7, 5))"

_BIZDAYS_BODY = f"""
WITH d AS (
  SELECT l.l_orderkey, l.l_linenumber,
         {{dd_s}} AS s, {{dd_e}} AS e
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
)
SELECT l_orderkey, l_linenumber,
       CAST(e - s AS BIGINT) AS calendar_days,
       CAST({_FB.format(x='e')} - {_FB.format(x='s')} AS BIGINT)
         AS business_days
FROM d ORDER BY l_orderkey, l_linenumber LIMIT 2000
"""

_GAPS_ISLANDS = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE ts IS NOT NULL
), k AS (
  SELECT user_id, d,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM act
), runs AS (
  SELECT user_id, MIN(d) AS run_start, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM (SELECT user_id, d, DATEDIFF({args}) - rn AS grp FROM k) g
  GROUP BY user_id, grp
), best AS (
  SELECT user_id, run_start, run_len,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY run_len DESC, run_start) AS rk
  FROM runs
)
SELECT user_id, run_start AS longest_run_start, run_len AS longest_run_days
FROM best WHERE rk = 1 ORDER BY user_id
"""

_FK_SELECT = """
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sents AS BIGINT) AS n_sents,
       CAST(n_syll AS BIGINT) AS n_syllables,
       CAST(39 * n_words * n_words + 1180 * n_syll * n_sents
            - 1559 * n_words * n_sents AS DOUBLE)
         / (100 * n_words * n_sents) AS fk_grade
FROM s ORDER BY doc_id LIMIT 300
"""

QUERIES: dict[str, Q] = {
    # Typed-interval arithmetic on a STORED interval column: ts - LAG(ts)
    # materializes a DayTimeIntervalType column, then the query compares
    # it against an INTERVAL literal, adds/subtracts it back onto
    # timestamps, and reduces it per group. Boundary stays scalar:
    # Spark CAST(interval AS BIGINT) yields whole seconds, matching
    # DuckDB FLOOR(epoch(gap)) (gaps are non-negative by the LAG order,
    # so truncation == floor).
    "expr_interval_arith": sql_q(
        """
        WITH g AS (
          SELECT user_id, event_id, ts,
                 ts - LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS gap
          FROM events WHERE ts IS NOT NULL
        )
        SELECT user_id,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(COUNT_IF(gap > INTERVAL 1 HOUR) AS BIGINT)
                 AS n_long_gaps,
               CAST(SUM(CAST(gap AS BIGINT)) AS BIGINT) AS total_gap_s,
               CAST(MAX(ts + gap) AS TIMESTAMP) AS latest_due,
               CAST(MIN(ts - gap) AS TIMESTAMP) AS earliest_back
        FROM g
        GROUP BY user_id
        ORDER BY user_id
        LIMIT 200
        """,
        ("events",),
        oracle="""
        WITH g AS (
          SELECT user_id, event_id, ts,
                 ts - LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS gap
          FROM events WHERE ts IS NOT NULL
        )
        SELECT user_id,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(COUNT(*) FILTER (gap > INTERVAL 1 HOUR) AS BIGINT)
                 AS n_long_gaps,
               CAST(SUM(CAST(FLOOR(epoch(gap)) AS BIGINT)) AS BIGINT)
                 AS total_gap_s,
               MAX(ts + gap) AS latest_due,
               MIN(ts - gap) AS earliest_back
        FROM g
        GROUP BY user_id
        ORDER BY user_id
        LIMIT 200
        """,
    ),
    # REAL multimodal codec behind the REAL-CODEC.md seam: deterministic
    # 8x8 BMP fixtures (pixel values closed-form in doc_id, encoded with
    # the real bottom-up/BGR/padded writer) are decoded by the real
    # parser and box-resized to 4x4 inside mapInPandas; the output is a
    # position-weighted per-channel sum over the resized blocks. The
    # oracle recomputes the same statistic symbolically from doc_id — a
    # decoder that skips the bottom-up flip, the BGR swap, or the row
    # stride reads different pixels and hash-mismatches. All arithmetic
    # is quarter-integer, float64-exact on both engines.
    "multimodal_decode_real": df_q(
        lambda spark, sf: multimodal.decode_resize_bmp(
            multimodal.synth_bmp_payload(
                load(spark, sf, "documents")
                .select("doc_id")
                .filter(F.col("doc_id") < 200),
                side=8,
            ),
            out_side=4,
        ),
        ("documents",),
        oracle="""
        WITH d AS (
          SELECT doc_id FROM documents WHERE doc_id < 200
        ), b AS (
          SELECT UNNEST(generate_series(0, 15)) AS blk
        ), c AS (
          SELECT UNNEST(generate_series(0, 3)) AS cell
        ), px AS (
          SELECT doc_id, blk,
                 ((blk // 4) * 2 + cell // 2) * 8
                   + ((blk % 4) * 2 + cell % 2) AS i
          FROM d, b, c
        ), m AS (
          SELECT doc_id, blk,
                 CAST(SUM((doc_id * 31 + i) % 256) AS DOUBLE) / 4 AS mr,
                 CAST(SUM((doc_id * 17 + 2 * i) % 251) AS DOUBLE) / 4 AS mg,
                 CAST(SUM((doc_id * 7 + 3 * i) % 253) AS DOUBLE) / 4 AS mb
          FROM px GROUP BY doc_id, blk
        )
        SELECT doc_id,
               CAST(8 AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               CAST(246 AS BIGINT) AS n_bytes,
               SUM(mr * (blk + 1)) AS wsum_r,
               SUM(mg * (blk + 1)) AS wsum_g,
               SUM(mb * (blk + 1)) AS wsum_b
        FROM m GROUP BY doc_id
        """,
    ),
    # Max drawdown per user over a signed cash-flow series (equity-curve
    # analytics): two stacked running windows — cumulative balance, then
    # running peak — then one aggregate. Money stays in exact integer
    # cents through both windows so the running sums are order-exact on
    # both engines; at 100 TB this is one shuffle on user_id and two
    # in-partition window passes.
    "series_drawdown": sql_q(
        """
        WITH cents AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_type IN ('purchase', 'signup')
                      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                      ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                 END AS c
          FROM events WHERE ts IS NOT NULL
        ), cum AS (
          SELECT user_id, ts, event_id,
                 SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS bal
          FROM cents
        ), pk AS (
          SELECT user_id, bal,
                 MAX(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS peak
          FROM cum
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(peak - bal) AS DOUBLE) / 100 AS max_drawdown,
               CAST(MAX(peak) AS DOUBLE) / 100 AS peak_balance
        FROM pk GROUP BY user_id ORDER BY user_id
        """,
        ("events",),
    ),
    # Autocorrelation of the daily event-count series at lags 1 and 7
    # (seasonality detection). Pearson r from raw integer power sums —
    # counts are BIGINT, so every sum is exact and the single double
    # expression at the end is bit-identical across engines. The
    # unpartitioned LAG window runs over the DAILY reduction (|distinct
    # dates| rows — thousands even at 100 TB), never the event log; the
    # WindowExec single-partition warning is bounded by calendar size.
    "series_autocorr": sql_q(
        """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
          FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ), l AS (
          SELECT n,
                 LAG(n, 1) OVER (ORDER BY d) AS n1,
                 LAG(n, 7) OVER (ORDER BY d) AS n7
          FROM daily
        ), s1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS c, SUM(n) AS sx, SUM(n1) AS sy,
                 SUM(n * n1) AS sxy, SUM(n * n) AS sxx, SUM(n1 * n1) AS syy
          FROM l WHERE n1 IS NOT NULL
        ), s7 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS c, SUM(n) AS sx, SUM(n7) AS sy,
                 SUM(n * n7) AS sxy, SUM(n * n) AS sxx, SUM(n7 * n7) AS syy
          FROM l WHERE n7 IS NOT NULL
        )
        SELECT
          CAST(s1.c * s1.sxy - s1.sx * s1.sy AS DOUBLE)
            / (SQRT(CAST(s1.c * s1.sxx - s1.sx * s1.sx AS DOUBLE))
               * SQRT(CAST(s1.c * s1.syy - s1.sy * s1.sy AS DOUBLE)))
            AS acf_lag1,
          CAST(s7.c * s7.sxy - s7.sx * s7.sy AS DOUBLE)
            / (SQRT(CAST(s7.c * s7.sxx - s7.sx * s7.sx AS DOUBLE))
               * SQRT(CAST(s7.c * s7.syy - s7.sy * s7.sy AS DOUBLE)))
            AS acf_lag7,
          s1.c AS n_pairs_lag1,
          s7.c AS n_pairs_lag7
        FROM s1, s7
        """,
        ("events",),
    ),
    # First-touch attribution: every purchase credits the user's FIRST
    # event_type (marketing-channel attribution). One shuffle on user_id
    # for the window, then a tiny grouped rollup; revenue through the
    # exact integer-cents idiom.
    "event_attribution": sql_q(
        """
        WITH o AS (
          SELECT user_id, event_type, value,
                 FIRST_VALUE(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS first_touch
          FROM events WHERE ts IS NOT NULL
        )
        SELECT first_touch,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100 AS revenue
        FROM o WHERE event_type = 'purchase'
        GROUP BY first_touch ORDER BY first_touch
        """,
        ("events",),
    ),
    # Two-sample Kolmogorov-Smirnov D between the purchase and click
    # value distributions: group-by value (ECDF is right-continuous at
    # ties), one ordered window for the joint cumulative counts, then
    # max of an exact integer cross-difference — D only becomes a double
    # in the final division, so both engines agree bit-for-bit. The
    # unpartitioned cumulative window runs over DISTINCT 2-decimal
    # values (domain-bounded: <= 100*max_value rows regardless of event
    # count), not the log — the WindowExec warning is value-domain-sized.
    "stat_ks_two_sample": sql_q(
        """
        WITH v AS (
          SELECT value,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS na,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS nb
          FROM events WHERE event_type IN ('purchase', 'click')
          GROUP BY value
        ), c AS (
          SELECT SUM(na) OVER (ORDER BY value
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS ca,
                 SUM(nb) OVER (ORDER BY value
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cb
          FROM v
        ), t AS (
          SELECT SUM(na) AS ta, SUM(nb) AS tb FROM v
        )
        SELECT CAST(MAX(ABS(ca * t.tb - cb * t.ta)) AS DOUBLE)
                 / CAST(t.ta * t.tb AS DOUBLE) AS ks_d,
               CAST(t.ta AS BIGINT) AS n_purchase,
               CAST(t.tb AS BIGINT) AS n_click
        FROM c, t GROUP BY t.ta, t.tb
        """,
        ("events",),
    ),
    # Gini coefficient of the value distribution per event type
    # (inequality / concentration analytics): rank-weighted sum identity
    # G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) on integer cents.
    # Rank ties share equal x, so the weighted sum is permutation-
    # invariant — the ROW_NUMBER tiebreak only pins the plan.
    "stat_gini": sql_q(
        """
        WITH x AS (
          SELECT event_type,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rk
          FROM events WHERE value IS NOT NULL
        ), g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(c) AS sc, SUM(rk * c) AS src
          FROM x GROUP BY event_type
        )
        SELECT event_type, n,
               CASE WHEN sc = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(2 * src - (n + 1) * sc AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(sc AS DOUBLE))
               END AS gini
        FROM g ORDER BY event_type
        """,
        ("events",),
    ),
    # Discrete percentiles (the actual stored value at or above the
    # cut, never an interpolation — PERCENTILE_DISC semantics) via
    # CUME_DIST + conditional MIN: deterministic because the answer is a
    # data value, not arithmetic.
    "agg_percentile_disc": sql_q(
        """
        WITH r AS (
          SELECT o_orderpriority AS pr, o_totalprice AS v,
                 CUME_DIST() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice) AS cd
          FROM orders
        )
        SELECT pr,
               MIN(CASE WHEN cd >= 0.25 THEN v END) AS p25,
               MIN(CASE WHEN cd >= 0.5 THEN v END) AS p50,
               MIN(CASE WHEN cd >= 0.75 THEN v END) AS p75
        FROM r GROUP BY pr ORDER BY pr
        """,
        ("orders",),
    ),
    # Cohort lifetime value: customers cohorted by first-order month,
    # revenue rolled up by months-since-first-order. Months are encoded
    # as y*12+m integers so both engines group on exact keys (date_trunc
    # returns DATE in DuckDB but TIMESTAMP in Spark). Two shuffles:
    # the first-order reduction and the cohort rollup.
    "order_cohort_ltv": sql_q(
        """
        WITH f AS (
          SELECT o_custkey,
                 MIN(EXTRACT(YEAR FROM o_orderdate) * 12
                     + EXTRACT(MONTH FROM o_orderdate)) AS first_ym
          FROM orders GROUP BY o_custkey
        )
        SELECT CAST(f.first_ym AS BIGINT) AS cohort_ym,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) * 12
                    + EXTRACT(MONTH FROM o.o_orderdate) - f.first_ym
                    AS BIGINT) AS month_offset,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100 AS revenue
        FROM orders o JOIN f ON o.o_custkey = f.o_custkey
        GROUP BY f.first_ym,
                 EXTRACT(YEAR FROM o.o_orderdate) * 12
                   + EXTRACT(MONTH FROM o.o_orderdate)
        ORDER BY cohort_ym, month_offset
        """,
        ("orders",),
    ),
    # Mann-Whitney U (rank-sum) test between the purchase and click
    # value distributions, with midrank tie handling and the tie-
    # corrected normal approximation. Doubled rank sums keep every
    # intermediate an exact integer (midranks are half-integers); the
    # z-score is one closed-form double expression evaluated identically
    # by both engines. Companion to stat_ks_two_sample / stat_ab_welch_z.
    "stat_mann_whitney": sql_q(
        """
        WITH v AS (
          SELECT value,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS na,
                 SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS nb,
                 COUNT(*) AS nt
          FROM events WHERE event_type IN ('purchase', 'click')
          GROUP BY value
        ), c AS (
          SELECT na, nb, nt,
                 SUM(nt) OVER (ORDER BY value
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - nt AS cum_before
          FROM v
        ), s AS (
          SELECT SUM(na * (2 * cum_before + nt + 1)) AS r2a,
                 SUM(na) AS ta, SUM(nb) AS tb,
                 SUM(nt * nt * nt - nt) AS ties
          FROM c
        )
        SELECT CAST(r2a - ta * (ta + 1) AS DOUBLE) / 2 AS u_stat,
               CAST(ta AS BIGINT) AS n_purchase,
               CAST(tb AS BIGINT) AS n_click,
               (CAST(r2a - ta * (ta + 1) AS DOUBLE) / 2
                  - CAST(ta * tb AS DOUBLE) / 2)
                 / SQRT(CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 12
                        * (CAST(ta + tb + 1 AS DOUBLE)
                           - CAST(ties AS DOUBLE)
                             / CAST((ta + tb) * (ta + tb - 1) AS DOUBLE)))
                 AS z_score
        FROM s
        """,
        ("events",),
    ),
    # Market-basket pair lift over order line items (association-rule
    # mining's core primitive). The self-join fans out per order by at
    # most (items-per-order choose 2) — TPC-H averages 4 lines/order —
    # never all-pairs over the table; lift stays exact because every
    # count product is below 2^53 before the single division.
    "basket_pair_lift": sql_q(
        """
        WITH it AS (
          SELECT DISTINCT l_orderkey AS ok, p_type AS t
          FROM lineitem JOIN part ON l_partkey = p_partkey
        ), n AS (
          SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM it
        ), tc AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM it GROUP BY t
        ), pairs AS (
          SELECT a.t AS t1, b.t AS t2, CAST(COUNT(*) AS BIGINT) AS c12
          FROM it a JOIN it b ON a.ok = b.ok AND a.t < b.t
          GROUP BY a.t, b.t
        )
        SELECT t1, t2, c12,
               CAST(c12 AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
                 / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
        FROM pairs
        JOIN tc ca ON ca.t = pairs.t1
        JOIN tc cb ON cb.t = pairs.t2
        CROSS JOIN n
        WHERE c12 >= 5
        ORDER BY lift DESC, t1, t2
        LIMIT 50
        """,
        ("lineitem", "part"),
    ),
    # IS DISTINCT FROM — the ANSI null-safe inequality (companion to the
    # <=> entry pred_null_safe_eq): change detection over a sequence
    # where the tracked flag is often NULL, so plain != would silently
    # drop every NULL-adjacent transition.
    "pred_is_distinct_from": sql_q(
        """
        WITH l AS (
          SELECT user_id,
                 CASE WHEN value >= 100 THEN event_type END AS flag,
                 LAG(CASE WHEN value >= 100 THEN event_type END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_flag
          FROM events WHERE ts IS NOT NULL
        )
        SELECT user_id,
               CAST(SUM(CASE WHEN flag IS DISTINCT FROM prev_flag
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM l GROUP BY user_id ORDER BY user_id
        """,
        ("events",),
    ),
    # Directed-graph reciprocity over the page-transition graph (same
    # edge extraction as graph_pagerank/graph_triangle_count): the
    # fraction of distinct src->dst edges whose reverse edge exists.
    # The log collapses to the DISTINCT edge set (bounded by |pages|^2)
    # before the self-join, so the join never touches raw events.
    "graph_reciprocity": sql_q(
        """
        WITH ev AS (
          SELECT user_id, ts, event_id,
                 TRY_CAST(get_json_object(props, '$.k') AS BIGINT) AS page
          FROM events
        ), seq AS (
          SELECT page AS src,
                 LEAD(page) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
          FROM ev
        ), e AS (
          SELECT DISTINCT src, dst FROM seq
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src != dst
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_reciprocal,
               CAST(SUM(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS reciprocity
        FROM e a LEFT JOIN e b ON a.src = b.dst AND a.dst = b.src
        """,
        ("events",),
        oracle="""
        WITH ev AS (
          SELECT user_id, ts, event_id,
                 TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                               THEN JSON_EXTRACT_STRING(props, '$.k') END
                          AS BIGINT) AS page
          FROM events
        ), seq AS (
          SELECT page AS src,
                 LEAD(page) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
          FROM ev
        ), e AS (
          SELECT DISTINCT src, dst FROM seq
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src != dst
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_reciprocal,
               CAST(SUM(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS reciprocity
        FROM e a LEFT JOIN e b ON a.src = b.dst AND a.dst = b.src
        """,
    ),
    # Flesch-Kincaid grade level (LLM-corpus quality scoring): vowel-group
    # syllable heuristic per word, sentence count from terminal
    # punctuation runs. The grade formula 0.39*w/s + 11.8*syll/w - 15.59
    # is rewritten over the common denominator 100*w*s so the numerator
    # stays an exact integer and the only double op is one division.
    # Map-only over the corpus; the per-word regexp runs in a JVM lambda.
    "text_readability_fk": sql_q(
        """
        WITH w AS (
          SELECT doc_id, split(trim(text), '\\\\s+') AS words,
                 GREATEST(regexp_count(text, '[.!?]+'), 1) AS n_sents
          FROM documents
        ), s AS (
          SELECT doc_id, n_sents, size(words) AS n_words,
                 AGGREGATE(TRANSFORM(words,
                     x -> GREATEST(regexp_count(lower(x), '[aeiouy]+'), 1)),
                   0L, (acc, x) -> acc + x) AS n_syll
          FROM w
        )
        """ + _FK_SELECT,
        ("documents",),
        oracle="""
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words,
                 GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sents
          FROM documents
        ), s AS (
          SELECT doc_id, n_sents, len(words) AS n_words,
                 list_sum(list_transform(words,
                     x -> GREATEST(len(regexp_extract_all(lower(x),
                                                          '[aeiouy]+')), 1)
                 )) AS n_syll
          FROM w
        )
        """ + _FK_SELECT,
    ),
    # Benford first-digit audit over order totals (data-quality /
    # anomaly primitive). The first digit comes from the exact integer
    # cents rendered as a string — identical on both engines — never
    # from log10 arithmetic; the expected distribution is inlined as
    # driver-computed literals (see _BENFORD_CASE).
    "stat_benford_first_digit": sql_q(
        _BENFORD_SQL.format(strty="STRING"),
        ("orders",),
        oracle=_BENFORD_SQL.format(strty="VARCHAR"),
    ),
    # CUSUM changepoint per event type on the daily count series: the
    # cumulative deviation from the series mean is kept in exact scaled
    # integers (sum of n*x_i - sum_x, i.e. n times the usual CUSUM), so
    # the argmax day is exact; the statistic only becomes a double in
    # the final unscaling. Windows partition by event_type; the series
    # is the daily reduction, calendar-bounded.
    "series_cusum_changepoint": sql_q(
        """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events WHERE ts IS NOT NULL
          GROUP BY event_type, CAST(ts AS DATE)
        ), tot AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx
          FROM daily GROUP BY event_type
        ), cus AS (
          SELECT daily.event_type, d,
                 SUM(tot.n * x - tot.sx) OVER (
                     PARTITION BY daily.event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS c_scaled,
                 tot.n AS n
          FROM daily JOIN tot ON daily.event_type = tot.event_type
        ), ranked AS (
          SELECT event_type, d, c_scaled, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY ABS(c_scaled) DESC, d) AS rk
          FROM cus
        )
        SELECT event_type, d AS changepoint_day,
               CAST(ABS(c_scaled) AS DOUBLE) / CAST(n AS DOUBLE)
                 AS max_cusum
        FROM ranked WHERE rk = 1 ORDER BY event_type
        """,
        ("events",),
    ),
    # Quantity-weighted median price per return flag: smallest value
    # whose cumulative weight reaches half the total. Weights stay
    # integral (FLOOR(q+0.5), not CAST — Spark truncates double->bigint
    # where DuckDB rounds) and the threshold compares 2*cum >= total in
    # integers, so no division ever happens. Intra-tie cumulative order
    # is nondeterministic but harmless: crossing inside a tie block
    # selects that block's value either way.
    "agg_weighted_median": sql_q(
        """
        WITH x AS (
          SELECT l_returnflag AS flag, l_extendedprice AS v,
                 CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS wt
          FROM lineitem
        ), c AS (
          SELECT flag, v,
                 SUM(wt) OVER (PARTITION BY flag ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cw,
                 SUM(wt) OVER (PARTITION BY flag) AS tw
          FROM x
        )
        SELECT flag, MIN(CASE WHEN 2 * cw >= tw THEN v END)
                 AS weighted_median
        FROM c GROUP BY flag ORDER BY flag
        """,
        ("lineitem",),
    ),
    # Pareto concentration per brand: how many of the brand's parts
    # (ranked by revenue) cover 80% of its revenue. Exact integer cents
    # and the 5*cum >= 4*total integer threshold keep the crossing rank
    # exact; (rev DESC, partkey) is a total order.
    "stat_pareto_share": sql_q(
        """
        WITH rp AS (
          SELECT p.p_brand AS brand, l.l_partkey AS pk,
                 SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS rev_c
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand, l.l_partkey
        ), c AS (
          SELECT brand, rev_c,
                 SUM(rev_c) OVER (PARTITION BY brand
                                  ORDER BY rev_c DESC, pk
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum_c,
                 SUM(rev_c) OVER (PARTITION BY brand) AS tot_c,
                 ROW_NUMBER() OVER (PARTITION BY brand
                                    ORDER BY rev_c DESC, pk) AS rk,
                 COUNT(*) OVER (PARTITION BY brand) AS np
          FROM rp
        )
        SELECT brand,
               CAST(MIN(CASE WHEN 5 * cum_c >= 4 * tot_c THEN rk END)
                    AS BIGINT) AS parts_to_80pct,
               CAST(MAX(np) AS BIGINT) AS n_parts,
               CAST(MIN(CASE WHEN 5 * cum_c >= 4 * tot_c THEN rk END)
                    AS DOUBLE) / CAST(MAX(np) AS DOUBLE) AS pareto_frac
        FROM c GROUP BY brand ORDER BY brand
        """,
        ("lineitem", "part"),
    ),
    # Business days between order placement and line shipment — the
    # dialect-proof integer-day formula (see _FB above; EXTRACT(DOW)
    # numbers weekdays differently across engines, epoch-day modular
    # arithmetic does not). Broadcast-joins orders' date onto lineitem.
    "expr_business_days": sql_q(
        _BIZDAYS_BODY.format(
            dd_s="DATEDIFF(o.o_orderdate, DATE '1969-12-29')",
            dd_e="DATEDIFF(l.l_shipdate, DATE '1969-12-29')",
        ),
        ("lineitem", "orders"),
        oracle=_BIZDAYS_BODY.format(
            dd_s="DATEDIFF('day', DATE '1969-12-29', o.o_orderdate)",
            dd_e="DATEDIFF('day', DATE '1969-12-29', l.l_shipdate)",
        ),
    ),
    # Gaps-and-islands: each user's longest run of consecutive active
    # days via the classic date-minus-row_number grouping key. One
    # shuffle on user_id; the per-user series is the distinct-day
    # reduction, calendar-bounded.
    "series_gaps_islands": sql_q(
        _GAPS_ISLANDS.format(args="d, DATE '1970-01-01'"),
        ("events",),
        oracle=_GAPS_ISLANDS.format(args="'day', DATE '1970-01-01', d"),
    ),
    # Spearman rank correlation with midrank ties (quantity vs price per
    # return flag): doubled midranks are exact integers (the Mann-Whitney
    # trick — 2*rank = 2*cum_before + nt + 1 per distinct value, joined
    # back to rows), so Pearson-on-ranks reduces to integer power sums
    # and one closed-form double expression. The rank tables are
    # distinct-value reductions; the join back is on (group, value).
    "stat_spearman_corr": sql_q(
        """
        WITH x AS (
          SELECT l_returnflag AS flag,
                 CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
                 CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p
          FROM lineitem
        ), rq AS (
          SELECT flag, q,
                 2 * (SUM(cnt) OVER (PARTITION BY flag ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - cnt) + cnt + 1 AS r2
          FROM (SELECT flag, q, COUNT(*) AS cnt FROM x GROUP BY flag, q) t
        ), rp AS (
          SELECT flag, p,
                 2 * (SUM(cnt) OVER (PARTITION BY flag ORDER BY p
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - cnt) + cnt + 1 AS r2
          FROM (SELECT flag, p, COUNT(*) AS cnt FROM x GROUP BY flag, p) t
        ), j AS (
          SELECT x.flag, rq.r2 AS a, rp.r2 AS b
          FROM x JOIN rq ON x.flag = rq.flag AND x.q = rq.q
                 JOIN rp ON x.flag = rp.flag AND x.p = rp.p
        ), jc AS (
          -- doubled midranks sum to exactly n(n+1) (ties preserve the
          -- total), so the exact mean is n+1: centering BEFORE the
          -- power sums bounds every PRODUCT by n^2 (int64-safe to
          -- n ~ 3e9 rows/group) — the uncentered n*saa form overflowed
          -- BIGINT past ~2M rows/group (hit at sf0.1 under ANSI mode)
          SELECT flag,
                 a - (COUNT(*) OVER (PARTITION BY flag) + 1) AS da,
                 b - (COUNT(*) OVER (PARTITION BY flag) + 1) AS db
          FROM j
        ), s AS (
          -- the SUMS reach n^3 (8e21 at sf10's 20M-row groups — the
          -- r12 sf10 gate caught the BIGINT sum overflowing): exact
          -- order-independent DECIMAL(25,0) accumulation of int64
          -- terms, the queries/base.py convention, good past sf100
          SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(da * db AS DECIMAL(25,0))) AS sab,
                 SUM(CAST(da * da AS DECIMAL(25,0))) AS saa,
                 SUM(CAST(db * db AS DECIMAL(25,0))) AS sbb
          FROM jc GROUP BY flag
        )
        SELECT flag, n,
               CAST(sab AS DOUBLE)
                 / (SQRT(CAST(saa AS DOUBLE)) * SQRT(CAST(sbb AS DOUBLE)))
                 AS spearman_rho
        FROM s ORDER BY flag
        """,
        ("lineitem",),
    ),
    # Session conversion rate: 30-minute-inactivity sessions (the same
    # gap rule as event_sessionize_batch), share of sessions containing
    # a purchase, by session-start day. One shuffle on user_id shared by
    # the gap window and the session rollup, then a tiny daily rollup.
    "event_session_conversion": sql_q(
        """
        WITH e AS (
          SELECT user_id, ts, event_id, event_type
          FROM events WHERE ts IS NOT NULL
        ), flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) IS NULL
                           OR ts > LAG(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                                + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM e
        ), sess AS (
          SELECT user_id, ts, event_type,
                 SUM(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS sid
          FROM flagged
        ), per AS (
          SELECT user_id, sid, CAST(MIN(ts) AS DATE) AS start_day,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
          FROM sess GROUP BY user_id, sid
        )
        SELECT start_day,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS conversion_rate
        FROM per GROUP BY start_day ORDER BY start_day
        """,
        ("events",),
    ),
}
