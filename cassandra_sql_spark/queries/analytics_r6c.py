"""Round-6 closing batch: time-series smoothing and sequence analytics.

EWMA smoothing, compound-growth indexing (cumulative product), first-order
Markov transition probabilities over event sequences, rolling exact median,
bipartite degree distribution, and per-document lexical diversity. None of
these exist in the reference (its Calcite grammar has no window frames at
all, kv/CalciteSqlParser.java); they are the standard follow-ons to the
OHLC/rolling-corr/pct-change series family added earlier this round.

Scale notes (the 100x question):
- Every entry is one scan plus at most one shuffle (the groupBy or window
  partition key). No self-joins, no driver collects.
- EWMA and cumprod run over the DAILY series — the heavy reduction
  (events -> per-day revenue) happens first on a hash shuffle, and the
  sequential window then touches only ~hundreds of rows regardless of SF.
- The Markov and degree entries shuffle on user_id once; per-user state is
  bounded by the event-type alphabet, not the event count.
- Rolling median is a 7-row frame per user — Spark's exact ``percentile``
  over a sliding frame is O(frame log frame) per row with no extra
  exchange beyond the user_id window shuffle.

Cross-engine determinism: POWER/EXP/LN land within 1 ulp between Java's
StrictMath-backed builtins and DuckDB's libm, far inside the 6dp half-up
quantization used on every double output (FLOOR(x*1e6+0.5) — see
win_leave_one_out's comment in modern_sql_r6.py for why not DECIMAL).
EWMA's POWER(0.8, -rn) rescaling peaks at ~1e70 for a two-year daily
series — within double range (1e308) with the terms inside one 20-row
frame spread only 0.8^-19 ~= 70x, so the running sum loses no precision
that survives quantization.
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, sql_q

_DAILY = """
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100 AS revenue
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
        GROUP BY CAST(ts AS DATE)
"""

QUERIES: dict[str, Q] = {
    # Exponentially weighted moving average (pandas ewm(alpha=0.2,
    # adjust=True) semantics) over the daily purchase-revenue series,
    # with a 20-day effective memory. The per-row weights
    # 0.8^(t-i) are produced without a per-row frame rescan by the
    # standard rescaling identity: carry revenue*0.8^(-rn) in the
    # frame sum and multiply back by 0.8^rn outside it. The finite
    # normalizer has the closed form (1-0.8^n)/0.2 for the n rows in
    # the frame — no second window needed.
    "series_ewma": sql_q(
        f"""
        WITH daily AS ({_DAILY}),
        seq AS (
          SELECT day, revenue,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS rn
          FROM daily
        )
        SELECT day, revenue,
               CAST(CAST(FLOOR(
                 SUM(revenue * POWER(0.8, -rn)) OVER (
                     ORDER BY day
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                 * POWER(0.8, rn) * 0.2
                 / (1 - POWER(0.8, LEAST(rn, 20.0)))
                 * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000 AS ewma
        FROM seq
        """,
        ("events",),
    ),
    # Compound growth index: cumulative product of day-over-day revenue
    # ratios via the EXP(SUM(LN)) rewrite (neither engine has a PRODUCT
    # aggregate). Telescoping makes the true value revenue_t/revenue_1;
    # the entry exists to pin the log-domain idiom itself, which is the
    # only scalable form when the ratios do NOT telescope (e.g. capped
    # or clamped returns).
    "win_cumprod_growth": sql_q(
        f"""
        WITH daily AS ({_DAILY}),
        r AS (
          SELECT day,
                 revenue / LAG(revenue) OVER (ORDER BY day) AS ratio
          FROM daily
        )
        SELECT day,
               CAST(CAST(FLOOR(
                 EXP(SUM(LN(ratio)) OVER (
                     ORDER BY day ROWS UNBOUNDED PRECEDING))
                 * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000
                 AS growth_index
        FROM r
        WHERE ratio IS NOT NULL
        """,
        ("events",),
    ),
    # First-order Markov chain over per-user event sequences: transition
    # counts from one LEAD pass (no self-join) and row-normalized
    # probabilities from a windowed sum over the finished aggregate —
    # the state space is the event-type alphabet squared, so the final
    # window is tiny no matter the corpus size.
    "event_markov_transitions": sql_q(
        """
        WITH seq AS (
          SELECT event_type AS src,
                 LEAD(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events
          WHERE ts IS NOT NULL
        )
        SELECT src, dst,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(FLOOR(
                 CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY src)
                 * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000 AS p
        FROM seq
        WHERE dst IS NOT NULL
        GROUP BY src, dst
        """,
        ("events",),
    ),
    # Rolling exact median (7-event frame per user): Spark spells the
    # exact quantile `percentile`, DuckDB `median`; over DOUBLE both
    # interpolate the even-count middle identically (verified to the
    # ulp). LIMIT with a total-order tiebreak keeps the driver hash
    # stable.
    "win_rolling_median": sql_q(
        """
        SELECT event_id, user_id,
               CAST(CAST(FLOOR(
                 percentile(value, 0.5) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000
                 AS rolling_median
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id < 200
        ORDER BY user_id, event_id
        LIMIT 500
        """,
        ("events",),
        oracle="""
        SELECT event_id, user_id,
               CAST(CAST(FLOOR(
                 median(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000
                 AS rolling_median
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id < 200
        ORDER BY user_id, event_id
        LIMIT 500
        """,
    ),
    # Degree distribution of the bipartite user<->active-day graph plus
    # the event-type degree range per bucket — the standard first look
    # at interaction-graph shape. One user_id shuffle; the histogram
    # itself is calendar-bounded.
    "graph_degree_distribution": sql_q(
        """
        WITH deg AS (
          SELECT user_id,
                 COUNT(DISTINCT event_type) AS type_degree,
                 COUNT(DISTINCT CAST(ts AS DATE)) AS day_degree
          FROM events
          WHERE ts IS NOT NULL
          GROUP BY user_id
        )
        SELECT CAST(day_degree AS BIGINT) AS day_degree,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MIN(type_degree) AS BIGINT) AS min_types,
               CAST(MAX(type_degree) AS BIGINT) AS max_types
        FROM deg
        GROUP BY day_degree
        """,
        ("events",),
    ),
    # RFM (recency/frequency/monetary) quintile segmentation — the
    # classic CRM scoring transform. One user_id shuffle builds the
    # per-user triple; the anchor date is a 1-row scalar subquery
    # (broadcast); quintiles come from NTILE over a total order
    # (user_id tiebreak keeps both engines' tile assignment identical).
    # Global NTILE is a single-partition sort of the USER table (not
    # the event log) — at 100 TB you'd swap it for approx_percentile
    # cutoffs; the exact form is the oracle-checkable contract.
    "event_rfm_segmentation": sql_q(
        """
        WITH rfm AS (
          SELECT user_id,
                 MAX(CAST(ts AS DATE)) AS last_day,
                 CAST(COUNT(*) AS BIGINT) AS frequency,
                 CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100 AS monetary
          FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL
          GROUP BY user_id
        ),
        scored AS (
          SELECT user_id,
                 DATEDIFF((SELECT MAX(last_day) FROM rfm), last_day)
                   AS recency_days,
                 frequency, monetary
          FROM rfm
        )
        SELECT user_id,
               CAST(recency_days AS BIGINT) AS recency_days,
               frequency, monetary,
               CAST(NTILE(5) OVER (ORDER BY recency_days ASC, user_id)
                    AS BIGINT) AS r_score,
               CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id)
                    AS BIGINT) AS f_score,
               CAST(NTILE(5) OVER (ORDER BY monetary DESC, user_id)
                    AS BIGINT) AS m_score
        FROM scored
        """,
        ("events",),
        oracle="""
        WITH rfm AS (
          SELECT user_id,
                 MAX(CAST(ts AS DATE)) AS last_day,
                 CAST(COUNT(*) AS BIGINT) AS frequency,
                 CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100 AS monetary
          FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL
          GROUP BY user_id
        ),
        scored AS (
          SELECT user_id,
                 (SELECT MAX(last_day) FROM rfm) - last_day
                   AS recency_days,
                 frequency, monetary
          FROM rfm
        )
        SELECT user_id,
               CAST(recency_days AS BIGINT) AS recency_days,
               frequency, monetary,
               CAST(NTILE(5) OVER (ORDER BY recency_days ASC, user_id)
                    AS BIGINT) AS r_score,
               CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id)
                    AS BIGINT) AS f_score,
               CAST(NTILE(5) OVER (ORDER BY monetary DESC, user_id)
                    AS BIGINT) AS m_score
        FROM scored
        """,
    ),
    # Inter-arrival time percentiles per event type. Gaps are computed
    # on EXACT integer microseconds (Spark unix_micros == DuckDB
    # epoch_us; fractional epoch()/unix_timestamp() truncate or round
    # differently between engines) and reported in seconds. One
    # (user, type) window shuffle, then an alphabet-bounded aggregate.
    "event_interarrival_stats": sql_q(
        """
        WITH gaps AS (
          SELECT event_type,
                 CAST(unix_micros(ts) - LAG(unix_micros(ts)) OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS DOUBLE) / 1000000 AS gap_s
          FROM events
          WHERE ts IS NOT NULL
        )
        SELECT event_type,
               CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
               CAST(CAST(FLOOR(percentile(gap_s, 0.5) * 1000000 + 0.5)
                    AS BIGINT) AS DOUBLE) / 1000000 AS p50_s,
               CAST(CAST(FLOOR(percentile(gap_s, 0.9) * 1000000 + 0.5)
                    AS BIGINT) AS DOUBLE) / 1000000 AS p90_s
        FROM gaps
        WHERE gap_s IS NOT NULL
        GROUP BY event_type
        """,
        ("events",),
        oracle="""
        WITH gaps AS (
          SELECT event_type,
                 CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS DOUBLE) / 1000000 AS gap_s
          FROM events
          WHERE ts IS NOT NULL
        )
        SELECT event_type,
               CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
               CAST(CAST(FLOOR(quantile_cont(gap_s, 0.5) * 1000000 + 0.5)
                    AS BIGINT) AS DOUBLE) / 1000000 AS p50_s,
               CAST(CAST(FLOOR(quantile_cont(gap_s, 0.9) * 1000000 + 0.5)
                    AS BIGINT) AS DOUBLE) / 1000000 AS p90_s
        FROM gaps
        WHERE gap_s IS NOT NULL
        GROUP BY event_type
        """,
    ),
    # Per-document lexical diversity (type-token ratio) — a core
    # training-data quality signal alongside the Gopher battery.
    # Pure array ops, zero explode/shuffle on the Spark side.
    "text_ttr_diversity": sql_q(
        r"""
        SELECT doc_id,
               CAST(SIZE(SPLIT(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
               CAST(CAST(FLOOR(
                 CAST(SIZE(ARRAY_DISTINCT(SPLIT(TRIM(text), '\\s+')))
                      AS DOUBLE)
                 / SIZE(SPLIT(TRIM(text), '\\s+'))
                 * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000 AS ttr
        FROM documents
        WHERE LENGTH(TRIM(text)) > 0
        """,
        ("documents",),
        oracle=r"""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+'))
                    AS BIGINT) AS n_tokens,
               CAST(CAST(FLOOR(
                 CAST(len(list_distinct(
                        string_split_regex(trim(text), '\s+')))
                      AS DOUBLE)
                 / len(string_split_regex(trim(text), '\s+'))
                 * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000 AS ttr
        FROM documents
        WHERE LENGTH(TRIM(text)) > 0
        """,
    ),
}
