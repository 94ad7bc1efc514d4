"""JSON operators (SURVEY §2.2/§2.8; reference kv/JsonHelper.java:18-265 —
``->``, ``->>``, ``#>``, ``#>>``, jsonb_typeof, jsonb_array_length).

Spark side uses get_json_object / json-path built-ins (JVM, codegen).
The engine's SQL facade additionally rewrites the PostgreSQL arrow
operators into these calls (cassandra_sql_spark.sqlfront.preprocess).
Oracles use DuckDB's JSON functions (dialects differ).
"""

from __future__ import annotations

from cassandra_sql_spark.queries.base import Q, sql_q

QUERIES: dict[str, Q] = {
    # ->> equivalent: extract scalar text then cast
    # (reference kv/JsonHelper.java:67-134).
    "json_extract_scalar": sql_q(
        """
        SELECT event_id,
               GET_JSON_OBJECT(props, '$.k') AS k_text,
               CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) AS k_num
        FROM events WHERE event_id < 2000
        """,
        ("events",),
        oracle="""
        -- json_valid guard: Spark's get_json_object NULLs malformed or
        -- NULL JSON; DuckDB's extractor raises. Identical on well-formed
        -- input, NULL-aligned on garbage (pinned by the adversarial
        -- events suite).
        SELECT event_id,
               CASE WHEN props IS NOT NULL AND json_valid(props)
                    THEN JSON_EXTRACT_STRING(props, '$.k') END AS k_text,
               CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                         THEN JSON_EXTRACT_STRING(props, '$.k') END
                    AS BIGINT) AS k_num
        FROM events WHERE event_id < 2000
        """,
    ),
    # JSON predicate in WHERE + aggregation over extracted values.
    # get_json_object (Jackson streaming path extractor) measured fastest
    # here: single-path streaming extraction beats materializing a
    # from_json struct (0.38s vs 0.50s at sf0.1; variant_get 0.43s;
    # re-confirmed round 8 with interleaved A/Bs). Round 12: the WHERE on
    # the derived column was pushed below the Project, so every surviving
    # row paid the extraction TWICE (Filter + Project — the guide §4.4
    # duplication, with a JVM expression instead of a UDF). Folding the
    # predicate into conditional aggregates + HAVING n > 0 extracts once
    # per row: 0.51s -> 0.39s median at sf0.1 (interleaved A/B, identical
    # rows — a group appears iff >= 1 row passes k > 50, which is exactly
    # n > 0; COUNT/SUM over the CASE see the same surviving rows).
    "json_filter_agg": sql_q(
        """
        SELECT event_type, n, sum_k
        FROM (
          SELECT event_type,
                 COUNT(CASE WHEN k > 50 THEN 1 END) AS n,
                 CAST(SUM(CASE WHEN k > 50 THEN k END) AS BIGINT) AS sum_k
          FROM (
            SELECT event_type,
                   CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) AS k
            FROM events
          )
          GROUP BY event_type
        )
        WHERE n > 0
        """,
        ("events",),
        oracle="""
        WITH e AS (
          SELECT event_type,
                 CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                           THEN JSON_EXTRACT_STRING(props, '$.k') END
                      AS BIGINT) AS k
          FROM events
        )
        SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
        FROM e WHERE k > 50 GROUP BY event_type
        """,
    ),
}
