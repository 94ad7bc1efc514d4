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
    # here: the filter gets pushed below the project, so whichever
    # expression is used is evaluated twice per surviving row — single-path
    # streaming extraction beats materializing a from_json struct twice
    # (0.38s vs 0.50s at sf0.1; variant_get 0.43s). Re-measured round 8
    # after two rounds of driver-ratio drift (1.25x -> 1.40x): with the
    # variants INTERLEAVED over 12 reps on a quiet box, get_json_object
    # med 0.415s vs variant_get 0.432s — still the right strategy; the
    # driver ratio is calibration noise (sequential A/Bs invert under
    # JVM drift; SCALE.md §9 records the measurement protocol).
    "json_filter_agg": sql_q(
        """
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS sum_k
        FROM (
          SELECT event_type,
                 CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) AS k
          FROM events
        )
        WHERE k > 50
        GROUP BY event_type
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
