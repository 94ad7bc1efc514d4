"""Registry plumbing for the operator-inventory query catalog.

Each query module exposes ``QUERIES: dict[str, Q]``. A ``Q`` bundles the
Spark implementation (``(spark, sf_dir) -> DataFrame``) with the DuckDB
oracle SQL (or ``None`` for ops the driver checks rows-only).

Conventions that keep the driver's hash compare stable (see SURVEY §5):
- Alias every computed column identically in Spark and oracle SQL.
- Integer aggregates: CAST(... AS BIGINT) on both sides (DuckDB SUM(int)
  is HUGEINT, Spark is LONG).
- Double aggregates: sum via DECIMAL(25,2) then CAST to DOUBLE — decimal
  addition is exact, so the result is order-independent and engine-independent
  (a bare SUM(double) differs in final ulps between engines/partitionings).
- Queries with LIMIT order by a key set that is provably a total order
  (include a unique tiebreaker) — otherwise tie-breaking is nondeterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from cassandra_sql_spark.io import register


@dataclass(frozen=True)
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]


def sql_q(sql: str, tables: tuple[str, ...], oracle: str | None = "same") -> Q:
    """A query expressed as Spark SQL over the registered testdata views.

    ``oracle="same"`` (the default) reuses the identical SQL string for the
    DuckDB oracle — the bulk of the surface is ANSI SQL both engines parse.
    Pass an explicit string where dialects diverge, or None for rows-only.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register(spark, sf_dir, *tables)
        return spark.sql(sql)

    return Q(fn, sql if oracle == "same" else oracle)


def df_q(
    fn: Callable[[SparkSession, str], DataFrame],
    tables: tuple[str, ...],
    oracle: str | None,
) -> Q:
    """A query expressed through the DataFrame API (still Catalyst-planned)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        register(spark, sf_dir, *tables)
        return fn(spark, sf_dir)

    return Q(wrapped, oracle)


# Shared SQL fragments -------------------------------------------------------
#
# Deterministic double aggregation: scale to integer units, sum BIGINTs
# (exact, order-independent, stays in whole-stage codegen — ~6x faster than
# a DECIMAL-typed sum), divide back to double. Bounds: |x|*10^s < 2^53 per
# value and the scaled sum < 2^63 — holds with huge margin at the verify
# scale factors (and any per-group money sum short of 10^12).

def dsum(col: str, alias: str, scale: int = 2) -> str:
    """Order-independent, engine-independent sum of a double column.

    FLOOR(x*s + 0.5) (round-half-toward-+inf) rather than ROUND: Spark's
    ROUND(double) allocates a BigDecimal per row (~2x aggregate cost),
    while FLOOR is plain Math.floor — and both engines evaluate it
    identically on the same IEEE product."""
    s = 10 ** scale
    return (
        f"CAST(SUM(CAST(FLOOR(({col}) * {s} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {s} AS {alias}"
    )


def davg(col: str, alias: str, scale: int = 2) -> str:
    """Deterministic average: exact scaled-integer sum, double division."""
    s = 10 ** scale
    return (
        f"CAST(SUM(CAST(FLOOR(({col}) * {s} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {s} / COUNT({col}) AS {alias}"
    )


def isum(col: str, alias: str) -> str:
    return f"CAST(SUM({col}) AS BIGINT) AS {alias}"
