"""Temporal join operators Spark SQL lacks as primitives (north-star
"custom operators": as-of join, range join), built as compositions of
existing DataFrame ops — no UDFs, no driver-side loops.

- as-of join: union both sides tagged, one window per key ordered by time,
  ``last(..., ignoreNulls)`` carries the most recent right-side values
  forward, keep left rows. ONE shuffle on the key — at 100 TB this is the
  textbook pattern (vs. an inequality join, which Spark would execute as a
  broadcast-nested-loop or cross product).
- range join (|t_a - t_b| <= tolerance): band both sides into
  tolerance-width bins, explode the left side into its bin±1, equi-join on
  (key, bin), then exact-filter. Candidate set is bounded by bin
  population, never |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row for the same key:
    ``direction="backward"`` (default) takes the greatest ``right_ts <=
    left_ts``, ``"forward"`` the smallest ``right_ts >= left_ts`` — the
    forward case is the same merge with the time axis reversed — and
    ``"nearest"`` whichever of the two is closer in time (ties go
    backward, the pandas merge_asof convention). Nearest runs BOTH
    carried-window passes in one plan over the same union + user_id
    partitioning (one shuffle, two in-partition window sorts) and picks
    per row. Ties included either way; left rows with no match get
    NULLs."""
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, value_cols, suffix
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    lcols = left.columns
    l = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal _t so ties are visible
    t_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(t_ord, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    out = merged
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).select(*lcols, *carried)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str,
) -> DataFrame:
    """Nearest-in-time as-of: carry the last right row in BOTH time
    directions over one union (ascending and descending window passes
    share the same hash partitioning on the key — one shuffle), then
    pick per left row by absolute gap; equal gaps take the backward
    match (pandas merge_asof nearest convention)."""
    lcols = left.columns
    l = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w_b = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    out = merged
    for c in carried:
        out = out.withColumn(f"{c}__b", F.last(c, ignorenulls=True).over(w_b))
        out = out.withColumn(f"{c}__f", F.last(c, ignorenulls=True).over(w_f))
    bts = F.col(f"{right_ts}{suffix}__b")
    fts = F.col(f"{right_ts}{suffix}__f")
    use_b = fts.isNull() | (
        bts.isNotNull() & ((F.col("_t") - bts) <= (fts - F.col("_t")))
    )
    picked = [
        F.when(use_b, F.col(f"{c}__b")).otherwise(F.col(f"{c}__f")).alias(c)
        for c in carried
    ]
    return out.filter(F.col("_side") == 1).select(*lcols, *picked)


def _bin(ts: Column, seconds: int) -> Column:
    return F.floor(F.unix_timestamp(ts) / F.lit(seconds)).cast("long")


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with the same key whose timestamps differ by
    at most ``tolerance_seconds`` — banded equi-join + exact filter."""
    l = left.withColumn(
        "_bin",
        F.explode(
            F.array(
                *[
                    _bin(F.col(left_ts), tolerance_seconds) + d
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    r = right.withColumn("_bin", _bin(F.col(right_ts), tolerance_seconds))
    joined = l.join(r, [on, "_bin"])
    return joined.filter(
        F.abs(
            F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts))
        )
        <= tolerance_seconds
    ).drop("_bin")
