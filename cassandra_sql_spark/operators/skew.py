"""Salted equi-join: the skew escape hatch for keys AQE can't split.

AQE's skew-join handles moderate skew by splitting oversized partitions,
but it can only split the *streamed* side of a sort-merge join; a single
pathological key (one customer owning 10% of all orders) still lands every
matching build row in one task. Salting redistributes that key:

- the large (skewed) side gets a deterministic salt in [0, salt) derived by
  hashing designated row-distinguishing columns (not the join key — the
  point is to spread identical keys);
- the smaller side is replicated across all salt values (explode — its
  size multiplies by `salt`, so pick salt just large enough to flatten the
  hot partitions);
- the join adds `_salt` to the key list, so each hot key spreads over
  `salt` partitions; the result is identical to the unsalted join.

Supported: inner and left-outer (the replicated side is the right side, so
unmatched left rows still appear exactly once). Right/full-outer would emit
`salt` copies of unmatched right rows — rejected.

The reference has no counterpart (single-process hash joins, SURVEY §2.3);
this exists for the 100 TB design point (SCALE.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__cass_salt"


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    salt: int = 16,
    salt_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join `left` (large, skewed) to `right` on [(l_col, r_col), ...].

    `salt_on`: columns whose hash spreads rows of one hot key (defaults to
    every left column — always row-distinguishing, costs one hash of the
    row). Equality with the plain join is oracle-checked in the registry
    (`join_salted_skew`).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted join supports inner/left, got {how!r}")
    src = salt_on or left.columns
    l_salted = left.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt)).cast("int"),
    )
    r_salted = right.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    cond = F.col(f"l.{SALT_COL}") == F.col(f"r.{SALT_COL}")
    for l_col, r_col in on:
        cond = cond & (F.col(f"l.{l_col}") == F.col(f"r.{r_col}"))
    joined = l_salted.alias("l").join(r_salted.alias("r"), cond, how)
    return joined.drop(SALT_COL)
