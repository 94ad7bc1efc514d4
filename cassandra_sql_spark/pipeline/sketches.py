"""Mergeable frequency sketches — the counting complement of the HLL
cardinality sketches (``sketch_shard_merge``).

Count-min sketch (Cormode/Muthukrishnan 2005): a depth x width counter
grid; each value increments one counter per row (row-seeded hash), an
estimate is the MIN over its depth counters. Guarantees with fixed
hashes: estimate >= true count ALWAYS (counters only over-count), and
estimate <= true + (e/width)*N with probability ~1-e^-depth per item.

Why it matters at 100 TB: exact per-value counts need a shuffle keyed
by VALUE (cardinality-sized state); the sketch is a fixed
depth*width*8-byte grid per shard, built map-side in one partial
aggregation, merged across shards/days by SUMMING grids — the same
"never rescan the corpus" operating mode as the HLL and MinHash
indexes. Heavy-hitter screens, stopword discovery, and contamination
frequency caps all run off the merged grid.

Everything is JVM expressions (posexplode + groupBy count + broadcast
join); no UDF, no driver-side counting. The reference has no sketches
at all (its COUNT paths are exact row loops, kv/KvQueryExecutor.java).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 4


def _cm_col(value: Column, row: int, width: int) -> Column:
    """Counter column index for ``value`` in sketch row ``row``."""
    return F.pmod(F.xxhash64(value, F.lit(row)), F.lit(width))


def countmin_build(
    df: DataFrame,
    value_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    shard_col: str | None = None,
) -> DataFrame:
    """Count-min grid: (shard?, _row, _col, _cnt) — one counter per
    populated cell (absent cell == 0). One partial+final count
    aggregation; shuffle keyed by at most shard * depth * width cells,
    independent of value cardinality."""
    keys = ([shard_col] if shard_col else []) + ["_row", "_col"]
    ex = df.select(
        *([shard_col] if shard_col else []),
        F.posexplode(
            F.array(
                *[
                    _cm_col(F.col(value_col), r, width)
                    for r in range(depth)
                ]
            )
        ).alias("_row", "_col"),
    )
    return ex.groupBy(*keys).agg(F.count(F.lit(1)).alias("_cnt"))


def countmin_merge(sketch: DataFrame, shard_col: str) -> DataFrame:
    """Merge per-shard grids into one by summing counters cell-wise —
    the mergeability that makes the sketch a per-shard/day artifact."""
    return sketch.groupBy("_row", "_col").agg(
        F.sum("_cnt").alias("_cnt")
    )


def countmin_estimate(
    sketch: DataFrame,
    values: DataFrame,
    value_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Estimated count per row of ``values``: MIN over the value's depth
    counters. The grid is tiny (<= depth*width rows) -> broadcast join;
    the probe never shuffles the values side."""
    probes = values.select(
        "*",
        F.posexplode(
            F.array(
                *[
                    _cm_col(F.col(value_col), r, width)
                    for r in range(depth)
                ]
            )
        ).alias("_row", "_col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["_row", "_col"], "left")
        .groupBy(*values.columns)
        .agg(
            F.min(F.coalesce("_cnt", F.lit(0))).alias("est_count")
        )
    )


def misra_gries_candidates(
    df, key_col: str, k: int = 32
):
    """Per-partition Misra-Gries heavy-hitter CANDIDATES (<= k keys per
    partition), Arrow-batched.

    The mergeable-summaries guarantee (Agarwal et al., PODS'12): any key
    with global count > N/k survives SOME partition's k-counter sketch,
    so the union of per-partition survivors is a superset of the true
    heavy hitters. The caller re-counts the candidates exactly
    (candidate + verify), so the OUTPUT is exact and deterministic even
    though the sketch's internal counter values depend on row order.
    Driver state is bounded by k * partitions keys — the whole point at
    a billion-key domain, where the full groupBy this prunes would
    shuffle every key."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("candidate", LongType())])

    def run(batches):
        counters: dict[int, int] = {}
        for pdf in batches:
            for v in pdf[key_col]:
                if v is None or pd.isna(v):
                    continue
                v = int(v)
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"candidate": list(counters.keys())})

    return df.select(key_col).mapInPandas(run, schema)
