"""Distributed global-order primitives: rank and running sum without a
single-partition window.

The reference's ORDER BY executor is a single-node sort
(executor/QueryExecutor.java sorts materialized row lists), so every
"global rank" it computes is trivially serial. The Spark-native hazard
is the opposite: ``ROW_NUMBER() OVER (ORDER BY ...)`` with an empty
PARTITION BY collapses the whole input onto ONE reducer — fine on a
dimension-sized rollup, fatal on a 100 TB fact table. These helpers
compute the identical answer with no SinglePartition exchange:

1. ``repartitionByRange`` on the order columns — Spark's range
   partitioner samples boundaries, so shard k holds a contiguous,
   disjoint slice of the global order (ties share a shard: the
   partitioner binary-searches boundary values, equal keys land
   together);
2. a PER-SHARD window (PARTITION BY shard id) computes the local rank /
   running sum — parallel across shards, bounded memory per reducer;
3. per-shard totals (<= num_shards rows, a model-sized driver fetch of
   the same class as ivf_train's centroid collect) become broadcast
   prefix OFFSETS added to every local value.

Rank/row_number needs the offset to be the COUNT of earlier shards'
rows; a running SUM needs the SUM of earlier shards' values — same
recipe, different offset column. The result is exactly the global
window's answer whenever the order key is total (unique tuples); with
duplicate keys row_number's tie order differs within equal-key blocks,
which every caller here either breaks with an id column or is
invariant to (documented per entry).

Cost model at 100 TB: one range-repartition shuffle (same volume as
the global sort's exchange), a fully parallel window, a num_shards-row
collect, a broadcast hash join against a two-column offsets table. The
serial stage is gone; max reducer state drops from |rows| to
|rows|/num_shards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sharded_rank", "sharded_cumsum"]

_SHARD = "__go_shard"
_LOCAL = "__go_local"


def _sharded_prefix(
    df: DataFrame,
    order_cols: list[Column | str],
    local_expr: Column,
    offset_of,
    out_col: str,
    num_shards: int | None,
    total_col: str | None = None,
) -> DataFrame:
    """Shared engine: range-shard on ``order_cols``, evaluate
    ``local_expr`` over the per-shard ordered window, then add the
    broadcast prefix offset ``offset_of(per-shard totals)``."""
    spark = df.sparkSession
    if num_shards is None:
        num_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # The shard assignment MUST be materialized before it is read twice:
    # RangePartitioner seeds its boundary sample from the RDD id, which
    # is a fresh global counter per job — without the checkpoint the
    # totals pass and the final pass can shard on DIFFERENT boundaries
    # and the offsets silently mis-add (caught by the sf1 identity test;
    # sf0.01 was too small to split differently). The checkpoint
    # materializes exactly what the global sort's shuffle would have.
    sharded = (
        df.repartitionByRange(num_shards, *cols)
        .withColumn(_SHARD, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy(_SHARD).orderBy(*cols)
    local = sharded.withColumn(_LOCAL, local_expr.over(w))
    # per-shard totals: <= num_shards rows — a bounded, model-sized
    # fetch (NOT a data collect); prefix-sum on the driver
    totals = sorted(
        (r[0], r[1])
        for r in sharded.groupBy(_SHARD).agg(offset_of).collect()
    )
    offsets, acc = [], 0
    for shard_id, tot in totals:
        offsets.append((shard_id, acc))
        acc += tot
    off_df = spark.createDataFrame(offsets, f"{_SHARD} int, __go_off bigint")
    out = (
        local.join(F.broadcast(off_df), _SHARD)
        .withColumn(out_col, (F.col(_LOCAL) + F.col("__go_off")).cast("long"))
        .drop(_SHARD, _LOCAL, "__go_off")
    )
    if total_col is not None:
        # The grand total (all shards' offset_of summed) is already on
        # the driver — attach it as a literal so callers needing |rows|
        # (e.g. a top-frac cut) avoid a second evaluation of the input.
        out = out.withColumn(total_col, F.lit(acc).cast("long"))
    return out


def sharded_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str = "i",
    num_shards: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Global ``ROW_NUMBER() OVER (ORDER BY order_cols)`` as per-shard
    rank + broadcast prefix-count offsets. Identical to the window form
    when the order tuple is unique (callers break ties with an id).
    ``total_col``, when set, adds the total row count as a literal
    column (free — it is the last prefix offset)."""
    return _sharded_prefix(
        df,
        order_cols,
        F.row_number(),
        F.count(F.lit(1)).cast("long"),
        rank_col,
        num_shards,
        total_col=total_col,
    )


def sharded_cumsum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out_col: str = "cum",
    num_shards: int | None = None,
) -> DataFrame:
    """Global inclusive running ``SUM(value_col) OVER (ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)`` as per-shard running sum +
    broadcast prefix-sum offsets. Exact for integral value columns
    (BIGINT adds are associative); same tie caveat as sharded_rank.

    ``value_col`` must be NON-NULL: a NULL row would make the local
    running sum NULL from that row onward (SQL window-SUM semantics)
    while the coalesced shard total skips it — callers filter or
    ``coalesce`` upstream. The per-shard total is coalesced to 0 so an
    (invalid but possible) all-NULL shard cannot poison the driver
    prefix loop with a ``None``."""
    return _sharded_prefix(
        df,
        order_cols,
        F.sum(value_col),
        F.coalesce(F.sum(value_col), F.lit(0)).cast("long"),
        out_col,
        num_shards,
    )
