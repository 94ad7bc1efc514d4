"""A/B: global-window ROW_NUMBER vs operators.global_order.sharded_rank
(r10 verdict task #3) on the lineitem fact at sf1 (~6M rows) and sf10
(~60M rows). Reports wall seconds for each form (median of 3 after one
warm-up) plus an exceptAll identity check at the smaller size.

The point at 100 TB is not the local wall (one box executes the
single-partition sort at memory speed); it is that the sharded plan has
NO serial stage: its critical path is a parallel range shuffle + a
per-shard window, so it scales with executors while the window form's
single reducer scales with nothing. The local numbers bound the
OVERHEAD the sharded form pays for that property.

Usage: python scripts/sharded_rank_ab.py [sf1|sf10 ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cassandra_sql_spark.io import load  # noqa: E402
from cassandra_sql_spark.operators.global_order import (  # noqa: E402
    sharded_rank,
)
from cassandra_sql_spark.session import get_spark  # noqa: E402

SIZES = {"sf1": "/root/repo/.scale/sf1", "sf10": "/root/repo/.scale/sf10"}


def timed(mk) -> float:
    mk().write.mode("overwrite").format("noop").save()  # warm-up
    samples = []
    for _ in range(3):
        t0 = time.time()
        mk().write.mode("overwrite").format("noop").save()
        samples.append(time.time() - t0)
    return round(sorted(samples)[1], 2)


def main() -> int:
    spark = get_spark("sharded-rank-ab")
    for label in (sys.argv[1:] or list(SIZES)):
        sf = SIZES[label]
        # ROW_NUMBER with ties is arbitrary within a tied block, so the
        # two forms only agree on a UNIQUE order key (the helper's
        # documented contract): dedupe the pk once, OUTSIDE the timed
        # region, and rank the same materialized input in both forms.
        base = (
            load(spark, sf, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_extendedprice")
            .dropDuplicates(["l_orderkey", "l_linenumber"])
            .localCheckpoint(eager=True)
        )
        order = [F.col("l_orderkey"), F.col("l_linenumber")]

        def window_form():
            return base.withColumn(
                "i", F.row_number().over(Window.orderBy(*order)).cast("long")
            )

        def sharded_form():
            return sharded_rank(base, order, rank_col="i")

        t_window = timed(window_form)
        t_sharded = timed(sharded_form)
        if label == "sf1":
            a, b = sharded_form(), window_form()
            assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
            identity = "exceptAll-identical"
        else:
            identity = "identity checked at sf1"
        n = base.count()
        print(json.dumps({
            "size": label, "rows": n,
            "global_window_sec": t_window,
            "sharded_rank_sec": t_sharded,
            "identity": identity,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
