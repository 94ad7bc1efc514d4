"""Noop-execute every registry entry Spark-side at the given SF: the
breadth check that every operator still runs and nothing got expensive.

Usage: python scripts/sweep_registry.py [sf_dir] > plans/r13/sweep.txt
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_sql_spark import sources  # noqa: E402
from cassandra_sql_spark.queries import REGISTRY  # noqa: E402
from cassandra_sql_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sweep-registry")
    data = sources.optimize_layout(sf_dir)
    times: dict[str, float] = {}
    errors = 0
    t_all = time.time()
    for name in REGISTRY:
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.time()
        try:
            REGISTRY[name].fn(spark, data).write.mode("overwrite").format(
                "noop"
            ).save()
            times[name] = time.time() - t0
        except Exception:
            errors += 1
            print(f"ERROR {name}", flush=True)
            traceback.print_exc()
        spark.catalog.clearCache()
    total = time.time() - t_all
    print(f"swept {len(times)} entries, {errors} errors, {total:.1f}s total")
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.2f}s  {name}")


if __name__ == "__main__":
    main()
