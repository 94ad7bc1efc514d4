"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, column names, and an
order-insensitive value multiset (floats compared to 9 significant digits).

``--hash`` switches to the driver-faithful representation-sensitive
compare (cassandra_sql_spark.testing strict mode): values stringify the
way fetch paths render them, so trailing-zero DECIMAL drift — value-equal
but hash-different, the round-3 failure mode — fails LOCALLY before the
driver ever sees it. Any Decimal crossing the boundary mismatches by
construction (the contract is DOUBLE at the boundary).

Usage: python scripts/verify_local.py [--hash] [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from cassandra_sql_spark.io import TABLES  # noqa: E402
from cassandra_sql_spark.session import get_spark  # noqa: E402
from cassandra_sql_spark.testing import (  # noqa: E402
    boundary_problems,
    compare,
)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--hash"]
    strict = "--hash" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(rows)} rows [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = list(rel.types)
            orows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        # Driver hash-boundary contract (r4 postmortem): ARRAY/MAP Spark
        # outputs crash the driver's hasher; HUGEINT/DECIMAL oracle types
        # drift in fetch representation. Fail them here, before the
        # driver ever sees them — in BOTH compare modes.
        problems = boundary_problems(df.dtypes, ocols, otypes)
        problems += compare(rows, cols, orows, ocols, strict=strict)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
