"""Test-data table loading and temp-view registration.

Tables (TPC-H-ish, driver-generated; see /root/repo/TESTDATA.md):
  region nation customer supplier part orders lineitem events
  documents embeddings
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def events_ts_is_nanos(path: str) -> bool:
    """Footer-only sniff of events.ts's parquet physical type (no Spark
    job): TIMESTAMP(NANOS) generations need the nanosAsLong escape hatch,
    TIMESTAMP(MICROS) generations must NOT set it (it is session-wide and
    would silently turn any other nanos column into bigint)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        part = next(
            f
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        path = os.path.join(path, part)
    if pq.read_schema(path).field("ts").type.unit != "ns":
        return False
    # pyarrow reports INT96 timestamps as ns too, but nanosAsLong only
    # applies to INT64 TIMESTAMP(NANOS) — an INT96 file (Spark's legacy
    # default output type) must take the plain-timestamp path
    f = pq.ParquetFile(path)
    if f.metadata.num_row_groups == 0:
        return False
    idx = f.schema_arrow.get_field_index("ts")
    return f.metadata.row_group(0).column(idx).physical_type == "INT64"


# Per-session metadata caches (round 12, guide §1.2 per-task work): the
# bench's rebuild-path queries reconstruct their whole pipeline inside the
# timed region, and every construction re-read parquet footers, re-sniffed
# the events timestamp type, and re-created identical temp views — ~0.11s
# of pure driver-side metadata work per repetition at sf0.1. A DataFrame
# is an immutable lazy plan, so reusing the object is metadata caching
# only: every action still recomputes from the parquet inputs. Keyed
# weakly per session (a restarted session gets a fresh cache), and by
# sf_dir so tests that hop between scale factors re-resolve correctly.
_LOAD_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Lazy DataFrame for ``table`` under ``sf_dir``, memoized per
    session (see _LOAD_CACHE above).

    Contract (r12 advice): source tables must be IMMUTABLE for the
    session lifetime — the cached plan pins the file listing/footer
    snapshot, so rewriting a source file at a reused path mid-session
    would read stale or deleted files. Every current producer honors
    this (optimize_layout is marker-guarded and write-once per path;
    test fixtures write to fresh tmp paths); a future in-place rewriter
    must bust this cache or use a new path."""
    cache = _LOAD_CACHE.setdefault(spark, {})
    key = (sf_dir, table)
    if key in cache:
        return cache[key]
    df = _load_uncached(spark, sf_dir, table)
    cache[key] = df
    return df


def _load_uncached(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
        # Spark's vectorized reader rejects) and TIMESTAMP(MICROS) across
        # driver data generations. Handle both, and normalize ts to
        # TimestampType in every path so batch, streaming, and both
        # generations agree (MICROS files are NTZ-logical and would
        # otherwise surface as timestamp_ntz).
        if events_ts_is_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # integer `div`, NOT double `/`: at nanosecond magnitudes double
            # division rounds and can flip the microsecond by one
            df = spark.read.parquet(path).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            df = spark.read.parquet(path).withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
        return df.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return spark.read.parquet(path)


def register(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    """Register the named tables as temp views (no-op for an empty list).

    Also pins session timezone to UTC — the driver hands us its own session,
    and timestamp determinism vs the DuckDB oracle depends on it.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # view creation is always re-run (cheap, and the engine facade may
    # legitimately have re-pointed a samename view in between); only the
    # footer-read/plan-build cost is cached via load()
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    register(spark, sf_dir, *TABLES)
