"""Test-data table loading and temp-view registration.

Tables (TPC-H-ish, driver-generated; see /root/repo/TESTDATA.md):
  region nation customer supplier part orders lineitem events
  documents embeddings
"""

from __future__ import annotations

import os

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


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
        # Spark's vectorized reader rejects) and TIMESTAMP(MICROS) across
        # driver data generations. Handle both: with nanosAsLong the NANOS
        # variant reads as long and is floor-divided to micros (matching
        # DuckDB's truncating ns->us conversion); the MICROS variant reads
        # as a timestamp already and passes through untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes)["ts"] == "bigint":
            # integer `div`, NOT double `/`: at nanosecond magnitudes double
            # division rounds and can flip the microsecond by one
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    register(spark, sf_dir, *TABLES)
