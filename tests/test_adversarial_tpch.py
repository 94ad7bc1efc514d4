"""Adversarial-relational differential: every oracle entry over the
TPC-H-shaped tables re-checked on NULL-riddled mini-tables — NULL join
keys (FK rows that match nothing), orphan FKs, NULL aggregation inputs,
all-NULL groups, NULL sort/group keys, NULL dates outside filter ranges,
tie values — against the driver-faithful DuckDB compare.

The driver fixtures are TPC-H-spec NOT NULL throughout, so none of the
SQL surface's NULL semantics (three-valued logic in joins and filters,
null-skipping aggregates, NULL group keys, grouping sets over empty
input) were exercised by the oracle gate before this net. Findings it
forced: a vacuous-bound arm for all-NULL percentile groups, a NULL guard
for DuckDB's split_part (returns '' on NULL where Spark/pg return NULL),
and a HAVING alignment for Spark's no-rows grouping-sets-over-empty
behavior (pg/DuckDB emit a zero grand-total row).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from cassandra_sql_spark.queries import REGISTRY
from cassandra_sql_spark.testing import compare

pytestmark = pytest.mark.slow

D = datetime.datetime

ADV_TABLES = {
    "region": (
        "r_regionkey INT, r_name STRING",
        [(0, "AMERICA"), (1, "ASIA"), (2, None)],
    ),
    "nation": (
        "n_nationkey INT, n_name STRING, n_regionkey INT",
        [(0, "USA", 0), (1, "JAPAN", 1), (2, "NOWHERE", None)],
    ),
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING",
        [
            (1, "alice", 0, 100.0, "BUILDING"),
            (2, "bob", 1, None, "AUTOMOBILE"),
            (3, "carol", None, -50.0, "BUILDING"),
            (4, "dan", 0, 100.0, None),
            (5, "eve", 2, 0.0, "MACHINERY"),
        ],
    ),
    "supplier": (
        "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
        [(1, "s1", 0, 10.0), (2, "s2", 1, None), (3, "s3", None, -1.0)],
    ),
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
        [
            (1, "widget alpha", "Brand#1", "SMALL PLATED", 5, 100.0),
            (2, "gizmo beta", "Brand#2", None, None, 50.0),
            (3, "thing gamma", None, "LARGE BRUSHED", 50, None),
        ],
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
        [
            (10, 1, "O", 500.0, D(1995, 3, 1), "1-URGENT"),
            (11, 1, "F", 500.0, D(1995, 3, 2), "2-HIGH"),
            (12, 2, "O", None, D(1995, 3, 5), None),
            (13, None, "F", 10.0, D(1995, 4, 1), "3-MEDIUM"),
            (14, 3, "O", 20.0, None, "1-URGENT"),
            (15, 99, "O", 30.0, D(1995, 5, 1), "5-LOW"),
        ],
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
        [
            (10, 1, 1, 1, 10.0, 100.0, 0.05, 0.02, "N", "O", D(1995, 3, 10)),
            (10, 2, 2, 2, None, 50.0, 0.0, 0.0, "R", "F", D(1995, 3, 11)),
            (11, 3, 3, 1, 5.0, None, None, 0.01, "A", "F", D(1995, 3, 12)),
            (12, 1, 1, 1, 2.0, 20.0, 0.1, None, None, "O", None),
            (13, 2, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D(1995, 4, 2)),
            (99, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D(1995, 4, 3)),
        ],
    ),
}


def _relational_targets():
    import re as _re

    out = []
    excluded = ("events", "documents", "embeddings")
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        o = q.oracle.lower()
        # word-boundary: table-name words only (not PARTITION, etc.)
        if any(_re.search(rf"\b{t}\b", o) for t in excluded):
            continue
        if any(_re.search(rf"\b{t}\b", o) for t in ADV_TABLES):
            out.append(name)
    return out


@pytest.fixture(scope="module")
def adv_tpch_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("advtpch"))
    for t, (schema, rows) in ADV_TABLES.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def adv_tpch_duck(adv_tpch_dir):
    con = duckdb.connect()
    for t in ADV_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{adv_tpch_dir}/{t}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_relational_targets()))
def test_adversarial_tpch_matches_oracle(
    name, spark, adv_tpch_dir, adv_tpch_duck
):
    q = REGISTRY[name]
    df = q.fn(spark, adv_tpch_dir)
    srows = [tuple(r) for r in df.collect()]
    res = adv_tpch_duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = compare(srows, df.columns, orows, ocols, strict=True)
    assert not problems, f"{name}: {problems}"
