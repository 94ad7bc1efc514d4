"""Every registry query vs its DuckDB oracle at sf0.001 (the same compare
the round driver applies at sf0.01: row count + columns + order-insensitive
value multiset). Rows-only queries are executed for schema stability."""

from __future__ import annotations

import pytest

from cassandra_sql_spark.queries import REGISTRY
from cassandra_sql_spark.testing import compare

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    assert df.columns, name
    if q.oracle is None:
        # rows-only: runs end-to-end, schema is non-empty and re-runnable
        rows2 = [tuple(r) for r in q.fn(spark, sf_dir).collect()]
        assert sorted(df.columns) == sorted(q.fn(spark, sf_dir).columns)
        assert len(rows) == len(rows2), f"{name} not deterministic"
        return
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = compare(rows, df.columns, orows, ocols)
    assert not problems, f"{name}: {problems}"
