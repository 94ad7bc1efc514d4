"""The operator-inventory query catalog.

``REGISTRY`` maps query name -> Q(fn, oracle). ``__spark_entry__.py``
exposes it to the correctness driver; ``bench.py`` runs the headline subset.
"""

from __future__ import annotations

from cassandra_sql_spark.queries import (
    aggregates,
    expressions,
    joins,
    json_ops,
    more_sql,
    pipeline_queries,
    relational,
    setops,
    streaming_queries,
    subqueries,
    temporal_queries,
    tpch,
    tpch_extra,
    windows,
)
from cassandra_sql_spark.queries.base import Q

_MODULES = (
    tpch,
    tpch_extra,
    relational,
    joins,
    aggregates,
    windows,
    setops,
    subqueries,
    expressions,
    json_ops,
    more_sql,
    pipeline_queries,
    streaming_queries,
    temporal_queries,
)

REGISTRY: dict[str, Q] = {}
for _m in _MODULES:
    for _name, _q in _m.QUERIES.items():
        if _name in REGISTRY:
            raise ValueError(f"duplicate query name: {_name}")
        REGISTRY[_name] = _q
