"""Adversarial-events differential: the events-family oracle entries
(streaming drains, temporal joins, JSON extraction) re-checked on a
pathological event log — duplicate event rows (at-least-once delivery),
exact-timestamp ties, purchases before any click, users with a single
event, NULL values, NULL / empty / MALFORMED JSON props — against the
driver-faithful DuckDB compare.

Complements test_adversarial_corpus (documents family). This net forced
the json_valid guards in the JSON oracles: Spark's get_json_object NULLs
garbage, DuckDB's extractor raises.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pytest

from cassandra_sql_spark.queries import REGISTRY
from cassandra_sql_spark.testing import compare

pytestmark = pytest.mark.slow


def _ts(day, h, m=0, s=0):
    return datetime.datetime(1995, 3, day, h, m, s)


ADV_EVENTS = [
    # u1: click and purchase at the EXACT same instant (asof boundary
    # p.ts <= c.ts includes equality; interval join boundary >=)
    (100, _ts(1, 9), 1, "click", 10.0, '{"k": 60}'),
    (101, _ts(1, 9), 1, "purchase", 99.0, '{"k": 10}'),
    # u1 again next day: purchase 30min after click (in-window)
    (102, _ts(2, 9), 1, "click", 1.0, None),
    (103, _ts(2, 9, 30), 1, "purchase", 5.0, "not json at all"),
    # u2: purchase BEFORE any click (unmatched purchase, asof null side)
    (200, _ts(1, 8), 2, "purchase", 7.0, "{}"),
    (201, _ts(1, 12), 2, "click", 2.0, '{"k": 51}'),
    # u3: click with NO purchase ever (left-join null row)
    (300, _ts(1, 10), 3, "click", 3.0, '{"k": "55"}'),
    # u3: duplicate DELIVERY of the same event (same id, same everything)
    (300, _ts(1, 10), 3, "click", 3.0, '{"k": "55"}'),
    # u4: error then click 1 min later (range join hit), lone error later
    (400, _ts(1, 11), 4, "error", 0.0, ""),
    (401, _ts(1, 11, 1), 4, "click", 4.0, '{"nested": {"k": 1}}'),
    (402, _ts(3, 11), 4, "error", 0.0, None),
    # u5: single event, NULL value
    (500, _ts(1, 13), 5, "view", None, '{"k": 200}'),
    # NULL event time: belongs to no event-time window (dropped by
    # window()/watermark operators; batch oracles align via ts IS NOT
    # NULL), but still visible to non-event-time queries
    (600, None, 6, "click", 1.0, None),
    (601, None, 6, "purchase", 2.0, None),
    # far-future anchor so the 2h watermark tail excludes nothing above
    (900, _ts(6, 23), 9, "view", 0.0, None),
]


def _events_only_targets():
    import re as _re

    out = []
    others = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings")
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        o = q.oracle.lower()
        # word-boundary match: a bare substring test excluded every
        # oracle containing PARTITION (matches table name "part")
        if _re.search(r"\bevents\b", o) and not any(
            _re.search(rf"\b{t}\b", o) for t in others
        ):
            out.append(name)
    return out


@pytest.fixture(scope="module")
def adv_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("advevents"))
    spark.createDataFrame(
        ADV_EVENTS,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


@pytest.fixture(scope="module")
def adv_events_duck(adv_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{adv_events_dir}/events.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_events_only_targets()))
def test_adversarial_events_match_oracle(
    name, spark, adv_events_dir, adv_events_duck
):
    q = REGISTRY[name]
    df = q.fn(spark, adv_events_dir)
    srows = [tuple(r) for r in df.collect()]
    res = adv_events_duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = compare(srows, df.columns, orows, ocols, strict=True)
    assert not problems, f"{name}: {problems}"
