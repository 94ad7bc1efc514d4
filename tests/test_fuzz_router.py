"""Fuzz the engine's regex statement router (VERDICT r5 #8).

The engine dispatches and splits SQL with literal-masked regexes over
2,500 lines of clause handling; 5 of 5 round-4 advisor findings and 1
of 4 round-5 findings were masking/dispatch bugs there (a keyword
inside a string literal or identifier corrupting the clause split).
These tests GENERATE the hazard instead of hand-pinning each shape:
string literals and identifiers built from the router's own keywords
(WHERE/FROM/RETURNING/CHECK/ON CONFLICT/SET/VALUES/USING...) flow
through INSERT / UPDATE / DELETE / MERGE / CREATE / ON CONFLICT /
RETURNING, asserting parse-don't-corrupt: the literal comes back byte
-identical and the statement's effect is exactly its semantics.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_sql_spark.engine import Engine

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = Engine(
        spark, warehouse=str(tmp_path_factory.mktemp("fuzz-router"))
    )
    e.sql("CREATE TABLE fz (id INT PRIMARY KEY, note TEXT, n INT)")
    e.sql("CREATE TABLE fz_aux (id INT PRIMARY KEY, note TEXT)")
    e.sql("INSERT INTO fz_aux VALUES (1, 'aux where from'), (2, 'x')")
    return e


# The router's own trigger words, plus punctuation that drives the
# clause splitters (commas at depth 0, parens, doubled quotes).
_KEYWORDS = [
    "where", "WHERE", "from", "FROM", "returning", "RETURNING",
    "set", "SET", "values", "VALUES", "on conflict", "ON CONFLICT",
    "do update", "check", "CHECK", "using", "USING", "when matched",
    "group by", "order by", "select", "insert into", "delete from",
    "update", "merge into", "references", "foreign key", "primary key",
    "default", "generated always",
]
_FILLER = ["a", "b", "it went", "x=1", "1,2", "(", ")", "(x)", ",",
           "''", "--", ";", "*", "+1"]

_lit_words = st.lists(
    st.sampled_from(_KEYWORDS + _FILLER), min_size=1, max_size=6
)


@st.composite
def literals(draw):
    """A hazard-laden string literal VALUE (unescaped)."""
    return " ".join(draw(_lit_words))


def _q(value: str) -> str:
    """Embed a Python string as a SQL single-quoted literal."""
    return "'" + value.replace("'", "''") + "'"


def rows(df):
    return [tuple(r) for r in df.collect()]


_counter = [1000]


def _next_id() -> int:
    _counter[0] += 1
    return _counter[0]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lit=literals())
def test_insert_select_roundtrip(eng, lit):
    i = _next_id()
    eng.sql(f"INSERT INTO fz VALUES ({i}, {_q(lit)}, 0)")
    got = rows(eng.sql(f"SELECT note FROM fz WHERE id = {i}"))
    assert got == [(lit,)]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lit=literals())
def test_insert_returning_roundtrip(eng, lit):
    i = _next_id()
    got = rows(
        eng.sql(
            f"INSERT INTO fz VALUES ({i}, {_q(lit)}, 1) RETURNING note, n"
        )
    )
    assert got == [(lit, 1)]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lit=literals())
def test_update_set_where_roundtrip(eng, lit):
    i = _next_id()
    eng.sql(f"INSERT INTO fz VALUES ({i}, 'orig', 0)")
    eng.sql(f"UPDATE fz SET note = {_q(lit)}, n = n + 1 WHERE id = {i}")
    got = rows(eng.sql(f"SELECT note, n FROM fz WHERE id = {i}"))
    assert got == [(lit, 1)]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lit=literals())
def test_delete_by_literal_predicate(eng, lit):
    i, j = _next_id(), _next_id()
    eng.sql(f"INSERT INTO fz VALUES ({i}, {_q(lit)}, 7)")
    eng.sql(f"INSERT INTO fz VALUES ({j}, 'keep me', 7)")
    eng.sql(f"DELETE FROM fz WHERE note = {_q(lit)} AND id = {i}")
    left = rows(
        eng.sql(f"SELECT id FROM fz WHERE id IN ({i}, {j}) ORDER BY id")
    )
    assert left == [(j,)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lit=literals())
def test_upsert_conflict_update_roundtrip(eng, lit):
    i = _next_id()
    eng.sql(f"INSERT INTO fz VALUES ({i}, 'orig', 0)")
    eng.sql(
        f"INSERT INTO fz VALUES ({i}, {_q(lit)}, 5) "
        f"ON CONFLICT (id) DO UPDATE SET note = excluded.note, "
        f"n = excluded.n"
    )
    got = rows(eng.sql(f"SELECT note, n FROM fz WHERE id = {i}"))
    assert got == [(lit, 5)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lit=literals())
def test_merge_literal_roundtrip(eng, lit):
    i = _next_id()
    eng.sql(f"INSERT INTO fz VALUES ({i}, 'orig', 0)")
    eng.sql(
        f"MERGE INTO fz USING (SELECT {i} AS id, {_q(lit)} AS note) s "
        f"ON fz.id = s.id "
        f"WHEN MATCHED THEN UPDATE SET note = s.note "
        f"WHEN NOT MATCHED THEN INSERT (id, note, n) "
        f"VALUES (s.id, s.note, 9)"
    )
    got = rows(eng.sql(f"SELECT note FROM fz WHERE id = {i}"))
    assert got == [(lit,)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lit=literals())
def test_create_table_default_literal(eng, lit):
    """DEFAULT literals containing keywords must survive CREATE's
    constraint splitter and apply on INSERT."""
    i = _next_id()
    t = f"fz_d{i}"
    eng.sql(
        f"CREATE TABLE {t} (id INT PRIMARY KEY, "
        f"note TEXT DEFAULT {_q(lit)}, "
        f"m INT CHECK (m >= 0))"
    )
    try:
        eng.sql(f"INSERT INTO {t} (id, m) VALUES (1, 3)")
        got = rows(eng.sql(f"SELECT note, m FROM {t}"))
        assert got == [(lit, 3)]
    finally:
        eng.sql(f"DROP TABLE {t}")


# Identifier-level hazards: column names made of router keywords.
_IDENT_NAMES = [
    "returning_x", "check_id", "from_col", "where_col", "on_conflict",
    "set_val", "values_col", "using_col", "select_n", "update_n",
]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cols=st.lists(
        st.sampled_from(_IDENT_NAMES), min_size=2, max_size=4, unique=True
    )
)
def test_keyword_identifiers_roundtrip(eng, cols):
    i = _next_id()
    t = f"fz_i{i}"
    decl = ", ".join(f"{c} INT" for c in cols)
    eng.sql(f"CREATE TABLE {t} (id INT PRIMARY KEY, {decl})")
    try:
        vals = ", ".join(str(k) for k in range(len(cols)))
        eng.sql(f"INSERT INTO {t} VALUES (1, {vals})")
        eng.sql(f"UPDATE {t} SET {cols[0]} = {cols[0]} + 100 WHERE id = 1")
        got = rows(
            eng.sql(f"SELECT {', '.join(cols)} FROM {t} WHERE id = 1")
        )
        expect = tuple(
            k + 100 if k == 0 else k for k in range(len(cols))
        )
        assert got == [expect]
    finally:
        eng.sql(f"DROP TABLE {t}")
