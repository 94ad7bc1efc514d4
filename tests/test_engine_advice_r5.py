"""Round-5 regression tests for the advisor-reported engine bugs:

1. ON CONFLICT DO UPDATE with duplicate conflict keys WITHIN the batch
   must raise (pg: "cannot affect row a second time"), not silently
   insert duplicate PK rows through MERGE's NOT MATCHED branch.
2. MERGE must enforce table CHECK constraints on the merged result (it
   re-validated only NOT NULL and enum domains).
3. CREATE TABLE constraint dispatch must key on the constraint KEYWORD,
   not a substring — `CONSTRAINT fk_x FOREIGN KEY (check_id) REFERENCES
   checklist(id)` is an FK even though 'check' appears three times.
4. RETURNING / ON CONFLICT suffix detection must ignore string literals
   in VALUES.
5. DISTINCT ON + ORDER BY + LIMIT/OFFSET must not absorb the LIMIT into
   the window's ORDER BY.
"""

from __future__ import annotations

import pytest

from cassandra_sql_spark.engine import Engine, EngineError


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_upsert_duplicate_batch_keys_raise(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, v TEXT)")
    eng.sql("INSERT INTO t VALUES (1, 'a')")
    with pytest.raises(EngineError, match="second time"):
        eng.sql(
            "INSERT INTO t VALUES (2, 'x'), (2, 'y') "
            "ON CONFLICT (id) DO UPDATE SET v = excluded.v"
        )
    # table unchanged: no duplicate-PK rows leaked through
    assert rows(eng.sql("SELECT id, v FROM t ORDER BY id")) == [(1, "a")]


def test_upsert_unique_batch_keys_still_work(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, v TEXT)")
    eng.sql("INSERT INTO t VALUES (1, 'a')")
    eng.sql(
        "INSERT INTO t VALUES (1, 'A'), (2, 'b') "
        "ON CONFLICT (id) DO UPDATE SET v = excluded.v"
    )
    assert rows(eng.sql("SELECT id, v FROM t ORDER BY id")) == [
        (1, "A"),
        (2, "b"),
    ]


def test_merge_enforces_check_constraints(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, n INT CHECK (n >= 0))")
    eng.sql("INSERT INTO t VALUES (1, 5)")
    eng.sql("CREATE TABLE s (id INT, n INT)")
    eng.sql("INSERT INTO s VALUES (1, -3)")
    with pytest.raises(EngineError, match="CHECK violated"):
        eng.sql(
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET n = s.n"
        )
    assert rows(eng.sql("SELECT n FROM t")) == [(5,)]


def test_upsert_do_update_enforces_check(eng):
    # the ON CONFLICT DO UPDATE path goes through _merge too
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, n INT CHECK (n >= 0))")
    eng.sql("INSERT INTO t VALUES (1, 5)")
    with pytest.raises(EngineError, match="CHECK violated"):
        eng.sql(
            "INSERT INTO t VALUES (1, -9) "
            "ON CONFLICT (id) DO UPDATE SET n = excluded.n"
        )


def test_named_fk_with_check_in_identifiers(eng):
    eng.sql("CREATE TABLE checklist (id INT PRIMARY KEY, title TEXT)")
    eng.sql("INSERT INTO checklist VALUES (1, 'daily')")
    eng.sql(
        "CREATE TABLE items (item_id INT PRIMARY KEY, check_id INT, "
        "CONSTRAINT fk_check FOREIGN KEY (check_id) "
        "REFERENCES checklist (id))"
    )
    eng.sql("INSERT INTO items VALUES (10, 1)")
    # the FK must actually be registered — an orphan insert fails
    with pytest.raises(EngineError):
        eng.sql("INSERT INTO items VALUES (11, 999)")


def test_named_check_and_named_unique_constraints(eng):
    eng.sql(
        "CREATE TABLE t (id INT PRIMARY KEY, n INT, u TEXT, "
        "CONSTRAINT n_nonneg CHECK (n >= 0), CONSTRAINT u_uni UNIQUE (u))"
    )
    eng.sql("INSERT INTO t VALUES (1, 1, 'a')")
    with pytest.raises(EngineError, match="CHECK violated"):
        eng.sql("INSERT INTO t VALUES (2, -1, 'b')")
    with pytest.raises(EngineError, match="UNIQUE"):
        eng.sql("INSERT INTO t VALUES (3, 3, 'a')")


def test_insert_literal_containing_returning_keyword(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, v TEXT)")
    eng.sql("INSERT INTO t VALUES (1, 'items returning soon')")
    assert rows(eng.sql("SELECT v FROM t")) == [("items returning soon",)]


def test_insert_literal_containing_on_conflict_keyword(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, v TEXT)")
    eng.sql("INSERT INTO t VALUES (1, 'the on conflict do nothing clause')")
    assert rows(eng.sql("SELECT v FROM t")) == [
        ("the on conflict do nothing clause",)
    ]


def test_insert_literal_with_real_returning_after(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, v TEXT)")
    out = eng.sql(
        "INSERT INTO t VALUES (1, 'returning x') RETURNING id, v"
    )
    assert rows(out) == [(1, "returning x")]


def test_distinct_on_with_limit(eng):
    eng.sql("CREATE TABLE t (k INT, c INT)")
    eng.sql(
        "INSERT INTO t VALUES (1, 9), (1, 1), (2, 8), (2, 2), (3, 7)"
    )
    out = eng.sql(
        "SELECT DISTINCT ON (k) k, c FROM t ORDER BY k, c LIMIT 2"
    )
    assert rows(out) == [(1, 1), (2, 2)]


def test_distinct_on_with_offset(eng):
    eng.sql("CREATE TABLE t (k INT, c INT)")
    eng.sql("INSERT INTO t VALUES (1, 9), (1, 1), (2, 8), (3, 7)")
    out = eng.sql(
        "SELECT DISTINCT ON (k) k, c FROM t ORDER BY k, c "
        "LIMIT 10 OFFSET 1"
    )
    assert rows(out) == [(2, 8), (3, 7)]
