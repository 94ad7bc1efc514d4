"""Property-based differential testing of engine DML.

Hypothesis generates short INSERT/UPDATE/DELETE programs; each program is
applied both to an engine-managed table (versioned parquet + validation)
and to a plain in-Python model, then the final table states are compared
exactly. This exercises the DML surface the oracle gate can't reach
(engine tables, not fixtures): set-based UPDATE evaluation order, DELETE
predicates, PK uniqueness rejection, and version-flip visibility.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_sql_spark.engine import Engine, EngineError

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(
        spark, warehouse=str(tmp_path_factory.mktemp("prop-engine"))
    )


_ids = st.integers(min_value=0, max_value=9)
_vals = st.integers(min_value=-50, max_value=50)


def _op(draw_id, draw_val):
    return st.one_of(
        st.tuples(st.just("insert"), draw_id, draw_val),
        st.tuples(st.just("update_set"), draw_id, draw_val),   # v = k WHERE id = i
        st.tuples(st.just("update_incr"), draw_id, draw_val),  # v = v + k WHERE v < k
        st.tuples(st.just("delete_lt"), draw_val, draw_val),   # WHERE v < k
        st.tuples(st.just("delete_id"), draw_id, draw_id),
        st.tuples(st.just("upsert_nothing"), draw_id, draw_val),
        st.tuples(st.just("upsert_update"), draw_id, draw_val),
        st.tuples(st.just("update_from"), draw_val, draw_val),
        st.tuples(st.just("delete_using"), draw_val, draw_val),
    )


# fixed auxiliary join table for UPDATE ... FROM / DELETE ... USING:
# even ids 0-8, delta = id * 10 (unique ids -> no multi-match ambiguity)
_AUX = {i: i * 10 for i in range(0, 10, 2)}


_PROGRAM = st.lists(_op(_ids, _vals), min_size=1, max_size=5)

_counter = 0


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(prog=_PROGRAM)
def test_dml_program_matches_model(eng, prog):
    global _counter
    _counter += 1
    t = f"prop_dml_{_counter}"
    eng.sql(f"CREATE TABLE {t} (id INT PRIMARY KEY, v INT)")
    aux = f"prop_aux_{_counter}"
    if any(op in ("update_from", "delete_using") for op, _, _ in prog):
        eng.sql(f"CREATE TABLE {aux} (id INT PRIMARY KEY, delta INT)")
        eng.sql(
            f"INSERT INTO {aux} VALUES "
            + ", ".join(f"({k}, {d})" for k, d in _AUX.items())
        )
    model: dict[int, int] = {}
    try:
        for op, a, b in prog:
            if op == "insert":
                if a in model:
                    # PK violation must be REJECTED and leave no residue
                    with pytest.raises(EngineError):
                        eng.sql(f"INSERT INTO {t} VALUES ({a}, {b})")
                else:
                    eng.sql(f"INSERT INTO {t} VALUES ({a}, {b})")
                    model[a] = b
            elif op == "update_set":
                eng.sql(f"UPDATE {t} SET v = {b} WHERE id = {a}")
                if a in model:
                    model[a] = b
            elif op == "update_incr":
                eng.sql(f"UPDATE {t} SET v = v + 1 WHERE v < {b}")
                for k in model:
                    if model[k] < b:
                        model[k] += 1
            elif op == "delete_lt":
                eng.sql(f"DELETE FROM {t} WHERE v < {b}")
                model = {k: v for k, v in model.items() if not v < b}
            elif op == "delete_id":
                eng.sql(f"DELETE FROM {t} WHERE id = {a}")
                model.pop(a, None)
            elif op == "upsert_nothing":
                eng.sql(
                    f"INSERT INTO {t} VALUES ({a}, {b}) "
                    "ON CONFLICT (id) DO NOTHING"
                )
                model.setdefault(a, b)
            elif op == "upsert_update":
                eng.sql(
                    f"INSERT INTO {t} VALUES ({a}, {b}) "
                    "ON CONFLICT (id) DO UPDATE SET v = excluded.v"
                )
                model[a] = b
            elif op == "update_from":
                eng.sql(
                    f"UPDATE {t} SET v = {t}.v + {aux}.delta "
                    f"FROM {aux} "
                    f"WHERE {t}.id = {aux}.id AND {t}.v < {b}"
                )
                for k in model:
                    if k in _AUX and model[k] < b:
                        model[k] += _AUX[k]
            elif op == "delete_using":
                eng.sql(
                    f"DELETE FROM {t} USING {aux} "
                    f"WHERE {t}.id = {aux}.id AND {aux}.delta > {b}"
                )
                model = {
                    k: v
                    for k, v in model.items()
                    if not (k in _AUX and _AUX[k] > b)
                }
        got = {
            r[0]: r[1]
            for r in eng.sql(f"SELECT id, v FROM {t}").collect()
        }
        assert got == model
    finally:
        eng.sql(f"DROP TABLE {t}")
        eng.sql(f"DROP TABLE IF EXISTS {aux}")


def test_update_swap_semantics(eng):
    """pg set-based UPDATE: all SET expressions read the OLD row (the
    classic a,b swap) — the reference evaluates row-at-a-time but against
    the snapshot, same result."""
    eng.sql("CREATE TABLE swp (id INT PRIMARY KEY, a INT, b INT)")
    eng.sql("INSERT INTO swp VALUES (1, 10, 20)")
    eng.sql("UPDATE swp SET a = b, b = a WHERE id = 1")
    r = eng.sql("SELECT a, b FROM swp").collect()[0]
    assert (r[0], r[1]) == (20, 10)
    eng.sql("DROP TABLE swp")
