"""Round-6 regression tests for the advisor-reported bugs:

1. UPDATE's single-table path must parse from the literal-masked split:
   a SET string literal containing ' where ' must not corrupt the SET
   list or the predicate, and a malformed UPDATE raises EngineError
   (not AttributeError).
2. ALTER TABLE ... RENAME COLUMN must rename the backing identity
   sequence and rewrite partition metadata; DROP COLUMN must reject
   partition columns instead of failing mid-DDL.
3. VERIFY CONSTRAINTS' FK audit follows pg MATCH SIMPLE: a composite-FK
   row with any NULL key column is not an orphan (mirrors the write
   path's na.drop()).
4. zorder_column must clamp interleave bits so 6+ columns cannot
   overflow the signed-long z-value.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_sql_spark.engine import Engine, EngineError
from cassandra_sql_spark.sources import zorder_column


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def rows(df):
    return [tuple(r) for r in df.collect()]


# 1 — UPDATE masking ---------------------------------------------------------

def test_update_set_literal_containing_where(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, note TEXT)")
    eng.sql("INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    eng.sql("UPDATE t SET note = 'see where it went' WHERE id = 1")
    assert rows(eng.sql("SELECT id, note FROM t ORDER BY id")) == [
        (1, "see where it went"),
        (2, "y"),
    ]


def test_update_set_literal_containing_from_and_comma(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY, note TEXT, n INT)")
    eng.sql("INSERT INTO t VALUES (1, 'x', 0)")
    eng.sql(
        "UPDATE t SET note = 'from a, to b where c', n = n + 1 WHERE id = 1"
    )
    assert rows(eng.sql("SELECT note, n FROM t")) == [
        ("from a, to b where c", 1)
    ]


def test_bad_update_raises_engine_error(eng):
    eng.sql("CREATE TABLE t (id INT PRIMARY KEY)")
    with pytest.raises(EngineError):
        eng.sql("UPDATE t")
    with pytest.raises(EngineError):
        eng.sql("UPDATE t SET ")


# 2 — RENAME COLUMN / DROP COLUMN metadata ----------------------------------

def test_rename_identity_column_keeps_sequence(eng):
    eng.sql(
        "CREATE TABLE t (id INT GENERATED ALWAYS AS IDENTITY, v TEXT)"
    )
    eng.sql("INSERT INTO t (v) VALUES ('a')")
    eng.sql("ALTER TABLE t RENAME COLUMN id TO tid")
    eng.sql("INSERT INTO t (v) VALUES ('b')")
    assert rows(eng.sql("SELECT tid, v FROM t ORDER BY tid")) == [
        (1, "a"),
        (2, "b"),
    ]


def test_rename_partition_column_updates_metadata(eng):
    eng.sql(
        "CREATE TABLE t (id INT, region TEXT) PARTITION BY (region)"
    )
    eng.sql("INSERT INTO t VALUES (1, 'eu'), (2, 'us')")
    eng.sql("ALTER TABLE t RENAME COLUMN region TO geo")
    # the rename itself rewrites the table partitioned by the new name;
    # a subsequent write must also succeed (stale partition_by would
    # raise inside partitionBy)
    eng.sql("INSERT INTO t VALUES (3, 'ap')")
    assert rows(
        eng.sql("SELECT id, geo FROM t ORDER BY id")
    ) == [(1, "eu"), (2, "us"), (3, "ap")]


def test_drop_partition_column_rejected(eng):
    eng.sql(
        "CREATE TABLE t (id INT, region TEXT) PARTITION BY (region)"
    )
    eng.sql("INSERT INTO t VALUES (1, 'eu')")
    with pytest.raises(EngineError, match="partition"):
        eng.sql("ALTER TABLE t DROP COLUMN region")
    # table intact
    assert rows(eng.sql("SELECT id, region FROM t")) == [(1, "eu")]


# 3 — VERIFY CONSTRAINTS composite-FK MATCH SIMPLE --------------------------

def test_verify_composite_fk_any_null_not_orphan(eng):
    eng.sql("CREATE TABLE p (a INT, b INT, PRIMARY KEY (a, b))")
    eng.sql("INSERT INTO p VALUES (1, 1)")
    eng.sql(
        "CREATE TABLE c (id INT PRIMARY KEY, fa INT, fb INT, "
        "FOREIGN KEY (fa, fb) REFERENCES p (a, b))"
    )
    # write path accepts any-null composite keys (MATCH SIMPLE)
    eng.sql("INSERT INTO c VALUES (1, 1, 1), (2, 1, NULL), (3, NULL, NULL)")
    rep = rows(eng.sql("VERIFY CONSTRAINTS c"))
    fk_rows = [r for r in rep if r[1] == "foreign_key"]
    assert fk_rows == [], f"VERIFY flagged rows the write path accepted: {fk_rows}"


def test_verify_composite_fk_real_orphan_still_reported(eng):
    eng.sql("CREATE TABLE p (a INT, b INT, PRIMARY KEY (a, b))")
    eng.sql("INSERT INTO p VALUES (1, 1)")
    eng.sql(
        "CREATE TABLE c (id INT PRIMARY KEY, fa INT, fb INT, "
        "FOREIGN KEY (fa, fb) REFERENCES p (a, b))"
    )
    eng.sql("INSERT INTO c VALUES (1, 1, 1)")
    # orphan introduced by a parent-side delete (FKs check child writes)
    eng.sql("DELETE FROM p WHERE a = 1")
    rep = rows(eng.sql("VERIFY CONSTRAINTS c"))
    fk_rows = [r for r in rep if r[1] == "foreign_key"]
    assert len(fk_rows) == 1 and fk_rows[0][3] == 1


# 4 — z-order bits clamp -----------------------------------------------------

def test_zorder_six_columns_stays_nonnegative(spark):
    df = spark.range(64).select(
        *[(F.col("id") * (i + 1) % 17).alias(f"c{i}") for i in range(6)]
    )
    out, z = zorder_column(df, [f"c{i}" for i in range(6)], bits=12)
    mn = out.withColumn("__z", z).agg(F.min("__z")).collect()[0][0]
    assert mn >= 0, "z-value overflowed into negative longs"


def test_zorder_too_many_columns_raises(spark):
    df = spark.range(4).select(
        *[(F.col("id") % 3).alias(f"c{i}") for i in range(70)]
    )
    with pytest.raises(ValueError):
        zorder_column(df, [f"c{i}" for i in range(70)], bits=12)
