"""One realistic pg-flavored migration/ETL script through engine.sql() —
the surfaces work TOGETHER (splitter, DO bodies, CTAS, COPY, casts,
catalog introspection, SHOW, time travel), not just in isolation."""

from __future__ import annotations

import pytest

from cassandra_sql_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(
        spark, warehouse=str(tmp_path_factory.mktemp("integration"))
    )


@pytest.mark.slow
def test_pg_style_migration_script(eng, tmp_path):
    csv_dir = str(tmp_path / "staging_csv")
    script = f"""
    SET search_path TO public;

    CREATE TYPE mood AS ENUM ('ok', 'great');

    CREATE TABLE users (
      id SERIAL PRIMARY KEY,
      email TEXT NOT NULL UNIQUE,
      vibe mood,
      joined TIMESTAMP
    );

    DO $$ BEGIN RAISE NOTICE 'would run plpgsql here;'; END $$;

    INSERT INTO users (email, vibe, joined) VALUES
      ('a@x.com', 'ok',    TIMESTAMP '2024-01-01 10:00:00'),
      ('b@x.com', 'great', TIMESTAMP '2024-02-01 11:30:00'),
      ('c@x.com', 'ok',    TIMESTAMP '2024-03-05 09:15:00');

    CREATE TABLE events (
      id SERIAL PRIMARY KEY,
      user_id INT REFERENCES users(id),
      kind VARCHAR(10),
      amount NUMERIC(10,2)
    );

    INSERT INTO events (user_id, kind, amount) VALUES
      (1, 'buy', 10.50), (1, 'buy', 2.25), (2, 'view', 0.00),
      (3, 'buy', 99.99);

    CREATE TABLE big_spenders AS (
      SELECT u.email, SUM(e.amount)::DOUBLE PRECISION AS total
      FROM users u JOIN events e ON e.user_id = u.id
      WHERE e.kind = 'buy'
      GROUP BY u.email
    );

    COPY big_spenders TO '{csv_dir}' WITH (FORMAT CSV, HEADER);

    UPDATE users SET vibe = 'great' WHERE id = 1;
    DELETE FROM events WHERE amount < 1.00;

    SELECT u.email,
           u.vibe,
           to_char(u.joined, 'YYYY-MM-DD') AS day,
           COUNT(e.id)::INT8 AS n_events
    FROM users u
    LEFT JOIN events e ON e.user_id = u.id
    GROUP BY u.email, u.vibe, to_char(u.joined, 'YYYY-MM-DD')
    ORDER BY u.email
    """
    out = [tuple(r) for r in eng.sql(script).collect()]
    assert out == [
        ("a@x.com", "great", "2024-01-01", 2),
        ("b@x.com", "great", "2024-02-01", 0),  # 0.00 view deleted
        ("c@x.com", "ok", "2024-03-05", 1),
    ]
    # CTAS product materialized and introspectable
    spenders = {
        r[0]: r[1]
        for r in eng.sql(
            "SELECT email, total FROM big_spenders"
        ).collect()
    }
    assert spenders == {"a@x.com": 12.75, "c@x.com": 99.99}
    # catalog agrees: FK row, enum-typed column renders as text oid, SHOW
    fk = [tuple(r) for r in eng.sql(
        "SELECT c.contype FROM pg_constraint c "
        "JOIN pg_class t ON t.oid = c.conrelid "
        "WHERE t.relname = 'events' AND c.contype = 'f'"
    ).collect()]
    assert fk == [("f",)]
    assert eng.sql("SHOW server_version").collect()[0][0] == "14.0"
    # time travel: users v2 (post-insert, pre-update) still has 'ok' for a@x
    hist = [tuple(r) for r in eng.sql(
        "SELECT vibe FROM users VERSION AS OF 2 WHERE id = 1"
    ).collect()]
    assert hist == [("ok",)]
    # enum write-time validation still enforced after the batch
    from cassandra_sql_spark.engine import EngineError

    with pytest.raises(EngineError):
        eng.sql("INSERT INTO users (email, vibe) VALUES ('d@x.com', 'meh')")
