"""Durable database storage: CHECKPOINT writes, reopening restores
(capability-equivalent of the reference persisting property-graph metadata
in the user's database file, duckpgq_state.cpp:34-160)."""

import os

import duckpgq_tpu


def _populate(con):
    con.execute("CREATE TABLE Person(id BIGINT PRIMARY KEY, name VARCHAR)")
    con.execute("CREATE TABLE Knows(src BIGINT, dst BIGINT)")
    con.execute("INSERT INTO Person VALUES (1,'a'),(2,'b'),(3,NULL)")
    con.execute("INSERT INTO Knows VALUES (1,2),(2,3),(3,1)")
    con.execute("CREATE SCHEMA extra")
    con.execute("CREATE TABLE extra.t AS SELECT 42 AS x")
    con.execute("CREATE VIEW v AS SELECT count(*) AS n FROM Knows")
    con.execute("""
      CREATE PROPERTY GRAPH pg
      VERTEX TABLES (Person PROPERTIES (id, name) LABEL person)
      EDGE TABLES (Knows SOURCE KEY (src) REFERENCES Person (id)
                         DESTINATION KEY (dst) REFERENCES Person (id)
                         LABEL knows)""")


def test_checkpoint_and_reopen(tmp_path):
    path = str(tmp_path / "db")
    con = duckpgq_tpu.connect(path)
    _populate(con)
    con.execute("CHECKPOINT")

    con2 = duckpgq_tpu.connect(path)
    assert con2.execute("SELECT count(*) FROM Person").fetchall() == [(3,)]
    assert con2.execute(
        "SELECT name FROM Person ORDER BY id").fetchall() == [
            ("a",), ("b",), (None,)]
    assert con2.execute("SELECT x FROM extra.t").fetchall() == [(42,)]
    assert con2.execute("SELECT n FROM v").fetchall() == [(3,)]
    # property graph registry restored: MATCH works without re-CREATE
    rows = con2.execute("""
      SELECT * FROM GRAPH_TABLE (pg
        MATCH (a:person)-[k:knows]->(b:person)
        COLUMNS (a.id AS s, b.id AS d)) t ORDER BY s""").fetchall()
    assert rows == [(1, 2), (2, 3), (3, 1)]
    # constraints survive (FK key discovery input)
    t = con2.database.catalog.get_table("Person")
    assert ("pk", ["id"]) in [(c[0], list(c[1])) for c in t.constraints]


def test_close_saves(tmp_path):
    path = str(tmp_path / "db")
    con = duckpgq_tpu.connect(path)
    con.execute("CREATE TABLE t AS SELECT 7 AS x")
    con.close()
    assert os.path.exists(os.path.join(path, "catalog.json"))
    con2 = duckpgq_tpu.connect(path)
    assert con2.execute("SELECT x FROM t").fetchall() == [(7,)]


def test_memory_checkpoint_noop():
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE t AS SELECT 1 AS x")
    con.execute("CHECKPOINT")   # must not raise or write anywhere
    assert con.execute("SELECT x FROM t").fetchall() == [(1,)]


def test_macros_persist(tmp_path):
    path = str(tmp_path / "db")
    con = duckpgq_tpu.connect(path)
    con.execute("CREATE MACRO add1(a, b := 10) AS a + b")
    con.execute("CREATE MACRO t7() AS TABLE SELECT 7 v")
    con.execute("CHECKPOINT")
    con.close()
    con2 = duckpgq_tpu.connect(path)
    assert con2.execute("SELECT add1(2), add1(2, b := 5)").fetchall() == \
        [(12, 7)]
    assert con2.execute("SELECT * FROM t7()").fetchall() == [(7,)]


def test_export_import_database(tmp_path):
    exp = str(tmp_path / "exp")
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE t1(a INT PRIMARY KEY, b VARCHAR)")
    con.execute("INSERT INTO t1 VALUES (1, 'x'), (2, 'y')")
    con.execute(f"EXPORT DATABASE '{exp}'")
    con2 = duckpgq_tpu.connect()
    con2.execute(f"IMPORT DATABASE '{exp}'")
    assert con2.execute("SELECT * FROM t1 ORDER BY a").fetchall() == \
        [(1, "x"), (2, "y")]
    # PK came through schema.sql
    import pytest
    from duckpgq_tpu.errors import DuckPGQError
    with pytest.raises(DuckPGQError):
        con2.execute("INSERT INTO t1 VALUES (1, 'dup')")


def test_export_import_parquet(tmp_path):
    exp = str(tmp_path / "expp")
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE tp(v DOUBLE, s VARCHAR)")
    con.execute("INSERT INTO tp VALUES (1.5, 'a'), (2.5, NULL)")
    con.execute(f"EXPORT DATABASE '{exp}' (FORMAT PARQUET)")
    con2 = duckpgq_tpu.connect()
    con2.execute(f"IMPORT DATABASE '{exp}'")
    assert con2.execute("SELECT * FROM tp ORDER BY v").fetchall() == \
        [(1.5, "a"), (2.5, None)]
