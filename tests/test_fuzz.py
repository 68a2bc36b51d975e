"""Robustness: malformed / truncated / mutated SQL must raise clean engine
errors (duckpgq_tpu.errors.Error subclasses or ValueError), never crash,
hang, or corrupt the session."""

import numpy as np
import pytest


SEED_STATEMENTS = [
    "SELECT 1 + 2 AS x",
    "CREATE TABLE t(a BIGINT, b VARCHAR)",
    "INSERT INTO t VALUES (1, 'x')",
    "SELECT a, count(*) FROM t GROUP BY a HAVING count(*) > 0 ORDER BY a",
    "CREATE PROPERTY GRAPH g VERTEX TABLES (t LABEL v) ",
    "SELECT * FROM GRAPH_TABLE (g MATCH (a:v)-[e:k]->{1,3}(b:v) "
    "COLUMNS (a.id)) x",
    "DROP PROPERTY GRAPH IF EXISTS g",
    "WITH c AS (SELECT 1 AS one) SELECT * FROM c",
    "PRAGMA show_property_graphs",
    "SELECT list_value(1, 2)[1]",
    # round-2 constructs: recursive CTEs, lambdas, comprehensions,
    # grouping sets, prepared statements, star modifiers
    "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r "
    "WHERE n < 3) SELECT * FROM r",
    "SELECT list_transform([1,2,3], x -> x + 1)",
    "SELECT [x * 2 FOR x IN [1, 2, 3] IF x > 1]",
    "SELECT a, count(*) FROM t GROUP BY GROUPING SETS ((a), ())",
    "SELECT b, count(*) FROM t GROUP BY ROLLUP (b) ORDER BY ALL",
    "PREPARE fz AS SELECT $1 + 1; EXECUTE fz(2); DEALLOCATE fz",
    "SELECT * REPLACE (a + 1 AS a) FROM t",
    "SELECT DATE '2020-01-01' + 31",
]


def _connect():
    import duckpgq_tpu
    return duckpgq_tpu.connect()


def _run_safely(con, sql):
    from duckpgq_tpu.errors import DuckPGQError
    try:
        con.execute(sql)
    except (DuckPGQError, ValueError, KeyError, NotImplementedError):
        pass  # clean engine error is the contract
    # anything else (segfault-style AttributeError/TypeError/IndexError
    # from deep inside, RecursionError, hang) fails the test


def test_truncations_raise_cleanly():
    con = _connect()
    for stmt in SEED_STATEMENTS:
        for cut in range(1, len(stmt), 7):
            _run_safely(con, stmt[:cut])
    # the session must still work afterwards
    assert con.execute("SELECT 42").fetchall() == [(42,)]


def test_random_mutations_raise_cleanly():
    rng = np.random.default_rng(0)
    con = _connect()
    con.execute("CREATE TABLE t(a BIGINT, b VARCHAR)")
    junk = list("()[]{}'\",.;:*-><=") + ["SELECT", "MATCH", "GRAPH_TABLE",
                                         "NULL", "''", "0x", "1e999", " "]
    for stmt in SEED_STATEMENTS:
        for _ in range(20):
            chars = list(stmt)
            for _ in range(rng.integers(1, 5)):
                pos = int(rng.integers(0, len(chars)))
                tok = junk[int(rng.integers(0, len(junk)))]
                op = rng.integers(0, 3)
                if op == 0:
                    chars.insert(pos, tok)
                elif op == 1 and chars:
                    chars[pos] = tok
                else:
                    del chars[pos:pos + 3]
            _run_safely(con, "".join(chars))
    assert con.execute("SELECT 42").fetchall() == [(42,)]


def test_garbage_bytes_raise_cleanly():
    rng = np.random.default_rng(1)
    con = _connect()
    for n in (1, 7, 40, 200):
        for _ in range(10):
            s = "".join(chr(int(c)) for c in rng.integers(32, 127, size=n))
            _run_safely(con, s)
    assert con.execute("SELECT 42").fetchall() == [(42,)]


def test_null_literal_arithmetic():
    """NULL-literal operands: the SQL result is NULL, not a crash
    (reference semantics; found by the mutation fuzz)."""
    con = _connect()
    for q in ["SELECT NULL + 2", "SELECT 2 + NULL", "SELECT NULL * NULL",
              "SELECT -NULL", "SELECT NULL / 3", "SELECT NULL // 3",
              "SELECT NULL % 3", "SELECT abs(NULL)", "SELECT power(NULL, 2)",
              "SELECT 1 - NULL"]:
        assert con.execute(q).fetchall() == [(None,)], q


def test_clean_errors_for_fuzz_regressions():
    from duckpgq_tpu.errors import DuckPGQError
    con = _connect()
    for bad in ["CREATE TABLE x(a, b VARCHAR)",          # typeless column
                "SELECT * FROM GRAPH_TABLE (g MATCH (a)-[e]->{}(b) "
                "COLUMNS (a.id)) t",                     # empty quantifier
                "SELECT * FROM ''",                      # empty file path
                "SELECT * FROM 'no_such_file.csv'",
                "SELECT * FROM 'no_such_file.parquet'",
                "INSERT INTO missing VALUES (1, -'x')"]:
        with pytest.raises((DuckPGQError, ValueError)):
            con.execute(bad)
    assert con.execute("SELECT 42").fetchall() == [(42,)]
