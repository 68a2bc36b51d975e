"""Positional parameter binding on the Python client API (? placeholders,
the DuckDB Python convention)."""

import pytest


def _con():
    import duckpgq_tpu
    return duckpgq_tpu.connect()


def test_execute_with_parameters():
    con = _con()
    con.execute("CREATE TABLE t(a BIGINT, b VARCHAR, c DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(1, "x", 1.5), (2, "it's", None), (3, None, 2.0)])
    assert con.execute("SELECT count(*) FROM t").fetchall() == [(3,)]
    rows = con.execute("SELECT a, b FROM t WHERE a >= ? AND a <= ? "
                       "ORDER BY a", [1, 2]).fetchall()
    assert rows == [(1, "x"), (2, "it's")]
    assert con.execute("SELECT c FROM t WHERE a = ?", [2]).fetchall() == \
        [(None,)]


def test_placeholders_in_strings_and_comments_untouched():
    con = _con()
    assert con.execute("SELECT '?' AS q, ? AS p -- trailing ? comment\n",
                       [7]).fetchall() == [("?", 7)]


def test_parameter_count_mismatch():
    from duckpgq_tpu.errors import InvalidInputException
    con = _con()
    with pytest.raises(InvalidInputException):
        con.execute("SELECT ?", [])
    with pytest.raises(InvalidInputException):
        con.execute("SELECT ?", [1, 2])


def test_list_and_bool_parameters():
    con = _con()
    assert con.execute("SELECT ?[2], ?", [[10, 20, 30], True]
                       ).fetchall() == [(20, True)]


def test_result_conversions():
    """fetchdf / fetchnumpy / arrow (the DuckDB Python result surface)."""
    con = _con()
    con.execute("CREATE TABLE t(a BIGINT, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(1, "x"), (2, None), (3, "z")])
    res = con.execute("SELECT a, b FROM t ORDER BY a")
    np_out = res.fetchnumpy()
    assert list(np_out["a"]) == [1, 2, 3]
    assert list(np_out["b"]) == ["x", None, "z"]
    df = con.execute("SELECT a, b FROM t ORDER BY a").fetchdf()
    assert df.shape == (3, 2) and df["a"].tolist() == [1, 2, 3]
    tbl = con.execute("SELECT a FROM t ORDER BY a").arrow()
    assert tbl.num_rows == 3 and tbl.column("a").to_pylist() == [1, 2, 3]


def test_prepare_execute_deallocate():
    """DuckDB-style prepared statements: PREPARE name AS ... with $N or ?
    placeholders, EXECUTE name(args), DEALLOCATE."""
    from duckpgq_tpu.errors import BinderException
    con = _con()
    con.execute("CREATE TABLE t(a BIGINT, b VARCHAR)")
    con.execute("INSERT INTO t VALUES (1,'x'),(2,'y'),(3,'z')")
    con.execute("PREPARE q1 AS SELECT b FROM t WHERE a = $1")
    assert con.execute("EXECUTE q1(2)").fetchall() == [("y",)]
    assert con.execute("EXECUTE q1(1 + 2)").fetchall() == [("z",)]
    con.execute("PREPARE q2 AS SELECT count(*) FROM t WHERE a >= ? AND b <> ?")
    assert con.execute("EXECUTE q2(1, 'y')").fetchall() == [(2,)]
    # $N may repeat; strings with commas survive the arg split
    con.execute("PREPARE q3 AS SELECT $1 + $1 WHERE $2 = 'a,b'")
    assert con.execute("EXECUTE q3(4, 'a,b')").fetchall() == [(8,)]
    con.execute("DEALLOCATE q1")
    with pytest.raises(BinderException):
        con.execute("EXECUTE q1(1)")
    with pytest.raises(BinderException):
        con.execute("DEALLOCATE q1")
