"""Aggregate modifiers: ORDER BY inside calls (order-sensitive aggregates)
and FILTER (WHERE ...)."""

import pytest


def _con():
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE b(g BIGINT, x BIGINT, y VARCHAR)")
    con.execute("INSERT INTO b VALUES (1,2,'two'),(1,3,'three'),"
                "(1,3,'III'),(2,5,'five')")
    return con


def test_string_agg_order_by():
    con = _con()
    assert con.execute(
        "SELECT string_agg(y, ',' ORDER BY y) FROM b WHERE g = 1"
    ).fetchall() == [("III,three,two",)]
    assert con.execute(
        "SELECT string_agg(y, ',' ORDER BY x DESC, y) FROM b WHERE g = 1"
    ).fetchall() == [("III,three,two",)]
    assert con.execute(
        "SELECT g, string_agg(y, '|' ORDER BY y DESC) FROM b "
        "GROUP BY g ORDER BY g"
    ).fetchall() == [(1, "two|three|III"), (2, "five")]


def test_list_order_by():
    con = _con()
    assert con.execute(
        "SELECT list(x ORDER BY x DESC) FROM b WHERE g = 1"
    ).fetchall() == [([3, 3, 2],)]


def test_filter_clause():
    con = _con()
    assert con.execute(
        "SELECT sum(x) FILTER (WHERE x > 2) FROM b").fetchall() == [(11,)]
    assert con.execute(
        "SELECT count(*) FILTER (WHERE g = 1), count(*) FROM b"
    ).fetchall() == [(3, 4)]
    assert con.execute(
        "SELECT g, count(*) FILTER (WHERE x = 3) FROM b "
        "GROUP BY g ORDER BY g").fetchall() == [(1, 2), (2, 0)]


def test_filter_on_scalar_function_rejected():
    from duckpgq_tpu.errors import BinderException
    con = _con()
    with pytest.raises(BinderException):
        con.execute("SELECT abs(x) FILTER (WHERE x > 1) FROM b")


def test_distinct_aggregates_not_merged_with_filtered():
    con = _con()
    assert con.execute(
        "SELECT sum(x), sum(x) FILTER (WHERE x = 3) FROM b"
    ).fetchall() == [(13, 6)]


def test_grouping_sets_rollup_cube():
    """GROUP BY GROUPING SETS / ROLLUP / CUBE: one aggregation per set,
    unioned, with NULL for group columns absent from a set."""
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE gs(a VARCHAR, b VARCHAR, v BIGINT)")
    con.execute("INSERT INTO gs VALUES ('x','p',1),('x','q',2),('y','p',4)")
    # DuckDB default null order is NULLS LAST (the pre-round-4 engine
    # sorted NULL varchars first by their "" placeholder — a real ORDER BY
    # bug found by tests/test_differential.py)
    assert con.execute(
        "SELECT a, count(*) FROM gs GROUP BY GROUPING SETS ((a), ()) "
        "ORDER BY ALL").fetchall() == [("x", 2), ("y", 1), (None, 3)]
    assert con.execute(
        "SELECT a, b, sum(v) FROM gs GROUP BY ROLLUP (a, b) ORDER BY ALL"
    ).fetchall() == [
        ("x", "p", 1), ("x", "q", 2), ("x", None, 3),
        ("y", "p", 4), ("y", None, 4), (None, None, 7)]
    assert con.execute(
        "SELECT a, b, sum(v) FROM gs GROUP BY CUBE (a, b) ORDER BY ALL"
    ).fetchall() == [
        ("x", "p", 1), ("x", "q", 2), ("x", None, 3),
        ("y", "p", 4), ("y", None, 4),
        (None, "p", 5), (None, "q", 2), (None, None, 7)]
    # HAVING applies per set
    assert con.execute(
        "SELECT a, count(*) FROM gs GROUP BY GROUPING SETS ((a), ()) "
        "HAVING count(*) > 1 ORDER BY ALL"
    ).fetchall() == [("x", 2), (None, 3)]


def test_pivot_unpivot():
    """PIVOT (default count, USING aggs, IN list, implicit/explicit GROUP
    BY, multi-agg naming) and UNPIVOT (NULLs excluded)."""
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE pv(g VARCHAR, b VARCHAR, a BIGINT)")
    con.execute("INSERT INTO pv VALUES ('r1','x',1),('r1','y',2),"
                "('r2','x',3),('r2','x',4)")
    assert con.execute("PIVOT pv ON b USING sum(a) ORDER BY g"
                       ).fetchall() == [("r1", 1, 2), ("r2", 7, None)]
    assert con.execute("PIVOT pv ON b GROUP BY g ORDER BY g"
                       ).fetchall() == [("r1", 1, 1), ("r2", 2, 0)]
    assert con.execute(
        "PIVOT pv ON b IN ('x') USING sum(a) GROUP BY g ORDER BY g"
    ).fetchall() == [("r1", 1), ("r2", 7)]
    assert con.execute(
        "PIVOT pv ON b USING sum(a) AS s, count(*) AS c GROUP BY g "
        "ORDER BY g").fetchall() == \
        [("r1", 1, 1, 2, 1), ("r2", 7, 2, None, 0)]
    assert con.execute(
        "UNPIVOT (SELECT 1 AS p, 2 AS q, NULL::BIGINT AS r) ON p, q, r "
        "INTO NAME k VALUE v ORDER BY k").fetchall() == \
        [("p", 1), ("q", 2)]
