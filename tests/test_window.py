"""Window functions: OVER (PARTITION BY ... ORDER BY ...) with default
frames (running peer-inclusive with ORDER BY; whole partition without)."""

import pytest


def _con():
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE w(g VARCHAR, x BIGINT)")
    con.execute("INSERT INTO w VALUES ('a',1),('a',3),('a',3),"
                "('b',2),('b',5),('a',7)")
    return con


def test_row_number_rank_dense_rank():
    con = _con()
    assert con.execute(
        "SELECT x, row_number() OVER (ORDER BY x) FROM w ORDER BY x, 2"
    ).fetchall() == [(1, 1), (2, 2), (3, 3), (3, 4), (5, 5), (7, 6)]
    assert con.execute(
        "SELECT x, rank() OVER (ORDER BY x), dense_rank() OVER (ORDER BY x) "
        "FROM w ORDER BY x").fetchall() == [
        (1, 1, 1), (2, 2, 2), (3, 3, 3), (3, 3, 3), (5, 5, 4), (7, 6, 5)]


def test_partitioned_row_number():
    con = _con()
    assert con.execute(
        "SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x DESC) "
        "AS rn FROM w ORDER BY g, rn").fetchall() == [
        ("a", 7, 1), ("a", 3, 2), ("a", 3, 3), ("a", 1, 4),
        ("b", 5, 1), ("b", 2, 2)]


def test_window_aggregates():
    con = _con()
    assert con.execute(
        "SELECT g, x, sum(x) OVER (PARTITION BY g) FROM w ORDER BY g, x"
    ).fetchall() == [("a", 1, 14), ("a", 3, 14), ("a", 3, 14),
                     ("a", 7, 14), ("b", 2, 7), ("b", 5, 7)]
    # running sum includes peers (RANGE ... CURRENT ROW default)
    assert con.execute(
        "SELECT x, sum(x) OVER (ORDER BY x) FROM w ORDER BY x"
    ).fetchall() == [(1, 1), (2, 3), (3, 9), (3, 9), (5, 14), (7, 21)]
    assert con.execute(
        "SELECT x, count(*) OVER (ORDER BY x), avg(x) OVER (ORDER BY x) "
        "FROM w ORDER BY x").fetchall() == [
        (1, 1, 1.0), (2, 2, 1.5), (3, 4, 2.25), (3, 4, 2.25),
        (5, 5, 2.8), (7, 6, 3.5)]
    assert con.execute(
        "SELECT g, x, min(x) OVER (PARTITION BY g ORDER BY x), "
        "max(x) OVER (PARTITION BY g) FROM w ORDER BY g, x"
    ).fetchall() == [("a", 1, 1, 7), ("a", 3, 1, 7), ("a", 3, 1, 7),
                     ("a", 7, 1, 7), ("b", 2, 2, 5), ("b", 5, 2, 5)]


def test_lead_lag_first_last():
    con = _con()
    assert con.execute(
        "SELECT g, x, lag(x) OVER (PARTITION BY g ORDER BY x) FROM w "
        "ORDER BY g, x").fetchall() == [
        ("a", 1, None), ("a", 3, 1), ("a", 3, 3), ("a", 7, 3),
        ("b", 2, None), ("b", 5, 2)]
    assert con.execute(
        "SELECT g, x, lead(x, 1, -1) OVER (PARTITION BY g ORDER BY x) "
        "FROM w ORDER BY g, x").fetchall() == [
        ("a", 1, 3), ("a", 3, 3), ("a", 3, 7), ("a", 7, -1),
        ("b", 2, 5), ("b", 5, -1)]
    assert con.execute(
        "SELECT g, first_value(x) OVER (PARTITION BY g ORDER BY x), "
        "last_value(x) OVER (PARTITION BY g) FROM w ORDER BY g"
    ).fetchall() == [("a", 1, 7)] * 4 + [("b", 2, 5)] * 2


def test_window_null_handling():
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE t(g VARCHAR, x BIGINT)")
    con.execute("INSERT INTO t VALUES ('a',1),('a',NULL),('b',2)")
    assert con.execute(
        "SELECT g, count(x) OVER (PARTITION BY g), "
        "count(*) OVER (PARTITION BY g) FROM t ORDER BY g"
    ).fetchall() == [("a", 1, 2), ("a", 1, 2), ("b", 1, 1)]


def test_window_over_aggregate():
    con = _con()
    assert con.execute(
        "SELECT g, sum(x) AS s, rank() OVER (ORDER BY sum(x) DESC) "
        "FROM w GROUP BY g ORDER BY g").fetchall() == [
        ("a", 14, 1), ("b", 7, 2)]


def test_window_in_expression():
    con = _con()
    rows = con.execute(
        "SELECT x, x - avg(x) OVER () AS dev FROM w ORDER BY x"
    ).fetchall()
    assert rows[0] == (1, 1 - 21 / 6)


def test_rows_frame_sliding_sum():
    con = _con()
    assert con.execute(
        "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND "
        "1 FOLLOWING) FROM w WHERE x IN (1,2,5,7) ORDER BY x"
    ).fetchall() == [(1, 3), (2, 8), (5, 14), (7, 12)]


def test_rows_frame_current_to_unbounded():
    con = _con()
    assert con.execute(
        "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN CURRENT ROW AND "
        "UNBOUNDED FOLLOWING) FROM w WHERE x IN (1,2,5,7) ORDER BY x"
    ).fetchall() == [(1, 15), (2, 14), (5, 12), (7, 7)]


def test_rows_frame_single_bound_shorthand():
    # ROWS 1 PRECEDING == BETWEEN 1 PRECEDING AND CURRENT ROW
    con = _con()
    assert con.execute(
        "SELECT x, sum(x) OVER (ORDER BY x ROWS 1 PRECEDING) "
        "FROM w WHERE x IN (1,2,5,7) ORDER BY x"
    ).fetchall() == [(1, 1), (2, 3), (5, 7), (7, 12)]


def test_rows_frame_empty_is_null():
    con = _con()
    assert con.execute(
        "SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN 2 FOLLOWING AND "
        "3 FOLLOWING) FROM w WHERE x IN (1,2,5,7) ORDER BY x"
    ).fetchall() == [(1, 12), (2, 7), (5, None), (7, None)]


def test_range_frame_offsets_and_peers():
    # keys 1,2,3,3,5,7; RANGE end CURRENT ROW includes peers (both 3s)
    con = _con()
    assert con.execute(
        "SELECT x, count(*) OVER (ORDER BY x RANGE BETWEEN 2 PRECEDING "
        "AND CURRENT ROW) FROM w ORDER BY x").fetchall() == [
        (1, 1), (2, 2), (3, 4), (3, 4), (5, 3), (7, 2)]


def test_groups_frame():
    # peer groups {1},{2},{3,3},{5},{7}
    con = _con()
    assert con.execute(
        "SELECT x, count(*) OVER (ORDER BY x GROUPS BETWEEN 1 PRECEDING "
        "AND CURRENT ROW) FROM w ORDER BY x").fetchall() == [
        (1, 1), (2, 2), (3, 3), (3, 3), (5, 3), (7, 2)]


def test_frame_min_max_first_last():
    con = _con()
    assert con.execute(
        "SELECT x, max(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND "
        "1 FOLLOWING), min(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING "
        "AND 1 FOLLOWING) FROM w WHERE x IN (1,2,5,7) ORDER BY x"
    ).fetchall() == [(1, 2, 1), (2, 5, 1), (5, 7, 2), (7, 7, 5)]
    assert con.execute(
        "SELECT x, last_value(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND UNBOUNDED FOLLOWING) FROM w WHERE x IN (1,2,5) "
        "ORDER BY x").fetchall() == [(1, 5), (2, 5), (5, 5)]


def test_frame_partitioned():
    con = _con()
    assert con.execute(
        "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x ROWS BETWEEN "
        "1 PRECEDING AND CURRENT ROW) FROM w WHERE x <> 3 "
        "ORDER BY g, x").fetchall() == [
        ("a", 1, 1), ("a", 7, 8), ("b", 2, 2), ("b", 5, 7)]
