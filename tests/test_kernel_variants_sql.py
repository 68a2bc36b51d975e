"""SQL-level tests for the kernel variants the reference registers but its
corpus never calls directly: iterativelength2, iterativelengthbidirectional,
reachability (SURVEY.md §2.6)."""

import numpy as np


def _build_csr_sql(con, directed=True):
    """Raw create_csr_vertex/edge build (the reference's csr_segfault.test
    shape) over a small known graph: 0->1->2->3, 0->4."""
    con.execute("CREATE TABLE v(id BIGINT)")
    con.execute("INSERT INTO v VALUES (0),(1),(2),(3),(4),(5)")
    con.execute("CREATE TABLE e(s BIGINT, d BIGINT)")
    edges = [(0, 1), (1, 2), (2, 3), (0, 4)]
    if not directed:
        edges += [(d, s) for s, d in edges]
    con.execute("INSERT INTO e VALUES " +
                ",".join(f"({s},{d})" for s, d in edges))
    con.execute("""
    SELECT CREATE_CSR_EDGE(
        0,
        (SELECT count(a.id) FROM v a),
        CAST((SELECT sum(CREATE_CSR_VERTEX(0,
                (SELECT count(a.id) FROM v a),
                sub.dense_id, sub.cnt))
              FROM (SELECT a.rowid AS dense_id, count(k.s) AS cnt
                    FROM v a LEFT JOIN e k ON k.s = a.id
                    GROUP BY a.rowid) sub) AS BIGINT),
        (SELECT count(*) FROM e k JOIN v a ON a.id = k.s
                              JOIN v c ON c.id = k.d),
        src.rowid, dst.rowid, k.rowid)
    FROM e k JOIN v src ON k.s = src.id JOIN v dst ON k.d = dst.id
    """)


def test_iterativelength2_sql():
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    _build_csr_sql(con)
    rows = con.execute(
        "SELECT iterativelength2(0, 6, s.rowid, d.rowid) "
        "FROM v s, v d WHERE s.id = 0 AND d.id IN (3, 5) "
        "ORDER BY d.id").fetchall()
    assert rows == [(3,), (None,)]


def test_iterativelength_bidirectional_sql():
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    # the reference kernel is only correct on symmetric CSRs
    _build_csr_sql(con, directed=False)
    rows = con.execute(
        "SELECT iterativelengthbidirectional(0, 6, s.rowid, d.rowid) "
        "FROM v s, v d WHERE s.id = 0 AND d.id IN (3, 4, 5) "
        "ORDER BY d.id").fetchall()
    assert rows == [(3,), (1,), (None,)]


def test_reachability_sql():
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    _build_csr_sql(con)
    rows = con.execute(
        "SELECT reachability(0, 0, 6, s.rowid, d.rowid) "
        "FROM v s, v d WHERE s.id = 0 ORDER BY d.id").fetchall()
    assert [r[0] for r in rows] == [True, True, True, True, True, False]
