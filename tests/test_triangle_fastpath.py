"""Closed-triangle COUNT fast path (pgq/triangle.py; BI17 workload).

The fast path must (a) produce the exact binding count of the generic
wedge-join plan, (b) engage on the BI17 shape, and (c) fall back on every
precondition violation (duplicate pairs, self loops, inheritance,
vertex-referencing filters, asymmetric filters, non-count consumers).
"""

import os

import numpy as np
import pytest

import duckpgq_tpu
from duckpgq_tpu.pgq.triangle import try_triangle_count
from duckpgq_tpu.sql.parser import parse_sql


def _setup(con, n_v=40, n_e=120, seed=7, dups=False, selfloops=False):
    rng = np.random.default_rng(seed)
    con.execute("CREATE TABLE p(id BIGINT, nm VARCHAR)")
    con.execute("INSERT INTO p VALUES " + ", ".join(
        f"({i}, 'v{i}')" for i in range(n_v)))
    pairs, rows = set(), []
    while len(rows) < n_e:
        x, y = int(rng.integers(0, n_v)), int(rng.integers(0, n_v))
        if x == y and not selfloops:
            continue
        key = (min(x, y), max(x, y))
        if key in pairs and not dups:
            continue
        pairs.add(key)
        rows.append((x, y, int(rng.integers(0, 100))))
    con.execute("CREATE TABLE k(src BIGINT, dst BIGINT, cd BIGINT)")
    con.execute("INSERT INTO k VALUES " + ", ".join(
        f"({x},{y},{c})" for x, y, c in rows))
    con.execute("""CREATE PROPERTY GRAPH g
      VERTEX TABLES (p PROPERTIES (id, nm) LABEL P)
      EDGE TABLES (k SOURCE KEY (src) REFERENCES p (id)
                     DESTINATION KEY (dst) REFERENCES p (id)
                     PROPERTIES (cd) LABEL K)""")


Q_FILTERED = (
    "SELECT count(*) FROM GRAPH_TABLE (g MATCH (a:P)-[e1:K where "
    "e1.cd < 60]-(b:P)-[e2:K where e2.cd < 60]-(c:P)-[e3:K where "
    "e3.cd < 60]-(a:P) COLUMNS (a.id AS aid)) t")
Q_PLAIN = (
    "SELECT count(*) FROM GRAPH_TABLE (g MATCH (a:P)-[e1:K]-(b:P)"
    "-[e2:K]-(c:P)-[e3:K]-(a:P) COLUMNS (a.id AS aid)) t")


def _both(con, q):
    os.environ["DUCKPGQ_TRIANGLE"] = "0"
    try:
        slow = con.execute(q).fetchall()[0][0]
    finally:
        os.environ["DUCKPGQ_TRIANGLE"] = "1"
    fast = con.execute(q).fetchall()[0][0]
    return slow, fast


@pytest.mark.parametrize("kw", [
    {}, dict(n_v=25, n_e=200, seed=9), dict(dups=True),
    dict(selfloops=True), dict(n_v=8, n_e=5, seed=1)],
    ids=["simple", "dense", "dup-pairs", "self-loops", "tiny"])
def test_triangle_count_matches_join_plan(kw):
    con = duckpgq_tpu.connect()
    _setup(con, **kw)
    for q in (Q_FILTERED, Q_PLAIN):
        slow, fast = _both(con, q)
        assert slow == fast, (kw, q, slow, fast)


def test_fast_path_engages_on_bi17_shape():
    con = duckpgq_tpu.connect()
    _setup(con)
    ref = parse_sql(Q_FILTERED)[0].node.from_table
    assert try_triangle_count(con.executor, ref) is not None


def test_fast_path_engages_on_multigraph():
    """Duplicate pairs route to the multiplicity-weighted device kernel
    (NOT a silent fallback) and still count exactly."""
    con = duckpgq_tpu.connect()
    _setup(con, dups=True, n_e=150)
    ref = parse_sql(Q_PLAIN)[0].node.from_table
    fast = try_triangle_count(con.executor, ref)
    assert fast is not None
    os.environ["DUCKPGQ_TRIANGLE"] = "0"
    try:
        slow = con.execute(Q_PLAIN).fetchall()[0][0]
    finally:
        os.environ["DUCKPGQ_TRIANGLE"] = "1"
    assert fast == slow


def test_fast_path_declines_non_triangles():
    con = duckpgq_tpu.connect()
    _setup(con)
    declines = [
        # 2-hop, not a cycle
        "SELECT count(*) FROM GRAPH_TABLE (g MATCH (a:P)-[e1:K]-(b:P)"
        "-[e2:K]-(c:P) COLUMNS (a.id)) t",
        # directed edges
        "SELECT count(*) FROM GRAPH_TABLE (g MATCH (a:P)-[e1:K]->(b:P)"
        "-[e2:K]->(c:P)-[e3:K]->(a:P) COLUMNS (a.id)) t",
        # asymmetric filters
        "SELECT count(*) FROM GRAPH_TABLE (g MATCH (a:P)-[e1:K where "
        "e1.cd < 10]-(b:P)-[e2:K where e2.cd < 90]-(c:P)-[e3:K where "
        "e3.cd < 10]-(a:P) COLUMNS (a.id)) t",
        # filter references a vertex variable
        "SELECT count(*) FROM GRAPH_TABLE (g MATCH (a:P)-[e1:K where "
        "e1.cd < a.id]-(b:P)-[e2:K where e2.cd < a.id]-(c:P)-[e3:K where "
        "e3.cd < a.id]-(a:P) COLUMNS (a.id)) t",
    ]
    for q in declines:
        ref = parse_sql(q)[0].node.from_table
        assert try_triangle_count(con.executor, ref) is None, q
        # and the generic plan still answers identically with the flag off
        slow, fast = _both(con, q)
        assert slow == fast, q


def test_non_count_consumers_use_generic_plan():
    con = duckpgq_tpu.connect()
    _setup(con)
    q = ("SELECT aid, count(*) FROM GRAPH_TABLE (g MATCH (a:P)-[e1:K]-"
         "(b:P)-[e2:K]-(c:P)-[e3:K]-(a:P) COLUMNS (a.id AS aid)) t "
         "GROUP BY aid ORDER BY aid LIMIT 3")
    os.environ["DUCKPGQ_TRIANGLE"] = "0"
    try:
        want = con.execute(q).fetchall()
    finally:
        os.environ["DUCKPGQ_TRIANGLE"] = "1"
    assert con.execute(q).fetchall() == want
