"""Experimental path-enumeration features (beyond the reference, which
raises NotImplemented for ALL SHORTEST / SHORTEST k / non-WALK path modes —
reference match.cpp:80-108). Gated behind SET pgq_experimental = true;
without the setting the reference's exact errors are preserved
(test/sql/path_finding/top_k.test expects `statement error`)."""

import itertools

import numpy as np
import pytest

import duckpgq_tpu
from duckpgq_tpu.errors import NotImplementedException
from duckpgq_tpu.ops import msbfs
from duckpgq_tpu.ops.csr import build_csr


@pytest.fixture()
def con():
    c = duckpgq_tpu.connect()
    c.execute("CREATE TABLE Person(id BIGINT, name VARCHAR)")
    c.execute("INSERT INTO Person VALUES (0,'a'),(1,'b'),(2,'c'),(3,'d')")
    c.execute("CREATE TABLE Knows(src BIGINT, dst BIGINT)")
    # two tied shortest 0->3 (via 1 and via 2) plus a 3-hop walk 0-1-2-3
    c.execute("INSERT INTO Knows VALUES (0,1),(0,2),(1,3),(2,3),(1,2)")
    c.execute("""CREATE PROPERTY GRAPH pg
        VERTEX TABLES (Person)
        EDGE TABLES (Knows SOURCE KEY (src) REFERENCES Person (id)
                           DESTINATION KEY (dst) REFERENCES Person (id))""")
    return c


def test_gated_off_matches_reference_errors(con):
    with pytest.raises(NotImplementedException, match="ALL SHORTEST"):
        con.execute("""FROM GRAPH_TABLE (pg
            MATCH p = ALL SHORTEST (a:Person)-[k:Knows]->{1,3}(b:Person)
            COLUMNS (path_length(p))) t""")
    with pytest.raises(NotImplementedException, match="TopK"):
        con.execute("""FROM GRAPH_TABLE (pg
            MATCH p = SHORTEST 2 (a:Person)-[k:Knows]->{1,3}(b:Person)
            COLUMNS (path_length(p))) t""")
    with pytest.raises(NotImplementedException, match="WALK"):
        con.execute("""FROM GRAPH_TABLE (pg
            MATCH TRAIL (a:Person)-[k:Knows]->{1,3}(b:Person)
            COLUMNS (b.name)) t""")


def test_all_shortest_enumerates_ties(con):
    con.execute("SET pgq_experimental = true")
    rows = con.execute("""FROM GRAPH_TABLE (pg
        MATCH p = ALL SHORTEST (a:Person)-[k:Knows]->{1,4}(b:Person)
        WHERE a.id = 0 AND b.id = 3
        COLUMNS (path_length(p), vertices(p))) t""").fetchall()
    assert rows == [(2, [0, 1, 3]), (2, [0, 2, 3])]
    # first enumerated path matches ANY SHORTEST's choice
    any_row = con.execute("""FROM GRAPH_TABLE (pg
        MATCH p = ANY SHORTEST (a:Person)-[k:Knows]->{1,4}(b:Person)
        WHERE a.id = 0 AND b.id = 3
        COLUMNS (vertices(p))) t""").fetchone()
    assert rows[0][1] == any_row[0]


def test_shortest_k_nondecreasing(con):
    con.execute("SET pgq_experimental = true")
    rows = con.execute("""FROM GRAPH_TABLE (pg
        MATCH p = SHORTEST 3 (a:Person)-[k:Knows]->{1,4}(b:Person)
        WHERE a.id = 0 AND b.id = 3
        COLUMNS (path_length(p), element_id(p))) t""").fetchall()
    lengths = [r[0] for r in rows]
    assert len(rows) == 3 and lengths == sorted(lengths)
    assert lengths[:2] == [2, 2]
    # element_id lists alternate vertex/edge rowids, endpoints 0 and 3
    for _, path in rows:
        assert path[0] == 0 and path[-1] == 3 and len(path) % 2 == 1


def test_path_modes_restrict_matches(con):
    con.execute("SET pgq_experimental = true")
    # add a cycle edge 3->0 so WALK-vs-ACYCLIC differs
    con.execute("INSERT INTO Knows VALUES (3,0)")
    acyclic = con.execute("""FROM GRAPH_TABLE (pg
        MATCH ACYCLIC (a:Person)-[k:Knows]->{1,10}(b:Person)
        WHERE a.id = 0 COLUMNS (b.name)) t ORDER BY 1""").fetchall()
    # 0 can reach 1,2,3 without vertex repeats, but never itself
    assert acyclic == [("b",), ("c",), ("d",)]
    trail = con.execute("""FROM GRAPH_TABLE (pg
        MATCH TRAIL (a:Person)-[k:Knows]->{1,10}(b:Person)
        WHERE a.id = 0 COLUMNS (b.name)) t ORDER BY 1""").fetchall()
    # trails may revisit vertices: 0 ->...-> 3 -> 0 reaches 'a' too
    assert trail == [("a",), ("b",), ("c",), ("d",)]


def _toy_csr():
    # 0->1, 0->2, 1->3, 2->3, 1->2 (edge ids = insertion order)
    src = np.array([0, 0, 1, 2, 1], dtype=np.int64)
    dst = np.array([1, 2, 3, 3, 2], dtype=np.int64)
    eid = np.arange(5, dtype=np.int64)
    return build_csr(4, src, dst, eid)


def test_kernel_all_shortest_paths():
    csr = _toy_csr()
    paths = msbfs.all_shortest_paths(csr, 0, 3)
    assert paths == [[0, 0, 1, 2, 3], [0, 1, 2, 3, 3]]
    assert msbfs.all_shortest_paths(csr, 0, 0) == [[0]]
    assert msbfs.all_shortest_paths(csr, 3, 0) == []


def test_kernel_k_shortest_walks_modes():
    csr = _toy_csr()
    walks = msbfs.k_shortest_walks(csr, 0, 3, 5)
    hops = [len(w) // 2 for w in walks]
    assert hops == sorted(hops) and hops[0] == 2
    # ACYCLIC forbids vertex repeats: only the three simple 0->3 paths
    acyc = msbfs.k_shortest_walks(csr, 0, 3, 10, msbfs.MODE_ACYCLIC)
    assert sorted(len(w) // 2 for w in acyc) == [2, 2, 3]


def test_kernel_path_mode_exists():
    csr = _toy_csr()
    assert msbfs.path_mode_exists(csr, 0, 3, 1, 4, msbfs.MODE_ACYCLIC)
    assert not msbfs.path_mode_exists(csr, 0, 0, 1, 10, msbfs.MODE_ACYCLIC)
    assert not msbfs.path_mode_exists(csr, 3, 0, 1, 10, msbfs.MODE_TRAIL)
