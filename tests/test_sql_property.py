"""End-to-end property test: quantified MATCH through the FULL SQL stack
(parser -> transpiler -> executor -> CSR build -> MS-BFS kernel) against a
plain BFS oracle, on randomized graphs. The reference corpus fixes specific
graphs; this randomizes them."""

from collections import deque

import numpy as np
import pytest


def _bfs_lengths(v, edges, src):
    adj = [[] for _ in range(v)]
    for s, d in edges:
        adj[s].append(d)
    dist = [-1] * v
    dist[src] = 0
    q = deque([src])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if dist[w] < 0:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


@pytest.mark.parametrize("seed", list(range(8)))
def test_any_shortest_matches_bfs_oracle(seed):
    import duckpgq_tpu

    rng = np.random.default_rng(seed)
    v = int(rng.integers(5, 40))
    e = int(rng.integers(v, v * 4))
    edges = [(int(rng.integers(0, v)), int(rng.integers(0, v)))
             for _ in range(e)]

    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE P(id BIGINT)")
    con.execute("INSERT INTO P VALUES " +
                ",".join(f"({i})" for i in range(v)))
    con.execute("CREATE TABLE K(s BIGINT, d BIGINT)")
    con.execute("INSERT INTO K VALUES " +
                ",".join(f"({s},{d})" for s, d in edges))
    con.execute("""CREATE PROPERTY GRAPH g
      VERTEX TABLES (P LABEL p)
      EDGE TABLES (K SOURCE KEY (s) REFERENCES P (id)
                     DESTINATION KEY (d) REFERENCES P (id) LABEL k)""")

    bound = int(rng.integers(1, 6))
    got = dict()
    for srow in con.execute(f"""
        SELECT * FROM GRAPH_TABLE (g
          MATCH pp = ANY SHORTEST (a:p)-[e:k]->{{1,{bound}}}(b:p)
          COLUMNS (a.id AS s, b.id AS d, path_length(pp) AS len)) t
        """).fetchall():
        got[(srow[0], srow[1])] = srow[2]

    has_self_loop = {s for s, d in edges if s == d}
    for src in range(v):
        dist = _bfs_lengths(v, edges, src)
        for dst in range(v):
            if dst == src:
                # reference-exact src==dst semantics: {1,1} transpiles to a
                # plain edge join (self-loops match); upper>1 goes through
                # iterativelength, whose src==dst result is 0 (trivial,
                # iterativelength.cpp) and falls outside BETWEEN 1 AND k
                want = 1 if (bound == 1 and src in has_self_loop) else None
            else:
                want = dist[dst] if 1 <= dist[dst] <= bound else None
            assert got.get((src, dst)) == want, (
                seed, src, dst, bound, got.get((src, dst)), want)


@pytest.mark.parametrize("seed", [10, 11, 12, 13])
def test_fixed_two_hop_matches_oracle(seed):
    """Fixed-length 2-hop MATCH binding vs direct join enumeration."""
    import duckpgq_tpu

    rng = np.random.default_rng(seed)
    v = int(rng.integers(4, 25))
    e = int(rng.integers(v, v * 3))
    edges = [(int(rng.integers(0, v)), int(rng.integers(0, v)))
             for _ in range(e)]

    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE P(id BIGINT)")
    con.execute("INSERT INTO P VALUES " +
                ",".join(f"({i})" for i in range(v)))
    con.execute("CREATE TABLE K(s BIGINT, d BIGINT)")
    con.execute("INSERT INTO K VALUES " +
                ",".join(f"({s},{d})" for s, d in edges))
    con.execute("""CREATE PROPERTY GRAPH g
      VERTEX TABLES (P LABEL p)
      EDGE TABLES (K SOURCE KEY (s) REFERENCES P (id)
                     DESTINATION KEY (d) REFERENCES P (id) LABEL k)""")
    got = sorted(con.execute("""
        SELECT * FROM GRAPH_TABLE (g
          MATCH (a:p)-[e1:k]->(b:p)-[e2:k]->(c:p)
          COLUMNS (a.id AS x, b.id AS y, c.id AS z)) t""").fetchall())
    want = sorted((s1, d1, d2) for s1, d1 in edges for s2, d2 in edges
                  if d1 == s2)
    assert got == want


def test_path_length_only_fast_path_matches_full():
    """When COLUMNS uses only path_length(p), the transpiler skips the
    shortestpath CTE and answers from iterativelength — results must be
    identical to a query that also materializes element_id(p)."""
    import numpy as np
    import duckpgq_tpu
    rng = np.random.default_rng(5)
    v, e = 60, 240
    src = rng.integers(0, v, size=e)
    dst = rng.integers(0, v, size=e)
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE n(id BIGINT)")
    con.execute("INSERT INTO n SELECT range FROM range(60)")
    con.execute("CREATE TABLE ed(s BIGINT, d BIGINT)")
    for i in range(0, e, 80):
        vals = ",".join(f"({a},{b})" for a, b in
                        zip(src[i:i+80], dst[i:i+80]))
        con.execute(f"INSERT INTO ed VALUES {vals}")
    con.execute("""CREATE PROPERTY GRAPH g VERTEX TABLES (n LABEL v)
      EDGE TABLES (ed SOURCE KEY (s) REFERENCES n (id)
                      DESTINATION KEY (d) REFERENCES n (id) LABEL k)""")
    fast = con.execute("""
      SELECT * FROM GRAPH_TABLE (g
        MATCH p = ANY SHORTEST (a:v)-[x:k]->{1,4}(b:v)
        COLUMNS (a.id AS s, b.id AS d, path_length(p) AS len)) t
      ORDER BY s, d""").fetchall()
    full = con.execute("""
      SELECT s, d, len FROM GRAPH_TABLE (g
        MATCH p = ANY SHORTEST (a:v)-[x:k]->{1,4}(b:v)
        COLUMNS (a.id AS s, b.id AS d, path_length(p) AS len,
                 element_id(p) AS eid)) t
      ORDER BY s, d""").fetchall()
    assert fast == full and len(fast) > 0
