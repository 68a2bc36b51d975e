"""Generative GRAPH_TABLE differential (round 4): random small graphs +
random MATCH patterns checked against an independent numpy oracle.

The corpus pins the reference's own test shapes; this harness generates
pattern/quantifier/direction combinations the corpus never wrote and
verifies the TRANSPILED execution end-to-end: fixed/variable-length
paths, undirected edges, per-element WHERE, ANY SHORTEST path lengths
(oracle = numpy BFS), and multi-element chains (oracle = nested-loop
joins over the edge list).
"""

import random

import numpy as np
import pytest

import duckpgq_tpu

SEED = 0xB00

N_GRAPHS = 6


def _graph(seed):
    rng = random.Random(seed)
    v = rng.randint(6, 18)
    e = rng.randint(v, 4 * v)
    edges = [(rng.randrange(v), rng.randrange(v)) for _ in range(e)]
    edges = sorted(set((s, d) for s, d in edges if s != d))
    return v, edges


GRAPHS = [_graph(SEED + i) for i in range(N_GRAPHS)]


@pytest.fixture(scope="module")
def cons():
    out = []
    for gi, (v, edges) in enumerate(GRAPHS):
        c = duckpgq_tpu.connect()
        c.execute(f"CREATE TABLE n(id BIGINT, lab BIGINT)")
        c.execute("INSERT INTO n VALUES " + ", ".join(
            f"({i}, {i % 3})" for i in range(v)))
        c.execute("CREATE TABLE ed(s BIGINT, d BIGINT, w BIGINT)")
        if edges:
            c.execute("INSERT INTO ed VALUES " + ", ".join(
                f"({s}, {d}, {(s * 7 + d) % 5})" for s, d in edges))
        c.execute(
            "CREATE PROPERTY GRAPH g VERTEX TABLES (n PROPERTIES "
            "(id, lab) LABEL node) EDGE TABLES (ed SOURCE KEY (s) "
            "REFERENCES n (id) DESTINATION KEY (d) REFERENCES n (id) "
            "PROPERTIES (w) LABEL e)")
        out.append(c)
    return out


def _hops(edges, direction):
    """(src, dst) pairs for one pattern element by direction."""
    if direction == "->":
        return list(edges)
    if direction == "<-":
        return [(d, s) for s, d in edges]
    # undirected: both orientations (the transpiler's UNION ALL)
    return list(edges) + [(d, s) for s, d in edges]


CHAIN_CASES = [(i,) for i in range(60)]


@pytest.mark.parametrize("i", [c[0] for c in CHAIN_CASES],
                         ids=[f"chain{i}" for i, in CHAIN_CASES])
def test_match_chain_differential(cons, i):
    """1-3 element chains with random directions and per-element edge
    WHERE filters vs a nested-loop oracle."""
    rng = random.Random(17 * SEED + i)
    gi = rng.randrange(N_GRAPHS)
    con = cons[gi]
    v, edges = GRAPHS[gi]
    n_hops = rng.randint(1, 3)
    dirs = [rng.choice(["->", "<-", "-"]) for _ in range(n_hops)]
    wmin = [rng.choice([None, 1, 2]) for _ in range(n_hops)]

    pat = "(a0:node)"
    for h in range(n_hops):
        cond = f" WHERE e{h}.w >= {wmin[h]}" if wmin[h] is not None else ""
        arrow = {"->": f"-[e{h}:e{cond}]->",
                 "<-": f"<-[e{h}:e{cond}]-",
                 "-": f"-[e{h}:e{cond}]-"}[dirs[h]]
        pat += f"{arrow}(a{h + 1}:node)"
    cols = ", ".join(f"a{k}.id AS v{k}" for k in range(n_hops + 1))
    sql = (f"SELECT * FROM GRAPH_TABLE (g MATCH {pat} "
           f"COLUMNS ({cols})) t ORDER BY ALL")
    got = con.execute(sql).fetchall()

    def wfilter(h, s, d):
        if wmin[h] is None:
            return True
        # weight is defined on the PHYSICAL edge row (s, d)
        return (s * 7 + d) % 5 >= wmin[h]

    rows = [(x,) for x in range(v)]
    for h in range(n_hops):
        if dirs[h] == "-":
            hop = [(s, d) for s, d in edges if wfilter(h, s, d)]
            hop += [(d, s) for s, d in edges if wfilter(h, s, d)]
        elif dirs[h] == "->":
            hop = [(s, d) for s, d in edges if wfilter(h, s, d)]
        else:
            hop = [(d, s) for s, d in edges if wfilter(h, s, d)]
        rows = [r + (d,) for r in rows for s2, d in hop if s2 == r[-1]]
    want = sorted(rows)
    assert sorted(got) == want, f"{sql}: {len(got)} vs {len(want)} rows"


SHORTEST_CASES = [(i,) for i in range(40)]


@pytest.mark.parametrize("i", [c[0] for c in SHORTEST_CASES],
                         ids=[f"short{i}" for i, in SHORTEST_CASES])
def test_any_shortest_differential(cons, i):
    """ANY SHORTEST ->{1,k} path lengths vs a numpy BFS oracle."""
    rng = random.Random(19 * SEED + i)
    gi = rng.randrange(N_GRAPHS)
    con = cons[gi]
    v, edges = GRAPHS[gi]
    k = rng.randint(1, 4)
    a0 = rng.randrange(v)
    sql = (f"SELECT * FROM GRAPH_TABLE (g MATCH p = ANY SHORTEST "
           f"(a:node WHERE a.id = {a0})-[x:e]->{{1,{k}}}(b:node) "
           f"COLUMNS (b.id AS bid, path_length(p) AS l)) t ORDER BY bid")
    got = con.execute(sql).fetchall()
    # numpy BFS from a0
    INF = 10**9
    dist = [INF] * v
    dist[a0] = 0
    frontier = [a0]
    d = 0
    while frontier and d < k:
        d += 1
        nxt = []
        for s, t in edges:
            if dist[s] == d - 1 and dist[t] == INF:
                dist[t] = d
                nxt.append(t)
        # (recompute properly: level-synchronous)
        frontier = nxt
    want = sorted((b, dist[b]) for b in range(v)
                  if 1 <= dist[b] <= k)
    assert got == want, f"{sql}: {got} vs {want}"
