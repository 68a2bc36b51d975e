"""Whole-graph algorithms — host exact kernels (PageRank, WCC, LCC).

These reproduce the reference's outputs bit-for-bit where tests compare
literal values:
- PageRank iterates in float64 over ``vsize = V+2`` entries (the reference's
  padded vertex array leaks into the denominator, pagerank.cpp:31-78; the two
  phantom vertices are dangling).
- WCC is the reference's sequential union-find with its exact linking order
  (forest[rootA] = rootB per edge in CSR order, weakly_connected_component.cpp
  :14-34,66-91) — component ids depend on that order, and tests assert them.
- LCC counts directed neighbor-neighbor links over the (deduplicated,
  symmetrized) CSR, lcc = links / (d*(d-1)), emitted as float32
  (local_clustering_coefficient.cpp:11-72).

TPU device variants (same equivalence classes / fixpoints, layout-optimized)
live in duckpgq_tpu.models.
"""

from __future__ import annotations

import numpy as np

from .csr import CSR


def pagerank(csr: CSR, damping: float = 0.85, threshold: float = 1e-6
             ) -> np.ndarray:
    """Returns rank array over vsize entries (callers index by rowid).

    Dispatches to the native runtime (native/graphrt.cpp) when built."""
    from .. import native_rt
    if native_rt.available():
        out = native_rt.pagerank(csr.vcount, csr.vsize, csr.v, csr.e,
                                 damping, threshold)
        if out is not None:
            return out
    N = csr.vsize
    V = csr.vcount
    deg = np.zeros(N, dtype=np.int64)
    deg[:V] = csr.out_degree()
    has_out = deg > 0
    rank = np.full(N, 1.0 / N, dtype=np.float64)
    src = csr.src_of_edge if csr.ecount else np.empty(0, np.int64)
    e = csr.e if csr.ecount else np.empty(0, np.int64)
    while True:
        temp = np.zeros(N, dtype=np.float64)
        if len(e):
            contrib = rank[src] / deg[src]
            np.add.at(temp, e, contrib)
        dangling = rank[~has_out].sum()
        correction = dangling / N
        temp = (1 - damping) / N + damping * (temp + correction)
        max_delta = np.abs(temp - rank).max() if N else 0.0
        rank = temp
        if max_delta < threshold:
            return rank


def weakly_connected_component(csr: CSR) -> np.ndarray:
    """Union-find with the reference's exact linking order; returns the root
    per vertex for vertices [0, vsize-1)."""
    from .. import native_rt
    if native_rt.available():
        out = native_rt.wcc(csr.vcount, csr.vsize - 1, csr.v, csr.e)
        if out is not None:
            return out
    n = csr.vsize - 1
    forest = np.arange(n, dtype=np.int64)

    def find(node: int) -> int:
        while True:
            parent = forest[node]
            if parent == node:
                return node
            forest[node] = forest[parent]
            node = parent

    V = csr.vcount
    e = csr.e
    v = csr.v
    for i in range(min(V, n)):
        for j in range(v[i], v[i + 1]):
            ra = find(i)
            rb = find(int(e[j]))
            if ra != rb:
                forest[ra] = rb
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        out[i] = find(i)
    return out


def local_clustering_coefficient(csr: CSR) -> np.ndarray:
    """lcc[v] = (# directed links among neighbors of v) / (d*(d-1)).
    Works on whichever CSR it is given (the SQL layer hands it the
    deduplicated undirected CSR, mirroring the reference's table function)."""
    from .. import native_rt
    if native_rt.available():
        out = native_rt.lcc(csr.vcount, csr.v, csr.e)
        if out is not None:
            return out
    V = csr.vcount
    out = np.zeros(V, dtype=np.float32)
    v, e = csr.v, csr.e
    mark = np.zeros(V + 2, dtype=bool)
    for u in range(V):
        nbrs = e[v[u]:v[u + 1]]
        d = len(nbrs)
        if d < 2:
            out[u] = 0.0
            continue
        mark[nbrs] = True
        count = 0
        for x in nbrs:
            xn = e[v[x]:v[x + 1]]
            count += int(mark[xn].sum())
        mark[nbrs] = False
        out[u] = np.float32(count) / np.float32(d * (d - 1))
    return out
