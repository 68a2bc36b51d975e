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

import os

import numpy as np

from .csr import CSR


def _device_min_edges() -> int:
    """SQL -> device bridge threshold shared by every whole-graph kernel
    (same knob as the path kernels in ops/msbfs.py). CSRs at or above this
    edge count route to the TPU device kernels; DUCKPGQ_DEVICE_MIN_EDGES=0
    forces the device path (the force-device corpus run uses that)."""
    return int(os.environ.get("DUCKPGQ_DEVICE_MIN_EDGES", "2000000"))


def pagerank(csr: CSR, damping: float = 0.85, threshold: float = 1e-6
             ) -> np.ndarray:
    """Returns rank array over vsize entries (callers index by rowid).

    Dispatches to the distributed mesh when one is configured
    (parallel/sql_mesh — float64 with the reference's V+2 quirk), to the
    TPU device kernel for large CSRs (msbfs_jax.pagerank_reference), and
    to the native runtime (native/graphrt.cpp) otherwise."""
    from ..parallel import sql_mesh
    if sql_mesh.active_n():
        out = sql_mesh.pagerank(csr, damping, threshold)
        if out is not None:
            return out
    if csr.ecount >= _device_min_edges():
        from .csr_jax import from_host_csr
        from .msbfs_jax import pagerank_reference
        return pagerank_reference(from_host_csr(csr), csr.vsize,
                                  damping, threshold)
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


def _replay_forest_links(csr: CSR, positions: np.ndarray) -> np.ndarray:
    """Replay Link(src, dst) over the given CSR positions ascending —
    exactly the reference's successful-link sequence — and resolve roots.
    O(|positions| * alpha) host work over <= V-1 spanning edges."""
    n = csr.vsize - 1
    forest = np.arange(n, dtype=np.int64)

    def find(node: int) -> int:
        while True:
            parent = forest[node]
            if parent == node:
                return node
            forest[node] = forest[parent]
            node = parent

    src_of = csr.src_of_edge
    e = csr.e
    for p in positions:
        ra = find(int(src_of[p]))
        rb = find(int(e[p]))
        if ra != rb:
            forest[ra] = rb
    # resolve every vertex to its root (vectorized pointer jumping)
    while True:
        nxt = forest[forest]
        if np.array_equal(nxt, forest):
            return forest
        forest = nxt


def weakly_connected_component(csr: CSR) -> np.ndarray:
    """Union-find with the reference's exact linking order; returns the root
    per vertex for vertices [0, vsize-1).

    Large CSRs route to the device: Boruvka over edge-position weights
    (msbfs_jax.wcc_msf_device) finds the reference's successful-link edge
    set on the TPU — the O(E) part — and the <= V-1 forest links are
    replayed on the host to reproduce the exact order-dependent root ids.

    A configured mesh routes the O(E) Boruvka part to the distributed
    implementation (parallel/sql_mesh) with the same host replay."""
    from ..parallel import sql_mesh
    if sql_mesh.active_n():
        out = sql_mesh.weakly_connected_component(csr)
        if out is not None:
            return out
    if csr.ecount >= _device_min_edges():
        from .csr_jax import from_host_csr
        from .msbfs_jax import wcc_msf_device
        mask = np.asarray(wcc_msf_device(from_host_csr(csr)))[:csr.ecount]
        return _replay_forest_links(csr, np.flatnonzero(mask))
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
    deduplicated undirected CSR, mirroring the reference's table function).

    Large CSRs route to the blocked device kernel (msbfs_jax.lcc_device);
    wedge counts are small integers so its float32 output is bit-identical
    to the reference's float32 column (the distributed variant too, when a
    mesh is configured)."""
    from ..parallel import sql_mesh
    if sql_mesh.active_n():
        out = sql_mesh.local_clustering_coefficient(csr)
        if out is not None:
            return out
    if csr.ecount >= _device_min_edges():
        from .csr_jax import from_host_csr
        from .msbfs_jax import lcc_device
        return np.asarray(lcc_device(from_host_csr(csr)))
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
