"""Graph: the device-resident property-graph handle.

Capability parity with the reference's kernel surface (SURVEY.md §2.6) as a
direct API: CSR construction from edge arrays or SQL tables, multi-source BFS
lengths, reachability, weighted shortest-path costs, PageRank, WCC, LCC.
Compute runs through the jitted kernels in ops/msbfs_jax.py on whatever JAX
backend is active (TPU in production, CPU in tests).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..ops import algorithms as host_algs
from ..ops import msbfs as host_msbfs
from ..ops import msbfs_jax as dev
from ..ops.csr import build_csr
from ..ops.csr_jax import DeviceCSR, build_device_csr


class Graph:
    """An immutable graph snapshot with device CSR + lazy host mirror."""

    def __init__(self, vcount: int, src: np.ndarray, dst: np.ndarray,
                 edge_ids: Optional[np.ndarray] = None,
                 weights: Optional[np.ndarray] = None,
                 directed: bool = True):
        self.vcount = int(vcount)
        self.src = np.asarray(src, dtype=np.int64)
        self.dst = np.asarray(dst, dtype=np.int64)
        self.edge_ids = (np.asarray(edge_ids, dtype=np.int64)
                         if edge_ids is not None
                         else np.arange(len(self.src), dtype=np.int64))
        self.weights = (np.asarray(weights) if weights is not None else None)
        self.directed = directed
        self._device: Optional[DeviceCSR] = None
        self._host = None

    # ------------------------------------------------------------ construct
    @classmethod
    def from_connection(cls, con, pg_name: str, vertex_label: str,
                        edge_label: str, directed: bool = True) -> "Graph":
        """Build from a registered property graph (same resolution as the
        algorithm table functions, duckpgq_utils.cpp:44-60)."""
        from ..pgq.algorithms import validate_source_node_and_edge_table
        from ..pgq.ddl import _resolve_table
        info = con.get_property_graph(pg_name)
        edge = validate_source_node_and_edge_table(info, vertex_label.lower(),
                                                   edge_label.lower())
        for v in info.vertex_tables:
            if v.table_name.lower() == edge.source_reference.lower():
                edge.source_pg_table = v
            if v.table_name.lower() == edge.destination_reference.lower():
                edge.destination_pg_table = v
        ex = con.executor
        vt = _resolve_table(ex, edge.source_pg_table)
        et = _resolve_table(ex, edge)
        pk = vt.get_column(edge.source_pk[0])
        id_to_row = {pk.value(i): i for i in range(len(pk))}
        sfk = et.get_column(edge.source_fk[0])
        dfk = et.get_column(edge.destination_fk[0])
        src = np.array([id_to_row.get(sfk.value(i), -1)
                        for i in range(len(sfk))], dtype=np.int64)
        dst = np.array([id_to_row.get(dfk.value(i), -1)
                        for i in range(len(dfk))], dtype=np.int64)
        keep = (src >= 0) & (dst >= 0)
        return cls(vt.row_count, src[keep], dst[keep], directed=directed)

    def symmetrized(self) -> "Graph":
        """Undirected view: both orientations, deduplicated (the reference's
        undirected CSR CTE semantics, compressed_sparse_row.cpp:208-223)."""
        pairs = np.stack([np.concatenate([self.src, self.dst]),
                          np.concatenate([self.dst, self.src])], axis=1)
        ids = np.concatenate([self.edge_ids, self.edge_ids])
        uniq, first = np.unique(pairs, axis=0, return_index=True)
        return Graph(self.vcount, uniq[:, 0], uniq[:, 1], ids[first],
                     directed=False)

    # -------------------------------------------------------------- backends
    @property
    def device_csr(self) -> DeviceCSR:
        if self._device is None:
            self._device = build_device_csr(
                self.vcount, self.src, self.dst, self.edge_ids,
                self.weights)
        return self._device

    @property
    def host_csr(self):
        if self._host is None:
            w = self.weights
            is_double = w is not None and np.issubdtype(w.dtype, np.floating)
            self._host = build_csr(self.vcount, self.src, self.dst,
                                   self.edge_ids, w, is_double)
        return self._host

    @property
    def ecount(self) -> int:
        return len(self.src)

    # ------------------------------------------------------------ algorithms
    def bfs_lengths(self, src, dst, lanes: int = 64) -> np.ndarray:
        """Batched BFS lengths on device (-1 = unreached)."""
        out, _ = dev.msbfs_lengths_batched(
            self.device_csr, np.asarray(src), np.asarray(dst), lanes=lanes)
        return out

    def reachability(self, src, dst, lanes: int = 64) -> np.ndarray:
        return self.bfs_lengths(src, dst, lanes=lanes) >= 0

    def shortest_paths(self, src, dst, device: Optional[bool] = None):
        """Vertex/edge-id interleaved paths (reference shortest_path.cpp
        semantics). Parent search runs on device for large graphs (packed
        per-lane parents, host backtracking); small graphs use the native/
        numpy host kernel where dispatch overhead wins."""
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if device is None:
            device = self.ecount >= 100_000
        if device:
            return dev.shortest_paths_device(self.device_csr, src, dst)
        return host_msbfs.shortest_path(self.host_csr, src, dst)

    def cheapest_path_costs(self, src, dst, lanes: int = 64) -> np.ndarray:
        import jax.numpy as jnp
        n = len(src)
        out = np.full(n, np.inf, dtype=np.float32)
        csr = self.device_csr
        for start in range(0, n, lanes):
            m = min(lanes, n - start)
            s = np.zeros(lanes, dtype=np.int32)
            d = np.zeros(lanes, dtype=np.int32)
            a = np.zeros(lanes, dtype=bool)
            s[:m] = src[start:start + m]
            d[:m] = dst[start:start + m]
            a[:m] = True
            res = dev.bellman_ford(csr, jnp.asarray(s), jnp.asarray(d),
                                   jnp.asarray(a), max_iters=self.vcount + 1)
            out[start:start + m] = np.asarray(res)[:m]
        return out

    def pagerank(self, damping: float = 0.85, tol: float = 1e-6,
                 exact_reference: bool = False) -> np.ndarray:
        """Device power iteration; ``exact_reference=True`` runs the host
        float64 kernel with the reference's vsize=V+2 semantics instead."""
        if exact_reference:
            return host_algs.pagerank(self.host_csr, damping, tol)
        return np.asarray(dev.pagerank_device(self.device_csr, damping, tol))

    def weakly_connected_components(self, exact_reference: bool = False
                                    ) -> np.ndarray:
        """Device label propagation (canonical min-vertex labels);
        ``exact_reference=True`` reproduces the reference union-find's exact
        root ids."""
        if exact_reference:
            return host_algs.weakly_connected_component(self.host_csr)[
                :self.vcount]
        return np.asarray(dev.wcc_label_propagation(self.device_csr))

    def local_clustering_coefficient(self, device: Optional[bool] = None
                                     ) -> np.ndarray:
        g = self if not self.directed else self.symmetrized()
        if device is None:
            device = g.ecount >= 100_000
        if device:
            return np.asarray(dev.lcc_device(g.device_csr))
        return host_algs.local_clustering_coefficient(g.host_csr)
