"""Compressed sparse row graph representation + builders.

TPU-first design: the CSR is built with sort + segment ops (degree histogram ->
exclusive prefix sum -> stable sort of edges by source), not atomic scatters
like the reference (reference src/core/functions/scalar/csr_creation.cpp uses
atomic fetch-add scatter; a stable sort by src reproduces the same edge order
because DuckDB scans append in row order). Offsets layout is [V+1] exclusive
prefix; ``vsize`` reports V+2 for reference parity (csr_creation.cpp:29-30 —
the +2 padding leaks into kernel semantics, e.g. PageRank's N).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..errors import ConstraintException


@dataclass
class CSR:
    """Host CSR. ``v``: int64 offsets [V+1]; ``e``: dst vertex per edge,
    sorted by (src, insertion order); ``edge_ids``: original edge rowids."""

    v: np.ndarray = None
    e: np.ndarray = None
    edge_ids: np.ndarray = None
    w: Optional[np.ndarray] = None          # int64 weights
    w_double: Optional[np.ndarray] = None   # float64 weights
    vcount: int = 0
    initialized_v: bool = False
    initialized_e: bool = False
    initialized_w: bool = False
    # reverse (in-edge) arrays, built lazily: for each in-edge sorted by dst:
    # rsrc = source vertex, rpos = position of that edge in e/edge_ids
    _rsrc: Optional[np.ndarray] = None
    _rdst: Optional[np.ndarray] = None
    _rpos: Optional[np.ndarray] = None
    # build scratch
    _src_of_edge: Optional[np.ndarray] = None

    @property
    def vsize(self) -> int:
        """Reference-compatible vertex array size (vcount + 2)."""
        return self.vcount + 2

    @property
    def ecount(self) -> int:
        return len(self.e) if self.e is not None else 0

    def out_degree(self) -> np.ndarray:
        return self.v[1:] - self.v[:-1]

    def neighbors(self, u: int) -> np.ndarray:
        return self.e[self.v[u]:self.v[u + 1]]

    def reverse(self):
        """In-edge view: (rsrc, rdst, rpos) with rdst sorted ascending.
        rpos indexes into e/edge_ids (CSR position — used for the reference's
        deterministic parent tie-break: lowest CSR position wins)."""
        if self._rsrc is None:
            order = np.argsort(self.e, kind="stable")
            self._rpos = order.astype(np.int64)
            self._rdst = self.e[order]
            self._rsrc = self._src_of_edge[order] if self._src_of_edge is not \
                None else self._compute_src()[order]
        return self._rsrc, self._rdst, self._rpos

    def _compute_src(self) -> np.ndarray:
        src = np.zeros(self.ecount, dtype=np.int64)
        deg = self.out_degree()
        src = np.repeat(np.arange(self.vcount, dtype=np.int64), deg)
        self._src_of_edge = src
        return src

    @property
    def src_of_edge(self) -> np.ndarray:
        if self._src_of_edge is None:
            self._compute_src()
        return self._src_of_edge


def build_csr(vcount: int, src: np.ndarray, dst: np.ndarray,
              edge_ids: np.ndarray, w: Optional[np.ndarray] = None,
              w_is_double: bool = False) -> CSR:
    """Build a CSR from dense-rowid edge arrays. Stable sort by src keeps
    insertion order within a source (matches the reference's sequential
    scatter order)."""
    csr = CSR()
    csr.vcount = int(vcount)
    order = np.argsort(src, kind="stable")
    s = src[order]
    counts = np.bincount(s, minlength=vcount)
    csr.v = np.zeros(vcount + 1, dtype=np.int64)
    np.cumsum(counts, out=csr.v[1:])
    csr.e = dst[order].astype(np.int64)
    csr.edge_ids = edge_ids[order].astype(np.int64)
    csr._src_of_edge = s.astype(np.int64)
    if w is not None:
        if w_is_double:
            csr.w_double = w[order].astype(np.float64)
        else:
            csr.w = w[order].astype(np.int64)
        csr.initialized_w = True
    csr.initialized_v = True
    csr.initialized_e = True
    return csr


class CSRBuilder:
    """Accumulates the two-phase SQL build protocol (create_csr_vertex then
    create_csr_edge — reference csr_creation.cpp) and finalizes into a CSR."""

    def __init__(self, csr_id: int):
        self.csr_id = csr_id
        self.vcount = 0
        self.degrees: Optional[np.ndarray] = None
        self.csr: Optional[CSR] = None

    def add_vertex_degrees(self, vcount: int, dense_ids: np.ndarray,
                           counts: np.ndarray):
        self.vcount = int(vcount)
        if self.degrees is None:
            self.degrees = np.zeros(self.vcount + 2, dtype=np.int64)
        ids = dense_ids.astype(np.int64)
        self.degrees[ids + 2] = counts.astype(np.int64)

    def build_edges(self, vcount: int, vertexsum: int, ecount: int,
                    src: np.ndarray, dst: np.ndarray, edge_ids: np.ndarray,
                    w: Optional[np.ndarray] = None, w_is_double: bool = False
                    ) -> CSR:
        if int(vertexsum) != int(ecount):
            # reference flags the CSR for deletion and raises
            # (csr_creation.cpp:120-125)
            raise ConstraintException(
                "Non-existent/non-unique vertices detected. Make sure all "
                "vertices referred by edge tables exist and are unique for "
                "path-finding queries.")
        return build_csr(int(vcount), src, dst, edge_ids, w, w_is_double)
