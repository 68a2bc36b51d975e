"""R-MAT / Kronecker power-law graph generator (graph500-style), vectorized.

Used by benchmarks and scale tests (BASELINE.md config 5: RMAT scale-26
power-law graph)."""

from __future__ import annotations

import numpy as np


def rmat_edges(scale: int, edge_factor: int = 16, seed: int = 42,
               a: float = 0.57, b: float = 0.19, c: float = 0.19
               ) -> tuple[np.ndarray, np.ndarray]:
    """Returns (src, dst) int64 arrays with V = 2**scale, E = V*edge_factor.

    Vectorized bit-by-bit Kronecker sampling; vertex ids are scrambled with a
    fixed permutation so degree skew isn't index-correlated (graph500
    convention)."""
    rng = np.random.default_rng(seed)
    v = 1 << scale
    e = v * edge_factor
    src = np.zeros(e, dtype=np.int64)
    dst = np.zeros(e, dtype=np.int64)
    ab = a + b
    a_norm = a / ab
    c_norm = c / (1.0 - ab)
    for bit in range(scale):
        r1 = rng.random(e)
        r2 = rng.random(e)
        src_bit = r1 > ab
        dst_bit = np.where(src_bit, r2 > c_norm, r2 > a_norm)
        src |= src_bit.astype(np.int64) << bit
        dst |= dst_bit.astype(np.int64) << bit
    perm = rng.permutation(v)
    return perm[src], perm[dst]
