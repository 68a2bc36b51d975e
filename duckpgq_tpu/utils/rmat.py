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


def rmat_edges_device(scale: int, edge_factor: int = 16, seed: int = 42,
                      a: float = 0.57, b: float = 0.19, c: float = 0.19):
    """Device-side R-MAT generator: same bit-by-bit Kronecker sampling and
    permutation scramble as rmat_edges, computed with jax.random ON the
    accelerator (different PRNG stream, same distribution). Returns
    (src, dst) int32 device arrays.

    Exists because the benchmark environment's host<->device tunnel moves
    bulk data at ~0.1 MB/s — shipping a host-generated edge list takes
    minutes while generating on device takes milliseconds (graph500 allows
    generation + construction on the compute side; construction time is
    still reported separately)."""
    import jax
    import jax.numpy as jnp

    v = 1 << scale
    e = v * edge_factor
    ab = a + b
    a_norm = a / ab
    c_norm = c / (1.0 - ab)

    @jax.jit
    def gen(key):
        keys = jax.random.split(key, 2 * scale + 1)
        src = jnp.zeros(e, dtype=jnp.uint32)
        dst = jnp.zeros(e, dtype=jnp.uint32)
        for bit in range(scale):
            r1 = jax.random.uniform(keys[2 * bit], (e,))
            r2 = jax.random.uniform(keys[2 * bit + 1], (e,))
            src_bit = r1 > ab
            dst_bit = jnp.where(src_bit, r2 > c_norm, r2 > a_norm)
            src = src | (src_bit.astype(jnp.uint32) << bit)
            dst = dst | (dst_bit.astype(jnp.uint32) << bit)
        perm = jax.random.permutation(keys[-1], v).astype(jnp.int32)
        return perm[src], perm[dst]

    return gen(jax.random.PRNGKey(seed))
