"""R-MAT / Kronecker power-law graph generator (graph500-style), vectorized.

Used by benchmarks and scale tests (BASELINE.md config 5: RMAT scale-26
power-law graph)."""

from __future__ import annotations

import functools

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
    # chunk the sampling at huge scales: the unrolled bit loop keeps two
    # [e] f32 uniforms live next to the two [e] u32 outputs — 17 GB at
    # scale 26, an HBM OOM that crashes the TPU worker at the next sync.
    # Each chunk is its own dispatch with its own temps.
    n_chunks = 1 << max(0, scale - 24)

    @functools.partial(jax.jit, static_argnames=("ec",))
    def gen_chunk(key, ec: int):
        keys = jax.random.split(key, 2 * scale)
        src = jnp.zeros(ec, dtype=jnp.uint32)
        dst = jnp.zeros(ec, dtype=jnp.uint32)
        for bit in range(scale):
            r1 = jax.random.uniform(keys[2 * bit], (ec,))
            r2 = jax.random.uniform(keys[2 * bit + 1], (ec,))
            src_bit = r1 > ab
            dst_bit = jnp.where(src_bit, r2 > c_norm, r2 > a_norm)
            src = src | (src_bit.astype(jnp.uint32) << bit)
            dst = dst | (dst_bit.astype(jnp.uint32) << bit)
        return src, dst

    @functools.partial(jax.jit, donate_argnames=("sbuf", "dbuf"))
    def fill_chunk(sbuf, dbuf, key, off):
        # write each chunk into donated full-size buffers: a concat of
        # the chunk list would transiently DOUBLE the edge arrays
        # (17 GB at scale 26); dynamic offset = one executable
        s, d = gen_chunk(key, sbuf.shape[0] // n_chunks)
        return (jax.lax.dynamic_update_slice(sbuf, s, (off,)),
                jax.lax.dynamic_update_slice(dbuf, d, (off,)))

    @functools.partial(jax.jit, donate_argnames=("x",))
    def scramble_one(key, x):
        perm = jax.random.permutation(key, v).astype(jnp.int32)
        return perm[x]

    root = jax.random.PRNGKey(seed)
    pkey, *ckeys = jax.random.split(root, n_chunks + 1)
    ec = e // n_chunks
    if n_chunks == 1:
        src, dst = gen_chunk(ckeys[0], e)
    else:
        src = jnp.zeros(e, dtype=jnp.uint32)
        dst = jnp.zeros(e, dtype=jnp.uint32)
        for i, k in enumerate(ckeys):
            src, dst = fill_chunk(src, dst, k, np.int32(i * ec))
    # scramble per component (donated) so only one extra [e] buffer is
    # ever live
    return scramble_one(pkey, src), scramble_one(pkey, dst)
