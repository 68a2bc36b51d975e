"""Per-component cost breakdown of one chunked-wave BFS iteration at
huge-graph shapes: (a) the [W, Ec] frontier gather over all K chunks,
(b) the blocked segmented scan, (c) the compact->[W, Vp] extraction,
(d) the elementwise vertex-state update. Each component is timed as its
own jitted dispatch with an xor/sum consumer so XLA cannot elide work.

Usage: SCALE=23 W=48 K=256 python scripts/chunk_cost_probe.py"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_LOCAL_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from duckpgq_tpu.ops.csr_jax import build_lengths_csr_on_device
from duckpgq_tpu.ops.msbfs_jax import (_scan_block_size, _in_segments,
                                       _seg_or_scan_blocked_rows,
                                       plan_packed_wave)
from duckpgq_tpu.utils.rmat import rmat_edges_device


def timed(fn, *args, runs=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync (compile+run)
    ts = []
    for _ in range(runs):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    scale = int(os.environ.get("SCALE", "23"))
    W = int(os.environ.get("W", "48"))
    K = int(os.environ.get("K", "256"))
    v = 1 << scale
    src_d, dst_d = rmat_edges_device(scale, 16, seed=11)
    csr = build_lengths_csr_on_device(v, src_d, dst_d)
    plan = plan_packed_wave(csr, lanes=W * 32, n_chunks=K)
    Vp, Ep = csr.vpad, csr.epad
    Ec = Ep // plan.n_chunks
    bmax = plan.bmax
    block = _scan_block_size(Ec)
    print(f"# Vp={Vp} Ep={Ep} W={W} K={plan.n_chunks} Ec={Ec} "
          f"block={block} bmax={bmax}", file=sys.stderr)
    heads, _, _ = _in_segments(csr)
    heads = jax.jit(lambda h: h + 0)(heads)  # materialize once
    key = jax.random.PRNGKey(0)
    frontier = jax.random.bits(key, (W, Vp + 1), dtype=jnp.uint32)
    gchunk = jax.random.bits(key, (W, Ec), dtype=jnp.uint32)
    compact = jax.random.bits(key, (W, plan.n_chunks * bmax + 1),
                              dtype=jnp.uint32)

    @jax.jit
    def gather_all(frontier):
        def step(k, acc):
            idx = jax.lax.dynamic_slice(csr.in_src, (k * Ec,), (Ec,))
            g = jnp.take(frontier, idx, axis=1)
            return acc ^ g.sum(axis=1, dtype=jnp.uint32)
        return jax.lax.fori_loop(0, plan.n_chunks, step,
                                 jnp.zeros(W, jnp.uint32))

    @jax.jit
    def scan_all(g):
        def step(k, state):
            acc, carry = state
            hds = jax.lax.dynamic_slice(heads, (k * Ec,), (Ec,))
            scanned, carry = _seg_or_scan_blocked_rows(g, hds, carry, block)
            return acc ^ scanned.sum(axis=1, dtype=jnp.uint32), carry
        acc, _ = jax.lax.fori_loop(
            0, plan.n_chunks, step,
            (jnp.zeros(W, jnp.uint32), jnp.zeros((W, 1), jnp.uint32)))
        return acc

    @jax.jit
    def extract(compact):
        return jnp.take(compact, plan.slot, axis=1).sum(
            axis=1, dtype=jnp.uint32)

    @jax.jit
    def vstate(frontier):
        nxt = frontier & ~(frontier >> 1)
        seen = frontier | nxt
        return (nxt ^ seen).sum(axis=1, dtype=jnp.uint32)

    res = {
        "gather_s": round(timed(gather_all, frontier), 3),
        "scan_s": round(timed(scan_all, gchunk), 3),
        "extract_s": round(timed(extract, compact), 3),
        "vstate_s": round(timed(vstate, frontier), 3),
        "W": W, "K": plan.n_chunks, "Ec": Ec, "block": block,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
