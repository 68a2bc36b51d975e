"""Probe what limits the packed-BFS frontier gather on the live backend.

The bench-config gather (RMAT-18, 4.2M edge indices into a [Vp+1, 128]
uint32 frontier) runs at ~49 GB/s effective vs ~800 GB/s HBM peak
(scripts/kernel_profile.py). Hypotheses tested here, each as one jitted
fori_loop so tunnel RTT is amortized:

  A. locality  — same index count into a tiny table (all rows cache-hot)
  B. sortedness — the same indices sorted ascending
  C. row width — W = 32 / 64 / 128 / 256 (per-index vs per-byte cost)
  D. wide elements — bitcast the table to fewer, wider elements
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    scale = int(os.environ.get("BENCH_SCALE", "18"))
    reps = int(os.environ.get("PROF_REPS", "16"))

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.utils.rmat import rmat_edges

    src, dst = rmat_edges(scale, 16, seed=11)
    v = 1 << scale
    csr = build_device_csr(v, src, dst)
    Vp, Ep = csr.vpad, csr.epad
    in_src = csr.in_src
    in_src_sorted = jnp.sort(in_src)
    rng = np.random.default_rng(0)
    print(f"# scale={scale} Vp={Vp} Ep={Ep} reps={reps} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    def time_gather(name, table, idx, nbytes):
        n_rows = int(table.shape[0])

        @jax.jit
        def run(t):
            def body(i, acc):
                # rotate the indices by the loop counter and consume every
                # gathered row: a loop-invariant gather gets hoisted out of
                # the fori_loop and a single-row reduce lets the simplifier
                # fold the gather to one row (both produced >HBM-peak
                # readings in earlier probe revisions)
                g = jnp.take(t, (idx + i) % n_rows, axis=0)
                if jnp.issubdtype(t.dtype, jnp.floating):
                    return acc + g.sum(axis=0)
                return acc ^ jax.lax.reduce(
                    g, jnp.uint32(0), jax.lax.bitwise_xor, (0,))
            return jax.lax.fori_loop(
                0, reps, body, jnp.zeros(t.shape[1:], t.dtype))
        out = run(table)
        np.asarray(out.reshape(-1)[:1])
        t0 = time.time()
        out = run(table)
        np.asarray(out.reshape(-1)[:1])
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt * 1e3:6.2f} ms  ({nbytes / dt / 1e9:5.0f} GB/s  "
              f"{Ep / dt / 1e6:5.0f} Midx/s)")

    for W in (32, 64, 128, 256):
        table = jnp.asarray(rng.integers(
            0, 1 << 32, size=(Vp + 1, W), dtype=np.uint32))
        nbytes = Ep * (W * 4 * 2 + 4)
        time_gather(f"random   W={W:3d}", table, in_src, nbytes)
    W = 128
    table = jnp.asarray(rng.integers(
        0, 1 << 32, size=(Vp + 1, W), dtype=np.uint32))
    nbytes = Ep * (W * 4 * 2 + 4)
    time_gather(f"sorted   W={W:3d}", table, in_src_sorted, nbytes)
    time_gather(f"tiny-tbl W={W:3d}", table[:4096], in_src % 4096, nbytes)
    # window locality inside the FULL-SIZE table: indices confined to a 2MB
    # row window in the middle — distinguishes "row caching helps" from
    # "XLA placed the small operand in VMEM"
    time_gather(f"window   W={W:3d}", table, in_src % 4096 + 196608, nbytes)

    # very wide rows at reduced index count (the chunked-expansion design:
    # only [C, W] stays live, so W can grow past the full-buffer HBM fit) —
    # does bytes/s keep climbing as rows reach 2-8 KB?
    for W in (512, 1024, 2048):
        n_idx = Ep // (W // 128)
        idx = in_src[:n_idx]
        table = jnp.asarray(rng.integers(
            0, 1 << 32, size=(Vp + 1, W), dtype=np.uint32))
        nbytes = n_idx * (W * 4 * 2 + 4)

        @jax.jit
        def run(t):
            def body(i, acc):
                g = jnp.take(t, (idx + i) % (Vp + 1), axis=0)
                return acc ^ jax.lax.reduce(
                    g, jnp.uint32(0), jax.lax.bitwise_xor, (0,))
            return jax.lax.fori_loop(
                0, reps, body, jnp.zeros(t.shape[1:], t.dtype))
        out = run(table)
        np.asarray(out.reshape(-1)[:1])
        t0 = time.time()
        out = run(table)
        np.asarray(out.reshape(-1)[:1])
        dt = (time.time() - t0) / reps
        print(f"wide     W={W:4d} ({n_idx / 1e6:.1f}M idx): {dt * 1e3:6.2f} ms"
              f"  ({nbytes / dt / 1e9:5.0f} GB/s  {n_idx / dt / 1e6:5.0f}"
              f" Midx/s)")


if __name__ == "__main__":
    main()
