"""Decompose the packed-BFS iteration cost on the live backend.

Times three on-device loops (each N reps inside ONE dispatch, so tunnel RTT
is amortized): the frontier gather, gather+segmented-OR-scan, and the full
BFS body. Prints per-rep milliseconds and effective HBM bandwidth.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    scale = int(os.environ.get("BENCH_SCALE", "16"))
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    reps = int(os.environ.get("PROF_REPS", "32"))

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from duckpgq_tpu.kernels.segscan_pallas import seg_or_scan_rows
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import _in_segments
    from duckpgq_tpu.ops.segscan import segment_or_sorted_rows
    from duckpgq_tpu.utils.rmat import rmat_edges

    src, dst = rmat_edges(scale, 16, seed=11)
    v = 1 << scale
    csr = build_device_csr(v, src, dst)
    Vp, Ep, W = csr.vpad, csr.epad, lanes // 32
    heads, last_pos, has_in = _in_segments(csr)
    heads = jax.device_put(heads)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(
        rng.integers(0, 1 << 32, size=(W, Vp + 1), dtype=np.uint32))
    print(f"# scale={scale} Vp={Vp} Ep={Ep} W={W} reps={reps} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    scan_chunk = 1
    while scan_chunk * 2 <= min(Ep, 512) and Ep % (scan_chunk * 2) == 0:
        scan_chunk *= 2

    def loop(fn):
        @jax.jit
        def run(f0):
            def body(i, f):
                out = fn(f)
                # fold output back so iterations chain (no DCE)
                return (f ^ out[:, : Vp + 1]) | f
            return jax.lax.fori_loop(0, reps, body, f0)
        return run

    def time_it(name, fn, nbytes):
        run = loop(fn)
        out = run(frontier)
        np.asarray(out[0, :2])          # sync
        t0 = time.time()
        out = run(frontier)
        np.asarray(out[0, :2])
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt * 1e3:.2f} ms/rep  "
              f"({nbytes / dt / 1e9:.0f} GB/s effective)")

    in_src = csr.in_src

    def gather_only(f):
        g = jnp.take(f, in_src, axis=1)            # [W, Ep]
        return g[:, : Vp + 1]

    def gather_scan(f):
        g = jnp.take(f, in_src, axis=1)
        s = seg_or_scan_rows(g, heads, chunk=scan_chunk)
        return s[:, : Vp + 1]

    def gather_scan_xla(f):
        g = jnp.take(f, in_src, axis=1)
        s = segment_or_sorted_rows(g, heads, last_pos, has_in)  # [W, Vp]
        return jnp.concatenate([s, jnp.zeros((W, 1), jnp.uint32)], axis=1)

    def full_ext(f):
        g = jnp.take(f, in_src, axis=1)
        s = seg_or_scan_rows(g, heads, chunk=scan_chunk)
        ext = jnp.where(has_in[None, :], s[:, last_pos], jnp.uint32(0))
        return jnp.concatenate([ext, jnp.zeros((W, 1), jnp.uint32)], axis=1)

    def row_gather(f):
        fT = f.T                                   # [Vp+1, W]
        g = fT[in_src]                             # [Ep, W] row gather
        return g[: Vp + 1].T

    def row_gather_notranspose(f):
        # frontier already row-major: time the row gather alone
        fT = jnp.swapaxes(f, 0, 1)
        g = jnp.take(fT, in_src, axis=0)
        return jnp.swapaxes(g[: Vp + 1], 0, 1)

    # ---- edge-major variants: frontier [Vp+1, W] (vertex rows contiguous:
    # one 4*W-byte read per edge instead of W strided 4-byte reads), scan
    # along sublanes over [Ep, W] blocks (full lane tiling when W == 128)
    from duckpgq_tpu.kernels.segscan_pallas import seg_or_scan_packed
    frontier_vm = jnp.asarray(np.ascontiguousarray(np.asarray(frontier).T))
    heads_e = jax.device_put(np.asarray(heads))

    def loop_vm(fn):
        @jax.jit
        def run(f0):
            def body(i, f):
                out = fn(f)
                return (f ^ out[: Vp + 1]) | f
            return jax.lax.fori_loop(0, reps, body, f0)
        return run

    def time_vm(name, fn, nbytes):
        run = loop_vm(fn)
        out = run(frontier_vm)
        np.asarray(out[0, :1])
        t0 = time.time()
        out = run(frontier_vm)
        np.asarray(out[0, :1])
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt * 1e3:.2f} ms/rep  "
              f"({nbytes / dt / 1e9:.0f} GB/s effective)")

    def em_gather(f):
        g = jnp.take(f, in_src, axis=0)            # [Ep, W] contiguous rows
        return g[: Vp + 1]

    def em_gather_scan(f):
        g = jnp.take(f, in_src, axis=0)
        s = seg_or_scan_packed(g, heads_e, chunk=scan_chunk)
        return s[: Vp + 1]

    def em_full(f):
        g = jnp.take(f, in_src, axis=0)
        s = seg_or_scan_packed(g, heads_e, chunk=scan_chunk)
        ext = jnp.where(has_in[:, None], s[last_pos], jnp.uint32(0))
        return jnp.concatenate([ext, jnp.zeros((1, W), jnp.uint32)], axis=0)

    WB = W * 4
    time_it("gather          ", gather_only, Ep * (WB + 4))
    time_it("row gather      ", row_gather, Ep * (2 * WB + 4))
    time_it("gather+scan     ", gather_scan, Ep * (3 * WB + 4))
    time_it("gather+scan(xla)", gather_scan_xla, Ep * (3 * WB + 4))
    time_it("full expansion  ", full_ext, Ep * (3 * WB + 4) + Vp * WB)
    time_vm("em gather       ", em_gather, Ep * (WB + 4))
    time_vm("em gather+scan  ", em_gather_scan, Ep * (3 * WB + 4))
    time_vm("em full         ", em_full, Ep * (3 * WB + 4) + Vp * WB)


if __name__ == "__main__" and os.environ.get("PROF_MODE") != "chunks":
    main()


def chunk_sweep():
    """Time full expansion across scan chunk sizes (grid-step overhead vs
    log-depth roll cost)."""
    scale = int(os.environ.get("BENCH_SCALE", "16"))
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    reps = int(os.environ.get("PROF_REPS", "32"))
    import jax
    import jax.numpy as jnp
    cache_dir = os.environ.get("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from duckpgq_tpu.kernels.segscan_pallas import seg_or_scan_rows
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import _in_segments
    from duckpgq_tpu.utils.rmat import rmat_edges
    src, dst = rmat_edges(scale, 16, seed=11)
    v = 1 << scale
    csr = build_device_csr(v, src, dst)
    Vp, Ep, W = csr.vpad, csr.epad, lanes // 32
    heads, last_pos, has_in = _in_segments(csr)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(
        rng.integers(0, 1 << 32, size=(W, Vp + 1), dtype=np.uint32))
    in_src = csr.in_src

    for chunk in (256, 512, 1024, 2048, 4096):
        if Ep % chunk:
            continue

        def full_ext(f, c=chunk):
            g = jnp.take(f, in_src, axis=1)
            s = seg_or_scan_rows(g, heads, chunk=c)
            ext = jnp.where(has_in[None, :], s[:, last_pos], jnp.uint32(0))
            return jnp.concatenate([ext, jnp.zeros((W, 1), jnp.uint32)],
                                   axis=1)

        @jax.jit
        def run(f0, c=chunk):
            def body(i, f):
                out = full_ext(f, c)
                return (f ^ out) | f
            return jax.lax.fori_loop(0, reps, body, f0)

        out = run(frontier)
        np.asarray(out[0, :2])
        t0 = time.time()
        out = run(frontier)
        np.asarray(out[0, :2])
        dt = (time.time() - t0) / reps
        print(f"chunk {chunk:5d}: {dt * 1e3:.2f} ms/rep")


if __name__ == "__main__" and os.environ.get("PROF_MODE") == "chunks":
    chunk_sweep()
