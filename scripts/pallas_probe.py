"""Bring-up probe for the Pallas BFS expansion kernel at bench shapes.

Run AFTER the device queue is free (never kill mid-compile). Logs to
scripts/pallas_probe.log.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(__file__), "pallas_probe.log")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    import numpy as np

    import jax

    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from duckpgq_tpu.kernels.bfs_pallas import PallasBFS, pack_csr
    from duckpgq_tpu.ops.csr import build_csr
    from duckpgq_tpu.ops import msbfs as host_msbfs
    from duckpgq_tpu.utils.rmat import rmat_edges

    scale = int(os.environ.get("PROBE_SCALE", "14"))
    lanes = int(os.environ.get("PROBE_LANES", "128"))
    src, dst = rmat_edges(scale, 16, seed=11)
    v = 1 << scale
    log(f"=== pallas probe scale={scale} lanes={lanes} "
        f"dev={jax.devices()[0]}")
    t0 = time.time()
    packed = pack_csr(v, src, dst)
    log(f"pack: {time.time() - t0:.1f}s tiles={packed.n_tiles} T={packed.T}")

    rng = np.random.default_rng(7)
    qs = rng.integers(0, v, size=lanes).astype(np.int64)
    qd = rng.integers(0, v, size=lanes).astype(np.int64)
    bfs = PallasBFS(packed, lanes=lanes)
    max_iters = int(os.environ.get("PROBE_MAX_ITERS", "16"))
    t0 = time.time()
    res, trav = bfs.run(qs, qd, max_iters=max_iters)
    log(f"first (compile+run): {time.time() - t0:.1f}s")
    t0 = time.time()
    res, trav = bfs.run(qs, qd, max_iters=max_iters)
    dt = time.time() - t0
    log(f"cached run: {dt:.3f}s traversed={trav / 1e6:.1f}M "
        f"gteps={trav / dt / 1e9:.3f}")

    # correctness spot-check vs host
    if v <= (1 << 15):
        csr = build_csr(v, src, dst, np.arange(len(src), dtype=np.int64))
        want, valid = host_msbfs.iterative_length(csr, qs, qd)
        ok = (res == np.where(valid, want, -1))
        # depth-bounded run: only compare lanes resolved within max_iters
        cmp = valid & (want <= max_iters) | ~valid
        log(f"match (within depth): {bool(ok[cmp & (want <= max_iters)].all())}")
    log("=== done")


if __name__ == "__main__":
    main()
