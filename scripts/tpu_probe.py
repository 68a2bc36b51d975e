"""One-shot TPU kernel measurement: compile vs exec per kernel/shape.

Appends timestamped lines to scripts/tpu_probe.log. Run in background; never
kill mid-compile (the axon server keeps executing orphaned programs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(__file__), "tpu_probe.log")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_LOCAL_CACHE",
                               "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths, msbfs_lengths_packed
    from duckpgq_tpu.utils.rmat import rmat_edges

    scale = int(os.environ.get("PROBE_SCALE", "14"))
    L = int(os.environ.get("PROBE_LANES", "512"))
    log(f"=== probe scale={scale} L={L} dev={jax.devices()[0]} "
        f"cache={cache_dir}")

    src, dst = rmat_edges(scale, 16, seed=11)
    v = 1 << scale
    t0 = time.time()
    csr = build_device_csr(v, src, dst)
    np.asarray(csr.offsets[:2])
    log(f"csr build+sync: {time.time() - t0:.1f}s (V={v} E={len(src)})")

    rng = np.random.default_rng(7)
    qs = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    act = jnp.ones(L, dtype=bool)

    for name, fn in (("packed", msbfs_lengths_packed),
                     ("dense", msbfs_lengths)):
        for mi in (4, 16):
            t0 = time.time()
            r, t = fn(csr, qs, qd, act, mi)
            np.asarray(r)
            log(f"{name} mi={mi} first(compile+run): {time.time() - t0:.1f}s")
            t0 = time.time()
            r, t = fn(csr, qs, qd, act, mi)
            np.asarray(r)
            dt = time.time() - t0
            trav = float(np.asarray(t).sum())
            log(f"{name} mi={mi} cached run: {dt:.3f}s "
                f"traversed={trav / 1e6:.1f}M gteps={trav / dt / 1e9:.3f}")
    log("=== done")


if __name__ == "__main__":
    main()
