"""One-off wide-wave probe: build an RMAT graph on device, force a given
wave width/chunking, run the planned packed MS-BFS, print GTEPS.

Usage: SCALE=23 W=64 K=256 python scripts/bench_wide_probe.py
(Complements bench.py, whose auto planner budgets narrow widths
conservatively; this harness measures explicit plans for the BASELINE
capacity sweep. Reference analog: the 512-lane batching of
src/core/functions/scalar/iterativelength.cpp:73-78.)"""
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
from duckpgq_tpu.ops.msbfs_jax import (msbfs_lengths_packed_planned,
                                       plan_packed_wave)
from duckpgq_tpu.utils.rmat import rmat_edges_device


def main():
    scale = int(os.environ.get("SCALE", "23"))
    ef = int(os.environ.get("EF", "16"))
    W = int(os.environ.get("W", "64"))
    K = int(os.environ.get("K", "256"))
    max_iters = int(os.environ.get("MAX_ITERS", "16"))
    runs = int(os.environ.get("RUNS", "2"))
    v = 1 << scale
    t0 = time.time()
    src_d, dst_d = rmat_edges_device(scale, ef, seed=11)
    csr = build_lengths_csr_on_device(v, src_d, dst_d)
    print(f"# build {time.time()-t0:.1f}s", file=sys.stderr)
    plan = plan_packed_wave(csr, lanes=W * 32, n_chunks=K)
    print(f"# plan lanes={plan.lanes} W={plan.lanes//32} K={plan.n_chunks} "
          f"bmax={plan.bmax}", file=sys.stderr)
    rng = np.random.default_rng(7)
    lanes = plan.lanes
    qs = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    act = jnp.ones(lanes, bool)

    def once():
        r, trav = msbfs_lengths_packed_planned(
            csr, plan, qs, qd, act, max_iters, False)
        return np.asarray(r), float(np.asarray(trav).sum())

    t0 = time.time()
    _, tr = once()
    print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(runs):
        t0 = time.time()
        _, tr = once()
        times.append(time.time() - t0)
    el = sorted(times)[len(times) // 2]
    print(json.dumps({"scale": scale, "W": plan.lanes // 32,
                      "K": plan.n_chunks, "max_iters": max_iters,
                      "runs": [round(t, 3) for t in times],
                      "gteps": round(tr / el / 1e9, 3)}))


if __name__ == "__main__":
    main()
