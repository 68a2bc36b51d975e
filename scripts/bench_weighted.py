"""Weighted shortest-path (multi-source Bellman-Ford) throughput at RMAT
scale — the BASELINE config-3 "weighted shortest-path join" headline the
round-1 VERDICT flagged as missing.

Runs the device dense-relaxation kernel (ops/msbfs_jax.bellman_ford — the
SQL path behind cheapest_path_length) on an RMAT graph with uniform random
float32 weights, depth-bounded like the BFS headline (SQL/PGQ quantifier
workloads are depth-bounded). Accounting: every iteration relaxes all E
in-edges for every active lane, so throughput = E * iters * L / t
edge-relaxations per second (GRPS).

Prints one JSON line per measured config on stdout.

Env: BENCH_SCALE (default 18), BENCH_LANES (256), BENCH_MAX_ITERS (16),
BENCH_RUNS (3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.environ.get("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except (OSError, AttributeError):
        pass
    import jax.numpy as jnp

    from duckpgq_tpu.ops.csr_jax import (build_device_csr,
                                         build_weighted_bf_csr_on_device)
    from duckpgq_tpu.ops.msbfs_jax import (bellman_ford_sparse,
                                           bellman_ford_with_iters)
    from duckpgq_tpu.utils.rmat import rmat_edges, rmat_edges_device

    scale = int(os.environ.get("BENCH_SCALE", "18"))
    lanes = int(os.environ.get("BENCH_LANES", "256"))
    max_iters = int(os.environ.get("BENCH_MAX_ITERS", "16"))
    runs = int(os.environ.get("BENCH_RUNS", "3"))

    rng = np.random.default_rng(7)
    v = 1 << scale
    accel = jax.devices()[0].platform != "cpu"
    graph_src = os.environ.get("BENCH_GRAPH", "device" if accel else "host")
    t0 = time.time()
    if graph_src == "device":
        # generate edges AND weights on device (the tunneled link moves
        # bulk data at ~0.1 MB/s; see bench.py)
        src_d, dst_d = rmat_edges_device(scale, 16, seed=11)
        e = int(src_d.shape[0])
        w_d = jax.jit(lambda k: jax.random.uniform(
            k, (e,), minval=0.5, maxval=9.5))(jax.random.PRNGKey(99))
        csr = build_weighted_bf_csr_on_device(v, src_d, dst_d, w_d)
    else:
        src, dst = rmat_edges(scale, 16, seed=11)
        e = len(src)
        w = rng.uniform(0.5, 9.5, size=e).astype(np.float32)
        csr = build_device_csr(v, src, dst, w=w)
    csr.in_src.block_until_ready()
    print(f"# graph: RMAT scale={scale} V={v} E={e} lanes={lanes} "
          f"iters<={max_iters} graph_src={graph_src} "
          f"device={jax.devices()[0]}", file=sys.stderr)
    print(f"# csr build: {time.time() - t0:.1f}s", file=sys.stderr)

    qs = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    active = jnp.ones(lanes, dtype=bool)

    # dense is the right default at the RMAT-18 bench scale: its
    # [Ep, L] sweep runs 0.33 s/round, under the sparse rounds' fixed
    # sort cost (measured 2026-08-21: sparse 14.6 s vs dense 3.6 s to
    # fixpoint). The sparse kernel is for bigger graphs, where the
    # dense sweep itself is seconds per round.
    use_sparse = os.environ.get("BENCH_BF_SPARSE", "0") == "1"
    bf = bellman_ford_sparse if use_sparse else bellman_ford_with_iters
    t0 = time.time()
    costs, it = bf(csr, qs, qd, active, max_iters)
    costs_np = np.asarray(costs)
    iters_actual = int(np.asarray(it))
    if use_sparse and e * lanes * 4 * 3 <= (6 << 30):
        # cross-check vs the monolithic dense kernel — only where its
        # ~3 [Ep, L] buffers fit (the chunked path is itself
        # bit-identity-tested in tests/test_device_kernels.py)
        dcosts, dit = bellman_ford_with_iters(csr, qs, qd, active,
                                              max_iters)
        assert (np.asarray(dcosts) == costs_np).all()
        assert int(np.asarray(dit)) == iters_actual
    print(f"# warmup (compile): {time.time() - t0:.1f}s", file=sys.stderr)
    reached = float(np.isfinite(costs_np).mean())

    if os.environ.get("BENCH_CHECK_REACHABLE", "0") == "1":
        # fixpoint proof: a pair gets a finite cost iff it is BFS-reachable
        # (VERDICT r2 item 7 "~100% of reachable pairs resolved")
        from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths
        lengths, _ = msbfs_lengths(csr, qs, qd, active,
                                   max_iters=int(np.ceil(np.log2(v))) * 4)
        bfs_reach = np.asarray(lengths) >= 0
        agree = float((bfs_reach == np.isfinite(costs_np)).mean())
        print(f"# reachability cross-check: BFS-reachable "
              f"{bfs_reach.mean():.3f}, agreement {agree:.4f}",
              file=sys.stderr)

    times = []
    for _ in range(runs):
        t0 = time.time()
        np.asarray(bf(csr, qs, qd, active, max_iters)[0])
        times.append(time.time() - t0)
    t = sorted(times)[len(times) // 2]
    # throughput over rounds actually executed (the kernel exits at
    # fixpoint, so max_iters would overstate work; ADVICE r2)
    relax = e * iters_actual * lanes
    print(f"# runs: {['%.3f' % x for x in times]}s; reached {reached:.2f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"bellman_ford_grps_s{scale}",
        "value": round(relax / t / 1e9, 3),
        "unit": "G edge-relaxations/s",
        "detail": {"seconds": round(t, 4), "lanes": lanes,
                   "iters": iters_actual, "iters_cap": max_iters,
                   "kernel": "sparse" if use_sparse else "dense",
                   "reached_frac": round(reached, 3)}}))


if __name__ == "__main__":
    main()
