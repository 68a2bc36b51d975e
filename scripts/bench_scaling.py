"""Scaling-efficiency harness (BASELINE.md north star: >=70% at 4 hosts).

Runs the distributed packed MS-BFS (parallel/dist_bfs.py) at mesh sizes
1/2/4/8 over the SAME graph and query wave (strong scaling) and reports
throughput + efficiency per size.

On a real TPU slice this measures true ICI scaling. On this environment
(one tunneled chip) it runs on a virtual CPU mesh where every "device"
shares the host cores, so perfect strong scaling shows as FLAT wall time;
efficiency is reported as t(1)/t(N) — the orchestration + exchange + padding
overhead the distribution layer adds — alongside the analytic per-iteration
all_gather volume that would ride ICI on hardware (v5e ICI ~45 GB/s/link per
direction is >100x the per-iteration exchange at these shapes, so the
overhead term measured here is the dominant unknown).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    # virtual CPU mesh (the TPU plugin would otherwise claim the backend)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import make_dist_bfs_packed, \
        partition_csr
    from duckpgq_tpu.parallel.mesh import make_mesh
    from duckpgq_tpu.utils.rmat import rmat_edges

    scale = int(os.environ.get("BENCH_SCALE", "16"))
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    max_iters = int(os.environ.get("BENCH_MAX_ITERS", "16"))
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    src, dst = rmat_edges(scale, 16, seed=11)
    v = 1 << scale
    rng = np.random.default_rng(7)
    qs = rng.integers(0, v, size=lanes).astype(np.int32)
    qd = rng.integers(0, v, size=lanes).astype(np.int32)
    active = jnp.ones(lanes, dtype=bool)
    print(f"# graph: RMAT scale={scale} V={v} E={len(src)} lanes={lanes} "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    from duckpgq_tpu.parallel.dist_bfs import (make_dist_bfs_partitioned,
                                               partition_csr_grouped)

    impls = os.environ.get("BENCH_DIST_IMPL", "packed,partitioned").split(",")
    results = {}
    base_lengths = None
    for impl in impls:
        for n in (1, 2, 4, 8):
            if n > len(jax.devices()):
                break
            mesh = make_mesh(n)
            if impl == "partitioned":
                grouped = partition_csr_grouped(v, src, dst, n, balance=True)
                fn = make_dist_bfs_partitioned(mesh, grouped, lanes,
                                               max_iters)
                mapper = grouped
                # ring kernel buffers: cur/acc/seen [W, Vs] + the [W, Eg]
                # group gather — O(V/N) per shard
                W = lanes // 32
                mem = (3 * grouped.v_shard +
                       2 * grouped.in_src_local.shape[2]) * W * 4
                exch = grouped.v_shard * W * 4 * (n - 1)  # ring hops/iter
            else:
                sharded = partition_csr(v, src, dst, n, balance=True)
                fn = make_dist_bfs_packed(mesh, sharded, lanes, max_iters)
                mapper = sharded
                W = lanes // 32
                mem = (sharded.v_padded + 2 * sharded.v_shard +
                       2 * sharded.in_src.shape[1]) * W * 4
                exch = sharded.v_padded * W * 4
            mqs = jnp.asarray(mapper.map_queries(qs))
            mqd = jnp.asarray(mapper.map_queries(qd))
            lengths, trav = fn(mqs, mqd, active)
            lengths = np.asarray(lengths)             # warm + sync
            total_trav = float(np.asarray(trav).sum())
            if base_lengths is None:
                base_lengths = lengths
            else:
                np.testing.assert_array_equal(lengths, base_lengths)
            times = []
            for _ in range(runs):
                t0 = time.time()
                out, _ = fn(mqs, mqd, active)
                np.asarray(out)
                times.append(time.time() - t0)
            t = sorted(times)[len(times) // 2]
            results[impl, n] = t
            print(json.dumps({
                "metric": f"dist_bfs_{impl}_{n}dev",
                "value": round(total_trav / t / 1e9, 3), "unit": "GTEPS",
                "detail": {"seconds": round(t, 4),
                           "exchange_bytes_per_iter": exch,
                           "frontier_bytes_per_shard": mem}}))

    for impl in impls:
        if (impl, 1) in results:
            for n in (2, 4, 8):
                if (impl, n) in results:
                    eff = results[impl, 1] / results[impl, n]
                    print(json.dumps({
                        "metric": f"strong_scaling_efficiency_{impl}_{n}dev",
                        "value": round(eff, 3), "unit": "t1/tN",
                        "detail": {"note": "virtual CPU mesh: devices share "
                                   "host cores; 1.0 = distribution layer "
                                   "adds no overhead"}}))


if __name__ == "__main__":
    main()
