"""Measure the round-4 DCN levers on the virtual CPU mesh:

1. compressed-frontier ring exchange (tiered payload budgets) — exact
   per-iteration exchanged words vs the dense ring;
2. 2-D (vertex x edge) grid BFS — per-chip words vs the 1-D ring at the
   same device count.

The wall-clock on a virtual CPU mesh is meaningless (every "link" is a
memcpy); the deliverable is the EXACT byte accounting that feeds
BASELINE.md's multi-host projection. Results are asserted bit-identical
to the dense partitioned kernel.

Env: BENCH_SCALE (default 16), BENCH_LANES (512), BENCH_SHARDS (8),
BENCH_MAX_ITERS (16), BENCH_DIVS (2,8,64).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=16")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax                                                  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np                                          # noqa: E402
import jax.numpy as jnp                                     # noqa: E402
from jax.sharding import Mesh                               # noqa: E402


def main():
    from duckpgq_tpu.parallel.dist_bfs import (
        make_dist_bfs_partitioned, make_dist_bfs_partitioned_compressed,
        partition_csr_grouped)
    from duckpgq_tpu.parallel.dist_bfs_2d import make_dist_bfs_2d
    from duckpgq_tpu.utils.rmat import rmat_edges

    scale = int(os.environ.get("BENCH_SCALE", "16"))
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    nx = int(os.environ.get("BENCH_SHARDS", "8"))
    iters = int(os.environ.get("BENCH_MAX_ITERS", "16"))
    divs = tuple(int(x) for x in
                 os.environ.get("BENCH_DIVS", "2,8,64").split(","))

    src, dst = rmat_edges(scale, 16, seed=11)
    v = 1 << scale
    W = lanes // 32
    rng = np.random.default_rng(7)
    qs0 = rng.integers(0, v, size=lanes)
    qd0 = rng.integers(0, v, size=lanes)
    act = jnp.ones(lanes, bool)

    # ---- 1-D ring: dense vs tiered-compressed ----
    mesh1 = Mesh(np.array(jax.devices()[:nx]), ("x",))
    grouped = partition_csr_grouped(v, src, dst, nx, balance=True)
    qs = jnp.asarray(grouped.map_queries(qs0).astype(np.int32))
    qd = jnp.asarray(grouped.map_queries(qd0).astype(np.int32))
    Vs = grouped.v_shard
    want, _ = make_dist_bfs_partitioned(mesh1, grouped, lanes, iters)(
        qs, qd, act)
    fn = make_dist_bfs_partitioned_compressed(mesh1, grouped, lanes,
                                              iters, budget_div=divs)
    got, _, words = fn(qs, qd, act)
    assert (np.asarray(got) == np.asarray(want)).all()
    words = np.asarray(words)
    used = words[1:][words[1:] > 0]
    dense_per = (nx - 1) * W * Vs
    factor = used.sum() / (len(used) * dense_per)
    print(f"# ring iters={len(used)} per-iter words={used.tolist()} "
          f"(dense={dense_per})", file=sys.stderr)
    print(json.dumps({
        "metric": "dcn_compressed_exchange_factor", "value": round(
            float(factor), 4), "unit": "ratio vs dense ring",
        "detail": {"scale": scale, "lanes": lanes, "shards": nx,
                   "divs": list(divs),
                   "per_iter_words": used.tolist(),
                   "dense_per_iter": int(dense_per)}}))

    # ---- 2-D grid vs 1-D ring at the same device count ----
    import math
    r = int(math.isqrt(len(jax.devices())))
    if r >= 2:
        n2 = r * r
        mesh2 = Mesh(np.array(jax.devices()[:n2]).reshape(r, r),
                     ("row", "col"))
        g2 = partition_csr_grouped(v, src, dst, r, balance=True)
        fn2 = make_dist_bfs_2d(mesh2, g2, lanes, iters)
        qs2 = jnp.asarray(g2.map_queries(qs0).astype(np.int32))
        qd2 = jnp.asarray(g2.map_queries(qd0).astype(np.int32))
        got2, _, w2 = fn2(qs2, qd2, act)
        assert (np.asarray(got2) == np.asarray(want)).all()
        w2 = np.asarray(w2)
        per2 = int(w2[w2 > 0][0])
        # 1-D ring at n2 shards for the apples-to-apples denominator
        g1 = partition_csr_grouped(v, src, dst, n2, balance=True)
        per1 = (n2 - 1) * W * g1.v_shard
        print(json.dumps({
            "metric": "dcn_2d_exchange_factor",
            "value": round(per2 / per1, 4),
            "unit": f"ratio vs 1-D ring at {n2} devices",
            "detail": {"grid": f"{r}x{r}",
                       "per_iter_words_2d": per2,
                       "per_iter_words_1d": int(per1)}}))


if __name__ == "__main__":
    main()
