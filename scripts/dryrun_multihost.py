"""Multi-host validation: two local processes form a 2-host x 4-chip mesh
(jax.distributed over a Gloo backend, virtual CPU devices) and run the
hierarchical distributed BFS — the DCN-aware exchange path of
make_dist_bfs_packed (ICI gather within a host, then the host axis).

Usage:
    python scripts/dryrun_multihost.py              # spawns 2 workers
    python scripts/dryrun_multihost.py --proc I     # worker I (internal)

Process 0 cross-checks results against the exact host mirror and prints
MULTIHOST_OK on success.
"""

import argparse
import os
import subprocess
import sys

PORT = int(os.environ.get("DUCKPGQ_MH_PORT", "49765"))
N_PROC = 2
CHIPS_PER_PROC = 4


def worker(proc_id: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from duckpgq_tpu.parallel.mesh import init_distributed, make_mesh_2d
    init_distributed(f"localhost:{PORT}", N_PROC, proc_id,
                     local_device_count=CHIPS_PER_PROC)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from duckpgq_tpu.parallel.dist_bfs import (make_dist_bfs_packed,
                                               partition_csr)

    n_shards = N_PROC * CHIPS_PER_PROC
    assert len(jax.devices()) == n_shards, len(jax.devices())
    mesh = make_mesh_2d(N_PROC, CHIPS_PER_PROC)

    rng = np.random.default_rng(5)
    v, e = 96, 420
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    sharded = partition_csr(v, src, dst, n_shards, balance=True)
    L = 64
    qs0 = rng.integers(0, v, size=L).astype(np.int64)
    qd0 = rng.integers(0, v, size=L).astype(np.int64)
    qs = sharded.map_queries(qs0).astype(np.int32)
    qd = sharded.map_queries(qd0).astype(np.int32)
    fn = make_dist_bfs_packed(mesh, sharded, L, max_iters=v)
    res, trav = fn(jnp.asarray(qs), jnp.asarray(qd),
                   jnp.ones(L, dtype=bool))
    got = np.asarray(jax.device_get(res))

    # PARTITIONED-frontier ring kernel across the host boundary (VERDICT
    # r2 item 8): a flat 1-D mesh over all 8 global devices — the
    # ppermute ring hops cross the process (DCN) boundary once per cycle
    from duckpgq_tpu.parallel.dist_bfs import (make_dist_bfs_partitioned,
                                               partition_csr_grouped)
    from duckpgq_tpu.parallel.mesh import make_mesh
    mesh1d = make_mesh(n_shards)
    grouped = partition_csr_grouped(v, src, dst, n_shards, balance=True)
    qs_g = grouped.map_queries(qs0).astype(np.int32)
    qd_g = grouped.map_queries(qd0).astype(np.int32)
    fn_part = make_dist_bfs_partitioned(mesh1d, grouped, L, max_iters=v)
    res_p, _ = fn_part(jnp.asarray(qs_g), jnp.asarray(qd_g),
                       jnp.ones(L, dtype=bool))
    got_p = np.asarray(jax.device_get(res_p))

    if proc_id == 0:
        from duckpgq_tpu.ops import msbfs as host_msbfs
        from duckpgq_tpu.ops.csr import build_csr
        csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
        want, valid = host_msbfs.iterative_length(csr, qs0, qd0)
        want = np.where(valid, want, -1)
        assert (got == want).all(), (got, want)
        assert (got_p == want).all(), (got_p, want)
        print("MULTIHOST_OK", flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--proc", type=int, default=None)
    args = parser.parse_args()
    if args.proc is not None:
        worker(args.proc)
        return
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--proc", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROC)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and "MULTIHOST_OK" in outs[0]
    for i, o in enumerate(outs):
        sys.stderr.write(f"--- proc {i} ---\n{o}\n")
    if not ok:
        sys.exit(1)
    print("MULTIHOST_OK")


if __name__ == "__main__":
    main()
