"""Benchmark driver: MS-BFS GTEPS per chip on an R-MAT power-law graph.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.md north star of 1 GTEPS/chip (the reference
publishes no numbers of its own).

TEPS accounting is graph500-style: for each BFS lane, every out-edge of
every visited vertex counts once; GTEPS = total traversed edges / wall time.
Run on whatever backend JAX selects (the real TPU under the driver).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    # scale 18 (262k V, 4.2M E): the headline config (BASELINE.md sweep
    # covers 16-21; the chunked planner keeps >25 GTEPS through RMAT-20)
    scale = int(os.environ.get("BENCH_SCALE", "18"))
    edge_factor = int(os.environ.get("BENCH_EDGE_FACTOR", "16"))
    # "auto": plan_packed_wave picks the widest HBM-feasible wave. The
    # frontier gather is index-rate-bound (scripts/gather_probe.py), so
    # per-lane cost keeps dropping as rows widen; the chunked expansion
    # streams [Ec, W] edge super-chunks so width is capped by the resident
    # [Vp, W] vertex state, not the [Ep, W] working set (BASELINE.md sweep)
    lanes_env = os.environ.get("BENCH_LANES", "auto")
    batches = int(os.environ.get("BENCH_BATCHES", "1"))
    kernel = os.environ.get("BENCH_KERNEL", "packed")

    import jax
    import jax.numpy as jnp

    # the Pallas single-pass segmented scan is ~3x the XLA associative scan
    # on TPU and compiles in seconds; tests use the XLA scan on CPU
    if "DUCKPGQ_SCAN_IMPL" not in os.environ and \
            jax.devices()[0].platform != "cpu":
        os.environ["DUCKPGQ_SCAN_IMPL"] = "pallas"

    # persistent local compilation cache: first-time XLA compiles on this
    # backend can take minutes; cached executables load in seconds
    cache_dir = os.environ.get("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache EVERYTHING: the compile helper is a shared 2-core local
        # subprocess — even sub-second compiles become queue-minutes when
        # it is busy, so skipping "cheap" compiles is never worth it
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except (OSError, AttributeError):
        pass

    from duckpgq_tpu.ops.csr_jax import (build_device_csr,
                                         build_lengths_csr_on_device)
    from duckpgq_tpu.ops.msbfs_jax import (msbfs_lengths,
                                           msbfs_lengths_packed,
                                           msbfs_lengths_packed_multi)
    from duckpgq_tpu.utils.rmat import rmat_edges, rmat_edges_device

    # graph source: "device" generates the RMAT edges AND builds the CSR on
    # the accelerator (graph500 allows generation + construction on the
    # compute side). The environment's host<->device tunnel moves bulk data
    # at ~0.1 MB/s, so shipping a host edge list costs 5-8 MINUTES at
    # scale 18 while the device path costs seconds; "host" remains for
    # exactness cross-checks (tests run both on CPU and compare).
    accel = jax.devices()[0].platform != "cpu"
    graph_src = os.environ.get("BENCH_GRAPH", "device" if accel else "host")
    rng = np.random.default_rng(7)
    v = 1 << scale
    max_iters = int(os.environ.get("BENCH_MAX_ITERS", "16"))
    if kernel == "pallas":
        src, dst = rmat_edges(scale, edge_factor, seed=11)
        lanes = 8192 if lanes_env == "auto" else int(lanes_env)
        _bench_pallas(v, src, dst, lanes, batches, max_iters, rng)
        return
    t0 = time.time()
    n_runs = int(os.environ.get("BENCH_CSR_RUNS", "0")) or \
        (4 if scale >= 26 and graph_src == "device" else 0)
    if graph_src == "device" and n_runs:
        # RMAT-26-class: the monolithic [Ep] pair sort needs ~20 GB
        # (BASELINE.md round-4 campaign); build a multi-run CSR and run
        # the multi-run wave instead
        _bench_runs_csr(scale, edge_factor, v, n_runs, max_iters, rng, t0)
        return
    if graph_src == "device":
        src_d, dst_d = rmat_edges_device(scale, edge_factor, seed=11)
        e = int(src_d.shape[0])
        if scale >= 25:
            # stage-isolating scalar syncs: everything up to the first
            # D2H is async, so a worker crash otherwise surfaces at an
            # unrelated later pull (the RMAT-25 campaign lost two runs
            # to exactly that ambiguity)
            np.asarray(src_d[:1])
            print(f"# gen synced: {time.time() - t0:.3f}s",
                  file=sys.stderr)
        csr = build_lengths_csr_on_device(v, src_d, dst_d)
        if scale >= 22:
            # SLIM the wave CSR (round 5): packed head bits + prebuilt
            # out_dst replace in_dst, freeing 4*Ep bytes the planner
            # converts into wave width at the [Vp, W]-state-bound scales
            from duckpgq_tpu.ops.csr_jax import csr_slim_waves
            csr = csr_slim_waves(csr)
        if scale >= 25:
            np.asarray(csr.in_offsets[-1:])
            print(f"# build synced: {time.time() - t0:.3f}s",
                  file=sys.stderr)
    else:
        src, dst = rmat_edges(scale, edge_factor, seed=11)
        e = len(src)
        # lengths_only: ship the 2 edge arrays the BFS kernels read. Sync
        # via block_until_ready ONLY: any compiled op or D2H pull here
        # stalls behind the shared compile helper / slow pull path
        csr = build_device_csr(v, src, dst, lengths_only=True)
        csr.in_dst.block_until_ready()
        csr.in_src.block_until_ready()
    build_s = time.time() - t0
    print(f"# graph: RMAT scale={scale} V={v} E={e} kernel={kernel} "
          f"graph_src={graph_src} device={jax.devices()[0]}",
          file=sys.stderr)
    print(f"# csr build: {build_s:.3f}s "
          f"({e / max(build_s, 1e-9) / 1e6:.1f} Medges/s)", file=sys.stderr)

    from duckpgq_tpu.ops.msbfs_jax import (max_packed_lanes,
                                           msbfs_lengths_packed_planned,
                                           plan_packed_wave)
    chunks_env = os.environ.get("BENCH_CHUNKS")
    plan = None
    if kernel == "packed" and lanes_env == "auto":
        plan = plan_packed_wave(
            csr, n_chunks=int(chunks_env) if chunks_env else None)
        lanes = plan.lanes
    elif kernel == "packed" and int(lanes_env) % 4096 == 0:
        lanes = int(lanes_env)
        plan = plan_packed_wave(
            csr, lanes=lanes,
            n_chunks=int(chunks_env) if chunks_env else None)
        lanes = plan.lanes  # narrow fallback when the wide wave can't fit
    else:
        # narrow / non-packed wave: fit to the single-dispatch limit
        lanes = 8192 if lanes_env == "auto" else int(lanes_env)
        fit = max_packed_lanes(csr)
        if lanes > fit:
            total = lanes * batches
            lanes = fit
            batches = max(1, total // lanes)
            print(f"# lanes narrowed to {lanes} x {batches} batches "
                  f"(HBM fit)", file=sys.stderr)
    if plan is not None:
        print(f"# wave plan: {plan.lanes} lanes (W={plan.lanes // 32}), "
              f"{plan.n_chunks} chunks (bmax={plan.bmax})", file=sys.stderr)

    # Depth-bounded MS-BFS: SQL/PGQ path queries are quantifier-bounded
    # (MATCH ...->{1,k}), so depth-16 bounded search is the production
    # workload; full-traversal tails (graph eccentricity) are future work
    # via a sparse-frontier mode.
    qs_all = rng.integers(0, v, size=(batches, lanes)).astype(np.int32)
    qd_all = rng.integers(0, v, size=(batches, lanes)).astype(np.int32)
    active = jnp.ones(lanes, dtype=bool)
    use_pallas = os.environ.get("DUCKPGQ_SCAN_IMPL", "xla") == "pallas"

    if kernel == "packed" and plan is not None and plan.n_chunks > 1:
        # chunked wide wave: one dispatch per batch (each runs ~seconds, so
        # host RTT is already amortized)
        def run_all():
            res, total = [], 0.0
            for b in range(batches):
                r, trav = msbfs_lengths_packed_planned(
                    csr, plan, jnp.asarray(qs_all[b]),
                    jnp.asarray(qd_all[b]), active, max_iters, use_pallas)
                res.append(np.asarray(r))
                total += float(np.asarray(trav).sum())
            return np.concatenate(res), total
    elif kernel == "packed":
        # all batches in ONE device dispatch (lax.map) — host/tunnel RTT
        # otherwise dominates sub-100ms waves
        def run_all():
            res, trav = msbfs_lengths_packed_multi(
                csr, jnp.asarray(qs_all), jnp.asarray(qd_all), active,
                max_iters, use_pallas)
            return np.asarray(res), float(np.asarray(trav).sum())
    else:
        def run_all():
            total = 0.0
            for b in range(batches):
                res, trav = msbfs_lengths(
                    csr, jnp.asarray(qs_all[b]), jnp.asarray(qd_all[b]),
                    active, max_iters)
                total += float(np.asarray(trav).sum())
            return np.asarray(res), total

    # warm up (compile)
    t0 = time.time()
    run_all()
    print(f"# warmup (compile): {time.time() - t0:.1f}s", file=sys.stderr)

    # median of 3 timed runs: the shared tunnel TPU shows 2-3x run-to-run
    # variance, and the driver samples this once per round
    times, travs = [], []
    for _ in range(int(os.environ.get("BENCH_RUNS", "3"))):
        t0 = time.time()
        _, trav = run_all()
        times.append(time.time() - t0)
        travs.append(trav)
    order = sorted(range(len(times)), key=lambda i: times[i])
    mid = order[len(order) // 2]
    elapsed, total_traversed = times[mid], travs[mid]
    print(f"# runs: {['%.3f' % t for t in times]}s (median reported)",
          file=sys.stderr)

    gteps = total_traversed / elapsed / 1e9
    print(f"# bfs: {lanes * batches} searches in {elapsed:.3f}s, "
          f"{total_traversed / 1e9:.2f}G edges traversed", file=sys.stderr)
    print(json.dumps({
        "metric": "msbfs_gteps_per_chip",
        "value": round(gteps, 3),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / 1.0, 3),
    }))


def _bench_runs_csr(scale, edge_factor, v, n_runs, max_iters, rng, t0):
    import time

    import jax.numpy as jnp

    from duckpgq_tpu.ops.csr_jax import build_lengths_csr_runs_on_device
    from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths_runs, plan_runs_wave
    from duckpgq_tpu.utils.rmat import rmat_edges_device

    src_d, dst_d = rmat_edges_device(scale, edge_factor, seed=11)
    e = int(src_d.shape[0])
    np.asarray(src_d[:1])
    print(f"# gen synced: {time.time() - t0:.3f}s", file=sys.stderr)
    from duckpgq_tpu.ops.csr_jax import runs_with_head_bits

    runs_csr = build_lengths_csr_runs_on_device(v, src_d, dst_d, n_runs)
    del src_d, dst_d                        # donated into the run sorts
    np.asarray(runs_csr.run_offsets[0, -1:])
    build_s = time.time() - t0
    print(f"# runs-csr build ({n_runs} runs): {build_s:.1f}s "
          f"({e / max(build_s, 1e-9) / 1e6:.1f} Medges/s)",
          file=sys.stderr)
    lanes_env = int(os.environ.get("BENCH_RUNS_LANES", "0"))
    plans = plan_runs_wave(runs_csr, lanes=lanes_env or None)
    lanes = plans[0].lanes
    # slim the CSR for the wave: packed head bits replace in_dst, and the
    # planner is done with run_offsets — together ~5.4 GB freed at
    # scale 26, which the auto plan above spends on wave width
    runs_csr = runs_with_head_bits(runs_csr, drop_in_dst=True,
                                   drop_run_offsets=True)
    np.asarray(runs_csr.heads[:1])
    print(f"# runs plan: {lanes} lanes (W={lanes // 32}), "
          f"{plans[0].n_chunks} chunks/run x {n_runs} runs, "
          f"slimmed CSR (head bits): {time.time() - t0:.1f}s",
          file=sys.stderr)
    qs = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    active = jnp.ones(lanes, dtype=bool)
    seg = int(os.environ.get("DUCKPGQ_SEG_ITERS", "1"))

    def run_once():
        res, trav = msbfs_lengths_runs(runs_csr, plans, qs, qd, active,
                                       max_iters, seg_iters=seg)
        return float(np.asarray(trav).sum())

    t0 = time.time()
    run_once()
    print(f"# warmup (compile): {time.time() - t0:.1f}s", file=sys.stderr)
    times, travs = [], []
    for _ in range(int(os.environ.get("BENCH_RUNS", "3"))):
        t0 = time.time()
        travs.append(run_once())
        times.append(time.time() - t0)
    order = sorted(range(len(times)), key=lambda i: times[i])
    mid = order[len(order) // 2]
    elapsed, total_traversed = times[mid], travs[mid]
    print(f"# runs: {['%.3f' % t for t in times]}s (median reported)",
          file=sys.stderr)
    gteps = total_traversed / elapsed / 1e9
    print(f"# bfs: {lanes} searches in {elapsed:.3f}s, "
          f"{total_traversed / 1e9:.2f}G edges traversed", file=sys.stderr)
    print(json.dumps({
        "metric": "msbfs_gteps_per_chip",
        "value": round(gteps, 3),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / 1.0, 3),
    }))


def _bench_pallas(v, src, dst, lanes, batches, max_iters, rng):
    import time

    from duckpgq_tpu.kernels.bfs_pallas import PallasBFS, pack_csr

    t0 = time.time()
    packed = pack_csr(v, src, dst)
    print(f"# pack: {time.time() - t0:.1f}s tiles={packed.n_tiles}",
          file=sys.stderr)
    bfs = PallasBFS(packed, lanes=lanes)
    qs_all = rng.integers(0, v, size=lanes * batches).astype(np.int64)
    qd_all = rng.integers(0, v, size=lanes * batches).astype(np.int64)
    t0 = time.time()
    bfs.run(qs_all[:lanes], qd_all[:lanes], max_iters=max_iters)
    print(f"# warmup (compile): {time.time() - t0:.1f}s", file=sys.stderr)
    total_traversed = 0.0
    t0 = time.time()
    for b in range(batches):
        _, trav = bfs.run(qs_all[b * lanes:(b + 1) * lanes],
                          qd_all[b * lanes:(b + 1) * lanes],
                          max_iters=max_iters)
        total_traversed += trav
    elapsed = time.time() - t0
    gteps = total_traversed / elapsed / 1e9
    print(f"# bfs: {lanes * batches} searches in {elapsed:.3f}s, "
          f"{total_traversed / 1e9:.2f}G edges traversed", file=sys.stderr)
    print(json.dumps({
        "metric": "msbfs_gteps_per_chip",
        "value": round(gteps, 3),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
