"""Distributed BFS on the virtual 8-device CPU mesh, cross-checked against
the single-device kernels and host mirrors."""

import numpy as np
import jax

from duckpgq_tpu.ops import msbfs as host_msbfs
from duckpgq_tpu.ops.csr import build_csr
from duckpgq_tpu.parallel.dist_bfs import dist_bfs_lengths, partition_csr
from duckpgq_tpu.parallel.mesh import make_mesh


def test_dist_shortest_paths_valid():
    from duckpgq_tpu.parallel.dist_bfs import dist_shortest_paths

    rng = np.random.default_rng(61)
    v, e = 96, 420
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    sharded = partition_csr(v, src, dst, 8, balance=True)
    qs = rng.integers(0, v, size=50).astype(np.int64)
    qd = rng.integers(0, v, size=50).astype(np.int64)
    qs[0] = qd[0]
    paths, valid = dist_shortest_paths(mesh, sharded, qs, qd)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, host_valid = host_msbfs.iterative_length(csr, qs, qd)
    edges = set(zip(src.tolist(), dst.tolist()))
    np.testing.assert_array_equal(valid, host_valid)
    for i in range(50):
        if not valid[i]:
            continue
        p = paths[i]
        assert p[0] == qs[i] and p[-1] == qd[i]
        assert len(p) - 1 == (want[i] if host_valid[i] else -1)
        for a_, b_ in zip(p, p[1:]):        # every hop is a real edge
            assert (a_, b_) in edges


def test_dist_bfs_balanced_matches_host():
    """Hub-balanced (degree-relabeled) partitioning: same lengths, and the
    per-shard edge imbalance must shrink on a skewed graph."""
    rng = np.random.default_rng(77)
    v, e = 128, 600
    # power-law-ish: half the edges hit a handful of hub destinations
    hubs = rng.integers(0, 4, size=e // 2)
    dst = np.concatenate([hubs, rng.integers(0, v, size=e - e // 2)])
    src = rng.integers(0, v, size=e)
    mesh = make_mesh(8)
    plain = partition_csr(v, src, dst, 8)
    balanced = partition_csr(v, src, dst, 8, balance=True)
    assert balanced.in_src.shape[1] < plain.in_src.shape[1]  # less padding
    qs = rng.integers(0, v, size=64).astype(np.int64)
    qd = rng.integers(0, v, size=64).astype(np.int64)
    got, _ = dist_bfs_lengths(mesh, balanced, qs, qd, lanes=32)
    csr = build_csr(v, src.astype(np.int64), dst.astype(np.int64),
                    np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(csr, qs, qd)
    np.testing.assert_array_equal(got, np.where(valid, want, -1))


def test_dist_pagerank_matches_host():
    from duckpgq_tpu.models import Graph
    from duckpgq_tpu.parallel.dist_algorithms import make_dist_pagerank

    rng = np.random.default_rng(31)
    v, e = 96, 400
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    sharded = partition_csr(v, src, dst, 8)
    got = np.asarray(make_dist_pagerank(mesh, sharded)())
    g = Graph(v, src, dst)
    want = np.asarray(g.pagerank())
    got_n = got / got.sum()
    want_n = want / want.sum()
    assert np.abs(got_n - want_n).max() < 5e-4


def test_dist_wcc_matches_host():
    from duckpgq_tpu.parallel.dist_algorithms import make_dist_wcc

    rng = np.random.default_rng(33)
    v, e = 120, 140
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    sharded = partition_csr(v, src, dst, 8)
    got = np.asarray(make_dist_wcc(mesh, sharded)())
    # oracle: undirected components via scipy-free union-find
    parent = list(range(v))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src, dst):
        parent[find(int(s))] = find(int(d))
    want = [find(i) for i in range(v)]
    # same equivalence classes
    from collections import defaultdict
    by_got = defaultdict(set)
    for i in range(v):
        by_got[int(got[i])].add(want[i])
    for members in by_got.values():
        assert len(members) == 1


def test_dist_bfs_packed_matches_host():
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import make_dist_bfs_packed

    rng = np.random.default_rng(55)
    v, e = 96, 400
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    sharded = partition_csr(v, src, dst, 8)
    L = 64
    qs = rng.integers(0, v, size=L).astype(np.int32)
    qd = rng.integers(0, v, size=L).astype(np.int32)
    active = np.ones(L, dtype=bool)
    active[-2:] = False
    fn = make_dist_bfs_packed(mesh, sharded, L, v + 1)
    got, trav = fn(jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(active))
    got = np.asarray(got)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs.astype(np.int64), qd.astype(np.int64))
    np.testing.assert_array_equal(got, np.where(valid & active, want, -1))
    assert float(np.asarray(trav)[active].sum()) > 0


def test_dist_bellman_ford_matches_host():
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_algorithms import make_dist_bellman_ford

    rng = np.random.default_rng(41)
    v, e = 64, 300
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    w = rng.integers(1, 9, size=e).astype(np.float64)
    mesh = make_mesh(8)
    sharded = partition_csr(v, src, dst, 8, w=w)
    L = 32
    qs = rng.integers(0, v, size=L).astype(np.int32)
    qd = rng.integers(0, v, size=L).astype(np.int32)
    fn = make_dist_bellman_ford(mesh, sharded, sharded.w_shard, L, v + 1)
    got = np.asarray(fn(jnp.asarray(qs), jnp.asarray(qd),
                        jnp.ones(L, dtype=bool)))
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64), w=w,
                    w_is_double=True)
    want, valid, _ = host_msbfs.cheapest_path_length(
        csr, qs.astype(np.int64), qd.astype(np.int64))
    for i in range(L):
        if valid[i]:
            assert got[i] == want[i], (i, got[i], want[i])
        else:
            assert np.isinf(got[i])


def test_dist_bfs_matches_host():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    rng = np.random.default_rng(21)
    v, e = 96, 400
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    sharded = partition_csr(v, src, dst, 8)
    qs = rng.integers(0, v, size=96).astype(np.int64)
    qd = rng.integers(0, v, size=96).astype(np.int64)
    got, traversed = dist_bfs_lengths(mesh, sharded, qs, qd, lanes=32)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(csr, qs, qd)
    np.testing.assert_array_equal(got, np.where(valid, want, -1))
    assert traversed > 0


def test_dist_bfs_overlap_matches_packed():
    """Exchange/compute-overlap variant: identical lengths and traversed
    counts to the plain packed distributed BFS (and the host oracle)."""
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import (make_dist_bfs_packed,
                                               make_dist_bfs_packed_overlap)

    rng = np.random.default_rng(77)
    v, e = 130, 700
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    for balance in (False, True):
        sharded = partition_csr(v, src, dst, 8, balance=balance)
        L = 64
        qs = sharded.map_queries(
            rng.integers(0, v, size=L).astype(np.int32))
        qd = sharded.map_queries(
            rng.integers(0, v, size=L).astype(np.int32))
        active = np.ones(L, dtype=bool)
        base = make_dist_bfs_packed(mesh, sharded, L, v + 1)
        over = make_dist_bfs_packed_overlap(mesh, sharded, L, v + 1)
        want, wtrav = base(jnp.asarray(qs), jnp.asarray(qd),
                           jnp.asarray(active))
        got, gtrav = over(jnp.asarray(qs), jnp.asarray(qd),
                          jnp.asarray(active))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(gtrav), np.asarray(wtrav))


def test_dist_bfs_chunked_matches_unchunked():
    """Per-shard chunked expansion (edge super-chunks with carry) returns
    identical results to the single-dispatch distributed BFS."""
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import make_dist_bfs_packed

    rng = np.random.default_rng(91)
    v, e = 150, 900
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(4)
    sharded = partition_csr(v, src, dst, 4, balance=True)
    L = 64
    qs = sharded.map_queries(rng.integers(0, v, size=L).astype(np.int32))
    qd = sharded.map_queries(rng.integers(0, v, size=L).astype(np.int32))
    active = np.ones(L, dtype=bool)
    base = make_dist_bfs_packed(mesh, sharded, L, v + 1)
    chunked = make_dist_bfs_packed(mesh, sharded, L, v + 1, n_chunks=4)
    want, wtrav = base(jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(active))
    got, gtrav = chunked(jnp.asarray(qs), jnp.asarray(qd),
                         jnp.asarray(active))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(np.asarray(gtrav), np.asarray(wtrav))


def test_dist_bfs_partitioned_matches_packed():
    """Partitioned-frontier ring BFS == replicated-frontier BFS == host, on
    directed graphs with hub relabeling."""
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import (make_dist_bfs_packed,
                                               make_dist_bfs_partitioned,
                                               partition_csr_grouped)

    rng = np.random.default_rng(77)
    v, e = 112, 500
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    grouped = partition_csr_grouped(v, src, dst, 8, balance=True)
    L = 64
    qs0 = rng.integers(0, v, size=L).astype(np.int32)
    qd0 = rng.integers(0, v, size=L).astype(np.int32)
    qs0[5] = qd0[5]  # trivial lane
    qs = grouped.map_queries(qs0.astype(np.int64)).astype(np.int32)
    qd = grouped.map_queries(qd0.astype(np.int64)).astype(np.int32)
    active = np.ones(L, dtype=bool)
    active[-3:] = False
    fn = make_dist_bfs_partitioned(mesh, grouped, L, v + 1)
    got, trav = fn(jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(active))
    got = np.asarray(got)

    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs0.astype(np.int64), qd0.astype(np.int64))
    want = np.where(valid & active, want, -1)
    np.testing.assert_array_equal(got, want)

    # TEPS accounting agrees with the replicated-frontier kernel
    sharded = partition_csr(v, src, dst, 8, balance=True)
    fn2 = make_dist_bfs_packed(mesh, sharded, L, v + 1)
    qs2 = sharded.map_queries(qs0.astype(np.int64)).astype(np.int32)
    qd2 = sharded.map_queries(qd0.astype(np.int64)).astype(np.int32)
    got2, trav2 = fn2(jnp.asarray(qs2), jnp.asarray(qd2),
                      jnp.asarray(active))
    np.testing.assert_array_equal(got, np.asarray(got2))
    np.testing.assert_allclose(np.asarray(trav), np.asarray(trav2))


def test_dist_bfs_partitioned_memory_scales():
    """The partitioned kernel's per-shard buffers are O(W*V/N): no [W, Vtot]
    tensor appears anywhere in its HLO, while the replicated kernel
    materializes one. Checked against the compiled modules' buffer shapes
    (virtual CPU mesh compiles expose the same allocation structure)."""
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import (make_dist_bfs_packed,
                                               make_dist_bfs_partitioned,
                                               partition_csr_grouped)

    rng = np.random.default_rng(3)
    v, e = 1024, 4096
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    grouped = partition_csr_grouped(v, src, dst, 8, balance=True)
    L = 256
    W = L // 32
    Vs = grouped.v_shard
    Vtot = grouped.v_padded
    fn = make_dist_bfs_partitioned(mesh, grouped, L, 8)
    s = jnp.zeros(L, jnp.int32)
    d = jnp.ones(L, jnp.int32)
    a = jnp.ones(L, bool)
    text = jax.jit(fn).lower(s, d, a).compile().as_text()
    # the replicated frontier would be u32[W, Vtot]; the partitioned kernel
    # must never materialize it (only [W, Vs] blocks)
    assert f"u32[{W},{Vtot}]" not in text.replace(" ", ""), \
        "partitioned BFS materialized a full-frontier buffer"
    got, _ = fn(s, d, a)
    assert np.asarray(got).shape == (L,)


def test_dist_bfs_hierarchical_mesh_matches_host():
    """host x chip (2x4) mesh: the hierarchical two-stage exchange (ICI
    gather within a host row, then across hosts) gives the same results as
    the flat mesh and the host mirror."""
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import make_dist_bfs_packed
    from duckpgq_tpu.parallel.mesh import make_mesh_2d

    rng = np.random.default_rng(13)
    v, e = 96, 400
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh_2d(2, 4)
    sharded = partition_csr(v, src, dst, 8, balance=True)
    L = 64
    qs0 = rng.integers(0, v, size=L).astype(np.int64)
    qd0 = rng.integers(0, v, size=L).astype(np.int64)
    qs = sharded.map_queries(qs0).astype(np.int32)
    qd = sharded.map_queries(qd0).astype(np.int32)
    fn = make_dist_bfs_packed(mesh, sharded, L, v + 1)
    got = np.asarray(fn(jnp.asarray(qs), jnp.asarray(qd),
                        jnp.ones(L, dtype=bool))[0])
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(csr, qs0, qd0)
    np.testing.assert_array_equal(got, np.where(valid, want, -1))


def test_dryrun_multihost_two_processes():
    """The full multi-process path: 2 jax.distributed processes over Gloo
    form the 2-host x 4-chip mesh and the BFS cross-check passes."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "scripts/dryrun_multihost.py"],
        capture_output=True, text=True, timeout=280,
        env={**__import__("os").environ, "DUCKPGQ_MH_PORT": "49821"})
    assert out.returncode == 0 and "MULTIHOST_OK" in out.stdout, \
        out.stderr[-2000:]


def test_dist_lcc_matches_host():
    """Distributed LCC == host kernel (float32 bit-exact) on the dedup
    undirected CSR, with and without hub balancing."""
    import duckpgq_tpu.ops.algorithms as algs
    from duckpgq_tpu.parallel.dist_algorithms import make_dist_lcc

    rng = np.random.default_rng(29)
    v, e = 96, 380
    a = rng.integers(0, v, size=e)
    b = rng.integers(0, v, size=e)
    pairs = np.unique(np.stack([np.concatenate([a, b]),
                                np.concatenate([b, a])], axis=1), axis=0)
    src, dst = pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64)
    csr = build_csr(v, src, dst, np.arange(len(src), dtype=np.int64))
    want = algs.local_clustering_coefficient(csr)
    mesh = make_mesh(8)
    for balance in (False, True):
        sharded = partition_csr(v, src, dst, 8, balance=balance)
        got = sharded.unmap_values(make_dist_lcc(mesh, sharded)())
        np.testing.assert_array_equal(got, want)


def test_dist_bfs_partitioned_chunked_matches_unchunked():
    """Ring kernel with streamed per-group expansion (n_chunks>1) matches
    the unchunked partitioned kernel exactly."""
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import (make_dist_bfs_partitioned,
                                               partition_csr_grouped)

    rng = np.random.default_rng(88)
    v, e = 120, 700
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    grouped = partition_csr_grouped(v, src, dst, 8, balance=True)
    L = 64
    qs = grouped.map_queries(
        rng.integers(0, v, size=L).astype(np.int64)).astype(np.int32)
    qd = grouped.map_queries(
        rng.integers(0, v, size=L).astype(np.int64)).astype(np.int32)
    act = np.ones(L, dtype=bool)
    base = make_dist_bfs_partitioned(mesh, grouped, L, v + 1)
    chunked = make_dist_bfs_partitioned(mesh, grouped, L, v + 1, n_chunks=4)
    r0, t0 = base(jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(act))
    r1, t1 = chunked(jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(act))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1))


def test_dist_bfs_compressed_ring_matches_partitioned():
    """Compressed-frontier ring exchange (VERDICT r3 item 3a): identical
    lengths/TEPS to the plain partitioned ring, and the per-iteration
    words log shows the tail iterations actually exchanging C*(W+1)
    words instead of W*Vs."""
    import jax.numpy as jnp

    from duckpgq_tpu.parallel.dist_bfs import (
        make_dist_bfs_partitioned, make_dist_bfs_partitioned_compressed,
        partition_csr_grouped)

    rng = np.random.default_rng(123)
    v, e = 200, 900
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    mesh = make_mesh(8)
    grouped = partition_csr_grouped(v, src, dst, 8, balance=True)
    L = 64
    W = L // 32
    qs0 = rng.integers(0, v, size=L).astype(np.int32)
    qd0 = rng.integers(0, v, size=L).astype(np.int32)
    qs = grouped.map_queries(qs0.astype(np.int64)).astype(np.int32)
    qd = grouped.map_queries(qd0.astype(np.int64)).astype(np.int32)
    active = np.ones(L, dtype=bool)
    want, wtrav = make_dist_bfs_partitioned(mesh, grouped, L, v + 1)(
        jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(active))
    Vs = grouped.v_shard

    def cap_of(d):
        return min(max(128, -(-max(Vs // d, 1) // 128) * 128), Vs)

    for budget_div in (2, 8, (2, 8)):
        fn = make_dist_bfs_partitioned_compressed(
            mesh, grouped, L, v + 1, budget_div=budget_div)
        got, trav, words = fn(jnp.asarray(qs), jnp.asarray(qd),
                              jnp.asarray(active))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(trav), np.asarray(wtrav))
        words = np.asarray(words)
        divs = (budget_div,) if isinstance(budget_div, int) else budget_div
        allowed = {7 * W * Vs} | {7 * cap_of(d) * (W + 1) for d in divs}
        used = words[words > 0]
        assert len(used) > 0
        assert set(used.tolist()) <= allowed, (used, allowed)
        # the seed iteration (single-vertex frontiers) must take the
        # SMALLEST tier
        assert used[0] == 7 * min(cap_of(d) for d in divs) * (W + 1), used


def test_dist_bfs_2d_matches_host():
    """2-D (vertex x edge) grid BFS (VERDICT r3 item 3b): bit-identical
    lengths and TEPS vs the host oracle and the 1-D partitioned ring on
    a 2x2 virtual grid, with the O(W*V/sqrt(N)) per-iteration words log."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from duckpgq_tpu.parallel.dist_bfs import (make_dist_bfs_partitioned,
                                               partition_csr_grouped)
    from duckpgq_tpu.parallel.dist_bfs_2d import make_dist_bfs_2d

    rng = np.random.default_rng(321)
    v, e = 150, 700
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    r = 2
    mesh2 = Mesh(np.array(jax.devices()[:r * r]).reshape(r, r),
                 ("row", "col"))
    grouped = partition_csr_grouped(v, src, dst, r, balance=True)
    L = 64
    W = L // 32
    qs0 = rng.integers(0, v, size=L).astype(np.int32)
    qd0 = rng.integers(0, v, size=L).astype(np.int32)
    qs0[3] = qd0[3]
    qs = grouped.map_queries(qs0.astype(np.int64)).astype(np.int32)
    qd = grouped.map_queries(qd0.astype(np.int64)).astype(np.int32)
    active = np.ones(L, dtype=bool)
    active[-2:] = False
    fn = make_dist_bfs_2d(mesh2, grouped, L, v + 1)
    got, trav, words = fn(jnp.asarray(qs), jnp.asarray(qd),
                          jnp.asarray(active))
    got = np.asarray(got)

    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs0.astype(np.int64), qd0.astype(np.int64))
    want = np.where(valid & active, want, -1)
    np.testing.assert_array_equal(got, want)

    # 1-D ring on a 2-shard mesh for TEPS cross-check
    mesh1 = Mesh(np.array(jax.devices()[:r]), ("x",))
    fn1 = make_dist_bfs_partitioned(mesh1, grouped, L, v + 1)
    got1, trav1 = fn1(jnp.asarray(qs), jnp.asarray(qd),
                      jnp.asarray(active))
    np.testing.assert_array_equal(got, np.asarray(got1))
    np.testing.assert_allclose(np.asarray(trav), np.asarray(trav1))

    # words log: (c-1 + 1 + r-1) hops of [W, Vs/c] words per iteration
    words = np.asarray(words)
    Vs = grouped.v_shard
    per_iter = (r - 1 + 1 + r - 1) * W * (Vs // r)
    used = words[words > 0]
    assert len(used) >= 2
    assert set(used.tolist()) == {per_iter}, (used, per_iter)


def test_dist_bfs_2d_4x4_subprocess():
    """4x4 grid (16 virtual devices, needs its own backend) — the index
    math (ring reduce-scatter slice ownership, transpose, all-gather
    placement) only fully exercises at r > 2."""
    import subprocess
    import sys
    code = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from duckpgq_tpu.parallel.dist_bfs import partition_csr_grouped
from duckpgq_tpu.parallel.dist_bfs_2d import make_dist_bfs_2d
from duckpgq_tpu.ops.csr import build_csr
from duckpgq_tpu.ops import msbfs as host_msbfs

rng = np.random.default_rng(77)
v, e = 260, 1300
src = rng.integers(0, v, size=e).astype(np.int64)
dst = rng.integers(0, v, size=e).astype(np.int64)
r = 4
mesh = Mesh(np.array(jax.devices()).reshape(r, r), ("row", "col"))
grouped = partition_csr_grouped(v, src, dst, r, balance=True)
L = 64
qs0 = rng.integers(0, v, size=L).astype(np.int32)
qd0 = rng.integers(0, v, size=L).astype(np.int32)
qs = grouped.map_queries(qs0.astype(np.int64)).astype(np.int32)
qd = grouped.map_queries(qd0.astype(np.int64)).astype(np.int32)
active = np.ones(L, dtype=bool)
fn = make_dist_bfs_2d(mesh, grouped, L, v + 1)
got, trav, words = fn(jnp.asarray(qs), jnp.asarray(qd),
                      jnp.asarray(active))
csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
want, valid = host_msbfs.iterative_length(
    csr, qs0.astype(np.int64), qd0.astype(np.int64))
want = np.where(valid & active, want, -1)
np.testing.assert_array_equal(np.asarray(got), want)
assert (np.asarray(words) > 0).sum() >= 2
print("2d-4x4-ok")
"""
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=600,
                         cwd=str(__import__("pathlib").Path(
                             __file__).parent.parent))
    assert "2d-4x4-ok" in res.stdout, res.stderr[-2000:]
