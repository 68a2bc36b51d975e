"""Device (JAX) kernels cross-checked against the exact host mirrors on
random graphs — run on the virtual CPU mesh in tests, TPU in production."""

import numpy as np
import pytest

from duckpgq_tpu.models import Graph
from duckpgq_tpu.ops import algorithms as host_algs
from duckpgq_tpu.ops import msbfs as host_msbfs
from duckpgq_tpu.ops.csr import build_csr


def random_graph(seed, v=48, e=160, weighted=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    w = rng.integers(1, 9, size=e).astype(np.int64) if weighted else None
    return Graph(v, src, dst, weights=w)


def test_host_build_matches_jit_build():
    import numpy as np

    from duckpgq_tpu.ops.csr_jax import build_device_csr

    rng = np.random.default_rng(1)
    v, e = 77, 310
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    w = rng.uniform(0, 1, e)
    a = build_device_csr(v, src, dst, w=w, host_build=True)
    b = build_device_csr(v, src, dst, w=w, host_build=False)
    for f in ("offsets", "e", "edge_src", "edge_ids", "in_src", "in_dst",
              "in_pos", "in_offsets", "w"):
        x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert (x == y).all() and x.dtype == y.dtype, f


@pytest.mark.parametrize("seed", [0, 1])
def test_device_bfs_matches_host(seed):
    g = random_graph(seed)
    rng = np.random.default_rng(seed + 100)
    qs = rng.integers(0, g.vcount, size=150).astype(np.int64)
    qd = rng.integers(0, g.vcount, size=150).astype(np.int64)
    dev_lengths = g.bfs_lengths(qs, qd)
    host_lengths, host_valid = host_msbfs.iterative_length(g.host_csr, qs, qd)
    expect = np.where(host_valid, host_lengths, -1)
    np.testing.assert_array_equal(dev_lengths, expect)


@pytest.mark.parametrize("seed", [0, 5])
def test_packed_bfs_matches_host(seed):
    import jax.numpy as jnp
    from duckpgq_tpu.ops.csr_jax import from_host_csr
    from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths_packed

    g = random_graph(seed, v=70, e=260)
    rng = np.random.default_rng(seed + 200)
    L = 64
    qs = rng.integers(0, g.vcount, size=L).astype(np.int32)
    qd = rng.integers(0, g.vcount, size=L).astype(np.int32)
    active = np.ones(L, dtype=bool)
    active[-3:] = False
    qs[5] = qd[5]  # trivial lane
    dcsr = from_host_csr(g.host_csr)
    got, traversed = msbfs_lengths_packed(
        dcsr, jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(active),
        g.vcount)
    host_lengths, host_valid = host_msbfs.iterative_length(
        g.host_csr, qs.astype(np.int64), qd.astype(np.int64))
    expect = np.where(host_valid & active, host_lengths, -1)
    np.testing.assert_array_equal(np.asarray(got), expect)
    assert float(np.asarray(traversed)[active].sum()) > 0
    assert float(np.asarray(traversed)[~active].sum()) == 0


@pytest.mark.parametrize("seed", [0, 3])
def test_packed_bfs_edge_major_matches_host(seed):
    """4096-lane waves (W=128) dispatch to the edge-major layout
    (_msbfs_lengths_packed_em) — verify it against the host kernel and
    the lane-major variant's traversed counts."""
    import jax.numpy as jnp
    from duckpgq_tpu.ops.csr_jax import from_host_csr
    from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths_packed

    g = random_graph(seed, v=70, e=260)
    rng = np.random.default_rng(seed + 300)
    L = 4096
    qs = rng.integers(0, g.vcount, size=L).astype(np.int32)
    qd = rng.integers(0, g.vcount, size=L).astype(np.int32)
    active = np.ones(L, dtype=bool)
    active[100:120] = False
    qs[7] = qd[7]  # trivial lane
    dcsr = from_host_csr(g.host_csr)
    got, traversed = msbfs_lengths_packed(
        dcsr, jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(active),
        g.vcount)
    host_lengths, host_valid = host_msbfs.iterative_length(
        g.host_csr, qs.astype(np.int64), qd.astype(np.int64))
    expect = np.where(host_valid & active, host_lengths, -1)
    np.testing.assert_array_equal(np.asarray(got), expect)
    assert float(np.asarray(traversed)[active].sum()) > 0
    assert float(np.asarray(traversed)[~active].sum()) == 0


def test_lengths_only_build_matches_full():
    """The minimal-transfer CSR (bench.py setup path) gives identical BFS
    lengths to the full build across the narrow, packed, and planned
    kernels."""
    import jax.numpy as jnp
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import (msbfs_lengths,
                                           msbfs_lengths_packed,
                                           msbfs_lengths_packed_planned,
                                           plan_packed_wave)

    rng = np.random.default_rng(9)
    v, e = 90, 400
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    full = build_device_csr(v, src, dst)
    mini = build_device_csr(v, src, dst, lengths_only=True)
    for f in ("offsets", "in_src", "in_dst", "in_offsets"):
        np.testing.assert_array_equal(np.asarray(getattr(full, f)),
                                      np.asarray(getattr(mini, f)))
    assert mini.epad == full.epad and mini.vpad == full.vpad
    L = 64
    qs = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    active = jnp.ones(L, dtype=bool)
    for kern in (lambda c: msbfs_lengths(c, qs, qd, active, v)[0],
                 lambda c: msbfs_lengths_packed(c, qs, qd, active, v)[0]):
        np.testing.assert_array_equal(np.asarray(kern(full)),
                                      np.asarray(kern(mini)))
    plan = plan_packed_wave(mini, lanes=4096)
    got, _ = msbfs_lengths_packed_planned(
        mini, plan, jnp.asarray(np.resize(np.asarray(qs), plan.lanes)),
        jnp.asarray(np.resize(np.asarray(qd), plan.lanes)),
        jnp.ones(plan.lanes, dtype=bool), v, False)
    want, _ = msbfs_lengths_packed(
        full, jnp.asarray(np.resize(np.asarray(qs), plan.lanes)),
        jnp.asarray(np.resize(np.asarray(qd), plan.lanes)),
        jnp.ones(plan.lanes, dtype=bool), v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("seed", [0, 4])
@pytest.mark.parametrize("symmetric", [False, True])
def test_packed_bidirectional_matches_host(seed, symmetric):
    """Device bidirectional kernel reproduces the host mirror exactly —
    including the reference's directed-CSR quirk (both sides expand forward
    edges), so parity must hold on plain directed graphs too."""
    import jax.numpy as jnp
    from duckpgq_tpu.ops.csr_jax import from_host_csr
    from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths_bidirectional

    rng = np.random.default_rng(seed)
    v, e = 60, 210
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    if symmetric:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    g = Graph(v, src, dst)
    L = 64
    qs = rng.integers(0, v, size=L).astype(np.int32)
    qd = rng.integers(0, v, size=L).astype(np.int32)
    active = np.ones(L, dtype=bool)
    active[-5:] = False
    qs[3] = qd[3]  # trivial lane
    dcsr = from_host_csr(g.host_csr)
    got, traversed = msbfs_lengths_bidirectional(
        dcsr, jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(active),
        2 * v + 1)
    host_lengths, host_valid = host_msbfs.iterative_length_bidirectional(
        g.host_csr, qs.astype(np.int64), qd.astype(np.int64))
    expect = np.where(host_valid & active, host_lengths, -1)
    np.testing.assert_array_equal(np.asarray(got), expect)
    assert float(np.asarray(traversed)[active].sum()) > 0
    assert float(np.asarray(traversed)[~active].sum()) == 0


def test_bidirectional_directed_early_exit():
    """Reference iterativelength_bidirectional.cpp:119-128 breaks the whole
    wave once one alternation produces no new vertex: on 0->1->2 the query
    (0, 2) is NULL because the dst side (vertex 2, no out-edges) exhausts
    at iteration 2 even though the src side would meet it at iteration 3.
    Both the host mirror and the device kernel reproduce that."""
    import jax.numpy as jnp
    from duckpgq_tpu.ops.csr_jax import from_host_csr
    from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths_bidirectional

    csr = build_csr(3, np.array([0, 1], dtype=np.int64),
                    np.array([1, 2], dtype=np.int64),
                    np.arange(2, dtype=np.int64))
    qs = np.array([0], dtype=np.int64)
    qd = np.array([2], dtype=np.int64)
    lengths, valid = host_msbfs.iterative_length_bidirectional(csr, qs, qd)
    assert not valid[0]

    L = 32
    s = np.zeros(L, dtype=np.int32)
    d = np.zeros(L, dtype=np.int32)
    a = np.zeros(L, dtype=bool)
    s[0], d[0], a[0] = 0, 2, True
    got, _ = msbfs_lengths_bidirectional(
        from_host_csr(csr), jnp.asarray(s), jnp.asarray(d), jnp.asarray(a), 7)
    assert int(np.asarray(got)[0]) == -1


def test_bidirectional_sql_device_route(monkeypatch):
    """iterativelengthbidirectional routes through the packed device kernel
    when the CSR clears DUCKPGQ_DEVICE_MIN_EDGES."""
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "1")
    rng = np.random.default_rng(11)
    v, e = 40, 150
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    qs = rng.integers(0, v, size=90).astype(np.int64)
    qd = rng.integers(0, v, size=90).astype(np.int64)
    got, got_valid = host_msbfs.iterative_length_bidirectional(csr, qs, qd)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", str(10**9))
    want, want_valid = host_msbfs.iterative_length_bidirectional(csr, qs, qd)
    np.testing.assert_array_equal(got_valid, want_valid)
    np.testing.assert_array_equal(got[got_valid], want[want_valid])


@pytest.mark.parametrize("seed", [0, 7])
def test_device_shortest_paths_match_host(seed):
    from duckpgq_tpu.ops.csr_jax import from_host_csr
    from duckpgq_tpu.ops.msbfs_jax import shortest_paths_device

    g = random_graph(seed, v=50, e=190)
    rng = np.random.default_rng(seed + 300)
    qs = rng.integers(0, g.vcount, size=40).astype(np.int64)
    qd = rng.integers(0, g.vcount, size=40).astype(np.int64)
    qs[1] = qd[1]
    dcsr = from_host_csr(g.host_csr)
    got_paths, got_valid = shortest_paths_device(dcsr, qs, qd)
    want_paths, want_valid = host_msbfs.shortest_path(g.host_csr, qs, qd)
    np.testing.assert_array_equal(got_valid, want_valid)
    assert got_paths == want_paths


def test_device_lcc_matches_host():
    from duckpgq_tpu.ops.csr_jax import from_host_csr
    from duckpgq_tpu.ops.msbfs_jax import lcc_device

    # symmetrized dedup graph like the SQL layer hands the LCC kernel
    rng = np.random.default_rng(23)
    v, e = 60, 260
    src = rng.integers(0, v, size=e)
    dst = rng.integers(0, v, size=e)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    pairs = np.unique(np.stack([s2, d2], 1), axis=0)
    s2, d2 = pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64)
    csr = build_csr(v, s2, d2, np.arange(len(s2), dtype=np.int64))
    got = np.asarray(lcc_device(from_host_csr(csr)))
    want = host_algs.local_clustering_coefficient(csr)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_device_bellman_ford_matches_host():
    g = random_graph(7, weighted=True)
    rng = np.random.default_rng(3)
    qs = rng.integers(0, g.vcount, size=80).astype(np.int64)
    qd = rng.integers(0, g.vcount, size=80).astype(np.int64)
    dev_costs = g.cheapest_path_costs(qs, qd)
    host_costs, host_valid, _ = host_msbfs.cheapest_path_length(
        g.host_csr, qs, qd)
    for i in range(80):
        if host_valid[i]:
            assert dev_costs[i] == host_costs[i]
        else:
            assert np.isinf(dev_costs[i])


def test_device_pagerank_close_to_host():
    g = random_graph(11, v=64, e=300)
    dev_rank = g.pagerank()
    # host kernel normalizes over vsize=V+2 (reference quirk); renormalize
    # for comparison of the stationary distribution shape
    host_rank = host_algs.pagerank(g.host_csr)[:g.vcount]
    dev_n = dev_rank / dev_rank.sum()
    host_n = host_rank / host_rank.sum()
    assert np.abs(dev_n - host_n).max() < 5e-4


def test_device_wcc_same_partition():
    g = random_graph(13, v=80, e=90)
    dev_labels = g.weakly_connected_components()
    host_roots = g.weakly_connected_components(exact_reference=True)
    # same equivalence classes
    from collections import defaultdict
    by_dev = defaultdict(set)
    for i, l in enumerate(dev_labels):
        by_dev[l].add(host_roots[i])
    for members in by_dev.values():
        assert len(members) == 1


def test_shortest_paths_api():
    g = random_graph(17)
    qs = np.array([0, 1, 2], dtype=np.int64)
    qd = np.array([5, 1, 9], dtype=np.int64)
    paths, validity = g.shortest_paths(qs, qd)
    lengths = g.bfs_lengths(qs, qd)
    for i in range(3):
        if validity[i]:
            assert len(paths[i]) == 2 * max(lengths[i], 0) + 1


def test_device_built_csr_matches_host_build():
    """build_lengths_csr_on_device (device sort + searchsorted, the bench's
    zero-transfer path) produces the same offsets and the same BFS results
    as the host-built lengths_only CSR given identical edges."""
    import jax.numpy as jnp
    from duckpgq_tpu.ops.csr_jax import (build_device_csr,
                                         build_lengths_csr_on_device)
    from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths_packed

    rng = np.random.default_rng(23)
    v, e = 300, 1400
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    host_csr = build_device_csr(v, src, dst, lengths_only=True)
    dev_csr = build_lengths_csr_on_device(
        v, jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(dev_csr.offsets),
                                  np.asarray(host_csr.offsets))
    np.testing.assert_array_equal(np.asarray(dev_csr.in_offsets),
                                  np.asarray(host_csr.in_offsets))
    # same (dst, src) multiset per segment (device sort need not be stable)
    a = np.lexsort((np.asarray(dev_csr.in_src), np.asarray(dev_csr.in_dst)))
    b = np.lexsort((np.asarray(host_csr.in_src),
                    np.asarray(host_csr.in_dst)))
    np.testing.assert_array_equal(np.asarray(dev_csr.in_src)[a],
                                  np.asarray(host_csr.in_src)[b])
    np.testing.assert_array_equal(np.asarray(dev_csr.in_dst)[a],
                                  np.asarray(host_csr.in_dst)[b])
    L = 64
    qs = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    act = jnp.ones(L, dtype=bool)
    got, _ = msbfs_lengths_packed(dev_csr, qs, qd, act, v)
    want, _ = msbfs_lengths_packed(host_csr, qs, qd, act, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rmat_device_distribution():
    """Device RMAT generator: same marginal distribution family as the host
    generator (power-law out-degrees, full vertex range, E = V * factor)."""
    from duckpgq_tpu.utils.rmat import rmat_edges, rmat_edges_device

    scale, factor = 10, 8
    v = 1 << scale
    sd, dd = rmat_edges_device(scale, factor, seed=3)
    sd, dd = np.asarray(sd), np.asarray(dd)
    assert sd.shape == (v * factor,) and dd.shape == (v * factor,)
    assert sd.min() >= 0 and sd.max() < v and dd.min() >= 0 and dd.max() < v
    sh, _ = rmat_edges(scale, factor, seed=3)
    # heavy-tail check: top-1% vertices own a similar edge share
    def top_share(arr):
        deg = np.bincount(arr, minlength=v)
        return np.sort(deg)[-v // 100:].sum() / len(arr)
    assert abs(top_share(sd) - top_share(sh)) < 0.1


def test_weighted_bf_device_build_matches_host_build():
    """build_weighted_bf_csr_on_device: bellman_ford results identical to
    the full host-built weighted CSR on the same edges."""
    import jax.numpy as jnp
    from duckpgq_tpu.ops.csr_jax import (build_device_csr,
                                         build_weighted_bf_csr_on_device)
    from duckpgq_tpu.ops.msbfs_jax import bellman_ford

    rng = np.random.default_rng(31)
    v, e = 120, 520
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    w = rng.uniform(0.5, 4.5, size=e).astype(np.float32)
    full = build_device_csr(v, src, dst, w=w)
    dev = build_weighted_bf_csr_on_device(
        v, jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)), jnp.asarray(w))
    L = 64
    qs = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    act = jnp.ones(L, dtype=bool)
    got = np.asarray(bellman_ford(dev, qs, qd, act, v + 1))
    want = np.asarray(bellman_ford(full, qs, qd, act, v + 1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lowmem_build_matches_normal(monkeypatch):
    """The RMAT-26 low-mem build path (donated pair sort first, offsets
    derived from in_src in chunked sorts) produces the identical CSR."""
    import jax.numpy as jnp
    from duckpgq_tpu.ops import csr_jax

    rng = np.random.default_rng(17)
    v, e = 500, 4096
    src = jnp.asarray(rng.integers(0, v, size=e).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, v, size=e).astype(np.int32))
    want = csr_jax.build_lengths_csr_on_device(v, src, dst)
    monkeypatch.setattr(csr_jax, "_LOWMEM_EDGES", 1)
    got = csr_jax.build_lengths_csr_on_device(v, src, dst)
    np.testing.assert_array_equal(np.asarray(got.offsets),
                                  np.asarray(want.offsets))
    np.testing.assert_array_equal(np.asarray(got.in_offsets),
                                  np.asarray(want.in_offsets))
    np.testing.assert_array_equal(np.asarray(got.in_src),
                                  np.asarray(want.in_src))
    np.testing.assert_array_equal(np.asarray(got.in_dst),
                                  np.asarray(want.in_dst))


def test_bellman_ford_sparse_matches_dense(monkeypatch):
    """Sparse changed-vertex Bellman-Ford rounds == the dense kernel,
    bit-identical costs AND round counts (unchanged sources only produce
    no-op candidates), incl. forced dense<->sparse tier transitions."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops.csr_jax import build_weighted_bf_csr_on_device
    from duckpgq_tpu.ops.msbfs_jax import (bellman_ford_sparse,
                                           bellman_ford_with_iters)

    rng = np.random.default_rng(15)
    v, e = 220, 1500
    src = rng.integers(0, v, size=e).astype(np.int32)
    dst = rng.integers(0, v, size=e).astype(np.int32)
    w = rng.uniform(0.1, 2.0, size=e).astype(np.float32)
    csr = build_weighted_bf_csr_on_device(
        v, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    L = 64
    qs = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    act = jnp.ones(L, bool)
    want, wr = bellman_ford_with_iters(csr, qs, qd, act, v + 1)
    got, gr = bellman_ford_sparse(csr, qs, qd, act, v + 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert gr == int(np.asarray(wr))
    monkeypatch.setenv("DUCKPGQ_SPARSE_A", "16")
    monkeypatch.setenv("DUCKPGQ_SPARSE_E", "128")
    got2, _ = bellman_ford_sparse(csr, qs, qd, act, v + 1)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))


def test_bellman_ford_chunked_dense_matches():
    """Chunk-streamed dense BF sweep (wave-plan tables with f32/min) ==
    the one-shot dense kernel, including round counts."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs_jax as m
    from duckpgq_tpu.ops.csr_jax import build_weighted_bf_csr_on_device

    rng = np.random.default_rng(9)
    v, e = 300, 2048
    src = rng.integers(0, v, size=e).astype(np.int32)
    dst = rng.integers(0, v, size=e).astype(np.int32)
    w = rng.uniform(0.1, 2.0, size=e).astype(np.float32)
    csr = build_weighted_bf_csr_on_device(
        v, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    L = 64
    qs = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=L).astype(np.int32))
    act = jnp.ones(L, bool)
    want, wr = m.bellman_ford_with_iters(csr, qs, qd, act, v + 1)
    plan = m.plan_packed_wave(csr, lanes=32, n_chunks=4)
    deg = (csr.offsets[1:] - csr.offsets[:-1]).astype(jnp.int32)
    in_w = csr.w[csr.in_pos]
    lanes = jnp.arange(L)
    dist = jnp.full((csr.vpad + 1, L), jnp.inf, jnp.float32)
    dist = dist.at[qs, lanes].set(0.0)
    ch = jnp.zeros(csr.vpad + 1, bool).at[qs].set(True).at[
        csr.vpad].set(False)
    it, dist, ch, occ, tot = m._bf_chunked_dense_segment(
        csr, plan, in_w, deg, jnp.int32(0), jnp.int32(v + 1), dist, ch,
        0, 0)
    np.testing.assert_array_equal(np.asarray(dist[qd, lanes]),
                                  np.asarray(want))
    assert int(np.asarray(it)) == int(np.asarray(wr))
