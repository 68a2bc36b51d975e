"""SQL → distributed-mesh kernel routing (parallel/sql_mesh).

Every SQL-facing graph kernel must produce BIT-IDENTICAL results whether it
runs single-device or routed through the 8-device mesh implementations
(`SET pgq_mesh_devices = 8` / DUCKPGQ_MESH_DEVICES). The corpus mesh
parameterization (test_sqllogic_corpus.test_corpus_file_mesh_kernels) covers
the reference tests; this file adds randomized cross-checks per kernel,
including the cases the corpus graphs are too small to reach (multi-edges,
relabel-sensitive tie-breaks, double weights).
"""

import numpy as np
import pytest

from duckpgq_tpu.ops import algorithms as algs
from duckpgq_tpu.ops import msbfs
from duckpgq_tpu.ops.csr import build_csr
from duckpgq_tpu.parallel import sql_mesh


@pytest.fixture()
def mesh8():
    sql_mesh.configure(8)
    yield 8
    sql_mesh.configure(None)


def _rand_graph(v, e, seed, multi=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    if multi:  # force parallel edges to exercise edge-id tie-breaks
        src[: e // 8] = src[e // 2: e // 2 + e // 8]
        dst[: e // 8] = dst[e // 2: e // 2 + e // 8]
    return build_csr(v, src, dst, np.arange(e, dtype=np.int64))


def _queries(v, n, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, size=n).astype(np.int64)
    dst = rng.integers(0, v, size=n).astype(np.int64)
    src[3] = dst[3]  # trivial
    valid = np.ones(n, dtype=bool)
    valid[-2] = False
    return src, dst, valid


def test_mesh_iterative_length_matches_host(mesh8):
    csr = _rand_graph(113, 500, 11)
    src, dst, valid = _queries(113, 70, 12)
    got, gv = msbfs.iterative_length(csr, src, dst, valid)
    sql_mesh.configure(None)
    want, wv = msbfs.iterative_length(csr, src, dst, valid)
    np.testing.assert_array_equal(gv, wv)
    np.testing.assert_array_equal(got[gv], want[wv])


def test_mesh_reachability_matches_host(mesh8):
    csr = _rand_graph(97, 300, 21)
    src, dst, valid = _queries(97, 40, 22)
    got, gv = msbfs.reachability(csr, src, dst, valid)
    sql_mesh.configure(None)
    want, wv = msbfs.reachability(csr, src, dst, valid)
    np.testing.assert_array_equal(gv, wv)
    np.testing.assert_array_equal(got[gv], want[wv])


def test_mesh_shortest_path_matches_host_including_edge_ids(mesh8):
    csr = _rand_graph(89, 400, 31, multi=True)
    src, dst, valid = _queries(89, 48, 32)
    got, gv = msbfs.shortest_path(csr, src, dst, valid)
    sql_mesh.configure(None)
    want, wv = msbfs.shortest_path(csr, src, dst, valid)
    np.testing.assert_array_equal(gv, wv)
    for g, w, ok in zip(got, want, gv):
        if ok:
            assert g == w  # full [v0, e0, v1, ...] incl. edge-id tie-break


def test_mesh_bidirectional_matches_host(mesh8):
    # directed graph: exercises the reference's whole-wave early exit
    csr = _rand_graph(64, 150, 41)
    src, dst, valid = _queries(64, 33, 42)
    got, gv = msbfs.iterative_length_bidirectional(csr, src, dst, valid)
    sql_mesh.configure(None)
    want, wv = msbfs.iterative_length_bidirectional(csr, src, dst, valid)
    np.testing.assert_array_equal(gv, wv)
    np.testing.assert_array_equal(got[gv], want[wv])


def test_mesh_cheapest_path_length_int_and_double(mesh8):
    rng = np.random.default_rng(51)
    v, e = 73, 350
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    for dbl in (False, True):
        if dbl:
            w = rng.uniform(0.5, 4.0, size=e)
            csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64),
                            w=w, w_is_double=True)
        else:
            w = rng.integers(1, 9, size=e).astype(np.int64)
            csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64), w=w)
        qs, qd, valid = _queries(v, 37, 52)
        sql_mesh.configure(8)
        got, gv, gd = msbfs.cheapest_path_length(csr, qs, qd, valid)
        sql_mesh.configure(None)
        want, wv, wd = msbfs.cheapest_path_length(csr, qs, qd, valid)
        assert gd == wd == dbl
        np.testing.assert_array_equal(gv, wv)
        if dbl:
            np.testing.assert_allclose(got[gv], want[wv], rtol=1e-12)
        else:
            np.testing.assert_array_equal(got[gv], want[wv])


def test_mesh_pagerank_reference_quirk(mesh8):
    csr = _rand_graph(101, 420, 61)
    got = algs.pagerank(csr)
    sql_mesh.configure(None)
    want = algs.pagerank(csr)
    assert got.shape == want.shape == (csr.vsize,)
    # f64 fixpoint with the V+2 denominator quirk; shard-order summation
    # may differ in the last ulps only
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-15)
    # phantom tail entries share one value
    assert got[csr.vcount] == got[csr.vsize - 1]


def test_mesh_wcc_exact_reference_ids(mesh8):
    csr = _rand_graph(120, 260, 71, multi=True)
    got = algs.weakly_connected_component(csr)
    sql_mesh.configure(None)
    want = algs.weakly_connected_component(csr)
    np.testing.assert_array_equal(got, want)  # exact order-dependent ids


def test_mesh_lcc_bit_exact(mesh8):
    # undirected symmetrized dedup'd graph (what the SQL layer hands LCC)
    rng = np.random.default_rng(81)
    v, e = 60, 300
    a = rng.integers(0, v, size=e)
    b = rng.integers(0, v, size=e)
    keep = a != b
    a, b = a[keep], b[keep]
    und = {(min(x, y), max(x, y)) for x, y in zip(a, b)}
    src = np.array([x for x, y in und] + [y for x, y in und], dtype=np.int64)
    dst = np.array([y for x, y in und] + [x for x, y in und], dtype=np.int64)
    csr = build_csr(v, src, dst, np.arange(len(src), dtype=np.int64))
    got = algs.local_clustering_coefficient(csr)
    sql_mesh.configure(None)
    want = algs.local_clustering_coefficient(csr)
    np.testing.assert_array_equal(got, want)


def test_mesh_edgeless_csr(mesh8):
    # kleene_star.test shape: a valid CSR with zero edges
    csr = build_csr(12, np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64))
    src = np.array([0, 3, 5], dtype=np.int64)
    dst = np.array([0, 4, 5], dtype=np.int64)
    lengths, valid = msbfs.iterative_length(csr, src, dst, None)
    np.testing.assert_array_equal(valid, [True, False, True])
    np.testing.assert_array_equal(lengths[valid], [0, 0])


def test_set_statement_configures_mesh():
    import duckpgq_tpu
    from duckpgq_tpu.errors import DuckPGQError
    con = duckpgq_tpu.connect()
    try:
        con.execute("SET pgq_mesh_devices = 8")
        assert sql_mesh.active_n() == 8
        con.execute("SET pgq_mesh_devices = 1")
        assert sql_mesh.active_n() == 0
        # more shards than visible devices: clean binder error at SET
        # time, and the rejected value must NOT linger in settings
        con2 = duckpgq_tpu.connect()
        with pytest.raises(DuckPGQError):
            con2.execute("SET pgq_mesh_devices = 512")
        assert "pgq_mesh_devices" not in con2.settings
    finally:
        sql_mesh.configure(None)
