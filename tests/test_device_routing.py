"""SQL -> device routing for the full kernel surface (VERDICT round 1 item 1):
every scalar kernel the reference registers (scalar.hpp:7-20) must produce
bit-identical results when forced through the TPU device path
(DUCKPGQ_DEVICE_MIN_EDGES=0) as on the host/native backends."""

import numpy as np
import pytest

import duckpgq_tpu.ops.algorithms as algs
import duckpgq_tpu.ops.msbfs as msbfs
from duckpgq_tpu.ops.csr import build_csr


def random_csr(seed, v=48, e=180, symmetric=False, self_loops=True,
               weights=None):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    if not self_loops:
        dst = np.where(src == dst, (dst + 1) % v, dst)
    if symmetric:
        pairs = np.unique(np.stack([np.concatenate([src, dst]),
                                    np.concatenate([dst, src])], axis=1),
                          axis=0)
        src, dst = pairs[:, 0], pairs[:, 1]
        e = len(src)
    w = None
    w_is_double = False
    if weights == "int":
        w = rng.integers(1, 50, size=e).astype(np.int64)
    elif weights == "double":
        w = rng.uniform(0.5, 9.5, size=e)
        w_is_double = True
    return build_csr(v, src, dst, np.arange(e, dtype=np.int64), w,
                     w_is_double)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("symmetric", [False, True])
def test_wcc_device_ids_bit_exact(seed, symmetric, monkeypatch):
    """Device Boruvka-MSF + host replay reproduces the reference
    union-find's order-dependent component ids on directed multigraphs
    with self-loops and duplicate edges."""
    csr = random_csr(seed, symmetric=symmetric)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", str(10 ** 9))
    want = algs.weakly_connected_component(csr)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    got = algs.weakly_connected_component(csr)
    np.testing.assert_array_equal(got, want)


def test_wcc_device_edgeless(monkeypatch):
    csr = build_csr(5, np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64))
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    got = algs.weakly_connected_component(csr)
    np.testing.assert_array_equal(got, np.arange(6))


@pytest.mark.parametrize("seed", [0, 3])
def test_pagerank_device_matches_host(seed, monkeypatch):
    csr = random_csr(seed)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", str(10 ** 9))
    want = algs.pagerank(csr)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    got = algs.pagerank(csr)
    assert got.dtype == np.float64 and got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


def test_pagerank_device_dangling(monkeypatch):
    # vertices with no out-edges exercise the dangling-mass redistribution
    src = np.array([0, 0, 1], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    csr = build_csr(5, src, dst, np.arange(3, dtype=np.int64))
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", str(10 ** 9))
    want = algs.pagerank(csr)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    got = algs.pagerank(csr)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("seed", [0, 5])
def test_lcc_device_bit_exact(seed, monkeypatch):
    csr = random_csr(seed, symmetric=True, self_loops=False)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", str(10 ** 9))
    want = algs.local_clustering_coefficient(csr)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    got = algs.local_clustering_coefficient(csr)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("weights", ["int", "double"])
def test_cheapest_path_device_matches_host(weights, monkeypatch):
    csr = random_csr(7, weights=weights)
    rng = np.random.default_rng(17)
    qs = rng.integers(0, csr.vcount, size=70).astype(np.int64)
    qd = rng.integers(0, csr.vcount, size=70).astype(np.int64)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", str(10 ** 9))
    want, want_valid, want_dbl = msbfs.cheapest_path_length(csr, qs, qd)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    got, got_valid, got_dbl = msbfs.cheapest_path_length(csr, qs, qd)
    assert got_dbl == want_dbl
    np.testing.assert_array_equal(got_valid, want_valid)
    if weights == "int":
        np.testing.assert_array_equal(got, want)
    else:
        # DOUBLE weights run the device relaxation in float64 under scoped
        # x64 (reference computes doubles in double) — f64-tight agreement
        assert got.dtype == np.float64
        np.testing.assert_allclose(got[got_valid], want[want_valid],
                                   rtol=1e-12)


def test_cheapest_path_big_int_weights_stay_exact(monkeypatch):
    """Integer weights outside the float32-exact window must NOT route to
    the f32 device kernel."""
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    w = np.array([2 ** 30 + 1, 2 ** 30 + 3], dtype=np.int64)
    csr = build_csr(3, src, dst, np.arange(2, dtype=np.int64), w, False)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    out, valid, is_dbl = msbfs.cheapest_path_length(
        csr, np.array([0]), np.array([2]))
    assert not is_dbl and valid[0]
    assert int(out[0]) == 2 ** 31 + 4


@pytest.mark.parametrize("seed", [0, 9])
def test_shortest_path_device_route_matches_host(seed, monkeypatch):
    csr = random_csr(seed)
    rng = np.random.default_rng(seed + 1)
    qs = rng.integers(0, csr.vcount, size=50).astype(np.int64)
    qd = rng.integers(0, csr.vcount, size=50).astype(np.int64)
    qs[2] = qd[2]
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", str(10 ** 9))
    want, want_valid = msbfs.shortest_path(csr, qs, qd)
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    got, got_valid = msbfs.shortest_path(csr, qs, qd)
    np.testing.assert_array_equal(got_valid, want_valid)
    assert got == want  # identical paths incl. the parent tie-break
