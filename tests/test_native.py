"""Native C++ runtime (native/graphrt.cpp) cross-checked against the exact
numpy mirrors on random graphs."""

import numpy as np
import pytest

from duckpgq_tpu import native_rt
from duckpgq_tpu.ops import algorithms, msbfs
from duckpgq_tpu.ops.csr import build_csr

pytestmark = pytest.mark.skipif(not native_rt.available(),
                                reason="native runtime not built")


def random_csr(seed, v=60, e=240, weighted=False, wdouble=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    w = None
    if weighted:
        if wdouble:
            w = rng.uniform(0.5, 5.0, size=e)
        else:
            w = rng.integers(1, 9, size=e).astype(np.int64)
    return build_csr(v, src, dst, np.arange(e, dtype=np.int64),
                     w=w, w_is_double=wdouble)


def _numpy_only(monkeypatch):
    monkeypatch.setattr(native_rt, "available", lambda: False)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_bfs_matches_numpy(seed, monkeypatch):
    csr = random_csr(seed)
    rng = np.random.default_rng(seed + 50)
    qs = rng.integers(0, csr.vcount, size=700).astype(np.int64)
    qd = rng.integers(0, csr.vcount, size=700).astype(np.int64)
    qs[3] = qd[3]
    got_len, got_valid = msbfs.iterative_length(csr, qs, qd)
    _numpy_only(monkeypatch)
    want_len, want_valid = msbfs.iterative_length(csr, qs, qd)
    np.testing.assert_array_equal(got_valid, want_valid)
    np.testing.assert_array_equal(got_len[got_valid], want_len[want_valid])


@pytest.mark.parametrize("seed", [3, 4])
def test_native_paths_match_numpy(seed, monkeypatch):
    csr = random_csr(seed, v=40, e=150)
    rng = np.random.default_rng(seed + 60)
    qs = rng.integers(0, csr.vcount, size=90).astype(np.int64)
    qd = rng.integers(0, csr.vcount, size=90).astype(np.int64)
    qs[0] = qd[0]
    got_paths, got_valid = msbfs.shortest_path(csr, qs, qd)
    _numpy_only(monkeypatch)
    want_paths, want_valid = msbfs.shortest_path(csr, qs, qd)
    np.testing.assert_array_equal(got_valid, want_valid)
    assert got_paths == want_paths


@pytest.mark.parametrize("wdouble", [False, True])
def test_native_bellman_ford_matches_numpy(wdouble, monkeypatch):
    csr = random_csr(9, weighted=True, wdouble=wdouble)
    rng = np.random.default_rng(70)
    qs = rng.integers(0, csr.vcount, size=300).astype(np.int64)
    qd = rng.integers(0, csr.vcount, size=300).astype(np.int64)
    got, got_valid, got_dbl = msbfs.cheapest_path_length(csr, qs, qd)
    _numpy_only(monkeypatch)
    want, want_valid, want_dbl = msbfs.cheapest_path_length(csr, qs, qd)
    assert got_dbl == want_dbl
    np.testing.assert_array_equal(got_valid, want_valid)
    if wdouble:
        np.testing.assert_allclose(got[got_valid], want[want_valid],
                                   rtol=1e-12)
    else:
        np.testing.assert_array_equal(got[got_valid], want[want_valid])


def test_native_pagerank_matches_numpy(monkeypatch):
    csr = random_csr(11, v=64, e=300)
    got = algorithms.pagerank(csr)
    _numpy_only(monkeypatch)
    want = algorithms.pagerank(csr)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


def test_native_wcc_matches_numpy(monkeypatch):
    csr = random_csr(13, v=80, e=90)
    got = algorithms.weakly_connected_component(csr)
    _numpy_only(monkeypatch)
    want = algorithms.weakly_connected_component(csr)
    np.testing.assert_array_equal(got, want)


def test_native_lcc_matches_numpy(monkeypatch):
    csr = random_csr(15, v=50, e=400)
    got = algorithms.local_clustering_coefficient(csr)
    _numpy_only(monkeypatch)
    want = algorithms.local_clustering_coefficient(csr)
    np.testing.assert_array_equal(got, want)


def test_native_csr_build_matches():
    rng = np.random.default_rng(17)
    v, e = 30, 100
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    lib = native_rt._load()
    offsets = np.empty(v + 1, dtype=np.int64)
    e_out = np.empty(e, dtype=np.int64)
    pos = np.empty(e, dtype=np.int64)
    lib.gr_csr_build(v, e, src, dst, offsets, e_out, pos)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    np.testing.assert_array_equal(offsets, csr.v[:v + 1])
    np.testing.assert_array_equal(e_out, csr.e)
