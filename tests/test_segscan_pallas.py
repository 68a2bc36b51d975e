"""Pallas segmented OR-scan vs the XLA scan oracle (interpret mode)."""

import numpy as np
import pytest


def test_packed_bfs_with_pallas_scan(monkeypatch):
    monkeypatch.setenv("DUCKPGQ_SCAN_IMPL", "pallas")
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from duckpgq_tpu.ops import msbfs as host_msbfs
    from duckpgq_tpu.ops.csr import build_csr
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import msbfs_lengths_packed

    rng = np.random.default_rng(3)
    v, e = 70, 260
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    dcsr = build_device_csr(v, src, dst)
    L = 64
    qs = rng.integers(0, v, size=L).astype(np.int32)
    qd = rng.integers(0, v, size=L).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got, _ = msbfs_lengths_packed(
            dcsr, jnp.asarray(qs), jnp.asarray(qd),
            jnp.ones(L, bool), v)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs.astype(np.int64), qd.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.where(valid, want, -1))


@pytest.mark.parametrize("seed,E,W,chunk", [
    (0, 2048, 4, 256), (1, 1024, 16, 512), (2, 4096, 2, 128)])
def test_seg_or_scan_rows_matches_oracle(seed, E, W, chunk):
    """Lane-major kernel (the layout the packed BFS uses)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from duckpgq_tpu.kernels.segscan_pallas import seg_or_scan_rows

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 32, size=(W, E), dtype=np.uint32)
    heads = rng.random(E) < 0.05
    heads[0] = True
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(seg_or_scan_rows(
            jnp.asarray(vals), jnp.asarray(heads), chunk=chunk))
    acc = np.zeros(W, dtype=np.uint32)
    want = np.zeros_like(vals)
    for i in range(E):
        acc = vals[:, i].copy() if heads[i] else acc | vals[:, i]
        want[:, i] = acc
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,E,W,chunk", [
    (0, 2048, 4, 256), (1, 1024, 16, 512), (2, 4096, 2, 128)])
def test_seg_or_scan_matches_oracle(seed, E, W, chunk):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from duckpgq_tpu.kernels.segscan_pallas import seg_or_scan_packed

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 32, size=(E, W), dtype=np.uint32)
    # random run structure incl. runs crossing chunk boundaries
    heads = rng.random(E) < 0.05
    heads[0] = True
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(seg_or_scan_packed(
            jnp.asarray(vals), jnp.asarray(heads), chunk=chunk))
    want = np.zeros_like(vals)
    acc = np.zeros(W, dtype=np.uint32)
    for i in range(E):
        if heads[i]:
            acc = vals[i].copy()
        else:
            acc = acc | vals[i]
        want[i] = acc
    np.testing.assert_array_equal(got, want)
