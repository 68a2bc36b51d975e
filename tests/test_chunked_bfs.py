"""Chunked wide-wave packed MS-BFS (ops/msbfs_jax.py PackedWavePlan) vs the
host oracle, and the carry-threaded Pallas segscan vs the XLA scan."""

import numpy as np
import pytest


def _graph(seed, v, e):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    return src, dst


@pytest.mark.parametrize("seed,v,e,n_chunks", [
    (3, 70, 260, 2), (4, 33, 700, 4), (5, 200, 1500, 8)])
def test_chunked_matches_host_oracle(seed, v, e, n_chunks):
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs as host_msbfs
    from duckpgq_tpu.ops.csr import build_csr
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import (msbfs_lengths_packed_planned,
                                           plan_packed_wave)

    src, dst = _graph(seed, v, e)
    dcsr = build_device_csr(v, src, dst)
    assert dcsr.epad % n_chunks == 0
    plan = plan_packed_wave(dcsr, lanes=4096, n_chunks=n_chunks)
    assert plan.n_chunks == n_chunks
    rng = np.random.default_rng(seed + 100)
    L = 4096
    qs = rng.integers(0, v, size=L).astype(np.int32)
    qd = rng.integers(0, v, size=L).astype(np.int32)
    got, traversed = msbfs_lengths_packed_planned(
        dcsr, plan, jnp.asarray(qs), jnp.asarray(qd),
        jnp.ones(L, bool), v)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs.astype(np.int64), qd.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.where(valid, want, -1))
    assert float(np.asarray(traversed).sum()) > 0


def test_chunked_matches_single_dispatch():
    """Same wave, n_chunks 1 vs 4: identical lengths and traversed counts."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import (msbfs_lengths_packed_planned,
                                           plan_packed_wave)

    src, dst = _graph(7, 120, 900)
    dcsr = build_device_csr(120, src, dst)
    rng = np.random.default_rng(8)
    L = 4096
    qs = jnp.asarray(rng.integers(0, 120, size=L).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, 120, size=L).astype(np.int32))
    act = jnp.ones(L, bool)
    p1 = plan_packed_wave(dcsr, lanes=L, n_chunks=1)
    p4 = plan_packed_wave(dcsr, lanes=L, n_chunks=4)
    r1, t1 = msbfs_lengths_packed_planned(dcsr, p1, qs, qd, act, 120)
    r4, t4 = msbfs_lengths_packed_planned(dcsr, p4, qs, qd, act, 120)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r4))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t4))


def test_chunked_pallas_scan_path():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from duckpgq_tpu.ops import msbfs as host_msbfs
    from duckpgq_tpu.ops.csr import build_csr
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import (msbfs_lengths_packed_planned,
                                           plan_packed_wave)

    src, dst = _graph(11, 64, 500)
    dcsr = build_device_csr(64, src, dst)
    plan = plan_packed_wave(dcsr, lanes=4096, n_chunks=2)
    rng = np.random.default_rng(12)
    L = 4096
    qs = rng.integers(0, 64, size=L).astype(np.int32)
    qd = rng.integers(0, 64, size=L).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got, _ = msbfs_lengths_packed_planned(
            dcsr, plan, jnp.asarray(qs), jnp.asarray(qd),
            jnp.ones(L, bool), 64, use_pallas=True)
    csr = build_csr(64, src, dst, np.arange(500, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs.astype(np.int64), qd.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.where(valid, want, -1))


def test_plan_rejects_non_dividing_chunks():
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import plan_packed_wave

    src, dst = _graph(31, 50, 200)
    dcsr = build_device_csr(50, src, dst)
    assert dcsr.epad % 3 != 0
    with pytest.raises(ValueError):
        plan_packed_wave(dcsr, lanes=4096, n_chunks=3)


def test_plan_infeasible_width_falls_back_narrow():
    """An explicit wave width whose resident vertex state alone exceeds the
    budget must degrade to the single-dispatch narrow plan, not a bogus
    256-chunk wide plan."""
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import plan_packed_wave

    src, dst = _graph(32, 300, 2000)
    dcsr = build_device_csr(300, src, dst)
    tiny_budget = 2 << 20  # 2 MB: no wide wave fits
    plan = plan_packed_wave(dcsr, lanes=8192, hbm_budget=tiny_budget)
    assert plan.n_chunks == 1
    assert plan.lanes < 8192


def test_batched_planned_matches_narrow_waves():
    """The wide planned batching path (used on accelerators for >=4096-query
    batches) returns the same lengths/traversed as narrow fixed waves."""
    from duckpgq_tpu.ops import msbfs_jax as dev
    from duckpgq_tpu.ops.csr_jax import build_device_csr

    src, dst = _graph(21, 150, 1100)
    dcsr = build_device_csr(150, src, dst)
    rng = np.random.default_rng(22)
    n = 5000
    qs = rng.integers(0, 150, size=n).astype(np.int64)
    qd = rng.integers(0, 150, size=n).astype(np.int64)
    plan = dev.plan_packed_wave(dcsr, lanes=4096, n_chunks=2)
    got, trav_p = dev._msbfs_batched_planned(dcsr, plan, qs, qd)
    want, trav_n = dev.msbfs_lengths_batched(dcsr, qs, qd, lanes=512)
    np.testing.assert_array_equal(got, want)
    assert trav_p == trav_n


@pytest.mark.parametrize("seed,E,W,chunk,splits", [
    (5, 1024, 8, 256, 2), (6, 2048, 4, 128, 4)])
def test_seg_or_scan_rows_carry_matches_unsplit(seed, E, W, chunk, splits):
    """Lane-major carry variant: split scans with the carry threaded equal
    one unsplit lane-major scan."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from duckpgq_tpu.kernels.segscan_pallas import (seg_or_scan_rows,
                                                    seg_or_scan_rows_carry)

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 32, size=(W, E), dtype=np.uint32)
    heads = rng.random(E) < 0.03
    heads[0] = True
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(seg_or_scan_rows(
            jnp.asarray(vals), jnp.asarray(heads), chunk=chunk))
        got = np.zeros_like(vals)
        carry = jnp.zeros((W, 1), jnp.uint32)
        Ec = E // splits
        for k in range(splits):
            piece, carry = seg_or_scan_rows_carry(
                jnp.asarray(vals[:, k * Ec:(k + 1) * Ec]),
                jnp.asarray(heads[k * Ec:(k + 1) * Ec]), carry, chunk=chunk)
            got[:, k * Ec:(k + 1) * Ec] = np.asarray(piece)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,E,W,chunk,splits", [
    (0, 1024, 128, 256, 2), (1, 2048, 128, 128, 4)])
def test_seg_or_scan_carry_matches_unsplit(seed, E, W, chunk, splits):
    """Scanning in `splits` pieces with the carry threaded through equals
    one unsplit scan."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from duckpgq_tpu.kernels.segscan_pallas import (seg_or_scan_packed,
                                                    seg_or_scan_packed_carry)

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 32, size=(E, W), dtype=np.uint32)
    heads = rng.random(E) < 0.03
    heads[0] = True
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(seg_or_scan_packed(
            jnp.asarray(vals), jnp.asarray(heads), chunk=chunk))
        got = np.zeros_like(vals)
        carry = jnp.zeros((1, W), jnp.uint32)
        Ec = E // splits
        for k in range(splits):
            piece, carry = seg_or_scan_packed_carry(
                jnp.asarray(vals[k * Ec:(k + 1) * Ec]),
                jnp.asarray(heads[k * Ec:(k + 1) * Ec]), carry, chunk=chunk)
            got[k * Ec:(k + 1) * Ec] = np.asarray(piece)
    np.testing.assert_array_equal(got, want)


def test_chunked_narrow_wave_matches_host():
    """Chunked plans with W < 128 (the RMAT-23+ fallback widths where the
    resident [Vp, W] state caps the wave) produce exact results."""
    import jax.numpy as jnp
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import (PackedWavePlan,
                                           msbfs_lengths_packed_planned,
                                           plan_packed_wave)

    rng = np.random.default_rng(99)
    v, e = 200, 1024
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    dcsr = build_device_csr(v, src, dst)
    lanes = 64 * 32                                   # W = 64
    plan = plan_packed_wave(dcsr, lanes=lanes, n_chunks=4)
    assert plan.lanes == lanes and plan.n_chunks == 4
    qs = rng.integers(0, v, size=lanes).astype(np.int32)
    qd = rng.integers(0, v, size=lanes).astype(np.int32)
    got, _ = msbfs_lengths_packed_planned(
        dcsr, plan, jnp.asarray(qs), jnp.asarray(qd),
        jnp.ones(lanes, dtype=bool), v, False)
    from duckpgq_tpu.ops import msbfs as host_msbfs
    from duckpgq_tpu.ops.csr import build_csr
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs.astype(np.int64), qd.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.where(valid, want, -1))


@pytest.mark.parametrize("seed,E,W,block", [
    (17, 4096, 4, 256), (18, 2048, 16, 128)])
def test_seg_or_scan_blocked_matches_one_shot(seed, E, W, block):
    """The blocked lax.scan formulation (compile size O(log block), the
    RMAT-23/24 AOT-helper escape) is bit-identical to the one-shot
    associative scan, including a non-trivial incoming carry."""
    import jax
    import jax.numpy as jnp

    from duckpgq_tpu.ops.msbfs_jax import (_seg_or_pair,
                                           _seg_or_scan_blocked)

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 32, size=(E, W), dtype=np.uint32)
    heads = rng.random(E) < 0.02
    carry_in = rng.integers(0, 1 << 32, size=(1, W), dtype=np.uint32)

    g = jnp.asarray(vals)
    hds = jnp.asarray(heads)
    g0 = g[0] | jnp.where(hds[0], jnp.uint32(0), jnp.asarray(carry_in)[0])
    g_seeded = g.at[0].set(g0)
    _, want = jax.lax.associative_scan(
        _seg_or_pair, (hds.astype(jnp.int32).reshape(-1, 1), g_seeded),
        axis=0)
    got, carry_out = _seg_or_scan_blocked(
        g, hds, jnp.asarray(carry_in), block)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(carry_out),
                                  np.asarray(want)[-1:])


def test_chunked_blocked_scan_matches_host(monkeypatch):
    """Force a tiny scan block so the chunked kernel takes the blocked
    lax.scan path end-to-end; results must stay exact vs the host oracle."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs as host_msbfs
    from duckpgq_tpu.ops.csr import build_csr
    from duckpgq_tpu.ops.csr_jax import build_device_csr
    from duckpgq_tpu.ops.msbfs_jax import (msbfs_lengths_packed_planned,
                                           plan_packed_wave)

    monkeypatch.setenv("DUCKPGQ_SCAN_BLOCK", "64")
    rng = np.random.default_rng(41)
    v, e = 300, 2048
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    dcsr = build_device_csr(v, src, dst)
    lanes = 48 * 32                                    # W = 48 (RMAT-23 wave)
    plan = plan_packed_wave(dcsr, lanes=lanes, n_chunks=2)
    assert plan.n_chunks == 2
    assert (dcsr.epad // plan.n_chunks) > 64           # blocked path taken
    qs = rng.integers(0, v, size=lanes).astype(np.int32)
    qd = rng.integers(0, v, size=lanes).astype(np.int32)
    got, _ = msbfs_lengths_packed_planned(
        dcsr, plan, jnp.asarray(qs), jnp.asarray(qd),
        jnp.ones(lanes, dtype=bool), v, False)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs.astype(np.int64), qd.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.where(valid, want, -1))


def test_stepped_matches_monolithic(monkeypatch):
    """The host-stepped chunked wave (seg_iters per dispatch, donated
    state) returns exactly the monolithic while_loop kernel's results,
    including early exit when the frontier empties mid-segment."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs_jax as dev
    from duckpgq_tpu.ops.csr_jax import build_device_csr

    rng = np.random.default_rng(55)
    v, e = 250, 1500
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    dcsr = build_device_csr(v, src, dst)
    lanes = 4096
    plan = dev.plan_packed_wave(dcsr, lanes=lanes, n_chunks=4)
    qs = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    act = jnp.ones(lanes, dtype=bool)
    want, tw = dev._msbfs_lengths_packed_chunked(
        dcsr, plan, qs, qd, act, v, False)
    for seg in (1, 3, 64):
        got, tg = dev._msbfs_chunked_stepped(
            dcsr, plan, qs, qd, act, v, False, seg)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(tg), np.asarray(tw))


def test_lane_major_chunked_matches_edge_major(monkeypatch):
    """The lane-major ([W, Vp+1]) chunked wave — the W < 128 default, which
    avoids XLA's T(8,128) minor-dim padding — is bit-identical to the
    edge-major kernel, stepped and monolithic, including the blocked scan."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs_jax as dev
    from duckpgq_tpu.ops.csr_jax import build_device_csr

    monkeypatch.setenv("DUCKPGQ_SCAN_BLOCK", "64")
    rng = np.random.default_rng(77)
    v, e = 220, 1800
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    dcsr = build_device_csr(v, src, dst)
    lanes = 48 * 32                                    # W = 48
    plan = dev.plan_packed_wave(dcsr, lanes=lanes, n_chunks=4)
    qs = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    act = jnp.ones(lanes, dtype=bool)
    want, tw = dev._msbfs_lengths_packed_chunked(
        dcsr, plan, qs, qd, act, v, False)
    for seg in (2, v):
        got, tg = dev._msbfs_chunked_stepped(
            dcsr, plan, qs, qd, act, v, False, seg, lane_major=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(tg), np.asarray(tw))
    # and the planned entry point routes narrow waves to lane-major
    got, tg = dev.msbfs_lengths_packed_planned(dcsr, plan, qs, qd, act, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sparse_tail_matches_monolithic(monkeypatch):
    """The sparse-frontier tail (VERDICT r3 item 2): host-stepped waves
    switch to compact active-vertex expansion when the frontier collapses
    under the static budgets, bit-identical to the dense kernel in both
    layouts — including budget-overflow fallback to dense mid-run."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs_jax as dev
    from duckpgq_tpu.ops.csr_jax import build_device_csr

    monkeypatch.setenv("DUCKPGQ_SCAN_BLOCK", "64")
    rng = np.random.default_rng(91)
    v, e = 300, 2200
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    dcsr = build_device_csr(v, src, dst)
    lanes = 16 * 32                                    # W = 16 narrow
    plan = dev.plan_packed_wave(dcsr, lanes=lanes, n_chunks=4)
    qs = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    act = jnp.ones(lanes, dtype=bool)
    want, tw = dev._msbfs_lengths_packed_chunked(
        dcsr, plan, qs, qd, act, v, False)

    calls = {"n": 0}
    orig = dev._sparse_wave_segment

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(dev, "_sparse_wave_segment", counting)
    for lane_major in (True, False):
        # generous budgets: sparse engages right after the first segment
        monkeypatch.setenv("DUCKPGQ_SPARSE_A", "8192")
        monkeypatch.setenv("DUCKPGQ_SPARSE_E", "8192")
        calls["n"] = 0
        got, tg = dev._msbfs_chunked_stepped(
            dcsr, plan, qs, qd, act, v, False, 1, lane_major=lane_major)
        assert calls["n"] > 0, "sparse tail never engaged"
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(tg), np.asarray(tw))
        # tiny active-set budget: the saturated mid-wave exceeds it
        # (dense), only the thin head/tail iterations qualify
        monkeypatch.setenv("DUCKPGQ_SPARSE_A", "32")
        calls["n"] = 0
        got, tg = dev._msbfs_chunked_stepped(
            dcsr, plan, qs, qd, act, v, False, 1, lane_major=lane_major)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(tg), np.asarray(tw))
    # disabled: no sparse dispatches at all
    monkeypatch.setenv("DUCKPGQ_SPARSE_TAIL", "0")
    calls["n"] = 0
    got, tg = dev._msbfs_chunked_stepped(
        dcsr, plan, qs, qd, act, v, False, 1, lane_major=True)
    assert calls["n"] == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_slim_csr_wave_bit_identical(monkeypatch):
    """csr_slim_waves (round 5): packed head bits + prebuilt out_dst
    replace in_dst — the chunked waves (both layouts, sparse tail on)
    must be bit-identical to the unslimmed CSR."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs_jax as dev
    from duckpgq_tpu.ops.csr_jax import (build_device_csr,
                                         build_lengths_csr_on_device,
                                         csr_slim_waves)

    monkeypatch.setenv("DUCKPGQ_SCAN_BLOCK", "64")
    rng = np.random.default_rng(92)
    v, e = 300, 2200
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    dcsr = build_lengths_csr_on_device(
        v, jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)))
    slim = csr_slim_waves(dcsr)
    assert slim.in_dst is None and slim.heads is not None
    assert slim.e is not None            # sparse-tail out_dst prebuilt
    # packed head bits must decode to exactly segment_heads(in_dst)
    from duckpgq_tpu.ops.segscan import segment_heads
    want_heads = np.asarray(segment_heads(dcsr.in_dst))
    hw = np.asarray(slim.heads)
    got_heads = ((hw[:, None] >> np.arange(32)) & 1).astype(bool).reshape(-1)
    np.testing.assert_array_equal(got_heads[:len(want_heads)], want_heads)

    lanes = 16 * 32
    plan = dev.plan_packed_wave(dcsr, lanes=lanes, n_chunks=4)
    qs = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    qd = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    act = jnp.ones(lanes, dtype=bool)
    want, tw = dev._msbfs_lengths_packed_chunked(
        dcsr, plan, qs, qd, act, v, False)
    for lane_major in (True, False):
        got, tg = dev._msbfs_chunked_stepped(
            slim, plan, qs, qd, act, v, False, 2, lane_major=lane_major)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_allclose(np.asarray(tg), np.asarray(tw))
    # monolithic chunked kernel on the slim CSR too
    got, tg = dev._msbfs_lengths_packed_chunked(
        slim, plan, qs, qd, act, v, False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # full (non-lengths) CSR slims too and keeps its e
    full = build_device_csr(v, src, dst)
    slim_full = csr_slim_waves(full)
    assert slim_full.e is full.e
    got, _ = dev._msbfs_lengths_packed_chunked(
        slim_full, plan, qs, qd, act, v, False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_build_out_dst_device_lengths_only():
    """build_out_dst_device on a lengths-only CSR reproduces the full
    build's forward-view destinations (same multiset per source; the
    sparse tail only ORs over them, so per-source order is free)."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs_jax as dev
    from duckpgq_tpu.ops.csr_jax import build_device_csr

    rng = np.random.default_rng(13)
    v, e = 150, 900
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    full = build_device_csr(v, src, dst)
    lo = build_device_csr(v, src, dst, lengths_only=True)
    got = np.asarray(dev.build_out_dst_device(lo))
    want = np.asarray(full.e)
    offs = np.asarray(full.offsets)
    for vtx in range(v):
        a, b = offs[vtx], offs[vtx + 1]
        np.testing.assert_array_equal(np.sort(got[a:b]),
                                      np.sort(want[a:b]))


def test_runs_csr_wave_matches_host():
    """Multi-run CSR wave (the RMAT-26 single-chip path: runs sorted in
    place, per-run chunk streams ORed) matches the host oracle and the
    standard chunked kernel."""
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs as host_msbfs
    from duckpgq_tpu.ops import msbfs_jax as dev
    from duckpgq_tpu.ops.csr import build_csr
    from duckpgq_tpu.ops.csr_jax import build_lengths_csr_runs_on_device

    rng = np.random.default_rng(44)
    v, e = 260, 2048
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    runs = build_lengths_csr_runs_on_device(
        v, jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)), n_runs=4)
    plans = dev.plan_runs_wave(runs, lanes=64, ec_cap=128)
    assert plans[0].n_chunks > 1
    L = 64
    qs = rng.integers(0, v, size=L).astype(np.int32)
    qd = rng.integers(0, v, size=L).astype(np.int32)
    qs[2] = qd[2]
    act = np.ones(L, bool)
    act[-2:] = False
    got, trav = dev.msbfs_lengths_runs(
        runs, plans, jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(act),
        v, seg_iters=3)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(
        csr, qs.astype(np.int64), qd.astype(np.int64))
    want = np.where(valid & act, want, -1)
    np.testing.assert_array_equal(np.asarray(got), want)
    # TEPS: out-degree accounting matches graph500 semantics
    deg = np.bincount(src, minlength=v)
    assert float(np.asarray(trav)[0]) > 0
    # trivial lane (src == dst) traverses its own component too
    assert np.asarray(trav).shape == (L,)

    # SLIMMED CSR (round 5, the RMAT-26 memory lever): packed head bits
    # replace in_dst, run_offsets freed post-planning — bit-identical
    from duckpgq_tpu.ops.csr_jax import runs_with_head_bits
    slim = runs_with_head_bits(runs, drop_in_dst=True,
                               drop_run_offsets=True, chunk=256)
    assert slim.in_dst is None and slim.run_offsets is None
    got2, trav2 = dev.msbfs_lengths_runs(
        slim, plans, jnp.asarray(qs), jnp.asarray(qd), jnp.asarray(act),
        v, seg_iters=3)
    np.testing.assert_array_equal(np.asarray(got2), want)
    np.testing.assert_array_equal(np.asarray(trav2), np.asarray(trav))

    # auto width: the fit model must return a usable plan on tiny graphs
    plans_auto = dev.plan_runs_wave(runs, lanes=None, ec_cap=128)
    assert plans_auto[0].lanes >= 32
    La = plans_auto[0].lanes
    qs_a = np.resize(qs, La).astype(np.int32)
    qd_a = np.resize(qd, La).astype(np.int32)
    act_a = np.ones(La, bool)
    got3, _ = dev.msbfs_lengths_runs(
        slim, plans_auto, jnp.asarray(qs_a), jnp.asarray(qd_a),
        jnp.asarray(act_a), v, seg_iters=3)
    want3, valid3 = host_msbfs.iterative_length(
        csr, qs_a.astype(np.int64), qd_a.astype(np.int64))
    np.testing.assert_array_equal(
        np.asarray(got3), np.where(valid3, want3, -1))
