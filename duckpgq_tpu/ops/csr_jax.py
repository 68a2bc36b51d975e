"""Device-side CSR: JAX/XLA build pipeline and the array bundle the TPU
kernels consume.

TPU-first design (SURVEY.md §7.1 item 5): degree histogram via segment_sum,
exclusive cumsum for offsets, stable sort of edges by source — no atomic
scatters (the reference's build, csr_creation.cpp, is an atomic-scatter design
for a shared-memory CPU; sort+segment is the bandwidth-optimal equivalent for
XLA).

All shapes are padded to static bucket sizes so jit caches stay warm across
graphs of similar size; the padding vertex is ``vpad`` (one past the real
vertex range) and padding edges point pad->pad.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_bucket(n: int, minimum: int = 128) -> int:
    """Next power-of-two-ish bucket (1, 1.5 steps) to bound recompiles."""
    n = max(n, minimum)
    p = 1 << (int(n - 1).bit_length())
    if n <= (p // 4) * 3:
        return (p // 4) * 3
    return p


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceCSR:
    """CSR on device. ``e``/``edge_src`` sorted by (src, insertion order);
    ``in_src``/``in_dst``/``in_pos`` are the in-edge view sorted by dst
    (for pull-style frontier expansion with sorted segment ids).

    A ``lengths_only`` CSR (see build_device_csr) carries ONLY the in-edge
    view: ``e``/``edge_src``/``edge_ids``/``in_pos`` are None so any kernel
    that needs the forward view (shortest paths, weights, LCC) fails fast
    instead of silently reading wrong values."""

    offsets: jnp.ndarray                # int32 [Vp + 1]
    e: Optional[jnp.ndarray]            # int32 [Ep]  dst per out-edge
    edge_src: Optional[jnp.ndarray]     # int32 [Ep]  src per out-edge
    edge_ids: Optional[jnp.ndarray]     # int32 [Ep]
    in_src: jnp.ndarray       # int32 [Ep]   source per in-edge (dst-sorted)
    in_dst: jnp.ndarray       # int32 [Ep]
    in_pos: Optional[jnp.ndarray]  # int32 [Ep]  position into e/edge_ids
    in_offsets: jnp.ndarray   # int32 [Vp + 1]  offsets of the in-edge view
    w: Optional[jnp.ndarray]  # float32 [Ep] or None
    vcount: int               # real V (static)
    ecount: int               # real E (static)
    lengths_only: bool = False
    # packed in-edge segment-head bits (bit j of word w = edge w*32+j);
    # when present the chunked waves read these instead of deriving heads
    # from in_dst, and a slimmed CSR may carry in_dst=None (csr_slim_waves:
    # frees 4*Ep bytes of HBM — the width lever at RMAT-23+)
    heads: Optional[jnp.ndarray] = None   # uint32 [Ep // 32]

    @property
    def vpad(self) -> int:
        return int(self.offsets.shape[0]) - 1

    @property
    def epad(self) -> int:
        return int(self.in_src.shape[0])

    def tree_flatten(self):
        children = (self.offsets, self.e, self.edge_src, self.edge_ids,
                    self.in_src, self.in_dst, self.in_pos, self.in_offsets,
                    self.w, self.heads)
        aux = (self.vcount, self.ecount, self.lengths_only)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (offsets, e, edge_src, edge_ids, in_src, in_dst, in_pos,
         in_offsets, w, heads) = children
        vcount, ecount, lengths_only = aux
        return cls(offsets, e, edge_src, edge_ids, in_src, in_dst, in_pos,
                   in_offsets, w, vcount, ecount, lengths_only, heads)


@functools.partial(jax.jit, static_argnames=("vpad", "epad"))
def _build_device_csr(src, dst, eid, w, vpad: int, epad: int):
    """src/dst/eid already padded to epad with pad entries = vpad."""
    order = jnp.argsort(src, stable=True)
    s = src[order]
    d = dst[order]
    ids = eid[order]
    counts = jax.ops.segment_sum(jnp.ones_like(s, dtype=jnp.int32), s,
                                 num_segments=vpad + 1)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts[:vpad]).astype(jnp.int32)])
    in_order = jnp.argsort(d, stable=True)
    in_counts = jax.ops.segment_sum(jnp.ones_like(d, dtype=jnp.int32), d,
                                    num_segments=vpad + 1)
    in_offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(in_counts[:vpad]).astype(jnp.int32)])
    out = {
        "offsets": offsets,
        "e": d, "edge_src": s, "edge_ids": ids,
        "in_src": s[in_order], "in_dst": d[in_order],
        "in_pos": in_order.astype(jnp.int32),
        "in_offsets": in_offsets,
    }
    if w is not None:
        out["w"] = w[order]
        out["in_w"] = out["w"][in_order]
    return out


def build_device_csr(vcount: int, src: np.ndarray, dst: np.ndarray,
                     edge_ids: Optional[np.ndarray] = None,
                     w: Optional[np.ndarray] = None,
                     vpad: Optional[int] = None,
                     epad: Optional[int] = None,
                     host_build: bool = True,
                     lengths_only: bool = False,
                     keep_w_dtype: bool = False) -> DeviceCSR:
    """Host arrays -> padded device CSR. Padding edges are (vpad -> vpad).

    By default the sort/prefix-sum pipeline runs on the host (numpy) and the
    finished arrays are device_put — the jitted variant (``host_build=False``)
    exists for data already resident on device, but XLA's sort/scatter
    compile on some backends costs minutes while the host build is O(E)
    and compile-free.

    ``lengths_only=True`` ships ONLY the arrays the BFS-lengths kernels
    read (the dst-sorted in-edge view ``in_src``/``in_dst`` plus both
    offset vectors) — a [2, epad] put instead of [6, epad], 3x less
    transfer on tunneled devices where the put runs at link speed. The
    unused fields (``e``/``edge_src``/``edge_ids``/``in_pos``) are None and
    ``lengths_only`` is set, so such a CSR only feeds the lengths kernels
    (msbfs_lengths / packed / planned / bidirectional / reachability) —
    anything touching the forward view fails fast on the None fields."""
    e = len(src)
    vpad = vpad or pad_bucket(vcount + 1)
    epad = epad or pad_bucket(max(e, 1))
    if edge_ids is None:
        edge_ids = np.arange(e, dtype=np.int64)

    def pad_edges_np(arr, fill):
        out = np.full(epad, fill, dtype=np.int32)
        out[:e] = arr.astype(np.int32)
        return out

    src_p = pad_edges_np(src, vpad)
    dst_p = pad_edges_np(dst, vpad)
    eid_p = pad_edges_np(edge_ids, -1)
    w_p = None
    if w is not None:
        # weights default to float32 (device perf path); keep_w_dtype keeps
        # float64 weights exact for the DOUBLE Bellman-Ford bridge (run
        # under scoped x64 — the reference computes doubles in double)
        wdt = np.float64 if (keep_w_dtype and
                             np.dtype(w.dtype) == np.float64) \
            else np.float32
        wf = np.zeros(epad, dtype=wdt)
        wf[:e] = w.astype(wdt)
        w_p = wf

    if host_build:
        order = np.argsort(src_p, kind="stable")
        s = src_p[order]
        d = dst_p[order]
        ids = eid_p[order]
        counts = np.bincount(s, minlength=vpad + 1)
        offsets = np.zeros(vpad + 1, dtype=np.int32)
        np.cumsum(counts[:vpad], out=offsets[1:])
        in_order = np.argsort(d, kind="stable")
        in_counts = np.bincount(d, minlength=vpad + 1)
        in_offsets = np.zeros(vpad + 1, dtype=np.int32)
        np.cumsum(in_counts[:vpad], out=in_offsets[1:])
        if lengths_only:
            assert w_p is None, "lengths_only CSR carries no weights"
            # separate puts (no [2, epad] stack): a stacked transfer would
            # need packed[k] slice executables — fresh compiles that can
            # queue minutes behind the shared helper; plain puts compile
            # nothing
            in_src_d = jnp.asarray(np.ascontiguousarray(s[in_order]))
            in_dst_d = jnp.asarray(np.ascontiguousarray(d[in_order]))
            out = DeviceCSR(
                offsets=jnp.asarray(offsets),
                e=None, edge_src=None, edge_ids=None, in_pos=None,
                in_src=in_src_d, in_dst=in_dst_d,
                in_offsets=jnp.asarray(in_offsets), w=None,
                vcount=vcount, ecount=e, lengths_only=True)
            # host copy for planners: D2H pulls run at ~0.1 MB/s on
            # tunneled devices, so wave planning must never read back
            out.__dict__["_host_in_offsets"] = in_offsets
            return out
        # ONE host->device transfer for all six [epad] arrays: per-transfer
        # latency dominates on tunneled/remote devices (an 8-byte sync read
        # can stall tens of seconds behind queued puts), and one put is also
        # one dispatch on directly-attached hosts
        packed = np.stack([s, d, ids, s[in_order], d[in_order],
                           in_order.astype(np.int32)])          # [6, epad]
        packed_dev = jnp.asarray(packed)
        small = np.stack([offsets, in_offsets])                 # [2, vpad+1]
        small_dev = jnp.asarray(small)
        out = DeviceCSR(
            offsets=small_dev[0],
            e=packed_dev[1], edge_src=packed_dev[0],
            edge_ids=packed_dev[2],
            in_src=packed_dev[3],
            in_dst=packed_dev[4],
            in_pos=packed_dev[5],
            in_offsets=small_dev[1],
            w=jnp.asarray(w_p[order]) if w_p is not None else None,
            vcount=vcount, ecount=e)
        out.__dict__["_host_in_offsets"] = in_offsets
        return out

    built = _build_device_csr(jnp.asarray(src_p), jnp.asarray(dst_p),
                              jnp.asarray(eid_p),
                              jnp.asarray(w_p) if w_p is not None else None,
                              vpad, epad)
    return DeviceCSR(
        offsets=built["offsets"], e=built["e"], edge_src=built["edge_src"],
        edge_ids=built["edge_ids"], in_src=built["in_src"],
        in_dst=built["in_dst"], in_pos=built["in_pos"],
        in_offsets=built["in_offsets"],
        w=built.get("w"), vcount=vcount, ecount=e)


def from_host_csr(csr, vpad: Optional[int] = None,
                  epad: Optional[int] = None,
                  keep_w_dtype: bool = False) -> DeviceCSR:
    """Lift a host ops.csr.CSR (the SQL engine's structure) onto the device."""
    w = None
    if csr.w is not None:
        w = csr.w
    elif csr.w_double is not None:
        w = csr.w_double
    return build_device_csr(csr.vcount, csr.src_of_edge, csr.e,
                            csr.edge_ids, w, vpad=vpad, epad=epad,
                            keep_w_dtype=keep_w_dtype)


def out_degrees(csr: DeviceCSR) -> jnp.ndarray:
    return csr.offsets[1:] - csr.offsets[:-1]


def _pad_edges(x, vpad: int, epad: int, ecount: int):
    if epad == ecount:
        return x.astype(jnp.int32)
    return jnp.concatenate([x.astype(jnp.int32),
                            jnp.full(epad - ecount, vpad, jnp.int32)])


@functools.partial(jax.jit, static_argnames=("vpad", "epad", "ecount"))
def _build_offsets_on_device(src, vpad: int, epad: int, ecount: int):
    """Forward offsets only (one [Ep] sort). Split from the in-view sort
    so the two sorts' scratch never coexists: the one-jit build peaked
    ~17 GB at RMAT-25 (inputs + pair-sort output + scratch + second
    sort) and crashed the TPU worker — the split passes peak at
    ~8.6 / ~12.9 GB instead."""
    src_p = _pad_edges(src, vpad, epad, ecount)
    s_sorted = jax.lax.sort(src_p)
    ids = jnp.arange(vpad + 1, dtype=jnp.int32)
    return jnp.searchsorted(s_sorted, ids).astype(jnp.int32)


def _in_view_impl(src, dst, vpad: int, epad: int, ecount: int):
    src_p = _pad_edges(src, vpad, epad, ecount)
    dst_p = _pad_edges(dst, vpad, epad, ecount)
    d_sorted, s_by_d = jax.lax.sort((dst_p, src_p), num_keys=1)
    ids = jnp.arange(vpad + 1, dtype=jnp.int32)
    in_offsets = jnp.searchsorted(d_sorted, ids).astype(jnp.int32)
    return in_offsets, s_by_d, d_sorted


_build_in_view_plain = functools.partial(
    jax.jit, static_argnames=("vpad", "epad", "ecount"))(_in_view_impl)
# huge graphs DONATE the raw edge arrays so their HBM is reusable as
# sort scratch (callers must not reuse them afterwards — the low-mem
# path below is the only caller at those sizes)
_build_in_view_donated = functools.partial(
    jax.jit, static_argnames=("vpad", "epad", "ecount"),
    donate_argnames=("src", "dst"))(_in_view_impl)


def _build_in_view_on_device(src, dst, vpad: int, epad: int, ecount: int):
    """In-edge view (dst-sorted pair sort)."""
    fn = _build_in_view_donated if epad >= (1 << 29) else \
        _build_in_view_plain
    return fn(src, dst, vpad, epad, ecount)


@functools.partial(jax.jit, static_argnames=("vpad", "ec"),
                   donate_argnames=("deg",))
def _deg_count_chunk(in_src, deg, off, vpad: int, ec: int):
    """Out-degree contribution of one in_src chunk: sort the chunk, then
    per-vertex counts are searchsorted differences over the boundary ids
    — O(chunk) memory, no full-array sort, no scatter."""
    chunk = jax.lax.dynamic_slice(in_src, (off,), (ec,))
    sc = jax.lax.sort(chunk)
    ids = jnp.arange(vpad + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(sc, ids).astype(jnp.int32)
    return deg + jnp.diff(pos)


# one full edge array above this size: the standalone offsets sort would
# put src+dst+sorted+scratch (~17 GB at RMAT-26) in HBM at once, so the
# low-mem path derives offsets from the in-edge view in chunks instead
_LOWMEM_EDGES = 1 << 30


@functools.partial(jax.jit, static_argnames=("vpad", "epad", "ecount"))
def _build_lengths_csr_fused(src, dst, vpad: int, epad: int, ecount: int):
    """Single-dispatch build for small graphs: on the tunneled backend
    every dispatch costs ~0.5 s of round-trip latency, which dominated
    the 2.5 s scale-18 build (VERDICT r4 weak item 6). Both sorts' scratch
    coexists here, so this is gated to graphs where that is cheap."""
    offsets = _build_offsets_on_device.__wrapped__(src, vpad, epad, ecount)
    in_offsets, s_by_d, d_sorted = _in_view_impl(src, dst, vpad, epad,
                                                 ecount)
    return offsets, in_offsets, s_by_d, d_sorted


# below this edge count the fused one-dispatch build is used (both sorts'
# scratch coexisting is ~6x the edge bytes — trivial at these sizes)
_FUSED_BUILD_EDGES = 1 << 25


def _build_lengths_csr_on_device(src, dst, vpad: int, epad: int,
                                 ecount: int):
    if epad <= _FUSED_BUILD_EDGES:
        return _build_lengths_csr_fused(src, dst, vpad, epad, ecount)
    if epad < _LOWMEM_EDGES:
        offsets = _build_offsets_on_device(src, vpad, epad, ecount)
        in_offsets, s_by_d, d_sorted = _build_in_view_on_device(
            src, dst, vpad, epad, ecount)
        return offsets, in_offsets, s_by_d, d_sorted
    # low-mem order: the donated pair sort FIRST (frees the raw edge
    # arrays), then offsets from in_src chunk-by-chunk (same multiset as
    # src, so the offsets are identical to the sorted-src formulation)
    in_offsets, s_by_d, d_sorted = _build_in_view_on_device(
        src, dst, vpad, epad, ecount)
    n_chunks = max(epad >> 27, 1)
    while epad % n_chunks or (epad // n_chunks) % 128:
        n_chunks -= 1
    ec = epad // n_chunks
    deg = jnp.zeros(vpad, jnp.int32)
    for k in range(n_chunks):
        deg = _deg_count_chunk(s_by_d, deg, np.int32(k * ec), vpad, ec)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(deg).astype(jnp.int32)])
    return offsets, in_offsets, s_by_d, d_sorted


def build_lengths_csr_on_device(vcount: int, src, dst,
                                vpad: Optional[int] = None,
                                epad: Optional[int] = None) -> DeviceCSR:
    """Lengths-only CSR built entirely ON DEVICE from device-resident edge
    arrays (e.g. rmat_edges_device output): sort by destination for the
    in-edge view, searchsorted offsets — no host round trip except the
    small in_offsets pull for the wave planner. The result is
    layout-compatible with build_device_csr(lengths_only=True) (tests
    cross-check both given identical edges). BFS-lengths kernels only;
    forward-view fields are None (fail fast)."""
    import numpy as np
    e = int(src.shape[0])
    vpad = vpad or pad_bucket(vcount + 1)
    epad = epad or pad_bucket(max(e, 1))
    offsets, in_offsets, in_src, in_dst = _build_lengths_csr_on_device(
        src, dst, vpad, epad, e)
    out = DeviceCSR(
        offsets=offsets, e=None, edge_src=None, edge_ids=None, in_pos=None,
        in_src=in_src, in_dst=in_dst, in_offsets=in_offsets, w=None,
        vcount=vcount, ecount=e, lengths_only=True)
    # NO host stash: pulling in_offsets D2H costs ~110 s/1.6 MB over the
    # tunnel (the round-2 driver bench lost 242 s to it) — device-built
    # CSRs plan their chunk tables ON device (_plan_tables_device)
    return out


@jax.tree_util.register_pytree_node_class
@dataclass
class RunsCSR:
    """Multi-run lengths-only CSR for graphs whose single [Ep] pair sort
    exceeds HBM (RMAT-26: the XLA compile reports 20 GB for the 2^30
    (dst, src) sort — the TPU sort's operand copies are irreducible).
    The edge set is split into ``n_runs`` equal runs, each dst-sorted IN
    PLACE with donated buffers (peak ~8.6 + 2 * run GB); a vertex's
    in-edges then live in up to n_runs contiguous segments, and the
    multi-run wave ORs the per-run expansions."""

    in_src: jnp.ndarray       # int32 [Ep]  src, dst-sorted WITHIN runs
    in_dst: Optional[jnp.ndarray]       # int32 [Ep]; None once `heads` built
    run_offsets: Optional[jnp.ndarray]  # int32 [R, Vp+1]; None post-planning
    offsets: jnp.ndarray      # int32 [Vp+1] forward (out-degree) offsets
    vcount: int
    ecount: int
    n_runs: int
    # packed per-edge segment-head bits (bit j of word w = edge w*32+j):
    # lets the wave drop the 4*Ep-byte in_dst array (RMAT-26: -4.3 GB of
    # resident HBM; the bits cost Ep/8 bytes = 134 MB)
    heads: Optional[jnp.ndarray] = None   # uint32 [Ep // 32]

    @property
    def vpad(self) -> int:
        return int(self.offsets.shape[0]) - 1

    @property
    def epad(self) -> int:
        return int(self.in_src.shape[0])

    def tree_flatten(self):
        return ((self.in_src, self.in_dst, self.run_offsets,
                 self.offsets, self.heads),
                (self.vcount, self.ecount, self.n_runs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        in_src, in_dst, run_offsets, offsets, heads = children
        vcount, ecount, n_runs = aux
        return cls(in_src, in_dst, run_offsets, offsets,
                   vcount, ecount, n_runs, heads)


@functools.partial(jax.jit, static_argnames=("ec",),
                   donate_argnames=("src", "dst"))
def _sort_run_inplace(src, dst, off, ec: int):
    s = jax.lax.dynamic_slice(src, (off,), (ec,))
    d = jax.lax.dynamic_slice(dst, (off,), (ec,))
    ds, ss = jax.lax.sort((d, s), num_keys=1)
    return (jax.lax.dynamic_update_slice(src, ss, (off,)),
            jax.lax.dynamic_update_slice(dst, ds, (off,)))


@functools.partial(jax.jit, static_argnames=("vpad", "ec"))
def _run_offsets_chunk(in_dst, off, vpad: int, ec: int):
    d = jax.lax.dynamic_slice(in_dst, (off,), (ec,))
    ids = jnp.arange(vpad + 1, dtype=jnp.int32)
    return jnp.searchsorted(d, ids).astype(jnp.int32)


def build_lengths_csr_runs_on_device(vcount: int, src, dst,
                                     n_runs: int) -> RunsCSR:
    """Build a RunsCSR entirely on device. ``src``/``dst`` are DONATED
    (sorted in place run by run). Edge count must divide n_runs."""
    e = int(src.shape[0])
    assert e % n_runs == 0, (e, n_runs)
    rl = e // n_runs
    vpad = pad_bucket(vcount + 1)
    src = src.astype(jnp.int32) if src.dtype != jnp.int32 else src
    dst = dst.astype(jnp.int32) if dst.dtype != jnp.int32 else dst
    for r in range(n_runs):
        src, dst = _sort_run_inplace(src, dst, np.int32(r * rl), rl)
    # run-LOCAL offsets (position within the run's [rl] slice); kernels
    # add r * rl when slicing the global arrays
    run_offs = jnp.stack([
        _run_offsets_chunk(dst, np.int32(r * rl), vpad, rl)
        for r in range(n_runs)])
    # forward offsets (TEPS out-degrees) via chunked counting over in_src
    n_deg_chunks = max(e >> 27, 1)
    while e % n_deg_chunks or (e // n_deg_chunks) % 128:
        n_deg_chunks -= 1
    dec = e // n_deg_chunks
    deg = jnp.zeros(vpad, jnp.int32)
    for k in range(n_deg_chunks):
        deg = _deg_count_chunk(src, deg, np.int32(k * dec), vpad, dec)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(deg).astype(jnp.int32)])
    return RunsCSR(in_src=src, in_dst=dst, run_offsets=run_offs,
                   offsets=offsets, vcount=vcount, ecount=e,
                   n_runs=n_runs)


def csr_slim_waves(csr: DeviceCSR, keep_out_dst: bool = True) -> DeviceCSR:
    """Slim a lengths-only CSR for the chunked waves: pack the in-edge
    segment-head bits (Ep/8 bytes), optionally materialize the sparse
    tail's forward dst list into ``e`` FIRST (it is derived by sorting the
    in-edge view, which needs in_dst), then DROP in_dst — freeing 4*Ep
    bytes of HBM that the wave planner converts into width (RMAT-23+:
    the [Vp, W] state plus the edge arrays set the width cap)."""
    if csr.heads is not None and csr.in_dst is None:
        return csr
    e = csr.e
    if keep_out_dst and e is None:
        from .msbfs_jax import build_out_dst_device
        e = build_out_dst_device(csr)
    Ep = csr.epad
    chunk = min(1 << 24, Ep)
    while Ep % chunk or chunk % 32:
        chunk //= 2
    parts = [_head_bits_chunk(csr.in_dst, np.int32(k * chunk), chunk, Ep)
             for k in range(Ep // chunk)]
    heads = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return DeviceCSR(
        offsets=csr.offsets, e=e, edge_src=csr.edge_src,
        edge_ids=csr.edge_ids, in_src=csr.in_src, in_dst=None,
        in_pos=csr.in_pos, in_offsets=csr.in_offsets, w=csr.w,
        vcount=csr.vcount, ecount=csr.ecount,
        lengths_only=csr.lengths_only, heads=heads)


@functools.partial(jax.jit, static_argnames=("ec", "rl"))
def _head_bits_chunk(in_dst, off, ec: int, rl: int):
    """Packed segment-head bits for edge positions [off, off+ec): head iff
    the position starts a run (off % rl == 0 — ec divides rl, so only the
    chunk's first position can be one) or dst changes."""
    d = jax.lax.dynamic_slice(in_dst, (off,), (ec,))
    prev = jax.lax.dynamic_slice(in_dst,
                                 (jnp.maximum(off - 1, 0),), (1,))
    first = jnp.where(off % jnp.int32(rl) == 0, True, d[0] != prev[0])
    h = jnp.concatenate([first[None], d[1:] != d[:-1]])
    return (h.reshape(ec // 32, 32).astype(jnp.uint32)
            << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
        axis=1, dtype=jnp.uint32)


def runs_with_head_bits(runs_csr: RunsCSR, drop_in_dst: bool = True,
                        drop_run_offsets: bool = False,
                        chunk: int = 1 << 24) -> RunsCSR:
    """Precompute packed segment-head bits and (optionally) drop the
    arrays the wave no longer needs: in_dst (4*Ep bytes — only its
    change-points matter to the expansion) and run_offsets (R*4*(Vp+1)
    bytes — only the planner reads them). At RMAT-26 this frees ~5.4 GB
    of resident HBM, which the planner converts into wave width."""
    Ep = runs_csr.epad
    rl = Ep // runs_csr.n_runs
    ec = min(chunk, rl)
    while rl % ec or ec % 32:
        ec //= 2
    parts = [_head_bits_chunk(runs_csr.in_dst, np.int32(k * ec), ec, rl)
             for k in range(Ep // ec)]
    heads = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return RunsCSR(
        in_src=runs_csr.in_src,
        in_dst=None if drop_in_dst else runs_csr.in_dst,
        run_offsets=None if drop_run_offsets else runs_csr.run_offsets,
        offsets=runs_csr.offsets, vcount=runs_csr.vcount,
        ecount=runs_csr.ecount, n_runs=runs_csr.n_runs, heads=heads)


@functools.partial(jax.jit, static_argnames=("vpad", "epad", "ecount"))
def _build_weighted_bf_csr_on_device(src, dst, w, vpad: int, epad: int,
                                     ecount: int):
    pad_fill = jnp.full(epad - ecount, vpad, dtype=jnp.int32)
    src_p = jnp.concatenate([src.astype(jnp.int32), pad_fill])
    dst_p = jnp.concatenate([dst.astype(jnp.int32), pad_fill])
    w_p = jnp.concatenate([w.astype(jnp.float32),
                           jnp.zeros(epad - ecount, jnp.float32)])
    d_sorted, s_by_d, w_by_d = jax.lax.sort((dst_p, src_p, w_p), num_keys=1)
    ids = jnp.arange(vpad + 1, dtype=jnp.int32)
    in_offsets = jnp.searchsorted(d_sorted, ids).astype(jnp.int32)
    s_sorted = jax.lax.sort(src_p)
    offsets = jnp.searchsorted(s_sorted, ids).astype(jnp.int32)
    return offsets, in_offsets, s_by_d, d_sorted, w_by_d


def build_weighted_bf_csr_on_device(vcount: int, src, dst, w,
                                    vpad: Optional[int] = None,
                                    epad: Optional[int] = None) -> DeviceCSR:
    """Weighted CSR for the Bellman-Ford kernel, built entirely on device
    from device-resident (src, dst, w) arrays. The weight array is stored
    already in in-edge-view order with ``in_pos`` = identity, so
    ``w[in_pos]`` (what bellman_ford reads) is exactly the dst-sorted
    weights — no forward-view arrays are shipped or kept (None, fail-fast
    like lengths_only)."""
    import numpy as np
    e = int(src.shape[0])
    vpad = vpad or pad_bucket(vcount + 1)
    epad = epad or pad_bucket(max(e, 1))
    offsets, in_offsets, in_src, in_dst, in_w = \
        _build_weighted_bf_csr_on_device(src, dst, w, vpad, epad, e)
    out = DeviceCSR(
        offsets=offsets, e=None, edge_src=None, edge_ids=None,
        in_pos=jnp.arange(epad, dtype=jnp.int32),
        in_src=in_src, in_dst=in_dst, in_offsets=in_offsets, w=in_w,
        vcount=vcount, ecount=e, lengths_only=True)
    return out
