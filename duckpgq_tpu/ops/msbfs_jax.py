"""TPU device kernels: lane-packed multi-source BFS, Bellman-Ford, PageRank,
WCC label propagation — pure JAX/XLA, jittable, static padded shapes.

Design (SURVEY.md §7.1 item 6 / BASELINE north star): the frontier is a dense
``[Vp, L]`` lane matrix (the TPU analog of the reference's bitset<512> per
vertex, iterativelength.cpp:12-32). One expansion step is a pull-style
masked sparse-matrix product: gather frontier rows at in-edge sources, then a
sorted segment-max by destination — both map onto XLA's fused
gather/segmented-reduce paths and stream at HBM bandwidth; no scatter with
conflicts anywhere. Iteration is a ``lax.while_loop`` with a fixpoint flag
(the reference's ``change`` bool).

These kernels run identically on the CPU backend (tests) and TPU (bench);
tests cross-check them against the exact host mirrors in ops/msbfs.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .csr_jax import DeviceCSR, out_degrees, round_up
from .segscan import (has_segment, last_positions, segment_heads,
                      segment_min_sorted, segment_or_sorted,
                      segment_or_sorted_rows, segment_reduce_sorted,
                      segment_sum_sorted)

LANES_DEFAULT = 512  # reference LANE_LIMIT (duckpgq_utils.hpp:10)


def _in_segments(csr: DeviceCSR):
    """Segmented-reduce metadata for the dst-sorted in-edge view. All
    reductions by destination use scan-based segmented ops (segscan.py)
    instead of scatter-lowered jax.ops.segment_* — scatter compiles take
    minutes on some TPU backends."""
    return (segment_heads(csr.in_dst), last_positions(csr.in_offsets),
            has_segment(csr.in_offsets))


def _out_segments(csr: DeviceCSR):
    """Same for the src-sorted forward edge view (segments = edge_src)."""
    return (segment_heads(csr.edge_src), last_positions(csr.offsets),
            has_segment(csr.offsets))


def _pack_words(cond: jnp.ndarray, W: int) -> jnp.ndarray:
    """bool [32*W] -> uint32 [W]: bit l%32 of word l//32 = cond[l] (shared
    by every packed kernel's finished-lane masking)."""
    bits = cond.reshape(W, 32).astype(jnp.uint32)
    return (bits << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
        axis=1, dtype=jnp.uint32)


def _seg_or_pair(a, b):
    """Associative segmented-OR combiner over (head-flag, value) pairs."""
    af, av = a
    bf, bv = b
    return af | bf, jnp.where(bf, bv, av | bv)


def _scan_block_size(Ec: int) -> int:
    """Largest power-of-two block <= DUCKPGQ_SCAN_BLOCK (default 8192) that
    divides Ec. Blocks cap the associative-scan HLO at O(log block) stages
    of [block, W] ops regardless of Ec — the RMAT-23/24 chunk scans
    ([262k..8M, W] HLO) are uncompilable by the shared 2-core AOT helper
    (BASELINE.md RMAT-23 round-3 campaign: >116 min vs 5.7 s on CPU), while
    a lax.scan over fixed blocks compiles one block-sized body.

    NOTE (ADVICE r3): this is read at TRACE time — jit-cached kernels keep
    the block size they were first traced with; set DUCKPGQ_SCAN_BLOCK
    before first use. When Ec has low 2-adicity (e.g. 2 * odd) the largest
    dividing power of two degenerates toward 1, which would turn the
    blocked path into an Ec-length sequential scan with a unit-width body;
    below 128 we return Ec so callers fall back to the one-shot
    associative scan instead."""
    import os
    cap = int(os.environ.get("DUCKPGQ_SCAN_BLOCK", "8192"))
    blk = 1
    while blk * 2 <= min(Ec, cap) and Ec % (blk * 2) == 0:
        blk *= 2
    if blk < 128 and blk < Ec:
        return Ec          # degenerate blocking: one-shot scan is better
    return blk


def _seg_or_scan_blocked_rows(g: jnp.ndarray, hds: jnp.ndarray,
                              carry: jnp.ndarray, block: int
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-major mirror of _seg_or_scan_blocked: inclusive segmented-OR
    scan of [W, Ec] along axis 1 as a fori_loop over [W, block] sub-blocks
    (dynamic slices, no transposes), carry [W, 1] threaded across blocks."""
    W, Ec = g.shape
    B = Ec // block

    def step(b, state):
        out, carry = state
        off = b * block
        gblk = jax.lax.dynamic_slice(g, (0, off), (W, block))
        hblk = jax.lax.dynamic_slice(hds, (off,), (block,))
        g0 = gblk[:, 0] | jnp.where(hblk[0], jnp.uint32(0), carry[:, 0])
        gblk = jax.lax.dynamic_update_slice(gblk, g0[:, None], (0, 0))
        _, scanned = jax.lax.associative_scan(
            _seg_or_pair, (hblk.astype(jnp.int32).reshape(1, -1), gblk),
            axis=1)
        out = jax.lax.dynamic_update_slice(out, scanned, (0, off))
        return out, scanned[:, -1:]

    out, carry = jax.lax.fori_loop(0, B, step, (jnp.zeros_like(g), carry))
    return out, carry


def _seg_or_scan_blocked(g: jnp.ndarray, hds: jnp.ndarray,
                         carry: jnp.ndarray, block: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inclusive segmented-OR scan of [Ec, W] rows as a lax.scan over
    [block, W] sub-blocks, seeding each block's first row with the open
    segment carried out of the previous block (valid for the OR combiner:
    OR-ing the carry into a non-head first row is exactly the segmented
    prefix). Bit-identical to the one-shot associative_scan; compile size
    is O(log block), independent of Ec."""
    Ec, W = g.shape
    B = Ec // block
    gb = g.reshape(B, block, W)
    hb = hds.reshape(B, block)

    def step(carry, inp):
        gblk, hblk = inp
        g0 = gblk[0] | jnp.where(hblk[0], jnp.uint32(0), carry[0])
        gblk = jax.lax.dynamic_update_slice(gblk, g0[None, :], (0, 0))
        _, scanned = jax.lax.associative_scan(
            _seg_or_pair, (hblk.astype(jnp.int32).reshape(-1, 1), gblk),
            axis=0)
        return scanned[-1:], scanned

    carry, scanned = jax.lax.scan(step, carry, (gb, hb))
    return scanned.reshape(Ec, W), carry


def _wave_state(src, dst, active):
    """Per-wave lane bookkeeping shared by the packed kernels: word/bit of
    each lane, trivial (src==dst) results, and the searching mask."""
    L = src.shape[0]
    lanes = jnp.arange(L)
    word_of_lane = lanes // 32
    bit_of_lane = (jnp.uint32(1) << (lanes % 32).astype(jnp.uint32))
    trivial = active & (src == dst)
    searching = active & (src != dst)
    result = jnp.where(trivial, 0, -1).astype(jnp.int32)
    return word_of_lane, bit_of_lane, searching, result


_wave_state_jit = jax.jit(_wave_state)


def _packed_traversed(seen_v: jnp.ndarray, deg: jnp.ndarray, L: int,
                      edge_major: bool) -> jnp.ndarray:
    """graph500 TEPS accounting: per lane, every out-edge of every visited
    vertex counts once. Unpacks the seen bitplanes (32 matvecs). seen_v is
    [Vp, W] when edge_major else [W, Vp]."""
    per_bit = []
    for b in range(32):
        bits = ((seen_v >> jnp.uint32(b)) & jnp.uint32(1)).astype(
            jnp.float32)
        per_bit.append(deg @ bits if edge_major else bits @ deg)   # [W]
    return jnp.stack(per_bit, axis=1).reshape(L)


# ---------------------------------------------------------------------------
# multi-source BFS lengths
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def msbfs_lengths(csr: DeviceCSR, src: jnp.ndarray, dst: jnp.ndarray,
                  active: jnp.ndarray, max_iters: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BFS lengths for L lane queries. Returns (lengths int32 [L] with -1 for
    unreached/inactive, traversed_edges int64 [L] for TEPS accounting).

    src == dst lanes resolve to 0 without expansion (reference lane setup,
    iterativelength.cpp:95-106)."""
    Vp = csr.vpad
    L = src.shape[0]
    lanes = jnp.arange(L)
    deg = out_degrees(csr)                            # [Vp]

    trivial = active & (src == dst)
    searching = active & (src != dst)
    frontier = jnp.zeros((Vp + 1, L), dtype=jnp.bool_)
    frontier = frontier.at[src, lanes].set(searching)
    seen = frontier
    result = jnp.where(trivial, 0, -1).astype(jnp.int32)
    degf = deg.astype(jnp.float32)
    traversed = jnp.zeros(L, dtype=jnp.float32)

    def cond(state):
        it, frontier, seen, result, traversed = state
        return (it <= max_iters) & frontier.any()

    heads, last_pos, has_in = _in_segments(csr)

    def body(state):
        it, frontier, seen, result, traversed = state
        # TEPS credit: edges whose source is in this wave's frontier — each
        # edge is expanded at most once per search (frontier sets are
        # disjoint across iterations)
        traversed = traversed + (frontier[:Vp].astype(jnp.float32) *
                                 degf[:, None]).sum(axis=0)
        gathered = frontier[csr.in_src]               # [Ep, L]
        ext = segment_or_sorted(gathered.astype(jnp.int8), heads, last_pos,
                                has_in) > 0           # [Vp, L]
        nxt = jnp.concatenate(
            [ext, jnp.zeros((1, L), jnp.bool_)]) & ~seen
        seen = seen | nxt
        found = nxt[dst, lanes] & (result < 0) & searching
        result = jnp.where(found, it, result)
        # lanes that found their target stop expanding
        nxt = nxt & (result < 0)[None, :]
        return it + 1, nxt, seen, result, traversed

    _, _, seen, result, traversed = jax.lax.while_loop(
        cond, body, (jnp.int32(1), frontier, seen, result, traversed))
    return result, traversed


def msbfs_lengths_packed(csr: DeviceCSR, src: jnp.ndarray, dst: jnp.ndarray,
                         active: jnp.ndarray, max_iters: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bit-packed MS-BFS: 32 lanes per uint32 word (the direct TPU analog of
    the reference's ``bitset<LANE_LIMIT>`` per vertex, iterativelength.cpp:
    12-32). The frontier is ``uint32 [Vp+1, W]`` with ``W = L/32`` — 32x less
    gather traffic than the dense bool kernel, and the per-destination OR is
    a segmented scan instead of a scatter-lowered segment reduce.

    Scan implementation: DUCKPGQ_SCAN_IMPL=pallas uses the single-pass
    Pallas chunk kernel (kernels/segscan_pallas.py — one HBM pass and a
    tiny compile, vs ~log2(E) passes for the XLA associative_scan whose
    compile OOMs at RMAT-18 shapes); default is the XLA scan (portable,
    used on the CPU test backend).

    Returns (lengths int32 [L], traversed float32 [L])."""
    import os
    use_pallas = os.environ.get("DUCKPGQ_SCAN_IMPL", "xla") == "pallas"
    return _msbfs_lengths_packed(csr, src, dst, active, max_iters,
                                 use_pallas)


@functools.partial(jax.jit, static_argnames=("max_iters", "use_pallas"))
def msbfs_lengths_packed_multi(csr: DeviceCSR, src: jnp.ndarray,
                               dst: jnp.ndarray, active: jnp.ndarray,
                               max_iters: int, use_pallas: bool = False
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run B sequential packed-BFS waves in ONE device dispatch:
    src/dst are [B, L], active [L]; returns ([B, L] lengths, [B, L]
    traversed). Production engines issue queries in batches — a single
    dispatch amortizes host round-trips (the tunnel RTT otherwise dominates
    sub-100ms searches)."""
    return jax.lax.map(
        lambda q: _msbfs_lengths_packed_impl(csr, q[0], q[1], active,
                                             max_iters, use_pallas),
        (src, dst))


@functools.partial(jax.jit, static_argnames=("max_iters", "use_pallas"))
def _msbfs_lengths_packed(csr: DeviceCSR, src: jnp.ndarray, dst: jnp.ndarray,
                          active: jnp.ndarray, max_iters: int,
                          use_pallas: bool
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return _msbfs_lengths_packed_impl(csr, src, dst, active, max_iters,
                                      use_pallas)


def _msbfs_lengths_packed_impl(csr: DeviceCSR, src: jnp.ndarray,
                               dst: jnp.ndarray, active: jnp.ndarray,
                               max_iters: int, use_pallas: bool
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-major ("transposed") layout: the frontier is ``uint32 [W, Vp+1]``
    — vertices along the 128-wide lane axis, packed lane words along
    sublanes. Every elementwise step then runs at full vreg lane utilization
    (a [E, W] layout wastes (128-W)/128 of the VPU when W < 128), and the
    segmented scan rolls along lanes (kernels/segscan_pallas.seg_or_scan_rows).

    At W >= 128 the EDGE-MAJOR layout wins instead (4096+-lane waves):
    [E, W] blocks tile vregs perfectly when W is a multiple of 128, each
    per-edge frontier access is one contiguous 4W-byte row, and the measured
    full expansion is 1.42x the lane-major variant (scripts/kernel_profile.py)
    — dispatched below. Wider rows also amortize the gather's per-index cost
    (the gather is index-rate-bound at ~96M idx/s, scripts/gather_probe.py:
    W=256 moves 2x the bytes in 1.2x the time)."""
    if (src.shape[0] // 32) % 128 == 0:
        return _msbfs_lengths_packed_em(csr, src, dst, active, max_iters,
                                        use_pallas)
    Vp = csr.vpad
    L = src.shape[0]
    assert L % 32 == 0, "packed kernel needs lanes % 32 == 0"
    W = L // 32
    word_of_lane, bit_of_lane, searching, result = _wave_state(
        src, dst, active)
    deg = out_degrees(csr).astype(jnp.float32)       # [Vp]

    frontier = jnp.zeros((W, Vp + 1), dtype=jnp.uint32)
    frontier = frontier.at[word_of_lane, src].add(
        jnp.where(searching, bit_of_lane, jnp.uint32(0)))
    seen = frontier

    # static per-CSR segment structure of the dst-sorted in-edge view
    heads, last_pos, has_in = _in_segments(csr)

    def cond(state):
        it, frontier, seen, result = state
        return (it <= max_iters) & (frontier != 0).any()

    Ep = csr.epad
    # chunk sweep on v5e: 2048 beats 512 by ~16% (fewer grid steps; the
    # log-depth roll cost grows slower than the per-step overhead shrinks)
    scan_chunk = 1
    while scan_chunk * 2 <= min(Ep, 2048) and Ep % (scan_chunk * 2) == 0:
        scan_chunk *= 2

    def body(state):
        it, frontier, seen, result = state
        gathered = jnp.take(frontier, csr.in_src, axis=1)     # [W, Ep]
        if use_pallas:
            from ..kernels.segscan_pallas import seg_or_scan_rows
            scanned = seg_or_scan_rows(gathered, heads, chunk=scan_chunk)
            ext = jnp.where(has_in[None, :], scanned[:, last_pos],
                            jnp.uint32(0))                    # [W, Vp]
        else:
            ext = segment_or_sorted_rows(gathered, heads, last_pos,
                                         has_in)              # [W, Vp]
        nxt = jnp.concatenate(
            [ext, jnp.zeros((W, 1), jnp.uint32)], axis=1) & ~seen
        seen = seen | nxt
        found = ((nxt[word_of_lane, dst] & bit_of_lane) != 0) \
            & (result < 0) & searching
        result = jnp.where(found, it, result)
        nxt = nxt & _pack_words(result < 0, W)[:, None]
        return it + 1, nxt, seen, result

    _, _, seen, result = jax.lax.while_loop(
        cond, body, (jnp.int32(1), frontier, seen, result))

    traversed = _packed_traversed(seen[:, :Vp], deg, L, edge_major=False)
    return result, traversed


def _msbfs_lengths_packed_em(csr: DeviceCSR, src: jnp.ndarray,
                             dst: jnp.ndarray, active: jnp.ndarray,
                             max_iters: int, use_pallas: bool
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-major packed MS-BFS for full 4096-lane waves (W = 128):
    frontier ``uint32 [Vp+1, W]`` so each per-edge access reads one
    contiguous 512-byte row, gathered/scanned as [Ep, W] blocks that tile
    vregs exactly (see _msbfs_lengths_packed_impl for the measurement)."""
    Vp = csr.vpad
    L = src.shape[0]
    W = L // 32
    word_of_lane, bit_of_lane, searching, result = _wave_state(
        src, dst, active)
    deg = out_degrees(csr).astype(jnp.float32)       # [Vp]

    frontier = jnp.zeros((Vp + 1, W), dtype=jnp.uint32)
    frontier = frontier.at[src, word_of_lane].add(
        jnp.where(searching, bit_of_lane, jnp.uint32(0)))
    seen = frontier

    heads, last_pos, has_in = _in_segments(csr)

    def cond(state):
        it, frontier, seen, result = state
        return (it <= max_iters) & (frontier != 0).any()

    Ep = csr.epad
    # chunk * W bounded by the measured-good 2048x128 VMEM block budget
    # (a [chunk, W] uint32 block is double-buffered in+out by the pipeline;
    # 2048x256 blows the 16 MB scoped-VMEM limit)
    # VMEM-block cap by PADDED width: blocks tile to (8,128) vregs, so a
    # (chunk, W) block occupies chunk * max(W, 128) lanes — at W < 128 the
    # padding (and the (chunk, 1) heads block, also padded to 128 lanes)
    # doubled the footprint and the Mosaic scan ran out of scoped VMEM at
    # RMAT-23's W=64 wave
    chunk_cap = max(128, (2048 * 128) // max(W, 128))
    scan_chunk = 1
    while scan_chunk * 2 <= min(Ep, chunk_cap) and Ep % (scan_chunk * 2) == 0:
        scan_chunk *= 2

    def body(state):
        it, frontier, seen, result = state
        gathered = jnp.take(frontier, csr.in_src, axis=0)    # [Ep, W]
        if use_pallas:
            from ..kernels.segscan_pallas import seg_or_scan_packed
            scanned = seg_or_scan_packed(gathered, heads, chunk=scan_chunk)
        else:
            _, scanned = jax.lax.associative_scan(
                _seg_or_pair, (heads.reshape(-1, 1), gathered), axis=0)
        ext = jnp.where(has_in[:, None], scanned[last_pos],
                        jnp.uint32(0))                       # [Vp, W]
        nxt = jnp.concatenate(
            [ext, jnp.zeros((1, W), jnp.uint32)], axis=0) & ~seen
        seen = seen | nxt
        found = ((nxt[dst, word_of_lane] & bit_of_lane) != 0) \
            & (result < 0) & searching
        result = jnp.where(found, it, result)
        nxt = nxt & _pack_words(result < 0, W)[None, :]
        return it + 1, nxt, seen, result

    _, _, seen, result = jax.lax.while_loop(
        cond, body, (jnp.int32(1), frontier, seen, result))

    traversed = _packed_traversed(seen[:Vp], deg, L, edge_major=True)
    return result, traversed


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedWavePlan:
    """Execution plan for a chunked wide packed wave.

    The single-dispatch packed kernels materialize two full [Ep, W] buffers
    per iteration, so HBM capacity caps the wave width W (max_packed_lanes).
    The chunked plan streams the expansion in ``n_chunks`` edge super-chunks
    — only [Ec, W] stays live — so W is capped by the resident vertex state
    ([Vp, W] frontier/seen/ext) instead: ~16x wider waves on a 16 GB chip.

    Extraction bookkeeping (host-precomputed, static per CSR + n_chunks):
    each vertex's segment-final scan value lives in exactly one super-chunk
    (the one holding its last in-edge). ``rel[k, j]`` is the chunk-relative
    scan row of the j-th such vertex of chunk k; its value is written to
    compact row ``k * bmax + j``, and ``slot[v]`` maps each vertex to its
    compact row (vertices with no in-edges point at the trailing zero row).
    Total extraction cost is ~Vp rows regardless of n_chunks."""

    rel: jnp.ndarray    # int32 [K, bmax]  chunk-relative last-edge rows
    slot: jnp.ndarray   # int32 [Vp]       vertex -> compact row
    lanes: int
    n_chunks: int
    bmax: int
    # vids[k, j] = vertex whose segment-final value chunk k's j-th
    # extraction row holds (pad rows -> Vp). Lets the scatter-accumulate
    # runs-wave variant OR chunk results straight into the [W, Vp+1]
    # accumulator — no [W, K*bmax] compact buffer and no slot pass.
    vids: Optional[jnp.ndarray] = None   # int32 [K, bmax]

    def tree_flatten(self):
        return (self.rel, self.slot, self.vids), \
            (self.lanes, self.n_chunks, self.bmax)

    @classmethod
    def tree_unflatten(cls, aux, children):
        rel, slot, vids = children
        lanes, n_chunks, bmax = aux
        return cls(rel, slot, lanes, n_chunks, bmax, vids)


def plan_packed_wave(csr: DeviceCSR, lanes: Optional[int] = None,
                     n_chunks: Optional[int] = None,
                     hbm_budget: Optional[int] = None,
                     cap: Optional[int] = None) -> PackedWavePlan:
    """Pick (lanes, n_chunks) for the widest HBM-feasible chunked wave and
    build the extraction tables. Runs on host (one small sync read of
    in_offsets). The gather that dominates expansion is latency-bound
    (~96M idx/s at W=128, scripts/gather_probe.py), so per-lane cost keeps
    falling as rows widen — width is worth spending all spare HBM on."""
    import os

    import numpy as np

    Vp, Ep = csr.vpad, csr.epad
    if cap is None:
        cap = int(os.environ.get("DUCKPGQ_MAX_LANES", "65536"))
    if hbm_budget is None:
        # v5e 16 GB: the largest verified-fit waves put the usable limit
        # near 15 GB (BASELINE.md sweep: scale-20 W=640 K=256 runs)
        hbm_budget = 14 << 30
        try:
            stats = jax.devices()[0].memory_stats()
            if stats and stats.get("bytes_limit"):
                hbm_budget = int(stats["bytes_limit"] * 3) // 4
        except Exception:
            pass

    def pick_chunks(W, budget=None):
        """Smallest feasible n_chunks for width W, or None. Live set
        (calibrated against the verified-fit sweep in BASELINE.md —
        scale-18 W=2304, scale-19 W=1024, scale-20 W=640, scale-21 W=256
        all run on a 16 GB chip): ~3.5 resident [Vp, W] uint32 buffers
        (frontier/seen in-place + nxt + compact) plus 4 [Ec, W] chunk
        buffers (gather out, scan out, pipeline copies)."""
        rem = (budget or hbm_budget) - 14 * (Vp + 1) * W
        ec_cap = rem // (4 * 4 * W)
        if ec_cap < 2048:
            return None
        k = 1
        while (Ep // k > ec_cap and k < 4096
               and Ep % (k * 2) == 0
               and (Ep // (k * 2)) % 128 == 0):
            k *= 2
        if Ep // k > ec_cap:
            return None
        # compile-size ceiling (RMAT-24 boundary): the associative-scan
        # HLO grows with Ec and a [8M, W] chunk scan OOM-kills the shared
        # 2-core compile helper. Stream more, smaller chunks instead —
        # the fori_loop body is one chunk, so HLO size is K-independent.
        ec_compile_cap = int(os.environ.get("DUCKPGQ_MAX_CHUNK_EDGES",
                                            str(1 << 20)))
        while (Ep // k > ec_compile_cap and k < 4096
               and Ep % (k * 2) == 0
               and (Ep // (k * 2)) % 128 == 0):
            k *= 2
        return k

    def narrow_fallback():
        """Graph too large for this wave width: single-dispatch narrow
        plan sized by the old two-[Ep, W]-buffer limit."""
        return PackedWavePlan(rel=jnp.zeros((1, 1), jnp.int32),
                              slot=jnp.zeros((1,), jnp.int32),
                              lanes=max_packed_lanes(csr, hbm_budget, cap),
                              n_chunks=1, bmax=1)

    if lanes is None:
        # width target ~4 [Vp, W] buffers of budget, nearest 128 words;
        # beyond W=2048 the gather's bytes/idx gain has flattened
        # (scripts/gather_probe.py), so the 65536-lane cap is also the
        # measured point of diminishing returns
        w0 = (hbm_budget // (16 * (Vp + 1)) + 64) // 128 * 128
        w0 = max(min(w0, cap // 32), 0)
        w = w0
        while w >= 128 and pick_chunks(w) is None:
            w -= 128
        if w < 128:
            # huge-V graphs (RMAT-23+): the resident [Vp, W] state rejects
            # every 128-multiple width, but narrower chunked waves still
            # beat the tiny single-dispatch fallback several-fold (the
            # frontier gather is latency-bound, so per-lane cost keeps
            # dropping with width). Here the resident CSR arrays and the
            # sparse-tail extras are most of HBM, so charge them
            # EXPLICITLY (8*Ep in-edge arrays; with the sparse tail on,
            # +4*Ep out_dst and three [W, e_cap] buffers) instead of the
            # flat 3/5 margin — at RMAT-26 the uncharged 8.6 GB of edge
            # arrays drove the model to a degenerate W=1 single-dispatch
            # plan whose [Ep, 1] buffers then compile-OOMed (2026-08-21)
            sparse_on = os.environ.get("DUCKPGQ_SPARSE_TAIL", "1") == "1"
            slim = getattr(csr, "heads", None) is not None
            for w_try in (96, 80, 64, 56, 48, 40, 32, 24, 20, 16, 12,
                          8, 6, 4, 3, 2, 1):
                # slimmed CSRs (csr_slim_waves) keep in_src + packed head
                # bits instead of in_src + in_dst
                extra = (4 * Ep + Ep // 8) if slim else 8 * Ep
                if sparse_on:
                    tiers = _sparse_tail_caps(min(Ep, 1 << 20), w_try)
                    e_hi = tiers[-1][1] if tiers else 0
                    extra += 4 * Ep + 12 * e_hi * w_try
                # measured at scale 23: real peak exceeds the 3.5-buffer
                # state model by ~30% (XLA temps) — W=64 OOMed twice while
                # W=48 fits. Charge the margin on the state term.
                extra += (14 * (Vp + 1) * w_try) * 3 // 10
                k_try = pick_chunks(w_try, hbm_budget - extra)
                if k_try is not None:
                    w = w_try
                    if n_chunks is None:
                        n_chunks = k_try   # keep the reduced-budget pick
                    break
            else:
                return narrow_fallback()
        lanes = w * 32
    W = lanes // 32
    if n_chunks is None:
        n_chunks = pick_chunks(W)
        if n_chunks is None:
            # requested width is HBM-infeasible even at max chunking
            return narrow_fallback()
    if Ep % n_chunks != 0:
        raise ValueError(
            f"n_chunks={n_chunks} must divide the padded edge count "
            f"{Ep} (the chunked expansion and its extraction tables "
            f"cover edges exactly)")
    if n_chunks == 1:
        return PackedWavePlan(rel=jnp.zeros((1, 1), jnp.int32),
                              slot=jnp.zeros((1,), jnp.int32),
                              lanes=lanes, n_chunks=1, bmax=1)
    K = n_chunks
    Ec = Ep // K
    # extraction tables: prefer a host copy of in_offsets when one exists
    # (host-built CSRs stash it); DEVICE-built CSRs build the tables ON
    # DEVICE instead — pulling in_offsets D2H costs ~110 s for 1.6 MB at
    # the tunnel's measured pull rate (the round-2 driver bench spent 242 s
    # of its 246 s setup on exactly that pull), while the device build
    # pulls ONE scalar (bmax) to size the static shapes
    host_off = getattr(csr, "_host_in_offsets", None)
    if host_off is None:
        bmax = int(_plan_chunk_bmax(csr.in_offsets, Ec, K))
        bmax = max(bmax, 1)
        rel, slot, vids = _plan_tables_device(csr.in_offsets, Ec, K, bmax)
        return PackedWavePlan(rel=rel, slot=slot, lanes=lanes,
                              n_chunks=K, bmax=bmax, vids=vids)
    in_off = np.asarray(host_off).astype(np.int64)  # [Vp + 1]
    deg_in = in_off[1:] - in_off[:-1]
    has = deg_in > 0
    last = in_off[1:] - 1
    chunk_of = np.where(has, last // Ec, K)
    order = np.argsort(chunk_of, kind="stable")
    counts = np.bincount(chunk_of[has], minlength=K)[:K]
    bmax = max(int(counts.max()), 1) if counts.size else 1
    rel = np.zeros((K, bmax), np.int32)
    # slot has Vp + 1 entries: the pad row maps to compact's zero row, so
    # the expansion's output is directly [Vp + 1, W] (no concat copy)
    slot = np.full(Vp + 1, K * bmax, np.int32)
    pos = 0
    for k in range(K):
        c = int(counts[k])
        grp = order[pos:pos + c]
        rel[k, :c] = (last[grp] - k * Ec).astype(np.int32)
        slot[grp] = k * bmax + np.arange(c, dtype=np.int32)
        pos += c
    return PackedWavePlan(rel=jnp.asarray(rel), slot=jnp.asarray(slot),
                          lanes=lanes, n_chunks=K, bmax=bmax)


@functools.partial(jax.jit, static_argnames=("Ec", "K"))
def _plan_chunk_bmax(in_offsets, Ec: int, K: int):
    """Max vertices-with-in-edges per edge chunk (the one scalar the host
    planner needs to size the static extraction tables). Scatter-free:
    ``last`` (per-vertex final in-edge position) is NONDECREASING, so the
    per-chunk vertex count is a difference of has-prefix-sums at the K
    chunk boundaries — the segment_sum it replaces lowered to a [Vp]
    scatter-add whose dispatch crashed the TPU worker at RMAT-25
    (Vp=50M, 2026-08-21)."""
    in_off = in_offsets.astype(jnp.int32)
    has = in_off[1:] > in_off[:-1]
    last = in_off[1:] - 1
    cum_has = jnp.cumsum(has.astype(jnp.int32))
    bounds = jnp.arange(1, K + 1, dtype=jnp.int32) * jnp.int32(Ec)
    pos = jnp.searchsorted(last, bounds, side="left").astype(jnp.int32)
    f = jnp.where(pos > 0, cum_has[jnp.maximum(pos - 1, 0)], 0)
    counts = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.int32), f]))
    return counts.max()


@functools.partial(jax.jit, static_argnames=("Ec", "K", "bmax"))
def _plan_tables_device(in_offsets, Ec: int, K: int, bmax: int):
    """Device-side construction of the chunked-wave extraction tables
    (rel [K, bmax] int32, slot [Vp] int32) — sort-based, one sorted
    unique-index fill, no host transfer of the [Vp+1] offsets."""
    Vp = in_offsets.shape[0] - 1
    # int32 throughout: edge positions stay < 2^31 for every single-chip
    # graph this kernel runs (Ep <= 268M at RMAT-24)
    in_off = in_offsets.astype(jnp.int32)
    has = in_off[1:] > in_off[:-1]
    last = in_off[1:] - 1
    chunk_of = jnp.where(has, last // Ec, K).astype(jnp.int32)
    vid = jnp.arange(Vp, dtype=jnp.int32)
    # two-key sort == numpy stable argsort by chunk
    chunk_sorted, order = jax.lax.sort((chunk_of, vid), num_keys=2)
    start = jnp.searchsorted(
        chunk_sorted, jnp.arange(K, dtype=jnp.int32)).astype(jnp.int32)
    rank = jnp.arange(Vp, dtype=jnp.int32) - \
        start[jnp.minimum(chunk_sorted, K - 1)]
    valid = chunk_sorted < K
    p = jnp.where(valid,
                  chunk_sorted * bmax + rank,
                  K * bmax)                      # drop target for invalid
    last_sorted = last[order]
    relv = last_sorted - chunk_sorted * Ec
    rel_flat = jnp.zeros(K * bmax, jnp.int32).at[p].set(
        jnp.where(valid, relv, 0), mode="drop")
    # vids: which vertex each extraction row belongs to (pad rows -> Vp,
    # the accumulator's dead column) — the scatter-accumulate wave needs
    # the slot INVERSE per chunk
    vids_flat = jnp.full(K * bmax, Vp, jnp.int32).at[p].set(
        jnp.where(valid, order, Vp), mode="drop")
    slot_sorted = jnp.where(valid, p, jnp.int32(K * bmax))
    # invert the permutation with a second sort (scatter-free)
    _, slot = jax.lax.sort((order, slot_sorted), num_keys=1)
    slot = jnp.concatenate([slot, jnp.full((1,), K * bmax, jnp.int32)])
    return rel_flat.reshape(K, bmax), slot, vids_flat.reshape(K, bmax)


def msbfs_lengths_packed_planned(csr: DeviceCSR, plan: PackedWavePlan,
                                 src: jnp.ndarray, dst: jnp.ndarray,
                                 active: jnp.ndarray, max_iters: int,
                                 use_pallas: bool = False
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed MS-BFS following a PackedWavePlan: single-dispatch kernels
    when the wave fits (n_chunks == 1), chunked streaming expansion
    otherwise. Narrow waves (W < 128) use the Pallas pad-to-one-vreg
    scan shim BY DEFAULT since round 4: the round-2/3 Mosaic faults at
    scale-23 shapes (512 x Ec=262k chunk plans) do not reproduce with
    the round-4 plans (Ec >= 512k, the lane-major layout, and the
    sparse-tail restructuring) — measured clean AND faster at scales
    23 (W=48, 2.34 vs 2.02 GTEPS), 24 (W=16, 1.54 vs 1.19) and 25
    (W=8, 1.30 vs 0.86) on v5e, 2026-08-21. DUCKPGQ_NARROW_PALLAS=0
    opts back into the XLA blocked scan."""
    import os
    if plan.lanes < 32 * 128:
        if os.environ.get("DUCKPGQ_NARROW_PALLAS", "1") != "1":
            use_pallas = False
    if plan.n_chunks == 1:
        return _msbfs_lengths_packed(csr, src, dst, active, max_iters,
                                     use_pallas)
    # Chunked waves ALL host-step by default since round 4: narrow waves
    # because one full-depth dispatch crashes the tunnel worker
    # (BASELINE.md), and wide waves because host stepping is what lets
    # the sparse-frontier tail engage — measured faster at EVERY scale
    # (RMAT-18 36.4 -> 40.1 GTEPS, 20: 28.9 -> 34.5, 22: 12.0 -> 15.2;
    # 2026-08-21). Narrow waves use the lane-major [W, Vp+1] layout,
    # which tiles exactly (edge-major [Vp, W] pays up to 128/W x
    # T(8,128) padding on every vertex buffer). DUCKPGQ_SEG_ITERS=0
    # restores the monolithic kernel.
    narrow = plan.lanes < 32 * 128
    layout = os.environ.get("DUCKPGQ_CHUNKED_LAYOUT",
                            "lm" if narrow else "em")
    seg_iters = int(os.environ.get("DUCKPGQ_SEG_ITERS", "4"))
    if layout == "lm":
        return _msbfs_chunked_stepped(csr, plan, src, dst, active,
                                      max_iters, use_pallas,
                                      seg_iters if seg_iters > 0
                                      else max_iters, lane_major=True)
    if seg_iters > 0 and max_iters > seg_iters:
        return _msbfs_chunked_stepped(csr, plan, src, dst, active,
                                      max_iters, use_pallas, seg_iters)
    return _msbfs_lengths_packed_chunked(csr, plan, src, dst, active,
                                         max_iters, use_pallas)


@functools.partial(jax.jit, static_argnames=("max_iters", "use_pallas"))
def _msbfs_lengths_packed_chunked(csr: DeviceCSR, plan: PackedWavePlan,
                                  src: jnp.ndarray, dst: jnp.ndarray,
                                  active: jnp.ndarray, max_iters: int,
                                  use_pallas: bool
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-major packed MS-BFS with the expansion streamed in n_chunks
    edge super-chunks (see PackedWavePlan). Per super-chunk: gather
    [Ec, W] frontier rows, segmented OR-scan with a carry threaded across
    chunks (the open segment at a chunk boundary), then pull each
    chunk-final vertex's row into the compact buffer; ``slot`` expands the
    compact buffer back to [Vp, W] with one static gather."""
    word_of_lane, bit_of_lane, searching, result = _wave_state(
        src, dst, active)
    deg = out_degrees(csr).astype(jnp.float32)       # [Vp]

    W = src.shape[0] // 32
    frontier = jnp.zeros((csr.vpad + 1, W), dtype=jnp.uint32)
    frontier = frontier.at[src, word_of_lane].add(
        jnp.where(searching, bit_of_lane, jnp.uint32(0)))
    seen = frontier

    body = _chunked_wave_body(csr, plan, src, dst, word_of_lane,
                              bit_of_lane, searching, use_pallas)

    def cond(state):
        it, frontier, seen, result = state
        return (it <= max_iters) & (frontier != 0).any()

    _, _, seen, result = jax.lax.while_loop(
        cond, body, (jnp.int32(1), frontier, seen, result))

    traversed = _packed_traversed(seen[:csr.vpad], deg, src.shape[0],
                                  edge_major=True)
    return result, traversed


def _wave_heads(csr):
    """(dense heads or None, packed head bits or None) — slimmed CSRs
    carry packed bits and no in_dst (csr_slim_waves)."""
    if getattr(csr, "heads", None) is not None:
        return None, csr.heads
    heads, _, _ = _in_segments(csr)
    return heads, None


def _heads_slice(heads_dense, heads_bits, off, Ec: int):
    """[Ec] bool segment heads for edge positions [off, off+Ec)."""
    if heads_bits is not None:
        hw = jax.lax.dynamic_slice(heads_bits, (off // 32,), (Ec // 32,))
        return (((hw[:, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1)
                .astype(bool).reshape(Ec))
    return jax.lax.dynamic_slice(heads_dense, (off,), (Ec,))


def _chunked_wave_body(csr, plan, src, dst, word_of_lane, bit_of_lane,
                       searching, use_pallas):
    """Build the per-iteration ``body(state)`` of the chunked packed wave
    — the op sequence is SHARED by the monolithic while_loop kernel and
    the host-stepped segment kernel, so the two stay bit-identical by
    construction (their jaxprs still differ in loop plumbing, so cached
    executables are per-kernel)."""
    Vp = csr.vpad
    Ep = csr.epad
    L = src.shape[0]
    W = L // 32
    # W >= 128 tiles vregs exactly; narrower W pads the vreg lane axis but
    # still beats the tiny single-dispatch fallback on huge-V graphs
    # (RMAT-23+) where the resident [Vp, W] state caps the width
    assert L == plan.lanes and L % 32 == 0, (L, plan.lanes)
    K = plan.n_chunks
    Ec = Ep // K
    bmax = plan.bmax

    heads, heads_bits = _wave_heads(csr)

    # VMEM-block cap by PADDED width: blocks tile to (8,128) vregs, so a
    # (chunk, W) block occupies chunk * max(W, 128) lanes — at W < 128 the
    # padding (and the (chunk, 1) heads block, also padded to 128 lanes)
    # doubled the footprint and the Mosaic scan ran out of scoped VMEM at
    # RMAT-23's W=64 wave
    chunk_cap = max(128, (2048 * 128) // max(W, 128))
    scan_chunk = 1
    while scan_chunk * 2 <= min(Ec, chunk_cap) and Ec % (scan_chunk * 2) == 0:
        scan_chunk *= 2
    scan_block = _scan_block_size(Ec)

    def expand(frontier):
        def chunk_step(k, state):
            compact, carry = state
            off = k * Ec
            idx = jax.lax.dynamic_slice(csr.in_src, (off,), (Ec,))
            hds = _heads_slice(heads, heads_bits, off, Ec)
            g = jnp.take(frontier, idx, axis=0)          # [Ec, W]
            if use_pallas:
                from ..kernels.segscan_pallas import seg_or_scan_packed_carry
                scanned, carry = seg_or_scan_packed_carry(
                    g, hds, carry, chunk=scan_chunk)
            elif scan_block < Ec:
                # blocked scan: compile size O(log block) regardless of Ec
                # — the only XLA formulation the shared AOT helper can
                # compile at RMAT-23/24 chunk shapes (see _scan_block_size)
                scanned, carry = _seg_or_scan_blocked(g, hds, carry,
                                                      scan_block)
            else:
                g0 = g[0] | jnp.where(hds[0], jnp.uint32(0), carry[0])
                g = jax.lax.dynamic_update_slice(g, g0[None, :], (0, 0))
                _, scanned = jax.lax.associative_scan(
                    _seg_or_pair, (hds.astype(jnp.int32).reshape(-1, 1), g),
                    axis=0)
                carry = scanned[-1:]
            rel = jax.lax.dynamic_index_in_dim(plan.rel, k, 0,
                                               keepdims=False)   # [bmax]
            vals = jnp.take(scanned, rel, axis=0)        # [bmax, W]
            compact = jax.lax.dynamic_update_slice(compact, vals,
                                                   (k * bmax, 0))
            return compact, carry

        compact0 = jnp.zeros((K * bmax + 1, W), jnp.uint32)
        carry0 = jnp.zeros((1, W), jnp.uint32)
        compact, _ = jax.lax.fori_loop(0, K, chunk_step, (compact0, carry0))
        # slot's pad row points at compact's zero row: output is directly
        # [Vp + 1, W], saving one full-width copy (the old concat) — one
        # fewer live [Vp, W] buffer at peak (the RMAT-23 W=64 OOM margin)
        return jnp.take(compact, plan.slot, axis=0)      # [Vp + 1, W]

    def body(state):
        it, frontier, seen, result = state
        nxt = expand(frontier) & ~seen
        seen = seen | nxt
        found = ((nxt[dst, word_of_lane] & bit_of_lane) != 0) \
            & (result < 0) & searching
        result = jnp.where(found, it, result)
        nxt = nxt & _pack_words(result < 0, W)[None, :]
        return it + 1, nxt, seen, result

    return body


def _chunked_wave_body_lm(csr, plan, src, dst, word_of_lane, bit_of_lane,
                          searching, use_pallas):
    """Lane-major ([W, Vp+1] frontier) mirror of _chunked_wave_body. For
    W < 128 this is the layout that does NOT pay XLA's T(8,128) minor-dim
    padding: measured at scale 23, a [Vp, 64] edge-major buffer tiles at
    2.0x its unpadded bytes (the W=64 compile-OOM, scripts/
    bench_wide_probe.py) while [W, Vp] tiles exactly — and every
    elementwise op runs at full vreg lane utilization instead of W/128."""
    Ep = csr.epad
    L = src.shape[0]
    W = L // 32
    assert L == plan.lanes and L % 32 == 0, (L, plan.lanes)
    K = plan.n_chunks
    Ec = Ep // K
    bmax = plan.bmax

    heads, heads_bits = _wave_heads(csr)
    chunk_cap = max(128, (2048 * 128) // max(W, 128))
    scan_chunk = 1
    while scan_chunk * 2 <= min(Ec, chunk_cap) and Ec % (scan_chunk * 2) == 0:
        scan_chunk *= 2
    scan_block = _scan_block_size(Ec)

    # NOTE (round-4 negative result): the lane-major column gather
    # touches ceil(W/8) separate (8,128) tiles per edge (~17.6M idx/s at
    # W=48 vs ~90M for contiguous rows). Two attempts to gather from a
    # flat [Vp*W] edge-major copy instead — vmap'd dynamic_slice and an
    # explicit slice-size-W GatherOp — both crashed the v5e worker on
    # the first dense dispatch (2026-08-21); this backend's gather
    # lowering only behaves for unit/minor-dim slices. Don't retry
    # blindly; a Pallas kernel with manual DMA would be the next angle.

    def expand(frontier):                            # [W, Vp + 1]
        def chunk_step(k, state):
            compact, carry = state
            off = k * Ec
            idx = jax.lax.dynamic_slice(csr.in_src, (off,), (Ec,))
            hds = _heads_slice(heads, heads_bits, off, Ec)
            g = jnp.take(frontier, idx, axis=1)      # [W, Ec]
            if use_pallas:
                from ..kernels.segscan_pallas import seg_or_scan_rows_carry
                scanned, carry = seg_or_scan_rows_carry(
                    g, hds, carry, chunk=scan_chunk)
            else:
                scanned, carry = _seg_or_scan_blocked_rows(
                    g, hds, carry, scan_block)
            rel = jax.lax.dynamic_index_in_dim(plan.rel, k, 0,
                                               keepdims=False)   # [bmax]
            vals = jnp.take(scanned, rel, axis=1)    # [W, bmax]
            compact = jax.lax.dynamic_update_slice(compact, vals,
                                                   (0, k * bmax))
            return compact, carry

        compact0 = jnp.zeros((W, K * bmax + 1), jnp.uint32)
        carry0 = jnp.zeros((W, 1), jnp.uint32)
        compact, _ = jax.lax.fori_loop(0, K, chunk_step, (compact0, carry0))
        return jnp.take(compact, plan.slot, axis=1)  # [W, Vp + 1]

    def body(state):
        it, frontier, seen, result = state
        nxt = expand(frontier) & ~seen
        seen = seen | nxt
        found = ((nxt[word_of_lane, dst] & bit_of_lane) != 0) \
            & (result < 0) & searching
        result = jnp.where(found, it, result)
        nxt = nxt & _pack_words(result < 0, W)[:, None]
        return it + 1, nxt, seen, result

    return body


@functools.partial(jax.jit, static_argnames=("use_pallas", "lane_major"),
                   donate_argnames=("frontier", "seen", "result"))
def _chunked_wave_segment(csr: DeviceCSR, plan: PackedWavePlan,
                          src: jnp.ndarray, dst: jnp.ndarray,
                          word_of_lane, bit_of_lane, searching,
                          it0, end, frontier, seen, result,
                          use_pallas: bool, lane_major: bool = False):
    """Run BFS iterations it0..end of the chunked wave (state in, state
    out, buffers donated). ``end`` is a DYNAMIC scalar so one executable
    serves every segment length. Splitting the while_loop across host
    dispatches bounds single-dispatch runtime: the axon tunnel worker
    crashes on very long dispatches (a 16-iteration RMAT-23 wave, ~150 s,
    died; the same kernel at 4 iterations / 37 s runs — 2026-08-21)."""
    make_body = _chunked_wave_body_lm if lane_major else _chunked_wave_body
    body = make_body(csr, plan, src, dst, word_of_lane,
                     bit_of_lane, searching, use_pallas)

    def cond(state):
        it, frontier, seen, result = state
        return (it <= end) & (frontier != 0).any()

    it, frontier, seen, result = jax.lax.while_loop(
        cond, body, (it0, frontier, seen, result))
    return it, frontier, seen, result, (frontier != 0).any()


@functools.partial(jax.jit,
                   static_argnames=("use_pallas", "lane_major",
                                    "a_cap", "e_cap"),
                   donate_argnames=("frontier", "seen", "result"))
def _chunked_wave_segment_occ(csr: DeviceCSR, plan: PackedWavePlan,
                              src: jnp.ndarray, dst: jnp.ndarray,
                              word_of_lane, bit_of_lane, searching,
                              it0, end, frontier, seen, result,
                              use_pallas: bool, lane_major: bool,
                              a_cap: int, e_cap: int):
    """_chunked_wave_segment that ALSO exits as soon as the frontier
    fits the sparse-tail budgets — the BFS collapse (3.8M -> 1 occupied
    vertices across ONE 4-iteration dense segment in the RMAT-23 trace)
    otherwise burns full dense sweeps on frontiers the sparse kernel
    handles in a fraction of the time. Tracks (occ, tot) per iteration
    (one cheap state pass) and returns them so the host switches without
    an extra dispatch. Kept separate from _chunked_wave_segment so the
    sparse-disabled path's jaxpr (and its cached executables) stays
    byte-identical."""
    make_body = _chunked_wave_body_lm if lane_major else _chunked_wave_body
    body0 = make_body(csr, plan, src, dst, word_of_lane,
                      bit_of_lane, searching, use_pallas)

    def body(state):
        it, frontier, seen, result, occ, tot = state
        it, frontier, seen, result = body0((it, frontier, seen, result))
        occ, tot = _frontier_occupancy(csr, frontier, lane_major)
        return it, frontier, seen, result, occ, tot

    def cond(state):
        it, frontier, seen, result, occ, tot = state
        fits_sparse = (occ <= a_cap) & (tot <= e_cap)
        return (it <= end) & (occ > 0) & ~fits_sparse

    big = jnp.int32(2**31 - 1)
    it, frontier, seen, result, occ, tot = jax.lax.while_loop(
        cond, body, (it0, frontier, seen, result, big, big))
    return it, frontier, seen, result, occ, tot


@functools.partial(jax.jit, static_argnames=("lane_major",))
def _chunked_wave_init(csr: DeviceCSR, src, word_of_lane, bit_of_lane,
                       searching, lane_major: bool = False):
    W = src.shape[0] // 32
    bits = jnp.where(searching, bit_of_lane, jnp.uint32(0))
    if lane_major:
        frontier = jnp.zeros((W, csr.vpad + 1), dtype=jnp.uint32)
        frontier = frontier.at[word_of_lane, src].add(bits)
    else:
        frontier = jnp.zeros((csr.vpad + 1, W), dtype=jnp.uint32)
        frontier = frontier.at[src, word_of_lane].add(bits)
    # seen must be a DISTINCT buffer from frontier: both are donated by
    # _chunked_wave_segment, and if XLA ever aliased the two outputs
    # (after folding a copy-like op) the donation would alias one buffer
    # twice. optimization_barrier pins a real copy (ADVICE r3).
    seen = jax.lax.optimization_barrier(frontier) + jnp.uint32(0)
    return frontier, seen


@functools.partial(jax.jit, static_argnames=("L", "lane_major"))
def _traversed_from_seen(csr: DeviceCSR, seen, L: int,
                         lane_major: bool = False):
    deg = out_degrees(csr).astype(jnp.float32)
    seen_v = seen[:, :csr.vpad] if lane_major else seen[:csr.vpad]
    return _packed_traversed(seen_v, deg, L, edge_major=not lane_major)


# ---------------------------------------------------------------------------
# sparse-frontier tail mode (VERDICT r3 item 2)
#
# After ~depth 4 the RMAT frontier collapses but the dense chunked wave
# still pays a full [Ep, W] sweep per iteration (BASELINE.md RMAT-23:
# 2.58 GTEPS at depth 4 vs 1.14 at depth 16). This is the TPU analog of
# the reference's sparse/dense frontier switch
# (src/core/functions/scalar/reachability.cpp:154-163, VISIT_SIZE_DIVISOR):
# when few vertices hold new bits, expand ONLY their out-edges under a
# static budget. Formulation keeps the no-big-scatter invariant: the only
# scatter is E_cap int32 POSITIONS (not rows) — the frontier rows flow
# through gather / sort / blocked segmented-OR scan / gather, exactly the
# op classes the AOT compile helper is known to handle.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("lane_major",))
def _frontier_occupancy(csr: DeviceCSR, frontier, lane_major: bool = False):
    """(occupied vertex count, total out-degree of occupied vertices) of a
    packed frontier — the two scalars the host-stepped driver uses to pick
    dense vs sparse for the next dispatch."""
    if lane_major:
        any_v = (frontier[:, :csr.vpad] != 0).any(axis=0)
    else:
        any_v = (frontier[:csr.vpad] != 0).any(axis=1)
    deg = csr.offsets[1:] - csr.offsets[:-1]
    occ = any_v.sum(dtype=jnp.int32)
    tot = jnp.where(any_v, deg, 0).sum(dtype=jnp.int32)
    return occ, tot


def build_out_dst_device(csr: DeviceCSR) -> jnp.ndarray:
    """Out-edge destinations sorted by source ([Ep] int32) for the sparse
    tail. Full CSRs already carry this as ``csr.e``; lengths-only CSRs
    (bench path) re-sort the in-edge view ON DEVICE (pad edges carry
    src=vpad and sort to the end, consistent with ``csr.offsets``)."""
    if csr.e is not None:
        return csr.e
    _, d_by_s = jax.lax.sort((csr.in_src, csr.in_dst), num_keys=1)
    return d_by_s


def _sparse_expand(csr: DeviceCSR, out_dst, frontier, a_cap: int,
                   e_cap: int, lane_major: bool):
    """One sparse frontier expansion: returns the full-width next-frontier
    candidate ([W, Vp+1] lane-major / [Vp+1, W] edge-major), bit-identical
    to the dense expand whenever (occ <= a_cap and active out-degree sum
    <= e_cap) — the host guarantees that before dispatching."""
    Vp = csr.vpad
    if lane_major:
        W = frontier.shape[0]
        any_v = (frontier[:, :Vp] != 0).any(axis=0)
    else:
        W = frontier.shape[1]
        any_v = (frontier[:Vp] != 0).any(axis=1)
    av = jnp.nonzero(any_v, size=a_cap, fill_value=Vp)[0].astype(jnp.int32)
    degs = jnp.where(av < Vp, csr.offsets[av + 1] - csr.offsets[av], 0)
    cum = jnp.cumsum(degs)                                   # [A]
    total = cum[-1]
    j = jnp.arange(e_cap, dtype=jnp.int32)
    i_of_j = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    i_cl = jnp.minimum(i_of_j, a_cap - 1)
    base = jnp.where(i_cl > 0, cum[jnp.maximum(i_cl - 1, 0)], 0)
    valid = j < total
    srcv = jnp.where(valid, av[i_cl], Vp)                    # [Eb]
    e_idx = jnp.where(valid, csr.offsets[jnp.minimum(srcv, Vp)]
                      + (j - base), 0)
    d = jnp.where(valid, out_dst[e_idx], Vp).astype(jnp.int32)
    d_sorted, perm = jax.lax.sort((d, j), num_keys=1)
    hds = jnp.concatenate([jnp.ones(1, bool),
                           d_sorted[1:] != d_sorted[:-1]])
    block = _scan_block_size(e_cap)
    # segment-final position of each destination; absent vertices point
    # at the trailing zero column (the dense kernel's plan.slot pattern).
    # Two formulations:
    #   scatter (default): pos.at[d_sorted].max(j) — e_cap int32 updates,
    #     duplicate keys resolve to the max position = the segment final.
    #     ~50x cheaper than the searchsorted at RMAT-24 shapes (the [Vp]
    #     binary search was ~5 s of the 6.9 s sparse iteration).
    #   searchsorted (DUCKPGQ_SPARSE_IDX=search): gather-only fallback in
    #     case a backend's scatter lowering misbehaves.
    import os as _os
    if _os.environ.get("DUCKPGQ_SPARSE_IDX", "scatter") == "scatter":
        pos = jnp.full((Vp + 1,), -1, jnp.int32).at[d_sorted].max(
            j, mode="drop")
        idx = jnp.where(pos < 0, e_cap, pos)
    else:
        pos = jnp.searchsorted(
            d_sorted, jnp.arange(Vp + 1, dtype=jnp.int32),
            side="right").astype(jnp.int32) - 1
        pos_cl = jnp.maximum(pos, 0)
        idx = jnp.where(
            d_sorted[pos_cl] == jnp.arange(Vp + 1, dtype=jnp.int32),
            pos_cl, e_cap)
    if lane_major:
        g = jnp.take(frontier, srcv, axis=1)                 # [W, Eb]
        g = jnp.take(g, perm, axis=1)
        scanned, _ = _seg_or_scan_blocked_rows(
            g, hds, jnp.zeros((W, 1), jnp.uint32), block)
        scanned = jnp.concatenate(
            [scanned, jnp.zeros((W, 1), jnp.uint32)], axis=1)
        return _take_cols_chunked(scanned, idx)              # [W, Vp+1]
    g = jnp.take(frontier, srcv, axis=0)                     # [Eb, W]
    g = jnp.take(g, perm, axis=0)
    scanned, _ = _seg_or_scan_blocked(
        g, hds, jnp.zeros((1, W), jnp.uint32), block)
    scanned = jnp.concatenate(
        [scanned, jnp.zeros((1, W), jnp.uint32)], axis=0)
    return _take_rows_chunked(scanned, idx)                  # [Vp+1, W]


_GATHER_CHUNK = 262144


def _take_cols_chunked(table, idx, chunk: int = _GATHER_CHUNK):
    """jnp.take(table, idx, axis=1) as a fori_loop over fixed index
    chunks. One monolithic Vp-sized gather along the minor axis makes
    XLA materialize a vertex-major [Vp, W] intermediate whose W-minor
    T(8,128) tiles pad 128/W x — a 12 GB HLO temp at RMAT-24 W=16 that
    OOMed the sparse-step compile (2026-08-21). Chunking bounds the
    padded intermediate at [chunk, W] and keeps the output (and the
    seen/frontier buffers it feeds) in their natural lane-major
    layout."""
    W = table.shape[0]
    n = idx.shape[0]
    nb, rem = n // chunk, n % chunk

    def step(c, out):
        sl = jax.lax.dynamic_slice(idx, (c * chunk,), (chunk,))
        vals = jnp.take(table, sl, axis=1)
        return jax.lax.dynamic_update_slice(out, vals, (0, c * chunk))

    out = jnp.zeros((W, n), table.dtype)
    if nb:
        out = jax.lax.fori_loop(0, nb, step, out)
    if rem:
        sl = jax.lax.dynamic_slice(idx, (nb * chunk,), (rem,))
        vals = jnp.take(table, sl, axis=1)
        out = jax.lax.dynamic_update_slice(out, vals, (0, nb * chunk))
    return out


def _or_take_cols_chunked(acc, table, idx, chunk: int = _GATHER_CHUNK):
    """acc[:, j] |= table[:, idx[j]] without materializing a second
    [W, n] buffer: per index chunk, gather the table columns, OR with the
    matching acc slice, and write back (the fori_loop carry aliases acc
    in place under XLA)."""
    W = table.shape[0]
    n = idx.shape[0]
    nb, rem = n // chunk, n % chunk

    def step(c, acc):
        sl = jax.lax.dynamic_slice(idx, (c * chunk,), (chunk,))
        vals = jnp.take(table, sl, axis=1)
        cur = jax.lax.dynamic_slice(acc, (0, c * chunk), (W, chunk))
        return jax.lax.dynamic_update_slice(acc, cur | vals,
                                            (0, c * chunk))

    if nb:
        acc = jax.lax.fori_loop(0, nb, step, acc)
    if rem:
        sl = jax.lax.dynamic_slice(idx, (nb * chunk,), (rem,))
        vals = jnp.take(table, sl, axis=1)
        cur = jax.lax.dynamic_slice(acc, (0, nb * chunk), (W, rem))
        acc = jax.lax.dynamic_update_slice(acc, cur | vals,
                                           (0, nb * chunk))
    return acc


def _take_rows_chunked(table, idx, chunk: int = _GATHER_CHUNK):
    """Edge-major mirror of _take_cols_chunked (axis 0)."""
    W = table.shape[1]
    n = idx.shape[0]
    nb, rem = n // chunk, n % chunk

    def step(c, out):
        sl = jax.lax.dynamic_slice(idx, (c * chunk,), (chunk,))
        vals = jnp.take(table, sl, axis=0)
        return jax.lax.dynamic_update_slice(out, vals, (c * chunk, 0))

    out = jnp.zeros((n, W), table.dtype)
    if nb:
        out = jax.lax.fori_loop(0, nb, step, out)
    if rem:
        sl = jax.lax.dynamic_slice(idx, (nb * chunk,), (rem,))
        vals = jnp.take(table, sl, axis=0)
        out = jax.lax.dynamic_update_slice(out, vals, (nb * chunk, 0))
    return out


@functools.partial(jax.jit,
                   static_argnames=("a_cap", "e_cap", "lo_a", "lo_e",
                                    "lane_major"),
                   donate_argnames=("frontier", "seen", "result"))
def _sparse_wave_segment(csr: DeviceCSR, out_dst, src, dst, word_of_lane,
                         bit_of_lane, searching, it0, end, occ0, tot0,
                         frontier, seen, result,
                         a_cap: int, e_cap: int, lo_a: int = 0,
                         lo_e: int = 0, lane_major: bool = False):
    """Run sparse-tail BFS iterations it0..end in ONE dispatch. The
    while_loop re-checks the occupancy budgets each iteration on device
    (a sparse expand is only valid when occ <= a_cap and the active
    out-degree sum <= e_cap), so the loop exits the moment the frontier
    outgrows them and the host falls back to a dense segment —
    per-iteration host round trips over the slow tunnel would otherwise
    eat the sparse iterations' entire advantage.

    ``lo_a``/``lo_e``: when nonzero, ALSO exit once the frontier fits a
    SMALLER tier — the per-iteration sort is e_cap-sized regardless of
    occupancy (a 2M-element sort is ~1.7 s/iteration on v5e even for a
    35k-vertex frontier), so the host re-dispatches the small-tier
    kernel for the deep tail."""
    W = src.shape[0] // 32

    def cond(state):
        it, frontier, seen, result, occ, tot = state
        ok = (it <= end) & (occ > 0) & (occ <= a_cap) & (tot <= e_cap)
        if lo_a:
            ok &= ~((occ <= lo_a) & (tot <= lo_e))
        return ok

    def body(state):
        it, frontier, seen, result, occ, tot = state
        nxt = _sparse_expand(csr, out_dst, frontier, a_cap, e_cap,
                             lane_major)
        nxt = nxt & ~seen
        seen = seen | nxt
        if lane_major:
            found = ((nxt[word_of_lane, dst] & bit_of_lane) != 0) \
                & (result < 0) & searching
            result = jnp.where(found, it, result)
            nxt = nxt & _pack_words(result < 0, W)[:, None]
        else:
            found = ((nxt[dst, word_of_lane] & bit_of_lane) != 0) \
                & (result < 0) & searching
            result = jnp.where(found, it, result)
            nxt = nxt & _pack_words(result < 0, W)[None, :]
        occ, tot = _frontier_occupancy(csr, nxt, lane_major)
        return it + 1, nxt, seen, result, occ, tot

    it, frontier, seen, result, occ, tot = jax.lax.while_loop(
        cond, body, (it0, frontier, seen, result, occ0, tot0))
    return it, frontier, seen, result, occ, tot


def _sparse_tail_caps(ec: int, w: int):
    """Sparse-tail budget TIERS, smallest first: [(a_cap, e_cap), ...];
    [] disables. The per-iteration sort is e_cap-sized regardless of
    occupancy, so the deep tail runs a small tier (262144 edges) and the
    collapse/ramp iterations a large one (three [W, e_cap] buffers
    budgeted at ~1.5 GB, capped at 4M edges). a_cap = e_cap: the edge
    budget is the binding constraint on power-law graphs (RMAT-23
    trace), and the [a_cap] cumsum side arrays are cheap."""
    import os
    if os.environ.get("DUCKPGQ_SPARSE_TAIL", "1") != "1":
        return []
    e_env = int(os.environ.get("DUCKPGQ_SPARSE_E", "0"))
    if e_env:
        e_hi = e_env
    else:
        budget = (1536 << 20) // (12 * max(w, 1))   # 3 bufs x 4 B/word
        e_hi = 262144
        while e_hi * 2 <= min(budget, 4 << 20):
            e_hi *= 2
    a_env = int(os.environ.get("DUCKPGQ_SPARSE_A", "0"))
    tiers = []
    e_lo = min(262144, e_hi)
    tiers.append((a_env or e_lo, e_lo))
    if e_hi > e_lo:
        tiers.append((a_env or e_hi, e_hi))
    return tiers


def _msbfs_chunked_stepped(csr: DeviceCSR, plan: PackedWavePlan,
                           src: jnp.ndarray, dst: jnp.ndarray,
                           active: jnp.ndarray, max_iters: int,
                           use_pallas: bool, seg_iters: int,
                           lane_major: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Host-stepped chunked wave: ``seg_iters`` BFS iterations per device
    dispatch, state resident on device between dispatches (one scalar D2H
    per segment for the empty-frontier exit). Bit-identical to the
    monolithic kernel; used for narrow (W < 128) waves on huge graphs
    where a full-depth dispatch exceeds the tunnel worker's tolerated
    runtime (BASELINE.md RMAT-23). ``lane_major`` picks the [W, Vp+1]
    state layout (see _chunked_wave_body_lm)."""
    import numpy as np

    import os
    import sys
    import time

    word_of_lane, bit_of_lane, searching, result = _wave_state_jit(
        src, dst, active)
    frontier, seen = _chunked_wave_init(csr, src, word_of_lane,
                                        bit_of_lane, searching,
                                        lane_major)
    W = src.shape[0] // 32
    tiers = _sparse_tail_caps(csr.epad // plan.n_chunks, W)
    a_cap, e_cap = tiers[-1] if tiers else (0, 0)    # largest tier
    out_dst = build_out_dst_device(csr) if tiers else None
    log = os.environ.get("DUCKPGQ_SPARSE_LOG", "0") == "1"
    occ = tot = None                 # unknown until first measured
    if tiers:
        # seed occupancy (<= lane count of distinct sources): BFS waves
        # START sparse — the first 1-2 levels' frontiers are tiny and a
        # full dense sweep on them is pure waste (RMAT-23 trace)
        d_occ, d_tot = _frontier_occupancy(csr, frontier, lane_major)
        occ, tot = int(np.asarray(d_occ)), int(np.asarray(d_tot))
    it = jnp.int32(1)
    next_it = 1
    while next_it <= max_iters:
        tier = next(((a, e) for a, e in tiers
                     if occ is not None and occ <= a and tot <= e), None)
        if tier is not None:
            # batched sparse tail at the SMALLEST fitting tier: ONE
            # dispatch runs iterations until the depth cap, the frontier
            # empties, the occupancy outgrows this tier (host may pick a
            # bigger one next), or it fits a smaller tier (host
            # re-dispatches with a cheaper sort)
            t_a, t_e = tier
            t_i = tiers.index(tier)
            lo_a, lo_e = tiers[t_i - 1] if t_i > 0 else (0, 0)
            t0 = time.time()
            it, frontier, seen, result, d_occ, d_tot = \
                _sparse_wave_segment(
                    csr, out_dst, src, dst, word_of_lane, bit_of_lane,
                    searching, it, jnp.int32(max_iters), jnp.int32(occ),
                    jnp.int32(tot), frontier, seen, result,
                    t_a, t_e, lo_a, lo_e, lane_major)
            occ, tot = int(np.asarray(d_occ)), int(np.asarray(d_tot))
            done = int(np.asarray(it)) - next_it
            if log:
                print(f"# sparse seg (e_cap {t_e}): iters "
                      f"{next_it}..{next_it + done - 1}"
                      f" in {time.time() - t0:.2f}s -> occ={occ} "
                      f"deg={tot}", file=sys.stderr)
            next_it += max(done, 1)
            nonempty = occ > 0
        elif tiers:
            # dense segment WITH per-iteration occupancy exit: hand back
            # to the sparse kernel the moment the frontier collapses
            # under the budgets (which can happen mid-segment)
            end = jnp.int32(min(next_it + seg_iters - 1, max_iters))
            t0 = time.time()
            it, frontier, seen, result, d_occ, d_tot = \
                _chunked_wave_segment_occ(
                    csr, plan, src, dst, word_of_lane, bit_of_lane,
                    searching, it, end, frontier, seen, result,
                    use_pallas, lane_major, a_cap, e_cap)
            occ, tot = int(np.asarray(d_occ)), int(np.asarray(d_tot))
            done_end = int(np.asarray(it)) - 1
            if log:
                print(f"# dense seg: {next_it}..{done_end} in "
                      f"{time.time() - t0:.2f}s -> occ={occ} deg={tot} "
                      f"(caps {a_cap}/{e_cap})", file=sys.stderr)
            next_it = done_end + 1
            nonempty = occ > 0
        else:
            end = jnp.int32(min(next_it + seg_iters - 1, max_iters))
            t0 = time.time()
            it, frontier, seen, result, nonempty = _chunked_wave_segment(
                csr, plan, src, dst, word_of_lane, bit_of_lane, searching,
                it, end, frontier, seen, result, use_pallas, lane_major)
            nonempty = bool(np.asarray(nonempty))
            next_it = min(next_it + seg_iters - 1, max_iters) + 1
        if not nonempty:
            break
    traversed = _traversed_from_seen(csr, seen, src.shape[0], lane_major)
    return result, traversed


# ---------------------------------------------------------------------------
# multi-run wave (RunsCSR): single-chip RMAT-26-class graphs
# ---------------------------------------------------------------------------

def plan_runs_wave(runs_csr, lanes: Optional[int] = 32,
                   ec_cap: int = 1 << 20,
                   hbm_budget: Optional[int] = None):
    """Per-run PackedWavePlans for the multi-run wave (equal-length runs
    share K; tables built on device, one bmax scalar pulled per run).
    ``lanes=None`` picks the widest HBM-feasible width from a fit model
    of the slimmed wave (head bits instead of in_dst, run_offsets freed,
    in-place OR accumulation — see runs_with_head_bits)."""
    import os
    plans = []
    R = runs_csr.n_runs
    rl = runs_csr.epad // R
    K = 1
    while rl // K > ec_cap and rl % (K * 2) == 0 and \
            (rl // (K * 2)) % 128 == 0:
        K *= 2
    Ec = rl // K
    tables = []
    for r in range(R):
        offs = runs_csr.run_offsets[r]
        bmax = max(int(_plan_chunk_bmax(offs, Ec, K)), 1)
        rel, slot, vids = _plan_tables_device(offs, Ec, K, bmax)
        tables.append((rel, slot, vids, bmax))
    if lanes is None:
        Vp, Ep = runs_csr.vpad, runs_csr.epad
        if hbm_budget is None:
            # 7/8 of the limit: the per-W model already carries its own
            # 30% XLA-temp margin on the state term
            hbm_budget = 14 << 30
            try:
                stats = jax.devices()[0].memory_stats()
                if stats and stats.get("bytes_limit"):
                    hbm_budget = int(stats["bytes_limit"] * 7) // 8
            except Exception:
                pass
        bmax_hi = max(b for *_, b in tables)
        # scatter default OFF: measured at RMAT-26 (2026-08-22) the
        # column-scatter wave OOMs HBM even at W=4 where the
        # compact+take path runs (the axis-1 gather/scatter pair
        # keeps multiple [W, Vp+1]-scale temps alive)
        scatter = os.environ.get("DUCKPGQ_RUNS_SCATTER", "0") == "1"
        if scatter:
            # scatter-accumulate wave: rel+vids per run (slot unused, no
            # compact buffer). The column scatter keeps an extra [W, Vp+1]
            # output alive (measured: W=6 OOMed at RMAT-26 under a
            # 3-buffer model, 2026-08-22) — charge 4 state buffers.
            fixed = 4 * Ep + Ep // 8 + 4 * (Vp + 1) + \
                sum(2 * 4 * K * b for *_, b in tables)
            per_w = (4 * (Vp + 1) * 4) * 13 // 10 + 4 * Ec * 4
        else:
            # resident after slimming: in_src + head bits + forward
            # offsets + per-run slot/rel tables
            fixed = 4 * Ep + Ep // 8 + 4 * (Vp + 1) + \
                sum(4 * (Vp + 1) + 4 * K * b for *_, b in tables)
            # per word of width: frontier + seen + acc (the take-OR is
            # in-place) + 30% XLA-temp margin on the state (RMAT-23
            # lesson), one [W, K*bmax] compact, 4 [W, Ec] chunk buffers
            per_w = (4 * (Vp + 1) * 3) * 13 // 10 + \
                4 * (K * bmax_hi + 1) + 4 * Ec * 4
        w_fit = max(int((hbm_budget - fixed) // per_w), 1)
        for w in (16, 12, 8, 6, 4, 3, 2, 1):
            if w <= w_fit:
                break
        lanes = int(os.environ.get("BENCH_RUNS_LANES", "0")) or w * 32
    for rel, slot, vids, bmax in tables:
        plans.append(PackedWavePlan(rel=rel, slot=slot, lanes=lanes,
                                    n_chunks=K, bmax=bmax, vids=vids))
    return plans


def _runs_wave_body(runs_csr, plans, src, dst, word_of_lane, bit_of_lane,
                    searching):
    """Lane-major multi-run wave body: the expansion ORs each run's
    chunk-streamed segmented-scan result. Segment head flags are
    computed on the fly from the dst slices (a precomputed [Ep] bool
    heads array would cost another 1.07 GB at scale 26)."""
    Vp = runs_csr.vpad
    L = src.shape[0]
    W = L // 32
    R = runs_csr.n_runs
    rl = runs_csr.epad // R
    K = plans[0].n_chunks
    Ec = rl // K
    scan_block = _scan_block_size(Ec)

    import os
    heads_bits = getattr(runs_csr, "heads", None)
    # scatter default OFF: measured at RMAT-26 (2026-08-22) the
    # column-scatter wave OOMs HBM even at W=4 where the compact+take
    # path runs (the axis-1 gather/scatter pair keeps multiple
    # [W, Vp+1]-scale temps alive)
    use_scatter = os.environ.get("DUCKPGQ_RUNS_SCATTER", "0") == "1" and \
        all(p.vids is not None for p in plans)

    def scan_chunk(frontier, carry, base, k):
        """Shared per-chunk gather + segmented OR-scan."""
        off = base + k * Ec
        idx = jax.lax.dynamic_slice(runs_csr.in_src, (off,), (Ec,))
        if heads_bits is not None:
            # precomputed packed head bits (in_dst itself is freed —
            # RMAT-26: -4.3 GB resident)
            hw = jax.lax.dynamic_slice(heads_bits, (off // 32,),
                                       (Ec // 32,))
            hds = (((hw[:, None] >>
                     jnp.arange(32, dtype=jnp.uint32)) & 1)
                   .astype(bool).reshape(Ec))
        else:
            dsts = jax.lax.dynamic_slice(runs_csr.in_dst, (off,), (Ec,))
            # on-the-fly segment heads; the first row of chunk 0 is a
            # head, later chunks continue the open segment via carry
            prev = jax.lax.dynamic_slice(
                runs_csr.in_dst, (jnp.maximum(off - 1, base),), (1,))
            first_head = jnp.where(k == 0, True, dsts[0] != prev[0])
            hds = jnp.concatenate(
                [first_head[None], dsts[1:] != dsts[:-1]])
        g = jnp.take(frontier, idx, axis=1)          # [W, Ec]
        return _seg_or_scan_blocked_rows(g, hds, carry, scan_block)

    def expand_run(frontier, acc, r, plan):
        base = r * rl

        if use_scatter:
            # scatter-accumulate: OR each chunk's segment-final rows
            # straight into the [W, Vp+1] accumulator at their vertex
            # columns (unique within a chunk; pad rows target the dead
            # column with value 0). No [W, K*bmax] compact buffer, no
            # slot pass — the width lever at RMAT-26.
            def chunk_step_sc(k, state):
                acc, carry = state
                scanned, carry = scan_chunk(frontier, carry, base, k)
                rel = jax.lax.dynamic_index_in_dim(plan.rel, k, 0,
                                                   keepdims=False)
                vid = jax.lax.dynamic_index_in_dim(plan.vids, k, 0,
                                                   keepdims=False)
                vals = jnp.take(scanned, rel, axis=1)     # [W, bmax]
                vals = jnp.where(vid[None, :] == Vp, jnp.uint32(0), vals)
                cur = jnp.take(acc, vid, axis=1)          # [W, bmax]
                acc = acc.at[:, vid].set(cur | vals)
                return acc, carry

            carry0 = jnp.zeros((W, 1), jnp.uint32)
            acc, _ = jax.lax.fori_loop(0, K, chunk_step_sc, (acc, carry0))
            return acc

        def chunk_step(k, state):
            compact, carry = state
            scanned, carry = scan_chunk(frontier, carry, base, k)
            rel = jax.lax.dynamic_index_in_dim(plan.rel, k, 0,
                                               keepdims=False)
            vals = jnp.take(scanned, rel, axis=1)        # [W, bmax]
            compact = jax.lax.dynamic_update_slice(
                compact, vals, (0, k * plan.bmax))
            return compact, carry

        compact0 = jnp.zeros((W, K * plan.bmax + 1), jnp.uint32)
        carry0 = jnp.zeros((W, 1), jnp.uint32)
        compact, _ = jax.lax.fori_loop(0, K, chunk_step,
                                       (compact0, carry0))
        # OR into the accumulator IN PLACE (chunked take+or+update): a
        # separate [W, Vp+1] take output would double the largest live
        # buffer and halve the feasible width at RMAT-26
        return _or_take_cols_chunked(acc, compact, plan.slot)

    def body(state):
        it, frontier, seen, result = state
        acc = jnp.zeros((W, Vp + 1), jnp.uint32)
        for r in range(R):
            acc = expand_run(frontier, acc, r, plans[r])
        nxt = acc & ~seen
        seen = seen | nxt
        found = ((nxt[word_of_lane, dst] & bit_of_lane) != 0) \
            & (result < 0) & searching
        result = jnp.where(found, it, result)
        nxt = nxt & _pack_words(result < 0, W)[:, None]
        return it + 1, nxt, seen, result

    return body


@functools.partial(jax.jit, donate_argnames=("frontier", "seen", "result"))
def _runs_wave_segment(runs_csr, plans, src, dst, word_of_lane,
                       bit_of_lane, searching, it0, end, frontier, seen,
                       result):
    body = _runs_wave_body(runs_csr, plans, src, dst, word_of_lane,
                           bit_of_lane, searching)

    def cond(state):
        it, frontier, seen, result = state
        return (it <= end) & (frontier != 0).any()

    it, frontier, seen, result = jax.lax.while_loop(
        cond, body, (it0, frontier, seen, result))
    return it, frontier, seen, result, (frontier != 0).any()


def msbfs_lengths_runs(runs_csr, plans, src, dst, active, max_iters: int,
                       seg_iters: int = 1):
    """Host-stepped multi-run packed MS-BFS over a RunsCSR (lane-major).
    Bit-identical to the single-run kernels on the same edge multiset
    (the OR over runs commutes with the OR over edges)."""
    import numpy as np

    word_of_lane, bit_of_lane, searching, result = _wave_state_jit(
        src, dst, active)
    frontier, seen = _chunked_wave_init(runs_csr, src, word_of_lane,
                                        bit_of_lane, searching,
                                        lane_major=True)
    it = jnp.int32(1)
    next_it = 1
    while next_it <= max_iters:
        end = jnp.int32(min(next_it + seg_iters - 1, max_iters))
        it, frontier, seen, result, nonempty = _runs_wave_segment(
            runs_csr, plans, src, dst, word_of_lane, bit_of_lane,
            searching, it, end, frontier, seen, result)
        next_it = min(next_it + seg_iters - 1, max_iters) + 1
        if not bool(np.asarray(nonempty)):
            break
    deg = (runs_csr.offsets[1:] - runs_csr.offsets[:-1]).astype(
        jnp.float32)
    traversed = _packed_traversed(seen[:, :runs_csr.vpad], deg,
                                  src.shape[0], edge_major=False)
    return result, traversed


def max_packed_lanes(csr: DeviceCSR, hbm_budget: Optional[int] = None,
                     cap: Optional[int] = None,
                     vertex_buffers: int = 2) -> int:
    """Largest packed-wave lane count whose working set fits HBM.

    Per iteration the packed kernel materializes two [W, Ep] uint32 buffers
    (gather output + scan output, W = lanes/32) plus ``vertex_buffers``
    [W, Vp] uint32 vertex-state buffers (frontier+seen = 2 for the
    unidirectional kernel, 4 for bidirectional); budget for ~3x [W, Ep]
    words to leave room for XLA temporaries. RMAT-20 (Ep=16.8M) lands on
    2048 lanes on a 16 GB chip — the measured HBM-fit limit (BASELINE.md)."""
    if cap is None:
        import os
        cap = int(os.environ.get("DUCKPGQ_MAX_LANES", "8192"))
    if hbm_budget is None:
        hbm_budget = 12 << 30                  # conservative 16 GB default
        try:
            stats = jax.devices()[0].memory_stats()
            if stats and stats.get("bytes_limit"):
                hbm_budget = int(stats["bytes_limit"] * 3) // 4
        except Exception:
            pass
    # two live [W, Ep] uint32 buffers per iteration (gather out + scan out;
    # measured: RMAT-20 runs 2048 lanes on 16 GB, so no extra slack factor)
    per_word = 8 * csr.epad + 4 * vertex_buffers * (csr.vpad + 1)
    w = max(1, hbm_budget // max(per_word, 1))
    lanes = 32
    while lanes * 2 <= min(w * 32, cap):
        lanes *= 2
    return lanes


def _cached_wave_plan(csr: DeviceCSR, lanes: Optional[int] = None
                      ) -> PackedWavePlan:
    """Per-CSR memo of chunked wave plans (the slot tables cost one host
    pass over in_offsets; queries arrive in many batches per CSR)."""
    cache = csr.__dict__.setdefault("_wave_plans", {})
    if lanes not in cache:
        cache[lanes] = plan_packed_wave(csr, lanes=lanes)
    return cache[lanes]


def msbfs_lengths_batched(csr: DeviceCSR, src, dst, lanes: int = 64):
    """Batch arbitrary query counts into fixed-width lane groups (keeps one
    compiled kernel per (graph bucket, lanes)). Uses the bit-packed kernel
    when lanes is a multiple of 32; the wave is auto-narrowed when the
    packed working set would not fit HBM (see max_packed_lanes). Large
    query batches ride the chunked wide-wave plan (plan_packed_wave): the
    per-lane cost of the latency-bound frontier gather keeps falling as
    the wave widens."""
    import numpy as np
    # wide waves only pay off where the frontier gather is latency-bound
    # (HBM); on the CPU test backend they just inflate the working set
    accel = jax.devices()[0].platform != "cpu"
    if lanes % 32 == 0 and len(src) >= 4096 and accel:
        auto = _cached_wave_plan(csr)
        if auto.lanes >= 4096:
            want = min(auto.lanes, round_up(len(src), 4096))
            plan = auto if want == auto.lanes \
                else _cached_wave_plan(csr, lanes=want)
            return _msbfs_batched_planned(csr, plan, src, dst)
    if lanes % 32 == 0:
        lanes = min(lanes, max_packed_lanes(csr))
    max_iters = max(csr.vcount, 1)
    kernel = msbfs_lengths_packed if lanes % 32 == 0 else msbfs_lengths
    return _batched_waves(
        lambda s, d, a: kernel(csr, s, d, a, max_iters), lanes, src, dst)


def _batched_waves(run_wave, L: int, src, dst):
    """Pad a query stream into L-wide waves and collect results (shared by
    the narrow and planned batched paths)."""
    import numpy as np
    n = len(src)
    out = np.full(n, -1, dtype=np.int64)
    total_traversed = 0
    for start in range(0, n, L):
        m = min(L, n - start)
        chunk_s = np.zeros(L, dtype=np.int32)
        chunk_d = np.zeros(L, dtype=np.int32)
        chunk_a = np.zeros(L, dtype=bool)
        chunk_s[:m] = src[start:start + m]
        chunk_d[:m] = dst[start:start + m]
        chunk_a[:m] = True
        res, trav = run_wave(jnp.asarray(chunk_s), jnp.asarray(chunk_d),
                             jnp.asarray(chunk_a))
        out[start:start + m] = np.asarray(res)[:m]
        total_traversed += int(np.asarray(trav)[:m].sum())
    return out, total_traversed


def _msbfs_batched_planned(csr: DeviceCSR, plan: PackedWavePlan, src, dst):
    import os
    use_pallas = os.environ.get("DUCKPGQ_SCAN_IMPL", "xla") == "pallas"
    max_iters = max(csr.vcount, 1)
    return _batched_waves(
        lambda s, d, a: msbfs_lengths_packed_planned(
            csr, plan, s, d, a, max_iters, use_pallas),
        plan.lanes, src, dst)


# ---------------------------------------------------------------------------
# reachability (BFS early-exit is the found-lane masking above)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def msbfs_reachability(csr: DeviceCSR, src, dst, active, max_iters: int):
    lengths, _ = msbfs_lengths(csr, src, dst, active, max_iters)
    return lengths >= 0


# ---------------------------------------------------------------------------
# bidirectional packed MS-BFS
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def msbfs_lengths_bidirectional(csr: DeviceCSR, src: jnp.ndarray,
                                dst: jnp.ndarray, active: jnp.ndarray,
                                max_iters: int
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional bit-packed MS-BFS (reference
    iterativelength_bidirectional.cpp:12-41,119-128): odd iterations expand
    the source-side frontier, even iterations the destination-side one —
    BOTH along forward edges (the reference builds no reverse CSR, so like
    it this is exact only on symmetric/undirected CSRs) — and the reported
    length is the iteration at which the two seen-sets first intersect
    (InterSectFronteers, :34-41). Lane layout matches the lane-major packed
    kernel: frontiers are ``uint32 [W, Vp+1]`` with 32 lanes per word.

    Early-exit parity (reference :119-128): the reference breaks the WHOLE
    wave as soon as one alternation sets no new bit in any lane — on a
    directed CSR where one side exhausts, still-active lanes report NULL
    even though the other side could keep expanding. This kernel reproduces
    that: found lanes are not masked out of the frontiers (the reference
    keeps expanding them too, and they feed the global change flag), and
    the loop stops when the just-expanded side produced nothing.

    Returns (lengths int32 [L] with -1 for unreached/inactive,
    traversed float32 [L] — graph500-style credit over both seen-sets)."""
    Vp = csr.vpad
    L = src.shape[0]
    assert L % 32 == 0, "packed kernel needs lanes % 32 == 0"
    W = L // 32
    word_of_lane, bit_of_lane, searching, result = _wave_state(
        src, dst, active)
    deg = out_degrees(csr).astype(jnp.float32)        # [Vp]
    heads, last_pos, has_in = _in_segments(csr)
    seed_bits = jnp.where(searching, bit_of_lane, jnp.uint32(0))

    def mark(verts):
        f = jnp.zeros((W, Vp + 1), dtype=jnp.uint32)
        return f.at[word_of_lane, verts].add(seed_bits)

    f_src = mark(src)
    s_src = f_src
    f_dst = mark(dst)
    s_dst = f_dst

    def expand(frontier, seen):
        gathered = jnp.take(frontier, csr.in_src, axis=1)  # [W, Ep]
        ext = segment_or_sorted_rows(gathered, heads, last_pos,
                                     has_in)               # [W, Vp]
        nxt = jnp.concatenate(
            [ext, jnp.zeros((W, 1), jnp.uint32)], axis=1) & ~seen
        return nxt, seen | nxt

    def cond(state):
        it, f_src, f_dst, _, _, result, changed = state
        return (it <= max_iters) & changed \
            & ((result < 0) & searching).any()

    def body(state):
        it, f_src, f_dst, s_src, s_dst, result, _ = state

        def expand_src(fs, ss, fd, sd):
            nxt, ss2 = expand(fs, ss)
            return nxt, ss2, fd, sd, (nxt != 0).any()

        def expand_dst(fs, ss, fd, sd):
            nxt, sd2 = expand(fd, sd)
            return fs, ss, nxt, sd2, (nxt != 0).any()

        f_src, s_src, f_dst, s_dst, changed = jax.lax.cond(
            (it % 2) == 1, expand_src, expand_dst,
            f_src, s_src, f_dst, s_dst)
        met_words = jax.lax.reduce(s_src & s_dst, jnp.uint32(0),
                                   jax.lax.bitwise_or, (1,))   # [W]
        found = changed & ((met_words[word_of_lane] & bit_of_lane) != 0) \
            & (result < 0) & searching
        result = jnp.where(found, it, result)
        return it + 1, f_src, f_dst, s_src, s_dst, result, changed

    _, _, _, s_src, s_dst, result, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(1), f_src, f_dst, s_src, s_dst, result, jnp.bool_(True)))

    traversed = (
        _packed_traversed(s_src[:, :Vp], deg, L, edge_major=False) +
        _packed_traversed(s_dst[:, :Vp], deg, L, edge_major=False))
    return result, traversed


def msbfs_bidirectional_batched(csr: DeviceCSR, src, dst,
                                lanes: int = 512) -> "np.ndarray":
    """Batch arbitrary query counts through the bidirectional packed kernel
    (SQL -> device bridge for ``iterativelengthbidirectional``). Four
    [W, Vp+1] buffers stay live (two frontiers + two seen-sets) vs the
    unidirectional kernel's two; max_packed_lanes models that directly via
    vertex_buffers=4. Waves default to the reference's 512-lane width so
    the wave-global early-exit (see msbfs_lengths_bidirectional) groups
    queries the same way."""
    lanes = min(lanes, max_packed_lanes(csr, vertex_buffers=4))
    max_iters = 2 * max(csr.vcount, 1) + 1
    out, _ = _batched_waves(
        lambda s, d, a: msbfs_lengths_bidirectional(csr, s, d, a, max_iters),
        lanes, src, dst)
    return out


# ---------------------------------------------------------------------------
# multi-source Bellman-Ford (weighted shortest path lengths)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def bellman_ford(csr: DeviceCSR, src: jnp.ndarray, dst: jnp.ndarray,
                 active: jnp.ndarray, max_iters: int) -> jnp.ndarray:
    """Dense [Vp, L] distance relaxation (reference cheapest_path_length.cpp
    as a segment-min product). Returns costs (inf = unreached)."""
    costs, _ = bellman_ford_with_iters(csr, src, dst, active, max_iters)
    return costs


@jax.jit
def bellman_ford_with_iters(csr: DeviceCSR, src: jnp.ndarray,
                            dst: jnp.ndarray, active: jnp.ndarray,
                            max_iters):
    """As bellman_ford, but also returns the number of relaxation rounds
    actually executed (the loop exits at fixpoint, so benchmarks must
    account throughput with the REAL round count, not max_iters — which is
    a DYNAMIC scalar here, so fixpoint runs with a high cap reuse the same
    executable as depth-bounded ones). The dtype follows the CSR weight
    dtype: float32 normally, float64 when the SQL bridge keeps DOUBLE
    weights exact (keep_w_dtype under scoped x64 — the reference computes
    doubles in double)."""
    Vp = csr.vpad
    L = src.shape[0]
    lanes = jnp.arange(L)
    w = csr.w if csr.w is not None else jnp.ones_like(csr.in_pos,
                                                      dtype=jnp.float32)
    wdt = w.dtype
    INF = jnp.asarray(jnp.inf, dtype=wdt)
    in_w = w[csr.in_pos]
    dist = jnp.full((Vp + 1, L), INF, dtype=wdt)
    dist = dist.at[src, lanes].set(
        jnp.where(active, jnp.asarray(0.0, wdt), INF))

    def cond(state):
        it, dist, changed = state
        return changed & (it < max_iters)

    heads, last_pos, has_in = _in_segments(csr)

    def body(state):
        it, dist, _ = state
        cand = dist[csr.in_src] + in_w[:, None]       # [Ep, L]
        relaxed = segment_min_sorted(cand, heads, last_pos, has_in, INF)
        relaxed = jnp.concatenate([relaxed, jnp.full((1, L), INF, wdt)])
        new = jnp.minimum(dist, relaxed)
        changed = (new < dist).any()
        return it + 1, new, changed

    it, dist, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), dist, jnp.bool_(True)))
    return dist[dst, lanes], it


def _seg_min_scan_blocked(g: jnp.ndarray, hds: jnp.ndarray,
                          carry: jnp.ndarray, block: int, INF
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-major [Ec, L] inclusive segmented-MIN scan as a lax.scan over
    [block, L] sub-blocks (the min-combining sibling of
    _seg_or_scan_blocked; min-ing the open segment's carry into a
    non-head first row is exactly the segmented prefix)."""
    Ec, L = g.shape
    B = Ec // block
    gb = g.reshape(B, block, L)
    hb = hds.reshape(B, block)

    def comb(x, y):
        xf, xv = x
        yf, yv = y
        return xf | yf, jnp.where(yf, yv, jnp.minimum(xv, yv))

    def step(carry, inp):
        gblk, hblk = inp
        g0 = jnp.minimum(gblk[0],
                         jnp.where(hblk[0], INF, carry[0]))
        gblk = jax.lax.dynamic_update_slice(gblk, g0[None, :], (0, 0))
        _, scanned = jax.lax.associative_scan(
            comb, (hblk.astype(jnp.int32).reshape(-1, 1), gblk), axis=0)
        return scanned[-1:], scanned

    carry, scanned = jax.lax.scan(step, carry, (gb, hb))
    return scanned.reshape(Ec, L), carry


@functools.partial(jax.jit, static_argnames=("a_cap", "e_cap"),
                   donate_argnames=("dist", "ch"))
def _bf_sparse_segment(csr: DeviceCSR, out_dst, out_w, deg, it0, end,
                       occ0, tot0, dist, ch, a_cap: int, e_cap: int):
    """Sparse Bellman-Ford rounds: relax only the out-edges of vertices
    whose distance CHANGED last round (bounded by the static budgets,
    re-checked per round on device). Bit-identical per round to the
    dense relaxation: unchanged sources can only produce candidates
    already >= dist."""
    Vp = csr.vpad
    L = dist.shape[1]
    wdt = dist.dtype
    INF = jnp.asarray(jnp.inf, dtype=wdt)

    def cond(state):
        it, dist, ch, occ, tot = state
        return (it < end) & (occ > 0) & (occ <= a_cap) & (tot <= e_cap)

    def body(state):
        it, dist, ch, occ, tot = state
        av = jnp.nonzero(ch[:Vp], size=a_cap,
                         fill_value=Vp)[0].astype(jnp.int32)
        degs = jnp.where(av < Vp, csr.offsets[av + 1] - csr.offsets[av],
                         0)
        cum = jnp.cumsum(degs)
        total = cum[-1]
        j = jnp.arange(e_cap, dtype=jnp.int32)
        i_cl = jnp.minimum(
            jnp.searchsorted(cum, j, side="right").astype(jnp.int32),
            a_cap - 1)
        base = jnp.where(i_cl > 0, cum[jnp.maximum(i_cl - 1, 0)], 0)
        valid = j < total
        srcv = jnp.where(valid, av[i_cl], Vp)
        e_idx = jnp.where(valid, csr.offsets[jnp.minimum(srcv, Vp)]
                          + (j - base), 0)
        d = jnp.where(valid, out_dst[e_idx], Vp).astype(jnp.int32)
        wgt = out_w[e_idx]
        d_sorted, perm = jax.lax.sort((d, j), num_keys=1)
        hds = jnp.concatenate([jnp.ones(1, bool),
                               d_sorted[1:] != d_sorted[:-1]])
        cand = dist[jnp.minimum(srcv, Vp)] + wgt[:, None]   # [Eb, L]
        cand = jnp.where(valid[:, None], cand, INF)
        g = jnp.take(cand, perm, axis=0)
        block = _scan_block_size(e_cap)
        scanned, _ = _seg_min_scan_blocked(
            g, hds, jnp.full((1, L), INF, wdt), block, INF)
        pos = jnp.full((Vp + 1,), -1, jnp.int32).at[d_sorted].max(
            j, mode="drop")
        idx = jnp.where(pos < 0, e_cap, pos)
        scanned = jnp.concatenate(
            [scanned, jnp.full((1, L), INF, wdt)], axis=0)
        relaxed = _take_rows_chunked(scanned, idx)          # [Vp+1, L]
        new = jnp.minimum(dist, relaxed)
        ch = (new < dist).any(axis=1)
        occ = ch[:Vp].sum(dtype=jnp.int32)
        tot = jnp.where(ch[:Vp], deg, 0).sum(dtype=jnp.int32)
        return it + 1, new, ch, occ, tot

    it, dist, ch, occ, tot = jax.lax.while_loop(
        cond, body, (it0, dist, ch, occ0, tot0))
    return it, dist, ch, occ, tot


@functools.partial(jax.jit, static_argnames=("a_cap", "e_cap"),
                   donate_argnames=("dist", "ch"))
def _bf_chunked_dense_segment(csr: DeviceCSR, plan: PackedWavePlan,
                              in_w, deg, it0, end, dist, ch,
                              a_cap: int, e_cap: int):
    """Chunk-streamed dense Bellman-Ford rounds: the [Ep, L] candidate
    buffer (17 GB at RMAT-20 x 256 lanes — the dense-BF scale wall) is
    streamed in the SAME edge super-chunks as the BFS wave, reusing the
    plan's rel/slot extraction tables with (f32, min) instead of
    (u32, OR)."""
    Vp = csr.vpad
    Ep = csr.epad
    L = dist.shape[1]
    wdt = dist.dtype
    INF = jnp.asarray(jnp.inf, dtype=wdt)
    K = plan.n_chunks
    Ec = Ep // K
    heads, _, _ = _in_segments(csr)
    block = _scan_block_size(Ec)

    def sweep(dist):
        def chunk_step(k, state):
            compact, carry = state
            off = k * Ec
            idx = jax.lax.dynamic_slice(csr.in_src, (off,), (Ec,))
            hds = jax.lax.dynamic_slice(heads, (off,), (Ec,))
            wc = jax.lax.dynamic_slice(in_w, (off,), (Ec,))
            g = dist[idx] + wc[:, None]                 # [Ec, L]
            scanned, carry = _seg_min_scan_blocked(g, hds, carry, block,
                                                   INF)
            rel = jax.lax.dynamic_index_in_dim(plan.rel, k, 0,
                                               keepdims=False)
            vals = jnp.take(scanned, rel, axis=0)       # [bmax, L]
            compact = jax.lax.dynamic_update_slice(
                compact, vals, (k * plan.bmax, 0))
            return compact, carry

        compact0 = jnp.full((K * plan.bmax + 1, L), INF, wdt)
        carry0 = jnp.full((1, L), INF, wdt)
        compact, _ = jax.lax.fori_loop(0, K, chunk_step,
                                       (compact0, carry0))
        return jnp.take(compact, plan.slot, axis=0)     # [Vp + 1, L]

    def cond(state):
        it, dist, ch, occ, tot = state
        ok = (it < end) & (occ > 0)
        if a_cap:
            ok &= ~((occ <= a_cap) & (tot <= e_cap))
        return ok

    def body(state):
        it, dist, ch, occ, tot = state
        new = jnp.minimum(dist, sweep(dist))
        ch = (new < dist).any(axis=1)
        occ = ch[:Vp].sum(dtype=jnp.int32)
        tot = jnp.where(ch[:Vp], deg, 0).sum(dtype=jnp.int32)
        return it + 1, new, ch, occ, tot

    big = jnp.int32(2**31 - 1)
    it, dist, ch, occ, tot = jax.lax.while_loop(
        cond, body, (it0, dist, ch, big, big))
    return it, dist, ch, occ, tot


@functools.partial(jax.jit, static_argnames=("a_cap", "e_cap"),
                   donate_argnames=("dist", "ch"))
def _bf_dense_segment(csr: DeviceCSR, in_w, deg, it0, end, dist, ch,
                      a_cap: int, e_cap: int):
    """Dense Bellman-Ford rounds with change tracking; exits when the
    changed set fits the sparse budgets (or at fixpoint / the round
    cap)."""
    Vp = csr.vpad
    L = dist.shape[1]
    wdt = dist.dtype
    INF = jnp.asarray(jnp.inf, dtype=wdt)
    heads, last_pos, has_in = _in_segments(csr)

    def cond(state):
        it, dist, ch, occ, tot = state
        ok = (it < end) & (occ > 0)
        if a_cap:
            ok &= ~((occ <= a_cap) & (tot <= e_cap))
        return ok

    def body(state):
        it, dist, ch, occ, tot = state
        cand = dist[csr.in_src] + in_w[:, None]
        relaxed = segment_min_sorted(cand, heads, last_pos, has_in, INF)
        relaxed = jnp.concatenate([relaxed, jnp.full((1, L), INF, wdt)])
        new = jnp.minimum(dist, relaxed)
        ch = (new < dist).any(axis=1)
        occ = ch[:Vp].sum(dtype=jnp.int32)
        tot = jnp.where(ch[:Vp], deg, 0).sum(dtype=jnp.int32)
        return it + 1, new, ch, occ, tot

    big = jnp.int32(2**31 - 1)
    it, dist, ch, occ, tot = jax.lax.while_loop(
        cond, body, (it0, dist, ch, big, big))
    return it, dist, ch, occ, tot


def bellman_ford_sparse(csr: DeviceCSR, src: jnp.ndarray,
                        dst: jnp.ndarray, active: jnp.ndarray,
                        max_iters: int):
    """Host-stepped Bellman-Ford with the sparse changed-vertex rounds
    (the weighted sibling of the BFS sparse tail). Returns
    (costs [L], rounds_executed) — values bit-identical to
    bellman_ford_with_iters (per-round relaxation sets differ only by
    provably no-op candidates)."""
    import numpy as np

    Vp = csr.vpad
    L = src.shape[0]
    lanes = jnp.arange(L)
    w = csr.w if csr.w is not None else jnp.ones_like(csr.in_pos,
                                                      dtype=jnp.float32)
    wdt = w.dtype
    in_w = w[csr.in_pos]
    # out-edge view with aligned weights (3-key device sort)
    _, out_dst, out_w = jax.lax.sort(
        (csr.in_src, csr.in_dst, in_w), num_keys=1)
    deg = (csr.offsets[1:] - csr.offsets[:-1]).astype(jnp.int32)
    # budget width: a BF row is L floats (the cand/sorted/scanned bufs
    # are [e_cap, L] f32), i.e. w == L in the 12*w-bytes/entry model —
    # passing the BFS word width here once produced an 8x-over-budget
    # e_cap whose per-round sort+scan made sparse SLOWER than dense
    tiers = _sparse_tail_caps(min(csr.epad, 1 << 20), L)
    a_cap, e_cap = tiers[-1] if tiers else (0, 0)
    # the one-shot dense sweep materializes ~3 [Ep, L] buffers; stream
    # it in chunks (reusing the wave-plan extraction tables with f32/min)
    # once that would exceed ~1.5 GB — the dense-BF wall was scale ~19
    # at 256 lanes
    item = 8 if wdt == jnp.float64 else 4
    k = 1
    while csr.epad // k * L * item * 3 > (1536 << 20) and \
            csr.epad % (k * 2) == 0 and (csr.epad // (k * 2)) % 128 == 0:
        k *= 2
    plan = plan_packed_wave(csr, lanes=32, n_chunks=k) if k > 1 else None

    dist = jnp.full((Vp + 1, L), jnp.asarray(jnp.inf, wdt), dtype=wdt)
    dist = dist.at[src, lanes].set(
        jnp.where(active, jnp.asarray(0.0, wdt), jnp.asarray(jnp.inf,
                                                             wdt)))
    ch = jnp.zeros(Vp + 1, bool).at[jnp.where(active, src, Vp)].set(True)
    ch = ch.at[Vp].set(False)
    d_occ, = (ch[:Vp].sum(dtype=jnp.int32),)
    occ = int(np.asarray(d_occ))
    tot = int(np.asarray(jnp.where(ch[:Vp], deg, 0).sum(
        dtype=jnp.int32)))
    it = jnp.int32(0)
    rounds = 0
    while rounds < max_iters:
        fits = a_cap and occ <= a_cap and tot <= e_cap
        if occ == 0:
            break
        if fits:
            it, dist, ch, d_occ, d_tot = _bf_sparse_segment(
                csr, out_dst, out_w, deg, it, jnp.int32(max_iters),
                jnp.int32(occ), jnp.int32(tot), dist, ch, a_cap, e_cap)
        elif plan is not None:
            it, dist, ch, d_occ, d_tot = _bf_chunked_dense_segment(
                csr, plan, in_w, deg, it,
                jnp.int32(min(rounds + 4, max_iters)),
                dist, ch, a_cap, e_cap)
        else:
            it, dist, ch, d_occ, d_tot = _bf_dense_segment(
                csr, in_w, deg, it, jnp.int32(min(rounds + 4,
                                                  max_iters)),
                dist, ch, a_cap, e_cap)
        occ, tot = int(np.asarray(d_occ)), int(np.asarray(d_tot))
        rounds = int(np.asarray(it))
    return dist[dst, lanes], rounds


# ---------------------------------------------------------------------------
# PageRank (power iteration as segment_sum products)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def pagerank_device(csr: DeviceCSR, damping: float = 0.85,
                    tol: float = 1e-6, max_iters: int = 200) -> jnp.ndarray:
    """Returns rank over the REAL vertex range [vcount] normalized over
    vcount (device variant; the SQL-facing kernel keeps the reference's
    vsize=V+2 padding quirk in ops/algorithms.py)."""
    Vp = csr.vpad
    V = csr.vcount
    deg = out_degrees(csr).astype(jnp.float32)
    real = jnp.arange(Vp) < V
    has_out = (deg > 0) & real
    n = jnp.float32(V)
    rank = jnp.where(real, 1.0 / n, 0.0)

    def cond(state):
        it, rank, delta = state
        return (delta >= tol) & (it < max_iters)

    heads, last_pos, has_in = _in_segments(csr)

    def body(state):
        it, rank, _ = state
        contrib = jnp.where(has_out, rank / jnp.maximum(deg, 1.0), 0.0)
        edge_contrib = jnp.where(csr.in_src < Vp,
                                 contrib[jnp.minimum(csr.in_src, Vp - 1)],
                                 0.0)                          # [Ep]
        acc = segment_sum_sorted(edge_contrib, heads, last_pos, has_in)
        dangling = jnp.where(real & ~has_out, rank, 0.0).sum()
        new = jnp.where(real,
                        (1.0 - damping) / n +
                        damping * (acc + dangling / n), 0.0)
        delta = jnp.abs(new - rank).max()
        return it + 1, new, delta

    _, rank, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rank, jnp.float32(jnp.inf)))
    return rank[:V]


# ---------------------------------------------------------------------------
# shortest path: packed MS-BFS with per-lane parent tracking
# (reference shortest_path.cpp:12-41 — first-touch parent, min CSR position)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def msbfs_parents(csr: DeviceCSR, src: jnp.ndarray, dst: jnp.ndarray,
                  active: jnp.ndarray, max_iters: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BFS with parent tracking. Returns (lengths int32 [L],
    parent_pos int32 [Vp, L]) where parent_pos[v, l] is the position in the
    dst-sorted in-edge view of the edge that first discovered v in lane l
    (-1 = undiscovered). Tie-break matches the reference: the in-edge with
    the lowest source CSR position wins (shortest_path.cpp:27-30) — here the
    lowest in-view position whose (src, insertion) order mirrors it.

    Host-side reconstruction walks parent_pos backwards (SURVEY.md §7.3
    item 2: backtracking is sequential per query; ship parents to host)."""
    Vp = csr.vpad
    Ep = csr.epad
    L = src.shape[0]
    lanes = jnp.arange(L)

    trivial = active & (src == dst)
    searching = active & (src != dst)
    frontier = jnp.zeros((Vp + 1, L), dtype=jnp.bool_)
    frontier = frontier.at[src, lanes].set(searching)
    seen = frontier
    result = jnp.where(trivial, 0, -1).astype(jnp.int32)
    parent = jnp.full((Vp, L), -1, dtype=jnp.int32)

    # min in-view position per (dst, lane) among frontier-origin edges:
    # in_pos is the position in the (src, insertion)-sorted edge arrays —
    # minimizing it reproduces the reference's deterministic parent
    in_rank = csr.in_pos.astype(jnp.int32)
    BIGPOS = jnp.int32(Ep + 1)

    def cond(state):
        it, frontier, seen, result, parent = state
        return (it <= max_iters) & frontier.any()

    heads, last_pos, has_in = _in_segments(csr)

    def body(state):
        it, frontier, seen, result, parent = state
        gathered = frontier[csr.in_src]                       # [Ep, L]
        ext = segment_or_sorted(gathered.astype(jnp.int8), heads, last_pos,
                                has_in) > 0                   # [Vp, L]
        nxt = jnp.concatenate(
            [ext, jnp.zeros((1, L), jnp.bool_)]) & ~seen
        cand = jnp.where(gathered, in_rank[:, None], BIGPOS)  # [Ep, L]
        minpos = segment_min_sorted(cand, heads, last_pos, has_in,
                                    BIGPOS)                   # [Vp, L]
        newly = nxt[:Vp] & (parent < 0)
        parent = jnp.where(newly, minpos, parent)
        seen = seen | nxt
        found = nxt[dst, lanes] & (result < 0) & searching
        result = jnp.where(found, it, result)
        nxt = nxt & (result < 0)[None, :]
        return it + 1, nxt, seen, result, parent

    _, _, seen, result, parent = jax.lax.while_loop(
        cond, body, (jnp.int32(1), frontier, seen, result, parent))
    return result, parent


def shortest_paths_device(csr: DeviceCSR, src, dst, lanes: int = 64):
    """Batched device BFS + host path reconstruction. Returns
    (paths list of [v0, e0, v1, ...] or None, validity bool array)."""
    import numpy as np
    n = len(src)
    paths = [None] * n
    validity = np.zeros(n, dtype=bool)
    max_iters = max(csr.vcount, 1)
    eid = np.asarray(csr.edge_ids)
    edge_src_np = np.asarray(csr.edge_src)
    for start in range(0, n, lanes):
        m = min(lanes, n - start)
        s = np.zeros(lanes, dtype=np.int32)
        d = np.zeros(lanes, dtype=np.int32)
        a = np.zeros(lanes, dtype=bool)
        s[:m] = src[start:start + m]
        d[:m] = dst[start:start + m]
        a[:m] = True
        res, parent = msbfs_parents(
            csr, jnp.asarray(s), jnp.asarray(d), jnp.asarray(a), max_iters)
        res = np.asarray(res)
        parent = np.asarray(parent)                 # [Vp, L] in-view pos
        for l in range(m):
            q = start + l
            if res[l] < 0:
                continue
            if s[l] == d[l]:
                paths[q] = [int(s[l])]
                validity[q] = True
                continue
            # backtrack dst -> src through the in-edge view
            out = [int(d[l])]
            cur = int(d[l])
            ok = True
            for _ in range(int(res[l])):
                # parent stores the discovering edge's CSR position
                p = parent[cur, l]
                if p < 0:
                    ok = False
                    break
                out.append(int(eid[p]))
                cur = int(edge_src_np[p])
                out.append(cur)
            if ok and cur == int(s[l]):
                out.reverse()
                paths[q] = out
                validity[q] = True
    return paths, validity


# ---------------------------------------------------------------------------
# local clustering coefficient (neighborhood bitmaps as dense masks;
# reference local_clustering_coefficient.cpp:11-72)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block",))
def lcc_device(csr: DeviceCSR, block: int = 64) -> jnp.ndarray:
    """lcc[v] = directed neighbor-neighbor links / (d*(d-1)) over the given
    (deduplicated, symmetrized) CSR. Blocked dense formulation: process
    vertices in blocks of ``block``; each block materializes its neighbor
    bitmap [block, Vp] and counts wedge closures with one masked matmul —
    MXU work instead of per-vertex loops. Counts are small integers, so
    the float32 arithmetic matches the reference's float32 output exactly.
    Default block=64 divides every pad_bucket size (>=128: 2^k or 3*2^k)."""
    Vp = csr.vpad
    assert Vp % block == 0, (Vp, block)
    deg = out_degrees(csr).astype(jnp.float32)                # [Vp]
    # neighbor incidence: nbr[b, v] = 1 if v adjacent to vertex b0+b
    n_blocks = Vp // block

    def per_block(b0):
        rows = b0 + jnp.arange(block)                         # [B]
        # bitmap[B, Vp]: scatter each in-block edge once (out-of-block
        # edges land on a dummy row)
        local_row = csr.edge_src - b0
        safe_row = jnp.where((local_row >= 0) & (local_row < block),
                             local_row, block)
        bitmap = jnp.zeros((block + 1, Vp + 1), jnp.float32)
        bitmap = bitmap.at[safe_row, csr.e].max(1.0)
        bitmap = bitmap[:block]     # keep the pad column: pad-edge
        # gathers read it and it is never set for real rows
        # closures[b] = sum over neighbors x of |N(x) ∩ N(b)|: gather each
        # neighbor's adjacency via the same edge list — count pairs
        # (edge u->x of row b, edge x->w) with w in N(b):
        # links = sum_e2 bitmap[b, e2.dst] * (e2.src in N(b-row))
        src_in_nbr = jax.vmap(lambda row: row[csr.edge_src])(bitmap)
        dst_in_nbr = jax.vmap(lambda row: row[csr.e])(bitmap)  # [B, Ep]
        links = (src_in_nbr * dst_in_nbr).sum(axis=1)          # [B]
        d = deg[rows]
        denom = d * (d - 1.0)
        return jnp.where(denom > 0, links / denom, 0.0)

    out = jax.lax.map(per_block, jnp.arange(n_blocks) * block)
    return out.reshape(-1)[:csr.vcount].astype(jnp.float32)


def triangle_closures_device(csr: DeviceCSR, block: int = 64) -> int:
    """Total multigraph wedge closures trace(M^3) over a symmetrized CSR
    (M[x,y] = number of parallel edge rows between x and y) — the binding
    count of an undirected 3-cycle MATCH (6x the triangle count on a
    simple graph). Same blocked masked-matmul as lcc_device, but the
    block bitmap ACCUMULATES multiplicities, so duplicate edge rows are
    counted the way the join plan counts them. Per-row sums are small
    integers, exact in float32, accumulated in float64 on host."""
    import numpy as np
    Vp = csr.vpad
    assert Vp % block == 0, (Vp, block)
    n_blocks = Vp // block

    def per_block(b0):
        local_row = csr.edge_src - b0
        safe_row = jnp.where((local_row >= 0) & (local_row < block),
                             local_row, block)
        bitmap = jnp.zeros((block + 1, Vp + 1), jnp.float32)
        bitmap = bitmap.at[safe_row, csr.e].add(1.0)
        bitmap = bitmap[:block]
        src_in_nbr = jax.vmap(lambda row: row[csr.edge_src])(bitmap)
        dst_in_nbr = jax.vmap(lambda row: row[csr.e])(bitmap)
        return (src_in_nbr * dst_in_nbr).sum(axis=1)     # [B]

    out = jax.lax.map(per_block, jnp.arange(n_blocks) * block)
    return int(np.asarray(out, dtype=np.float64).sum())


# ---------------------------------------------------------------------------
# WCC via pointer-jumping label propagation (TPU-friendly union-find
# substitute; same equivalence classes, canonical label = min vertex id)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iters",))
def wcc_label_propagation(csr: DeviceCSR, max_iters: int = 64) -> jnp.ndarray:
    Vp = csr.vpad
    V = csr.vcount
    labels = jnp.arange(Vp, dtype=jnp.int32)

    def cond(state):
        it, labels, changed = state
        return changed & (it < max_iters)

    BIG = jnp.int32(Vp)
    in_heads, in_last, in_has = _in_segments(csr)
    out_heads, out_last, out_has = _out_segments(csr)

    def safe_label(labels, idx):
        return jnp.where(idx < Vp, labels[jnp.minimum(idx, Vp - 1)], BIG)

    def body(state):
        it, labels, _ = state
        # min source label into each destination (pull over in-view) and
        # min destination label back into each source (forward view) —
        # both edge views are sorted by their segment key
        fwd = segment_min_sorted(safe_label(labels, csr.in_src),
                                 in_heads, in_last, in_has, BIG)
        bwd = segment_min_sorted(safe_label(labels, csr.e),
                                 out_heads, out_last, out_has, BIG)
        new = jnp.minimum(labels, jnp.minimum(fwd, bwd))
        # pointer jumping: label <- label of label (doubles convergence)
        new = jnp.minimum(new, new[new])
        changed = (new < labels).any()
        return it + 1, new, changed

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, jnp.bool_(True)))
    return labels[:V]


# ---------------------------------------------------------------------------
# reference-exact PageRank: float64 with the reference's padded-array quirk
# (pagerank.cpp:31-78 iterates over vsize = V+2 entries; the two phantom
# vertices are dangling and leak into the denominator and the dangling mass)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("vsize",))
def _pagerank_reference_jit(csr: DeviceCSR, vsize: int, damping, threshold):
    Vp = csr.vpad
    V = csr.vcount
    n_phantom = vsize - V
    deg = out_degrees(csr).astype(jnp.float64)                # [Vp]
    real = jnp.arange(Vp) < V
    has_out = (deg > 0) & real
    rank = jnp.where(real, 1.0 / vsize, 0.0)
    phantom = jnp.float64(1.0 / vsize)
    heads, last_pos, has_in = _in_segments(csr)
    safe_src = jnp.minimum(csr.in_src, Vp - 1)
    real_edge = (jnp.arange(csr.epad) < csr.ecount) & (csr.in_src < Vp)

    def cond(state):
        _, _, delta = state
        return delta >= threshold

    def body(state):
        rank, phantom, _ = state
        contrib = jnp.where(real_edge & has_out[safe_src],
                            rank[safe_src] / jnp.maximum(deg[safe_src], 1.0),
                            0.0)
        acc = segment_sum_sorted(contrib, heads, last_pos, has_in)  # [Vp]
        dangling = jnp.where(real & ~has_out, rank, 0.0).sum() \
            + n_phantom * phantom
        corr = dangling / vsize
        new = jnp.where(real,
                        (1.0 - damping) / vsize + damping * (acc + corr),
                        0.0)
        new_phantom = (1.0 - damping) / vsize + damping * corr
        delta = jnp.maximum(jnp.abs(new - rank).max(),
                            jnp.abs(new_phantom - phantom))
        return new, new_phantom, delta

    rank, phantom, _ = jax.lax.while_loop(
        cond, body, (rank, phantom, jnp.float64(jnp.inf)))
    return rank, phantom


def pagerank_reference(csr: DeviceCSR, vsize: int, damping: float = 0.85,
                       threshold: float = 1e-6):
    """SQL-facing device PageRank, bit-compatible with the reference's
    float64 power iteration including the vsize = V+2 denominator quirk
    (pagerank.cpp:31-78; host mirror ops/algorithms.py). Runs under a
    scoped x64 context so the rest of the engine stays in 32-bit dtypes.
    Returns a float64 numpy array over vsize entries (the phantom vertices
    share one rank value, placed in the tail)."""
    import numpy as np
    with jax.enable_x64(True):
        rank, phantom = _pagerank_reference_jit(
            csr, vsize, jnp.float64(damping), jnp.float64(threshold))
        out = np.empty(vsize, dtype=np.float64)
        out[:csr.vcount] = np.asarray(rank)[:csr.vcount]
        out[csr.vcount:] = float(phantom)
    return out


# ---------------------------------------------------------------------------
# WCC with reference-exact component ids: device Boruvka finds the earliest
# spanning forest (= the reference union-find's successful-link set), host
# replays the <=V-1 forest links in CSR order to reproduce the exact roots
# (weakly_connected_component.cpp:14-34,66-91 — ids depend on link order)
# ---------------------------------------------------------------------------

@jax.jit
def wcc_msf_device(csr: DeviceCSR) -> jnp.ndarray:
    """Boruvka minimum-spanning-forest over the forward edge view with
    edge weight = CSR position (all distinct). With those weights the MSF
    equals the set of edges on which the reference's sequential union-find
    performs a successful Link() when scanning positions ascending (Kruskal
    = Boruvka on distinct weights), treating each directed copy as a
    parallel edge — so this works for directed, multi-, and self-loop CSRs
    exactly like the reference's scan.

    Scatter-free: per-round per-component minima via lax.sort +
    searchsorted; hooking + pointer-jumping label contraction. Returns a
    bool [Ep] mask of chosen positions (ascending replay of those links
    reproduces the reference forest bit-for-bit)."""
    Vp = csr.vpad
    Ep = csr.epad
    esrc = csr.edge_src
    edst = csr.e
    pos = jnp.arange(Ep, dtype=jnp.int32)
    classes = jnp.arange(Vp, dtype=jnp.int32)
    real = (pos < csr.ecount) & (esrc < Vp) & (edst < Vp)
    BIGK = jnp.int32(Vp)          # label sentinel (real labels < Vp)
    BIGP = jnp.int32(Ep + 1)      # position sentinel
    safe_u = jnp.minimum(esrc, Vp - 1)
    safe_v = jnp.minimum(edst, Vp - 1)

    def cond(state):
        it, _, _, changed = state
        return changed & (it < 64)          # rounds <= log2(V) + slack

    def body(state):
        it, labels, msf, _ = state
        lu = jnp.where(real, labels[safe_u], BIGK)
        lv = jnp.where(real, labels[safe_v], BIGK)
        cross = real & (lu != lv)
        # per-class min position over ALL incident copies (either side):
        # sort (class, position) pairs, then the first entry of each run is
        # the class minimum; dense lookup via binary search (no scatter)
        keys = jnp.concatenate([jnp.where(cross, lu, BIGK),
                                jnp.where(cross, lv, BIGK)])
        vals = jnp.concatenate([pos, pos])
        sk, sv = jax.lax.sort((keys, vals), num_keys=2)
        first = jnp.searchsorted(sk, classes).astype(jnp.int32)
        safe_first = jnp.minimum(first, 2 * Ep - 1)
        has_choice = sk[safe_first] == classes
        choice = jnp.where(has_choice, sv[safe_first], BIGP)    # [Vp]
        # an edge copy is a forest link iff it IS some class's minimum
        chosen = cross & ((choice[jnp.minimum(lu, Vp - 1)] == pos) |
                          (choice[jnp.minimum(lv, Vp - 1)] == pos))
        msf = msf | chosen
        # hook each choosing class onto the other endpoint's class
        q = jnp.minimum(choice, Ep - 1)
        other = jnp.where(has_choice,
                          jnp.where(real[q], lu[q] + lv[q] - classes,
                                    classes),
                          classes)
        parent = other
        # Boruvka hooking cycles are only 2-cycles (distinct weights);
        # keep the smaller label as the root
        pp = parent[jnp.minimum(parent, Vp - 1)]
        parent = jnp.where((pp == classes) & (classes < parent),
                           classes, parent)

        def jcond(s):
            p, ch = s
            return ch

        def jbody(s):
            p, _ = s
            p2 = p[p]
            return p2, (p2 != p).any()

        parent, _ = jax.lax.while_loop(jcond, jbody,
                                       (parent, jnp.bool_(True)))
        labels = parent[labels]
        return it + 1, labels, msf, cross.any()

    _, _, msf, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), classes,
                     jnp.zeros(Ep, dtype=jnp.bool_), jnp.bool_(True)))
    return msf


# ---------------------------------------------------------------------------
# batched Bellman-Ford (SQL -> device bridge for cheapest_path_length)
# ---------------------------------------------------------------------------

def bellman_ford_batched(csr: DeviceCSR, src, dst, lanes: int = 256):
    """Batch arbitrary query counts through the dense-relaxation kernel.
    Returns float32 costs (inf = unreached). Lane width follows the
    reference's Bellman-Ford ladder cap of 256
    (cheapest_path_length.cpp:101-135); the [Vp, L] float32 distance matrix
    plus the [Ep, L] relaxation candidates set the per-wave footprint."""
    import numpy as np
    n = len(src)
    wdt = np.dtype(csr.w.dtype) if csr.w is not None else np.float32
    out = np.full(n, np.inf, dtype=wdt)
    max_iters = max(csr.vcount + 1, 1)
    for start in range(0, n, lanes):
        m = min(lanes, n - start)
        s = np.zeros(lanes, dtype=np.int32)
        d = np.zeros(lanes, dtype=np.int32)
        a = np.zeros(lanes, dtype=bool)
        s[:m] = src[start:start + m]
        d[:m] = dst[start:start + m]
        a[:m] = True
        costs = bellman_ford(csr, jnp.asarray(s), jnp.asarray(d),
                             jnp.asarray(a), max_iters)
        out[start:start + m] = np.asarray(costs)[:m]
    return out
