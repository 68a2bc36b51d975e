"""Pallas TPU kernel: BFS frontier expansion at HBM/VMEM speed.

Why: the XLA formulation (gather rows + segment_max) runs at ~45 GB/s with a
slow scatter-based segmented reduce (~50ms per iteration at scale 18). This
kernel keeps the *bit-packed* frontier resident in VMEM ([W, Vp] uint32 —
32 lanes per word, the TPU mirror of the reference's bitset<512> lanes,
iterativelength.cpp:12-32) and rebuilds the expansion as:

  1. lane-axis gather  g[w, j] = frontier[w, src[j]]   (Mosaic dynamic gather
     along the minor axis; indices must have the table's shape, so edge tiles
     are exactly Vp slots wide)
  2. segmented suffix-OR over the destination-sorted edge slots via
     log2(max_run) masked roll-OR steps (VPU register work, no scatter)
  3. the per-destination result is read back at each run's first slot with a
     second lane-axis gather (outside, cheap XLA gather)

Per iteration the kernel touches ~E*4B of HBM (edge indices) instead of
E*L bytes — a ~L/4-fold traffic cut over the XLA path.

Host-side prep pads the edge stream so no destination run crosses a tile
boundary (hub runs stay intact; hubs wider than a tile fall back to the XLA
kernel).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@dataclass
class PackedCSR:
    """Tiled, destination-sorted edge layout for the pallas expansion."""

    src_tiles: np.ndarray      # int32 [n_tiles, T] source per slot (pad->zcol)
    dst_tiles: np.ndarray      # int32 [n_tiles, T] dest per slot (pad -> -1)
    start_pos: np.ndarray      # int32 [Vw] global slot of each dst's first edge
    has_in: np.ndarray         # bool  [Vw] whether dst has any in-edge
    vcount: int
    ecount: int
    Vw: int                    # padded vertex axis (multiple of 128); the
                               # last column is the always-zero pad column
    T: int                     # tile width == Vw (gather shape constraint)
    max_run_pow: int           # ceil(log2(max in-degree))
    out_deg: np.ndarray        # float32 [Vw] out-degrees (TEPS accounting)

    @property
    def n_tiles(self) -> int:
        return self.src_tiles.shape[0]


def pack_csr(vcount: int, src: np.ndarray, dst: np.ndarray
             ) -> Optional[PackedCSR]:
    """Destination-sorted, tile-aligned edge layout. Returns None when a
    single destination's run exceeds one tile (caller falls back to XLA)."""
    e = len(src)
    Vw = _round_up(vcount + 1, 128)          # +1 reserves the zero column
    zcol = Vw - 1
    T = Vw
    order = np.argsort(dst, kind="stable")
    s = src[order].astype(np.int64)
    d = dst[order].astype(np.int64)
    counts = np.bincount(d, minlength=vcount)
    max_run = int(counts.max()) if e else 1
    if max_run > T:
        return None
    # place runs greedily without crossing tile boundaries
    run_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    slot_of_run = np.zeros(vcount, dtype=np.int64)
    tiles_src = []
    tiles_dst = []
    cur_src = np.full(T, zcol, dtype=np.int32)
    cur_dst = np.full(T, -1, dtype=np.int32)
    fill = 0
    n_tile = 0
    for v in np.nonzero(counts)[0]:
        run = counts[v]
        if fill + run > T:
            tiles_src.append(cur_src)
            tiles_dst.append(cur_dst)
            cur_src = np.full(T, zcol, dtype=np.int32)
            cur_dst = np.full(T, -1, dtype=np.int32)
            n_tile += 1
            fill = 0
        a = run_starts[v]
        cur_src[fill:fill + run] = s[a:a + run]
        cur_dst[fill:fill + run] = v
        slot_of_run[v] = n_tile * T + fill
        fill += run
    tiles_src.append(cur_src)
    tiles_dst.append(cur_dst)

    start_pos = np.zeros(Vw, dtype=np.int32)
    has_in = np.zeros(Vw, dtype=bool)
    nz = np.nonzero(counts)[0]
    start_pos[nz] = slot_of_run[nz]
    has_in[nz] = True
    out_deg = np.zeros(Vw, dtype=np.float32)
    np.add.at(out_deg, src, 1.0)
    out_deg[zcol] = 0.0
    return PackedCSR(
        src_tiles=np.stack(tiles_src), dst_tiles=np.stack(tiles_dst),
        start_pos=start_pos, has_in=has_in, vcount=vcount, ecount=e,
        Vw=Vw, T=T, max_run_pow=max(1, int(np.ceil(np.log2(max(max_run, 2))))),
        out_deg=out_deg)


# ---------------------------------------------------------------------------
# the expansion kernel
# ---------------------------------------------------------------------------

def _expand_kernel(src_ref, dst_ref, frontier_ref, out_ref, *, W: int,
                   T: int, shifts: Tuple[int, ...]):
    """One edge tile: gather packed frontier words at edge sources, then a
    segmented suffix-OR along the slot axis (destination runs are contiguous
    and never cross the tile)."""
    idx = jnp.broadcast_to(src_ref[0], (W, T))
    g = jnp.take_along_axis(frontier_ref[:], idx, axis=1)      # [W, T]
    d = jnp.broadcast_to(dst_ref[0], (W, T))
    col = jax.lax.broadcasted_iota(jnp.int32, (W, T), 1)
    for s in shifts:
        # left-rotate by s == right-rotate by T - s (roll requires shift >= 0)
        shifted_g = pltpu.roll(g, T - s, axis=1)
        shifted_d = pltpu.roll(d, T - s, axis=1)
        ok = (shifted_d == d) & (col < T - s)
        g = g | jnp.where(ok, shifted_g, jnp.uint32(0))
    out_ref[0] = g


@functools.partial(jax.jit, static_argnames=("W", "T", "n_tiles", "shifts"))
def _expand(frontier_packed, src_tiles, dst_tiles, W, T, n_tiles, shifts):
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_expand_kernel, W=W, T=T, shifts=shifts)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, W, T), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(src_tiles.reshape(n_tiles, 1, T), dst_tiles.reshape(n_tiles, 1, T),
      frontier_packed)


@functools.partial(jax.jit, static_argnames=("meta",))
def _bfs_packed(frontier, seen, result, src_tiles, dst_tiles, start_tile,
                start_col, has_in, dst_lane, lane_word, lane_bit, meta):
    W, T, n_tiles, shifts, max_iters = meta
    # flat index of each destination's run-start slot, per lane word
    flat_start = ((start_tile.astype(jnp.int32) * W +
                   jnp.arange(W, dtype=jnp.int32)[:, None]) * T +
                  start_col.astype(jnp.int32)[None, :])      # [W, Vw]

    def cond(state):
        it, frontier, seen, result = state
        return (it <= max_iters) & (frontier != 0).any()

    def body(state):
        it, frontier, seen, result = state
        suffix = _expand(frontier, src_tiles, dst_tiles, W, T, n_tiles,
                         shifts)                      # [n_tiles*W, T]
        suffix_flat = suffix.reshape(-1)
        nxt = suffix_flat[flat_start]                 # [W, Vw]
        nxt = nxt & has_in[None, :]
        nxt = nxt & ~seen
        seen = seen | nxt
        # which lanes found their destination this wave?
        dst_words = nxt[lane_word, dst_lane]          # [L]
        found = ((dst_words >> lane_bit) & 1).astype(jnp.bool_) & (result < 0)
        result = jnp.where(found, it, result)
        # stop expanding finished lanes: pack (result < 0) into one uint32
        # mask word per 32 lanes (reshape + shift, no scatter)
        active_bits = jnp.where(result < 0, jnp.uint32(1),
                                jnp.uint32(0)).reshape(W, 32)
        active_mask = (active_bits <<
                       jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                           axis=1, dtype=jnp.uint32)            # [W]
        frontier = nxt & active_mask[:, None]
        return it + 1, frontier, seen, result

    _, _, seen, result = jax.lax.while_loop(
        cond, body, (jnp.int32(1), frontier, seen, result))
    return result, seen


@jax.jit
def _traversed_per_lane(seen: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """graph500 TEPS accounting on device: for each lane, the sum of
    out-degrees over its visited vertices. seen [W, Vw] uint32, deg [Vw]."""
    per_bit = []
    for b in range(32):
        bits = ((seen >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.float32)
        per_bit.append((bits * deg[None, :]).sum(axis=1))       # [W]
    return jnp.stack(per_bit, axis=1).reshape(-1)               # [W*32]


class PallasBFS:
    """Multi-source BFS driver over the packed layout. Lane count is
    W*32 <= 512."""

    def __init__(self, packed: PackedCSR, lanes: int = 128):
        assert lanes % 32 == 0
        import jax
        if packed.T > 128 and jax.devices()[0].platform != "cpu":
            # Mosaic's dynamic_gather sources a single vreg along the
            # gather dimension ("Multiple source vregs along gather
            # dimension"), so the in-kernel frontier gather only lowers for
            # tiles <= 128 lanes — i.e. toy graphs. This kernel remains as
            # the in-kernel-gather experiment; the production path is the
            # chunked packed kernel (ops/msbfs_jax.msbfs_lengths_packed*),
            # which is faster at every scale measured anyway.
            raise NotImplementedError(
                "PallasBFS's in-kernel gather lowers only for tile widths "
                "<= 128 (Mosaic single-vreg gather); use "
                "msbfs_lengths_packed (the default bench kernel) instead")
        self.packed = packed
        self.lanes = lanes
        self.W = lanes // 32
        self.src_tiles = jnp.asarray(packed.src_tiles)
        self.dst_tiles = jnp.asarray(packed.dst_tiles)
        self.start_tile = jnp.asarray(
            (packed.start_pos // packed.T).astype(np.int32))
        self.start_col = jnp.asarray(
            (packed.start_pos % packed.T).astype(np.int32))
        self.has_in = jnp.asarray(
            packed.has_in.astype(np.uint32) * np.uint32(0xFFFFFFFF))
        self.out_deg = jnp.asarray(packed.out_deg)
        self.shifts = tuple(1 << k for k in range(packed.max_run_pow))

    def run(self, src: np.ndarray, dst: np.ndarray,
            max_iters: Optional[int] = None):
        """Returns (lengths int32 [L] (-1 unreached), traversed float)."""
        p = self.packed
        L = self.lanes
        W = self.W
        n = len(src)
        assert n <= L
        src_p = np.zeros(L, dtype=np.int64)
        dst_p = np.zeros(L, dtype=np.int64)
        src_p[:n] = src
        dst_p[:n] = dst
        active = np.zeros(L, dtype=bool)
        active[:n] = True
        trivial = active & (src_p == dst_p)
        searching = active & ~trivial

        frontier = np.zeros((W, p.Vw), dtype=np.uint32)
        lw = (np.arange(L) // 32).astype(np.int64)
        lb = (np.arange(L) % 32).astype(np.int64)
        sel = np.nonzero(searching)[0]
        np.bitwise_or.at(frontier, (lw[sel], src_p[sel]),
                         (np.uint32(1) << lb[sel]).astype(np.uint32))
        result = np.where(trivial, 0, -1).astype(np.int32)
        result[~active] = -1

        meta = (W, p.T, p.n_tiles, self.shifts,
                int(max_iters or p.vcount + 1))
        res, seen = _bfs_packed(
            jnp.asarray(frontier), jnp.asarray(frontier),
            jnp.asarray(result),
            self.src_tiles, self.dst_tiles, self.start_tile, self.start_col,
            self.has_in, jnp.asarray(dst_p.astype(np.int32)),
            jnp.asarray(lw.astype(np.int32)), jnp.asarray(lb.astype(np.uint32)),
            meta)
        res_np = np.asarray(res)[:n]
        # TEPS: per lane, sum of out-degrees of visited vertices — computed
        # on device (bit-plane unpack + weighted row sums); only the [L]
        # result crosses the tunnel
        trav = np.asarray(_traversed_per_lane(seen, self.out_deg))
        lanes_idx = np.arange(W)[:, None] * 32 + np.arange(32)[None, :]
        traversed = float(trav[(lanes_idx < n).reshape(-1)].sum())
        return res_np, traversed
