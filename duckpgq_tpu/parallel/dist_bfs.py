"""Distributed multi-source BFS over a vertex-partitioned CSR.

Design (SURVEY.md §7.1 item 7 / BASELINE north-star configs 4-5):
- vertices are range-partitioned across the mesh axis; each shard owns the
  in-edges whose destination it owns (pull model), padded to equal length;
- per iteration each shard expands its local destinations from the
  replicated global frontier (gather + sorted segment-max, the same masked
  SpMM as the single-chip kernel), then the new frontier is exchanged with
  one ``all_gather`` over ICI — the frontier OR-exchange;
- the search loop is a ``lax.while_loop`` *inside* ``shard_map`` so the
  exchange happens on-device every iteration with no host round trips.

Skew note: contiguous range partitioning plus destination-side ownership
spreads hub in-edges across their owners; hub *sources* cost nothing extra
because the frontier is replicated (a hub's bit is broadcast once in the
all_gather, not once per edge).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.csr_jax import round_up


def _mesh_axis(mesh: Mesh):
    """The partition axis spec: a single name for 1-D meshes, the tuple of
    names for hierarchical (host x chip) meshes — vertex shards span the
    flattened axes, host-major (axis_index over the tuple)."""
    names = mesh.axis_names
    return names if len(names) > 1 else names[0]


def _gather_tiled(x, axis, dim):
    """all_gather that understands hierarchical (tuple) axes: the innermost
    axis (ICI) gathers first, so the outer (DCN) hop carries one combined
    block per host instead of per chip."""
    if isinstance(axis, tuple):
        for a in reversed(axis):
            x = jax.lax.all_gather(x, a, axis=dim, tiled=True)
        return x
    return jax.lax.all_gather(x, axis, axis=dim, tiled=True)


@dataclass
class ShardedCSR:
    """Host-side container of per-shard edge partitions.

    in_src: int32 [nx, Es]  global source vertex per in-edge
    in_dst_local: int32 [nx, Es]  local (within-shard) destination
    v_shard: vertices per shard (padded global V = nx * v_shard)
    """

    in_src: np.ndarray
    in_dst_local: np.ndarray
    n_shards: int
    v_shard: int
    vcount: int
    ecount: int
    # optional degree-balancing relabeling (hub handling): perm maps
    # original vertex id -> partition-space id; queries must be mapped in
    perm: Optional[np.ndarray] = None
    # original CSR position of each sharded edge slot ([nx, Es] int64,
    # -1 pad) — lets callers align per-edge payloads (weights, the WCC
    # forest mask) with the original edge order
    in_pos: Optional[np.ndarray] = None

    @property
    def v_padded(self) -> int:
        return self.n_shards * self.v_shard

    def map_queries(self, q: np.ndarray) -> np.ndarray:
        return q if self.perm is None else self.perm[q]

    def unmap_values(self, vals: np.ndarray) -> np.ndarray:
        """Per-vertex results in PARTITION space [v_padded] -> original
        vertex order [vcount] (identity slice when unbalanced)."""
        vals = np.asarray(vals)
        return vals[:self.vcount] if self.perm is None \
            else vals[self.perm[:self.vcount]]


def partition_csr(vcount: int, src: np.ndarray, dst: np.ndarray,
                  n_shards: int,
                  w: Optional[np.ndarray] = None,
                  balance: bool = False) -> ShardedCSR:
    """Range-partition edges by destination owner; equal-pad shard lists.
    Optional per-edge weights are carried through in the same layout
    (``sharded.w_shard``).

    ``balance=True`` applies hub handling for power-law skew: vertices are
    relabeled by descending in-degree dealt round-robin across shard
    ranges, so each shard owns ~E/n in-edges instead of whatever its
    contiguous range happens to contain (hub in-edges no longer pile onto
    one shard and the equal-pad waste collapses). Queries must be mapped
    through ``sharded.map_queries`` (lengths are label-invariant)."""
    v_shard = round_up(max((vcount + n_shards - 1) // n_shards, 8), 8)
    perm = None
    if balance:
        indeg = np.bincount(dst, minlength=vcount)
        order = np.argsort(-indeg, kind="stable")      # hubs first
        ranks = np.empty(vcount, dtype=np.int64)
        ranks[order] = np.arange(vcount)
        # deal by rank: shard = rank % n, slot = rank // n — every shard
        # gets one vertex from each in-degree stratum
        perm = (ranks % n_shards) * v_shard + ranks // n_shards
        src = perm[src]
        dst = perm[dst]
    owner = dst // v_shard
    pos_all = np.arange(len(src), dtype=np.int64)
    per_shard = []
    max_e = 1
    for s in range(n_shards):
        mask = owner == s
        es = src[mask].astype(np.int32)
        ed = (dst[mask] - s * v_shard).astype(np.int32)
        order = np.argsort(ed, kind="stable")
        ws = w[mask][order].astype(np.float32) if w is not None else None
        per_shard.append((es[order], ed[order], ws, pos_all[mask][order]))
        max_e = max(max_e, len(es))
    es_pad = round_up(max_e, 8)
    in_src = np.full((n_shards, es_pad), n_shards * v_shard,
                     dtype=np.int32)   # pad: out-of-range source
    in_dst_local = np.full((n_shards, es_pad), v_shard - 1, dtype=np.int32)
    pad_valid = np.zeros((n_shards, es_pad), dtype=bool)
    in_pos = np.full((n_shards, es_pad), -1, dtype=np.int64)
    w_shard = (np.zeros((n_shards, es_pad), dtype=np.float32)
               if w is not None else None)
    for s, (es, ed, ws, ps) in enumerate(per_shard):
        in_src[s, :len(es)] = es
        in_dst_local[s, :len(es)] = ed
        pad_valid[s, :len(es)] = True
        in_pos[s, :len(es)] = ps
        if ws is not None:
            w_shard[s, :len(es)] = ws
    # encode padding by pointing the source at the global pad row (see below)
    sharded = ShardedCSR(in_src=in_src, in_dst_local=in_dst_local,
                         n_shards=n_shards, v_shard=v_shard,
                         vcount=vcount, ecount=len(src), perm=perm,
                         in_pos=in_pos)
    sharded.edge_valid = pad_valid
    sharded.w_shard = w_shard
    return sharded


def make_dist_bfs_packed(mesh: Mesh, sharded: ShardedCSR, lanes: int,
                         max_iters: int, n_chunks: int = 1):
    """Bit-packed distributed BFS: the replicated frontier is uint32
    [W, Vtot] (W = lanes/32), cutting the per-iteration all_gather exchange
    and frontier memory 8x vs the bool variant — the enabler for RMAT-26
    scale graphs (BASELINE config 5) where a bool frontier would not fit.

    The layout is lane-major like the single-chip kernel (vertices along
    the 128-wide vreg lane axis; ops/msbfs_jax.py): per-destination OR is a
    segmented scan along lanes over the dst-sorted shard edges — the Pallas
    single-pass kernel when DUCKPGQ_SCAN_IMPL=pallas (real TPU meshes), the
    XLA associative scan otherwise (CPU test meshes). Returns
    fn(src[L], dst[L], active[L]) -> (lengths[L] int32, traversed[L]
    float32)."""
    import os
    use_pallas = os.environ.get("DUCKPGQ_SCAN_IMPL", "xla") == "pallas"
    nx = sharded.n_shards
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    axis = _mesh_axis(mesh)
    assert lanes % 32 == 0
    W = lanes // 32

    # n_chunks > 1 streams each shard's expansion in edge super-chunks so
    # only [W, Es/K] stays live per device (the single-chip chunked-wave
    # design of ops/msbfs_jax applied per shard — the enabler for
    # RMAT-26-class shards whose full [W, Es] working set exceeds HBM).
    # Re-pad the shard edge lists so chunks split evenly.
    src_np, dst_np, val_np = (sharded.in_src, sharded.in_dst_local,
                              sharded.edge_valid)
    if n_chunks > 1:
        es_pad = round_up(src_np.shape[1], n_chunks * 128)
        if es_pad != src_np.shape[1]:
            def repad(a, fill):
                out = np.full((nx, es_pad), fill, dtype=a.dtype)
                out[:, :a.shape[1]] = a
                return out
            src_np = repad(src_np, np.int32(nx * Vs))
            dst_np = repad(dst_np, np.int32(Vs - 1))
            val_np = repad(val_np, False)

    in_src = jax.device_put(
        jnp.asarray(src_np), NamedSharding(mesh, P(axis, None)))
    in_dst = jax.device_put(
        jnp.asarray(dst_np), NamedSharding(mesh, P(axis, None)))
    edge_valid = jax.device_put(
        jnp.asarray(val_np), NamedSharding(mesh, P(axis, None)))

    deg = np.zeros(Vtot + 1, dtype=np.float32)
    np.add.at(deg, sharded.in_src.reshape(-1)[
        sharded.edge_valid.reshape(-1)], 1.0)
    deg_global = jnp.asarray(deg[:Vtot])

    Es = src_np.shape[1]
    assert Es % n_chunks == 0, (Es, n_chunks)
    Ec = Es // n_chunks
    scan_chunk = 1
    while scan_chunk * 2 <= min(Ec, 2048) and Ec % (scan_chunk * 2) == 0:
        scan_chunk *= 2

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def bfs(in_src_blk, in_dst_blk, valid_blk, src, dst, active):
        in_src_l = in_src_blk[0]          # [Es] global ids
        in_dst_l = in_dst_blk[0]          # [Es] local ids (sorted)
        valid_l = valid_blk[0]            # [Es]
        L = src.shape[0]
        lanes_idx = jnp.arange(L)
        word_of_lane = lanes_idx // 32
        bit_of_lane = (jnp.uint32(1) <<
                       (lanes_idx % 32).astype(jnp.uint32))
        shard_id = jax.lax.axis_index(axis)
        col0 = shard_id * Vs

        trivial = active & (src == dst)
        searching = active & (src != dst)
        result = jnp.where(trivial, 0, -1).astype(jnp.int32)

        frontier_g = jnp.zeros((W, Vtot + 1), dtype=jnp.uint32)
        frontier_g = frontier_g.at[word_of_lane, src].add(
            jnp.where(searching, bit_of_lane, jnp.uint32(0)))
        frontier_g = frontier_g[:, :Vtot]
        seen_l = jax.lax.dynamic_slice_in_dim(frontier_g, col0, Vs, axis=1)

        heads = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), in_dst_l[1:] != in_dst_l[:-1]])
        # last position of each local segment: in_dst_l sorted -> for each
        # local vertex take the last matching slot
        slot_ids = jnp.arange(in_dst_l.shape[0], dtype=jnp.int32)
        last_pos = jax.ops.segment_max(
            slot_ids, in_dst_l, num_segments=Vs,
            indices_are_sorted=True)                         # [Vs]
        has_in = jax.ops.segment_max(
            valid_l.astype(jnp.int32), in_dst_l, num_segments=Vs,
            indices_are_sorted=True) > 0

        def seg_or(a, b):
            af, av = a
            bf, bv = b
            return af | bf, jnp.where(bf, bv, av | bv)

        def pack_lane_mask(cond):
            bits = cond.reshape(W, 32).astype(jnp.uint32)
            return (bits << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                axis=1, dtype=jnp.uint32)

        def cond(state):
            it, frontier_g, seen_l, result = state
            return (it <= max_iters) & (frontier_g != 0).any()

        def expand_full(frontier_g):
            gathered = jnp.where(
                valid_l[None, :],
                frontier_g.at[:, in_src_l].get(mode="fill", fill_value=0),
                jnp.uint32(0))                               # [W, Es]
            if use_pallas:
                from ..kernels.segscan_pallas import seg_or_scan_rows
                scanned = seg_or_scan_rows(gathered, heads,
                                           chunk=scan_chunk)
            else:
                _, scanned = jax.lax.associative_scan(
                    seg_or, (heads.reshape(1, -1), gathered), axis=1)
            return jnp.where(has_in[None, :],
                             scanned[:, jnp.maximum(last_pos, 0)],
                             jnp.uint32(0))                  # [W, Vs]

        def expand_chunked(frontier_g):
            def step(k, st):
                nxt, carry = st
                off = k * Ec
                idx = jax.lax.dynamic_slice(in_src_l, (off,), (Ec,))
                val = jax.lax.dynamic_slice(valid_l, (off,), (Ec,))
                hds = jax.lax.dynamic_slice(heads, (off,), (Ec,))
                g = jnp.where(
                    val[None, :],
                    frontier_g.at[:, idx].get(mode="fill", fill_value=0),
                    jnp.uint32(0))                           # [W, Ec]
                if use_pallas:
                    from ..kernels.segscan_pallas import \
                        seg_or_scan_rows_carry
                    scanned, carry = seg_or_scan_rows_carry(
                        g, hds, carry, chunk=scan_chunk)
                else:
                    g0 = g[:, 0] | jnp.where(hds[0], jnp.uint32(0),
                                             carry[:, 0])
                    g = jax.lax.dynamic_update_slice(g, g0[:, None], (0, 0))
                    _, scanned = jax.lax.associative_scan(
                        seg_or, (hds.reshape(1, -1), g), axis=1)
                    carry = scanned[:, -1:]
                rel = last_pos - off
                ok = (rel >= 0) & (rel < Ec) & has_in
                vals = scanned[:, jnp.clip(rel, 0, Ec - 1)]
                nxt = jnp.where(ok[None, :], vals, nxt)
                return nxt, carry

            nxt0 = jnp.zeros((W, Vs), jnp.uint32)
            carry0 = jnp.zeros((W, 1), jnp.uint32)
            nxt, _ = jax.lax.fori_loop(0, n_chunks, step, (nxt0, carry0))
            return nxt

        expand = expand_full if n_chunks == 1 else expand_chunked

        def body(state):
            it, frontier_g, seen_l, result = state
            nxt_l = expand(frontier_g) & ~seen_l
            seen_l = seen_l | nxt_l
            # frontier OR-exchange: ICI within a host, then DCN between
            # hosts on hierarchical meshes (_gather_tiled)
            frontier_g = _gather_tiled(nxt_l, axis, 1)       # [W, Vtot]
            found = ((frontier_g[word_of_lane, dst] & bit_of_lane) != 0) \
                & (result < 0) & searching
            result = jnp.where(found, it, result)
            frontier_g = frontier_g & pack_lane_mask(result < 0)[:, None]
            return it + 1, frontier_g, seen_l, result

        _, _, seen_l, result = jax.lax.while_loop(
            cond, body, (jnp.int32(1), frontier_g, seen_l, result))
        seen_g = _gather_tiled(seen_l, axis, 1)
        per_bit = []
        for b in range(32):
            bits = ((seen_g >> jnp.uint32(b)) &
                    jnp.uint32(1)).astype(jnp.float32)       # [W, Vtot]
            per_bit.append(bits @ deg_global)                # [W]
        traversed = jnp.stack(per_bit, axis=1).reshape(L)
        return result, traversed

    # NB: sharded arrays are passed as ARGUMENTS, not closed over — jit
    # closures over multi-process global arrays are rejected by jax
    run_jit = jax.jit(bfs)

    def run(src, dst, active):
        return run_jit(in_src, in_dst, edge_valid, src, dst, active)

    return run


def make_dist_bfs_parents(mesh: Mesh, sharded: ShardedCSR, lanes: int,
                          max_iters: int):
    """Distributed BFS with parent tracking: each shard records, per owned
    vertex and lane, the global source vertex that first discovered it
    (min source id among this wave's frontier-origin in-edges — a
    deterministic tie-break). Parents stay sharded; the full [Vtot, L]
    parent table is gathered once at the end for host-side backtracking.

    Returns fn(src[L], dst[L], active[L]) -> (lengths int32 [L],
    parents int32 [Vtot, L], -1 = undiscovered)."""
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    axis = mesh.axis_names[0]

    in_src = jax.device_put(
        jnp.asarray(sharded.in_src), NamedSharding(mesh, P(axis, None)))
    in_dst = jax.device_put(
        jnp.asarray(sharded.in_dst_local),
        NamedSharding(mesh, P(axis, None)))
    edge_valid = jax.device_put(
        jnp.asarray(sharded.edge_valid),
        NamedSharding(mesh, P(axis, None)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def bfs(in_src_blk, in_dst_blk, valid_blk, src, dst, active):
        in_src_l = in_src_blk[0]
        in_dst_l = in_dst_blk[0]
        valid_l = valid_blk[0]
        L = src.shape[0]
        lanes_idx = jnp.arange(L)
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * Vs
        BIG = jnp.int32(Vtot + 1)

        trivial = active & (src == dst)
        searching = active & (src != dst)
        result = jnp.where(trivial, 0, -1).astype(jnp.int32)

        frontier_g = jnp.zeros((Vtot, L), dtype=jnp.bool_)
        frontier_g = frontier_g.at[src, lanes_idx].set(searching)
        seen_l = jax.lax.dynamic_slice_in_dim(frontier_g, row0, Vs, axis=0)
        parent_l = jnp.full((Vs, L), -1, dtype=jnp.int32)

        def cond(state):
            it, frontier_g, seen_l, result, parent_l = state
            return (it <= max_iters) & frontier_g.any()

        def body(state):
            it, frontier_g, seen_l, result, parent_l = state
            gathered = jnp.where(
                valid_l[:, None],
                frontier_g.at[in_src_l].get(mode="fill", fill_value=False),
                False)                                       # [Es, L]
            nxt_l = jax.ops.segment_max(
                gathered.astype(jnp.int8), in_dst_l,
                num_segments=Vs, indices_are_sorted=True) > 0
            nxt_l = nxt_l & ~seen_l
            # min global source id among frontier-origin in-edges
            cand = jnp.where(gathered, in_src_l[:, None], BIG)
            minsrc = jax.ops.segment_min(
                cand, in_dst_l, num_segments=Vs,
                indices_are_sorted=True)                     # [Vs, L]
            newly = nxt_l & (parent_l < 0)
            parent_l = jnp.where(newly, minsrc, parent_l)
            seen_l = seen_l | nxt_l
            frontier_g = jax.lax.all_gather(
                nxt_l, axis, axis=0, tiled=True)
            found = frontier_g[dst, lanes_idx] & (result < 0) & searching
            result = jnp.where(found, it, result)
            frontier_g = frontier_g & (result < 0)[None, :]
            return it + 1, frontier_g, seen_l, result, parent_l

        _, _, seen_l, result, parent_l = jax.lax.while_loop(
            cond, body,
            (jnp.int32(1), frontier_g, seen_l, result, parent_l))
        parents = jax.lax.all_gather(parent_l, axis, axis=0, tiled=True)
        return result, parents

    run_jit = jax.jit(bfs)

    def run(src, dst, active):
        # sharded arrays as ARGUMENTS: jit closures over multi-process
        # global arrays are rejected by jax
        return run_jit(in_src, in_dst, edge_valid, src, dst, active)

    return run


def dist_shortest_paths(mesh: Mesh, sharded: ShardedCSR, src, dst,
                        lanes: int = 32, max_iters: int = 0,
                        fn_cache: Optional[dict] = None):
    """Distributed BFS + host backtracking. Returns (paths, validity):
    each path is the vertex sequence [v0, v1, ..., vk] in ORIGINAL vertex
    ids (edge ids are shard-local and not tracked distributed; the
    single-chip kernels provide edge-id paths). ``fn_cache`` lets callers
    reuse the compiled parents kernel across invocations (the SQL mesh
    bridge passes the per-CSR cache so repeated queries skip the
    build+jit)."""
    max_iters = max_iters or max(sharded.vcount, 1)
    key = ("dist_parents", lanes, max_iters)
    fn = fn_cache.get(key) if fn_cache is not None else None
    if fn is None:
        fn = make_dist_bfs_parents(mesh, sharded, lanes, max_iters)
        if fn_cache is not None:
            fn_cache[key] = fn
    src_m = sharded.map_queries(np.asarray(src))
    dst_m = sharded.map_queries(np.asarray(dst))
    inv = None
    if sharded.perm is not None:
        inv = np.full(sharded.v_padded, -1, dtype=np.int64)
        inv[sharded.perm] = np.arange(sharded.vcount)
    n = len(src_m)
    paths = [None] * n
    validity = np.zeros(n, dtype=bool)
    for start in range(0, n, lanes):
        m = min(lanes, n - start)
        s = np.zeros(lanes, dtype=np.int32)
        d = np.zeros(lanes, dtype=np.int32)
        a = np.zeros(lanes, dtype=bool)
        s[:m] = src_m[start:start + m]
        d[:m] = dst_m[start:start + m]
        a[:m] = True
        res, parents = fn(jnp.asarray(s), jnp.asarray(d), jnp.asarray(a))
        res = np.asarray(res)
        parents = np.asarray(parents)
        for l in range(m):
            q = start + l
            if res[l] < 0:
                continue
            if s[l] == d[l]:
                chain = [int(s[l])]
            else:
                chain = [int(d[l])]
                cur = int(d[l])
                ok = True
                for _ in range(int(res[l])):
                    p = parents[cur, l]
                    if p < 0:
                        ok = False
                        break
                    cur = int(p)
                    chain.append(cur)
                if not ok or cur != int(s[l]):
                    continue
                chain.reverse()
            if inv is not None:
                chain = [int(inv[c]) for c in chain]
            paths[q] = chain
            validity[q] = True
    return paths, validity


def make_dist_bfs(mesh: Mesh, sharded: ShardedCSR, lanes: int,
                  max_iters: int):
    """Build the jitted distributed BFS step function.

    Returns fn(src[L] int32, dst[L] int32, active[L] bool) ->
    (lengths[L] int32, traversed[L] float32)."""
    nx = sharded.n_shards
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    axis = mesh.axis_names[0]

    in_src = jax.device_put(
        jnp.asarray(sharded.in_src), NamedSharding(mesh, P(axis, None)))
    in_dst = jax.device_put(
        jnp.asarray(sharded.in_dst_local),
        NamedSharding(mesh, P(axis, None)))
    edge_valid = jax.device_put(
        jnp.asarray(sharded.edge_valid),
        NamedSharding(mesh, P(axis, None)))

    # per-shard out-degree of owned vertices (for TEPS accounting): count
    # edges by source ownership
    deg = np.zeros(Vtot + 1, dtype=np.float32)
    np.add.at(deg, sharded.in_src.reshape(-1)[
        sharded.edge_valid.reshape(-1)], 1.0)
    deg_global = jnp.asarray(deg[:Vtot])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def bfs(in_src_blk, in_dst_blk, valid_blk, src, dst, active):
        in_src_l = in_src_blk[0]          # [Es] global ids
        in_dst_l = in_dst_blk[0]          # [Es] local ids
        valid_l = valid_blk[0]            # [Es]
        L = src.shape[0]
        lanes_idx = jnp.arange(L)
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * Vs

        trivial = active & (src == dst)
        searching = active & (src != dst)
        result = jnp.where(trivial, 0, -1).astype(jnp.int32)

        # replicated global frontier [Vtot, L]; sharded seen [Vs, L]
        frontier_g = jnp.zeros((Vtot, L), dtype=jnp.bool_)
        frontier_g = frontier_g.at[src, lanes_idx].set(searching)
        seen_l = jax.lax.dynamic_slice_in_dim(frontier_g, row0, Vs, axis=0)

        def cond(state):
            it, frontier_g, seen_l, result = state
            return (it <= max_iters) & frontier_g.any()

        def body(state):
            it, frontier_g, seen_l, result = state
            gathered = jnp.where(
                valid_l[:, None],
                frontier_g.at[in_src_l].get(mode="fill", fill_value=False),
                False)                                       # [Es, L]
            nxt_l = jax.ops.segment_max(
                gathered.astype(jnp.int8), in_dst_l,
                num_segments=Vs, indices_are_sorted=True) > 0
            nxt_l = nxt_l & ~seen_l
            seen_l = seen_l | nxt_l
            # frontier OR-exchange over ICI
            frontier_g = jax.lax.all_gather(
                nxt_l, axis, axis=0, tiled=True)             # [Vtot, L]
            found = frontier_g[dst, lanes_idx] & (result < 0) & searching
            result = jnp.where(found, it, result)
            frontier_g = frontier_g & (result < 0)[None, :]
            return it + 1, frontier_g, seen_l, result

        _, _, seen_l, result = jax.lax.while_loop(
            cond, body, (jnp.int32(1), frontier_g, seen_l, result))
        # TEPS accounting over the union of visited vertices
        seen_g = jax.lax.all_gather(seen_l, axis, axis=0, tiled=True)
        traversed = (seen_g.astype(jnp.float32) *
                     deg_global[:, None]).sum(axis=0)
        return result, traversed

    run_jit = jax.jit(bfs)

    def run(src, dst, active):
        return run_jit(in_src, in_dst, edge_valid, src, dst, active)

    return run


def make_dist_bfs_packed_overlap(mesh: Mesh, sharded: ShardedCSR,
                                 lanes: int, max_iters: int):
    """Bit-packed distributed BFS with exchange/compute overlap (BASELINE
    config 5; SURVEY.md §7.3 item 5): each shard's local vertex range is
    split in half, the first half's new-frontier ``all_gather`` is issued
    before the second half expands, and XLA's async collectives overlap
    that exchange with the second half's gather+scan compute. Results are
    identical to make_dist_bfs_packed (verified by tests/test_parallel).

    The halves are static per-shard edge prefixes (edges are local-dst
    sorted), each padded to the max half-size across shards, so the split
    costs no extra passes — only the reconstruction reshape."""
    import os
    use_pallas = os.environ.get("DUCKPGQ_SCAN_IMPL", "xla") == "pallas"
    nx = sharded.n_shards
    Vs = sharded.v_shard
    assert Vs % 2 == 0, Vs
    Vh = Vs // 2
    Vtot = sharded.v_padded
    axis = mesh.axis_names[0]
    assert lanes % 32 == 0
    W = lanes // 32

    # host-side split: per shard, A = edges with local dst < Vh (a prefix,
    # since shard edges are dst-sorted), B = the rest; pad per half
    halves = {"A": [], "B": []}
    for s in range(nx):
        cut = int(np.searchsorted(sharded.in_dst_local[s], Vh, side="left"))
        n_valid = int(sharded.edge_valid[s].sum())
        cut = min(cut, n_valid)
        halves["A"].append((sharded.in_src[s][:cut],
                            sharded.in_dst_local[s][:cut]))
        halves["B"].append((sharded.in_src[s][cut:n_valid],
                            sharded.in_dst_local[s][cut:n_valid] - Vh))

    def pad_half(parts):
        emax = round_up(max(max(len(a) for a, _ in parts), 1), 8)
        isrc = np.full((nx, emax), Vtot, dtype=np.int32)   # pad row
        idst = np.full((nx, emax), Vh - 1, dtype=np.int32)
        valid = np.zeros((nx, emax), dtype=bool)
        for s, (a, d) in enumerate(parts):
            isrc[s, :len(a)] = a
            idst[s, :len(a)] = d
            valid[s, :len(a)] = True
        shard = NamedSharding(mesh, P(axis, None))
        return (jax.device_put(jnp.asarray(isrc), shard),
                jax.device_put(jnp.asarray(idst), shard),
                jax.device_put(jnp.asarray(valid), shard))

    blocks = {k: pad_half(v) for k, v in halves.items()}

    deg = np.zeros(Vtot + 1, dtype=np.float32)
    np.add.at(deg, sharded.in_src.reshape(-1)[
        sharded.edge_valid.reshape(-1)], 1.0)
    deg_global = jnp.asarray(deg[:Vtot])

    def scan_chunk_for(n):
        c = 1
        while c * 2 <= min(n, 2048) and n % (c * 2) == 0:
            c *= 2
        return c

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def bfs(a_src, a_dst, a_val, b_src, b_dst, b_val, src, dst, active):
        L = src.shape[0]
        lanes_idx = jnp.arange(L)
        word_of_lane = lanes_idx // 32
        bit_of_lane = (jnp.uint32(1) <<
                       (lanes_idx % 32).astype(jnp.uint32))

        trivial = active & (src == dst)
        searching = active & (src != dst)
        result = jnp.where(trivial, 0, -1).astype(jnp.int32)

        frontier_g = jnp.zeros((W, Vtot + 1), dtype=jnp.uint32)
        frontier_g = frontier_g.at[word_of_lane, src].add(
            jnp.where(searching, bit_of_lane, jnp.uint32(0)))
        frontier_g = frontier_g[:, :Vtot]
        shard_id = jax.lax.axis_index(axis)
        col0 = shard_id * Vs
        seen_l = jax.lax.dynamic_slice_in_dim(frontier_g, col0, Vs, axis=1)

        def seg_meta(in_dst_l, valid_l):
            heads = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), in_dst_l[1:] != in_dst_l[:-1]])
            slot_ids = jnp.arange(in_dst_l.shape[0], dtype=jnp.int32)
            last_pos = jax.ops.segment_max(
                slot_ids, in_dst_l, num_segments=Vh,
                indices_are_sorted=True)
            has_in = jax.ops.segment_max(
                valid_l.astype(jnp.int32), in_dst_l, num_segments=Vh,
                indices_are_sorted=True) > 0
            return heads, last_pos, has_in

        metas = {}
        for key, (isrc, idst, ival) in (("A", (a_src, a_dst, a_val)),
                                        ("B", (b_src, b_dst, b_val))):
            metas[key] = (isrc[0], idst[0], ival[0],
                          *seg_meta(idst[0], ival[0]))

        def seg_or(x, y):
            xf, xv = x
            yf, yv = y
            return xf | yf, jnp.where(yf, yv, xv | yv)

        def expand(meta, frontier_g, seen_half):
            in_src_l, in_dst_l, valid_l, heads, last_pos, has_in = meta
            gathered = jnp.where(
                valid_l[None, :],
                frontier_g.at[:, in_src_l].get(mode="fill", fill_value=0),
                jnp.uint32(0))                        # [W, Eh]
            if use_pallas:
                from ..kernels.segscan_pallas import seg_or_scan_rows
                scanned = seg_or_scan_rows(
                    gathered, heads,
                    chunk=scan_chunk_for(in_src_l.shape[0]))
            else:
                _, scanned = jax.lax.associative_scan(
                    seg_or, (heads.reshape(1, -1), gathered), axis=1)
            nxt = jnp.where(has_in[None, :],
                            scanned[:, jnp.maximum(last_pos, 0)],
                            jnp.uint32(0))            # [W, Vh]
            return nxt & ~seen_half

        def pack_lane_mask(cond):
            bits = cond.reshape(W, 32).astype(jnp.uint32)
            return (bits << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                axis=1, dtype=jnp.uint32)

        def cond(state):
            it, frontier_g, seen_l, result = state
            return (it <= max_iters) & (frontier_g != 0).any()

        def body(state):
            it, frontier_g, seen_l, result = state
            # half A expands and its exchange is issued...
            nxt_a = expand(metas["A"], frontier_g, seen_l[:, :Vh])
            ag_a = jax.lax.all_gather(nxt_a, axis, axis=1, tiled=True)
            # ...overlapping half B's expansion compute
            nxt_b = expand(metas["B"], frontier_g, seen_l[:, Vh:])
            ag_b = jax.lax.all_gather(nxt_b, axis, axis=1, tiled=True)
            seen_l = seen_l | jnp.concatenate([nxt_a, nxt_b], axis=1)
            # reconstruct [W, Vtot]: shard s's halves sit at columns
            # [s*Vh,(s+1)*Vh) of each gather
            frontier_g = jnp.concatenate(
                [ag_a.reshape(W, nx, Vh), ag_b.reshape(W, nx, Vh)],
                axis=2).reshape(W, Vtot)
            found = ((frontier_g[word_of_lane, dst] & bit_of_lane) != 0) \
                & (result < 0) & searching
            result = jnp.where(found, it, result)
            frontier_g = frontier_g & pack_lane_mask(result < 0)[:, None]
            return it + 1, frontier_g, seen_l, result

        _, _, seen_l, result = jax.lax.while_loop(
            cond, body, (jnp.int32(1), frontier_g, seen_l, result))
        seen_g = jax.lax.all_gather(seen_l, axis, axis=1, tiled=True)
        per_bit = []
        for b in range(32):
            bits = ((seen_g >> jnp.uint32(b)) &
                    jnp.uint32(1)).astype(jnp.float32)
            per_bit.append(bits @ deg_global)
        traversed = jnp.stack(per_bit, axis=1).reshape(L)
        return result, traversed

    run_jit = jax.jit(bfs)

    def run(src, dst, active):
        return run_jit(*blocks["A"], *blocks["B"], src, dst, active)

    return run


def dist_bfs_lengths(mesh: Mesh, sharded: ShardedCSR, src, dst,
                     lanes: int = 64, max_iters: int = 0):
    """Convenience batched driver over the distributed BFS (bit-packed
    frontier when lanes is a multiple of 32)."""
    max_iters = max_iters or max(sharded.vcount, 1)
    maker = make_dist_bfs_packed if lanes % 32 == 0 else make_dist_bfs
    fn = maker(mesh, sharded, lanes, max_iters)
    src = sharded.map_queries(np.asarray(src))
    dst = sharded.map_queries(np.asarray(dst))
    n = len(src)
    out = np.full(n, -1, dtype=np.int64)
    traversed_total = 0.0
    for start in range(0, n, lanes):
        m = min(lanes, n - start)
        s = np.zeros(lanes, dtype=np.int32)
        d = np.zeros(lanes, dtype=np.int32)
        a = np.zeros(lanes, dtype=bool)
        s[:m] = src[start:start + m]
        d[:m] = dst[start:start + m]
        a[:m] = True
        res, trav = fn(jnp.asarray(s), jnp.asarray(d), jnp.asarray(a))
        out[start:start + m] = np.asarray(res)[:m]
        traversed_total += float(np.asarray(trav)[:m].sum())
    return out, traversed_total


# ---------------------------------------------------------------------------
# partitioned-frontier distributed BFS (VERDICT r1 item 3): per-shard peak
# frontier memory O(W * V / N) instead of the replicated O(W * V)
# ---------------------------------------------------------------------------

@dataclass
class GroupedShardedCSR:
    """Per-shard in-edges grouped by SOURCE owner for the ring exchange:
    shard s's edges with src owned by shard t sit in group t, sorted by
    local destination. Source ids are stored LOCAL to the owner's range so
    the expansion gathers straight from the [W, Vs] ring block.

    in_src_local: int32 [nx, nx, Eg]   src id within owner's range
    in_dst_local: int32 [nx, nx, Eg]   dst id within this shard's range
    edge_valid:   bool  [nx, nx, Eg]
    """

    in_src_local: np.ndarray
    in_dst_local: np.ndarray
    edge_valid: np.ndarray
    n_shards: int
    v_shard: int
    vcount: int
    ecount: int
    perm: Optional[np.ndarray] = None

    @property
    def v_padded(self) -> int:
        return self.n_shards * self.v_shard

    def map_queries(self, q: np.ndarray) -> np.ndarray:
        return q if self.perm is None else self.perm[q]


def partition_csr_grouped(vcount: int, src: np.ndarray, dst: np.ndarray,
                          n_shards: int,
                          balance: bool = True) -> GroupedShardedCSR:
    """Partition edges by destination owner AND group each shard's edges by
    source owner (the unit the ring exchange processes). ``balance=True``
    applies the same hub-relabeling as partition_csr, which also evens the
    per-(shard, group) edge counts so the common group padding stays tight
    on power-law graphs."""
    v_shard = round_up(max((vcount + n_shards - 1) // n_shards, 8), 8)
    perm = None
    if balance:
        indeg = np.bincount(dst, minlength=vcount)
        order = np.argsort(-indeg, kind="stable")
        ranks = np.empty(vcount, dtype=np.int64)
        ranks[order] = np.arange(vcount)
        perm = (ranks % n_shards) * v_shard + ranks // n_shards
        src = perm[src]
        dst = perm[dst]
    dst_owner = dst // v_shard
    src_owner = src // v_shard
    groups = {}
    eg_max = 1
    for s in range(n_shards):
        for t in range(n_shards):
            mask = (dst_owner == s) & (src_owner == t)
            es = (src[mask] - t * v_shard).astype(np.int32)
            ed = (dst[mask] - s * v_shard).astype(np.int32)
            order2 = np.argsort(ed, kind="stable")
            groups[s, t] = (es[order2], ed[order2])
            eg_max = max(eg_max, len(es))
    eg_pad = round_up(eg_max, 8)
    in_src = np.full((n_shards, n_shards, eg_pad), v_shard - 1,
                     dtype=np.int32)
    in_dst = np.full((n_shards, n_shards, eg_pad), v_shard - 1,
                     dtype=np.int32)
    valid = np.zeros((n_shards, n_shards, eg_pad), dtype=bool)
    for (s, t), (es, ed) in groups.items():
        in_src[s, t, :len(es)] = es
        in_dst[s, t, :len(es)] = ed
        valid[s, t, :len(es)] = True
    return GroupedShardedCSR(in_src_local=in_src, in_dst_local=in_dst,
                             edge_valid=valid, n_shards=n_shards,
                             v_shard=v_shard, vcount=vcount,
                             ecount=len(src), perm=perm)


def make_dist_bfs_partitioned(mesh: Mesh, grouped: GroupedShardedCSR,
                              lanes: int, max_iters: int,
                              n_chunks: int = 1):
    """Bit-packed distributed BFS with a PARTITIONED frontier.

    Unlike make_dist_bfs_packed (which all_gathers the new frontier into a
    replicated [W, Vtot] buffer on every chip — O(W*V) per-chip memory),
    every frontier buffer here is [W, Vs]: each iteration runs an N-step
    ring over the mesh axis (``ppermute`` to the ring neighbor), and at
    step k a shard expands only its edge group whose sources belong to the
    block currently in hand. Exchange volume per iteration is the same as
    the all_gather (every block visits every shard — unavoidable in a pull
    model where any shard may neighbor any source), but per-shard peak
    frontier memory drops from O(W*V) to O(W*V/N + W*Eg) — the gate to
    RMAT-26-class graphs (BASELINE config 5). The ppermute is issued
    before the block's expansion so XLA overlaps the ring hop with
    compute.

    Termination/result flags are tiny [L] psum collectives: the shard that
    owns a query's dst reports the hit.

    ``n_chunks > 1`` additionally streams each group's expansion in edge
    sub-chunks (segmented-scan carry threaded across them), so only
    [W, Eg/K] stays live — per-shard memory becomes
    O(W*(V/N + Eg/(N*K))), the full streaming story for RMAT-26-class
    shards.

    Returns fn(src[L], dst[L], active[L]) -> (lengths[L] int32,
    traversed[L] float32)."""
    import os
    use_pallas = os.environ.get("DUCKPGQ_SCAN_IMPL", "xla") == "pallas"
    nx = grouped.n_shards
    Vs = grouped.v_shard
    axis = mesh.axis_names[0]
    assert lanes % 32 == 0
    W = lanes // 32

    src_np = grouped.in_src_local
    dst_np = grouped.in_dst_local
    val_np = grouped.edge_valid
    if n_chunks > 1:
        eg_pad = round_up(src_np.shape[2], n_chunks * 128)
        if eg_pad != src_np.shape[2]:
            def repad(arr, fill):
                out = np.full((nx, nx, eg_pad), fill, dtype=arr.dtype)
                out[:, :, :arr.shape[2]] = arr
                return out
            src_np = repad(src_np, np.int32(Vs - 1))
            dst_np = repad(dst_np, np.int32(Vs - 1))
            val_np = repad(val_np, False)
    Eg = src_np.shape[2]
    assert Eg % n_chunks == 0, (Eg, n_chunks)
    Egc = Eg // n_chunks
    scan_chunk = 1
    while scan_chunk * 2 <= min(Egc, 2048) and Egc % (scan_chunk * 2) == 0:
        scan_chunk *= 2

    shard4 = NamedSharding(mesh, P(axis, None, None))
    in_src = jax.device_put(jnp.asarray(src_np), shard4)
    in_dst = jax.device_put(jnp.asarray(dst_np), shard4)
    edge_valid = jax.device_put(jnp.asarray(val_np), shard4)

    # per-shard out-degrees of OWNED vertices (TEPS accounting, sharded)
    deg = np.zeros((nx, Vs), dtype=np.float32)
    src_flat = grouped.in_src_local.reshape(nx, -1)
    own_flat = np.broadcast_to(
        np.arange(nx, dtype=np.int32)[None, :, None],
        grouped.in_src_local.shape).reshape(nx, -1)
    val_flat = grouped.edge_valid.reshape(nx, -1)
    np.add.at(deg, (own_flat[val_flat], src_flat[val_flat]), 1.0)
    deg_shard = jax.device_put(jnp.asarray(deg),
                               NamedSharding(mesh, P(axis, None)))

    ring_perm = [(i, (i - 1) % nx) for i in range(nx)]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def bfs(src_blk, dst_blk, val_blk, deg_blk, src, dst, active):
        isrc = src_blk[0]                # [nx, Eg] local-to-owner src ids
        idst = dst_blk[0]                # [nx, Eg] local dst ids (sorted)
        ival = val_blk[0]                # [nx, Eg]
        deg_l = deg_blk[0]               # [Vs]
        L = src.shape[0]
        lanes_idx = jnp.arange(L)
        word_of_lane = lanes_idx // 32
        bit_of_lane = (jnp.uint32(1) << (lanes_idx % 32).astype(jnp.uint32))
        shard_id = jax.lax.axis_index(axis)

        trivial = active & (src == dst)
        searching = active & (src != dst)
        result = jnp.where(trivial, 0, -1).astype(jnp.int32)

        # seed MY block: bits of searching lanes whose src I own
        src_owner = src // Vs
        src_local = jnp.where(src_owner == shard_id, src % Vs, Vs)
        seed = jnp.zeros((W, Vs + 1), dtype=jnp.uint32)
        seed = seed.at[word_of_lane, src_local].add(
            jnp.where(searching, bit_of_lane, jnp.uint32(0)))[:, :Vs]
        seen_l = seed

        dst_owner = dst // Vs
        dst_local = jnp.where(dst_owner == shard_id, dst % Vs, 0)
        dst_mine = dst_owner == shard_id

        # segment metadata per group (static shapes; computed once)
        slot_ids = jnp.arange(Eg, dtype=jnp.int32)
        heads_g = jnp.concatenate(
            [jnp.ones((nx, 1), jnp.bool_), idst[:, 1:] != idst[:, :-1]],
            axis=1)                                           # [nx, Eg]
        last_pos_g = jax.vmap(lambda d: jax.ops.segment_max(
            slot_ids, d, num_segments=Vs, indices_are_sorted=True))(idst)
        has_in_g = jax.vmap(lambda d, v: jax.ops.segment_max(
            v.astype(jnp.int32), d, num_segments=Vs,
            indices_are_sorted=True) > 0)(idst, ival)

        def seg_or(x, y):
            xf, xv = x
            yf, yv = y
            return xf | yf, jnp.where(yf, yv, xv | yv)

        def expand_group(owner, blk):
            """OR-contributions of edges whose sources sit in ``blk``
            (the [W, Vs] frontier block of shard ``owner``); with
            n_chunks > 1 the group streams in [W, Egc] sub-chunks with
            the open segment's OR carried across chunk boundaries."""
            g_src = jax.lax.dynamic_index_in_dim(isrc, owner, 0, False)
            g_val = jax.lax.dynamic_index_in_dim(ival, owner, 0, False)
            g_heads = jax.lax.dynamic_index_in_dim(heads_g, owner, 0, False)
            g_last = jax.lax.dynamic_index_in_dim(last_pos_g, owner, 0,
                                                  False)
            g_has = jax.lax.dynamic_index_in_dim(has_in_g, owner, 0, False)
            if n_chunks == 1:
                gathered = jnp.where(
                    g_val[None, :],
                    blk.at[:, g_src].get(mode="fill", fill_value=0),
                    jnp.uint32(0))                            # [W, Eg]
                if use_pallas:
                    from ..kernels.segscan_pallas import seg_or_scan_rows
                    scanned = seg_or_scan_rows(gathered, g_heads,
                                               chunk=scan_chunk)
                else:
                    _, scanned = jax.lax.associative_scan(
                        seg_or, (g_heads.reshape(1, -1), gathered), axis=1)
                return jnp.where(g_has[None, :],
                                 scanned[:, jnp.maximum(g_last, 0)],
                                 jnp.uint32(0))               # [W, Vs]

            def sub(kk, st):
                nxt, carry = st
                off = kk * Egc
                idx = jax.lax.dynamic_slice(g_src, (off,), (Egc,))
                val = jax.lax.dynamic_slice(g_val, (off,), (Egc,))
                hds = jax.lax.dynamic_slice(g_heads, (off,), (Egc,))
                g = jnp.where(
                    val[None, :],
                    blk.at[:, idx].get(mode="fill", fill_value=0),
                    jnp.uint32(0))                            # [W, Egc]
                if use_pallas:
                    from ..kernels.segscan_pallas import                         seg_or_scan_rows_carry
                    scanned, carry = seg_or_scan_rows_carry(
                        g, hds, carry, chunk=scan_chunk)
                else:
                    g0 = g[:, 0] | jnp.where(hds[0], jnp.uint32(0),
                                             carry[:, 0])
                    g = jax.lax.dynamic_update_slice(g, g0[:, None],
                                                     (0, 0))
                    _, scanned = jax.lax.associative_scan(
                        seg_or, (hds.reshape(1, -1), g), axis=1)
                    carry = scanned[:, -1:]
                rel = g_last - off
                ok = (rel >= 0) & (rel < Egc) & g_has
                vals = scanned[:, jnp.clip(rel, 0, Egc - 1)]
                nxt = jnp.where(ok[None, :], vals, nxt)
                return nxt, carry

            nxt0 = jnp.zeros((W, Vs), jnp.uint32)
            carry0 = jnp.zeros((W, 1), jnp.uint32)
            nxt, _ = jax.lax.fori_loop(0, n_chunks, sub, (nxt0, carry0))
            return nxt

        def pack_lane_mask(c):
            bits = c.reshape(W, 32).astype(jnp.uint32)
            return (bits << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                axis=1, dtype=jnp.uint32)

        def cond(state):
            it, cur, seen_l, result, alive = state
            return (it <= max_iters) & alive

        def body(state):
            it, cur, seen_l, result, _ = state

            def ring_step(k, st):
                acc, blk = st
                # issue the ring hop first so XLA overlaps it with the
                # expansion of the block in hand
                nxt_blk = jax.lax.ppermute(blk, axis, ring_perm)
                owner = jax.lax.rem(shard_id + k, nx)
                acc = acc | expand_group(owner, blk)
                return acc, nxt_blk

            acc0 = jnp.zeros((W, Vs), jnp.uint32)
            acc, _ = jax.lax.fori_loop(0, nx, ring_step, (acc0, cur))
            nxt = acc & ~seen_l
            seen_l = seen_l | nxt
            # result flags: the dst owner reports the hit (tiny psum)
            bit = (nxt[word_of_lane, dst_local] & bit_of_lane) != 0
            hit = jax.lax.psum((dst_mine & bit).astype(jnp.int32), axis) > 0
            found = hit & (result < 0) & searching
            result = jnp.where(found, it, result)
            nxt = nxt & pack_lane_mask(result < 0)[:, None]
            alive = jax.lax.psum((nxt != 0).any().astype(jnp.int32),
                                 axis) > 0
            return it + 1, nxt, seen_l, result, alive

        _, _, seen_l, result, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(1), seed, seen_l, result,
                         jnp.bool_(True)))
        per_bit = []
        for b in range(32):
            bits = ((seen_l >> jnp.uint32(b)) &
                    jnp.uint32(1)).astype(jnp.float32)        # [W, Vs]
            per_bit.append(bits @ deg_l)                      # [W]
        traversed = jax.lax.psum(
            jnp.stack(per_bit, axis=1).reshape(L), axis)
        return result, traversed

    run_jit = jax.jit(bfs)

    def run(src, dst, active):
        return run_jit(in_src, in_dst, edge_valid, deg_shard, src, dst,
                       active)

    return run


def make_dist_bfs_partitioned_compressed(mesh: Mesh,
                                         grouped: GroupedShardedCSR,
                                         lanes: int, max_iters: int,
                                         budget_div=8):
    """Partitioned-frontier ring BFS with COMPRESSED frontier exchange
    (VERDICT r3 item 3a / BASELINE.md multi-host projection lever 3a).

    After the first 3-4 BFS levels the new-frontier blocks are mostly
    zero columns, but the plain ring still moves the dense [W, Vs] block
    every hop. Here each iteration takes a replicated pmax of per-shard
    column occupancy; when every shard's nonzero-column count fits the
    static budget C = Vs/budget_div, the ring permutes a
    (column-ids [C], payload [W, C]) pair instead — C*(W+1) words per
    hop vs W*Vs, an occupancy-proportional cut of the DCN bytes that the
    projection table says is mandatory for >=0.70 efficiency at 4 hosts.
    Receivers reconstruct the dense block gather-only (searchsorted over
    the sorted column ids), so results are bit-identical to
    make_dist_bfs_partitioned.

    ``budget_div`` may be an int or a tuple of ints (multiple budget
    TIERS, e.g. (4, 32): each iteration rings the smallest payload that
    fits the global occupancy — a step-wise approximation of
    occupancy-proportional exchange).

    Returns fn(src, dst, active) -> (lengths [L], traversed [L],
    words_log [max_iters + 1] int32 — EXACT per-iteration exchanged
    words per shard, 0 after the fixpoint; words_log[0] is unused)."""
    nx = grouped.n_shards
    Vs = grouped.v_shard
    axis = mesh.axis_names[0]
    assert lanes % 32 == 0
    W = lanes // 32
    divs = (budget_div,) if isinstance(budget_div, int) else \
        tuple(budget_div)
    caps = []
    for d in sorted(divs, reverse=True):    # smallest payload first
        cc = max(128, -(-max(Vs // d, 1) // 128) * 128)
        caps.append(min(cc, Vs))
    caps = sorted(set(caps))

    src_np = grouped.in_src_local
    dst_np = grouped.in_dst_local
    val_np = grouped.edge_valid
    Eg = src_np.shape[2]

    shard4 = NamedSharding(mesh, P(axis, None, None))
    in_src = jax.device_put(jnp.asarray(src_np), shard4)
    in_dst = jax.device_put(jnp.asarray(dst_np), shard4)
    edge_valid = jax.device_put(jnp.asarray(val_np), shard4)

    deg = np.zeros((nx, Vs), dtype=np.float32)
    src_flat = grouped.in_src_local.reshape(nx, -1)
    own_flat = np.broadcast_to(
        np.arange(nx, dtype=np.int32)[None, :, None],
        grouped.in_src_local.shape).reshape(nx, -1)
    val_flat = grouped.edge_valid.reshape(nx, -1)
    np.add.at(deg, (own_flat[val_flat], src_flat[val_flat]), 1.0)
    deg_shard = jax.device_put(jnp.asarray(deg),
                               NamedSharding(mesh, P(axis, None)))

    ring_perm = [(i, (i - 1) % nx) for i in range(nx)]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    def bfs(src_blk, dst_blk, val_blk, deg_blk, src, dst, active):
        isrc = src_blk[0]
        idst = dst_blk[0]
        ival = val_blk[0]
        deg_l = deg_blk[0]
        L = src.shape[0]
        lanes_idx = jnp.arange(L)
        word_of_lane = lanes_idx // 32
        bit_of_lane = (jnp.uint32(1) << (lanes_idx % 32).astype(jnp.uint32))
        shard_id = jax.lax.axis_index(axis)

        trivial = active & (src == dst)
        searching = active & (src != dst)
        result = jnp.where(trivial, 0, -1).astype(jnp.int32)

        src_owner = src // Vs
        src_local = jnp.where(src_owner == shard_id, src % Vs, Vs)
        seed = jnp.zeros((W, Vs + 1), dtype=jnp.uint32)
        seed = seed.at[word_of_lane, src_local].add(
            jnp.where(searching, bit_of_lane, jnp.uint32(0)))[:, :Vs]
        seen_l = seed

        dst_owner = dst // Vs
        dst_local = jnp.where(dst_owner == shard_id, dst % Vs, 0)
        dst_mine = dst_owner == shard_id

        slot_ids = jnp.arange(Eg, dtype=jnp.int32)
        heads_g = jnp.concatenate(
            [jnp.ones((nx, 1), jnp.bool_), idst[:, 1:] != idst[:, :-1]],
            axis=1)
        last_pos_g = jax.vmap(lambda d: jax.ops.segment_max(
            slot_ids, d, num_segments=Vs, indices_are_sorted=True))(idst)
        has_in_g = jax.vmap(lambda d, v: jax.ops.segment_max(
            v.astype(jnp.int32), d, num_segments=Vs,
            indices_are_sorted=True) > 0)(idst, ival)

        def seg_or(x, y):
            xf, xv = x
            yf, yv = y
            return xf | yf, jnp.where(yf, yv, xv | yv)

        def expand_group(owner, blk):
            g_src = jax.lax.dynamic_index_in_dim(isrc, owner, 0, False)
            g_val = jax.lax.dynamic_index_in_dim(ival, owner, 0, False)
            g_heads = jax.lax.dynamic_index_in_dim(heads_g, owner, 0,
                                                   False)
            g_last = jax.lax.dynamic_index_in_dim(last_pos_g, owner, 0,
                                                  False)
            g_has = jax.lax.dynamic_index_in_dim(has_in_g, owner, 0, False)
            gathered = jnp.where(
                g_val[None, :],
                blk.at[:, g_src].get(mode="fill", fill_value=0),
                jnp.uint32(0))
            _, scanned = jax.lax.associative_scan(
                seg_or, (g_heads.reshape(1, -1), gathered), axis=1)
            return jnp.where(g_has[None, :],
                             scanned[:, jnp.maximum(g_last, 0)],
                             jnp.uint32(0))

        def make_ring_compressed(C):
            def compress(blk):
                colnz = (blk != 0).any(axis=0)
                idx = jnp.nonzero(colnz, size=C,
                                  fill_value=Vs)[0].astype(jnp.int32)
                payload = jnp.where(
                    (idx < Vs)[None, :],
                    jnp.take(blk, jnp.minimum(idx, Vs - 1), axis=1),
                    jnp.uint32(0))
                return idx, payload

            def reconstruct(idx, payload):
                v = jnp.arange(Vs, dtype=jnp.int32)
                pos = jnp.searchsorted(idx, v).astype(jnp.int32)
                pos_cl = jnp.minimum(pos, C - 1)
                match = idx[pos_cl] == v
                return jnp.where(match[None, :], payload[:, pos_cl],
                                 jnp.uint32(0))

            def ring(cur):
                idx, payload = compress(cur)

                def step(k, st):
                    acc, idx, payload = st
                    n_idx = jax.lax.ppermute(idx, axis, ring_perm)
                    n_pay = jax.lax.ppermute(payload, axis, ring_perm)
                    owner = jax.lax.rem(shard_id + k, nx)
                    acc = acc | expand_group(owner,
                                             reconstruct(idx, payload))
                    return acc, n_idx, n_pay

                acc0 = jnp.zeros((W, Vs), jnp.uint32)
                acc, _, _ = jax.lax.fori_loop(0, nx, step,
                                              (acc0, idx, payload))
                return acc

            return ring

        rings = [(C, make_ring_compressed(C)) for C in caps]

        def pack_lane_mask(c):
            bits = c.reshape(W, 32).astype(jnp.uint32)
            return (bits << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                axis=1, dtype=jnp.uint32)

        def ring_dense(cur):
            def step(k, st):
                acc, blk = st
                nxt_blk = jax.lax.ppermute(blk, axis, ring_perm)
                owner = jax.lax.rem(shard_id + k, nx)
                acc = acc | expand_group(owner, blk)
                return acc, nxt_blk
            acc0 = jnp.zeros((W, Vs), jnp.uint32)
            acc, _ = jax.lax.fori_loop(0, nx, step, (acc0, cur))
            return acc

        def cond(state):
            it, cur, seen_l, result, alive, words = state
            return (it <= max_iters) & alive

        def body(state):
            it, cur, seen_l, result, _, words = state
            nnz = (cur != 0).any(axis=0).sum()
            occ_max = jax.lax.pmax(nnz, axis)

            def pick(t, cur):
                # smallest payload tier that fits this iteration's
                # global occupancy; dense fallback (replicated
                # predicate, so every shard takes the same branch)
                if t == len(rings):
                    return ring_dense(cur)
                C_t, ring_t = rings[t]
                return jax.lax.cond(occ_max <= C_t, ring_t,
                                    lambda x: pick(t + 1, x), cur)

            acc = pick(0, cur)
            # exact exchange accounting: (nx-1) hops per iteration, each
            # C*(W+1) words at the chosen tier / W*Vs words dense
            iter_words = jnp.int32((nx - 1) * W * Vs)
            for C_t, _ in reversed(rings):
                iter_words = jnp.where(occ_max <= C_t,
                                       jnp.int32((nx - 1) * (C_t * (W + 1))),
                                       iter_words)
            words = words.at[it].set(iter_words)
            nxt = acc & ~seen_l
            seen_l = seen_l | nxt
            bit = (nxt[word_of_lane, dst_local] & bit_of_lane) != 0
            hit = jax.lax.psum((dst_mine & bit).astype(jnp.int32),
                               axis) > 0
            found = hit & (result < 0) & searching
            result = jnp.where(found, it, result)
            nxt = nxt & pack_lane_mask(result < 0)[:, None]
            alive = jax.lax.psum((nxt != 0).any().astype(jnp.int32),
                                 axis) > 0
            return it + 1, nxt, seen_l, result, alive, words

        words0 = jnp.zeros(max_iters + 1, jnp.int32)
        _, _, seen_l, result, _, words = jax.lax.while_loop(
            cond, body, (jnp.int32(1), seed, seen_l, result,
                         jnp.bool_(True), words0))
        per_bit = []
        for b in range(32):
            bits = ((seen_l >> jnp.uint32(b)) &
                    jnp.uint32(1)).astype(jnp.float32)
            per_bit.append(bits @ deg_l)
        traversed = jax.lax.psum(
            jnp.stack(per_bit, axis=1).reshape(L), axis)
        return result, traversed, words

    run_jit = jax.jit(bfs)

    def run(src, dst, active):
        return run_jit(in_src, in_dst, edge_valid, deg_shard, src, dst,
                       active)

    return run
