"""2-D (vertex x edge) partitioned distributed MS-BFS (VERDICT r3 item
3b / BASELINE.md config 5's RMAT-26 design).

The 1-D partitioned ring moves every shard's [W, Vs] new-frontier block
to every other shard: ~4*W*V bytes received per chip per iteration no
matter how many chips. Partitioning the EDGES over a (r x c) grid
instead — cell (i, j) holds edges with dst in vertex block i and src in
vertex block j; the frontier lives as [W, V/c] source blocks replicated
down each grid column — replaces the all-to-all with row/column
collectives:

  1. local cell expansion:        [W, V/r] partial dst-block frontier
  2. OR-reduce-scatter along the row (ring, c-1 hops of [W, V/(r*c)])
  3. one grid-transpose hop       (device (i, j) -> (j, i))
  4. all-gather along the column  (ring, r-1 hops of [W, V/(r*c)])

Per-chip receive volume per iteration is 4*W*V*(2/sqrt(N) + 1/N) bytes
on a square grid — O(W*V/sqrt(N)) vs the ring's O(W*V), the asymptotic
cut the BASELINE multi-host projection requires for >=0.70 efficiency
at 4+ hosts (its conclusion 3b). The trade: per-device vertex state is
O(W*V/sqrt(N)), not O(W*V/N) — 2-D buys DCN bandwidth with HBM, which
is the right trade on DCN-bound multi-host meshes.

Reuses GroupedShardedCSR: its (dst-owner, src-owner) edge groups ARE
the 2-D cells; here they are sharded over both mesh axes instead of
row-wise. Reference analog: none (the reference is single-process);
this is the framework's own scaling design (SURVEY.md §7.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:                                  # older jax
    from jax.experimental.shard_map import shard_map

from .dist_bfs import GroupedShardedCSR


def make_dist_bfs_2d(mesh: Mesh, grouped: GroupedShardedCSR,
                     lanes: int, max_iters: int):
    """Build the 2-D grid BFS on a square 2-axis mesh (axis names =
    mesh.axis_names = (row, col), r == c == grouped.n_shards).

    Returns fn(src[L], dst[L], active[L]) -> (lengths [L] int32,
    traversed [L] float32, words_log [max_iters + 1] int32 — exact
    per-chip words received per iteration)."""
    row_ax, col_ax = mesh.axis_names
    r, c = mesh.devices.shape
    assert r == c == grouped.n_shards, (r, c, grouped.n_shards)
    Vs = grouped.v_shard
    assert lanes % 32 == 0
    W = lanes // 32
    # slice the [W, Vs] blocks into c ring chunks for the reduce-scatter
    assert Vs % c == 0, (Vs, c)   # v_shard is rounded to a multiple of 8
    Vsl = Vs // c

    cell_spec = NamedSharding(mesh, P(row_ax, col_ax, None))
    in_src = jax.device_put(jnp.asarray(grouped.in_src_local), cell_spec)
    in_dst = jax.device_put(jnp.asarray(grouped.in_dst_local), cell_spec)
    valid = jax.device_put(jnp.asarray(grouped.edge_valid), cell_spec)
    Eg = grouped.in_src_local.shape[2]

    # out-degrees per SOURCE block (TEPS): deg[q, v] = out-degree of
    # block-q vertex v; sharded down the column axis, replicated on rows
    deg = np.zeros((c, Vs), dtype=np.float32)
    for i in range(grouped.n_shards):
        for j in range(grouped.n_shards):
            m = grouped.edge_valid[i, j]
            np.add.at(deg[j], grouped.in_src_local[i, j][m], 1.0)
    deg_shard = jax.device_put(jnp.asarray(deg),
                               NamedSharding(mesh, P(col_ax, None)))

    col_ring = [(j, (j + 1) % c) for j in range(c)]
    row_ring = [(i, (i + 1) % r) for i in range(r)]
    transpose_perm = [(i * c + j, j * c + i)
                      for i in range(r) for j in range(c)]

    # exact per-chip words received per iteration (uint32 words):
    # reduce-scatter (c-1 hops) + transpose (1) + all-gather (r-1 hops),
    # each hop moving one [W, Vsl] slice
    ITER_WORDS = (c - 1 + 1 + r - 1) * W * Vsl

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(row_ax, col_ax, None), P(row_ax, col_ax, None),
                  P(row_ax, col_ax, None), P(col_ax, None),
                  P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    def bfs(src_cell, dst_cell, val_cell, deg_blk, src, dst, active):
        isrc = src_cell[0, 0]            # [Eg] src local to block j
        idst = dst_cell[0, 0]            # [Eg] dst local to block i
        ival = val_cell[0, 0]
        deg_l = deg_blk[0]               # [Vs] of my column's block
        L = src.shape[0]
        lanes_idx = jnp.arange(L)
        word_of_lane = lanes_idx // 32
        bit_of_lane = (jnp.uint32(1) << (lanes_idx % 32).astype(jnp.uint32))
        i_row = jax.lax.axis_index(row_ax)
        j_col = jax.lax.axis_index(col_ax)

        trivial = active & (src == dst)
        searching = active & (src != dst)
        result = jnp.where(trivial, 0, -1).astype(jnp.int32)

        # seed the SOURCE block of my column (identical on every row)
        src_block = src // Vs
        src_local = jnp.where(src_block == j_col, src % Vs, Vs)
        seed = jnp.zeros((W, Vs + 1), dtype=jnp.uint32)
        seed = seed.at[word_of_lane, src_local].add(
            jnp.where(searching, bit_of_lane, jnp.uint32(0)))[:, :Vs]
        seen = seed

        dst_block = dst // Vs
        dst_local = jnp.where(dst_block == j_col, dst % Vs, 0)
        dst_mine = dst_block == j_col

        slot_ids = jnp.arange(Eg, dtype=jnp.int32)
        heads = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), idst[1:] != idst[:-1]])
        last_pos = jax.ops.segment_max(slot_ids, idst, num_segments=Vs,
                                       indices_are_sorted=True)
        has_in = jax.ops.segment_max(ival.astype(jnp.int32), idst,
                                     num_segments=Vs,
                                     indices_are_sorted=True) > 0

        def seg_or(x, y):
            xf, xv = x
            yf, yv = y
            return xf | yf, jnp.where(yf, yv, xv | yv)

        def expand_cell(f):
            """Contributions of my cell's edges (src block j -> dst
            block i) given source frontier f [W, Vs]."""
            gathered = jnp.where(
                ival[None, :],
                f.at[:, isrc].get(mode="fill", fill_value=0),
                jnp.uint32(0))                           # [W, Eg]
            _, scanned = jax.lax.associative_scan(
                seg_or, (heads.reshape(1, -1), gathered), axis=1)
            return jnp.where(has_in[None, :],
                             scanned[:, jnp.maximum(last_pos, 0)],
                             jnp.uint32(0))              # [W, Vs]

        def pack_lane_mask(cm):
            bits = cm.reshape(W, 32).astype(jnp.uint32)
            return (bits << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
                axis=1, dtype=jnp.uint32)

        def cond(state):
            it, f, seen, result, alive = state
            return (it <= max_iters) & alive

        def body(state):
            it, f, seen, result, _ = state
            part = expand_cell(f).reshape(W, c, Vsl)     # slices over Vs

            # --- ring OR-reduce-scatter along the row (axis = columns):
            # step t: send slice (j - t) mod c to column j+1, OR the
            # incoming slice (j - t - 1) mod c into our copy. After
            # c-1 steps column j holds slice (j + 1) mod c fully reduced.
            def rs_step(t, buf):
                send_id = jax.lax.rem(j_col - t + c, c)
                sl = jnp.take(buf, send_id, axis=1)      # [W, Vsl]
                recv = jax.lax.ppermute(sl, col_ax, col_ring)
                recv_id = jax.lax.rem(j_col - t - 1 + 2 * c, c)
                cur = jnp.take(buf, recv_id, axis=1)
                upd = (cur | recv)[:, None, :]
                return jax.lax.dynamic_update_slice(
                    buf, upd, (0, recv_id, 0))

            buf = jax.lax.fori_loop(0, c - 1, rs_step, part)
            my_slice_id = jax.lax.rem(j_col + 1, c)
            my_slice = jnp.take(buf, my_slice_id, axis=1)  # [W, Vsl]

            # --- grid transpose: (i, j) -> (j, i). Afterwards device
            # (p, q) holds slice (p + 1) mod c of dst block q.
            my_slice = jax.lax.ppermute(my_slice, (row_ax, col_ax),
                                        transpose_perm)

            # --- ring all-gather along the column (axis = rows):
            # assemble all r slices of my column's dst block.
            buf2 = jnp.zeros((W, r, Vsl), jnp.uint32)
            buf2 = jax.lax.dynamic_update_slice(
                buf2, my_slice[:, None, :],
                (0, jax.lax.rem(i_row + 1, r), 0))

            def ag_step(t, st):
                buf2, sl = st
                sl = jax.lax.ppermute(sl, row_ax, row_ring)
                src_row = jax.lax.rem(i_row - t - 1 + 2 * r, r)
                sl_id = jax.lax.rem(src_row + 1, r)
                buf2 = jax.lax.dynamic_update_slice(
                    buf2, sl[:, None, :], (0, sl_id, 0))
                return buf2, sl

            buf2, _ = jax.lax.fori_loop(0, r - 1, ag_step,
                                        (buf2, my_slice))
            new_full = buf2.reshape(W, Vs)   # frontier cand. of block q

            nxt = new_full & ~seen
            seen2 = seen | nxt
            bit = (nxt[word_of_lane, dst_local] & bit_of_lane) != 0
            hit_l = (dst_mine & bit & (i_row == 0)).astype(jnp.int32)
            hit = jax.lax.psum(jax.lax.psum(hit_l, col_ax), row_ax) > 0
            found = hit & (result < 0) & searching
            result = jnp.where(found, it, result)
            nxt = nxt & pack_lane_mask(result < 0)[:, None]
            any_l = (nxt != 0).any().astype(jnp.int32) * \
                (i_row == 0).astype(jnp.int32)
            alive = jax.lax.psum(jax.lax.psum(any_l, col_ax), row_ax) > 0
            return it + 1, nxt, seen2, result, alive

        it_end, _, seen, result, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(1), seed, seen, result,
                         jnp.bool_(True)))
        # per-iteration exchanged words (constant in this kernel); log
        # exactly the iterations that ran
        iters = jnp.arange(max_iters + 1)
        words = jnp.where((iters >= 1) & (iters < it_end),
                          jnp.int32(ITER_WORDS), 0)

        per_bit = []
        for b in range(32):
            bits = ((seen >> jnp.uint32(b)) &
                    jnp.uint32(1)).astype(jnp.float32)   # [W, Vs]
            per_bit.append(bits @ deg_l)                 # [W]
        mine = jnp.stack(per_bit, axis=1).reshape(L) * \
            (i_row == 0).astype(jnp.float32)
        traversed = jax.lax.psum(jax.lax.psum(mine, col_ax), row_ax)
        return result, traversed, words

    run_jit = jax.jit(bfs)

    def run(src, dst, active):
        return run_jit(in_src, in_dst, valid, deg_shard, src, dst, active)

    return run
