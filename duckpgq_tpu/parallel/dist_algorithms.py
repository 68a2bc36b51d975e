"""Distributed whole-graph algorithms over the vertex-partitioned CSR.

Net-new TPU-native components (the reference is single-node shared-memory,
SURVEY.md §2.7): each shard owns a contiguous vertex range and the in-edges
whose destination it owns (the same ``ShardedCSR`` the distributed BFS uses).
Per iteration each shard computes contributions for its owned destinations
from the replicated rank/label vector, then one ``all_gather`` over the mesh
axis rebuilds the replicated vector — collectives ride ICI, compute stays
sharded.

- PageRank: sharded segment-sum of edge contributions + psum'd dangling mass
  (same fixpoint as reference pagerank.cpp:31-78 over the real vertex range).
- WCC: min-label propagation with pointer jumping — same equivalence classes
  as the reference's union-find (weakly_connected_component.cpp), canonical
  label = min vertex id in the component.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from .dist_bfs import ShardedCSR


def _device_edges(mesh: Mesh, sharded: ShardedCSR, axis: str):
    put = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(axis, None)))
    return put(sharded.in_src), put(sharded.in_dst_local), \
        put(sharded.edge_valid)


def make_dist_pagerank(mesh: Mesh, sharded: ShardedCSR,
                       damping: float = 0.85, tol: float = 1e-6,
                       max_iters: int = 200):
    """Build the jitted distributed PageRank. Returns fn() -> rank [vcount]."""
    nx = sharded.n_shards
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    V = sharded.vcount
    axis = mesh.axis_names[0]
    in_src, in_dst, edge_valid = _device_edges(mesh, sharded, axis)

    # global out-degree (edges leave from anywhere; count by source)
    deg = np.zeros(Vtot, dtype=np.float32)
    np.add.at(deg, sharded.in_src.reshape(-1)[
        sharded.edge_valid.reshape(-1)], 1.0)
    deg_global = jnp.asarray(deg)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
        out_specs=P(),
        check_vma=False)
    def pr(in_src_blk, in_dst_blk, valid_blk, deg_g):
        in_src_l = in_src_blk[0]
        in_dst_l = in_dst_blk[0]
        valid_l = valid_blk[0]
        real = jnp.arange(Vtot) < V
        has_out = (deg_g > 0) & real
        n = jnp.float32(V)
        rank = jnp.where(real, 1.0 / n, 0.0)

        def cond(state):
            it, rank, delta = state
            return (delta >= tol) & (it < max_iters)

        def body(state):
            it, rank, _ = state
            contrib = jnp.where(has_out, rank / jnp.maximum(deg_g, 1.0), 0.0)
            gathered = jnp.where(valid_l, contrib[in_src_l], 0.0)
            acc_l = jax.ops.segment_sum(
                gathered, in_dst_l, num_segments=Vs,
                indices_are_sorted=True)                    # [Vs]
            acc = jax.lax.all_gather(acc_l, axis, axis=0, tiled=True)
            dangling = jnp.where(real & ~has_out, rank, 0.0).sum()
            new = jnp.where(real,
                            (1.0 - damping) / n +
                            damping * (acc + dangling / n), 0.0)
            delta = jnp.abs(new - rank).max()
            return it + 1, new, delta

        _, rank, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), rank, jnp.float32(jnp.inf)))
        return rank

    @jax.jit
    def run():
        return pr(in_src, in_dst, edge_valid, deg_global)[:V]

    return run


def make_dist_bellman_ford(mesh: Mesh, sharded: ShardedCSR,
                           weights: np.ndarray, lanes: int, max_iters: int):
    """Distributed multi-source Bellman-Ford: replicated dist [Vtot, L],
    sharded relaxation by owned destination, all_gather per round.
    ``weights`` must align with the sharded in-edge layout [nx, Es].
    Returns fn(src[L], dst[L], active[L]) -> costs float32 [L] (inf =
    unreached)."""
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    axis = mesh.axis_names[0]
    in_src, in_dst, edge_valid = _device_edges(mesh, sharded, axis)
    w_dev = jax.device_put(
        jnp.asarray(weights, jnp.float32), NamedSharding(mesh, P(axis, None)))
    INF = jnp.float32(jnp.inf)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    def bf(in_src_blk, in_dst_blk, valid_blk, w_blk, src, dst, active):
        in_src_l = in_src_blk[0]
        in_dst_l = in_dst_blk[0]
        valid_l = valid_blk[0]
        w_l = w_blk[0]
        L = src.shape[0]
        lanes_idx = jnp.arange(L)
        dist = jnp.full((Vtot, L), INF, dtype=jnp.float32)
        dist = dist.at[src, lanes_idx].set(jnp.where(active, 0.0, INF))

        def cond(state):
            it, dist, changed = state
            return changed & (it < max_iters)

        def body(state):
            it, dist, _ = state
            cand = jnp.where(valid_l[:, None],
                             dist[in_src_l] + w_l[:, None], INF)  # [Es, L]
            relaxed_l = jax.ops.segment_min(
                cand, in_dst_l, num_segments=Vs,
                indices_are_sorted=True)                          # [Vs, L]
            new = jnp.minimum(
                dist, jax.lax.all_gather(relaxed_l, axis, axis=0, tiled=True))
            changed = (new < dist).any()
            return it + 1, new, changed

        _, dist, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), dist, jnp.bool_(True)))
        return dist[dst, lanes_idx]

    @jax.jit
    def run(src, dst, active):
        return bf(in_src, in_dst, edge_valid, w_dev, src, dst, active)

    return run


def make_dist_wcc(mesh: Mesh, sharded: ShardedCSR, max_iters: int = 64):
    """Distributed WCC label propagation. Returns fn() -> labels [vcount]."""
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    V = sharded.vcount
    axis = mesh.axis_names[0]
    in_src, in_dst, edge_valid = _device_edges(mesh, sharded, axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(),
        check_vma=False)
    def wcc(in_src_blk, in_dst_blk, valid_blk):
        in_src_l = in_src_blk[0]
        in_dst_l = in_dst_blk[0]
        valid_l = valid_blk[0]
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * Vs
        labels = jnp.arange(Vtot, dtype=jnp.int32)
        BIG = jnp.int32(Vtot)

        def cond(state):
            it, labels, changed = state
            return changed & (it < max_iters)

        def body(state):
            it, labels, _ = state
            # pull min label over in-edges into owned destinations
            cand = jnp.where(valid_l, labels[in_src_l], BIG)
            pulled_l = jax.ops.segment_min(
                cand, in_dst_l, num_segments=Vs,
                indices_are_sorted=True)                     # [Vs]
            own = jax.lax.dynamic_slice_in_dim(labels, row0, Vs)
            new_l = jnp.minimum(own, pulled_l)
            new = jax.lax.all_gather(new_l, axis, axis=0, tiled=True)
            # push direction: each shard also lowers its sources' labels
            # via a second pulled pass on the transposed role — emulate by
            # scattering min(dst label) back to sources
            dst_label = jnp.where(
                valid_l, new[in_dst_l + row0], BIG)
            back_l = jax.ops.segment_min(
                dst_label, in_src_l, num_segments=Vtot)      # [Vtot]
            back = jax.lax.pmin(back_l, axis)
            new = jnp.minimum(new, back)
            # pointer jumping
            new = jnp.minimum(new, new[new])
            changed = (new < labels).any()
            return it + 1, new, changed

        _, labels, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), labels, jnp.bool_(True)))
        return labels

    @jax.jit
    def run():
        return wcc(in_src, in_dst, edge_valid)[:V]

    return run


def make_dist_lcc(mesh: Mesh, sharded: ShardedCSR):
    """Distributed local clustering coefficient (the one whole-graph kernel
    the reference ships — local_clustering_coefficient.cpp:11-72 — over the
    deduplicated undirected CSR).

    Each shard materializes the neighbor bitmap of its OWNED vertices only
    ([Vs, Vtot] — the distributed analog of the single-chip blocked kernel,
    block = shard), then streams every shard's edge block (one all_gather,
    processed block-by-block) counting wedge closures
    links[u] = sum_e B[u, src_e] * B[u, dst_e] as masked matmuls.
    lcc[u] = links / (d * (d - 1)); wedge counts are small integers so the
    float32 arithmetic matches the host kernel exactly.

    Returns fn() -> lcc float32 [vcount]."""
    nx = sharded.n_shards
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    V = sharded.vcount
    axis = mesh.axis_names[0]
    in_src, in_dst, edge_valid = _device_edges(mesh, sharded, axis)
    # global destination ids per shard edge (local + shard offset)
    dst_global = (sharded.in_dst_local +
                  (np.arange(nx, dtype=np.int32) * Vs)[:, None])
    dst_g = jax.device_put(jnp.asarray(dst_global),
                           NamedSharding(mesh, P(axis, None)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None)),
        out_specs=P(),
        check_vma=False)
    def lcc(in_src_blk, in_dst_blk, valid_blk, dstg_blk):
        src_l = in_src_blk[0]             # [Es] global source ids
        dst_l = in_dst_blk[0]             # [Es] local destination ids
        val_l = valid_blk[0]
        # neighbor bitmap of owned vertices (undirected CSR: in-neighbors
        # == out-neighbors); extra pad column absorbs pad sources
        B = jnp.zeros((Vs, Vtot + 1), jnp.float32)
        B = B.at[dst_l, jnp.where(val_l, src_l, Vtot)].max(1.0)
        deg_l = jax.ops.segment_sum(
            val_l.astype(jnp.float32), dst_l, num_segments=Vs,
            indices_are_sorted=True)                         # [Vs]
        all_src = jax.lax.all_gather(src_l, axis)            # [nx, Es]
        all_dst = jax.lax.all_gather(dstg_blk[0], axis)
        all_val = jax.lax.all_gather(val_l, axis)

        def step(k, acc):
            s = all_src[k]
            d = jnp.minimum(all_dst[k], Vtot)
            v = all_val[k].astype(jnp.float32)
            return acc + (B[:, s] * B[:, d]) @ v             # [Vs]

        links = jax.lax.fori_loop(0, nx, step, jnp.zeros(Vs, jnp.float32))
        denom = deg_l * (deg_l - 1.0)
        lcc_l = jnp.where(denom > 0, links / denom, 0.0).astype(jnp.float32)
        return jax.lax.all_gather(lcc_l, axis, axis=0, tiled=True)

    run_jit = jax.jit(lcc)

    def run():
        # results are in PARTITION space; sharded.unmap_values restores the
        # original vertex order (needed when balance relabeling is on)
        return run_jit(in_src, in_dst, edge_valid, dst_g)

    return run
