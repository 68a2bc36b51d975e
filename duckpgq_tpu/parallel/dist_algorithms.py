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

    run_jit = jax.jit(pr)

    def run():
        return run_jit(in_src, in_dst, edge_valid, deg_global)[:V]

    return run


def make_dist_bellman_ford(mesh: Mesh, sharded: ShardedCSR,
                           weights: np.ndarray, lanes: int, max_iters: int,
                           dtype=None):
    """Distributed multi-source Bellman-Ford: replicated dist [Vtot, L],
    sharded relaxation by owned destination, all_gather per round.
    ``weights`` must align with the sharded in-edge layout [nx, Es].
    ``dtype`` defaults to float32; pass jnp.float64 (under an enable_x64
    scope) for the SQL DOUBLE-weight path, which the reference computes in
    double. Returns fn(src[L], dst[L], active[L]) -> costs [L] (inf =
    unreached)."""
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    axis = mesh.axis_names[0]
    dtype = dtype or jnp.float32
    in_src, in_dst, edge_valid = _device_edges(mesh, sharded, axis)
    w_dev = jax.device_put(
        jnp.asarray(weights, dtype), NamedSharding(mesh, P(axis, None)))
    INF = jnp.asarray(jnp.inf, dtype)

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
        dist = jnp.full((Vtot, L), INF, dtype=dtype)
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

    run_jit = jax.jit(bf)

    def run(src, dst, active):
        return run_jit(in_src, in_dst, edge_valid, w_dev, src, dst, active)

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

    run_jit = jax.jit(wcc)

    def run():
        return run_jit(in_src, in_dst, edge_valid)[:V]

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


# ---------------------------------------------------------------------------
# reference-exact distributed variants (the SQL mesh bridge routes the corpus
# through these — results must be bit-compatible with the single-chip SQL
# kernels, reference pagerank.cpp / weakly_connected_component.cpp)
# ---------------------------------------------------------------------------

def make_dist_pagerank_reference(mesh: Mesh, sharded: ShardedCSR,
                                 vsize: int, damping: float = 0.85,
                                 tol: float = 1e-6, max_iters: int = 10000):
    """Distributed PageRank with the reference's exact semantics: float64
    power iteration over ``vsize = V + 2`` entries (the padded-vertex-array
    denominator quirk, reference pagerank.cpp:31-78). The two phantom
    vertices have no edges, so by symmetry they share one rank value,
    carried as a scalar in the loop state. Call (and run the returned fn)
    under ``jax.enable_x64(True)``.

    Returns fn() -> float64 [vsize] (phantom tail included)."""
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    V = sharded.vcount
    P_phantom = vsize - V
    axis = mesh.axis_names[0]
    in_src, in_dst, edge_valid = _device_edges(mesh, sharded, axis)

    deg = np.zeros(Vtot, dtype=np.float64)
    np.add.at(deg, sharded.in_src.reshape(-1)[
        sharded.edge_valid.reshape(-1)], 1.0)
    deg_global = jnp.asarray(deg, jnp.float64)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def pr(in_src_blk, in_dst_blk, valid_blk, deg_g):
        in_src_l = in_src_blk[0]
        in_dst_l = in_dst_blk[0]
        valid_l = valid_blk[0]
        real = jnp.arange(Vtot) < V
        has_out = (deg_g > 0) & real
        n = jnp.float64(vsize)
        d = jnp.float64(damping)
        rank = jnp.where(real, 1.0 / n, 0.0)
        phantom = jnp.float64(1.0 / n)

        def cond(state):
            it, rank, phantom, delta = state
            return (delta >= tol) & (it < max_iters)

        def body(state):
            it, rank, phantom, _ = state
            contrib = jnp.where(has_out, rank / jnp.maximum(deg_g, 1.0),
                                0.0)
            gathered = jnp.where(valid_l, contrib[in_src_l], 0.0)
            acc_l = jax.ops.segment_sum(
                gathered, in_dst_l, num_segments=Vs,
                indices_are_sorted=True)
            acc = jax.lax.all_gather(acc_l, axis, axis=0, tiled=True)
            dangling = jnp.where(real & ~has_out, rank, 0.0).sum() \
                + P_phantom * phantom
            base = (1.0 - d) / n + d * dangling / n
            new = jnp.where(real, base + d * acc, 0.0)
            new_phantom = base
            delta = jnp.maximum(
                jnp.where(real, jnp.abs(new - rank), 0.0).max(),
                jnp.abs(new_phantom - phantom))
            return it + 1, new, new_phantom, delta

        _, rank, phantom, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), rank, phantom, jnp.float64(jnp.inf)))
        return rank, phantom

    def run():
        rank, phantom = jax.jit(pr)(in_src, in_dst, edge_valid, deg_global)
        out = np.empty(vsize, dtype=np.float64)
        out[:V] = sharded.unmap_values(np.asarray(rank))[:V]
        out[V:] = float(phantom)
        return out

    return run


def make_dist_wcc_msf(mesh: Mesh, sharded: ShardedCSR):
    """Distributed Boruvka minimum-spanning-forest with edge weight = the
    ORIGINAL CSR position (``sharded.in_pos``; all distinct). The MSF under
    those weights is exactly the edge set on which the reference's
    sequential union-find performs a successful Link() scanning positions
    ascending (Kruskal = Boruvka on distinct weights — the same argument as
    the single-chip wcc_msf_device). Host-replaying those <= V-1 links in
    ascending position order reproduces the reference's order-dependent
    component roots bit-for-bit (weakly_connected_component.cpp:14-34).

    Labels are replicated [Vtot]; per-class minima are computed shard-local
    (segment_min over in-edges by class) and combined with one pmin per
    round. Returns fn() -> bool [ecount] chosen-position mask."""
    Vs = sharded.v_shard
    Vtot = sharded.v_padded
    axis = mesh.axis_names[0]
    in_src, in_dst, edge_valid = _device_edges(mesh, sharded, axis)
    assert sharded.in_pos is not None, "partition_csr now carries in_pos"
    BIGP = np.iinfo(np.int32).max
    pos_np = np.where(sharded.edge_valid, sharded.in_pos, BIGP) \
        .astype(np.int32)
    pos_dev = jax.device_put(jnp.asarray(pos_np),
                             NamedSharding(mesh, P(axis, None)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False)
    def msf(in_src_blk, in_dst_blk, valid_blk, pos_blk):
        src_l = in_src_blk[0]                  # [Es] global (partition) src
        dst_ll = in_dst_blk[0]                 # [Es] local dst
        valid_l = valid_blk[0]
        pos_l = pos_blk[0]                     # [Es] int32, BIGP pad
        shard_id = jax.lax.axis_index(axis)
        dst_l = dst_ll + shard_id * Vs         # global dst ids
        classes = jnp.arange(Vtot, dtype=jnp.int32)
        BIGK = jnp.int32(Vtot)
        safe_u = jnp.minimum(src_l, Vtot - 1)

        def cond(state):
            it, labels, msf_mask, changed = state
            return changed & (it < 64)

        def body(state):
            it, labels, msf_mask, _ = state
            lu = jnp.where(valid_l, labels[safe_u], BIGK)
            lv = jnp.where(valid_l, labels[dst_l], BIGK)
            cross = valid_l & (lu != lv)
            cpos = jnp.where(cross, pos_l, BIGP)
            lu_c = jnp.minimum(lu, Vtot - 1)
            lv_c = jnp.minimum(lv, Vtot - 1)
            m1 = jax.ops.segment_min(cpos, lu_c, num_segments=Vtot)
            m2 = jax.ops.segment_min(cpos, lv_c, num_segments=Vtot)
            choice = jax.lax.pmin(jnp.minimum(m1, m2), axis)   # [Vtot]
            chosen = cross & ((choice[lu_c] == pos_l) |
                              (choice[lv_c] == pos_l))
            msf_mask = msf_mask | chosen
            # hook each choosing class onto the other endpoint's class of
            # its chosen (unique) edge
            h1 = jax.ops.segment_min(
                jnp.where(cross & (choice[lu_c] == pos_l), lv, BIGK),
                lu_c, num_segments=Vtot)
            h2 = jax.ops.segment_min(
                jnp.where(cross & (choice[lv_c] == pos_l), lu, BIGK),
                lv_c, num_segments=Vtot)
            hook = jax.lax.pmin(jnp.minimum(h1, h2), axis)
            parent = jnp.where(hook < BIGK, hook, classes)
            # Boruvka hooking cycles are only 2-cycles (distinct weights);
            # keep the smaller label as the root
            pp = parent[jnp.minimum(parent, Vtot - 1)]
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
            new_labels = parent[labels]
            return (it + 1, new_labels, msf_mask,
                    (new_labels != labels).any())

        _, _, msf_mask, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.arange(Vtot, dtype=jnp.int32),
             jnp.zeros(valid_l.shape, jnp.bool_), jnp.bool_(True)))
        return msf_mask[None, :]

    def run():
        mask = np.asarray(jax.jit(msf)(in_src, in_dst, edge_valid, pos_dev))
        out = np.zeros(sharded.ecount, dtype=bool)
        sel = sharded.in_pos >= 0
        out[sharded.in_pos[sel]] = mask[sel]
        return out

    return run
