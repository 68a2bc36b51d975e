"""SQL → distributed-mesh kernel bridge (BASELINE configs 4-5 from SQL).

When a multi-device mesh is configured, the SQL kernel surface
(pgq/kernels_sql → ops/msbfs, ops/algorithms) routes every graph kernel
through the vertex-partitioned distributed implementations in
parallel/dist_bfs and parallel/dist_algorithms, so "distributed frontier
exchange" is reachable from a plain ``GRAPH_TABLE`` query — the analog of
the reference's whole scalar surface being reachable from every query
(reference src/include/duckpgq/core/functions/scalar.hpp:7-20), lifted to
the mesh.

Activation (checked per kernel call):
  1. ``SET pgq_mesh_devices = N`` — the executor's SET handler calls
     :func:`configure` (process-wide, like the reference's global
     parser-override setting, duckpgq_extension.cpp:12-19);
  2. env ``DUCKPGQ_MESH_DEVICES=N``.
``N <= 1`` (or unset) deactivates and kernels use the single-device paths.

Every routed kernel is bit-compatible with its single-device SQL
counterpart (the corpus runs identically in mesh mode — tests/
test_sqllogic_corpus.py mesh parameterization):

- iterativelength(+2) / reachability → the PARTITIONED-frontier ring BFS
  (make_dist_bfs_partitioned, per-shard O(V/N) memory) with hub-balanced
  relabeling (lengths are label-invariant).
- shortestpath → distributed parent BFS (min-source-id tie-break ==
  the reference's lowest-CSR-position rule on unrelabeled ids) + host
  edge-id stitching.
- iterativelengthbidirectional → host-alternated distributed expansion
  steps (the reference's side-interleaved early-exit semantics are
  iteration-level, so the alternation loop stays on host).
- cheapest_path_length → distributed Bellman-Ford (float64 under scoped
  x64 for DOUBLE weights; integer weights inside the f32-exact window).
- pagerank → make_dist_pagerank_reference (float64, vsize = V+2 quirk).
- weakly_connected_component → distributed Boruvka MSF on position
  weights + host replay of the <= V-1 links (exact order-dependent ids).
- local_clustering_coefficient → make_dist_lcc (float32 wedge counts are
  exact integers).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

_override_n: Optional[int] = None
_mesh_cache = {}


def configure(n: Optional[int]):
    """Set (or clear with None/<=1) the mesh width for SQL kernel routing.
    Raises a clean engine error when fewer devices are visible — a
    too-wide mesh would otherwise surface as cryptic jax shape errors
    deep inside the first routed kernel."""
    global _override_n
    if n is not None and int(n) > 1:
        import jax
        avail = len(jax.devices())
        if int(n) > avail:
            from ..errors import BinderException
            raise BinderException(
                f"pgq_mesh_devices = {int(n)} but only {avail} device"
                f"{'s' if avail != 1 else ''} are visible (on CPU, set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"before the first jax use)")
    _override_n = int(n) if n is not None else None


def active_n() -> int:
    if _override_n is not None:
        return _override_n if _override_n > 1 else 0
    try:
        n = int(os.environ.get("DUCKPGQ_MESH_DEVICES", "0"))
    except ValueError:
        n = 0
    return n if n > 1 else 0


def mesh():
    """The active Mesh, or None when mesh routing is off."""
    n = active_n()
    if not n:
        return None
    m = _mesh_cache.get(n)
    if m is None:
        from .mesh import make_mesh
        m = _mesh_cache[n] = make_mesh(n)
    return m


# ---------------------------------------------------------------------------
# per-CSR partition/kernel caches (CSRs are per-query and GC'd at query end,
# so caching on the object is the natural lifetime)
# ---------------------------------------------------------------------------

def _cache(csr) -> dict:
    c = getattr(csr, "_mesh_cache", None)
    if c is None:
        c = csr._mesh_cache = {}
    return c


def _edges(csr):
    if csr.ecount:
        return (np.asarray(csr.src_of_edge[:csr.ecount], np.int64),
                np.asarray(csr.e[:csr.ecount], np.int64))
    return (np.empty(0, np.int64), np.empty(0, np.int64))


def _grouped(csr, n):
    key = ("grouped", n)
    c = _cache(csr)
    if key not in c:
        from .dist_bfs import partition_csr_grouped
        src, dst = _edges(csr)
        c[key] = partition_csr_grouped(csr.vcount, src, dst, n,
                                       balance=True)
    return c[key]


def _sharded(csr, n):
    """Unbalanced (identity-labeled) shard partition — used by every kernel
    whose output depends on vertex identity (parents, ranks, roots)."""
    key = ("sharded", n)
    c = _cache(csr)
    if key not in c:
        from .dist_bfs import partition_csr
        src, dst = _edges(csr)
        c[key] = partition_csr(csr.vcount, src, dst, n, balance=False)
    return c[key]


def _lane_width(count: int) -> int:
    lanes = 32
    while lanes < 512 and lanes < count:
        lanes *= 2
    return lanes


# ---------------------------------------------------------------------------
# path kernels
# ---------------------------------------------------------------------------

def iterative_length(csr, src, dst, src_valid):
    """Distributed BFS lengths via the partitioned-frontier ring kernel.
    Same return contract as ops.msbfs.iterative_length."""
    m = mesh()
    if m is None:
        return None
    import jax.numpy as jnp
    from .dist_bfs import make_dist_bfs_partitioned
    n = len(src)
    out = np.full(n, -1, dtype=np.int64)
    validity = np.ones(n, dtype=bool)
    if src_valid is None:
        src_valid = np.ones(n, dtype=bool)
    sel = np.flatnonzero(src_valid)
    if len(sel):
        grouped = _grouped(csr, active_n())
        lanes = _lane_width(len(sel))
        key = ("bfs_part", active_n(), lanes)
        c = _cache(csr)
        fn = c.get(key)
        if fn is None:
            fn = c[key] = make_dist_bfs_partitioned(
                m, grouped, lanes, max(csr.vcount + 1, 2))
        qs = grouped.map_queries(src[sel]).astype(np.int32)
        qd = grouped.map_queries(dst[sel]).astype(np.int32)
        for start in range(0, len(sel), lanes):
            mcount = min(lanes, len(sel) - start)
            s = np.zeros(lanes, dtype=np.int32)
            d = np.zeros(lanes, dtype=np.int32)
            a = np.zeros(lanes, dtype=bool)
            s[:mcount] = qs[start:start + mcount]
            d[:mcount] = qd[start:start + mcount]
            a[:mcount] = True
            res, _ = fn(jnp.asarray(s), jnp.asarray(d), jnp.asarray(a))
            res = np.asarray(res)[:mcount]
            idx = sel[start:start + mcount]
            out[idx] = res
            validity[idx] = res >= 0
    validity[~src_valid] = False
    return out, validity


def shortest_path(csr, src, dst, src_valid):
    """Distributed BFS parents + host backtrack and edge-id stitching.
    Same return contract as ops.msbfs.shortest_path ([v0,e0,v1,...])."""
    m = mesh()
    if m is None:
        return None
    from .dist_bfs import dist_shortest_paths
    n = len(src)
    paths = [None] * n
    validity = np.zeros(n, dtype=bool)
    if src_valid is None:
        src_valid = np.ones(n, dtype=bool)
    sel = np.flatnonzero(src_valid)
    if len(sel):
        sharded = _sharded(csr, active_n())
        lanes = _lane_width(len(sel))
        chains, ok = dist_shortest_paths(m, sharded, src[sel], dst[sel],
                                         lanes=lanes, fn_cache=_cache(csr))
        v, e, eids = csr.v, csr.e, csr.edge_ids
        for k, q in enumerate(sel):
            if not ok[k] or chains[k] is None:
                continue
            chain = chains[k]
            # stitch edge ids: the parent edge u->v is the FIRST u->v slot
            # in CSR order (reference shortest_path.cpp:27-30 first-touch ==
            # lowest CSR position; the distributed parent picks min source
            # id, which owns the lowest positions in the src-sorted CSR)
            full = [int(chain[0])]
            good = True
            for u, vtx in zip(chain, chain[1:]):
                lo, hi = int(v[u]), int(v[u + 1])
                hits = np.flatnonzero(e[lo:hi] == vtx)
                if not len(hits):
                    good = False
                    break
                full.append(int(eids[lo + hits[0]]))
                full.append(int(vtx))
            if good:
                paths[q] = full
                validity[q] = True
    return paths, validity


def reachability(csr, src, dst, src_valid):
    res = iterative_length(csr, src, dst, src_valid)
    if res is None:
        return None
    lengths, validity = res
    reached = validity & (lengths >= 0)
    out_validity = np.ones(len(src), dtype=bool)
    if src_valid is not None:
        out_validity &= src_valid
    return reached, out_validity


def _expand_step(m, sharded):
    """One distributed expansion iteration over a replicated frontier:
    step(frontier[Vtot, L], seen[Vtot, L]) -> (next, seen | next)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    Vs = sharded.v_shard
    axis = m.axis_names[0]
    put = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(m, P(axis, None)))
    in_src = put(sharded.in_src)
    in_dst = put(sharded.in_dst_local)
    valid = put(sharded.edge_valid)

    @functools.partial(
        shard_map, mesh=m,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def step(src_blk, dst_blk, val_blk, frontier, seen):
        src_l = src_blk[0]
        dst_l = dst_blk[0]
        val_l = val_blk[0]
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * Vs
        gathered = jnp.where(
            val_l[:, None],
            frontier.at[src_l].get(mode="fill", fill_value=False), False)
        nxt_l = jax.ops.segment_max(
            gathered.astype(jnp.int8), dst_l, num_segments=Vs,
            indices_are_sorted=True) > 0
        seen_own = jax.lax.dynamic_slice_in_dim(seen, row0, Vs, axis=0)
        nxt_l = nxt_l & ~seen_own
        nxt = jax.lax.all_gather(nxt_l, axis, axis=0, tiled=True)
        return nxt, seen | nxt

    jstep = jax.jit(step)
    return lambda f, s: jstep(in_src, in_dst, valid, f, s)


def iterative_length_bidirectional(csr, src, dst, src_valid):
    """Reference iterativelength_bidirectional.cpp semantics over the mesh:
    src-side and dst-side frontiers expand alternately over the SAME edge
    set via distributed expansion steps; the wave ends when one alternation
    adds no vertex in any lane (host mirror ops/msbfs.py)."""
    m = mesh()
    if m is None:
        return None
    import jax.numpy as jnp
    n = len(src)
    V = csr.vcount
    out = np.full(n, -1, dtype=np.int64)
    validity = np.ones(n, dtype=bool)
    if src_valid is None:
        src_valid = np.ones(n, dtype=bool)
    validity &= src_valid
    trivial = src_valid & (src == dst)
    out[trivial] = 0
    pending = np.flatnonzero(src_valid & (src != dst))
    if len(pending):
        sharded = _sharded(csr, active_n())
        Vtot = sharded.v_padded
        step = _expand_step(m, sharded)
        lanes = _lane_width(len(pending))
        for bs in range(0, len(pending), lanes):
            sel = pending[bs:bs + lanes]
            L = len(sel)
            ar = np.arange(L)
            f_src = np.zeros((Vtot, L), dtype=bool)
            f_dst = np.zeros((Vtot, L), dtype=bool)
            f_src[src[sel], ar] = True
            f_dst[dst[sel], ar] = True
            s_src = jnp.asarray(f_src)
            s_dst = jnp.asarray(f_dst)
            f_src = jnp.asarray(f_src)
            f_dst = jnp.asarray(f_dst)
            active = np.ones(L, dtype=bool)
            for it in range(1, 2 * V + 2):
                if not active.any():
                    break
                if it & 1:
                    f_src, s_src = step(f_src, s_src)
                    changed = bool(np.asarray(f_src.any()))
                else:
                    f_dst, s_dst = step(f_dst, s_dst)
                    changed = bool(np.asarray(f_dst.any()))
                if not changed:
                    break  # reference :119-128 whole-wave early exit
                meet = active & np.asarray((s_src & s_dst).any(axis=0))
                out[sel[meet]] = it
                active &= ~meet
            validity[sel[out[sel] < 0]] = False
    validity[~src_valid] = False
    return out, validity


def cheapest_path_length(csr, src, dst, src_valid):
    """Distributed Bellman-Ford with the single-device exactness policy:
    DOUBLE weights in float64 under scoped x64, integer weights only inside
    the f32-exact window (else fall through to the exact host path)."""
    m = mesh()
    if m is None:
        return None
    import jax
    import jax.numpy as jnp
    from .dist_algorithms import make_dist_bellman_ford
    is_double = csr.w_double is not None
    w = csr.w_double if is_double else csr.w
    if w is None:
        return None  # kernels_sql raises the reference error upstream
    wa = np.asarray(w)
    if not is_double:
        f32_exact = len(wa) == 0 or \
            float(np.abs(wa).max()) * max(csr.vcount, 1) < float(2 ** 24)
        if not f32_exact:
            return None
    n = len(src)
    dtype = np.float64 if is_double else np.int64
    out = np.zeros(n, dtype=dtype)
    validity = np.zeros(n, dtype=bool)
    if src_valid is None:
        src_valid = np.ones(n, dtype=bool)
    sel = np.flatnonzero(src_valid)
    if len(sel):
        sharded = _sharded(csr, active_n())
        w_shard = np.where(
            sharded.edge_valid, wa[np.maximum(sharded.in_pos, 0)], 0)
        lanes = _lane_width(len(sel))
        max_iters = max(csr.vcount + 1, 2)

        def run_all(fn):
            costs = np.empty(len(sel), dtype=np.float64)
            for start in range(0, len(sel), lanes):
                mc = min(lanes, len(sel) - start)
                s = np.zeros(lanes, dtype=np.int32)
                d = np.zeros(lanes, dtype=np.int32)
                a = np.zeros(lanes, dtype=bool)
                s[:mc] = src[sel[start:start + mc]]
                d[:mc] = dst[sel[start:start + mc]]
                a[:mc] = True
                res = np.asarray(fn(jnp.asarray(s), jnp.asarray(d),
                                    jnp.asarray(a)))
                costs[start:start + mc] = res[:mc]
            return costs

        if is_double:
            with jax.enable_x64(True):
                fn = make_dist_bellman_ford(m, sharded, w_shard, lanes,
                                            max_iters, dtype=jnp.float64)
                costs = run_all(fn)
        else:
            fn = make_dist_bellman_ford(m, sharded, w_shard, lanes,
                                        max_iters)
            costs = run_all(fn)
        reached = np.isfinite(costs)
        vals = costs if is_double else np.rint(costs)
        out[sel] = np.where(reached, vals, 0).astype(dtype)
        validity[sel] = reached
    return out, validity, is_double


# ---------------------------------------------------------------------------
# whole-graph algorithms
# ---------------------------------------------------------------------------

def pagerank(csr, damping: float = 0.85, threshold: float = 1e-6):
    m = mesh()
    if m is None:
        return None
    import jax
    from .dist_algorithms import make_dist_pagerank_reference
    sharded = _sharded(csr, active_n())
    with jax.enable_x64(True):
        fn = make_dist_pagerank_reference(m, sharded, csr.vsize,
                                          damping, threshold)
        return fn()


def weakly_connected_component(csr):
    m = mesh()
    if m is None:
        return None
    from ..ops.algorithms import _replay_forest_links
    from .dist_algorithms import make_dist_wcc_msf
    sharded = _sharded(csr, active_n())
    mask = make_dist_wcc_msf(m, sharded)()
    return _replay_forest_links(csr, np.flatnonzero(mask))


def local_clustering_coefficient(csr):
    m = mesh()
    if m is None:
        return None
    from .dist_algorithms import make_dist_lcc
    sharded = _sharded(csr, active_n())
    fn = make_dist_lcc(m, sharded)
    return np.asarray(fn())[:csr.vcount].astype(np.float32)
