"""Multi-source BFS family — host (numpy) exact kernels.

Lane-packed frontier expansion over the CSR, vectorized across lanes as a
[V, L] boolean matrix (the dense analog of the reference's bitset<512> per
vertex, reference iterativelength.cpp:12-32). The JAX/TPU device variants in
duckpgq_tpu.ops.msbfs_jax implement the same algorithm with padded shapes;
unit tests cross-check both against these mirrors.

Semantics parity notes (reference iterativelength.cpp:34-143):
- src == dst  -> 0 without searching
- NULL src    -> NULL
- src vertex is NOT pre-marked seen (re-entrant walks allowed, matching the
  reference's lane setup)
- unreached   -> NULL
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .csr import CSR

LANE_LIMIT = 512  # reference duckpgq_utils.hpp:10



def _mesh_route(kernel: str, csr: CSR, src, dst, src_valid):
    """SQL -> distributed-mesh bridge: when a multi-device mesh is
    configured (SET pgq_mesh_devices = N / DUCKPGQ_MESH_DEVICES), the
    kernel runs on the vertex-partitioned distributed implementation
    (parallel/sql_mesh) instead of any single-device path. Returns None
    when mesh routing is off (or declines, e.g. f32-inexact weights)."""
    from ..parallel import sql_mesh
    if not sql_mesh.active_n():
        return None
    return getattr(sql_mesh, kernel)(csr, src, dst, src_valid)


def _expand(frontier: np.ndarray, seen: np.ndarray, rsrc, rdst) -> np.ndarray:
    """next = (A^T x frontier) & ~seen ; seen |= next. Returns next."""
    V, L = frontier.shape
    nxt = np.zeros_like(frontier)
    if len(rsrc):
        gathered = frontier[rsrc]          # [E, L]
        np.logical_or.at(nxt, rdst, gathered)
    nxt &= ~seen
    seen |= nxt
    return nxt


def iterative_length(csr: CSR, src: np.ndarray, dst: np.ndarray,
                     src_valid: Optional[np.ndarray] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Batched BFS lengths. Returns (lengths int64, validity bool).

    Dispatches to the native C++ runtime (native/graphrt.cpp) when built;
    the numpy path below is the exact mirror and fallback."""
    routed = _mesh_route("iterative_length", csr, src, dst, src_valid)
    if routed is not None:
        return routed
    n = len(src)
    V = csr.vcount
    out = np.full(n, -1, dtype=np.int64)
    validity = np.ones(n, dtype=bool)
    if src_valid is None:
        src_valid = np.ones(n, dtype=bool)

    import os

    # very large graphs route to the TPU packed kernel (SQL -> device
    # bridge); bucketed padding in csr_jax bounds recompiles
    device_min = int(os.environ.get("DUCKPGQ_DEVICE_MIN_EDGES", "2000000"))
    if csr.ecount >= device_min and n:
        from . import msbfs_jax
        from .csr_jax import from_host_csr
        sel = np.flatnonzero(src_valid)
        if len(sel):
            # wide waves: the frontier gather is index-bound, so 8x more
            # lanes costs ~2x per iteration (scripts/kernel_profile.py);
            # cap at 4096 (W=128 packed words) and shrink to the query
            # count so small batches keep small compiles
            lanes = 512
            while lanes < 4096 and lanes < len(sel):
                lanes *= 2
            lengths, _ = msbfs_jax.msbfs_lengths_batched(
                from_host_csr(csr), src[sel], dst[sel], lanes=lanes)
            out[sel] = lengths
            validity[sel] = lengths >= 0
        validity[~src_valid] = False
        return out, validity

    from .. import native_rt
    if native_rt.available() and n:
        sel = np.flatnonzero(src_valid)
        if len(sel):
            lengths = native_rt.msbfs_lengths(
                V, csr.v, csr.e, src[sel], dst[sel])
            out[sel] = lengths
            validity[sel] = lengths >= 0
        validity[~src_valid] = False
        return out, validity
    rsrc, rdst, _ = csr.reverse() if csr.ecount else \
        (np.empty(0, np.int64), np.empty(0, np.int64), None)

    validity &= src_valid
    trivial = src_valid & (src == dst)
    out[trivial] = 0
    pending = np.flatnonzero(src_valid & (src != dst))

    for batch_start in range(0, len(pending), LANE_LIMIT):
        lanes = pending[batch_start:batch_start + LANE_LIMIT]
        L = len(lanes)
        frontier = np.zeros((V, L), dtype=bool)
        seen = np.zeros((V, L), dtype=bool)
        frontier[src[lanes], np.arange(L)] = True
        active = np.ones(L, dtype=bool)
        it = 0
        while active.any():
            it += 1
            if it > V + 1:
                break
            frontier = _expand(frontier, seen, rsrc, rdst)
            if not frontier.any():
                break
            found = active & seen[dst[lanes], np.arange(L)]
            out[lanes[found]] = it
            active &= ~found
        validity[lanes[active]] = False
    validity[~src_valid] = False
    return out, validity


def reachability(csr: CSR, src: np.ndarray, dst: np.ndarray,
                 src_valid: Optional[np.ndarray] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    routed = _mesh_route("reachability", csr, src, dst, src_valid)
    if routed is not None:
        return routed
    lengths, validity = iterative_length(csr, src, dst, src_valid)
    reached = validity & (lengths >= 0)
    out_validity = np.ones(len(src), dtype=bool)
    if src_valid is not None:
        out_validity &= src_valid
    return reached, out_validity


def iterative_length_bidirectional(csr: CSR, src: np.ndarray, dst: np.ndarray,
                                   src_valid: Optional[np.ndarray] = None
                                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Bidirectional MS-BFS (reference iterativelength_bidirectional.cpp):
    alternates expanding the src-side and dst-side frontiers; length = total
    iterations when the frontiers' seen-sets intersect. Correct for
    symmetric (undirected) CSRs, like the reference.

    Early-exit parity (reference :119-128): the wave stops as soon as one
    alternation produces no new vertex in ANY lane; still-active lanes are
    NULL even when the other side could keep expanding (visible on
    directed CSRs where one endpoint has no out-edges)."""
    routed = _mesh_route("iterative_length_bidirectional", csr, src, dst,
                         src_valid)
    if routed is not None:
        return routed
    n = len(src)
    V = csr.vcount
    out = np.full(n, -1, dtype=np.int64)
    validity = np.ones(n, dtype=bool)
    if src_valid is None:
        src_valid = np.ones(n, dtype=bool)

    import os

    # same SQL -> device bridge as iterative_length: large CSRs route to
    # the packed bidirectional kernel (msbfs_jax.msbfs_lengths_bidirectional
    # — the alternating-side semantics of the reference, device-side)
    device_min = int(os.environ.get("DUCKPGQ_DEVICE_MIN_EDGES", "2000000"))
    if csr.ecount >= device_min and n:
        from . import msbfs_jax
        from .csr_jax import from_host_csr
        sel = np.flatnonzero(src_valid)
        if len(sel):
            lengths = msbfs_jax.msbfs_bidirectional_batched(
                from_host_csr(csr), src[sel], dst[sel])
            out[sel] = lengths
            validity[sel] = lengths >= 0
        validity[~src_valid] = False
        return out, validity

    rsrc, rdst, _ = csr.reverse() if csr.ecount else \
        (np.empty(0, np.int64), np.empty(0, np.int64), None)

    validity &= src_valid
    trivial = src_valid & (src == dst)
    out[trivial] = 0
    pending = np.flatnonzero(src_valid & (src != dst))

    for batch_start in range(0, len(pending), LANE_LIMIT):
        lanes = pending[batch_start:batch_start + LANE_LIMIT]
        L = len(lanes)
        ar = np.arange(L)
        f_src = np.zeros((V, L), dtype=bool)
        f_dst = np.zeros((V, L), dtype=bool)
        s_src = np.zeros((V, L), dtype=bool)
        s_dst = np.zeros((V, L), dtype=bool)
        f_src[src[lanes], ar] = True
        s_src[src[lanes], ar] = True
        f_dst[dst[lanes], ar] = True
        s_dst[dst[lanes], ar] = True
        active = np.ones(L, dtype=bool)
        for it in range(1, 2 * V + 2):
            if not active.any():
                break
            if it & 1:
                f_src = _expand(f_src, s_src, rsrc, rdst)
                changed = f_src.any()
            else:
                f_dst = _expand(f_dst, s_dst, rsrc, rdst)
                changed = f_dst.any()
            if not changed:
                # reference :119-128: one alternation with no new vertex in
                # any lane ends the whole wave; active lanes become NULL
                break
            meet = active & (s_src & s_dst).any(axis=0)
            out[lanes[meet]] = it
            active &= ~meet
        unfound = out[lanes] < 0
        validity[lanes[unfound]] = False
    validity[~src_valid] = False
    return out, validity


def shortest_path(csr: CSR, src: np.ndarray, dst: np.ndarray,
                  src_valid: Optional[np.ndarray] = None
                  ) -> Tuple[List[Optional[List[int]]], np.ndarray]:
    """Batched BFS with parent tracking and path reconstruction.

    Returns (paths, validity): each path is [v0, e0, v1, e1, ..., vk] of
    vertex/edge rowids. Parent tie-break reproduces the reference's
    deterministic choice (shortest_path.cpp:12-41): the in-edge with the
    lowest CSR position (lowest source vertex, then insertion order) wins.
    """
    routed = _mesh_route("shortest_path", csr, src, dst, src_valid)
    if routed is not None:
        return routed
    n = len(src)
    V = csr.vcount
    paths: List[Optional[List[int]]] = [None] * n
    validity = np.zeros(n, dtype=bool)
    if src_valid is None:
        src_valid = np.ones(n, dtype=bool)

    import os

    # SQL -> device bridge (same threshold as iterative_length): device
    # BFS with parent tracking (msbfs_jax.msbfs_parents preserves the
    # reference's lowest-CSR-position parent tie-break) + host backtrack
    device_min = int(os.environ.get("DUCKPGQ_DEVICE_MIN_EDGES", "2000000"))
    if csr.ecount >= device_min and n:
        from . import msbfs_jax
        from .csr_jax import from_host_csr
        sel = np.flatnonzero(src_valid)
        if len(sel):
            sel_paths, sel_valid = msbfs_jax.shortest_paths_device(
                from_host_csr(csr), src[sel], dst[sel])
            for k, q in enumerate(sel):
                paths[q] = sel_paths[k]
                validity[q] = bool(sel_valid[k])
        return paths, validity

    from .. import native_rt
    if native_rt.available() and n and V * 512 * 4 <= (1 << 30):
        sel = np.flatnonzero(src_valid)
        if len(sel):
            res = native_rt.msbfs_paths(
                V, csr.v, csr.e, csr.edge_ids, csr.src_of_edge,
                src[sel], dst[sel])
            if res is not None:
                _, sel_paths = res
                for k, q in enumerate(sel):
                    paths[q] = sel_paths[k]
                    validity[q] = sel_paths[k] is not None
                return paths, validity
    if csr.ecount:
        rsrc, rdst, rpos = csr.reverse()
    else:
        rsrc = rdst = rpos = np.empty(0, np.int64)
    INF = np.iinfo(np.int64).max

    for i in np.flatnonzero(src_valid & (src == dst)):
        paths[i] = [int(src[i])]
        validity[i] = True
    pending = np.flatnonzero(src_valid & (src != dst))

    for batch_start in range(0, len(pending), LANE_LIMIT):
        lanes = pending[batch_start:batch_start + LANE_LIMIT]
        L = len(lanes)
        ar = np.arange(L)
        frontier = np.zeros((V, L), dtype=bool)
        seen = np.zeros((V, L), dtype=bool)
        frontier[src[lanes], ar] = True
        parent_pos = np.full((V, L), -1, dtype=np.int64)
        active = np.ones(L, dtype=bool)
        it = 0
        while active.any():
            it += 1
            if it > V + 1:
                break
            # candidate parent positions for this wave
            nxt = np.zeros((V, L), dtype=bool)
            if len(rsrc):
                gathered = frontier[rsrc]                     # [E, L]
                np.logical_or.at(nxt, rdst, gathered)
                nxt &= ~seen
                if nxt.any():
                    cand = np.where(gathered, rpos[:, None], INF)
                    minpos = np.full((V, L), INF, dtype=np.int64)
                    np.minimum.at(minpos, rdst, cand)
                    newly = nxt & (parent_pos < 0)
                    parent_pos[newly] = minpos[newly]
            seen |= nxt
            frontier = nxt
            if not frontier.any():
                break
            found = active & seen[dst[lanes], ar]
            for l in np.flatnonzero(found):
                q = lanes[l]
                paths[q] = _reconstruct(csr, int(src[q]), int(dst[q]),
                                        parent_pos[:, l])
                validity[q] = paths[q] is not None
            active &= ~found
    return paths, validity


def _reconstruct(csr: CSR, s: int, d: int, parent_pos: np.ndarray
                 ) -> Optional[List[int]]:
    src_of_edge = csr.src_of_edge
    out: List[int] = [d]
    cur = d
    steps = 0
    while cur != s:
        pos = parent_pos[cur]
        if pos < 0 or steps > csr.vcount + 1:
            return None
        out.append(int(csr.edge_ids[pos]))
        cur = int(src_of_edge[pos])
        out.append(cur)
        steps += 1
    out.reverse()
    return out


def cheapest_path_length(csr: CSR, src: np.ndarray, dst: np.ndarray,
                         src_valid: Optional[np.ndarray] = None
                         ) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Batched multi-source Bellman-Ford over the weighted CSR (reference
    cheapest_path_length.cpp). Returns (costs, validity, is_double)."""
    routed = _mesh_route("cheapest_path_length", csr, src, dst, src_valid)
    if routed is not None:
        return routed
    n = len(src)
    V = csr.vcount
    is_double = csr.w_double is not None
    w = csr.w_double if is_double else csr.w
    if w is None:
        from ..errors import ConstraintException
        raise ConstraintException(
            "No weight column found in csr, did you include the weight "
            "column in the path-finding query?")
    if src_valid is None:
        src_valid = np.ones(n, dtype=bool)
    dtype = np.float64 if is_double else np.int64
    INF = np.inf if is_double else np.iinfo(np.int64).max // 2
    out = np.full(n, INF, dtype=dtype)
    validity = np.ones(n, dtype=bool)

    import os

    # SQL -> device bridge. DOUBLE weights run the device relaxation in
    # float64 under a scoped x64 context (the reference computes doubles
    # in double — f32 would drift in the low-order digits); integer
    # weights use the f32 kernel only inside its exact window (|cost| <
    # 2^24), larger integer domains stay on the exact host/native path.
    device_min = int(os.environ.get("DUCKPGQ_DEVICE_MIN_EDGES", "2000000"))
    if csr.ecount >= device_min and n:
        wa = np.asarray(w)
        f32_exact = (not is_double) and (len(wa) == 0 or
            float(np.abs(wa).max()) * max(V, 1) < float(2 ** 24))
        if is_double or f32_exact:
            import jax

            from . import msbfs_jax
            from .csr_jax import from_host_csr
            out = np.zeros(n, dtype=dtype)
            validity = np.zeros(n, dtype=bool)
            sel = np.flatnonzero(src_valid)
            if len(sel):
                if is_double:
                    with jax.enable_x64(True):
                        costs = msbfs_jax.bellman_ford_batched(
                            from_host_csr(csr, keep_w_dtype=True),
                            src[sel], dst[sel])
                else:
                    costs = msbfs_jax.bellman_ford_batched(
                        from_host_csr(csr), src[sel], dst[sel])
                reached = np.isfinite(costs)
                vals = costs if is_double else np.rint(costs)
                out[sel] = np.where(reached, vals, 0).astype(dtype)
                validity[sel] = reached
            return out, validity, is_double

    from .. import native_rt
    if native_rt.available() and n:
        sel = np.flatnonzero(src_valid)
        out = np.zeros(n, dtype=dtype)
        validity = np.zeros(n, dtype=bool)
        if len(sel):
            res = native_rt.bellman_ford(
                V, csr.v, csr.e,
                np.asarray(w, dtype=np.float64 if is_double else np.int64),
                src[sel], dst[sel])
            if res is not None:
                costs, reached = res
                out[sel] = np.where(reached, costs, 0)
                validity[sel] = reached
                return out, validity, is_double
        else:
            return out, validity, is_double
        out = np.full(n, INF, dtype=dtype)
        validity = np.ones(n, dtype=bool)
    if csr.ecount:
        rsrc, rdst, rpos = csr.reverse()
        rw = w[rpos]
    else:
        rsrc = rdst = np.empty(0, np.int64)
        rw = np.empty(0, dtype)

    pending = np.flatnonzero(src_valid)
    CHUNK = 256  # lane ladder upper bound (reference uses 256/.../1)
    for batch_start in range(0, len(pending), CHUNK):
        lanes = pending[batch_start:batch_start + CHUNK]
        L = len(lanes)
        ar = np.arange(L)
        dist = np.full((V, L), INF, dtype=dtype)
        dist[src[lanes], ar] = 0
        for _ in range(V + 1):
            if not len(rsrc):
                break
            cand = dist[rsrc] + rw[:, None]       # [E, L]
            new = dist.copy()
            np.minimum.at(new, rdst, cand)
            if np.array_equal(new, dist):
                break
            dist = new
        out[lanes] = dist[dst[lanes], ar]
    unreached = out >= INF if not is_double else ~np.isfinite(out)
    validity &= ~unreached
    validity &= src_valid
    out[~validity] = 0
    return out, validity, is_double


# ---------------------------------------------------------------------------
# Experimental path enumeration (capabilities BEYOND the reference, which
# raises NotImplemented for ALL SHORTEST / SHORTEST k / non-WALK path modes —
# match.cpp:80-108. Gated behind SET pgq_experimental = true.)
# Path modes: 0=WALK, 1=TRAIL (no repeated edge), 2=ACYCLIC (no repeated
# vertex), 3=SIMPLE (no repeated vertex except last may equal first).
# ---------------------------------------------------------------------------

MODE_WALK, MODE_TRAIL, MODE_ACYCLIC, MODE_SIMPLE = 0, 1, 2, 3
_ENUM_BUDGET = 1_000_000     # expansion cap for enumerative searches


def _in_adjacency(csr: CSR):
    """preds[v] = list of (u, csr_pos) over in-edges, csr_pos ascending
    (mirrors the reference's deterministic parent tie-break)."""
    rsrc, rdst, rpos = csr.reverse()
    order = np.lexsort((rpos, rdst))
    return rsrc[order], rdst[order], rpos[order]


def all_shortest_paths(csr: CSR, s: int, d: int) -> List[List[int]]:
    """Every shortest path s->d as [v0, e0, v1, ..., vk] rowid lists.
    Deterministic order: depth-first over predecessors sorted by CSR
    position, so the first path equals shortest_path()'s choice."""
    V = csr.vcount
    if s == d:
        return [[int(s)]]
    if not csr.ecount:
        return []
    # forward BFS levels
    INF = np.iinfo(np.int64).max // 2   # headroom for dist[u] + 1
    dist = np.full(V, INF, dtype=np.int64)
    dist[s] = 0
    frontier = [s]
    while frontier and dist[d] == INF:
        nxt = []
        for u in frontier:
            for v in csr.neighbors(u):
                if dist[v] == INF:
                    dist[v] = dist[u] + 1
                    nxt.append(int(v))
        frontier = nxt
    if dist[d] == INF:
        return []
    rsrc, rdst, rpos = _in_adjacency(csr)
    starts = np.searchsorted(rdst, np.arange(V), side="left")
    ends = np.searchsorted(rdst, np.arange(V), side="right")
    eids = csr.edge_ids

    paths: List[List[int]] = []
    # iterative DFS backward from d along (dist[u] + 1 == dist[v]) edges
    stack: List[Tuple[int, List[int]]] = [(d, [int(d)])]
    budget = _ENUM_BUDGET
    while stack:
        v, suffix = stack.pop()
        budget -= 1
        if budget <= 0:
            raise RuntimeError(
                "ALL SHORTEST enumeration exceeded the expansion budget")
        if v == s:
            paths.append(suffix[::-1])
            continue
        # reversed so the lowest-CSR-position predecessor pops first
        for j in range(int(ends[v]) - 1, int(starts[v]) - 1, -1):
            u = int(rsrc[j])
            if dist[u] + 1 == dist[v]:
                stack.append((u, suffix + [int(eids[rpos[j]]), u]))
    return paths


def k_shortest_walks(csr: CSR, s: int, d: int, k: int,
                     mode: int = MODE_WALK) -> List[List[int]]:
    """Up to k shortest s->d walks by hop count (nondecreasing length; ties
    in CSR neighbor order). ``mode`` restricts enumeration: TRAIL skips
    repeated edges, ACYCLIC repeated vertices, SIMPLE repeated vertices
    except a final return to the start."""
    if k <= 0:
        return []
    # FIFO expansion => paths discovered in nondecreasing length. Each item
    # is (vertex, parent_item, csr_pos); paths rebuilt via the parent chain.
    items: List[Tuple[int, int, int]] = [(s, -1, -1)]
    pops = np.zeros(csr.vcount, dtype=np.int64)
    out: List[List[int]] = []
    eids = csr.edge_ids
    src_of = csr.src_of_edge
    head = 0
    budget = _ENUM_BUDGET
    while head < len(items) and len(out) < k:
        v, parent, pos = items[head]
        cur = head
        head += 1
        budget -= 1
        if budget <= 0:
            raise RuntimeError(
                "SHORTEST k enumeration exceeded the expansion budget")
        if mode == MODE_WALK:
            if pops[v] >= k:
                continue
            pops[v] += 1
        if v == d:
            # rebuild [v0, e0, ..., vk]
            path: List[int] = [int(v)]
            it, p = parent, pos
            while it >= 0:
                path.append(int(eids[p]))
                path.append(int(items[it][0]))
                it, p = items[it][1], items[it][2]
            out.append(path[::-1])
            if len(out) >= k:
                break
        # expand
        for j in range(int(csr.v[v]), int(csr.v[v + 1])):
            w = int(csr.e[j])
            if mode != MODE_WALK:
                # walk the parent chain for repeat checks (paths are short)
                ok = True
                if mode == MODE_TRAIL:
                    it2 = cur
                    while it2 >= 0:
                        if items[it2][2] == j:
                            ok = False
                            break
                        it2 = items[it2][1]
                else:  # ACYCLIC / SIMPLE
                    it2 = cur
                    while it2 >= 0:
                        if items[it2][0] == w:
                            ok = mode == MODE_SIMPLE and w == s and w == d
                            break
                        it2 = items[it2][1]
                if not ok:
                    continue
            items.append((w, cur, j))
    return out


def path_mode_exists(csr: CSR, s: int, d: int, lower: int, upper: int,
                     mode: int) -> bool:
    """Does a path s->d with ``lower <= hops <= upper`` exist under the given
    path mode? Depth-limited DFS with per-path repeat constraints (used for
    non-SHORTEST quantified patterns with TRAIL/ACYCLIC/SIMPLE modes)."""
    if s == d and lower <= 0:
        return True
    V, E = csr.vcount, csr.ecount
    if mode in (MODE_ACYCLIC, MODE_SIMPLE):
        upper = min(upper, V)
    elif mode == MODE_TRAIL:
        upper = min(upper, E)
    budget = [_ENUM_BUDGET]
    on_vertex = np.zeros(V, dtype=bool)
    on_edge = np.zeros(E, dtype=bool)

    def dfs(v: int, depth: int) -> bool:
        budget[0] -= 1
        if budget[0] <= 0:
            raise RuntimeError(
                "path-mode search exceeded the expansion budget")
        if depth >= upper:
            return False
        for j in range(int(csr.v[v]), int(csr.v[v + 1])):
            w = int(csr.e[j])
            if mode == MODE_TRAIL and on_edge[j]:
                continue
            if mode in (MODE_ACYCLIC, MODE_SIMPLE) and on_vertex[w]:
                if not (mode == MODE_SIMPLE and w == s and w == d):
                    continue
            if w == d and depth + 1 >= lower:
                return True
            if mode == MODE_TRAIL:
                on_edge[j] = True
            else:
                on_vertex[w] = True
            hit = dfs(w, depth + 1)
            if mode == MODE_TRAIL:
                on_edge[j] = False
            else:
                on_vertex[w] = False
            if hit:
                return True
        return False

    on_vertex[s] = True
    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, upper + 100))
    try:
        return dfs(s, 0)
    finally:
        sys.setrecursionlimit(old)
