"""SQL-facing graph kernel scalar functions (the reference's L6 layer,
src/core/functions/scalar/): CSR build protocol + path kernels + algorithm
lookups, operating on the per-connection CSR side-channel.

Unlike the reference (2048-row chunked scalar calls), these receive whole
columns, so each SQL invocation is one batched kernel launch.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..errors import ConstraintException, InvalidInputException
from ..functions.scalar import REGISTRY, ScalarFunction
from ..ops import algorithms as algs
from ..ops import msbfs
from ..ops.csr import CSR, build_csr
from ..storage.vector import Vector
from ..types import (BIGINT, BOOLEAN, DOUBLE, FLOAT, INTEGER, LIST, TypeId)


def _csr_id(args: List[Vector]) -> int:
    if len(args[0]) == 0:
        return 0
    return int(args[0].data[0])


def _get_csr_path(ctx, csr_id: int) -> CSR:
    """Path kernels require only the vertex side (reference
    iterativelength.cpp:44-54 — an edgeless CSR is valid and yields only
    src==dst hits, exercised by kleene_star.test on an empty edge table)."""
    csr = ctx.csr_list.get(csr_id)
    if csr is None or not csr.initialized_v:
        raise ConstraintException(
            "Need to initialize CSR before doing shortest path")
    return csr


def _get_csr_algo(ctx, csr_id: int, for_what: str) -> CSR:
    """Whole-graph algorithms require vertex and edge init (reference
    pagerank.cpp:18-26, weakly_connected_component.cpp:42-48)."""
    csr = ctx.csr_list.get(csr_id)
    if csr is None:
        raise ConstraintException("CSR not found. Is the graph populated?")
    if not (csr.initialized_v and csr.initialized_e):
        raise ConstraintException(
            f"Need to initialize CSR before {for_what}")
    return csr


def _register(name: str, fn):
    REGISTRY[name] = ScalarFunction(name, fn, needs_ctx=True)


# ---------------------------------------------------------------------------
# CSR creation protocol (reference csr_creation.cpp)
# ---------------------------------------------------------------------------

def fn_create_csr_vertex(args: List[Vector], ctx) -> Vector:
    """create_csr_vertex(id, vcount, dense_id, cnt) -> cnt (outer sum = E).

    Initializes the CSR's vertex side immediately (reference
    csr_creation.cpp:14-41): an edge phase over zero rows leaves a valid
    edgeless CSR behind."""
    n = len(args[0])
    if n == 0:
        return Vector.empty(BIGINT)
    csr_id = _csr_id(args)
    vcount = int(args[1].data[0])
    valid = args[2].validity
    counts = np.where(args[3].validity, args[3].data, 0)
    csr = CSR()
    csr.vcount = vcount
    deg = np.zeros(vcount, dtype=np.int64)
    ids = args[2].data[valid].astype(np.int64)
    deg[ids] = counts[valid].astype(np.int64)
    csr.v = np.zeros(vcount + 1, dtype=np.int64)
    np.cumsum(deg, out=csr.v[1:])
    csr.e = np.empty(0, dtype=np.int64)
    csr.edge_ids = np.empty(0, dtype=np.int64)
    csr.initialized_v = True
    ctx.csr_list[csr_id] = csr
    out = np.where(args[3].validity, args[3].data, 0).astype(np.int64)
    return Vector(BIGINT, out, np.ones(n, dtype=bool))


def fn_create_csr_edge(args: List[Vector], ctx) -> Vector:
    """create_csr_edge(id, vcount, vertexsum, ecount, src, dst, edge[, w])."""
    n = len(args[0])
    if n == 0:
        return Vector.empty(INTEGER)
    csr_id = _csr_id(args)
    vcount = int(args[1].data[0])
    vertexsum = int(args[2].data[0]) if args[2].validity[0] else 0
    ecount = int(args[3].data[0])
    src = args[4].data.astype(np.int64)
    dst = args[5].data.astype(np.int64)
    edge_ids = args[6].data.astype(np.int64)
    w = None
    w_is_double = False
    if len(args) > 7:
        w_vec = args[7]
        w_is_double = w_vec.type.id in (TypeId.DOUBLE, TypeId.FLOAT,
                                        TypeId.DECIMAL)
        w = w_vec.data
    if int(vertexsum) != int(ecount):
        # reference flags the CSR for deletion and raises
        # (csr_creation.cpp:120-125)
        ctx.csr_list.pop(csr_id, None)
        raise ConstraintException(
            "Non-existent/non-unique vertices detected. Make sure all "
            "vertices referred by edge tables exist and are unique for "
            "path-finding queries.")
    if (src >= vcount).any() or (src < 0).any() or (dst >= vcount).any() \
            or (dst < 0).any():
        ctx.csr_list.pop(csr_id, None)
        raise ConstraintException(
            "Non-existent/non-unique vertices detected. Make sure all "
            "vertices referred by edge tables exist and are unique for "
            "path-finding queries.")
    csr = build_csr(vcount, src, dst, edge_ids, w, w_is_double)
    ctx.csr_list[csr_id] = csr
    return Vector(INTEGER, np.ones(n, dtype=np.int32))


def fn_delete_csr(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    out = np.zeros(n, dtype=bool)
    for i in range(n):
        csr_id = int(args[0].data[i])
        existed = csr_id in ctx.csr_list
        ctx.csr_list.pop(csr_id, None)
        out[i] = existed
    return Vector(BOOLEAN, out)


def fn_csr_get_w_type(args: List[Vector], ctx) -> Vector:
    """0 = unweighted, 1 = int64 weights, 2 = double weights (reference
    csr_get_w_type.cpp CSRWType enum order)."""
    n = len(args[0])
    if n == 0:
        return Vector.empty(INTEGER)
    csr_id = _csr_id(args)
    csr = _get_csr_algo(ctx, csr_id, "getting the weight type")
    if csr.w_double is not None:
        flag = 2
    elif csr.w is not None:
        flag = 1
    else:
        flag = 0
    ctx.csr_to_delete.add(csr_id)
    return Vector(INTEGER, np.full(n, flag, dtype=np.int32))


# ---------------------------------------------------------------------------
# path kernels
# ---------------------------------------------------------------------------

def _src_dst(args: List[Vector], src_idx: int, dst_idx: int):
    src = args[src_idx].data.astype(np.int64)
    dst = args[dst_idx].data.astype(np.int64)
    return src, dst, args[src_idx].validity & args[dst_idx].validity


def fn_iterativelength(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    if n == 0:
        return Vector.empty(BIGINT)
    csr_id = _csr_id(args)
    csr = _get_csr_path(ctx, csr_id)
    src, dst, valid = _src_dst(args, 2, 3)
    lengths, validity = msbfs.iterative_length(csr, src, dst, valid)
    ctx.csr_to_delete.add(csr_id)
    return Vector(BIGINT, lengths, validity)


def fn_iterativelength2(args: List[Vector], ctx) -> Vector:
    # experimental variant in the reference; same observable results
    return fn_iterativelength(args, ctx)


def fn_iterativelength_bidirectional(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    if n == 0:
        return Vector.empty(BIGINT)
    csr_id = _csr_id(args)
    csr = _get_csr_path(ctx, csr_id)
    src, dst, valid = _src_dst(args, 2, 3)
    lengths, validity = msbfs.iterative_length_bidirectional(
        csr, src, dst, valid)
    ctx.csr_to_delete.add(csr_id)
    return Vector(BIGINT, lengths, validity)


def fn_shortestpath(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    if n == 0:
        return Vector.empty(LIST(BIGINT))
    csr_id = _csr_id(args)
    csr = _get_csr_path(ctx, csr_id)
    src, dst, valid = _src_dst(args, 2, 3)
    paths, validity = msbfs.shortest_path(csr, src, dst, valid)
    ctx.csr_to_delete.add(csr_id)
    data = np.empty(n, dtype=object)
    for i in range(n):
        if validity[i]:
            data[i] = paths[i]
    return Vector(LIST(BIGINT), data, validity)


def fn_reachability(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    if n == 0:
        return Vector.empty(BOOLEAN)
    csr_id = _csr_id(args)
    csr = _get_csr_path(ctx, csr_id)
    src, dst, valid = _src_dst(args, 3, 4)
    reached, validity = msbfs.reachability(csr, src, dst, valid)
    ctx.csr_to_delete.add(csr_id)
    return Vector(BOOLEAN, reached, validity)


def fn_cheapest_path_length(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    if n == 0:
        return Vector.empty(BIGINT)
    csr_id = _csr_id(args)
    csr = _get_csr_path(ctx, csr_id)
    src, dst, valid = _src_dst(args, 2, 3)
    costs, validity, is_double = msbfs.cheapest_path_length(
        csr, src, dst, valid)
    ctx.csr_to_delete.add(csr_id)
    typ = DOUBLE if is_double else BIGINT
    return Vector(typ, costs.astype(typ.numpy_dtype()), validity)


# ---------------------------------------------------------------------------
# whole-graph algorithms (lookup per rowid; computed once per query)
# ---------------------------------------------------------------------------

def fn_pagerank(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    if n == 0:
        return Vector.empty(DOUBLE)
    csr_id = _csr_id(args)
    csr = _get_csr_algo(ctx, csr_id, "running PageRank")
    key = ("pagerank", csr_id)
    rank = ctx.algo_state.get(key)
    if rank is None:
        rank = ctx.algo_state[key] = algs.pagerank(csr)
    node = args[1].data.astype(np.int64)
    validity = args[1].validity & (node >= 0) & (node < csr.vsize)
    out = np.where(validity, rank[np.clip(node, 0, csr.vsize - 1)], 0.0)
    ctx.csr_to_delete.add(csr_id)
    return Vector(DOUBLE, out, validity)


def fn_weakly_connected_component(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    if n == 0:
        return Vector.empty(BIGINT)
    csr_id = _csr_id(args)
    csr = _get_csr_algo(ctx, csr_id, "doing weakly connected components")
    key = ("wcc", csr_id)
    roots = ctx.algo_state.get(key)
    if roots is None:
        roots = ctx.algo_state[key] = algs.weakly_connected_component(csr)
    node = args[1].data.astype(np.int64)
    validity = args[1].validity & (node >= 0) & (node < len(roots))
    out = np.where(validity, roots[np.clip(node, 0, len(roots) - 1)], 0)
    ctx.csr_to_delete.add(csr_id)
    return Vector(BIGINT, out.astype(np.int64), validity)


def fn_local_clustering_coefficient(args: List[Vector], ctx) -> Vector:
    n = len(args[0])
    if n == 0:
        return Vector.empty(FLOAT)
    csr_id = _csr_id(args)
    csr = _get_csr_algo(ctx, csr_id, "computing the local clustering coefficient")
    key = ("lcc", csr_id)
    lcc = ctx.algo_state.get(key)
    if lcc is None:
        lcc = ctx.algo_state[key] = algs.local_clustering_coefficient(csr)
    node = args[1].data.astype(np.int64)
    validity = args[1].validity & (node >= 0) & (node < len(lcc))
    out = np.where(validity, lcc[np.clip(node, 0, max(len(lcc) - 1, 0))], 0.0)
    ctx.csr_to_delete.add(csr_id)
    return Vector(FLOAT, out.astype(np.float32), validity)


# ---------------------------------------------------------------------------
# experimental path-enumeration kernels (beyond the reference, which raises
# NotImplemented for ALL SHORTEST / SHORTEST k / non-WALK modes —
# match.cpp:80-108; enabled via SET pgq_experimental = true)
# ---------------------------------------------------------------------------

def fn_allshortestpaths(args: List[Vector], ctx) -> Vector:
    """allshortestpaths(id, vcount, src, dst) -> LIST(LIST(BIGINT)): every
    tied-shortest path per pair, first entry matching shortestpath()."""
    n = len(args[0])
    if n == 0:
        return Vector.empty(LIST(LIST(BIGINT)))
    csr_id = _csr_id(args)
    csr = _get_csr_path(ctx, csr_id)
    src, dst, valid = _src_dst(args, 2, 3)
    ctx.csr_to_delete.add(csr_id)
    data = np.empty(n, dtype=object)
    for i in range(n):
        if valid[i]:
            data[i] = msbfs.all_shortest_paths(csr, int(src[i]), int(dst[i]))
    return Vector(LIST(LIST(BIGINT)), data, valid.copy())


def fn_kshortestwalks(args: List[Vector], ctx) -> Vector:
    """kshortestwalks(id, vcount, k, mode, src, dst) -> LIST(LIST(BIGINT)):
    up to k shortest walks per pair, nondecreasing hop count; mode 0=WALK,
    1=TRAIL, 2=ACYCLIC, 3=SIMPLE restricts enumeration."""
    n = len(args[0])
    if n == 0:
        return Vector.empty(LIST(LIST(BIGINT)))
    csr_id = _csr_id(args)
    csr = _get_csr_path(ctx, csr_id)
    k = int(args[2].data[0]) if len(args[2]) else 0
    mode = int(args[3].data[0]) if len(args[3]) else 0
    src, dst, valid = _src_dst(args, 4, 5)
    ctx.csr_to_delete.add(csr_id)
    data = np.empty(n, dtype=object)
    for i in range(n):
        if valid[i]:
            data[i] = msbfs.k_shortest_walks(csr, int(src[i]), int(dst[i]),
                                             k, mode)
    return Vector(LIST(LIST(BIGINT)), data, valid.copy())


def fn_pathmode_exists(args: List[Vector], ctx) -> Vector:
    """pathmode_exists(id, vcount, mode, lower, upper, src, dst) -> BOOLEAN:
    exists an s->d path with hops in [lower, upper] under the path mode."""
    n = len(args[0])
    if n == 0:
        return Vector.empty(BOOLEAN)
    csr_id = _csr_id(args)
    csr = _get_csr_path(ctx, csr_id)
    mode = int(args[2].data[0]) if len(args[2]) else 0
    lower = int(args[3].data[0]) if len(args[3]) else 0
    upper = int(args[4].data[0]) if len(args[4]) else csr.vcount
    src, dst, valid = _src_dst(args, 5, 6)
    ctx.csr_to_delete.add(csr_id)
    out = np.zeros(n, dtype=bool)
    for i in range(n):
        if valid[i]:
            out[i] = msbfs.path_mode_exists(csr, int(src[i]), int(dst[i]),
                                            lower, upper, mode)
    return Vector(BOOLEAN, out, valid.copy())


def register_graph_kernels():
    _register("create_csr_vertex", fn_create_csr_vertex)
    _register("create_csr_edge", fn_create_csr_edge)
    _register("delete_csr", fn_delete_csr)
    _register("csr_get_w_type", fn_csr_get_w_type)
    _register("iterativelength", fn_iterativelength)
    _register("iterativelength2", fn_iterativelength2)
    _register("iterativelengthbidirectional", fn_iterativelength_bidirectional)
    _register("shortestpath", fn_shortestpath)
    _register("reachability", fn_reachability)
    _register("cheapest_path_length", fn_cheapest_path_length)
    _register("pagerank", fn_pagerank)
    _register("weakly_connected_component", fn_weakly_connected_component)
    _register("local_clustering_coefficient", fn_local_clustering_coefficient)
    _register("allshortestpaths", fn_allshortestpaths)
    _register("kshortestwalks", fn_kshortestwalks)
    _register("pathmode_exists", fn_pathmode_exists)


register_graph_kernels()
