"""Closed-triangle COUNT fast path (VERDICT r4 item 6; reference workload
test/sql/snb/bi.test BI17).

``SELECT count(*) FROM GRAPH_TABLE (pg MATCH (a:L)-[e1:K where f(e1)]-
(b:L)-[e2:K where f(e2)]-(c:L)-[e3:K where f(e3)]-(a:L) COLUMNS (...)) t``
is a 3-cycle of undirected same-label edges whose binding count equals
trace(M^3) of the filtered symmetric adjacency matrix — 6x the triangle
count on a simple graph. The host join plan materializes the wedge set
(O(E^2/V) rows); this path counts wedge closures directly: a bitset
intersection sweep on host for small graphs, the blocked masked-matmul
(lcc_device machinery, MXU work) on device for large ones.

Strict preconditions — ANY failure falls back to the join plan:
single path pattern in WALK/default mode, exactly the 7-element cycle
shape with one shared vertex/edge label and per-edge filters identical up
to the edge variable name, single-column keys, no label inheritance
(discriminators change the row multiset), no self-loops, no duplicate
undirected pairs (either would change the binding multiplicity), and
every endpoint resolving to a vertex row.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..pgq import ast as past
from ..sql import ast as a

# device count when the symmetrized edge list is at least this large
_DEVICE_MIN_EDGES = 1 << 21
_MAX_VERTICES = 1 << 20


def _edge_filter_fp(expr, var: str, vertex_vars) -> Optional[str]:
    """Fingerprint of a per-edge WHERE with the edge variable normalized;
    None when the filter references any vertex variable (not a pure
    edge-property filter)."""
    from ..exec.expression import fingerprint
    fp = fingerprint(expr)
    for v in vertex_vars:
        if f"col:{v.lower()}." in fp:
            return None
    return fp.replace(f"col:{var.lower()}.", "col:<edge>.")


def _match_triangle(m: past.MatchExpression):
    """Returns (vertex_label, edge_label, [(var, where), ...]) when the
    MATCH is exactly an undirected same-label 3-cycle; else None."""
    if m.where_clause is not None or len(m.path_patterns) != 1:
        return None
    p = m.path_patterns[0]
    if p.shortest or p.all or p.topk or p.group or p.path_variable:
        return None
    if p.mode not in (past.PGQPathMode.NONE, past.PGQPathMode.WALK):
        return None
    els = p.path_elements
    if len(els) != 7:
        return None
    vs, es = els[0::2], els[1::2]
    for v in vs:
        if not isinstance(v, past.PathElement) or \
                v.match_type != past.PGQMatchType.MATCH_VERTEX:
            return None
    if len({(v.label or "").lower() for v in vs}) != 1 or not vs[0].label:
        return None
    names = [(v.variable_binding or "").lower() for v in vs]
    if not names[0] or names[3] != names[0]:
        return None
    if len({names[0], names[1], names[2]}) != 3:
        return None
    edges = []
    for e in es:
        wc = None
        inner = e
        if isinstance(e, past.SubPath):
            if not e.single_bind or e.lower != 1 or e.upper != 1 or \
                    len(e.path_list) != 1:
                return None
            wc = e.where_clause
            inner = e.path_list[0]
        if not isinstance(inner, past.PathElement) or \
                inner.match_type != past.PGQMatchType.MATCH_EDGE_ANY:
            return None
        edges.append((inner.label or "", inner.variable_binding or "", wc))
    if len({lbl.lower() for lbl, _, _ in edges}) != 1 or not edges[0][0]:
        return None
    vertex_vars = set(names[:3])
    fps = set()
    for _, var, wc in edges:
        if wc is None:
            fps.add(None)
            continue
        fp = _edge_filter_fp(wc, var, vertex_vars)
        if fp is None:
            return None
        fps.add(fp)
    if len(fps) != 1:
        return None
    return vs[0].label, edges[0][0], edges


def _host_closures(s: np.ndarray, d: np.ndarray, nv: int) -> int:
    """Sum over directed edges (u,v) of |N(u) ∩ N(v)| on the symmetric
    bitset adjacency (== trace(M^3))."""
    words = (nv + 63) // 64
    nbr = np.zeros((nv, words), np.uint64)
    np.bitwise_or.at(nbr, (s, (d >> 6).astype(np.int64)),
                     np.uint64(1) << (d & 63).astype(np.uint64))
    total = 0
    chunk = max(1, (1 << 26) // max(words, 1))
    popcount = getattr(np, "bitwise_count", None)
    for i in range(0, len(s), chunk):
        inter = nbr[s[i:i + chunk]] & nbr[d[i:i + chunk]]
        if popcount is not None:
            total += int(popcount(inter).sum())
        else:
            total += int(np.unpackbits(
                inter.view(np.uint8), axis=None).sum())
    return total


def try_triangle_count(executor, ref: "a.GraphTableRef") -> Optional[int]:
    """The fast-path entry: returns the binding count, or None to use the
    generic join plan."""
    if os.environ.get("DUCKPGQ_TRIANGLE", "1") != "1":
        return None
    m = ref.match_expr
    matched = _match_triangle(m)
    if matched is None:
        return None
    v_label, e_label, edges = matched
    info = executor.connection.registered_property_graphs.get(
        (m.pg_name or "").lower())
    if info is None:
        return None                     # let the normal path raise
    etab = info.label_map.get(e_label.lower())
    vtab = info.label_map.get(v_label.lower())
    if etab is None or vtab is None or etab.is_vertex_table or \
            not vtab.is_vertex_table:
        return None
    if etab.discriminator or vtab.discriminator or etab.sub_labels or \
            vtab.sub_labels:
        return None                     # inheritance changes the multiset
    if len(etab.source_fk) != 1 or len(etab.destination_fk) != 1 or \
            len(etab.source_pk) != 1 or len(etab.destination_pk) != 1:
        return None
    if etab.source_reference.lower() != vtab.table_name.lower() or \
            etab.destination_reference.lower() != vtab.table_name.lower():
        return None
    if etab.source_pk != etab.destination_pk:
        return None

    var = edges[0][1] or "e"
    where = edges[0][2]
    try:
        eres = executor.execute_select(a.SelectStatement(node=a.SelectNode(
            select_list=[a.ColumnRef(parts=(var, etab.source_fk[0])),
                         a.ColumnRef(parts=(var, etab.destination_fk[0]))],
            from_table=a.BaseTableRef(table=etab.table_name, alias=var),
            where=where)))
        vres = executor.execute_select(a.SelectStatement(node=a.SelectNode(
            select_list=[a.ColumnRef(parts=("v", etab.source_pk[0]))],
            from_table=a.BaseTableRef(table=vtab.table_name, alias="v"))))
    except Exception:
        return None                     # odd schema: normal path decides
    if len(eres.columns) != 2 or len(vres.columns) != 1:
        return None
    sv, dv, kv = eres.columns[0], eres.columns[1], vres.columns[0]
    if not (sv.validity.all() and dv.validity.all() and
            kv.validity.all()):
        return None
    try:
        keys = np.asarray(kv.data, dtype=np.int64)
        s_raw = np.asarray(sv.data, dtype=np.int64)
        d_raw = np.asarray(dv.data, dtype=np.int64)
    except (TypeError, ValueError):
        return None
    nv = len(keys)
    if nv == 0 or nv > _MAX_VERTICES:
        return None
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    if len(sorted_keys) > 1 and (sorted_keys[1:] == sorted_keys[:-1]).any():
        return None                     # duplicate vertex keys
    pos_s = np.searchsorted(sorted_keys, s_raw)
    pos_d = np.searchsorted(sorted_keys, d_raw)
    ok = (pos_s < nv) & (pos_d < nv)
    if not ok.all() or not (sorted_keys[pos_s] == s_raw).all() or \
            not (sorted_keys[pos_d] == d_raw).all():
        return None                     # dangling endpoint
    s = order[pos_s].astype(np.int64)
    d = order[pos_d].astype(np.int64)
    if len(s) == 0:
        return 0
    if (s == d).any():
        return None                     # self loops change multiplicity
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    pair = lo * np.int64(nv) + hi
    has_dups = len(np.unique(pair)) != len(pair)
    sym_s = np.concatenate([s, d])
    sym_d = np.concatenate([d, s])
    device_ok = os.environ.get("DUCKPGQ_TRIANGLE_DEVICE", "1") == "1"
    if has_dups or (len(sym_s) >= _DEVICE_MIN_EDGES and device_ok):
        # duplicate pairs need the multiplicity-weighted kernel (the
        # bitset sweep undercounts parallel rows); large graphs prefer
        # the MXU either way
        if not device_ok:
            return None
        try:
            from ..ops.csr import build_csr
            from ..ops.csr_jax import from_host_csr
            from ..ops.msbfs_jax import triangle_closures_device
            csr = build_csr(nv, sym_s, sym_d,
                            np.arange(len(sym_s), dtype=np.int64))
            return int(triangle_closures_device(from_host_csr(csr)))
        except Exception:
            if has_dups:
                return None             # no exact host path for dups
    return _host_closures(sym_s, sym_d, nv)
