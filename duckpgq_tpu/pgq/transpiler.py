"""MATCH-to-relational transpiler — the heart of the PGQ layer.

Capability-equivalent reimplementation of the reference's
PGQMatchFunction::MatchBindReplace pipeline (reference
src/core/functions/table/match.cpp): pattern walk -> join graph + filters;
quantified edges -> CSR build CTE + iterativelength condition; named shortest
paths -> shortest_path_cte + path-column rewrites; property validation and
star expansion against registered properties.

The generated artifact is a plain SELECT over cross-joined bindings (the same
shape the reference's generated SQL takes) executed by the engine's vectorized
executor; all graph work happens in the CSR/kernels layer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..errors import (BinderException, ConstraintException, InvalidException,
                      NotImplementedException)
from ..sql import ast as a
from ..sql.parser import Parser
from . import ast as past

UNBOUNDED = 1 << 30


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _tref_sql(t: past.PropertyGraphTable, alias: str = "") -> str:
    parts = []
    if t.catalog_name:
        parts.append(_q(t.catalog_name))
    if t.schema_name:
        parts.append(_q(t.schema_name))
    parts.append(_q(t.table_name))
    out = ".".join(parts)
    out += f" AS {_q(alias or t.table_name)}"
    return out


def _col_sql(column: str, table: str) -> str:
    return f"{_q(table)}.{_q(column)}"


def parse_one_select(sql: str) -> a.SelectStatement:
    stmts = Parser(sql).parse_statements()
    return stmts[0]


# ---------------------------------------------------------------------------
# generated-SQL templates for the CSR build CTEs (mirroring the semantics of
# reference src/core/utils/compressed_sparse_row.cpp:106-256)
# ---------------------------------------------------------------------------

def count_table_sql(vt: past.PropertyGraphTable, alias: str, pk: str) -> str:
    return (f"SELECT count({_col_sql(pk, alias)}) FROM {_tref_sql(vt, alias)}")


def count_edge_table_sql(et: past.PropertyGraphTable) -> str:
    src_vt, dst_vt = et.source_pg_table, et.destination_pg_table
    return (
        f"SELECT count(*) FROM {_tref_sql(et)} "
        f"INNER JOIN {_tref_sql(src_vt, 'src')} ON "
        f"{_col_sql(et.source_fk[0], et.table_name)} = "
        f"{_col_sql(et.source_pk[0], 'src')} "
        f"INNER JOIN {_tref_sql(dst_vt, 'dst')} ON "
        f"{_col_sql(et.destination_fk[0], et.table_name)} = "
        f"{_col_sql(et.destination_pk[0], 'dst')}")


def directed_vertex_sql(et: past.PropertyGraphTable, prev_binding: str) -> str:
    src_vt = et.source_pg_table
    return (
        f"SELECT sum(create_csr_vertex(0, "
        f"({count_table_sql(src_vt, prev_binding, et.source_pk[0])}), "
        f"sub.dense_id, sub.cnt)) FROM ("
        f"SELECT {_col_sql('rowid', prev_binding)} AS dense_id, "
        f"count({_col_sql(et.source_fk[0], et.table_name)}) AS cnt "
        f"FROM {_tref_sql(src_vt, prev_binding)} "
        f"LEFT JOIN {_tref_sql(et)} ON "
        f"{_col_sql(et.source_fk[0], et.table_name)} = "
        f"{_col_sql(et.source_pk[0], prev_binding)} "
        f"GROUP BY dense_id) sub")


def directed_csr_cte_sql(et: past.PropertyGraphTable, prev_binding: str,
                         edge_binding: str, next_binding: str) -> str:
    src_vt, dst_vt = et.source_pg_table, et.destination_pg_table
    return (
        f"SELECT create_csr_edge(0, "
        f"({count_table_sql(src_vt, prev_binding, et.source_pk[0])}), "
        f"CAST(({directed_vertex_sql(et, prev_binding)}) AS BIGINT), "
        f"({count_edge_table_sql(et)}), "
        f"{_col_sql('rowid', prev_binding)}, "
        f"{_col_sql('rowid', next_binding)}, "
        f"{_col_sql('rowid', edge_binding)}) AS temp "
        f"FROM {_tref_sql(et, edge_binding)} "
        f"INNER JOIN {_tref_sql(src_vt, prev_binding)} ON "
        f"{_col_sql(et.source_fk[0], edge_binding)} = "
        f"{_col_sql(et.source_pk[0], prev_binding)} "
        f"INNER JOIN {_tref_sql(dst_vt, next_binding)} ON "
        f"{_col_sql(et.destination_fk[0], edge_binding)} = "
        f"{_col_sql(et.destination_pk[0], next_binding)}")


def edges_cte_sql(et: past.PropertyGraphTable) -> str:
    src_vt, dst_vt = et.source_pg_table, et.destination_pg_table
    return (
        f"SELECT {_col_sql('rowid', 'src_table')} AS src, "
        f"{_col_sql('rowid', 'dst_table')} AS dst, "
        f"{_col_sql('rowid', et.table_name)} AS edges "
        f"FROM {_tref_sql(et)} "
        f"INNER JOIN {_tref_sql(src_vt, 'src_table')} ON "
        f"{_col_sql(et.source_fk[0], et.table_name)} = "
        f"{_col_sql(et.source_pk[0], 'src_table')} "
        f"INNER JOIN {_tref_sql(dst_vt, 'dst_table')} ON "
        f"{_col_sql(et.destination_fk[0], et.table_name)} = "
        f"{_col_sql(et.destination_pk[0], 'dst_table')}")


def _unique_edges_sql(et: past.PropertyGraphTable, reverse: bool) -> str:
    src_vt = et.source_pg_table
    ref = et.source_reference
    if not reverse:
        return (
            f"SELECT {_col_sql('rowid', ref)} AS dense_id, "
            f"{_col_sql(et.source_fk[0], et.table_name)} AS outgoing_edges, "
            f"{_col_sql(et.destination_fk[0], et.table_name)} AS incoming_edges "
            f"FROM {_tref_sql(et)} INNER JOIN {_tref_sql(src_vt)} ON "
            f"{_col_sql(et.source_fk[0], et.table_name)} = "
            f"{_col_sql(et.source_pk[0], ref)}")
    return (
        f"SELECT {_col_sql('rowid', ref)} AS dense_id, "
        f"{_col_sql(et.destination_fk[0], et.table_name)} AS outgoing_edges, "
        f"{_col_sql(et.source_fk[0], et.table_name)} AS incoming_edges "
        f"FROM {_tref_sql(et)} INNER JOIN {_tref_sql(src_vt)} ON "
        f"{_col_sql(et.destination_fk[0], et.table_name)} = "
        f"{_col_sql(et.source_pk[0], ref)}")


def undirected_vertex_sql(et: past.PropertyGraphTable, binding: str) -> str:
    src_vt = et.source_pg_table
    return (
        f"SELECT multiply(2, sum(create_csr_vertex(0, "
        f"({count_table_sql(src_vt, binding, et.source_pk[0])}), "
        f"sub.dense_id, sub.cnt))) FROM ("
        f"SELECT dense_id, count(outgoing_edges) AS cnt FROM ("
        f"{_unique_edges_sql(et, False)} UNION BY NAME "
        f"{_unique_edges_sql(et, True)}) unique_edges "
        f"GROUP BY dense_id) sub")


def count_undirected_edges_sql() -> str:
    return ("SELECT multiply(2, count(*)) FROM (SELECT src, dst FROM "
            "edges_cte UNION BY NAME SELECT dst AS src, src AS dst FROM "
            "edges_cte)")


def undirected_csr_cte_sql(et: past.PropertyGraphTable) -> str:
    src_vt = et.source_pg_table
    return (
        f"SELECT create_csr_edge(0, "
        f"({count_table_sql(src_vt, et.source_reference, et.source_pk[0])}), "
        f"CAST(({undirected_vertex_sql(et, et.source_reference)}) AS BIGINT), "
        f"({count_undirected_edges_sql()}), src, dst, edge) AS temp FROM ("
        f"SELECT src, dst, any_value(edges) AS edge FROM ("
        f"SELECT src, dst, edges FROM edges_cte UNION ALL "
        f"SELECT dst, src, edges FROM edges_cte) GROUP BY src, dst)")


# ---------------------------------------------------------------------------
# expression walking / rewriting
# ---------------------------------------------------------------------------

def walk_replace(e: a.Expression, fn):
    """Bottom-up rewrite: fn(node) may return a replacement node or None."""
    if e is None:
        return None
    repl = fn(e)
    if repl is not None:
        return repl
    if isinstance(e, (a.Constant, a.ColumnRef, a.Star, a.Positional)):
        return e
    if isinstance(e, a.FunctionCall):
        e.args = [walk_replace(x, fn) for x in e.args]
        return e
    if isinstance(e, a.AggregateCall):
        e.args = [walk_replace(x, fn) for x in e.args]
        return e
    if isinstance(e, a.Comparison):
        e.left = walk_replace(e.left, fn)
        e.right = walk_replace(e.right, fn)
        return e
    if isinstance(e, a.Conjunction):
        e.children = [walk_replace(x, fn) for x in e.children]
        return e
    if isinstance(e, a.Not):
        e.child = walk_replace(e.child, fn)
        return e
    if isinstance(e, a.IsNull):
        e.child = walk_replace(e.child, fn)
        return e
    if isinstance(e, a.Between):
        e.expr = walk_replace(e.expr, fn)
        e.lower = walk_replace(e.lower, fn)
        e.upper = walk_replace(e.upper, fn)
        return e
    if isinstance(e, a.InList):
        e.expr = walk_replace(e.expr, fn)
        e.values = [walk_replace(x, fn) for x in e.values]
        return e
    if isinstance(e, a.Cast):
        e.child = walk_replace(e.child, fn)
        return e
    if isinstance(e, a.Case):
        if e.base is not None:
            e.base = walk_replace(e.base, fn)
        e.whens = [(walk_replace(w, fn), walk_replace(t, fn))
                   for w, t in e.whens]
        if e.else_expr is not None:
            e.else_expr = walk_replace(e.else_expr, fn)
        return e
    if isinstance(e, a.StructExtract):
        e.child = walk_replace(e.child, fn)
        return e
    if isinstance(e, a.ArrayIndex):
        e.child = walk_replace(e.child, fn)
        if e.index is not None:
            e.index = walk_replace(e.index, fn)
        if e.slice_stop is not None:
            e.slice_stop = walk_replace(e.slice_stop, fn)
        return e
    if isinstance(e, a.Like):
        e.left = walk_replace(e.left, fn)
        e.pattern = walk_replace(e.pattern, fn)
        return e
    if isinstance(e, a.ListExpr):
        e.values = [walk_replace(x, fn) for x in e.values]
        return e
    if isinstance(e, a.StructExpr):
        e.fields = [(k, walk_replace(v, fn)) for k, v in e.fields]
        return e
    if isinstance(e, a.Collate):
        e.child = walk_replace(e.child, fn)
        return e
    if isinstance(e, a.SubqueryExpr):
        if e.child is not None:
            e.child = walk_replace(e.child, fn)
        return e
    return e


_PATH_FUNCTIONS = ("element_id", "path_length", "vertices", "edges")


class MatchTranspiler:
    def __init__(self, executor, match_expr: past.MatchExpression):
        self.ex = executor
        self.con = executor.connection
        self.m = match_expr
        info = self.con.registered_property_graphs.get(
            match_expr.pg_name.lower())
        if info is None:
            raise BinderException(
                f"Property graph {match_expr.pg_name} does not exist")
        self.info: past.CreatePropertyGraphInfo = info
        # alias -> PropertyGraphTable (ordered)
        self.alias_map: Dict[str, past.PropertyGraphTable] = {}
        self.alias_order: List[str] = []
        # alias -> custom FROM entry (e.g. ANY-edge union subquery)
        self.custom_from: Dict[str, a.TableRef] = {}
        self.extra_from: List[a.TableRef] = []     # __x, shortest_path_cte
        self.conditions: List[a.Expression] = []   # ready-made (actual cols)
        self.raw_conditions: List[a.Expression] = []  # need normalization
        self.ctes: List[a.CTE] = []
        self.cte_names = set()
        self.extra_alias_counter = 0
        # named path -> its elements (for path-column rewrites)
        self.named_paths: Dict[str, past.PathPattern] = {}
        self.path_list_exprs: Dict[str, a.Expression] = {}
        self._cur_pattern: Optional[past.PathPattern] = None

    # ------------------------------------------------------------- utilities
    def _add_cte(self, name: str, sql: str) -> bool:
        if name in self.cte_names:
            return False
        stmt = parse_one_select(sql)
        self.ctes.append(a.CTE(name=name, query=stmt))
        self.cte_names.add(name)
        return True

    def _register_alias(self, binding: str, table: past.PropertyGraphTable):
        key = binding.lower()
        if key not in self.alias_map:
            self.alias_map[key] = table
            self.alias_order.append(binding)
        else:
            existing = self.alias_map[key]
            if existing is not table:
                raise BinderException(
                    f"Variable {binding} is bound to multiple labels")

    def _find_graph_table(self, label: str) -> past.PropertyGraphTable:
        """MATCH uses a plain label-map hit with a Binder error — no
        Levenshtein suggestion (reference FindGraphTable, match.cpp:268-276;
        the did-you-mean path is only for algorithm table functions)."""
        entry = self.info.label_map.get(label.lower())
        if entry is None:
            raise BinderException(
                f"The label {label} is not registered in property graph "
                f"{self.info.property_graph_name}")
        return entry

    def _find_vertex_table(self, el: past.PathElement
                           ) -> past.PropertyGraphTable:
        # label-less elements fall back to the binding name as label
        # (reference graph_table_keyword.test: MATCH (Person))
        return self._find_graph_table(el.label or el.variable_binding)

    def _find_edge_table(self, el: past.PathElement
                         ) -> past.PropertyGraphTable:
        return self._find_graph_table(el.label or el.variable_binding)

    def _check_inheritance(self, table: past.PropertyGraphTable,
                           el: past.PathElement):
        """Sub-label -> discriminator bitmask condition (reference
        match.cpp:278-296)."""
        if not el.label or \
                table.main_label.lower() == el.label.lower():
            return
        subs = [s.lower() for s in table.sub_labels]
        if not table.discriminator or el.label.lower() not in subs:
            raise BinderException(
                f"Label {el.label} is not a sublabel of {table.main_label}")
        idx = subs.index(el.label.lower())
        mask = 1 << idx
        cond = a.Comparison(
            op="=",
            left=a.FunctionCall(name="bitand", args=[
                a.ColumnRef(parts=(el.variable_binding, table.discriminator)),
                a.Cast(child=a.Constant(mask), target=None)]),
            right=a.Constant(mask))
        # keep cast trivial: bitand handles ints
        cond.left.args[1] = a.Constant(mask)
        self.conditions.append(cond)

    @staticmethod
    def _unwrap(ref: past.PathReference
                ) -> Tuple[past.PathElement, Optional[past.SubPath]]:
        if isinstance(ref, past.SubPath):
            return ref.path_list[0], ref
        return ref, None

    @staticmethod
    def _join_cond(vertex_keys, edge_keys, vertex_alias, edge_alias
                   ) -> a.Expression:
        if len(vertex_keys) != len(edge_keys):
            raise BinderException("Vertex columns and edge columns size "
                                  "mismatch")
        conds = []
        for vk, ek in zip(vertex_keys, edge_keys):
            conds.append(a.Comparison(
                op="=",
                left=a.ColumnRef(parts=(vertex_alias, vk)),
                right=a.ColumnRef(parts=(edge_alias, ek))))
        if len(conds) == 1:
            return conds[0]
        return a.Conjunction(op="AND", children=conds)

    def _check_edge_table_constraint(self, src_ref: str, dst_ref: str,
                                     et: past.PropertyGraphTable):
        if src_ref.lower() != et.source_reference.lower():
            raise BinderException(
                f"Label {src_ref} is not registered as a source reference "
                f"for edge pattern of table {et.table_name}")
        if dst_ref.lower() != et.destination_reference.lower():
            raise BinderException(
                f"Label {src_ref} is not registered as a destination "
                f"reference for edge pattern of table {et.table_name}")

    # ----------------------------------------------------------- edge joins
    def _add_edge_joins(self, et: past.PropertyGraphTable,
                        prev_table: past.PropertyGraphTable,
                        next_table: past.PropertyGraphTable,
                        match_type: past.PGQMatchType,
                        edge_binding: str, prev_binding: str,
                        next_binding: str):
        mt = past.PGQMatchType
        if match_type == mt.MATCH_EDGE_RIGHT:
            self._check_edge_table_constraint(prev_table.table_name,
                                              next_table.table_name, et)
            self.conditions.append(self._join_cond(
                et.source_pk, et.source_fk, prev_binding, edge_binding))
            self.conditions.append(self._join_cond(
                et.destination_pk, et.destination_fk, next_binding,
                edge_binding))
            self._register_alias(edge_binding, et)
        elif match_type == mt.MATCH_EDGE_LEFT:
            self._check_edge_table_constraint(next_table.table_name,
                                              prev_table.table_name, et)
            self.conditions.append(self._join_cond(
                et.source_pk, et.source_fk, next_binding, edge_binding))
            self.conditions.append(self._join_cond(
                et.destination_pk, et.destination_fk, prev_binding,
                edge_binding))
            self._register_alias(edge_binding, et)
        elif match_type == mt.MATCH_EDGE_ANY:
            # edge table doubled: both orientations (reference
            # match.cpp:365-392)
            self._register_alias(edge_binding, et)
            union_sql = (
                f"SELECT {_col_sql(et.source_fk[0], edge_binding)} AS "
                f"{_q(et.source_fk[0])}, "
                f"{_col_sql(et.destination_fk[0], edge_binding)} AS "
                f"{_q(et.destination_fk[0])}, * "
                f"FROM {_tref_sql(et, edge_binding)} UNION ALL "
                f"SELECT {_col_sql(et.destination_fk[0], edge_binding)} AS "
                f"{_q(et.source_fk[0])}, "
                f"{_col_sql(et.source_fk[0], edge_binding)} AS "
                f"{_q(et.destination_fk[0])}, * "
                f"FROM {_tref_sql(et, edge_binding)}")
            sub = a.SubqueryRef(subquery=parse_one_select(union_sql),
                                alias=edge_binding)
            self.custom_from[edge_binding.lower()] = sub
            src_c = self._join_cond(et.source_pk, et.source_fk, prev_binding,
                                    edge_binding)
            dst_c = self._join_cond(et.destination_pk, et.destination_fk,
                                    next_binding, edge_binding)
            self.conditions.append(
                a.Conjunction(op="AND", children=[src_c, dst_c]))
        elif match_type == mt.MATCH_EDGE_LEFT_RIGHT:
            self._register_alias(edge_binding, et)
            extra = f"{edge_binding}{self.extra_alias_counter}"
            self.extra_alias_counter += 1
            self._register_alias(extra, et)
            left = a.Conjunction(op="AND", children=[
                self._join_cond(et.source_pk, et.source_fk, next_binding,
                                edge_binding),
                self._join_cond(et.destination_pk, et.destination_fk,
                                prev_binding, edge_binding)])
            right = a.Conjunction(op="AND", children=[
                self._join_cond(et.source_pk, et.source_fk, prev_binding,
                                extra),
                self._join_cond(et.destination_pk, et.destination_fk,
                                next_binding, extra)])
            self.conditions.append(
                a.Conjunction(op="AND", children=[left, right]))
        else:
            raise BinderException("Unknown edge type")

    # --------------------------------------------------------- path finding
    def _ensure_cte1(self, edge_el: past.PathElement,
                     et: past.PropertyGraphTable, prev_binding: str,
                     edge_binding: str, next_binding: str):
        mt = past.PGQMatchType
        if "cte1" in self.cte_names:
            return
        if edge_el.match_type == mt.MATCH_EDGE_RIGHT:
            self._add_cte("cte1", directed_csr_cte_sql(
                et, prev_binding, edge_binding, next_binding))
        elif edge_el.match_type == mt.MATCH_EDGE_ANY:
            if "edges_cte" not in self.cte_names:
                # edges_cte must be registered before the csr cte uses it
                self.ctes.insert(0, a.CTE(name="edges_cte",
                                          query=parse_one_select(
                                              edges_cte_sql(et))))
                self.cte_names.add("edges_cte")
            self._add_cte("cte1", undirected_csr_cte_sql(et))
        else:
            kind = "MATCH_EDGE_LEFT" if edge_el.match_type == \
                mt.MATCH_EDGE_LEFT else "MATCH_EDGE_LEFT_RIGHT"
            raise NotImplementedException(
                f"Cannot do shortest path for edge type {kind}")

    def _quantifier_condition(self, prev_binding: str, next_binding: str,
                              et: past.PropertyGraphTable,
                              subpath: past.SubPath) -> a.Expression:
        count_sql = count_table_sql(et.source_pg_table, prev_binding,
                                    et.source_pk[0])
        count_arg = a.SubqueryExpr(subquery=parse_one_select(count_sql),
                                   kind="SCALAR")
        mode = self._effective_mode(subpath)
        if mode != 0 and self._experimental():
            # TRAIL/ACYCLIC/SIMPLE: per-path repeat constraints mean the
            # shortest walk length cannot decide membership — existence
            # search instead (capability beyond the reference)
            upper = min(int(subpath.upper), 1 << 30)
            # the CSR barrier __x.temp rides inside the csr-id argument
            # (add(__x.temp, 0) == 0) instead of the kernel result, which
            # is BOOLEAN here
            csr_arg = a.FunctionCall(name="add", args=[
                a.ColumnRef(parts=("__x", "temp")), a.Constant(0)])
            return a.Comparison(
                op="=", right=a.Constant(True),
                left=a.FunctionCall(name="pathmode_exists", args=[
                    csr_arg, count_arg, a.Constant(mode),
                    a.Constant(int(subpath.lower)), a.Constant(upper),
                    a.ColumnRef(parts=(prev_binding, "rowid")),
                    a.ColumnRef(parts=(next_binding, "rowid"))]))
        expr = a.FunctionCall(name="add", args=[
            a.ColumnRef(parts=("__x", "temp")),
            a.FunctionCall(name="iterativelength", args=[
                a.Constant(0), count_arg,
                a.ColumnRef(parts=(prev_binding, "rowid")),
                a.ColumnRef(parts=(next_binding, "rowid"))])])
        if subpath.upper >= UNBOUNDED:
            return a.Comparison(op=">=", left=expr,
                                right=a.Constant(subpath.lower))
        return a.Between(expr=expr, lower=a.Constant(subpath.lower),
                         upper=a.Constant(subpath.upper))

    def _add_path_finding(self, prev_el, edge_el, next_el,
                          et: past.PropertyGraphTable,
                          subpath: past.SubPath):
        self._ensure_cte1(edge_el, et, prev_el.variable_binding,
                          edge_el.variable_binding, next_el.variable_binding)
        if "shortest_path_cte" in self.cte_names:
            return
        # cross join the CSR materialization barrier __x
        self.extra_from.append(a.SubqueryRef(
            subquery=parse_one_select(
                "SELECT multiply(0, count(cte1.temp)) AS temp FROM cte1"),
            alias="__x"))
        self.conditions.append(self._quantifier_condition(
            prev_el.variable_binding, next_el.variable_binding, et, subpath))

    def _ensure_path_cte_for_pattern(self, pattern: past.PathPattern):
        """Build shortest_path_cte for ALL SHORTEST / SHORTEST k patterns
        that never reference a path column (row multiplicity alone needs it)."""
        elements = pattern.path_elements
        prev_el, prev_sub = self._unwrap(elements[0])
        for i in range(1, len(elements), 2):
            next_el, next_sub = self._unwrap(elements[i + 1])
            edge_el, edge_sub = self._unwrap(elements[i])
            if edge_sub is not None and edge_sub.upper > 1:
                et = self._find_edge_table(edge_el)
                self._ensure_cte1(edge_el, et, prev_el.variable_binding,
                                  edge_el.variable_binding,
                                  next_el.variable_binding)
                self._build_shortest_path_cte(
                    pattern, prev_el, prev_sub, next_el, next_sub,
                    edge_el, et, edge_sub)
                return
            prev_el, prev_sub = next_el, next_sub

    def _path_fn_sql(self, pattern: past.PathPattern, count_sql: str,
                     pb: str, nb: str, subpath: past.SubPath) -> str:
        """The path expression of shortest_path_cte: shortestpath() for ANY
        SHORTEST (reference semantics), unnest(allshortestpaths()) /
        unnest(kshortestwalks()) for the experimental variants (one CTE row
        per path)."""
        rowids = f"{_col_sql('rowid', pb)}, {_col_sql('rowid', nb)}"
        if pattern.topk:
            mode = self._effective_mode(subpath, pattern)
            return (f"unnest(kshortestwalks(0, ({count_sql}), "
                    f"{int(pattern.topk)}, {mode}, {rowids}))")
        if pattern.all and pattern.shortest:
            return f"unnest(allshortestpaths(0, ({count_sql}), {rowids}))"
        return f"shortestpath(0, ({count_sql}), {rowids})"

    def _build_shortest_path_cte(self, pattern: past.PathPattern,
                                 prev_el, prev_sub, next_el, next_sub,
                                 edge_el, et, subpath: past.SubPath):
        """GenerateShortestPathCTE equivalent (match.cpp:466-495); the
        experimental ALL SHORTEST / SHORTEST k variants swap the path
        function and (for SHORTEST k) filter per-walk length instead of
        per-pair shortest length."""
        if "shortest_path_cte" in self.cte_names:
            return
        pb = prev_el.variable_binding
        nb = next_el.variable_binding
        count_sql = count_table_sql(et.source_pg_table, pb, et.source_pk[0])
        cte_sql = (
            f"SELECT {self._path_fn_sql(pattern, count_sql, pb, nb, subpath)}"
            f" AS path, "
            f"{_col_sql('rowid', pb)} AS src_rowid, "
            f"{_col_sql('rowid', nb)} AS dst_rowid "
            f"FROM {_tref_sql(et.source_pg_table, pb)} CROSS JOIN "
            f"{_tref_sql(et.destination_pg_table, nb)} CROSS JOIN "
            f"(SELECT multiply(0, count(cte1.temp)) AS temp FROM cte1) "
            f"AS __x")
        stmt = parse_one_select(cte_sql)
        conds: List[a.Expression] = []
        if not pattern.topk:
            conds.append(self._quantifier_condition(pb, nb, et, subpath))
        for sub in (prev_sub, next_sub):
            if sub is not None and sub.where_clause is not None:
                # raw (un-normalized) like the reference: inside the CTE the
                # vertex binding is a direct scan of the base table, so
                # property refs resolve against real columns
                conds.append(sub.where_clause)
                sub.where_clause = None   # consumed (moved, like reference)
        node = stmt.node
        if conds:
            node.where = conds[0] if len(conds) == 1 else \
                a.Conjunction(op="AND", children=conds)
        if pattern.topk:
            # per-walk hop filter replaces the per-pair shortest-length
            # BETWEEN (a pair's k-walk set may satisfy the quantifier even
            # when its shortest length does not)
            upper_sql = "" if subpath.upper >= UNBOUNDED else \
                f" AND len(path) // 2 <= {int(subpath.upper)}"
            outer = parse_one_select(
                f"SELECT path, src_rowid, dst_rowid FROM __ksp "
                f"WHERE len(path) // 2 >= {int(subpath.lower)}{upper_sql}")
            outer.node.from_table = a.SubqueryRef(subquery=stmt,
                                                  alias="__ksp")
            stmt = outer
        self.ctes.append(a.CTE(name="shortest_path_cte", query=stmt))
        self.cte_names.add("shortest_path_cte")
        # join the cte into the main FROM
        self.extra_from.append(a.BaseTableRef(table="shortest_path_cte"))
        self.conditions.append(a.Comparison(
            op="=", left=a.ColumnRef(parts=("shortest_path_cte", "src_rowid")),
            right=a.ColumnRef(parts=(pb, "rowid"))))
        self.conditions.append(a.Comparison(
            op="=", left=a.ColumnRef(parts=("shortest_path_cte", "dst_rowid")),
            right=a.ColumnRef(parts=(nb, "rowid"))))

    def _build_path_list_expr(self, pattern: past.PathPattern) -> a.Expression:
        """CreatePathFindingFunction equivalent (match.cpp:497-622): builds
        the rowid-list expression for element_id()."""
        var = pattern.path_variable.lower()
        cached = self.path_list_exprs.get(var)
        if cached is not None:
            return _clone_expr(cached)
        elements = pattern.path_elements
        final_list: Optional[a.Expression] = None
        prev_el, prev_sub = self._unwrap(elements[0])
        for i in range(1, len(elements), 2):
            next_el, next_sub = self._unwrap(elements[i + 1])
            edge_ref = elements[i]
            edge_el, edge_sub = self._unwrap(edge_ref)
            if edge_sub is not None and edge_sub.upper > 1:
                et = self._find_edge_table(edge_el)
                self._ensure_cte1(edge_el, et, prev_el.variable_binding,
                                  edge_el.variable_binding,
                                  next_el.variable_binding)
                self._build_shortest_path_cte(
                    pattern, prev_el, prev_sub, next_el, next_sub,
                    edge_el, et, edge_sub)
                path_ref = a.ColumnRef(parts=("shortest_path_cte", "path"))
                if final_list is None:
                    final_list = path_ref
                else:
                    final_list = a.FunctionCall(name="list_concat", args=[
                        final_list,
                        a.FunctionCall(name="array_pop_front",
                                       args=[path_ref])])
                prev_el, prev_sub = next_el, next_sub
                continue
            # fixed segment
            prev_rowid = a.ColumnRef(parts=(prev_el.variable_binding, "rowid"))
            edge_rowid = a.ColumnRef(parts=(edge_el.variable_binding, "rowid"))
            next_rowid = a.ColumnRef(parts=(next_el.variable_binding, "rowid"))
            if final_list is None:
                final_list = a.FunctionCall(
                    name="list_value",
                    args=[prev_rowid, edge_rowid, next_rowid])
            else:
                final_list = a.FunctionCall(name="list_concat", args=[
                    final_list,
                    a.FunctionCall(name="list_value",
                                   args=[edge_rowid, next_rowid])])
            prev_el, prev_sub = next_el, next_sub
        self.path_list_exprs[var] = final_list
        return _clone_expr(final_list)

    # --------------------------------------------------- pattern processing
    _MODE_CODES = {past.PGQPathMode.NONE: 0, past.PGQPathMode.WALK: 0,
                   past.PGQPathMode.TRAIL: 1, past.PGQPathMode.ACYCLIC: 2,
                   past.PGQPathMode.SIMPLE: 3}

    def _experimental(self) -> bool:
        """SET pgq_experimental = true enables path features the reference
        leaves unimplemented (ALL SHORTEST / SHORTEST k / non-WALK modes,
        match.cpp:80-108); default keeps the reference's exact errors."""
        v = self.con.settings.get("pgq_experimental")
        return str(v).lower() in ("1", "true", "on", "yes")

    def _effective_mode(self, subpath: Optional[past.SubPath],
                        pattern: Optional[past.PathPattern] = None) -> int:
        mode = past.PGQPathMode.NONE
        if subpath is not None and subpath.path_mode != past.PGQPathMode.NONE:
            mode = subpath.path_mode
        elif pattern is not None:
            mode = pattern.mode
        elif self._cur_pattern is not None:
            mode = self._cur_pattern.mode
        return self._MODE_CODES[mode]

    def _check_mode_support(self, pattern: past.PathPattern):
        exp = self._experimental()
        if pattern.all and pattern.shortest and not exp:
            raise NotImplementedException(
                "ALL SHORTEST has not been implemented yet.")
        if pattern.topk and not exp:
            raise NotImplementedException("TopK has not been implemented yet.")
        if pattern.mode not in (past.PGQPathMode.NONE, past.PGQPathMode.WALK) \
                and not exp:
            raise NotImplementedException(
                "Path modes other than WALK have not been implemented yet.")
        for ref in pattern.path_elements:
            self._check_subpath_support(ref, pattern.shortest, exp)

    def _check_subpath_support(self, ref: past.PathReference, shortest: bool,
                               exp: bool = False):
        if not isinstance(ref, past.SubPath):
            return
        if ref.path_mode not in (past.PGQPathMode.NONE, past.PGQPathMode.WALK) \
                and not exp:
            raise NotImplementedException(
                "Path modes other than WALK have not been implemented yet.")
        if not shortest and ref.upper >= UNBOUNDED and \
                ref.path_mode in (past.PGQPathMode.NONE, past.PGQPathMode.WALK):
            raise ConstraintException(
                "ALL unbounded with path mode WALK is not possible as this "
                "could lead to infinite results. Consider specifying an "
                "upper bound or path mode other than WALK")
        for child in ref.path_list:
            self._check_subpath_support(child, shortest, exp)

    def _process_pattern(self, pattern: past.PathPattern):
        self._check_mode_support(pattern)
        self._cur_pattern = pattern
        elements = pattern.path_elements
        if pattern.topk or (pattern.all and pattern.shortest):
            # experimental ALL SHORTEST / SHORTEST k: the path CTE drives
            # row multiplicity (one row per path) even when COLUMNS never
            # references a path function
            self._ensure_path_cte_for_pattern(pattern)
        if pattern.path_variable and len(elements) > 1:
            self.named_paths[pattern.path_variable.lower()] = pattern
            # CheckNamedSubpath: rewrite path-function columns now, which may
            # build shortest_path_cte and consume per-element WHEREs
            self._rewrite_path_columns(pattern)
        # process (vertex, edge, vertex) chain
        prev_el, prev_sub = self._unwrap(elements[0])
        if prev_sub is not None and prev_sub.where_clause is not None:
            self.raw_conditions.append(prev_sub.where_clause)
            prev_sub.where_clause = None
        prev_table = self._find_vertex_table(prev_el)
        self._check_inheritance(prev_table, prev_el)
        self._register_alias(prev_el.variable_binding, prev_table)
        for i in range(1, len(elements), 2):
            next_el, next_sub = self._unwrap(elements[i + 1])
            if isinstance(elements[i + 1], past.SubPath) and \
                    len(elements[i + 1].path_list) > 1:
                raise NotImplementedException(
                    "Recursive patterns are not yet supported.")
            if next_sub is not None and next_sub.where_clause is not None:
                self.raw_conditions.append(next_sub.where_clause)
                next_sub.where_clause = None
            if next_el.match_type != past.PGQMatchType.MATCH_VERTEX or \
                    prev_el.match_type != past.PGQMatchType.MATCH_VERTEX:
                raise BinderException(
                    "Vertex and edge patterns must be alternated.")
            next_table = self._find_vertex_table(next_el)
            self._check_inheritance(next_table, next_el)
            self._register_alias(next_el.variable_binding, next_table)

            edge_ref = elements[i]
            edge_el, edge_sub = self._unwrap(edge_ref)
            if edge_sub is not None:
                if edge_sub.where_clause is not None:
                    self.raw_conditions.append(edge_sub.where_clause)
                    edge_sub.where_clause = None
                if len(edge_sub.path_list) > 1:
                    raise NotImplementedException(
                        "Subpath on an edge is not yet supported.")
                et = self._find_edge_table(edge_el)
                if edge_sub.upper > 1:
                    self._add_path_finding(prev_el, edge_el, next_el, et,
                                           edge_sub)
                else:
                    self._add_edge_joins(et, prev_table, next_table,
                                         edge_el.match_type,
                                         edge_el.variable_binding,
                                         prev_el.variable_binding,
                                         next_el.variable_binding)
            else:
                et = self._find_edge_table(edge_el)
                self._check_inheritance(et, edge_el)
                self._add_edge_joins(et, prev_table, next_table,
                                     edge_el.match_type,
                                     edge_el.variable_binding,
                                     prev_el.variable_binding,
                                     next_el.variable_binding)
            prev_el, prev_sub = next_el, next_sub
            prev_table = next_table

    def _length_only_fast_path(self, pattern: past.PathPattern,
                               var: str) -> bool:
        """True when the named path is consumed ONLY via path_length() on a
        plain ANY SHORTEST WALK pattern — then lengths come straight from
        iterativelength (the quantifier kernel) and the expensive
        shortestpath parent-tracking CTE is skipped entirely. Optimization
        beyond the reference (it always materializes the path list,
        match.cpp:745-760); results are identical because the shortest walk
        length IS the iterativelength value."""
        if not pattern.shortest or pattern.all or pattern.topk:
            return False
        fns = set()
        for col in self.m.column_list:
            if isinstance(col, a.FunctionCall) and col.args and \
                    isinstance(col.args[0], a.ColumnRef) and \
                    len(col.args[0].parts) == 1 and \
                    col.args[0].parts[0].lower() == var.lower() and \
                    col.name.lower() in _PATH_FUNCTIONS:
                fns.add(col.name.lower())
        if fns != {"path_length"}:
            return False
        # every quantified segment must be plain WALK (non-WALK modes use
        # existence search, where shortest length is not the answer)
        for i in range(1, len(pattern.path_elements), 2):
            _, sub = self._unwrap(pattern.path_elements[i])
            if sub is not None and sub.upper > 1 and \
                    self._effective_mode(sub) != 0:
                return False
        return True

    def _build_path_length_expr(self, pattern: past.PathPattern
                                ) -> a.Expression:
        """Total hop count without path materialization: quantified
        segments contribute add(__x.temp, iterativelength(...)), fixed
        segments contribute 1."""
        elements = pattern.path_elements
        total: Optional[a.Expression] = None
        prev_el, _ = self._unwrap(elements[0])
        for i in range(1, len(elements), 2):
            next_el, _ = self._unwrap(elements[i + 1])
            edge_el, edge_sub = self._unwrap(elements[i])
            if edge_sub is not None and edge_sub.upper > 1:
                et = self._find_edge_table(edge_el)
                self._ensure_cte1(edge_el, et, prev_el.variable_binding,
                                  edge_el.variable_binding,
                                  next_el.variable_binding)
                count_sql = count_table_sql(
                    et.source_pg_table, prev_el.variable_binding,
                    et.source_pk[0])
                seg: a.Expression = a.FunctionCall(name="add", args=[
                    a.ColumnRef(parts=("__x", "temp")),
                    a.FunctionCall(name="iterativelength", args=[
                        a.Constant(0),
                        a.SubqueryExpr(
                            subquery=parse_one_select(count_sql),
                            kind="SCALAR"),
                        a.ColumnRef(parts=(prev_el.variable_binding,
                                           "rowid")),
                        a.ColumnRef(parts=(next_el.variable_binding,
                                           "rowid"))])])
            else:
                seg = a.Constant(1)
            total = seg if total is None else a.FunctionCall(
                name="+", args=[total, seg], is_operator=True)
            prev_el, _ = self._unwrap(elements[i + 1])
        return total if total is not None else a.Constant(0)

    def _rewrite_path_columns(self, pattern: past.PathPattern):
        """CheckNamedSubpath equivalent (match.cpp:709-790)."""
        var = pattern.path_variable
        self._length_only = self._length_only_fast_path(pattern, var)
        new_columns = []
        for col in self.m.column_list:
            rewritten = self._try_rewrite_path_fn(col, var, pattern)
            new_columns.append(rewritten if rewritten is not None else col)
        self.m.column_list = new_columns

    def _try_rewrite_path_fn(self, col, var: str, pattern: past.PathPattern):
        if not isinstance(col, a.FunctionCall) or not col.args:
            return None
        arg0 = col.args[0]
        if not isinstance(arg0, a.ColumnRef) or len(arg0.parts) != 1 or \
                arg0.parts[0].lower() != var.lower():
            return None
        name = col.name.lower()
        if name not in _PATH_FUNCTIONS:
            return None
        alias = col.alias
        if name == "path_length" and getattr(self, "_length_only", False):
            out = self._build_path_length_expr(pattern)
            out.alias = alias or f"path_length({var})"
            return out
        path_expr = self._build_path_list_expr(pattern)
        if name == "element_id":
            out = path_expr
            out.alias = alias or f"element_id({var})"
            return out
        if name == "path_length":
            out = a.FunctionCall(name="//", args=[
                a.FunctionCall(name="len", args=[path_expr]),
                a.Constant(2)], is_operator=True)
            out.alias = alias or f"path_length({var})"
            return out
        begin = 1 if name == "vertices" else 2
        out = a.FunctionCall(name="list_slice", args=[
            path_expr, a.Constant(begin), a.Constant(-1), a.Constant(2)])
        out.alias = alias or f"{name}({var})"
        return out

    # -------------------------------------------------- property resolution
    def registered_properties(self, table: past.PropertyGraphTable
                              ) -> List[Tuple[str, str]]:
        """[(property_name, actual_column)] for a PG member table."""
        if table.no_columns:
            return []
        data_table = self._data_table(table)
        if table.all_columns:
            excl = {c.lower() for c in table.except_columns}
            return [(c, c) for c in data_table.column_names
                    if c.lower() not in excl]
        out = []
        for c in table.column_names:
            prop = table.column_aliases.get(c, c)
            out.append((prop, c))
        return out

    def _data_table(self, table: past.PropertyGraphTable):
        from .ddl import _resolve_table
        return _resolve_table(self.ex, table)

    def _resolve_property(self, binding: str, prop: str, written: str) -> str:
        table = self.alias_map.get(binding.lower())
        if table is None:
            raise BinderException(f"Property {written} is never registered!")
        if prop.lower() == "rowid":
            return "rowid"
        for p, c in self.registered_properties(table):
            if p.lower() == prop.lower():
                return c
        raise BinderException(f"Property {written} is never registered!")

    def normalize_expression(self, e: a.Expression) -> a.Expression:
        def fn(node):
            if isinstance(node, a.FunctionCall):
                # an unrewritten path function (unknown path variable, e.g.
                # element_id(a) — reference issue #68) must fail as a catalog
                # lookup BEFORE its arguments are column-validated, matching
                # DuckDB's bind order (complex_matching.test:85)
                from ..functions.scalar import function_not_found, \
                    get_function
                from ..functions.aggregate import get_aggregate
                name = node.name.lower()
                if get_function(name) is None and \
                        get_aggregate(name) is None and name != "unnest":
                    raise function_not_found(name)
                return None
            if isinstance(node, a.ColumnRef):
                parts = node.parts
                if len(parts) == 1:
                    name = parts[0]
                    if name.lower() in self.alias_map:
                        # whole-binding struct (reference emits struct_pack of
                        # the registered properties)
                        return self._binding_struct(name)
                    # unqualified: resolve across all bindings
                    hits = []
                    for alias in self.alias_order:
                        t = self.alias_map[alias.lower()]
                        for p, c in self.registered_properties(t):
                            if p.lower() == name.lower():
                                hits.append((alias, c))
                    if len(hits) >= 1:
                        alias, c = hits[0]
                        out = a.ColumnRef(parts=(alias, c))
                        out.alias = node.alias or name
                        return out
                    raise BinderException(
                        f"Property {name} is never registered!")
                if len(parts) == 2:
                    binding, prop = parts
                    if binding.lower() in ("shortest_path_cte", "__x") or \
                            binding.lower() in self.cte_names:
                        return node    # generated internal reference
                    if binding.lower() not in self.alias_map:
                        raise BinderException(
                            f"Property {'.'.join(parts)} is never registered!")
                    col = self._resolve_property(binding, prop,
                                                 ".".join(parts))
                    out = a.ColumnRef(parts=(binding, col))
                    out.alias = node.alias or prop
                    return out
                # COLUMNS entries may only be <col> or <binding>.<col>;
                # catalog/schema prefixes are rejected (reference
                # CheckColumnBinding, no_properties.test:49)
                raise BinderException(
                    f"Property {'.'.join(parts)} is never registered!")
            if isinstance(node, a.StructExtract):
                # a.x.y chains parsed as struct extract over column ref
                return None
            return None
        return walk_replace(_clone_expr(e), fn)

    def _binding_struct(self, binding: str) -> a.Expression:
        table = self.alias_map[binding.lower()]
        fields = []
        for p, c in self.registered_properties(table):
            fields.append((p, a.ColumnRef(parts=(binding, c))))
        out = a.StructExpr(fields=fields)
        out.alias = binding
        return out

    def _expand_star(self, star: a.Star) -> List[a.Expression]:
        out = []
        targets = []
        if star.relation is not None:
            if star.relation.lower() not in self.alias_map:
                raise BinderException(
                    f"Referenced table {star.relation} not found!")
            targets = [star.relation]
        else:
            targets = list(self.alias_order)
        excl = {x.lower() for x in star.exclude}
        for alias in targets:
            table = self.alias_map[alias.lower()]
            props = self.registered_properties(table)
            if table.all_columns:
                # star expansion iterates the reference's sorted property
                # map (ASCII order) — whole-binding structs keep table order
                props = sorted(props, key=lambda pc: pc[0])
            for p, c in props:
                if p.lower() in excl:
                    continue
                ref = a.ColumnRef(parts=(alias, c))
                ref.alias = p
                out.append(ref)
        return out

    # ---------------------------------------------------------------- driver
    def transpile(self) -> a.SelectStatement:
        for pattern in self.m.path_patterns:
            self._process_pattern(pattern)

        # default COLUMNS: star per vertex binding (transform_pgq.cpp:312-322)
        columns = self.m.column_list
        if not columns:
            columns = []
            for pattern in self.m.path_patterns:
                for ref in pattern.path_elements:
                    el, _ = self._unwrap(ref)
                    if el.match_type == past.PGQMatchType.MATCH_VERTEX:
                        columns.append(a.Star(relation=el.variable_binding))

        select_list: List[a.Expression] = []
        for col in columns:
            if isinstance(col, a.Star):
                if col.relation is not None and \
                        col.relation.lower() not in self.alias_map:
                    continue   # reference drops unknown-relation stars
                select_list.extend(self._expand_star(col))
            elif isinstance(col, a.FunctionCall) and \
                    col.name.lower() == "path_length" and col.args and \
                    isinstance(col.args[0], a.ColumnRef) and \
                    len(col.args[0].parts) == 1 and \
                    col.args[0].parts[0].lower() not in self.alias_map:
                # un-rewritten path_length(unknown) columns are silently
                # dropped (reference match.cpp:1030-1046)
                continue
            else:
                select_list.append(self.normalize_expression(col))

        conditions = list(self.conditions)
        for raw in self.raw_conditions:
            conditions.append(self.normalize_expression(raw))
        if self.m.where_clause is not None:
            conditions.append(self.normalize_expression(self.m.where_clause))

        # FROM: cross join of all alias tables + extras. Edge tables come
        # first: the probe side drives output row order, and the host
        # engine's plans scan the (larger) edge side — keeps LIMIT-without-
        # ORDER test expectations aligned.
        ordered_aliases = [al for al in self.alias_order
                           if not self.alias_map[al.lower()].is_vertex_table]
        ordered_aliases += [al for al in self.alias_order
                            if self.alias_map[al.lower()].is_vertex_table]
        from_refs: List[a.TableRef] = []
        for alias in ordered_aliases:
            custom = self.custom_from.get(alias.lower())
            if custom is not None:
                from_refs.append(custom)
                continue
            t = self.alias_map[alias.lower()]
            from_refs.append(a.BaseTableRef(
                catalog=t.catalog_name or None,
                schema=t.schema_name or None,
                table=t.table_name, alias=alias))
        from_refs.extend(self.extra_from)
        if not from_refs:
            from_table: a.TableRef = a.EmptyTableRef()
        else:
            from_table = from_refs[0]
            for ref in from_refs[1:]:
                from_table = a.JoinRef(left=from_table, right=ref,
                                       join_type="CROSS")

        where = None
        if conditions:
            where = conditions[0] if len(conditions) == 1 else \
                a.Conjunction(op="AND", children=conditions)
        node = a.SelectNode(select_list=select_list, from_table=from_table,
                            where=where)
        return a.SelectStatement(node=node, ctes=self.ctes)


def _clone_expr(e):
    if e is None:
        return None
    if isinstance(e, a.Expression):
        if isinstance(e, (a.Constant, a.ColumnRef, a.Star, a.Positional)):
            return dataclasses.replace(e)
        clone = dataclasses.replace(e)
        # deep-clone children
        def deep(x):
            return _clone_expr(x)
        if isinstance(clone, (a.FunctionCall, a.AggregateCall)):
            clone.args = [deep(x) for x in clone.args]
        elif isinstance(clone, a.Comparison):
            clone.left = deep(clone.left)
            clone.right = deep(clone.right)
        elif isinstance(clone, a.Conjunction):
            clone.children = [deep(x) for x in clone.children]
        elif isinstance(clone, (a.Not, a.IsNull, a.Cast, a.StructExtract,
                                a.Collate)):
            clone.child = deep(clone.child)
        elif isinstance(clone, a.Between):
            clone.expr = deep(clone.expr)
            clone.lower = deep(clone.lower)
            clone.upper = deep(clone.upper)
        elif isinstance(clone, a.InList):
            clone.expr = deep(clone.expr)
            clone.values = [deep(x) for x in clone.values]
        elif isinstance(clone, a.Case):
            clone.base = deep(clone.base)
            clone.whens = [(deep(w), deep(t)) for w, t in clone.whens]
            clone.else_expr = deep(clone.else_expr)
        elif isinstance(clone, a.ArrayIndex):
            clone.child = deep(clone.child)
            clone.index = deep(clone.index)
            clone.slice_stop = deep(clone.slice_stop)
            clone.slice_step = deep(clone.slice_step)
        elif isinstance(clone, a.Like):
            clone.left = deep(clone.left)
            clone.pattern = deep(clone.pattern)
        elif isinstance(clone, a.ListExpr):
            clone.values = [deep(x) for x in clone.values]
        elif isinstance(clone, a.StructExpr):
            clone.fields = [(k, deep(v)) for k, v in clone.fields]
        return clone
    return e


def bind_graph_table(executor, ref) -> Tuple[a.SelectStatement, str]:
    m = ref.match_expr
    transpiler = MatchTranspiler(executor, m)
    stmt = transpiler.transpile()
    alias = ref.alias or m.alias or "unnamed_subquery"
    return stmt, alias
