"""Statement executor: SELECT pipeline, DML/DDL, set ops, CTEs, joins.

Pipeline per SELECT node: FROM -> WHERE -> aggregate -> HAVING -> project ->
DISTINCT -> ORDER/LIMIT, all whole-column vectorized. Joins dispatch across
three backends with identical ordering (exec/join.py): numpy, native C++
lookup-table probe, and the TPU kernels in duckpgq_tpu.ops.rel.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..errors import (BinderException, CatalogException, ConstraintException,
                      ConversionException, InternalException,
                      InvalidInputException, NotImplementedException,
                      ParserException)
from ..functions.aggregate import get_aggregate
from ..sql import ast as a
from ..storage.catalog import View
from ..storage.table import ColumnDefinition, DataTable
from ..storage.vector import Vector
from ..types import (BIGINT, BOOLEAN, DOUBLE, INTEGER, LogicalType, STRUCT,
                     TypeId, VARCHAR, SQLNULL, value_to_string)
from .cast import cast_vector
from .expression import (Evaluator, OuterScope, apply_collation,
                         collect_aggregates, collect_collations,
                         collect_windows, fingerprint)
from .join import cross_pairs, equi_join_pairs, factorize_keys
from .relation import Binding, Relation
from .result import QueryResult


def _ast_references_table(obj, name: str, _depth: int = 0) -> bool:
    """Does this AST subtree contain an unqualified table reference to
    ``name``? (drives recursive-CTE detection)."""
    if _depth > 200 or obj is None or isinstance(
            obj, (str, bytes, int, float, bool, np.ndarray)):
        return False
    if isinstance(obj, a.BaseTableRef):
        if obj.schema is None and obj.table.lower() == name:
            return True
    if isinstance(obj, (list, tuple)):
        return any(_ast_references_table(x, name, _depth + 1) for x in obj)
    fields = getattr(obj, "__dataclass_fields__", None)
    if fields is None:
        return False
    return any(_ast_references_table(getattr(obj, f), name, _depth + 1)
               for f in fields)


class CTEEnv:
    """Lexically scoped CTE environment."""

    def __init__(self, parent: Optional["CTEEnv"] = None):
        self.parent = parent
        self.entries: Dict[str, a.CTE] = {}
        self.cache: Dict[str, QueryResult] = {}

    def lookup(self, name: str):
        env = self
        while env is not None:
            cte = env.entries.get(name.lower())
            if cte is not None:
                return env, cte
            env = env.parent
        return None, None


class Executor:
    def __init__(self, connection):
        self.connection = connection

    @property
    def catalog(self):
        return self.connection.catalog

    def default_schema(self) -> str:
        sp = self.connection.settings.get("search_path")
        if sp:
            return str(sp).split(",")[0].strip()
        return "main"

    def schema_search_order(self, explicit):
        if explicit:
            return [explicit]
        sp = self.connection.settings.get("search_path")
        out = []
        if sp:
            out.extend(x.strip() for x in str(sp).split(",") if x.strip())
        out.append("main")
        return out

    # ================================================================ dispatch
    def execute_statement(self, stmt: a.Statement) -> QueryResult:
        if isinstance(stmt, a.SelectStatement):
            return self.execute_select(stmt)
        if isinstance(stmt, a.CreateTableStatement):
            return self.execute_create_table(stmt)
        if isinstance(stmt, a.CreateViewStatement):
            view = View(name=stmt.name, query=stmt.query,
                        column_aliases=stmt.column_aliases,
                        schema=stmt.schema or "main")
            self.catalog.create_view(view, or_replace=stmt.or_replace)
            return QueryResult([], [])
        if isinstance(stmt, a.CreateMacroStatement):
            from ..storage.catalog import Macro
            macro = Macro(name=stmt.name, params=stmt.params,
                          defaults=stmt.defaults, body=stmt.body,
                          query=stmt.query, schema=stmt.schema or "main")
            self.catalog.create_macro(macro, or_replace=stmt.or_replace,
                                      if_not_exists=stmt.if_not_exists)
            return QueryResult([], [])
        if isinstance(stmt, a.CreateSchemaStatement):
            self.catalog.create_schema(stmt.name, stmt.if_not_exists)
            return QueryResult([], [])
        if isinstance(stmt, a.CreateSequenceStatement):
            seqs = self.connection.database.sequences
            key = stmt.name.lower()
            if key in seqs and not (stmt.if_not_exists or stmt.or_replace):
                raise CatalogException(
                    f'Sequence with name "{stmt.name}" already exists!')
            if key not in seqs or stmt.or_replace:
                seqs[key] = {"next": stmt.start, "inc": stmt.increment,
                             "cur": None}
            return QueryResult([], [])
        if isinstance(stmt, a.CreateTypeStatement):
            from ..types import ENUM, USER_TYPES
            key = stmt.name.lower()
            if key in USER_TYPES and not (stmt.if_not_exists or
                                          stmt.or_replace):
                raise CatalogException(
                    f'Type with name "{stmt.name}" already exists!')
            if key not in USER_TYPES or stmt.or_replace:
                seen = set()
                for v in stmt.values:
                    if v in seen:
                        raise InvalidInputException(
                            f"Enum type needs unique values, value "
                            f"'{v}' was repeated")
                    seen.add(v)
                USER_TYPES[key] = ENUM(stmt.values, stmt.name)
            return QueryResult([], [])
        if isinstance(stmt, a.InsertStatement):
            return self.execute_insert(stmt)
        if isinstance(stmt, a.UpdateStatement):
            return self.execute_update(stmt)
        if isinstance(stmt, a.DeleteStatement):
            return self.execute_delete(stmt)
        if isinstance(stmt, a.DropStatement):
            return self.execute_drop(stmt)
        if isinstance(stmt, a.AlterStatement):
            return self.execute_alter(stmt)
        if isinstance(stmt, a.CreatePropertyGraphStatement):
            from ..pgq.ddl import execute_create_property_graph
            return execute_create_property_graph(self, stmt.info)
        if isinstance(stmt, a.CopyStatement):
            return self.execute_copy(stmt)
        if isinstance(stmt, a.ExplainStatement):
            return self.execute_explain(stmt)
        if isinstance(stmt, a.PragmaStatement):
            from ..pgq.pragma import execute_pragma
            return execute_pragma(self, stmt)
        if isinstance(stmt, a.SetStatement):
            if stmt.name == "__reset_all__":
                if "pgq_mesh_devices" in self.connection.settings:
                    from ..parallel import sql_mesh
                    sql_mesh.configure(None)
                self.connection.settings.clear()
                return QueryResult([], [])
            if stmt.name.startswith("__reset__:"):
                key = stmt.name[len("__reset__:"):]
                self.connection.settings.pop(key, None)
                if key == "pgq_mesh_devices":
                    # undo the routing side effect too
                    from ..parallel import sql_mesh
                    sql_mesh.configure(None)
                return QueryResult([], [])
            if stmt.name != "__noop__":
                if stmt.name.lower() == "pgq_mesh_devices":
                    # SQL -> distributed-mesh kernel routing (process-wide,
                    # like the reference's global parser-override setting);
                    # validate BEFORE storing so a rejected value never
                    # lingers in connection.settings
                    from ..parallel import sql_mesh
                    try:
                        sql_mesh.configure(int(stmt.value))
                    except (TypeError, ValueError):
                        from ..errors import BinderException
                        raise BinderException(
                            "pgq_mesh_devices expects an integer device "
                            "count")
                self.connection.settings[stmt.name] = stmt.value
            return QueryResult([], [])
        if isinstance(stmt, a.DescribeStatement):
            return self.execute_describe(stmt)
        if isinstance(stmt, a.SummarizeStatement):
            return self.execute_summarize(stmt)
        if isinstance(stmt, a.ImportDatabaseStatement):
            return self.execute_import_database(stmt)
        if isinstance(stmt, a.AttachStatement):
            return self.execute_attach(stmt)
        if isinstance(stmt, a.DetachStatement):
            self.connection.database.detach(stmt.name)
            return QueryResult([], [])
        if isinstance(stmt, a.UseStatement):
            self.connection.default_catalog = stmt.name
            return QueryResult([], [])
        if isinstance(stmt, a.CommentStatement):
            return self._execute_comment(stmt)
        if isinstance(stmt, a.TransactionStatement):
            return self._execute_transaction(stmt)
        if isinstance(stmt, a.PivotStatement):
            return self._execute_pivot(stmt)
        if isinstance(stmt, a.UnpivotStatement):
            return self._execute_unpivot(stmt)
        if isinstance(stmt, a.CheckpointStatement):
            self.connection.database.checkpoint()
            return QueryResult([], [])
        if isinstance(stmt, a.ExportDatabaseStatement):
            return self.execute_export_database(stmt)
        raise InternalException(f"unhandled statement {type(stmt).__name__}")

    # ================================================================= SELECT
    def execute_select(self, stmt: a.SelectStatement,
                       outer: Optional[OuterScope] = None,
                       cte_env: Optional[CTEEnv] = None) -> QueryResult:
        env = CTEEnv(cte_env)
        for cte in stmt.ctes:
            env.entries[cte.name.lower()] = cte
        result, order_ctx = self.execute_query_node(
            stmt.node, outer, env,
            order_exprs=tuple(ob.expr for ob in (stmt.order_by or ())))
        # ORDER BY / LIMIT / OFFSET
        if stmt.order_by:
            limit_hint = None
            if stmt.limit is not None and \
                    not getattr(stmt, "limit_percent", False):
                try:
                    limit_hint = int(self._const_scalar(stmt.limit)) + \
                        (int(self._const_scalar(stmt.offset))
                         if stmt.offset is not None else 0)
                except (TypeError, ValueError):
                    limit_hint = None
            result = self.apply_order(result, order_ctx, stmt.order_by,
                                      outer, limit_hint=limit_hint)
        if stmt.limit is not None or stmt.offset is not None:
            n = result.row_count
            off = 0
            if stmt.offset is not None:
                off = int(self._const_scalar(stmt.offset))
            lim = n
            if stmt.limit is not None:
                if getattr(stmt, "limit_percent", False):
                    lim = int(float(self._const_scalar(stmt.limit))
                              * n / 100.0)
                else:
                    lim = int(self._const_scalar(stmt.limit))
            idx = np.arange(off, min(off + lim, n))
            result = QueryResult(result.names,
                                 [c.take(idx) for c in result.columns])
            order_ctx = None
        return result

    def _const_scalar(self, expr: a.Expression):
        rel = Relation([Vector(BIGINT, np.zeros(1, dtype=np.int64))],
                       [Binding("", ["__dummy__"], [0])])
        ev = Evaluator(self, rel)
        v = ev.evaluate(expr)
        return v.value(0)

    def execute_query_node(self, node: a.QueryNode, outer, env,
                           order_exprs=()
                           ) -> Tuple[QueryResult, Optional[dict]]:
        if isinstance(node, a.SetOpNode):
            return self.execute_set_op(node, outer, env), None
        return self.execute_select_node(node, outer, env,
                                        order_exprs=order_exprs)

    # ------------------------------------------------------------- set ops
    def execute_set_op(self, node: a.SetOpNode, outer, env) -> QueryResult:
        left = self.execute_select(node.left, outer, env)
        right = self.execute_select(node.right, outer, env)
        if node.by_name:
            order = []
            for nm in left.names:
                try:
                    order.append([n.lower() for n in right.names].index(
                        nm.lower()))
                except ValueError:
                    raise BinderException(
                        f'column "{nm}" not found in UNION BY NAME operand')
            right = QueryResult(left.names, [right.columns[i] for i in order])
        if len(left.columns) != len(right.columns):
            raise BinderException(
                "Set operations can only apply to expressions with the same "
                "number of result columns")
        rcols = []
        for lc, rc in zip(left.columns, right.columns):
            if rc.type != lc.type:
                if lc.type.id == TypeId.SQLNULL:
                    # cast left lazily below by rebuilding
                    rcols.append(rc)
                    continue
                if rc.type.id != TypeId.SQLNULL and \
                        lc.type.is_numeric and rc.type.is_numeric:
                    # unify to the covering numeric type (DECIMAL scales
                    # must widen, not truncate to the left side's scale)
                    from ..types import max_numeric_type
                    try:
                        rc = cast_vector(rc, max_numeric_type(lc.type,
                                                              rc.type))
                    except ConversionException:
                        pass
                    rcols.append(rc)
                    continue
                try:
                    rc = cast_vector(rc, lc.type)
                except ConversionException:
                    pass
            rcols.append(rc)
        # unify left columns with the (possibly widened) right types
        lcols = []
        for lc, rc in zip(left.columns, rcols):
            if lc.type.id == TypeId.SQLNULL and rc.type.id != TypeId.SQLNULL:
                lc = cast_vector(lc, rc.type)
            elif lc.type != rc.type and lc.type.is_numeric and \
                    rc.type.is_numeric and rc.type.id == TypeId.DECIMAL:
                lc = cast_vector(lc, rc.type)
            lcols.append(lc)
        op = node.op
        if op == "UNION_ALL":
            cols = [Vector.concat([l, r]) for l, r in zip(lcols, rcols)]
            return QueryResult(left.names, cols)
        lrows = [tuple(c.value(i) for c in lcols)
                 for i in range(len(lcols[0]) if lcols else 0)]
        rrows = [tuple(c.value(i) for c in rcols)
                 for i in range(len(rcols[0]) if rcols else 0)]
        if op == "UNION":
            seen = {}
            for row in lrows + rrows:
                if row not in seen:
                    seen[row] = True
            rows = list(seen)
        elif op in ("EXCEPT", "EXCEPT_ALL"):
            if op == "EXCEPT":
                rset = set(rrows)
                seen = {}
                for row in lrows:
                    if row not in rset and row not in seen:
                        seen[row] = True
                rows = list(seen)
            else:
                # bag semantics: each row keeps count_l - count_r copies
                from collections import Counter
                remaining = Counter(rrows)
                rows = []
                for row in lrows:
                    if remaining.get(row, 0) > 0:
                        remaining[row] -= 1
                    else:
                        rows.append(row)
        elif op in ("INTERSECT", "INTERSECT_ALL"):
            if op == "INTERSECT":
                rset = set(rrows)
                seen = {}
                for row in lrows:
                    if row in rset and row not in seen:
                        seen[row] = True
                rows = list(seen)
            else:
                # bag semantics: min(count_l, count_r) copies per row
                from collections import Counter
                remaining = Counter(rrows)
                rows = []
                for row in lrows:
                    if remaining.get(row, 0) > 0:
                        remaining[row] -= 1
                        rows.append(row)
        else:
            raise InternalException(f"bad set op {op}")
        cols = []
        for j, lc in enumerate(lcols):
            cols.append(Vector.from_values([r[j] for r in rows], lc.type))
        return QueryResult(left.names, cols)

    # ------------------------------------------------------ PIVOT/UNPIVOT
    def _execute_pivot(self, stmt: a.PivotStatement) -> QueryResult:
        """PIVOT source ON col [IN (...)] [USING aggs] [GROUP BY cols]:
        rewrite to one aggregate column per distinct ON value
        (agg(CASE WHEN col = v THEN arg END)); default USING is count(*),
        default GROUP BY is every other column (DuckDB semantics)."""
        rel = self.execute_from(stmt.source, None, None)
        ev = Evaluator(self, rel, None)
        on_vec = ev.evaluate(stmt.on)
        if stmt.in_values is not None:
            values = [self._const_scalar(v) for v in stmt.in_values]
        else:
            seen = set()
            values = []
            for i in range(len(on_vec)):
                if not on_vec.validity[i]:
                    continue
                v = self._hashable(on_vec.value(i))
                if v not in seen:
                    seen.add(v)
                    values.append(on_vec.value(i))
            values.sort()
        using = list(stmt.using)
        if not using:
            using = [a.AggregateCall(name="count_star", args=[])]
        for u in using:
            if not isinstance(u, a.AggregateCall):
                raise BinderException(
                    "PIVOT USING expects aggregate function expressions")
        # default GROUP BY: every visible column except the ON column and
        # columns the USING aggregates read
        group_by = list(stmt.group_by)
        if not group_by:
            used = set()

            def collect(e):
                if isinstance(e, a.ColumnRef):
                    used.add(e.parts[-1].lower())
                fields = getattr(e, "__dataclass_fields__", None)
                if fields:
                    for f in fields:
                        v = getattr(e, f)
                        for x in (v if isinstance(v, (list, tuple))
                                  else [v]):
                            if isinstance(x, a.Expression):
                                collect(x)
            collect(stmt.on)
            for u in using:
                collect(u)
            for b in rel.bindings:
                for name, _ in b.visible():
                    if name.lower() not in used:
                        group_by.append(a.ColumnRef(parts=(name,)))
        select_list: List[a.Expression] = list(group_by)
        for v in values:
            cond = a.Comparison(op="=", left=stmt.on,
                                right=a.Constant(v, on_vec.type))
            for u in using:
                if u.name == "count_star" or not u.args:
                    arg = a.Case(whens=[(cond, a.Constant(1))])
                    agg = a.AggregateCall(name="count", args=[arg])
                else:
                    arg = a.Case(whens=[(cond, u.args[0])])
                    agg = a.AggregateCall(name=u.name, args=[arg],
                                          distinct=u.distinct)
                vname = value_to_string(v, on_vec.type)
                agg.alias = vname if len(using) == 1 else \
                    f"{vname}_{u.alias or u.name}"
                select_list.append(agg)
        node = a.SelectNode(select_list=select_list,
                            from_table=stmt.source, groups=list(group_by))
        sel = a.SelectStatement(node=node, order_by=list(stmt.order_by),
                                limit=stmt.limit, offset=stmt.offset)
        return self.execute_select(sel)

    def _execute_unpivot(self, stmt: a.UnpivotStatement) -> QueryResult:
        """UNPIVOT source ON c1, ... INTO NAME n VALUE v: one output row
        per (source row, ON column), NULL values excluded (DuckDB)."""
        selects = []
        for c in stmt.on:
            name_e = a.Constant(stmt.name_col and c, None)
            name_e.alias = stmt.name_col
            val_e = a.ColumnRef(parts=(c,), alias=stmt.value_col)
            node = a.SelectNode(
                select_list=[a.Star(exclude=tuple(stmt.on)),
                             name_e, val_e],
                from_table=stmt.source,
                where=a.IsNull(child=a.ColumnRef(parts=(c,)),
                               negated=True))
            selects.append(a.SelectStatement(node=node))
        tree = selects[0]
        for nxt in selects[1:]:
            tree = a.SelectStatement(node=a.SetOpNode(
                op="UNION_ALL", left=tree, right=nxt))
        tree.order_by = list(stmt.order_by)
        tree.limit = stmt.limit
        tree.offset = stmt.offset
        return self.execute_select(tree)

    # ----------------------------------------------- GROUPING SETS family
    def _execute_grouping_sets(self, node: a.SelectNode, outer, env):
        """GROUP BY GROUPING SETS / ROLLUP / CUBE: one aggregation per set,
        results unioned; group expressions absent from a set surface as
        NULL in that set's rows — including inside larger select
        expressions (recursive rewrite; aggregate arguments still see the
        source rows). DISTINCT dedups across the union. Returns
        (QueryResult, order_ctx) like execute_select_node."""
        import dataclasses

        from .expression import fingerprint
        if node.distinct_on:
            raise NotImplementedException(
                "DISTINCT ON with GROUPING SETS is not supported")
        all_fps = {fingerprint(g) for s in node.grouping_sets for g in s}

        def rewrite(obj, in_set, top=False):
            if not isinstance(obj, a.Expression):
                return obj
            if isinstance(obj, a.FunctionCall) and \
                    obj.name.lower() in ("grouping", "grouping_id"):
                # grouping(e1, ..): bitmask, MSB-first, 1 for expressions
                # NOT aggregated in this set (DuckDB/standard)
                mask = 0
                for arg in obj.args:
                    mask = (mask << 1) | (
                        0 if fingerprint(arg) in in_set else 1)
                return a.Constant(value=mask, type=BIGINT, alias=obj.alias)
            fp = fingerprint(obj)
            if fp in all_fps and fp not in in_set:
                alias = obj.alias or (self.derive_name(obj) if top else None)
                return a.Constant(value=None, type=SQLNULL, alias=alias)
            if isinstance(obj, (a.AggregateCall, a.SubqueryExpr)):
                # aggregate args see source rows; subqueries own their scope
                return obj
            fields = getattr(obj, "__dataclass_fields__", None)
            if fields is None:
                return obj
            changes = {}
            for f in fields:
                v = getattr(obj, f)
                if isinstance(v, a.Expression):
                    nv = rewrite(v, in_set)
                    if nv is not v:
                        changes[f] = nv
                elif isinstance(v, list):
                    nl = [rewrite(x, in_set) for x in v]
                    if any(x is not y for x, y in zip(nl, v)):
                        changes[f] = nl
                elif isinstance(v, tuple):
                    nt = tuple(rewrite(x, in_set) for x in v)
                    if any(x is not y for x, y in zip(nt, v)):
                        changes[f] = nt
            return dataclasses.replace(obj, **changes) if changes else obj

        pieces: List[QueryResult] = []
        for s in node.grouping_sets:
            in_set = {fingerprint(g) for g in s}
            sub = dataclasses.replace(
                node,
                select_list=[rewrite(e, in_set, top=True)
                             for e in node.select_list],
                having=rewrite(node.having, in_set),
                groups=list(s), grouping_sets=None, distinct=False)
            res, _ = self.execute_select_node(sub, outer, env)
            pieces.append(res)
        names = pieces[0].names
        out_cols: List[Vector] = []
        for j in range(len(names)):
            target = next((p.columns[j].type for p in pieces
                           if p.columns[j].type.id != TypeId.SQLNULL),
                          SQLNULL)
            casted = []
            for p in pieces:
                c = p.columns[j]
                if c.type != target and c.type.id != TypeId.SQLNULL:
                    c = cast_vector(c, target)
                casted.append(c)
            out_cols.append(Vector.concat(casted))
        result = QueryResult(names, out_cols)
        if node.distinct:
            result = self.apply_distinct(result, [], None, outer, None)
        has_star = any(isinstance(e, a.Star) for e in node.select_list)
        order_ctx = None if has_star else {
            "rel": Relation([], []),
            "replacements": {},
            "fps": [fingerprint(e) for e in node.select_list],
        }
        return result, order_ctx

    # ------------------------------------------------------ recursive CTE
    def _execute_recursive_cte(self, key: str, cte: a.CTE,
                               env: "CTEEnv") -> QueryResult:
        """WITH RECURSIVE r AS (<base> UNION [ALL] <recursive>) — standard
        semi-naive iteration: evaluate the base once, then repeatedly
        evaluate the recursive part with r bound to the PREVIOUS
        iteration's new rows, accumulating until no new rows appear
        (UNION dedups globally; UNION ALL appends)."""
        node = cte.query.node
        if not isinstance(node, a.SetOpNode) or \
                node.op not in ("UNION", "UNION_ALL"):
            raise BinderException(
                f"Recursive CTE {cte.name} must be of the form "
                "<base query> UNION [ALL] <recursive query>")
        if _ast_references_table(node.left, key):
            raise BinderException(
                f"Recursive CTE {cte.name}: the non-recursive (left) part "
                "may not reference the CTE itself")
        dedup = node.op == "UNION"
        base = self.execute_select(node.left, None, env)
        names = list(base.names)
        types = [c.type for c in base.columns]

        def rows_of(res):
            n = len(res.columns[0]) if res.columns else 0
            return [tuple(c.value(i) for c in res.columns)
                    for i in range(n)]

        def result_from(rows):
            cols = [Vector.from_values([r[j] for r in rows], types[j])
                    for j in range(len(types))]
            return QueryResult(names, cols)

        seen = set()
        if dedup:
            working = []
            for row in rows_of(base):
                if row not in seen:
                    seen.add(row)
                    working.append(row)
        else:
            working = rows_of(base)
        acc = list(working)
        max_iters = int(self.connection.settings.get(
            "max_recursive_cte_iterations", 10_000_000))
        it = 0
        while working:
            it += 1
            if it > max_iters:
                raise InvalidInputException(
                    f"Recursive CTE {cte.name} exceeded "
                    f"{max_iters} iterations")
            env.cache[key] = result_from(working)
            nxt = self.execute_select(node.right, None, env)
            if len(nxt.columns) != len(types):
                raise BinderException(
                    "Set operations can only apply to expressions with "
                    "the same number of result columns")
            cols = []
            for c, t in zip(nxt.columns, types):
                if c.type.id != t.id and t.id != TypeId.SQLNULL:
                    c = cast_vector(c, t)
                cols.append(c)
            rows = rows_of(QueryResult(names, cols))
            if dedup:
                fresh = []
                for row in rows:
                    if row not in seen:
                        seen.add(row)
                        fresh.append(row)
            else:
                fresh = rows
            acc.extend(fresh)
            working = fresh
        final = result_from(acc)
        env.cache[key] = final
        return final

    # --------------------------------------------------------- SELECT node
    def _try_triangle_count_node(self, node: a.SelectNode):
        """SELECT count(*) FROM GRAPH_TABLE (<undirected 3-cycle>) — route
        to the closed-triangle counting kernel instead of the O(E^2/V)
        wedge join (pgq/triangle.py; reference workload bi.test BI17).
        Returns (QueryResult, order_ctx) or None for the generic plan."""
        if not isinstance(node.from_table, a.GraphTableRef):
            return None
        if node.where is not None or node.groups or node.group_all or \
                node.having is not None or node.qualify is not None or \
                node.distinct or node.grouping_sets is not None or \
                len(node.select_list) != 1:
            return None
        agg = node.select_list[0]
        if not isinstance(agg, a.AggregateCall) or \
                agg.name != "count_star" or agg.filter is not None:
            return None
        from ..pgq.triangle import try_triangle_count
        cnt = try_triangle_count(self, node.from_table)
        if cnt is None:
            return None
        result = QueryResult([self.derive_name(agg)],
                             [Vector.from_values([cnt], BIGINT)])
        order_ctx = {"rel": Relation([], []), "replacements": {},
                     "fps": [fingerprint(agg)]}
        return result, order_ctx

    def execute_select_node(self, node: a.SelectNode, outer, env,
                            order_exprs=()
                            ) -> Tuple[QueryResult, Optional[dict]]:
        if node.grouping_sets is not None:
            return self._execute_grouping_sets(node, outer, env)
        tri = self._try_triangle_count_node(node)
        if tri is not None:
            return tri
        rel = self.execute_from_filtered(node.from_table, node.where, outer,
                                         env)
        if getattr(node, "sample", None):
            rel = self._apply_sample(rel, node.sample)
        node = self._expand_columns_in_exprs(node, rel)

        # aggregate detection; ORDER BY may use aggregates not in the
        # select list (SELECT g FROM t GROUP BY g ORDER BY count(*)) — they
        # must be computed during aggregation, then _bind_order_expr finds
        # them via the replacement fingerprints
        aggs: List[a.AggregateCall] = []
        for e in node.select_list:
            collect_aggregates(e, aggs)
        collect_aggregates(node.having, aggs)
        qualify = None
        if node.qualify is not None:
            qualify = self._resolve_qualify_expr(node.qualify, node)
            collect_aggregates(qualify, aggs)
        if aggs or node.groups or node.group_all:
            for e in order_exprs:
                collect_aggregates(e, aggs)
        has_agg = bool(aggs) or bool(node.groups) or node.group_all

        replacements: Dict[str, int] = {}
        if has_agg:
            rel, replacements = self.apply_aggregate(node, rel, outer, aggs,
                                                     env)
            if node.having is not None:
                ev = Evaluator(self, rel, outer, replacements, env=env)
                cond = ev.as_bool(ev.evaluate(node.having))
                mask = cond.data.astype(bool) & cond.validity
                rel = rel.filter(mask)

        # window functions (computed post-aggregate, pre-projection)
        wins: List[a.WindowCall] = []
        for e in node.select_list:
            collect_windows(e, wins)
        collect_windows(qualify, wins)
        if wins:
            rel, replacements = self.apply_windows(rel, outer, replacements,
                                                   env, wins)
        if qualify is not None:
            # QUALIFY filters AFTER window computation, BEFORE projection
            # (DuckDB semantics; windows are evaluated over the unfiltered
            # input — window columns already live in rel, so filtering rel
            # here preserves them for the projection)
            ev = Evaluator(self, rel, outer, replacements, env=env)
            cond = ev.as_bool(ev.evaluate(qualify))
            mask = cond.data.astype(bool) & cond.validity
            rel = rel.filter(mask)

        # projection
        ev = Evaluator(self, rel, outer, replacements, env=env)
        out_names: List[str] = []
        out_cols: List[Vector] = []
        out_fps: List[str] = []
        unnest_slots: List[int] = []
        unnest_struct_slots: set = set()
        for e in node.select_list:
            if isinstance(e, a.Star):
                repl = {nm.lower(): ex for ex, nm in e.replace}
                unused = set(repl)
                for b_alias, name, col in self.expand_star(rel, e):
                    out_names.append(name)
                    if name.lower() in repl:
                        # SELECT * REPLACE (expr AS name)
                        out_cols.append(ev.evaluate(repl[name.lower()]))
                        out_fps.append(f"col:{name.lower()}")
                        unused.discard(name.lower())
                        continue
                    out_cols.append(col)
                    out_fps.append(f"col:{b_alias.lower()}.{name.lower()}"
                                   if b_alias else f"col:{name.lower()}")
                if unused:
                    raise BinderException(
                        f'Column "{sorted(unused)[0]}" in REPLACE clause '
                        "not found in table")
            elif isinstance(e, a.FunctionCall) and \
                    e.name.lower() == "unnest" and len(e.args) == 1:
                # top-level UNNEST: lists expand rows (after projection),
                # structs expand columns; recursive := true flattens
                # nested lists fully and nested structs into columns
                # (host semantics; the named-arg set is validated)
                recursive = False
                for k, v in e.kwargs:
                    kl = k.lower()
                    if kl == "recursive":
                        rv = ev.evaluate(v).value(0)
                        recursive = bool(rv)
                    elif kl == "max_depth":
                        pass  # accepted, only meaningful with recursive
                    else:
                        raise BinderException(
                            f'Invalid named parameter "{k}" for function '
                            f"unnest")
                vec = ev.evaluate(e.args[0])
                if recursive and vec.type.id == TypeId.LIST:
                    vec = self._flatten_list_vector(vec)
                if vec.type.id == TypeId.STRUCT:
                    for nm, fvec in self._struct_unnest_columns(
                            vec, recursive):
                        out_names.append(nm)
                        out_cols.append(fvec)
                        out_fps.append(f"col:{nm.lower()}")
                    continue
                unnest_slots.append(len(out_cols))
                if recursive and vec.type.id == TypeId.LIST and \
                        vec.type.child is not None and \
                        vec.type.child.id == TypeId.STRUCT:
                    unnest_struct_slots.add(len(out_cols))
                out_names.append(e.alias or "unnest")
                out_cols.append(vec)
                out_fps.append(fingerprint(e))
            else:
                vec = ev.evaluate(e)
                out_names.append(self.derive_name(e))
                out_cols.append(vec)
                out_fps.append(fingerprint(e))
        if out_cols and rel.row_count == 0:
            out_cols = [c.slice(0, 0) if len(c) else c for c in out_cols]
        # scalar select without FROM produces one row; handled by EmptyTableRef
        if unnest_slots:
            out_cols = self._expand_unnest(out_cols, unnest_slots)
            # recursive unnest over a list of structs: the row-expanded
            # struct column further expands into per-field columns
            for s in sorted(unnest_struct_slots, reverse=True):
                pieces = self._struct_unnest_columns(out_cols[s], True)
                out_cols[s:s + 1] = [fv for _, fv in pieces]
                out_names[s:s + 1] = [nm for nm, _ in pieces]
                out_fps[s:s + 1] = [f"col:{nm.lower()}" for nm, _ in pieces]

        result = QueryResult(out_names, out_cols)

        # DISTINCT
        if node.distinct:
            result = self.apply_distinct(result, node.distinct_on, rel, outer,
                                         replacements)

        order_ctx = {
            "rel": rel,
            "replacements": replacements,
            "fps": out_fps,
        }
        return result, order_ctx

    @staticmethod
    def _flatten_list_vector(vec: Vector) -> Vector:
        """unnest(.., recursive := true) on LIST: fully flatten nested
        lists per row (host semantics: [[1,2],[3]] unnests to 1,2,3)."""
        from ..types import LIST as _LIST

        def flat(v):
            out = []
            for el in v:
                if isinstance(el, list):        # nested list (structs are
                    out.extend(flat(el))        # tuples — not flattened)
                else:
                    out.append(el)
            return out

        t = vec.type
        depth = 0
        while t.id == TypeId.LIST and t.child is not None and \
                t.child.id == TypeId.LIST:
            t = t.child
            depth += 1
        if depth == 0:
            return vec
        n = len(vec)
        data = np.empty(n, dtype=object)
        for i in range(n):
            if vec.validity[i] and vec.data[i] is not None:
                data[i] = flat(list(vec.data[i]))
        return Vector(t, data, vec.validity.copy())

    @staticmethod
    def _struct_unnest_columns(vec: Vector, recursive: bool):
        """unnest(STRUCT) expands into one column per field (no row
        change); with recursive, nested structs flatten into columns
        too."""
        n = len(vec)
        out = []
        for k, (nm, ft) in enumerate(vec.type.fields or ()):
            vals = []
            for i in range(n):
                v = vec.data[i] if vec.validity[i] else None
                vals.append(None if v is None else v[k])
            fvec = Vector.from_values(vals, ft)
            if recursive and ft.id == TypeId.STRUCT:
                out.extend(Executor._struct_unnest_columns(fvec, True))
            else:
                out.append((nm, fvec))
        return out

    def _expand_unnest(self, out_cols: List[Vector], unnest_slots: List[int]
                       ) -> List[Vector]:
        """Row expansion for top-level UNNEST select items (DuckDB
        semantics): each row yields max(len(list)) rows across the unnested
        columns; shorter lists and scalar columns NULL-pad / repeat; NULL or
        empty lists contribute zero rows (unless another unnest in the same
        row is longer)."""
        n = len(out_cols[0]) if out_cols else 0
        lens = np.zeros(n, dtype=np.int64)
        per_slot_lens: Dict[int, np.ndarray] = {}
        for s in unnest_slots:
            col = out_cols[s]
            data, validity = col.data, col.validity
            ln = np.array([len(data[i]) if validity[i] and
                           isinstance(data[i], (list, tuple)) else 0
                           for i in range(n)], dtype=np.int64)
            per_slot_lens[s] = ln
            lens = np.maximum(lens, ln)
        rep = np.repeat(np.arange(n, dtype=np.int64), lens)
        # position within each source row's expansion
        starts = np.cumsum(lens) - lens
        pos = np.arange(int(lens.sum()), dtype=np.int64) - starts[rep]
        new_cols: List[Vector] = []
        for slot, col in enumerate(out_cols):
            if slot not in per_slot_lens:
                new_cols.append(col.take(rep))
                continue
            child = col.type.child if col.type.child is not None else SQLNULL
            ln = per_slot_lens[slot]
            data, validity = col.data, col.validity
            vals = []
            for i, p in zip(rep, pos):
                if p < ln[i]:
                    vals.append(data[i][p])
                else:
                    vals.append(None)
            new_cols.append(Vector.from_values(vals, child))
        return new_cols

    # ------------------------------------------------------------ aggregate
    def apply_aggregate(self, node: a.SelectNode, rel: Relation, outer,
                        aggs: List[a.AggregateCall], env=None
                        ) -> Tuple[Relation, Dict[str, int]]:
        ev = Evaluator(self, rel, outer, env=env)
        n = rel.row_count

        # resolve group expressions (allow select-alias and positional refs)
        group_exprs: List[a.Expression] = []
        for g in node.groups:
            g = self._resolve_group_expr(g, node)
            group_exprs.append(g)
        if node.group_all:
            seen_fp = set()
            for e in node.select_list:
                sub: List[a.AggregateCall] = []
                collect_aggregates(e, sub)
                if not sub and not isinstance(e, a.Star):
                    fp = fingerprint(e)
                    if fp not in seen_fp:
                        seen_fp.add(fp)
                        group_exprs.append(e)

        group_vecs = [ev.evaluate(g) for g in group_exprs]
        if group_vecs:
            gids, n_groups, order_first = self._factorize_groups(group_vecs)
        else:
            gids = np.zeros(n, dtype=np.int64)
            n_groups = 1
            order_first = np.array([0] if n else [0])

        # unique aggregates by fingerprint
        uniq: Dict[str, a.AggregateCall] = {}
        for call in aggs:
            uniq.setdefault(fingerprint(call), call)

        new_cols: List[Vector] = []
        new_names: List[str] = []
        replacements: Dict[str, int] = {}
        for g_expr, g_vec in zip(group_exprs, group_vecs):
            slot = len(new_cols)
            grouped = self._group_representative(g_vec, gids, n_groups)
            new_cols.append(grouped)
            new_names.append(self.derive_name(g_expr))
            replacements[fingerprint(g_expr)] = slot
            if g_expr.alias:
                replacements[f"col:{g_expr.alias.lower()}"] = slot
            if isinstance(g_expr, a.ColumnRef):
                # register every alias path that reaches the same column so
                # qualified/unqualified select refs resolve post-aggregation
                src_slot = rel.resolve(g_expr.parts)
                col = g_expr.parts[-1].lower()
                replacements.setdefault(f"col:{col}", slot)
                for b in rel.bindings:
                    if b.find(col) == src_slot and b.alias:
                        replacements.setdefault(
                            f"col:{b.alias.lower()}.{col}", slot)
        for fp, call in uniq.items():
            impl = get_aggregate(call.name)
            if impl is None:
                raise BinderException(
                    f"Aggregate Function with name {call.name} does not exist!")
            if not call.args and call.name != "count_star":
                raise BinderException(
                    f"No function matches the given name and argument "
                    f"types '{call.name}()'")
            arg_vecs = [ev.evaluate(x) for x in call.args]
            from ..functions.aggregate import DECIMAL_AWARE
            if call.name.lower() not in DECIMAL_AWARE:
                from ..functions.scalar import _decimal_to_double
                arg_vecs = [_decimal_to_double(v) for v in arg_vecs]
            gids_c = gids
            row_sel = None
            if call.filter is not None:
                fmask = ev.as_bool(ev.evaluate(call.filter))
                row_sel = np.flatnonzero(fmask.data.astype(bool)
                                         & fmask.validity)
            if call.order_by:
                # order rows so order-sensitive aggregates (string_agg,
                # list, first/last) see them in ORDER BY order; stable via
                # rank keys so DESC keeps ties in input order
                perm = row_sel if row_sel is not None \
                    else np.arange(n, dtype=np.int64)
                row_sel, _ = self._order_permutation(ev, perm,
                                                     call.order_by)
            if row_sel is not None:
                arg_vecs = [v.take(row_sel) for v in arg_vecs]
                gids_c = gids[row_sel]
            vec = impl(arg_vecs, gids_c, n_groups, call.distinct)
            slot = len(new_cols)
            new_cols.append(vec)
            new_names.append(self.derive_name(call))
            replacements[fp] = slot

        binding = Binding("", new_names, list(range(len(new_cols))))
        new_rel = Relation(new_cols, [binding])
        # groups in first-appearance order (stable like a streaming hash agg)
        new_rel = new_rel.take(np.argsort(order_first, kind="stable")) \
            if n_groups > 1 else new_rel
        return new_rel, replacements

    def _order_permutation(self, ev, perm: np.ndarray,
                           order_by) -> Tuple[np.ndarray, List[np.ndarray]]:
        """Stable multi-key sort of the rows ``perm`` by ``order_by``
        (NULLS LAST; DESC via negated ranks so ties keep input order).
        Returns (sorted perm, per-key SORTED-ORDER rank arrays — aligned
        with the returned perm — for peer/tie detection)."""
        key_ranks: List[np.ndarray] = []
        for ob in reversed(order_by):
            kv = ev.evaluate(ob.expr)
            colls = collect_collations(ob.expr)
            if colls or kv.type.numpy_dtype() is object or \
                    not kv.validity.all():
                vals = [kv.value(int(i)) for i in perm]
                if colls:
                    from .expression import collation_key_values
                    vals = collation_key_values(vals, colls)
                order = sorted(range(len(vals)),
                               key=lambda j: (vals[j] is None,
                                              vals[j] if vals[j]
                                              is not None else 0))
                ranks = np.empty(len(vals), dtype=np.int64)
                r = -1
                prev = object()
                for pos, j in enumerate(order):
                    if pos == 0 or vals[j] != prev:
                        r += 1
                        prev = vals[j]
                    ranks[j] = r
            else:
                _, ranks = np.unique(kv.data[perm], return_inverse=True)
            key = ranks if ob.ascending else -ranks
            # NULL placement is independent of direction (DuckDB default
            # null order is NULLS LAST; NULLS FIRST/LAST overrides)
            nulls_first = getattr(ob, "nulls_first", None)
            nullmask = ~kv.validity[perm]
            if nullmask.any():
                big = np.int64(len(key) + 1)
                key = np.where(nullmask,
                               -big if nulls_first else big,
                               key)
            s = np.argsort(key, kind="stable")
            perm = perm[s]
            key_ranks = [kr[s] for kr in key_ranks]
            key_ranks.insert(0, key[s])
        return perm, key_ranks

    def apply_windows(self, rel: Relation, outer, replacements, env,
                      wins: List["a.WindowCall"]):
        """Compute window functions over the (post-aggregate) relation and
        append their columns; returns (new rel, replacements incl. window
        fingerprints). Default frames: with ORDER BY, RANGE UNBOUNDED
        PRECEDING..CURRENT ROW including peers; without, the whole
        partition."""
        ev = Evaluator(self, rel, outer, replacements, env=env)
        n = rel.row_count
        uniq: Dict[str, a.WindowCall] = {}
        for call in wins:
            uniq.setdefault(fingerprint(call), call)
        new_cols: List[Vector] = list(rel.columns)
        names: List[str] = []
        repl = dict(replacements)
        for fp, call in uniq.items():
            vec = self._compute_window(ev, call, n)
            repl[fp] = len(new_cols)
            names.append(self.derive_name(call))
            new_cols.append(vec)
        binding = Binding("", names,
                          list(range(len(rel.columns), len(new_cols))))
        return Relation(new_cols, rel.bindings + [binding]), repl

    def _compute_window(self, ev, call: "a.WindowCall", n: int) -> Vector:
        from ..types import BIGINT, DOUBLE, SQLNULL
        if not call.args and call.name not in (
                "row_number", "rank", "dense_rank", "count_star",
                "percent_rank", "cume_dist"):
            raise BinderException(
                f"No function matches the given name and argument types "
                f"'{call.name}()'")
        if call.partition_by:
            pvecs = [ev.evaluate(e) for e in call.partition_by]
            pids, _, _ = self._factorize_groups(pvecs)
        else:
            pids = np.zeros(n, dtype=np.int64)
        perm = np.arange(n, dtype=np.int64)
        perm, key_ranks = self._order_permutation(ev, perm, call.order_by)
        # partition-major, order-minor: stable sort by partition id last
        s = np.argsort(pids[perm], kind="stable")
        perm = perm[s]
        key_ranks = [kr[s] for kr in key_ranks]
        spids = pids[perm]
        new_part = np.ones(n, dtype=bool)
        if n:
            new_part[1:] = spids[1:] != spids[:-1]
        # peer boundaries: partition change or any order-key change
        new_peer = new_part.copy()
        for kr in key_ranks:
            if n:
                new_peer[1:] |= kr[1:] != kr[:-1]
        pos = np.arange(n, dtype=np.int64)
        part_start = np.maximum.accumulate(np.where(new_part, pos, 0))
        peer_gid = np.cumsum(new_peer.astype(np.int64)) - 1 if n else \
            np.zeros(0, np.int64)
        # last row index of each peer group
        if n:
            peer_last = np.empty(max(int(peer_gid[-1]) + 1, 1) if n else 1,
                                 dtype=np.int64)
            peer_last[peer_gid] = pos            # last write wins
        name = call.name
        if name in ("ntile", "percent_rank", "cume_dist") or \
                (name == "nth_value" and call.frame is None):
            pgid2 = np.cumsum(new_part.astype(np.int64)) - 1 if n else \
                np.zeros(0, np.int64)
            nparts = int(pgid2[-1]) + 1 if n else 0
            plast = np.zeros(max(nparts, 1), dtype=np.int64)
            if n:
                plast[pgid2] = pos
            part_end = plast[pgid2] if n else pos
            count = part_end - part_start + 1
            if name == "ntile":
                buckets = int(ev.evaluate(call.args[0]).value(0))
                if buckets < 1:
                    raise InvalidInputException(
                        "NTILE must be greater than zero")
                rel_pos = pos - part_start
                base = count // buckets
                rem = count % buckets
                # first `rem` buckets take base+1 rows (DuckDB/standard)
                big_span = rem * (base + 1)
                vals = np.where(
                    rel_pos < big_span,
                    rel_pos // np.maximum(base + 1, 1),
                    rem + (rel_pos - big_span) // np.maximum(base, 1)) + 1
                out = np.empty(n, dtype=np.int64)
                out[perm] = vals
                return Vector(BIGINT, out, np.ones(n, dtype=bool))
            if name == "percent_rank":
                rank_v = np.maximum.accumulate(
                    np.where(new_peer, pos, 0)) - part_start + 1
                vals = np.where(count > 1,
                                (rank_v - 1) / np.maximum(count - 1, 1),
                                0.0)
                out = np.zeros(n, dtype=np.float64)
                out[perm] = vals
                return Vector(DOUBLE, out, np.ones(n, dtype=bool))
            if name == "cume_dist":
                vals = (peer_last[peer_gid] - part_start + 1) / count
                out = np.zeros(n, dtype=np.float64)
                out[perm] = vals
                return Vector(DOUBLE, out, np.ones(n, dtype=bool))
            # nth_value over the DEFAULT frame: NULL until the frame
            # (peer-inclusive running window) reaches the nth row
            k = int(ev.evaluate(call.args[1]).value(0))
            src = ev.evaluate(call.args[0])
            frame_end = peer_last[peer_gid] if call.order_by else part_end
            res = [None] * n
            if call.ignore_nulls:
                validp = src.validity[perm]
                for i in range(n):
                    if k < 1:
                        continue
                    seen = 0
                    for j in range(int(part_start[i]),
                                   min(int(frame_end[i]),
                                       int(part_end[i])) + 1):
                        if validp[j]:
                            seen += 1
                            if seen == k:
                                res[int(perm[i])] = src.value(int(perm[j]))
                                break
                return Vector.from_values(res, src.type)
            target = part_start + k - 1
            ok = (k >= 1) & (target <= frame_end) & (target <= part_end)
            for i in range(n):
                if ok[i]:
                    res[int(perm[i])] = src.value(int(perm[int(target[i])]))
            return Vector.from_values(res, src.type)
        _SPECIAL_WINDOWS = (
            "row_number", "rank", "dense_rank", "lead", "lag",
            "first_value", "last_value", "ntile", "percent_rank",
            "cume_dist", "nth_value", "sum", "count", "count_star",
            "avg", "min", "max")
        if call.frame is None and name not in _SPECIAL_WINDOWS:
            # generic aggregate-as-window over the DEFAULT frame: the
            # standard default is RANGE UNBOUNDED PRECEDING..CURRENT ROW
            # (peer-inclusive), which the framed generic path implements
            import dataclasses
            call = dataclasses.replace(call, frame=a.WindowFrame(
                kind="RANGE"))
        if call.frame is not None and name not in (
                "row_number", "rank", "dense_rank", "lead", "lag"):
            # explicit ROWS/RANGE/GROUPS frame (expression.gram:70-76);
            # ranking/offset functions ignore frames like DuckDB
            return self._compute_window_framed(
                ev, call, n, perm, spids, new_part, new_peer, pos,
                part_start, peer_gid, peer_last, key_ranks)
        if name == "row_number":
            vals = pos - part_start + 1
            out = np.empty(n, dtype=np.int64)
            out[perm] = vals
            return Vector(BIGINT, out, np.ones(n, dtype=bool))
        if name in ("rank", "dense_rank"):
            if name == "rank":
                vals = np.maximum.accumulate(
                    np.where(new_peer, pos, 0)) - part_start + 1
            else:
                # dense: count of peer boundaries since partition start
                pb = np.cumsum((new_peer & ~new_part).astype(np.int64))
                base = np.maximum.accumulate(np.where(new_part, pb, 0))
                vals = pb - base + 1
            out = np.empty(n, dtype=np.int64)
            out[perm] = vals
            return Vector(BIGINT, out, np.ones(n, dtype=bool))
        if name in ("lead", "lag"):
            off = 1
            if len(call.args) > 1:
                off_v = ev.evaluate(call.args[1])
                off = int(off_v.value(0)) if len(off_v) else 1
            default = None
            if len(call.args) > 2:
                dv = ev.evaluate(call.args[2])
                default = dv.value(0) if len(dv) else None
            src = ev.evaluate(call.args[0])
            if call.ignore_nulls:
                # off-th NON-NULL row before/after within the partition:
                # the nearest `off` valid sorted positions are in-partition
                # iff the partition holds that many, so one global valid-
                # position array + a partition check suffices
                validp = src.validity[perm]
                vpos = np.flatnonzero(validp)
                before = np.cumsum(validp) - validp    # valid strictly before
                upto = np.cumsum(validp)               # valid up to & incl.
                out_vals = []
                for i in range(n):
                    r = (before[i] - off) if name == "lag" \
                        else (upto[i] + off - 1)
                    if 0 <= r < len(vpos) and spids[vpos[r]] == spids[i]:
                        out_vals.append(src.value(int(perm[int(vpos[r])])))
                    else:
                        out_vals.append(default)
                res = [None] * n
                for i in range(n):
                    res[int(perm[i])] = out_vals[i]
                return Vector.from_values(res, src.type)
            step = off if name == "lead" else -off
            tgt = pos + step
            valid_t = (tgt >= 0) & (tgt < n) if n else np.zeros(0, bool)
            tgt_c = np.clip(tgt, 0, max(n - 1, 0))
            same_part = valid_t & (spids[tgt_c] == spids)
            sorted_rows = perm[tgt_c]
            out_vals = []
            for i in range(n):
                if same_part[i]:
                    out_vals.append(src.value(int(sorted_rows[i])))
                else:
                    out_vals.append(default)
            res = [None] * n
            for i in range(n):
                res[int(perm[i])] = out_vals[i]
            return Vector.from_values(res, src.type)
        # aggregate windows
        if name == "count_star":
            sv = np.ones(n, dtype=np.float64)
            valid = np.ones(n, dtype=bool)
            src_type = BIGINT
        else:
            src = ev.evaluate(call.args[0])
            sv = np.where(src.validity,
                          src.data if src.type.numpy_dtype() is not object
                          else 0, 0).astype(np.float64) \
                if src.type.numpy_dtype() is not object else None
            valid = src.validity[perm]
            src_type = src.type
        if src_type.id == TypeId.DECIMAL and sv is not None:
            # numeric window aggregates run on DOUBLE (the scaled int
            # would be off by 10^scale); value-picking windows below keep
            # the raw decimal representation and type
            sv = sv / float(10 ** src_type.scale)
            src_type = DOUBLE
        if name in ("first_value", "last_value") or sv is None:
            # value-picking windows (work for any type); default frames:
            # first = partition first row; last = current peer-group last
            # with ORDER BY, partition last without (the standard's
            # notorious last_value default)
            src = ev.evaluate(call.args[0])
            if name == "first_value":
                pick = part_start
            elif call.order_by:
                pick = peer_last[peer_gid]
            else:
                pgid = np.cumsum(new_part.astype(np.int64)) - 1
                lp = np.empty(int(pgid[-1]) + 1 if n else 1, dtype=np.int64)
                lp[pgid] = pos
                pick = lp[pgid]
            if name not in ("first_value", "last_value"):
                raise BinderException(
                    f"window aggregate {name} requires numeric input")
            res = [None] * n
            if call.ignore_nulls:
                # scan the default frame [part_start, frame_end] for the
                # first/last NON-NULL row
                if call.order_by:
                    fend = peer_last[peer_gid]
                else:
                    pg2 = np.cumsum(new_part.astype(np.int64)) - 1
                    lp2 = np.empty(int(pg2[-1]) + 1 if n else 1,
                                   dtype=np.int64)
                    if n:
                        lp2[pg2] = pos
                    fend = lp2[pg2] if n else pos
                validp = src.validity[perm]
                for i in range(n):
                    lo, hi = int(part_start[i]), int(fend[i])
                    rng = range(lo, hi + 1) if name == "first_value" \
                        else range(hi, lo - 1, -1)
                    for j in rng:
                        if validp[j]:
                            res[int(perm[i])] = src.value(int(perm[j]))
                            break
                return Vector.from_values(res, src.type)
            for i in range(n):
                res[int(perm[i])] = src.value(int(perm[int(pick[i])]))
            return Vector.from_values(res, src.type)
        svs = sv[perm]
        vf = valid.astype(np.float64)
        if call.order_by:
            # running (peer-inclusive) frame
            csum = np.cumsum(svs * vf)
            ccnt = np.cumsum(vf)
            base_sum = np.where(new_part, csum - svs * vf, np.nan)
            base_cnt = np.where(new_part, ccnt - vf, np.nan)
            base_sum = self._ffill_nan(base_sum)
            base_cnt = self._ffill_nan(base_cnt)
            run_sum = csum - base_sum
            run_cnt = ccnt - base_cnt
            run_sum = run_sum[peer_last[peer_gid]]
            run_cnt = run_cnt[peer_last[peer_gid]]
            if name in ("min", "max"):
                # per-partition running extrema with peer broadcast
                vals = np.where(valid, svs,
                                np.inf if name == "min" else -np.inf)
                run = np.empty(n, dtype=np.float64)
                acc = 0.0
                for i in range(n):
                    acc = vals[i] if new_part[i] else (
                        min(acc, vals[i]) if name == "min"
                        else max(acc, vals[i]))
                    run[i] = acc
                run = run[peer_last[peer_gid]]
                run_sum = run
        else:
            # whole-partition frame
            pgid = np.cumsum(new_part.astype(np.int64)) - 1 if n else \
                np.zeros(0, np.int64)
            nparts = int(pgid[-1]) + 1 if n else 0
            tot = np.bincount(pgid, weights=svs * vf, minlength=nparts)
            cnt = np.bincount(pgid, weights=vf, minlength=nparts)
            if name == "min":
                tot = np.full(nparts, np.inf)
                np.minimum.at(tot, pgid[valid], svs[valid])
            elif name == "max":
                tot = np.full(nparts, -np.inf)
                np.maximum.at(tot, pgid[valid], svs[valid])
            run_sum = tot[pgid]
            run_cnt = cnt[pgid]
        if name in ("count", "count_star"):
            out = np.zeros(n, dtype=np.int64)
            out[perm] = run_cnt.astype(np.int64)
            return Vector(BIGINT, out, np.ones(n, dtype=bool))
        if name == "avg":
            vals = np.where(run_cnt > 0, run_sum / np.maximum(run_cnt, 1),
                            0.0)
            out = np.zeros(n, dtype=np.float64)
            out[perm] = vals
            ov = np.zeros(n, dtype=bool)
            ov[perm] = run_cnt > 0
            return Vector(DOUBLE, out, ov)
        # sum / min / max
        out = np.zeros(n, dtype=np.float64)
        out[perm] = run_sum
        ov = np.zeros(n, dtype=bool)
        ov[perm] = run_cnt > 0 if name == "sum" else np.isfinite(run_sum)
        if src_type.is_numeric and src_type.is_integral:
            return Vector(BIGINT, np.where(ov, out, 0).astype(np.int64), ov)
        return Vector(DOUBLE, out, ov)

    def _compute_window_framed(self, ev, call: "a.WindowCall", n: int,
                               perm, spids, new_part, new_peer, pos,
                               part_start, peer_gid, peer_last, key_ranks
                               ) -> Vector:
        """Aggregate / first_value / last_value over an explicit
        ROWS/RANGE/GROUPS frame (expression.gram:70-76). All index math is
        in SORTED coordinates: each row's frame is the inclusive index
        range [s, e]; results scatter back through ``perm``."""
        from ..types import BIGINT, DOUBLE
        frame = call.frame
        name = call.name
        if n == 0:
            return Vector(BIGINT, np.zeros(0, np.int64), np.zeros(0, bool))
        pgid = np.cumsum(new_part.astype(np.int64)) - 1
        nparts = int(pgid[-1]) + 1
        part_last_arr = np.zeros(nparts, dtype=np.int64)
        part_last_arr[pgid] = pos                      # last write wins
        part_end = part_last_arr[pgid]
        peer_first = np.maximum.accumulate(np.where(new_peer, pos, 0))

        def scalar_off(bexpr, integral):
            v = ev.evaluate(bexpr).value(0)
            if v is None:
                raise BinderException(
                    "window frame offsets cannot be NULL")
            val = int(v) if integral else float(v)
            if val < 0:
                raise InvalidInputException(
                    "Invalid preceding or following size in window "
                    "function")
            return val

        if frame.kind in ("ROWS", "GROUPS"):
            if frame.kind == "ROWS":
                base, lo_b, hi_b = pos, part_start, part_end
            else:
                base = peer_gid
                lo_b, hi_b = peer_gid[part_start], peer_gid[part_end]

            def bound(btype, bexpr):
                if btype == "unbounded_preceding":
                    return lo_b.astype(np.int64)
                if btype == "unbounded_following":
                    return hi_b.astype(np.int64)
                if btype == "current":
                    return base.astype(np.int64)
                k = scalar_off(bexpr, True)
                return base - k if btype == "preceding" else base + k

            s_b = bound(frame.start_type, frame.start_expr)
            e_b = bound(frame.end_type, frame.end_expr)
            empty = (s_b > hi_b) | (e_b < lo_b) | (s_b > e_b)
            s_b = np.clip(s_b, lo_b, hi_b)
            e_b = np.clip(e_b, lo_b, hi_b)
            if frame.kind == "ROWS":
                s, e = s_b, e_b
            else:
                ngroups = int(peer_gid[-1]) + 1
                g_first = np.zeros(ngroups, np.int64)
                g_last = np.zeros(ngroups, np.int64)
                g_last[peer_gid] = pos
                g_first[peer_gid[::-1]] = pos[::-1]
                s, e = g_first[s_b], g_last[e_b]
        else:                                           # RANGE
            s = np.empty(n, dtype=np.int64)
            e = np.empty(n, dtype=np.int64)
            needs_key = "preceding" in (frame.start_type, frame.end_type) \
                or "following" in (frame.start_type, frame.end_type)
            skv = svalid = None
            if needs_key:
                if len(call.order_by) != 1:
                    raise BinderException(
                        "RANGE frames with offsets require exactly one "
                        "ORDER BY expression")
                kv = ev.evaluate(call.order_by[0].expr)
                if kv.type.numpy_dtype() is object:
                    raise BinderException(
                        "RANGE frames require a numeric ORDER BY "
                        "expression")
                if kv.type.id == TypeId.DECIMAL:
                    from ..functions.scalar import _decimal_to_double
                    kv = _decimal_to_double(kv)
                # ascending view of the key so PRECEDING/FOLLOWING share
                # one searchsorted formulation for ASC and DESC orders
                q = kv.data.astype(np.float64)[perm]
                if not call.order_by[0].ascending:
                    q = -q
                skv = q
                svalid = kv.validity[perm]

            def range_edge(btype, bexpr, is_start, out):
                if btype == "unbounded_preceding":
                    out[:] = part_start
                    return
                if btype == "unbounded_following":
                    out[:] = part_end
                    return
                if btype == "current":
                    out[:] = peer_first if is_start else peer_last[peer_gid]
                    return
                off = scalar_off(bexpr, False)
                delta = -off if btype == "preceding" else off
                pstarts = np.flatnonzero(new_part)
                pends = np.append(pstarts[1:] - 1, n - 1)
                for ps, pe in zip(pstarts, pends):
                    seg_valid = svalid[ps:pe + 1]
                    vidx = np.flatnonzero(seg_valid)
                    for i in range(ps, pe + 1):
                        if not svalid[i]:
                            # NULL order keys frame their own peer group
                            out[i] = peer_first[i] if is_start \
                                else peer_last[peer_gid[i]]
                            continue
                        seg = skv[ps + vidx[0]:ps + vidx[-1] + 1] \
                            if len(vidx) else skv[ps:ps]
                        tgt = skv[i] + delta
                        if is_start:
                            out[i] = ps + vidx[0] + int(
                                np.searchsorted(seg, tgt, side="left"))
                        else:
                            out[i] = ps + vidx[0] + int(
                                np.searchsorted(seg, tgt, side="right")) - 1
            range_edge(frame.start_type, frame.start_expr, True, s)
            range_edge(frame.end_type, frame.end_expr, False, e)
            empty = s > e
            s = np.clip(s, 0, n - 1)
            e = np.clip(e, 0, n - 1)

        # ---- frame EXCLUDE (expression.gram WindowExcludeClause):
        # the excluded set is contiguous in sorted coordinates (the
        # current row or its peer group), so every prefix-sum/extrema
        # formulation below subtracts the clipped sub-range [xs, xe];
        # TIES re-adds the current row itself.
        excl = getattr(frame, "exclude", None)
        pos64 = pos.astype(np.int64)
        if excl:
            if excl == "current":
                xs = pos64.copy()
                xe = pos64.copy()
            else:                         # group / ties
                xs = peer_first.astype(np.int64)
                xe = peer_last[peer_gid].astype(np.int64)
            xs = np.maximum(xs, s)
            xe = np.minimum(xe, e)
            has_x = (~empty) & (xs <= xe)
            xs = np.where(has_x, xs, 0)
            xe = np.where(has_x, xe, -1)
            ties_add = (excl == "ties") & has_x & (s <= pos64) & \
                (pos64 <= e)
        else:
            has_x = np.zeros(n, dtype=bool)
            xs = np.zeros(n, dtype=np.int64)
            xe = np.full(n, -1, dtype=np.int64)
            ties_add = np.zeros(n, dtype=bool)

        def _generic_frame():
            # generic aggregate over the frame: run the aggregate
            # implementation per row over its [s, e] range minus
            # exclusions (string_agg/list/median/mode/stddev/... as
            # window functions)
            agg_fn = get_aggregate(name)
            if agg_fn is None:
                raise BinderException(
                    f"window function {name} does not exist")
            argv = [ev.evaluate(x) for x in call.args]
            from ..functions.aggregate import DECIMAL_AWARE
            if name not in DECIMAL_AWARE:
                from ..functions.scalar import _decimal_to_double
                argv = [_decimal_to_double(v) for v in argv]
            argv_sorted = [v.take(perm) for v in argv]
            res = [None] * n
            out_type = None
            for i in range(n):
                if empty[i]:
                    continue
                idx = [j for j in range(int(s[i]), int(e[i]) + 1)
                       if not (has_x[i] and xs[i] <= j <= xe[i] and
                               not (ties_add[i] and j == pos64[i]))]
                if not idx:
                    continue
                ii = np.asarray(idx, dtype=np.int64)
                sub = [v.take(ii) for v in argv_sorted]
                out = agg_fn(sub, np.zeros(len(ii), dtype=np.int64), 1)
                res[int(perm[i])] = out.value(0)
                out_type = out.type
            from ..types import SQLNULL as _SN
            return Vector.from_values(res, out_type or _SN)

        # ---- aggregate the inclusive sorted-index ranges [s, e] ----
        if name == "nth_value" or (
                name in ("first_value", "last_value") and excl):
            src = ev.evaluate(call.args[0])
            k = int(ev.evaluate(call.args[1]).value(0)) \
                if name == "nth_value" else 1
            validp2 = src.validity[perm]
            res = [None] * n
            for i in range(n):
                if empty[i] or k < 1:
                    continue
                fwd = name != "last_value"
                rng = range(int(s[i]), int(e[i]) + 1) if fwd \
                    else range(int(e[i]), int(s[i]) - 1, -1)
                seen = 0
                for j in rng:
                    if has_x[i] and xs[i] <= j <= xe[i] and \
                            not (ties_add[i] and j == pos64[i]):
                        continue
                    if call.ignore_nulls and not validp2[j]:
                        continue
                    seen += 1
                    if seen == k:
                        res[int(perm[i])] = src.value(int(perm[j]))
                        break
            return Vector.from_values(res, src.type)
        if name in ("first_value", "last_value"):
            src = ev.evaluate(call.args[0])
            pick = s if name == "first_value" else e
            res = [None] * n
            if call.ignore_nulls:
                validp2 = src.validity[perm]
                for i in range(n):
                    if empty[i]:
                        continue
                    rng = range(int(s[i]), int(e[i]) + 1) \
                        if name == "first_value" \
                        else range(int(e[i]), int(s[i]) - 1, -1)
                    for j in rng:
                        if validp2[j]:
                            res[int(perm[i])] = src.value(int(perm[j]))
                            break
                return Vector.from_values(res, src.type)
            for i in range(n):
                if not empty[i]:
                    res[int(perm[i])] = src.value(int(perm[int(pick[i])]))
            return Vector.from_values(res, src.type)
        if name == "count_star":
            cnt = np.where(empty, 0, e - s + 1).astype(np.int64)
            cnt -= (xe - xs + 1)
            cnt += ties_add.astype(np.int64)
            out = np.zeros(n, dtype=np.int64)
            out[perm] = cnt
            return Vector(BIGINT, out, np.ones(n, dtype=bool))
        src = ev.evaluate(call.args[0])
        svalid_s = src.validity[perm]
        ppv = np.concatenate([[0], np.cumsum(svalid_s.astype(np.int64))])
        cnt_valid = np.where(empty, 0, ppv[e + 1] - ppv[s])
        cnt_valid = cnt_valid - (ppv[xe + 1] - ppv[xs]) + \
            (ties_add & svalid_s[pos64]).astype(np.int64)
        if name == "count":
            out = np.zeros(n, dtype=np.int64)
            out[perm] = cnt_valid
            return Vector(BIGINT, out, np.ones(n, dtype=bool))
        if name not in ("sum", "avg", "min", "max"):
            return _generic_frame()
        if src.type.numpy_dtype() is object:
            raise BinderException(
                f"window aggregate {name} requires numeric input")
        if src.type.id == TypeId.DECIMAL:
            from ..functions.scalar import _decimal_to_double
            src = _decimal_to_double(src)
        sv = np.where(src.validity, src.data, 0).astype(np.float64)[perm]
        if name in ("sum", "avg"):
            pps = np.concatenate([[0.0], np.cumsum(sv)])
            tot = np.where(empty, 0.0, pps[e + 1] - pps[s])
            tot = tot - (pps[xe + 1] - pps[xs]) + \
                np.where(ties_add, sv[pos64], 0.0)
            valid_out = cnt_valid > 0
            if name == "avg":
                vals = np.where(valid_out, tot / np.maximum(cnt_valid, 1),
                                0.0)
                out = np.zeros(n, dtype=np.float64)
                out[perm] = vals
                ov = np.zeros(n, dtype=bool)
                ov[perm] = valid_out
                return Vector(DOUBLE, out, ov)
            out = np.zeros(n, dtype=np.float64)
            out[perm] = tot
            ov = np.zeros(n, dtype=bool)
            ov[perm] = valid_out
            if src.type.is_numeric and src.type.is_integral:
                return Vector(BIGINT,
                              np.where(ov, out, 0).astype(np.int64), ov)
            return Vector(DOUBLE, out, ov)
        if name in ("min", "max"):
            pad = np.inf if name == "min" else -np.inf
            vals = np.where(svalid_s, sv, pad)
            is_min = name == "min"
            comb = np.minimum if is_min else np.maximum
            if excl:
                # two sub-ranges around the excluded interval; with the
                # sanitized no-exclusion sentinels (xs=0, xe=-1) the left
                # half degenerates to pad and the right half is [s, e]
                ls, le = s, np.minimum(xs - 1, e)
                rs, re_ = np.maximum(xe + 1, s), e
                lempty = ls > le
                rempty = rs > re_
                lres = self._range_extrema(
                    vals, np.where(lempty, 0, ls),
                    np.where(lempty, 0, le), is_min)
                lres = np.where(lempty, pad, lres)
                rres = self._range_extrema(
                    vals, np.where(rempty, 0, rs),
                    np.where(rempty, 0, re_), is_min)
                rres = np.where(rempty, pad, rres)
                res = comb(lres, rres)
                res = np.where(ties_add, comb(res, vals[pos64]), res)
            else:
                res = self._range_extrema(vals, s, e, is_min)
            valid_out = (cnt_valid > 0) & np.isfinite(res)
            return self._minmax_frame_result(src, res, valid_out, perm, n)
        return _generic_frame()

    @staticmethod
    def _minmax_frame_result(src, res, valid_out, perm, n):
        out = np.zeros(n, dtype=np.float64)
        out[perm] = np.where(valid_out, res, 0.0)
        ov = np.zeros(n, dtype=bool)
        ov[perm] = valid_out
        if src.type.is_numeric and src.type.is_integral:
            return Vector(BIGINT, out.astype(np.int64), ov)
        return Vector(DOUBLE, out, ov)

    @staticmethod
    def _range_extrema(vals: np.ndarray, s: np.ndarray, e: np.ndarray,
                       is_min: bool) -> np.ndarray:
        """Vectorized range min/max over inclusive [s, e] via an
        O(n log n) sparse table; s > e rows return the padding value."""
        n = len(vals)
        comb = np.minimum if is_min else np.maximum
        table = [vals]
        j = 0
        while (2 << j) <= n:
            prev = table[-1]
            half = 1 << j
            m = n - (2 << j) + 1
            table.append(comb(prev[:m], prev[half:half + m]))
            j += 1
        w = np.maximum(e - s + 1, 1)
        k = np.floor(np.log2(w)).astype(np.int64)
        out = np.empty(len(s), dtype=np.float64)
        for kk in np.unique(k):
            mask = k == kk
            length = 1 << int(kk)
            t = table[int(kk)]
            out[mask] = comb(t[s[mask]], t[e[mask] - length + 1])
        return out

    @staticmethod
    def _ffill_nan(x: np.ndarray) -> np.ndarray:
        """Forward-fill NaN with the last non-NaN value (0.0 before any)."""
        if not len(x):
            return x
        x = x.copy()
        if np.isnan(x[0]):
            x[0] = 0.0
        idx = np.where(~np.isnan(x), np.arange(len(x)), 0)
        np.maximum.accumulate(idx, out=idx)
        return x[idx]

    def _apply_sample(self, rel: Relation, spec: dict) -> Relation:
        n = rel.row_count
        if spec.get("percent"):
            k = int(round(n * spec["size"] / 100.0))
        else:
            k = int(spec["size"])
        k = min(k, n)
        rng = np.random.RandomState(spec.get("seed") or 0)
        idx = np.sort(rng.choice(n, size=k, replace=False)) if n else \
            np.arange(0)
        return rel.take(idx)

    def _resolve_qualify_expr(self, q: a.Expression, node: a.SelectNode
                              ) -> a.Expression:
        """Substitute select-list aliases inside a QUALIFY predicate with
        their expressions (DuckDB: QUALIFY may reference select aliases,
        window functions, and input columns; input columns resolve first,
        then aliases — handled here by leaving non-alias names alone)."""
        import dataclasses
        alias_map = {}
        for e in node.select_list:
            al = getattr(e, "alias", None)
            if al:
                alias_map[al.lower()] = e
        if not alias_map:
            return q

        def walk(e):
            if isinstance(e, a.ColumnRef):
                if len(e.parts) == 1:
                    return alias_map.get(e.parts[0].lower(), e)
                return e
            if not isinstance(e, a.Expression):
                return e
            changes = {}
            for f in dataclasses.fields(e):
                v = getattr(e, f.name)
                if isinstance(v, a.Expression):
                    nv = walk(v)
                    if nv is not v:
                        changes[f.name] = nv
                elif isinstance(v, list) and v:
                    nl = []
                    dirty = False
                    for x in v:
                        if isinstance(x, a.Expression):
                            nx = walk(x)
                        elif isinstance(x, a.OrderByNode) and \
                                x.expr is not None:
                            ne = walk(x.expr)
                            nx = dataclasses.replace(x, expr=ne) \
                                if ne is not x.expr else x
                        elif isinstance(x, tuple):
                            nx = tuple(walk(y) if isinstance(y, a.Expression)
                                       else y for y in x)
                            if all(p is q2 for p, q2 in zip(nx, x)):
                                nx = x
                        else:
                            nx = x
                        dirty = dirty or nx is not x
                        nl.append(nx)
                    if dirty:
                        changes[f.name] = nl
            return dataclasses.replace(e, **changes) if changes else e

        return walk(q)

    def _resolve_group_expr(self, g: a.Expression, node: a.SelectNode
                            ) -> a.Expression:
        if isinstance(g, a.Constant) and g.type is not None and \
                g.type.is_integral:
            idx = int(g.value) - 1
            if 0 <= idx < len(node.select_list):
                return node.select_list[idx]
        if isinstance(g, a.ColumnRef) and len(g.parts) == 1:
            for e in node.select_list:
                if e.alias and e.alias.lower() == g.parts[0].lower():
                    return e
        return g

    def _factorize_groups(self, group_vecs: List[Vector]):
        n = len(group_vecs[0])
        keys = []
        for v in group_vecs:
            if v.type.numpy_dtype() is object:
                col = np.array(
                    ["\0N" if not v.validity[i] else str(v.data[i])
                     for i in range(n)], dtype=object).astype(str)
            else:
                data = v.data
                if v.type.id == TypeId.INTERVAL:
                    # group by DuckDB interval equality (normalized micros)
                    from ..types import interval_total_micros
                    data = interval_total_micros(
                        data["months"], data["days"], data["micros"])
                col = np.where(v.validity, data, 0)
                col = np.stack([col.astype(np.float64),
                                (~v.validity).astype(np.float64)], axis=0)
            keys.append(col)
        # build composite codes
        gids = np.zeros(n, dtype=np.int64)
        for col in keys:
            if col.dtype.kind in ("U", "S", "O"):
                _, inv = np.unique(col, return_inverse=True)
            else:
                _, inv = np.unique(col.T, axis=0, return_inverse=True)
            gids = gids * (int(inv.max()) + 1 if n else 1) + inv
        uniq, first, inv = np.unique(gids, return_index=True,
                                     return_inverse=True)
        return inv.astype(np.int64), len(uniq), first

    @staticmethod
    def _group_representative(vec: Vector, gids: np.ndarray, n_groups: int
                              ) -> Vector:
        out = Vector.constant(None, vec.type, n_groups)
        seen = np.zeros(n_groups, dtype=bool)
        for i in range(len(gids)):
            g = gids[i]
            if not seen[g]:
                seen[g] = True
                out.data[g] = vec.data[i]
                out.validity[g] = vec.validity[i]
        return out

    # ------------------------------------------------------------- DISTINCT
    def apply_distinct(self, result: QueryResult, distinct_on, rel, outer,
                       replacements) -> QueryResult:
        if distinct_on:
            ev = Evaluator(self, rel, outer, replacements)
            key_cols = [ev.evaluate(e) for e in distinct_on]
        else:
            key_cols = result.columns
        n = result.row_count
        seen = set()
        keep = np.zeros(n, dtype=bool)
        for i in range(n):
            key = tuple(self._hashable(c.value(i)) for c in key_cols)
            if key not in seen:
                seen.add(key)
                keep[i] = True
        return QueryResult(result.names, [c.filter(keep)
                                          for c in result.columns])

    @staticmethod
    def _hashable(v):
        if isinstance(v, list):
            return tuple(Executor._hashable(x) for x in v)
        return v

    # -------------------------------------------------------------- ORDER BY
    def apply_order(self, result: QueryResult, order_ctx,
                    order_by: List[a.OrderByNode], outer,
                    limit_hint: Optional[int] = None) -> QueryResult:
        n = result.row_count
        # ORDER BY ALL: every output column, left to right (DuckDB)
        if any(ob.order_all for ob in order_by):
            expanded: List[a.OrderByNode] = []
            for ob in order_by:
                if ob.order_all:
                    expanded.extend(
                        a.OrderByNode(expr=None, ascending=ob.ascending,
                                      nulls_first=ob.nulls_first,
                                      order_all=True)
                        for _ in result.columns)
                else:
                    expanded.append(ob)
            key_vecs = []
            col_i = 0
            for ob in expanded:
                if ob.order_all:
                    key_vecs.append(result.columns[col_i])
                    col_i += 1
                else:
                    key_vecs.append(self._bind_order_expr(
                        ob.expr, result, order_ctx, outer))
            order_by = expanded
        else:
            key_vecs = []
            for ob in order_by:
                key_vecs.append(self._bind_order_expr(
                    ob.expr, result, order_ctx, outer))
        # lexsort: last key is primary
        sort_cols = []
        for ob, vec in zip(order_by, key_vecs):
            if vec.type.id == TypeId.ENUM and vec.type.values:
                # enums order by DEFINITION position, not alphabetically
                posmap = {v: k for k, v in enumerate(vec.type.values)}
                arr = np.array([
                    posmap.get(vec.data[i], -1) if vec.validity[i] else 0
                    for i in range(n)], dtype=np.float64)
                if not ob.ascending:
                    arr = -arr
                nulls_last = True if ob.nulls_first is None \
                    else not ob.nulls_first
                nullkey = (~vec.validity).astype(np.float64)
                if not nulls_last:
                    nullkey = -nullkey
                sort_cols.append(nullkey)
                sort_cols.append(arr)
                continue
            if vec.type.id in (TypeId.LIST, TypeId.STRUCT, TypeId.MAP):
                # nested types order ELEMENT-WISE (DuckDB): a string key
                # would put [1, 5] before [1] ('[1, 5]' < '[1]')
                from functools import cmp_to_key
                vals_n = [vec.data[i] if vec.validity[i] else None
                          for i in range(n)]
                idx_sorted = sorted(
                    range(n), key=cmp_to_key(
                        lambda i, j: _nested_cmp(vals_n[i], vals_n[j])))
                codes = np.zeros(n, dtype=np.float64)
                rank = 0
                for k, i in enumerate(idx_sorted):
                    if k and _nested_cmp(vals_n[idx_sorted[k - 1]],
                                         vals_n[i]) != 0:
                        rank += 1
                    codes[i] = rank
                arr = codes if ob.ascending else -codes
                nulls_last = True if ob.nulls_first is None \
                    else not ob.nulls_first
                nullkey = (~vec.validity).astype(np.float64)
                if not nulls_last:
                    nullkey = -nullkey
                sort_cols.append(nullkey)
                sort_cols.append(arr)
                continue
            if vec.type.numpy_dtype() is object:
                vals = np.array([
                    "" if not vec.validity[i] else str(vec.data[i])
                    for i in range(n)], dtype=object)
                colls = collect_collations(ob.expr) \
                    if ob.expr is not None else []
                if colls:
                    # ORDER BY expr COLLATE …: sort by the collation key
                    vals = apply_collation(vals, colls)
                vals = vals.astype(str)
                _, codes = np.unique(vals, return_inverse=True)
                arr = codes.astype(np.float64)
            elif vec.type.id == TypeId.INTERVAL:
                # DuckDB sorts intervals by normalized micros (GetMicro)
                from ..types import interval_total_micros
                arr = interval_total_micros(
                    vec.data["months"], vec.data["days"],
                    vec.data["micros"]).astype(np.float64)
            else:
                arr = vec.data.astype(np.float64)
                if np.issubdtype(vec.data.dtype, np.integer) and \
                        len(vec.data) and \
                        np.abs(vec.data.astype(np.int64)).max() > (1 << 53):
                    # float64 collapses >2^53 integers (BIGINT ids, wide
                    # DECIMAL scaled ints): keep the exact int64 key.
                    # ~x is the overflow-free descending map.
                    key = vec.data.astype(np.int64)
                    nl = True if ob.nulls_first is None \
                        else not ob.nulls_first
                    nk = (~vec.validity).astype(np.int64)
                    sort_cols.append(nk if nl else -nk)
                    sort_cols.append(key if ob.ascending else ~key)
                    continue
            if not ob.ascending:
                arr = -arr
            # NULLS LAST default (DuckDB default null order)
            nulls_last = True if ob.nulls_first is None else not ob.nulls_first
            nullkey = (~vec.validity).astype(np.float64)
            if not nulls_last:
                nullkey = -nullkey
            # the null flag must be MORE significant than the value key
            # (NULL rows would otherwise sort by whatever bytes sit under
            # the invalid slots); np.lexsort makes the LAST entry of the
            # reversed tuple primary, so nullkey goes before arr here
            sort_cols.append(nullkey)
            sort_cols.append(arr)
        # ORDER BY + LIMIT top-k pushdown (VERDICT r3 item 4a): select the
        # top limit_hint rows by the primary key (ties included) with
        # argpartition, then full-precision lexsort only the candidates —
        # O(n + c log c) instead of O(n log n * keys) on IC2-shape queries
        if sort_cols and limit_hint and limit_hint > 0 and n > 8192 and \
                limit_hint * 4 <= n:
            idx = self._topk_indices(sort_cols, limit_hint, n)
            if idx is not None:
                return QueryResult(result.names,
                                   [c.take(idx) for c in result.columns])
        # lexsort uses last key as primary; reverse our list
        idx = np.lexsort(tuple(reversed(sort_cols))) if sort_cols else \
            np.arange(n)
        return QueryResult(result.names, [c.take(idx) for c in result.columns])

    @staticmethod
    def _topk_indices(sort_cols: List[np.ndarray], k: int, n: int
                      ) -> Optional[np.ndarray]:
        """Exact top-k row indices for a multi-key sort, or None when the
        candidate set is not selective (low-cardinality primary key, or a
        NaN threshold) and the caller should full-sort. sort_cols is the
        [nullkey0, arr0, nullkey1, arr1, ...] layout of apply_order."""
        nullkey, arr = sort_cols[0], sort_cols[1]
        if np.issubdtype(arr.dtype, np.integer):
            # exact-int key path (>2^53 values): inf sentinels would
            # demote it back to lossy float — full-sort instead
            return None
        primary = np.where(nullkey > 0, np.inf,
                           np.where(nullkey < 0, -np.inf, arr))
        part = np.argpartition(primary, k - 1)[:k]
        thresh = primary[part].max()
        if np.isnan(thresh):
            return None                    # k reaches into NaN keys
        cand = np.flatnonzero(primary <= thresh)   # ties included
        if len(cand) > max(4 * k, 8192):
            return None
        sub = np.lexsort(tuple(reversed([c[cand] for c in sort_cols])))
        # cand is ascending, so the subset lexsort is stable w.r.t. the
        # original row order — identical tie order to the full sort
        return cand[sub]

    def _bind_order_expr(self, e: a.Expression, result: QueryResult,
                         order_ctx, outer) -> Vector:
        # positional constant
        if isinstance(e, a.Constant) and e.type is not None and \
                e.type.is_integral:
            idx = int(e.value) - 1
            if 0 <= idx < len(result.columns):
                return result.columns[idx]
        # output name / alias match
        if isinstance(e, a.ColumnRef):
            target = e.parts[-1].lower()
            qualified = len(e.parts) > 1
            if qualified and order_ctx is not None:
                # alias-qualified: resolve against the source relation
                rel = order_ctx["rel"]
                try:
                    slot = rel.resolve(e.parts)
                except BinderException:
                    slot = None
                if slot is not None and \
                        len(rel.columns[slot]) == result.row_count:
                    return rel.columns[slot]
            matches = [i for i, nm in enumerate(result.names)
                       if nm.lower() == target]
            if matches:
                return result.columns[matches[0]]
        # fingerprint match against output columns
        if order_ctx is not None:
            fp = fingerprint(e)
            for i, ofp in enumerate(order_ctx.get("fps", [])):
                if ofp == fp:
                    return result.columns[i]
            # evaluate against the pre-projection relation
            rel = order_ctx["rel"]
            repl = order_ctx["replacements"]
            ev = Evaluator(self, rel, outer, repl)
            vec = ev.evaluate(e)
            if len(vec) == result.row_count:
                return vec
        raise BinderException(
            f"ORDER BY expression could not be resolved")

    # ----------------------------------------------------------------- FROM
    def execute_from_filtered(self, ref: a.TableRef, where, outer, env
                              ) -> Relation:
        """FROM + WHERE with greedy join ordering / predicate pushdown:
        cross-join chains become hash joins driven by the WHERE equi-
        conjuncts, and filters apply as soon as their columns are available
        (the reference delegates this to DuckDB's optimizer; SURVEY.md §7.3
        lists join ordering as a required component of the rebuild)."""
        items: List[a.TableRef] = []

        def flatten(r):
            if isinstance(r, a.JoinRef) and r.join_type == "CROSS":
                flatten(r.left)
                flatten(r.right)
            else:
                items.append(r)
        flatten(ref) if ref is not None else items.append(ref)
        if len(items) <= 1 or where is None:
            rel = self.execute_from(ref, outer, env)
            if where is not None:
                ev = Evaluator(self, rel, outer, env=env)
                cond = ev.as_bool(ev.evaluate(where))
                rel = rel.filter(cond.data.astype(bool) & cond.validity)
            return rel

        lateral_items = {j for j, item in enumerate(items)
                         if isinstance(item, a.SubqueryRef) and item.lateral}
        if 0 in lateral_items:
            raise BinderException(
                "LATERAL subquery must follow the table it references")
        # lateral items execute per-row later; placeholder keeps indices
        rels = [Relation([], []) if j in lateral_items
                else self.execute_from(item, outer, env)
                for j, item in enumerate(items)]
        conjuncts: List[a.Expression] = []

        def split(e):
            if isinstance(e, a.Conjunction) and e.op == "AND":
                for c in e.children:
                    split(c)
            else:
                conjuncts.append(e)
        split(where)

        def refs_of(e) -> Optional[set]:
            """Item indices referenced by e's column refs; None when a ref
            resolves in no item (outer correlation — defer to the end)."""
            out = set()
            unresolved = [False]

            def visit(x):
                if isinstance(x, a.ColumnRef):
                    hit = False
                    for j, r in enumerate(rels):
                        try:
                            if r.resolve(x.parts) is not None:
                                out.add(j)
                                hit = True
                                break
                        except BinderException:
                            out.add(j)
                            hit = True
                            break
                    if not hit:
                        unresolved[0] = True
                elif isinstance(x, a.SubqueryExpr):
                    if x.child is not None:
                        visit(x.child)
                else:
                    from .expression import _children
                    for ch in _children(x):
                        visit(ch)
            visit(e)
            return None if unresolved[0] else out

        conj_refs = [refs_of(c) for c in conjuncts]
        pending = list(range(len(conjuncts)))
        joined = rels[0]
        joined_set = {0}
        remaining_items = list(range(1, len(items)))

        def apply_ready_filters():
            nonlocal joined
            applied = []
            for ci in pending:
                r = conj_refs[ci]
                if r is not None and r.issubset(joined_set):
                    ev = Evaluator(self, joined, outer, env=env)
                    try:
                        cond = ev.as_bool(ev.evaluate(conjuncts[ci]))
                    except BinderException:
                        continue   # needs more context; retry at the end
                    joined = joined.filter(
                        cond.data.astype(bool) & cond.validity)
                    applied.append(ci)
            for ci in applied:
                pending.remove(ci)

        apply_ready_filters()
        while remaining_items:
            # find an equi conjunct connecting joined_set to one new item
            next_item = None
            for ci in pending:
                c = conjuncts[ci]
                r = conj_refs[ci]
                if not isinstance(c, a.Comparison) or c.op != "=" or \
                        r is None:
                    continue
                new = r - joined_set
                if len(new) == 1 and (r & joined_set):
                    next_item = new.pop()
                    break
            if next_item is None:
                # laterals join last (their rows depend on what precedes)
                non_lateral = [j for j in remaining_items
                               if j not in lateral_items]
                next_item = non_lateral[0] if non_lateral else \
                    remaining_items[0]
            remaining_items.remove(next_item)
            if next_item in lateral_items:
                joined = self._execute_lateral(joined, items[next_item],
                                               outer, env)
                joined_set.add(next_item)
                apply_ready_filters()
                continue
            right = rels[next_item]
            # gather all equi conjuncts between joined_set and next_item
            equi_pairs = []
            used = []
            for ci in pending:
                c = conjuncts[ci]
                r = conj_refs[ci]
                if not isinstance(c, a.Comparison) or c.op != "=" or \
                        r is None:
                    continue
                if not (next_item in r and
                        (r - {next_item}).issubset(joined_set) and
                        len(r) > 1):
                    continue
                lside = self._side_of(c.left, joined, right)
                rside = self._side_of(c.right, joined, right)
                if lside == "L" and rside == "R":
                    equi_pairs.append((c.left, c.right))
                    used.append(ci)
                elif lside == "R" and rside == "L":
                    equi_pairs.append((c.right, c.left))
                    used.append(ci)
            if equi_pairs:
                lkeys = [self._eval_side(e_l, joined, outer)
                         for e_l, _ in equi_pairs]
                rkeys = [self._eval_side(e_r, right, outer)
                         for _, e_r in equi_pairs]
                lcode, rcode, lval, rval = factorize_keys(lkeys, rkeys)
                li, ri = equi_join_pairs(lcode, rcode, lval, rval)
                joined = Relation.concat_horizontal(joined.take(li),
                                                    right.take(ri))
                for ci in used:
                    pending.remove(ci)
            else:
                li, ri = cross_pairs(joined.row_count, right.row_count)
                joined = Relation.concat_horizontal(joined.take(li),
                                                    right.take(ri))
            joined_set.add(next_item)
            apply_ready_filters()
        # leftover conjuncts (correlated or previously unresolvable)
        for ci in pending:
            ev = Evaluator(self, joined, outer, env=env)
            cond = ev.as_bool(ev.evaluate(conjuncts[ci]))
            joined = joined.filter(cond.data.astype(bool) & cond.validity)
        return joined

    def execute_from(self, ref: a.TableRef, outer, env) -> Relation:
        if ref is None or isinstance(ref, a.EmptyTableRef):
            # single-row dummy relation
            return Relation([Vector(BIGINT, np.zeros(1, dtype=np.int64))],
                            [Binding("", ["__row__"], [0], [True])])
        if isinstance(ref, a.BaseTableRef):
            return self.scan_base_table(ref, outer, env)
        if isinstance(ref, a.SubqueryRef):
            if isinstance(ref.subquery, a.SelectStatement):
                res = self.execute_select(ref.subquery, outer, env)
            else:
                # FROM (DESCRIBE t) / (SHOW ...) / (PIVOT ...) —
                # statement-as-subquery (DuckDB)
                res = self.execute_statement(ref.subquery)
            alias = ref.alias or "unnamed_subquery"
            names = list(res.names)
            if ref.column_aliases:
                names[:len(ref.column_aliases)] = list(ref.column_aliases)
            return Relation.from_columns(alias, names, res.columns,
                                         with_rowid=True)
        if isinstance(ref, a.ValuesRef):
            return self.execute_values(ref, outer, env)
        if isinstance(ref, a.TableFunctionRef):
            from ..functions.table import execute_table_function
            return execute_table_function(self, ref, outer, env)
        if isinstance(ref, a.GraphTableRef):
            from ..pgq.transpiler import bind_graph_table
            select_stmt, alias = bind_graph_table(self, ref)
            res = self.execute_select(select_stmt, outer, env)
            return Relation.from_columns(alias, res.names, res.columns,
                                         with_rowid=True)
        if isinstance(ref, a.JoinRef):
            return self.execute_join(ref, outer, env)
        raise InternalException(f"unhandled table ref {type(ref).__name__}")

    def scan_base_table(self, ref: a.BaseTableRef, outer, env) -> Relation:
        # CTE?
        if ref.schema is None and env is not None:
            cte_env, cte = env.lookup(ref.table)
            if cte is not None:
                key = ref.table.lower()
                cached = cte_env.cache.get(key)
                if cached is None:
                    # a CTE may reference CTEs of the same WITH clause
                    # (e.g. the PGQ csr_cte -> edges_cte chain); guard
                    # against accidental self-recursion
                    if key in getattr(cte_env, "_in_progress", set()):
                        raise BinderException(
                            f"Recursive CTE {ref.table} is not supported")
                    if not hasattr(cte_env, "_in_progress"):
                        cte_env._in_progress = set()
                    cte_env._in_progress.add(key)
                    try:
                        if cte.recursive and _ast_references_table(
                                cte.query, key):
                            cached = self._execute_recursive_cte(
                                key, cte, cte_env)
                        else:
                            cached = self.execute_select(cte.query, None,
                                                         cte_env)
                    finally:
                        cte_env._in_progress.discard(key)
                    cte_env.cache[key] = cached
                alias = ref.alias or ref.table
                names = list(cached.names)
                if cte.column_aliases:
                    names[:len(cte.column_aliases)] = list(cte.column_aliases)
                if ref.column_aliases:
                    names[:len(ref.column_aliases)] = list(ref.column_aliases)
                return Relation.from_columns(alias, names, cached.columns,
                                             with_rowid=True)
        if ref.schema and ref.schema.lower() == "information_schema":
            return self._information_schema_relation(ref)
        catalog = self.connection.resolve_catalog(ref.catalog)
        schemas = self.schema_search_order(ref.schema)
        # view?
        view = None
        for sch in schemas:
            view = catalog.get_view(ref.table, sch)
            if view is not None:
                break
        if view is not None:
            res = self.execute_select(view.query, None, None)
            alias = ref.alias or ref.table
            names = list(res.names)
            if view.column_aliases:
                names[:len(view.column_aliases)] = list(view.column_aliases)
            return Relation.from_columns(alias, names, res.columns,
                                         with_rowid=True)
        table = None
        for sch in schemas:
            table = catalog.get_table(ref.table, sch, missing_ok=True)
            if table is not None:
                break
        if table is None:
            # search attached catalogs
            table = self.connection.find_table_any_catalog(
                ref.table, ref.schema, ref.catalog)
        if table is None:
            from ..functions.table import REGISTRY as TF_REGISTRY, \
                execute_table_function
            if ref.schema is None and ref.table.lower() in TF_REGISTRY:
                tf = a.TableFunctionRef(name=ref.table.lower(), args=[],
                                        alias=ref.alias,
                                        column_aliases=ref.column_aliases)
                return execute_table_function(self, tf, outer, env)
            raise CatalogException(
                f'Table with name {ref.table} does not exist!\n'
                f'Did you mean to query a different table?')
        rel = Relation.from_table(table, ref.alias or ref.table)
        if ref.column_aliases:
            b = rel.bindings[0]
            for i, nm in enumerate(ref.column_aliases):
                b.names[i] = nm
        if getattr(ref, "sample", None):
            rel = self._apply_sample(rel, ref.sample)   # TABLESAMPLE
        return rel

    def _information_schema_relation(self, ref: a.BaseTableRef) -> Relation:
        db = self.connection.database
        name = ref.table.lower()
        if name == "tables":
            rows = []
            for schema in db.catalog.schemas.values():
                for t in schema.tables.values():
                    rows.append(["memory", schema.name, t.name, "BASE TABLE"])
                for v in schema.views.values():
                    rows.append(["memory", schema.name, v.name, "VIEW"])
            names = ["table_catalog", "table_schema", "table_name",
                     "table_type"]
            cols = [Vector.from_values([r[j] for r in rows], VARCHAR)
                    for j in range(4)]
            return Relation.from_columns(ref.alias or "tables", names, cols,
                                         with_rowid=True)
        if name == "columns":
            rows = []
            for schema in db.catalog.schemas.values():
                for t in schema.tables.values():
                    for i, cdef in enumerate(t.column_defs):
                        rows.append(["memory", schema.name, t.name,
                                     cdef.name, i + 1, str(cdef.type)])
            names = ["table_catalog", "table_schema", "table_name",
                     "column_name", "ordinal_position", "data_type"]
            cols = [
                Vector.from_values([r[0] for r in rows], VARCHAR),
                Vector.from_values([r[1] for r in rows], VARCHAR),
                Vector.from_values([r[2] for r in rows], VARCHAR),
                Vector.from_values([r[3] for r in rows], VARCHAR),
                Vector.from_values([r[4] for r in rows], BIGINT),
                Vector.from_values([r[5] for r in rows], VARCHAR),
            ]
            return Relation.from_columns(ref.alias or "columns", names, cols,
                                         with_rowid=True)
        raise CatalogException(
            f'Table with name {ref.table} does not exist!')

    def execute_values(self, ref: a.ValuesRef, outer, env) -> Relation:
        ev_rel = Relation([Vector(BIGINT, np.zeros(1, dtype=np.int64))],
                          [Binding("", ["__row__"], [0], [True])])
        ev = Evaluator(self, ev_rel, outer)
        n_cols = len(ref.rows[0]) if ref.rows else 0
        col_vals: List[List] = [[] for _ in range(n_cols)]
        col_types: List[LogicalType] = [SQLNULL] * n_cols
        for row in ref.rows:
            if len(row) != n_cols:
                raise BinderException(
                    "VALUES rows must all have the same number of columns")
            for j, e in enumerate(row):
                vec = ev.evaluate(e)
                col_vals[j].append((vec.value(0), vec.type))
                if vec.type.id != TypeId.SQLNULL:
                    if col_types[j].id == TypeId.SQLNULL:
                        col_types[j] = vec.type
                    elif col_types[j] != vec.type and \
                            col_types[j].is_numeric and vec.type.is_numeric:
                        from ..types import max_numeric_type
                        col_types[j] = max_numeric_type(col_types[j], vec.type)
                    elif col_types[j].id != vec.type.id and (
                            col_types[j].id == TypeId.VARCHAR or
                            vec.type.id == TypeId.VARCHAR):
                        col_types[j] = VARCHAR
        names = [f"col{j}" for j in range(n_cols)]
        if ref.column_aliases:
            names[:len(ref.column_aliases)] = list(ref.column_aliases)
        cols = []
        for vals, t in zip(col_vals, col_types):
            if t.id == TypeId.DECIMAL:
                # rescale each row from its source representation to the
                # unified scale (raw scaled ints are scale-relative)
                conv = []
                for v, vt in vals:
                    if v is None:
                        conv.append(None)
                    elif vt.id == TypeId.DECIMAL:
                        d = t.scale - vt.scale
                        conv.append(int(v) * 10 ** d if d >= 0 else
                                    int(round(v / 10 ** (-d))))
                    elif vt.is_floating:
                        conv.append(int(round(float(v) * 10 ** t.scale)))
                    else:
                        conv.append(int(v) * 10 ** t.scale)
                cols.append(Vector.from_values(conv, t))
            else:
                cols.append(Vector.from_values([v for v, _ in vals], t))
        return Relation.from_columns(ref.alias or "values", names, cols)

    # ----------------------------------------------------------------- joins
    def _execute_lateral(self, left: Relation, ref: a.SubqueryRef, outer,
                         env) -> Relation:
        """CROSS JOIN LATERAL: execute the subquery once per left row with
        that row in scope (OuterScope chained over any existing outer);
        rows pair with their producing left row. Row-at-a-time by design —
        the correlated subquery is arbitrary."""
        parts: List[Relation] = []
        left_idx: List[np.ndarray] = []
        plain = a.SubqueryRef(subquery=ref.subquery, alias=ref.alias,
                              column_aliases=ref.column_aliases)
        for i in range(left.row_count):
            scope = OuterScope(left, i, outer)
            r = self.execute_from(plain, scope, env)
            parts.append(r)
            left_idx.append(np.full(r.row_count, i, dtype=np.int64))
        if not parts:
            # zero left rows: learn the subquery's output shape by binding
            # it against a single all-NULL left row (correlated columns
            # resolve; no real data flows), then keep zero rows
            null_cols = [Vector.from_values([None], c.type)
                         for c in left.columns]
            probe_rel = Relation(null_cols, left.bindings)
            empty = self.execute_from(
                plain, OuterScope(probe_rel, 0, outer), env)
            return Relation.concat_horizontal(
                left.take(np.empty(0, np.int64)),
                empty.take(np.empty(0, np.int64)))
        cols = [Vector.concat([p.columns[k] for p in parts])
                for k in range(len(parts[0].columns))]
        right = Relation(cols, parts[0].bindings)
        li = np.concatenate(left_idx)
        return Relation.concat_horizontal(left.take(li), right)

    def _execute_asof_join(self, left: Relation, right: Relation,
                           ref: a.JoinRef, outer, env) -> Relation:
        """ASOF [LEFT] JOIN (DuckDB semantics): for each left row, the
        single right row with the greatest right-key satisfying the ONE
        inequality condition (>=, >, <=, <), within the partition defined
        by the equality conditions. Sort-based: right sorted by
        (equi keys, time), one searchsorted per side."""
        conjs: List[a.Expression] = []

        def split(e):
            if isinstance(e, a.Conjunction) and e.op == "AND":
                for c in e.children:
                    split(c)
            else:
                conjs.append(e)
        if ref.condition is None:
            raise BinderException("ASOF JOIN requires an ON condition")
        split(ref.condition)
        ineq = [c for c in conjs if isinstance(c, a.Comparison) and
                c.op in (">=", ">", "<=", "<")]
        equis = [c for c in conjs if isinstance(c, a.Comparison) and
                 c.op == "="]
        if len(ineq) != 1 or len(ineq) + len(equis) != len(conjs):
            raise BinderException(
                "ASOF JOIN requires exactly one inequality condition "
                "(plus optional equality conditions)")
        cmp = ineq[0]
        lside = self._side_of(cmp.left, left, right)
        rside = self._side_of(cmp.right, left, right)
        op = cmp.op
        if lside == "L" and rside == "R":
            lt_e, rt_e = cmp.left, cmp.right
        elif lside == "R" and rside == "L":
            lt_e, rt_e = cmp.right, cmp.left
            op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}[op]
        else:
            raise BinderException(
                "ASOF JOIN inequality must compare the two join sides")
        lt_vec = self._eval_side(lt_e, left, outer)
        rt_vec = self._eval_side(rt_e, right, outer)
        lt = lt_vec.data
        rt = rt_vec.data
        lvalid = lt_vec.validity.copy()
        rvalid = rt_vec.validity.copy()
        # partition codes from the equality conditions (NULL keys never
        # match, like any SQL equality)
        lkeys, rkeys = [], []
        for c in equis:
            cl = self._side_of(c.left, left, right)
            a_e, b_e = (c.left, c.right) if cl == "L" else (c.right, c.left)
            lkeys.append(self._eval_side(a_e, left, outer))
            rkeys.append(self._eval_side(b_e, right, outer))
        if lkeys:
            lcode, rcode, lkv, rkv = factorize_keys(lkeys, rkeys)
            lvalid &= lkv
            rvalid &= rkv
        else:
            lcode = np.zeros(left.row_count, dtype=np.int64)
            rcode = np.zeros(right.row_count, dtype=np.int64)
        # for <= / < flip the time axis so the match is always "greatest
        # right time not exceeding the left bound"; rank-encoding below
        # keeps INTEGER keys exact (no float64 collapse above 2^53)
        if np.issubdtype(lt.dtype, np.unsignedinteger):
            lt = lt.astype(np.int64)
        if np.issubdtype(rt.dtype, np.unsignedinteger):
            rt = rt.astype(np.int64)
        if op in ("<=", "<"):
            lt, rt = -lt, -rt
            strict = op == "<"
        else:
            strict = op == ">"
        # rank-encode times over the union of valid values, then combine
        # (partition, time rank) into one sortable int64 key so one
        # vectorized searchsorted answers every left row
        uniq = np.unique(np.concatenate([
            np.asarray(rt[rvalid]), np.asarray(lt[lvalid])])) \
            if (rvalid.any() or lvalid.any()) else np.empty(0, rt.dtype)
        U = np.int64(len(uniq) + 1)
        lt_id = np.searchsorted(uniq, lt, side="left").astype(np.int64)
        rt_id = np.searchsorted(uniq, rt, side="left").astype(np.int64)
        rsel = np.flatnonzero(rvalid)
        rs_key = rcode[rsel] * U + rt_id[rsel]
        order_local = np.argsort(rs_key, kind="stable")
        rs_key = rs_key[order_local]
        order = rsel[order_local]
        lquery = lcode * U + lt_id
        side = "left" if strict else "right"
        pos = np.searchsorted(rs_key, lquery, side=side) - 1
        safe = np.clip(pos, 0, max(len(rs_key) - 1, 0))
        matched = lvalid & (pos >= 0) & (len(rs_key) > 0)
        if len(rs_key):
            matched &= rs_key[safe] // U == lcode
        li = np.flatnonzero(matched)
        ri = order[pos[matched]] if len(rs_key) else \
            np.empty(0, dtype=np.int64)
        if ref.join_type == "ASOF_LEFT":
            miss = np.flatnonzero(~matched)
            li = np.concatenate([li, miss])
            null_mask = np.concatenate([
                np.zeros(len(ri), dtype=bool), np.ones(len(miss), bool)])
            ri = np.concatenate([ri, np.zeros(len(miss), dtype=np.int64)])
            reorder = np.argsort(li, kind="stable")
            return Relation.concat_horizontal(
                left.take(li[reorder]),
                right.take_with_nulls(ri[reorder], null_mask[reorder]))
        return Relation.concat_horizontal(left.take(li), right.take(ri))

    def execute_join(self, ref: a.JoinRef, outer, env) -> Relation:
        left = self.execute_from(ref.left, outer, env)
        if isinstance(ref.right, a.SubqueryRef) and ref.right.lateral:
            joined = self._execute_lateral(left, ref.right, outer, env)
            if ref.join_type in ("CROSS", "INNER"):
                if ref.condition is not None:
                    ev = Evaluator(self, joined, outer, env=env)
                    cond = ev.as_bool(ev.evaluate(ref.condition))
                    joined = joined.filter(
                        cond.data.astype(bool) & cond.validity)
                return joined
            raise NotImplementedException(
                f"{ref.join_type} JOIN LATERAL is not supported "
                "(CROSS/INNER only)")
        right = self.execute_from(ref.right, outer, env)
        jt = ref.join_type
        if jt in ("ASOF", "ASOF_LEFT"):
            return self._execute_asof_join(left, right, ref, outer, env)
        if jt == "POSITIONAL":
            n = min(left.row_count, right.row_count)
            idx = np.arange(n)
            lpart = left.take(idx)
            rpart = right.take(idx)
            if left.row_count > n:
                pass
            return Relation.concat_horizontal(lpart, rpart)
        if jt == "CROSS":
            li, ri = cross_pairs(left.row_count, right.row_count)
            return Relation.concat_horizontal(
                left.take(li), right.take(ri))
        condition = ref.condition
        using_cols: List[str] = []
        if ref.using:
            using_cols = list(ref.using)
            conjs = []
            for col in ref.using:
                conjs.append(a.Comparison(
                    op="=",
                    left=a.ColumnRef(parts=(self._binding_alias(left), col)),
                    right=a.ColumnRef(parts=(self._binding_alias(right), col))))
            condition = conjs[0] if len(conjs) == 1 else \
                a.Conjunction(op="AND", children=conjs)
        if ref.is_natural:
            shared = []
            lnames = {n.lower() for b in left.bindings
                      for n, _ in b.visible()}
            for b in right.bindings:
                for n, _ in b.visible():
                    if n.lower() in lnames:
                        shared.append(n)
            using_cols = shared
            conjs = [a.Comparison(
                op="=",
                left=a.ColumnRef(parts=(self._binding_alias(left), c)),
                right=a.ColumnRef(parts=(self._binding_alias(right), c)))
                for c in shared]
            condition = conjs[0] if len(conjs) == 1 else \
                a.Conjunction(op="AND", children=conjs) if conjs else None

        equi, residual = self._split_equi_conditions(condition, left, right)
        if equi:
            lkeys = [self._eval_side(e_l, left, outer) for e_l, _ in equi]
            rkeys = [self._eval_side(e_r, right, outer) for _, e_r in equi]
            lcode, rcode, lval, rval = factorize_keys(lkeys, rkeys)
            li, ri = equi_join_pairs(lcode, rcode, lval, rval)
        else:
            li, ri = cross_pairs(left.row_count, right.row_count)

        joined = Relation.concat_horizontal(left.take(li), right.take(ri))
        if residual is not None:
            ev = Evaluator(self, joined, outer)
            cond = ev.as_bool(ev.evaluate(residual))
            mask = cond.data.astype(bool) & cond.validity
            li, ri = li[mask], ri[mask]
            joined = joined.filter(mask)
        if jt == "INNER":
            return self._using_dedup(joined, len(left.columns), left, right,
                                     using_cols, jt)
        if jt == "SEMI":
            keep = np.zeros(left.row_count, dtype=bool)
            keep[li] = True
            return left.filter(keep)
        if jt == "ANTI":
            keep = np.ones(left.row_count, dtype=bool)
            keep[li] = False
            return left.filter(keep)
        if jt in ("LEFT", "FULL"):
            matched_left = np.zeros(left.row_count, dtype=bool)
            matched_left[li] = True
            un_l = np.flatnonzero(~matched_left)
            pad_li = np.concatenate([li, un_l])
            pad_ri = np.concatenate([ri, np.zeros(len(un_l), dtype=np.int64)])
            null_r = np.concatenate([np.zeros(len(li), dtype=bool),
                                     np.ones(len(un_l), dtype=bool)])
            out = Relation.concat_horizontal(
                left.take(pad_li),
                right.take_with_nulls(pad_ri, null_r))
            if jt == "FULL":
                matched_right = np.zeros(right.row_count, dtype=bool)
                matched_right[ri] = True
                un_r = np.flatnonzero(~matched_right)
                extra = Relation.concat_horizontal(
                    left.take_with_nulls(np.zeros(len(un_r), dtype=np.int64),
                                         np.ones(len(un_r), dtype=bool)),
                    right.take(un_r))
                cols = [Vector.concat([c1, c2])
                        for c1, c2 in zip(out.columns, extra.columns)]
                out = Relation(cols, out.bindings)
            return self._using_dedup(out, len(left.columns), left, right,
                                     using_cols, jt)
        if jt == "RIGHT":
            matched_right = np.zeros(right.row_count, dtype=bool)
            matched_right[ri] = True
            un_r = np.flatnonzero(~matched_right)
            pad_ri = np.concatenate([ri, un_r])
            pad_li = np.concatenate([li, np.zeros(len(un_r), dtype=np.int64)])
            null_l = np.concatenate([np.zeros(len(ri), dtype=bool),
                                     np.ones(len(un_r), dtype=bool)])
            out = Relation.concat_horizontal(
                left.take_with_nulls(pad_li, null_l),
                right.take(pad_ri))
            return self._using_dedup(out, len(left.columns), left, right,
                                     using_cols, jt)
        raise InternalException(f"unhandled join type {jt}")

    def _using_dedup(self, out: Relation, n_left_cols: int, left: Relation,
                     right: Relation, using_cols: List[str], jt: str
                     ) -> Relation:
        """SQL USING/NATURAL join column semantics (host grammar
        select.gram:110 UsingClause): each join column appears ONCE in
        SELECT *, unqualified references bind to the coalesced column, and
        qualified references to either side keep working. The left slot
        holds the output column (coalesced with the right side for
        RIGHT/FULL outer joins, where left padding is NULL); the right
        binding's entry is marked using-hidden."""
        if not using_cols:
            return out
        pairs = []   # (lower name, left slot, right slot)
        for col in using_cols:
            ls = left.resolve((col,))
            rs = right.resolve((col,))
            if ls is None or rs is None:
                continue
            pairs.append((col.lower(), ls, rs + n_left_cols))
        if not pairs:
            return out
        if jt in ("RIGHT", "FULL"):
            cols = list(out.columns)
            for _, ls, rs in pairs:
                lvec, rvec = cols[ls], cols[rs]
                if rvec.type != lvec.type and \
                        rvec.type.id != TypeId.SQLNULL:
                    rvec = cast_vector(rvec, lvec.type)
                data = np.where(lvec.validity, lvec.data, rvec.data)
                if lvec.data.dtype == object:
                    data = data.astype(object)
                cols[ls] = Vector(lvec.type, data,
                                  lvec.validity | rvec.validity)
            out = Relation(cols, out.bindings)
        hidden_names = {p[0] for p in pairs}
        right_slots = {p[2] for p in pairs}
        new_bindings = []
        for b in out.bindings:
            touched = [k for k, (nm, ix) in
                       enumerate(zip(b.names, b.indices))
                       if nm.lower() in hidden_names and ix in right_slots]
            if touched:
                hidden = list(b.hidden)
                for k in touched:
                    hidden[k] = True
                new_bindings.append(Binding(
                    b.alias, list(b.names), list(b.indices), hidden,
                    b.using_hidden | {b.names[k].lower() for k in touched}))
            else:
                new_bindings.append(b)
        return Relation(out.columns, new_bindings)

    @staticmethod
    def _binding_alias(rel: Relation) -> str:
        return rel.bindings[0].alias if rel.bindings else ""

    def _split_equi_conditions(self, condition, left: Relation,
                               right: Relation):
        """Split ON condition into equi pairs (left_expr, right_expr) and a
        residual expression."""
        if condition is None:
            return [], None
        conjuncts: List[a.Expression] = []

        def flatten(e):
            if isinstance(e, a.Conjunction) and e.op == "AND":
                for c in e.children:
                    flatten(c)
            else:
                conjuncts.append(e)
        flatten(condition)
        equi = []
        residual = []
        for c in conjuncts:
            if isinstance(c, a.Comparison) and c.op == "=":
                lside = self._side_of(c.left, left, right)
                rside = self._side_of(c.right, left, right)
                if lside == "L" and rside == "R":
                    equi.append((c.left, c.right))
                    continue
                if lside == "R" and rside == "L":
                    equi.append((c.right, c.left))
                    continue
            residual.append(c)
        res = None
        if residual:
            res = residual[0] if len(residual) == 1 else \
                a.Conjunction(op="AND", children=residual)
        return equi, res

    def _side_of(self, e: a.Expression, left: Relation, right: Relation):
        """Which side an expression's column references belong to: 'L', 'R',
        None (no columns), or 'BOTH'."""
        side = set()

        def visit(x):
            if isinstance(x, a.ColumnRef):
                if left.resolve(x.parts) is not None:
                    side.add("L")
                elif right.resolve(x.parts) is not None:
                    side.add("R")
                else:
                    side.add("?")
            elif isinstance(x, a.SubqueryExpr):
                side.add("?")
            else:
                from .expression import _children
                for ch in _children(x):
                    visit(ch)
        visit(e)
        if side == {"L"}:
            return "L"
        if side == {"R"}:
            return "R"
        if not side:
            return None
        return "BOTH"

    def _eval_side(self, e: a.Expression, rel: Relation, outer) -> Vector:
        ev = Evaluator(self, rel, outer)
        return ev.evaluate(e)

    # ------------------------------------------------------------------ stars
    def _expand_columns_in_exprs(self, node: a.SelectNode,
                                 rel: Relation) -> a.SelectNode:
        """COLUMNS(...) nested inside select-list expressions expands the
        whole expression once per matched column (DuckDB star expressions:
        ``min(COLUMNS(*))``, ``COLUMNS('a.*') + 1``)."""
        def find(e, out):
            if isinstance(e, a.FunctionCall):
                if e.name.lower() == "columns":
                    out.append(e)
                    return
                for x in e.args:
                    find(x, out)
            elif isinstance(e, a.AggregateCall):
                for x in e.args:
                    find(x, out)
            elif isinstance(e, (a.Comparison,)):
                find(e.left, out)
                find(e.right, out)
            elif isinstance(e, a.Conjunction):
                for c in e.children:
                    find(c, out)
            elif isinstance(e, a.Cast):
                find(e.child, out)
            elif isinstance(e, a.Not):
                find(e.child, out)
        if not any(find(e, hits := []) or hits
                   for e in node.select_list):
            return node
        import copy
        import dataclasses
        new_list: List[a.Expression] = []
        for e in node.select_list:
            hits: List[a.FunctionCall] = []
            find(e, hits)
            if not hits:
                new_list.append(e)
                continue
            call = hits[0]
            arg = call.args[0] if call.args else a.Star()
            if isinstance(arg, a.Star):
                star = arg
            elif isinstance(arg, a.Constant) and isinstance(arg.value, str):
                star = a.Star(name_regex=arg.value)
            else:
                raise BinderException(
                    "COLUMNS expects * or a regex string argument")
            hit_ids = {id(h) for h in hits}

            def substitute(x, ref):
                if id(x) in hit_ids:
                    return ref
                if dataclasses.is_dataclass(x) and not isinstance(x, type):
                    clone = copy.copy(x)
                    for f in dataclasses.fields(x):
                        v = getattr(x, f.name)
                        if isinstance(v, list):
                            setattr(clone, f.name,
                                    [substitute(i, ref) for i in v])
                        elif dataclasses.is_dataclass(v) and \
                                not isinstance(v, type):
                            setattr(clone, f.name, substitute(v, ref))
                    return clone
                return x
            for b_alias, name, _ in self.expand_star(rel, star):
                # unqualified when unambiguous (DuckDB headers: min(a))
                if rel.resolve((name,)) is not None or not b_alias:
                    ref = a.ColumnRef(parts=(name,))
                else:
                    ref = a.ColumnRef(parts=(b_alias, name))
                clone = substitute(e, ref)
                if clone.alias is None:
                    clone.alias = Executor._render(clone)
                new_list.append(clone)
        return dataclasses.replace(node, select_list=new_list)

    def expand_star(self, rel: Relation, star: a.Star):
        out = []
        exclude = {x.lower() for x in star.exclude}
        rx = None
        if star.name_regex is not None:
            import re as _re
            try:
                rx = _re.compile(star.name_regex)
            except _re.error as exc:
                raise BinderException(
                    f"Invalid regex in COLUMNS: {exc}")
        for b in rel.bindings:
            if star.relation is not None and \
                    b.alias.lower() != star.relation.lower():
                continue
            entries = b.visible()
            if star.relation is not None and b.using_hidden:
                # a QUALIFIED alias.* still includes this side's
                # USING/NATURAL join columns (only bare * dedups them)
                entries = [(n, i) for n, i, h in
                           zip(b.names, b.indices, b.hidden)
                           if not h or n.lower() in b.using_hidden]
            for name, slot in entries:
                if name.lower() in exclude:
                    continue
                if rx is not None and not rx.search(name):
                    continue
                out.append((b.alias, name, rel.columns[slot]))
        if star.relation is not None and not out:
            raise BinderException(
                f'Referenced table "{star.relation}" not found!')
        if rx is not None and not out:
            raise BinderException(
                f"No columns matched the regex \"{star.name_regex}\" "
                "in the COLUMNS expression")
        return out

    @staticmethod
    def derive_name(e: a.Expression) -> str:
        if e.alias:
            return e.alias
        if isinstance(e, a.ColumnRef):
            return e.parts[-1]
        if isinstance(e, a.FunctionCall):
            return e.name
        if isinstance(e, a.AggregateCall):
            if e.name == "count_star":
                return "count_star()"
            inner = ", ".join(Executor._render(x) for x in e.args)
            return f"{e.name}({inner})"
        if isinstance(e, a.Cast):
            return Executor.derive_name(e.child)
        if isinstance(e, a.StructExtract):
            return e.field_name
        if isinstance(e, a.Constant):
            return str(e.value)
        return Executor._render(e)

    @staticmethod
    def _render(e: a.Expression) -> str:
        if isinstance(e, a.ColumnRef):
            return ".".join(e.parts)
        if isinstance(e, a.Constant):
            if isinstance(e.value, str):
                return f"'{e.value}'"
            if isinstance(e.value, bool):
                return "true" if e.value else "false"
            return str(e.value)
        if isinstance(e, a.FunctionCall):
            return f"{e.name}(" + ", ".join(
                Executor._render(x) for x in e.args) + ")"
        if isinstance(e, a.AggregateCall):
            return f"{e.name}(" + ", ".join(
                Executor._render(x) for x in e.args) + ")"
        if isinstance(e, a.Comparison):
            return (f"({Executor._render(e.left)} {e.op} "
                    f"{Executor._render(e.right)})")
        if isinstance(e, a.Star):
            return "*"
        if isinstance(e, a.ListExpr):
            return "list_value(" + ", ".join(
                Executor._render(x) for x in e.values) + ")"
        if isinstance(e, a.ArrayIndex):
            base = Executor._render(e.child)
            if e.is_slice:
                stop = Executor._render(e.slice_stop) \
                    if e.slice_stop is not None else ""
                start = Executor._render(e.index) \
                    if e.index is not None else ""
                return f"{base}[{start}:{stop}]"
            return f"{base}[{Executor._render(e.index)}]"
        if isinstance(e, a.StructExtract):
            return f"{Executor._render(e.child)}.{e.field_name}"
        if isinstance(e, a.Cast):
            return f"CAST({Executor._render(e.child)} AS {e.target})"
        if isinstance(e, a.Not):
            return f"(NOT {Executor._render(e.child)})"
        if isinstance(e, a.Conjunction):
            return "(" + f" {e.op} ".join(
                Executor._render(c) for c in e.children) + ")"
        if isinstance(e, a.Between):
            return (f"({Executor._render(e.expr)} BETWEEN "
                    f"{Executor._render(e.lower)} AND "
                    f"{Executor._render(e.upper)})")
        if isinstance(e, a.IsNull):
            return (f"({Executor._render(e.child)} IS "
                    f"{'NOT ' if e.negated else ''}NULL)")
        if isinstance(e, a.Case):
            return "CASE"
        if isinstance(e, a.WindowCall):
            return f"{e.name}(" + ", ".join(
                Executor._render(x) for x in e.args) + ") OVER (...)"
        if isinstance(e, a.SubqueryExpr):
            return "SUBQUERY"
        if isinstance(e, a.StructExpr):
            return ("struct_pack(" +
                    ", ".join(k for k, _ in e.fields) + ")")
        return type(e).__name__.lower()

    # ==================================================================== DML
    def execute_create_table(self, stmt: a.CreateTableStatement) -> QueryResult:
        catalog = self.connection.resolve_catalog(stmt.catalog)
        if stmt.query is not None:
            res = self.execute_select(stmt.query)
            if stmt.columns:
                defs = [ColumnDefinition(nm, t if t is not None else c.type,
                                         nn)
                        for (nm, t, nn, _), c in zip(stmt.columns,
                                                     res.columns)]
            else:
                defs = [ColumnDefinition(nm, c.type)
                        for nm, c in zip(res.names, res.columns)]
            table = DataTable(stmt.name, defs, schema=stmt.schema or "main")
            cols = []
            for d, c in zip(defs, res.columns):
                if c.type.id != d.type.id:
                    c = cast_vector(c, d.type)
                cols.append(c)
            table.append(cols)
            catalog.create_table(table, or_replace=stmt.or_replace,
                                 if_not_exists=stmt.if_not_exists)
            return QueryResult([], [])
        from ..types import resolve_user_type
        defs = [ColumnDefinition(nm, resolve_user_type(t), nn, default)
                for nm, t, nn, default in stmt.columns]
        table = DataTable(stmt.name, defs,
                          schema=stmt.schema or self.default_schema())
        table.constraints = list(getattr(stmt, "constraints", []))
        # validate foreign keys (DuckDB semantics: referenced table must
        # exist in this table's schema/main and carry a PK/UNIQUE)
        for c in table.constraints:
            if c[0] != "fk":
                continue
            _, fk_cols, ref_name, pk_cols = c
            ref_table = None
            for sch in (table.schema, "main"):
                ref_table = catalog.get_table(ref_name, sch, missing_ok=True)
                if ref_table is not None:
                    break
            if ref_table is None:
                raise CatalogException(
                    f"Table with name {ref_name} does not exist!")
            has_pk = any(rc[0] == "pk" for rc in ref_table.constraints)
            if not has_pk:
                raise BinderException(
                    f"Failed to create foreign key: there is no primary key "
                    f'or unique constraint for referenced table "{ref_name}"')
        catalog.create_table(table, or_replace=stmt.or_replace,
                             if_not_exists=stmt.if_not_exists)
        return QueryResult([], [])

    def execute_insert(self, stmt: a.InsertStatement) -> QueryResult:
        catalog = self.connection.resolve_catalog(stmt.catalog
                                                  if hasattr(stmt, "catalog")
                                                  else None)
        table = catalog.get_table(stmt.table, stmt.schema)
        res = self.execute_select(stmt.query)
        n = res.row_count
        if stmt.by_name and not stmt.columns:
            # INSERT INTO t BY NAME query: the query's output column names
            # select the target columns (DuckDB)
            for nm in res.names:
                if table.column_index(nm) is None:
                    raise BinderException(
                        f'Column "{nm}" of the INSERT source does not '
                        f"exist in the target table")
            stmt.columns = tuple(res.names)
        if stmt.columns:
            name_to_vec = {}
            if len(stmt.columns) != len(res.columns):
                raise BinderException(
                    f"Column count mismatch in INSERT: {len(stmt.columns)} "
                    f"target columns, {len(res.columns)} values")
            for nm, c in zip(stmt.columns, res.columns):
                name_to_vec[nm.lower()] = c
            vectors = []
            for cdef in table.column_defs:
                vec = name_to_vec.get(cdef.name.lower())
                if vec is None:
                    if cdef.default is not None:
                        ev_rel = Relation(
                            [Vector(BIGINT, np.zeros(n, dtype=np.int64))],
                            [Binding("", ["__row__"], [0], [True])])
                        vec = Evaluator(self, ev_rel).evaluate(cdef.default)
                    else:
                        vec = Vector.constant(None, cdef.type, n)
                vectors.append(vec)
        else:
            if len(res.columns) != len(table.column_defs):
                raise BinderException(
                    f"table {table.name} has {len(table.column_defs)} columns "
                    f"but {len(res.columns)} values were supplied")
            vectors = res.columns
        casted = []
        for cdef, vec in zip(table.column_defs, vectors):
            if vec.type.id != cdef.type.id:
                vec = cast_vector(vec, cdef.type)
            casted.append(vec)
        cons = getattr(table, "constraints", ())
        if stmt.on_conflict or any(
                c and c[0] in ("pk", "unique") for c in cons):
            casted = self._insert_conflicts(stmt, table, casted)
            n = len(casted[0]) if casted else 0
        if any(c and c[0] in ("check", "fk") for c in cons):
            self._enforce_row_constraints(table, casted)
        table.append(casted)
        self.connection.database.invalidate_graph_caches(table.name)
        if stmt.returning:
            return self._returning_result(table, stmt.table, casted,
                                          stmt.returning)
        cnt = Vector.from_values([n], BIGINT)
        return QueryResult(["Count"], [cnt])

    def _restrict_fk_delete(self, table, mask: np.ndarray) -> None:
        """DELETE restriction: a parent row still referenced by a child
        table's FOREIGN KEY cannot be deleted (DuckDB has no cascade)."""
        if not mask.any():
            return
        catalog = self.connection.resolve_catalog(None)
        children = []
        for schema in catalog.schemas.values():
            for child in schema.tables.values():
                for cons in getattr(child, "constraints", ()):
                    if cons and cons[0] == "fk" and \
                            str(cons[2]).lower() == table.name.lower():
                        children.append((child, list(cons[1]),
                                         list(cons[3]) if len(cons) > 3
                                         and cons[3] else None))
        if not children:
            return
        for child, fk_cols, ref_cols in children:
            if not ref_cols:
                ref_cols = next((list(c[1]) for c in table.constraints
                                 if c and c[0] == "pk"), None)
                if not ref_cols:
                    continue
            ridx = [table.column_index(c) for c in ref_cols]
            doomed = {tuple(table.columns[j].value(r) for j in ridx)
                      for r in np.flatnonzero(mask)}
            cidx = [child.column_index(c) for c in fk_cols]
            for r in range(child.row_count):
                if all(child.columns[j].validity[r] for j in cidx):
                    key = tuple(child.columns[j].value(r) for j in cidx)
                    if key in doomed:
                        raise ConstraintException(
                            f'Violates foreign key constraint because '
                            f'key "{ref_cols[0]}: {key[0]}" is still '
                            f"referenced by a foreign key in a "
                            f"different table")

    def _post_update_constraints(self, table, rows: np.ndarray,
                                 assigned_cols) -> None:
        """Constraint checks after an UPDATE: CHECK/FK on the updated
        rows; PK/UNIQUE whole-table re-verification when a key column was
        assigned."""
        cons = getattr(table, "constraints", ())
        if len(rows) and any(c and c[0] in ("check", "fk") for c in cons):
            self._enforce_row_constraints(
                table, [c.take(rows) for c in table.columns])
        assigned = {c.lower() for c in assigned_cols}
        for c in cons:
            if c and c[0] in ("pk", "unique") and \
                    assigned & {x.lower() for x in c[1]}:
                kind = "primary key" if c[0] == "pk" else "unique"
                key_idx = [table.column_index(x) for x in c[1]]
                seen = set()
                for r in range(table.row_count):
                    key = tuple(table.columns[k].value(r)
                                for k in key_idx)
                    if any(v is None for v in key):
                        continue
                    if key in seen:
                        raise ConstraintException(
                            f'Duplicate key "{c[1][0]}: {key[0]}" '
                            f"violates {kind} constraint.")
                    seen.add(key)

    def _check_duplicate_keys(self, table, vectors: List[Vector],
                              cols: List[str], kind: str):
        """Hard uniqueness check of incoming rows against the table and
        within the batch for one key set (NULL key parts never
        conflict)."""
        key_idx = [table.column_index(c) for c in cols]
        n = len(vectors[0]) if vectors else 0
        existing = set()
        for row in range(table.row_count):
            existing.add(tuple(table.columns[k].value(row)
                               for k in key_idx))
        for i in range(n):
            key = tuple(vectors[k].value(i) for k in key_idx)
            if any(v is None for v in key):
                continue
            if key in existing:
                raise ConstraintException(
                    f'Duplicate key "{cols[0]}: {key[0]}" violates '
                    f"{kind} constraint.")
            existing.add(key)

    def _enforce_row_constraints(self, table, vectors: List[Vector]):
        """CHECK and FOREIGN KEY enforcement over candidate rows (INSERT /
        UPDATE images). CHECK passes on NULL (SQL); FK values must exist
        in the referenced table (all-non-NULL rows only)."""
        n = len(vectors[0]) if vectors else 0
        if n == 0:
            return
        names = list(table.column_names)
        for cons in getattr(table, "constraints", ()):
            if not cons:
                continue
            if cons[0] == "check":
                rel = Relation.from_columns(table.name, names,
                                            list(vectors))
                ev = Evaluator(self, rel)
                v = ev.as_bool(ev.evaluate(cons[1]))
                bad = v.validity & ~v.data.astype(bool)
                if bad.any():
                    raise ConstraintException(
                        f"CHECK constraint failed on table {table.name}!")
            elif cons[0] == "fk":
                cols, ref_name = list(cons[1]), cons[2]
                ref_cols = list(cons[3]) if len(cons) > 3 and cons[3] \
                    else None
                ref = self.connection.resolve_catalog(None).get_table(
                    ref_name, missing_ok=True)
                if ref is None:
                    continue
                if not ref_cols:
                    ref_cols = next(
                        (list(c[1]) for c in ref.constraints
                         if c and c[0] == "pk"), None)
                    if not ref_cols:
                        continue
                ridx = [ref.column_index(c) for c in ref_cols]
                keys = {tuple(ref.columns[j].value(r) for j in ridx)
                        for r in range(ref.row_count)}
                cidx = [table.column_index(c) for c in cols]
                vecs = [vectors[j] for j in cidx]
                for i in range(n):
                    if all(v.validity[i] for v in vecs):
                        key = tuple(v.value(i) for v in vecs)
                        if key not in keys:
                            raise ConstraintException(
                                f'Violates foreign key constraint '
                                f'because key "{cols[0]}: {key[0]}" does '
                                f"not exist in the referenced table")

    def _insert_conflicts(self, stmt: a.InsertStatement, table,
                          vectors: List[Vector]) -> List[Vector]:
        """Primary-key enforcement + ON CONFLICT resolution for INSERT
        (DuckDB): without an ON CONFLICT clause a duplicate key raises a
        Constraint Error; DO NOTHING drops conflicting rows; DO UPDATE /
        OR REPLACE update the existing row in place. Returns the vectors
        of the rows that should actually be appended."""
        pk = next((list(c[1]) for c in getattr(table, "constraints", ())
                   if c and c[0] == "pk"), None)
        uniques = [list(c[1]) for c in getattr(table, "constraints", ())
                   if c and c[0] == "unique"]
        target = [c.lower() for c in stmt.conflict_target] or \
            ([c.lower() for c in pk] if pk else
             ([c.lower() for c in uniques[0]] if len(uniques) == 1
              else None))
        if target is None:
            if stmt.on_conflict:
                raise BinderException(
                    "There are no UNIQUE/PRIMARY KEY Indexes that refer "
                    "to this table, ON CONFLICT is a no-op")
            return vectors
        # other key sets than the conflict target stay HARD errors
        for kind, cols in [("primary key", pk)] + \
                [("unique", u) for u in uniques]:
            if cols is None:
                continue
            lcols = [c.lower() for c in cols]
            if lcols == target:
                continue
            self._check_duplicate_keys(table, vectors, lcols, kind)
        target_kind = "primary key" if pk and \
            [c.lower() for c in pk] == target else "unique"
        key_idx = [table.column_index(c) for c in target]
        n = len(vectors[0]) if vectors else 0
        existing = {}
        for row in range(table.row_count):
            existing[tuple(table.columns[k].value(row)
                           for k in key_idx)] = row
        keep = np.ones(n, dtype=bool)
        update_pairs = []                  # (existing_row, incoming_pos)
        batch_seen = {}
        for i in range(n):
            key = tuple(vectors[k].value(i) for k in key_idx)
            if target_kind == "unique" and any(v is None for v in key):
                continue                   # NULL never conflicts (SQL)
            if key in batch_seen:
                if stmt.on_conflict in ("update", "replace_all"):
                    raise ConstraintException(
                        "ON CONFLICT DO UPDATE can not update the same "
                        "row twice in the same command")
                if stmt.on_conflict == "nothing":
                    keep[i] = False
                    continue
                raise ConstraintException(
                    f'Duplicate key "{target[0]}: {key[0]}" violates '
                    f"{target_kind} constraint.")
            if key in existing:
                if stmt.on_conflict is None:
                    raise ConstraintException(
                        f'Duplicate key "{target[0]}: {key[0]}" violates '
                        f"{target_kind} constraint.")
                keep[i] = False
                if stmt.on_conflict in ("update", "replace_all"):
                    update_pairs.append((existing[key], i))
            else:
                batch_seen[key] = i
        if update_pairs:
            ex_rows = np.array([p[0] for p in update_pairs], dtype=np.int64)
            in_rows = np.array([p[1] for p in update_pairs], dtype=np.int64)
            names = list(table.column_names)
            k = len(names)
            ex_cols = [table.columns[j].take(ex_rows) for j in range(k)]
            in_cols = [v.take(in_rows) for v in vectors]
            rel = Relation(
                ex_cols + in_cols,
                [Binding(stmt.table, list(names), list(range(k))),
                 Binding("excluded", list(names), list(range(k, 2 * k)))])
            ev = Evaluator(self, rel)
            upd_mask = np.ones(len(ex_rows), dtype=bool)
            if stmt.conflict_where is not None:
                cond = ev.as_bool(ev.evaluate(stmt.conflict_where))
                upd_mask = cond.data.astype(bool) & cond.validity
            if stmt.on_conflict == "replace_all":
                assignments = [(nm, a.ColumnRef(parts=("excluded", nm)))
                               for nm in names if nm.lower() not in target]
            else:
                assignments = stmt.conflict_updates
            for col_name, expr in assignments:
                j = table.column_index(col_name)
                if j is None:
                    raise BinderException(
                        f"Referenced update column {col_name} not found")
                new_vec = ev.evaluate(expr)
                cdef = table.column_defs[j]
                if new_vec.type.id != cdef.type.id:
                    new_vec = cast_vector(new_vec, cdef.type)
                cur = table.columns[j].copy()
                rows = ex_rows[upd_mask]
                cur.data[rows] = new_vec.data[upd_mask]
                cur.validity[rows] = new_vec.validity[upd_mask]
                table.update_column(j, cur)
        if keep.all():
            return vectors
        return [v.filter(keep) for v in vectors]

    def _returning_result(self, table, alias: str,
                          row_vectors: List[Vector],
                          returning: List[a.Expression]) -> QueryResult:
        """DML RETURNING clause (DuckDB): project the affected rows."""
        rel = Relation.from_columns(
            alias, [c.name for c in table.column_defs], row_vectors)
        ev = Evaluator(self, rel)
        out_names: List[str] = []
        out_cols: List[Vector] = []
        for e in returning:
            if isinstance(e, a.Star):
                for b_alias, name, col in self.expand_star(rel, e):
                    out_names.append(name)
                    out_cols.append(col)
            else:
                out_names.append(self.derive_name(e))
                out_cols.append(ev.evaluate(e))
        return QueryResult(out_names, out_cols)

    def execute_update(self, stmt: a.UpdateStatement) -> QueryResult:
        catalog = self.connection.resolve_catalog(None)
        table = catalog.get_table(stmt.table, stmt.schema)
        if getattr(stmt, "from_ref", None) is not None:
            return self._execute_update_from(stmt, table)
        rel = Relation.from_table(table, stmt.table)
        mask = np.ones(rel.row_count, dtype=bool)
        if stmt.where is not None:
            ev = Evaluator(self, rel)
            cond = ev.as_bool(ev.evaluate(stmt.where))
            mask = cond.data.astype(bool) & cond.validity
        ev = Evaluator(self, rel)
        for col_name, expr in stmt.assignments:
            idx = table.column_index(col_name)
            if idx is None:
                raise BinderException(
                    f'Referenced update column {col_name} not found')
            new_vec = ev.evaluate(expr)
            cdef = table.column_defs[idx]
            if new_vec.type.id != cdef.type.id:
                new_vec = cast_vector(new_vec, cdef.type)
            cur = table.columns[idx].copy()
            cur.data[mask] = new_vec.data[mask]
            cur.validity[mask] = new_vec.validity[mask]
            table.update_column(idx, cur)
        self._post_update_constraints(table, np.flatnonzero(mask),
                                      [cn for cn, _ in stmt.assignments])
        self.connection.database.invalidate_graph_caches(table.name)
        if stmt.returning:
            rows = [c.filter(mask) for c in table.columns]
            return self._returning_result(table, stmt.table, rows,
                                          stmt.returning)
        return QueryResult(["Count"],
                           [Vector.from_values([int(mask.sum())], BIGINT)])

    def execute_delete(self, stmt: a.DeleteStatement) -> QueryResult:
        catalog = self.connection.resolve_catalog(None)
        table = catalog.get_table(stmt.table, stmt.schema)
        rel = Relation.from_table(table, stmt.table)
        mask = np.ones(rel.row_count, dtype=bool)
        if stmt.where is not None:
            ev = Evaluator(self, rel)
            cond = ev.as_bool(ev.evaluate(stmt.where))
            mask = cond.data.astype(bool) & cond.validity
        deleted = [c.filter(mask) for c in table.columns] \
            if stmt.returning else None
        self._restrict_fk_delete(table, mask)
        table.delete_rows(mask)
        self.connection.database.invalidate_graph_caches(table.name)
        if stmt.returning:
            return self._returning_result(table, stmt.table, deleted,
                                          stmt.returning)
        return QueryResult(["Count"],
                           [Vector.from_values([int(mask.sum())], BIGINT)])

    def _execute_update_from(self, stmt: a.UpdateStatement,
                             table) -> QueryResult:
        """UPDATE t SET ... FROM src WHERE cond (DuckDB): join target
        against the FROM sources on the WHERE predicate; each matched
        target row takes its FIRST match's assignment values."""
        from ..types import BOOLEAN as _B
        join = a.JoinRef(
            left=a.BaseTableRef(table=stmt.table, schema=stmt.schema),
            right=stmt.from_ref, join_type="INNER",
            condition=stmt.where if stmt.where is not None
            else a.Constant(True, _B))
        rel = self.execute_join(join, None, None)
        slot = rel.resolve((stmt.table, "rowid"))
        if slot is None:
            raise InternalException("update target lost its rowid")
        rows = np.asarray(rel.columns[slot].data, dtype=np.int64)
        _, first_idx = np.unique(rows, return_index=True)
        ev = Evaluator(self, rel)
        tgt_rows = rows[first_idx]
        for col_name, expr in stmt.assignments:
            j = table.column_index(col_name)
            if j is None:
                raise BinderException(
                    f'Referenced update column {col_name} not found')
            new_vec = ev.evaluate(expr)
            cdef = table.column_defs[j]
            if new_vec.type.id != cdef.type.id:
                new_vec = cast_vector(new_vec, cdef.type)
            cur = table.columns[j].copy()
            cur.data[tgt_rows] = new_vec.data[first_idx]
            cur.validity[tgt_rows] = new_vec.validity[first_idx]
            table.update_column(j, cur)
        self._post_update_constraints(
            table, tgt_rows, [cn for cn, _ in stmt.assignments])
        self.connection.database.invalidate_graph_caches(table.name)
        if stmt.returning:
            rel2 = Relation.from_table(table, stmt.table)
            rows_v = [c.take(tgt_rows) for c in
                      rel2.columns[:len(table.columns)]]
            return self._returning_result(table, stmt.table, rows_v,
                                          stmt.returning)
        return QueryResult(["Count"],
                           [Vector.from_values([len(tgt_rows)], BIGINT)])

    def _execute_comment(self, stmt: a.CommentStatement) -> QueryResult:
        """COMMENT ON TABLE/VIEW/COLUMN ... IS 'text': stored on the
        catalog object (surfaced by duckdb_tables().comment)."""
        catalog = self.connection.resolve_catalog(None)
        if stmt.kind == "TABLE":
            t = catalog.get_table(stmt.parts[-1], missing_ok=True)
            if t is None:
                raise CatalogException(
                    f"Table with name {stmt.parts[-1]} does not exist!")
            t.comment = stmt.text
        elif stmt.kind == "COLUMN":
            t = catalog.get_table(stmt.parts[-2], missing_ok=True)
            if t is None:
                raise CatalogException(
                    f"Table with name {stmt.parts[-2]} does not exist!")
            idx = t.column_index(stmt.parts[-1])
            if idx is None:
                raise BinderException(
                    f'Column "{stmt.parts[-1]}" not found')
            t.column_defs[idx].comment = stmt.text
        elif stmt.kind == "VIEW":
            v = catalog.get_view(stmt.parts[-1])
            if v is None:
                raise CatalogException(
                    f"View with name {stmt.parts[-1]} does not exist!")
            # View uses __slots__; comments ride a side table
            self.connection.database.comments[
                ("view", stmt.parts[-1].lower())] = stmt.text
        else:
            self.connection.database.comments[
                (stmt.kind.lower(), ".".join(stmt.parts).lower())] =                 stmt.text
        return QueryResult([], [])

    def _execute_transaction(self, stmt: a.TransactionStatement
                             ) -> QueryResult:
        """BEGIN snapshots the catalogs; ROLLBACK restores them. Every
        mutation path replaces Vector/column-list objects rather than
        writing into them (DataTable.append/update_column/delete_rows and
        the catalog dicts), so a shallow snapshot of the object graph is a
        complete undo image — a TPU-friendly analog of DuckDB's MVCC
        (readers of old refs stay valid)."""
        db = self.connection.database
        if stmt.action == "BEGIN":
            if getattr(self.connection, "_txn", None) is not None:
                raise InvalidInputException(
                    "cannot start a transaction within a transaction")
            snap = {"catalogs": {}, "sequences":
                    {k: dict(v) for k, v in db.sequences.items()},
                    "pgs": dict(db.registered_property_graphs)}
            for cname, cat in self._all_catalogs().items():
                schemas = {}
                for sname, schema in cat.schemas.items():
                    schemas[sname] = {
                        "tables": dict(schema.tables),
                        "views": dict(schema.views),
                        "macros": dict(schema.macros),
                        "data": {key: (list(t.columns), t.version,
                                       list(t.column_defs),
                                       list(t.constraints))
                                 for key, t in schema.tables.items()},
                    }
                snap["catalogs"][cname] = schemas
            self.connection._txn = snap
            return QueryResult([], [])
        txn = getattr(self.connection, "_txn", None)
        if txn is None:
            raise InvalidInputException(
                f"cannot {stmt.action.lower()} - no transaction is active")
        self.connection._txn = None
        if stmt.action == "COMMIT":
            return QueryResult([], [])
        # ROLLBACK: restore schema dicts and per-table column lists
        db.sequences.clear()
        db.sequences.update(txn["sequences"])
        db.registered_property_graphs.clear()
        db.registered_property_graphs.update(txn.get("pgs", {}))
        cats = self._all_catalogs()
        for cname, schemas in txn["catalogs"].items():
            cat = cats.get(cname)
            if cat is None:
                continue
            for sname, simg in schemas.items():
                schema = cat.schemas.get(sname)
                if schema is None:
                    cat.schemas[sname] = schema = type(
                        next(iter(cat.schemas.values())))(sname)
                schema.tables.clear()
                schema.tables.update(simg["tables"])
                schema.views.clear()
                schema.views.update(simg["views"])
                schema.macros.clear()
                schema.macros.update(simg["macros"])
                for key, (cols, ver, cdefs, cons) in simg["data"].items():
                    t = schema.tables.get(key)
                    if t is not None:
                        t.columns = list(cols)
                        t.version = ver + 1
                        t.column_defs = list(cdefs)
                        t.constraints = list(cons)
                        self.connection.database.invalidate_graph_caches(
                            t.name)
        return QueryResult([], [])

    def _all_catalogs(self) -> dict:
        db = self.connection.database
        cats = {}
        main = getattr(db, "catalog", None)
        if main is not None:
            cats[main.name] = main
        for nm, cat in getattr(db, "attached", {}).items():
            cats.setdefault(nm, cat)
        return cats

    def execute_drop(self, stmt: a.DropStatement) -> QueryResult:
        if stmt.kind == "PROPERTY_GRAPH":
            from ..pgq.ddl import execute_drop_property_graph
            return execute_drop_property_graph(self, stmt.info)
        if stmt.kind == "SEQUENCE":
            seqs = self.connection.database.sequences
            if stmt.name.lower() not in seqs and not stmt.if_exists:
                raise CatalogException(
                    f'Sequence with name "{stmt.name}" does not exist!')
            seqs.pop(stmt.name.lower(), None)
            return QueryResult([], [])
        if stmt.kind == "TYPE":
            from ..types import USER_TYPES
            if stmt.name.lower() not in USER_TYPES and not stmt.if_exists:
                raise CatalogException(
                    f'Type with name "{stmt.name}" does not exist!')
            USER_TYPES.pop(stmt.name.lower(), None)
            return QueryResult([], [])
        catalog = self.connection.resolve_catalog(None)
        if stmt.kind == "TABLE":
            catalog.drop_table(stmt.name, stmt.schema or "main",
                               missing_ok=stmt.if_exists)
        elif stmt.kind == "VIEW":
            catalog.drop_view(stmt.name, stmt.schema or "main",
                              missing_ok=stmt.if_exists)
        elif stmt.kind == "SCHEMA":
            catalog.schemas.pop(stmt.name.lower(), None)
        elif stmt.kind == "MACRO":
            catalog.drop_macro(stmt.name, "main", if_exists=stmt.if_exists)
        return QueryResult([], [])

    def execute_alter(self, stmt: a.AlterStatement) -> QueryResult:
        catalog = self.connection.resolve_catalog(None)
        table = catalog.get_table(stmt.table, stmt.schema,
                                  missing_ok=stmt.if_exists)
        if table is None:
            return QueryResult([], [])
        if stmt.action == "ADD_COLUMN":
            table.add_column(ColumnDefinition(
                stmt.column_name, stmt.column_type, default=stmt.default))
        elif stmt.action == "DROP_COLUMN":
            table.drop_column(stmt.column_name)
        elif stmt.action == "RENAME_COLUMN":
            table.rename_column(stmt.column_name, stmt.new_name)
        elif stmt.action == "RENAME_TABLE":
            schema = catalog.get_schema(table.schema)
            del schema.tables[table.name.lower()]
            table.name = stmt.new_name
            schema.tables[stmt.new_name.lower()] = table
        elif stmt.action == "ALTER_TYPE":
            idx = table.column_index(stmt.column_name)
            table.column_defs[idx].type = stmt.column_type
            table.update_column(idx, cast_vector(table.columns[idx],
                                                 stmt.column_type))
        self.connection.database.invalidate_graph_caches(stmt.table)
        return QueryResult([], [])

    # ================================================================= COPY
    def execute_copy(self, stmt: a.CopyStatement) -> QueryResult:
        from ..io import copy as io_copy
        return io_copy.execute_copy(self, stmt)

    # ============================================================== metadata
    def execute_describe(self, stmt: a.DescribeStatement) -> QueryResult:
        if stmt.kind == "PROPERTY_GRAPH":
            from ..pgq.ddl import execute_describe_property_graph
            return execute_describe_property_graph(self, stmt.target)
        if stmt.kind == "TABLES":
            names = sorted(t.name for t in self.catalog.list_tables())
            return QueryResult(["name"],
                               [Vector.from_values(names, VARCHAR)])
        if stmt.kind == "QUERY":
            res = self.execute_select(stmt.target)
            return self._describe_result(res.names, res.types)
        catalog = self.connection.resolve_catalog(None)
        table = catalog.get_table(stmt.target)
        return self._describe_result(table.column_names, table.column_types)

    def _describe_result(self, names, types) -> QueryResult:
        n = len(names)
        return QueryResult(
            ["column_name", "column_type", "null", "key", "default", "extra"],
            [Vector.from_values(list(names), VARCHAR),
             Vector.from_values([str(t) for t in types], VARCHAR),
             Vector.from_values(["YES"] * n, VARCHAR),
             Vector.from_values([None] * n, VARCHAR),
             Vector.from_values([None] * n, VARCHAR),
             Vector.from_values([None] * n, VARCHAR)])

    def execute_summarize(self, stmt: a.SummarizeStatement) -> QueryResult:
        if stmt.kind == "PROPERTY_GRAPH":
            from ..pgq.ddl import execute_summarize_property_graph
            return execute_summarize_property_graph(self, stmt.target)
        if stmt.kind == "QUERY":
            res = self.execute_select(stmt.target)
        else:
            from ..sql.parser import parse_sql
            sel = parse_sql(f'SELECT * FROM "{stmt.target}"')[0]
            res = self.execute_select(sel)
        return self._summarize_result(res)

    def _summarize_result(self, res: QueryResult) -> QueryResult:
        """DuckDB SUMMARIZE column layout (statement/summarize.md): per-column
        min/max/approx_unique/avg/std/q25/q50/q75/count/null_percentage.
        Quantiles here are exact (DuckDB uses approx_quantile)."""
        from ..types import value_to_string
        cnt = res.row_count
        rows = {k: [] for k in ("name", "type", "mn", "mx", "uniq", "avg",
                                "std", "q25", "q50", "q75", "nullpct")}
        for name, col in zip(res.names, res.columns):
            rows["name"].append(name)
            rows["type"].append(str(col.type))
            valid = col.validity
            nvalid = int(valid.sum())
            rows["nullpct"].append(
                round(100.0 * (cnt - nvalid) / cnt, 2) if cnt else None)
            if nvalid == 0:
                for k in ("mn", "mx", "uniq", "avg", "std", "q25", "q50",
                          "q75"):
                    rows[k].append(0 if k == "uniq" else None)
                continue
            vals = [col.value(i) for i in range(cnt) if valid[i]]
            try:
                mn, mx = min(vals), max(vals)
            except TypeError:       # unorderable mix (nested types)
                mn = mx = None
            rows["mn"].append(value_to_string(mn, col.type)
                              if mn is not None else None)
            rows["mx"].append(value_to_string(mx, col.type)
                              if mx is not None else None)
            try:
                rows["uniq"].append(len(set(vals)))
            except TypeError:
                rows["uniq"].append(len(set(map(str, vals))))
            if col.type.is_numeric and col.type.id != TypeId.BOOLEAN:
                arr = col.data[valid].astype(np.float64)
                rows["avg"].append(str(float(arr.mean())))
                rows["std"].append(
                    str(float(arr.std(ddof=1))) if nvalid > 1 else None)
                for k, q in (("q25", 0.25), ("q50", 0.5), ("q75", 0.75)):
                    rows[k].append(str(float(np.quantile(arr, q))))
            else:
                for k in ("avg", "std", "q25", "q50", "q75"):
                    rows[k].append(None)
        from ..types import BIGINT, DOUBLE, VARCHAR
        names = ["column_name", "column_type", "min", "max", "approx_unique",
                 "avg", "std", "q25", "q50", "q75", "count",
                 "null_percentage"]
        ncols = len(res.names)
        return QueryResult(names, [
            Vector.from_values(rows["name"], VARCHAR),
            Vector.from_values(rows["type"], VARCHAR),
            Vector.from_values(rows["mn"], VARCHAR),
            Vector.from_values(rows["mx"], VARCHAR),
            Vector.from_values(rows["uniq"], BIGINT),
            Vector.from_values(rows["avg"], VARCHAR),
            Vector.from_values(rows["std"], VARCHAR),
            Vector.from_values(rows["q25"], VARCHAR),
            Vector.from_values(rows["q50"], VARCHAR),
            Vector.from_values(rows["q75"], VARCHAR),
            Vector.from_values([cnt] * ncols, BIGINT),
            Vector.from_values(rows["nullpct"], DOUBLE)])

    def execute_import_database(self, stmt: a.ImportDatabaseStatement
                                ) -> QueryResult:
        import os
        from ..sql.parser import parse_sql
        base = self.connection.database.resolve_path(stmt.path)
        for fname in ("schema.sql", "load.sql"):
            path = os.path.join(base, fname)
            if not os.path.exists(path):
                continue
            with open(path) as f:
                text = f.read()
            # load.sql paths are relative to the exporting process's cwd,
            # i.e. the same base_path the caller is already using
            for s in parse_sql(text):
                self.execute_statement(s)
        return QueryResult([], [])

    def execute_export_database(self, stmt: a.ExportDatabaseStatement
                                ) -> QueryResult:
        """EXPORT DATABASE 'dir' [(FORMAT CSV|PARQUET)]: write schema.sql
        (reconstructed DDL) + load.sql (COPY ... FROM) + one data file per
        table — round-trips through IMPORT DATABASE (DuckDB layout)."""
        import os
        base = self.connection.database.resolve_path(stmt.path)
        os.makedirs(base, exist_ok=True)
        fmt = str(stmt.options.get("FORMAT", "CSV")).upper()
        ext = "parquet" if fmt == "PARQUET" else "csv"
        db = self.connection.database
        schema_lines: List[str] = []
        load_lines: List[str] = []
        for seq_name, seq in db.sequences.items():
            schema_lines.append(
                f'CREATE SEQUENCE "{seq_name}" START {seq["next"]} '
                f'INCREMENT {seq["inc"]};')
        for schema in db.catalog.schemas.values():
            if schema.name.lower() != "main":
                schema_lines.append(
                    f'CREATE SCHEMA IF NOT EXISTS "{schema.name}";')
            for t in schema.tables.values():
                if t.name.lower() == "__duckpgq_internal":
                    continue          # recreated by PG DDL persistence
                qname = f'"{schema.name}"."{t.name}"' \
                    if schema.name.lower() != "main" else f'"{t.name}"'
                cols = ", ".join(
                    f'"{c.name}" {c.type}' +
                    (" NOT NULL" if c.not_null else "")
                    for c in t.column_defs)
                pk = next((cons[1] for cons in t.constraints
                           if cons and cons[0] == "pk"), None)
                pk_sql = ", PRIMARY KEY (" + ", ".join(
                    f'"{c}"' for c in pk) + ")" if pk else ""
                schema_lines.append(f"CREATE TABLE {qname}({cols}"
                                    f"{pk_sql});")
                fname = f"{schema.name}_{t.name}.{ext}".replace(
                    os.sep, "_")
                fpath = os.path.join(base, fname)
                if fmt == "PARQUET":
                    from ..io.parquet import write_parquet
                    write_parquet(fpath, list(t.column_names),
                                  list(t.columns))
                    load_lines.append(
                        f"COPY {qname} FROM '{fpath}' "
                        f"(FORMAT PARQUET);")
                else:
                    from ..io.csv import write_csv
                    write_csv(fpath, list(t.column_names),
                              list(t.columns))
                    load_lines.append(f"COPY {qname} FROM '{fpath}';")
        with open(os.path.join(base, "schema.sql"), "w") as f:
            f.write("\n".join(schema_lines) + "\n")
        with open(os.path.join(base, "load.sql"), "w") as f:
            f.write("\n".join(load_lines) + "\n")
        return QueryResult([], [])

    def execute_attach(self, stmt: a.AttachStatement) -> QueryResult:
        self.connection.database.attach(stmt.path, stmt.name)
        return QueryResult([], [])

    def execute_explain(self, stmt: a.ExplainStatement) -> QueryResult:
        from .explain import explain_statement
        text = explain_statement(self, stmt.child)
        keys = ["logical_plan"]
        vals = [text]
        if getattr(stmt, "analyze", False):
            # EXPLAIN ANALYZE: run the statement and report wall time + rows
            # (the profiling surface the reference inherits from its host)
            import time as _time
            t0 = _time.time()
            result = self.execute_statement(stmt.child)
            elapsed = _time.time() - t0
            nrows = result.row_count if hasattr(result, "row_count") else 0
            keys.append("analyze")
            vals.append(f"runtime: {elapsed * 1000:.3f} ms\n"
                        f"rows returned: {nrows}")
        return QueryResult(
            ["explain_key", "explain_value"],
            [Vector.from_values(keys, VARCHAR),
             Vector.from_values(vals, VARCHAR)])


def _nested_cmp(a, b) -> int:
    """Total order over nested values (lists element-wise then by length,
    structs/maps by field sequence); NULL sorts AFTER any value, matching
    the host's nested-comparison semantics."""
    if a is None and b is None:
        return 0
    if a is None:
        return 1
    if b is None:
        return -1
    if isinstance(a, dict) or isinstance(b, dict):
        a = list(a.items()) if isinstance(a, dict) else a
        b = list(b.items()) if isinstance(b, dict) else b
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        for x, y in zip(a, b):
            c = _nested_cmp(x, y)
            if c:
                return c
        return (len(a) > len(b)) - (len(a) < len(b))
    try:
        return (a > b) - (a < b)
    except TypeError:
        sa, sb = str(a), str(b)
        return (sa > sb) - (sa < sb)
