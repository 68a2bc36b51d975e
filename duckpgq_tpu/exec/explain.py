"""EXPLAIN rendering: a readable logical-plan dump of the (possibly
PGQ-transpiled) statement, the analog of the reference's reliance on the host
EXPLAIN over rewritten queries (reference test/sql/explain_duckpgq.test)."""

from __future__ import annotations

from ..sql import ast as a


def explain_statement(executor, stmt: a.Statement) -> str:
    lines = []
    _render(executor, stmt, lines, 0)
    return "\n".join(lines)


def _add(lines, depth, text):
    lines.append("  " * depth + text)


def _render(executor, stmt, lines, depth):
    if isinstance(stmt, a.SelectStatement):
        if stmt.ctes:
            _add(lines, depth, f"CTEs: {', '.join(c.name for c in stmt.ctes)}")
        _render_node(executor, stmt.node, lines, depth)
        if stmt.order_by:
            _add(lines, depth, f"ORDER_BY ({len(stmt.order_by)} keys)")
        if stmt.limit is not None:
            _add(lines, depth, "LIMIT")
        return
    if isinstance(stmt, a.InsertStatement):
        _add(lines, depth, f"INSERT INTO {stmt.table}")
        _render(executor, stmt.query, lines, depth + 1)
        return
    _add(lines, depth, type(stmt).__name__.replace("Statement", "").upper())


def _render_node(executor, node, lines, depth):
    if isinstance(node, a.SetOpNode):
        _add(lines, depth, node.op)
        _render(executor, node.left, lines, depth + 1)
        _render(executor, node.right, lines, depth + 1)
        return
    if isinstance(node, a.SelectNode):
        _add(lines, depth, f"PROJECTION ({len(node.select_list)} exprs)")
        if node.groups or _has_agg(node):
            _add(lines, depth + 1, "HASH_GROUP_BY")
        if node.where is not None:
            _add(lines, depth + 1, "FILTER")
        _render_ref(executor, node.from_table, lines, depth + 1)


def _has_agg(node) -> bool:
    from .expression import collect_aggregates
    aggs = []
    for e in node.select_list:
        collect_aggregates(e, aggs)
    return bool(aggs)


def _render_ref(executor, ref, lines, depth):
    if ref is None or isinstance(ref, a.EmptyTableRef):
        _add(lines, depth, "DUMMY_SCAN")
        return
    if isinstance(ref, a.BaseTableRef):
        alias = f" AS {ref.alias}" if ref.alias else ""
        _add(lines, depth, f"SEQ_SCAN {ref.table}{alias}")
        return
    if isinstance(ref, a.JoinRef):
        kind = "CROSS_PRODUCT" if ref.join_type == "CROSS" else \
            f"HASH_JOIN ({ref.join_type})"
        _add(lines, depth, kind)
        _render_ref(executor, ref.left, lines, depth + 1)
        _render_ref(executor, ref.right, lines, depth + 1)
        return
    if isinstance(ref, a.SubqueryRef):
        _add(lines, depth, f"SUBQUERY {ref.alias or ''}")
        _render(executor, ref.subquery, lines, depth + 1)
        return
    if isinstance(ref, a.TableFunctionRef):
        _add(lines, depth, f"TABLE_FUNCTION {ref.name}")
        return
    if isinstance(ref, a.GraphTableRef):
        _add(lines, depth, "GRAPH_TABLE (PGQ MATCH rewrite)")
        try:
            from ..pgq.transpiler import bind_graph_table
            stmt, alias = bind_graph_table(executor, ref)
            _render(executor, stmt, lines, depth + 1)
        except Exception as e:  # surface transpile errors in EXPLAIN output
            _add(lines, depth + 1, f"<error: {e}>")
        return
    if isinstance(ref, a.ValuesRef):
        _add(lines, depth, f"VALUES ({len(ref.rows)} rows)")
        return
    _add(lines, depth, type(ref).__name__)
