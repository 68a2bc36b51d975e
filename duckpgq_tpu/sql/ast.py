"""Parsed SQL AST.

Node inventory sized to the SQL surface the reference test corpus exercises
(reference test/sql/** — SELECT with CTEs/subqueries/joins/aggregates, DDL,
INSERT/UPDATE/DELETE, COPY, EXPLAIN, DESCRIBE/SUMMARIZE, PRAGMA) plus the PGQ
statements (CREATE/DROP PROPERTY GRAPH, GRAPH_TABLE refs — PGQ-specific nodes
live in duckpgq_tpu.pgq.ast and plug in via GraphTableRef / statement refs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

from ..types import LogicalType


# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------

class Expression:
    alias: Optional[str] = None


@dataclass
class Constant(Expression):
    value: Any
    type: Optional[LogicalType] = None
    alias: Optional[str] = None


@dataclass
class Parameter(Expression):
    """Prepared-statement placeholder ($N numbered / ? positional). Bound to
    a Constant at EXECUTE time; evaluating one unbound is a binder error
    (DuckDB prepared-statement semantics)."""
    index: int = 0          # 1-based
    alias: Optional[str] = None


@dataclass
class ColumnRef(Expression):
    # parts like (table, column) or (column,) or (catalog, schema, table, col)
    parts: Tuple[str, ...] = ()
    alias: Optional[str] = None

    @property
    def column_name(self) -> str:
        return self.parts[-1]


@dataclass
class Star(Expression):
    # SELECT *, or a.* ; relation restricts to one binding; exclude list for
    # EXCLUDE(...); replace maps output columns to substitute expressions
    # for REPLACE (expr AS name, ...)
    relation: Optional[str] = None
    exclude: Tuple[str, ...] = ()
    replace: Tuple[Tuple["Expression", str], ...] = ()
    name_regex: Optional[str] = None   # COLUMNS('regex') expansion
    alias: Optional[str] = None


@dataclass
class FunctionCall(Expression):
    name: str
    args: List[Expression] = field(default_factory=list)
    distinct: bool = False
    is_operator: bool = False
    order_by: List["OrderByNode"] = field(default_factory=list)
    # named arguments f(x := 1) / f(x => 1) (reference grammar
    # select.gram:88-91 NamedArgument)
    kwargs: List[Tuple[str, Expression]] = field(default_factory=list)
    alias: Optional[str] = None


@dataclass
class WindowFrame:
    """Explicit frame clause (reference grammar expression.gram
    WindowFrameClause): ROWS/RANGE/GROUPS with BETWEEN bounds.
    Bound types: unbounded_preceding / preceding / current /
    following / unbounded_following; preceding/following carry an
    offset expression."""

    kind: str = "ROWS"            # ROWS / RANGE / GROUPS
    start_type: str = "unbounded_preceding"
    start_expr: Optional[Expression] = None
    end_type: str = "current"
    end_expr: Optional[Expression] = None
    exclude: Optional[str] = None  # None / "current" / "group" / "ties"


@dataclass
class WindowCall(Expression):
    """fn(args) OVER (PARTITION BY ... ORDER BY ... [frame]) — default
    frames when ``frame`` is None (with ORDER BY: RANGE UNBOUNDED
    PRECEDING..CURRENT ROW incl. peers; without: the whole partition)."""

    name: str = ""
    args: List[Expression] = field(default_factory=list)
    partition_by: List[Expression] = field(default_factory=list)
    order_by: List["OrderByNode"] = field(default_factory=list)
    frame: Optional[WindowFrame] = None
    ref: Optional[str] = None   # OVER <name>, resolved from WINDOW clause
    alias: Optional[str] = None
    ignore_nulls: bool = False  # fn(args) IGNORE NULLS OVER (...)


@dataclass
class AggregateCall(Expression):
    name: str
    args: List[Expression] = field(default_factory=list)
    distinct: bool = False
    alias: Optional[str] = None
    # ORDER BY inside the call (list/string_agg/first/last sensitivity)
    order_by: List["OrderByNode"] = field(default_factory=list)
    # FILTER (WHERE ...) clause
    filter: Optional[Expression] = None


@dataclass
class Comparison(Expression):
    op: str  # = <> < <= > >=
    left: Expression = None
    right: Expression = None
    alias: Optional[str] = None


@dataclass
class Conjunction(Expression):
    op: str  # AND / OR
    children: List[Expression] = field(default_factory=list)
    alias: Optional[str] = None


@dataclass
class Not(Expression):
    child: Expression = None
    alias: Optional[str] = None


@dataclass
class IsNull(Expression):
    child: Expression = None
    negated: bool = False
    alias: Optional[str] = None


@dataclass
class Between(Expression):
    expr: Expression = None
    lower: Expression = None
    upper: Expression = None
    negated: bool = False
    alias: Optional[str] = None


@dataclass
class InList(Expression):
    expr: Expression = None
    values: List[Expression] = field(default_factory=list)
    negated: bool = False
    alias: Optional[str] = None


@dataclass
class Cast(Expression):
    child: Expression = None
    target: LogicalType = None
    try_cast: bool = False
    alias: Optional[str] = None


@dataclass
class Case(Expression):
    # list of (when_expr, then_expr); base is for CASE <base> WHEN ... form
    base: Optional[Expression] = None
    whens: List[Tuple[Expression, Expression]] = field(default_factory=list)
    else_expr: Optional[Expression] = None
    alias: Optional[str] = None


@dataclass
class SubqueryExpr(Expression):
    subquery: "SelectStatement" = None
    kind: str = "SCALAR"  # SCALAR / EXISTS / NOT_EXISTS / IN / NOT_IN / ANY / ALL
    child: Optional[Expression] = None  # lhs for IN/ANY
    comparison: Optional[str] = None    # for ANY/ALL
    alias: Optional[str] = None


@dataclass
class StructExtract(Expression):
    child: Expression = None
    field_name: str = ""
    alias: Optional[str] = None


@dataclass
class ListExpr(Expression):
    values: List[Expression] = field(default_factory=list)
    alias: Optional[str] = None


@dataclass
class StructExpr(Expression):
    fields: List[Tuple[str, Expression]] = field(default_factory=list)
    alias: Optional[str] = None


@dataclass
class ArrayIndex(Expression):
    child: Expression = None
    index: Expression = None          # 1-based like DuckDB
    is_slice: bool = False
    slice_stop: Optional[Expression] = None
    slice_step: Optional[Expression] = None
    alias: Optional[str] = None


@dataclass
class Like(Expression):
    left: Expression = None
    pattern: Expression = None
    negated: bool = False
    case_insensitive: bool = False
    glob: bool = False     # GLOB: * / ? / [...] wildcards, case-sensitive
    escape: Optional[Expression] = None   # LIKE ... ESCAPE ch
    alias: Optional[str] = None


@dataclass
class Collate(Expression):
    child: Expression = None
    collation: str = ""
    alias: Optional[str] = None


@dataclass
class Positional(Expression):
    """#N positional reference in GROUP BY / ORDER BY."""
    index: int = 0
    alias: Optional[str] = None


@dataclass
class Lambda(Expression):
    """x -> expr / (a, b) -> expr — valid only as a list-function argument
    (list_transform/list_filter and aliases), like DuckDB."""
    params: Tuple[str, ...] = ()
    body: Expression = None
    alias: Optional[str] = None


# ---------------------------------------------------------------------------
# Table references
# ---------------------------------------------------------------------------

class TableRef:
    alias: Optional[str] = None
    column_aliases: Tuple[str, ...] = ()


@dataclass
class BaseTableRef(TableRef):
    catalog: Optional[str] = None
    schema: Optional[str] = None
    table: str = ""
    alias: Optional[str] = None
    column_aliases: Tuple[str, ...] = ()
    sample: Optional[dict] = None      # t TABLESAMPLE ... (per-table)


@dataclass
class SubqueryRef(TableRef):
    subquery: "SelectStatement" = None
    alias: Optional[str] = None
    column_aliases: Tuple[str, ...] = ()
    lateral: bool = False     # LATERAL (subquery): sees earlier FROM items


@dataclass
class TableFunctionRef(TableRef):
    name: str = ""
    args: List[Expression] = field(default_factory=list)
    kwargs: List[Tuple[str, Expression]] = field(default_factory=list)
    alias: Optional[str] = None
    column_aliases: Tuple[str, ...] = ()


@dataclass
class JoinRef(TableRef):
    left: TableRef = None
    right: TableRef = None
    join_type: str = "INNER"  # INNER / LEFT / RIGHT / FULL / CROSS / SEMI / ANTI
    condition: Optional[Expression] = None
    using: Tuple[str, ...] = ()
    is_natural: bool = False
    alias: Optional[str] = None
    column_aliases: Tuple[str, ...] = ()


@dataclass
class ValuesRef(TableRef):
    rows: List[List[Expression]] = field(default_factory=list)
    alias: Optional[str] = None
    column_aliases: Tuple[str, ...] = ()


@dataclass
class GraphTableRef(TableRef):
    """FROM GRAPH_TABLE (pg MATCH ... COLUMNS(...)) alias — payload is a
    pgq.ast.MatchExpression (kept loosely typed to avoid a cycle)."""
    match_expr: Any = None
    alias: Optional[str] = None
    column_aliases: Tuple[str, ...] = ()


@dataclass
class EmptyTableRef(TableRef):
    """SELECT without FROM."""
    alias: Optional[str] = None
    column_aliases: Tuple[str, ...] = ()


# ---------------------------------------------------------------------------
# Query nodes
# ---------------------------------------------------------------------------

@dataclass
class OrderByNode:
    expr: Expression
    ascending: bool = True
    nulls_first: Optional[bool] = None  # None = type default (DuckDB: NULLS LAST for ASC)
    order_all: bool = False             # ORDER BY ALL (every output column)


@dataclass
class CTE:
    name: str
    query: "SelectStatement" = None
    column_aliases: Tuple[str, ...] = ()
    materialized: Optional[bool] = None
    recursive: bool = False      # WITH RECURSIVE clause marker


class QueryNode:
    pass


@dataclass
class SelectNode(QueryNode):
    select_list: List[Expression] = field(default_factory=list)
    from_table: TableRef = None
    where: Optional[Expression] = None
    groups: List[Expression] = field(default_factory=list)
    group_all: bool = False
    # GROUP BY GROUPING SETS / ROLLUP / CUBE: list of grouping sets, each a
    # list of group expressions (None = plain GROUP BY)
    grouping_sets: Optional[List[List[Expression]]] = None
    having: Optional[Expression] = None
    qualify: Optional[Expression] = None
    distinct: bool = False
    distinct_on: List[Expression] = field(default_factory=list)
    sample: Optional[dict] = None


@dataclass
class SetOpNode(QueryNode):
    op: str = "UNION"         # UNION / UNION_ALL / EXCEPT / INTERSECT
    left: "SelectStatement" = None
    right: "SelectStatement" = None
    by_name: bool = False


# ---------------------------------------------------------------------------
# Statements
# ---------------------------------------------------------------------------

class Statement:
    pass


@dataclass
class SelectStatement(Statement):
    node: QueryNode = None
    ctes: List[CTE] = field(default_factory=list)
    order_by: List[OrderByNode] = field(default_factory=list)
    limit: Optional[Expression] = None
    offset: Optional[Expression] = None
    limit_percent: bool = False        # LIMIT n% (DuckDB percent limit)


@dataclass
class CreateTableStatement(Statement):
    catalog: Optional[str] = None
    schema: Optional[str] = None
    name: str = ""
    columns: List[Tuple[str, LogicalType, bool, Optional[Expression]]] = \
        field(default_factory=list)  # (name, type, not_null, default)
    query: Optional[SelectStatement] = None  # CREATE TABLE AS
    or_replace: bool = False
    if_not_exists: bool = False
    temporary: bool = False
    constraints: list = field(default_factory=list)  # ("pk",cols)/("fk",...)


@dataclass
class CreateViewStatement(Statement):
    schema: Optional[str] = None
    name: str = ""
    query: SelectStatement = None
    column_aliases: Tuple[str, ...] = ()
    or_replace: bool = False


@dataclass
class CreateMacroStatement(Statement):
    """CREATE [OR REPLACE] MACRO name(params...) AS expr | AS TABLE query
    (DuckDB macros; FUNCTION is a synonym for MACRO)."""
    schema: Optional[str] = None
    name: str = ""
    params: List[str] = field(default_factory=list)
    defaults: List[Tuple[str, Expression]] = field(default_factory=list)
    body: Optional[Expression] = None            # scalar macro
    query: Optional[SelectStatement] = None      # table macro
    or_replace: bool = False
    if_not_exists: bool = False


@dataclass
class CreateSchemaStatement(Statement):
    name: str = ""
    if_not_exists: bool = False


@dataclass
class InsertStatement(Statement):
    catalog: Optional[str] = None
    schema: Optional[str] = None
    table: str = ""
    columns: Tuple[str, ...] = ()
    query: SelectStatement = None       # VALUES parsed as SelectStatement over ValuesRef
    returning: List[Expression] = field(default_factory=list)
    by_name: bool = False               # INSERT INTO t BY NAME query
    # ON CONFLICT clause (DuckDB): None / "nothing" / "update"
    on_conflict: Optional[str] = None
    conflict_target: Tuple[str, ...] = ()
    conflict_updates: List[Tuple[str, Expression]] = \
        field(default_factory=list)
    conflict_where: Optional[Expression] = None


@dataclass
class UpdateStatement(Statement):
    table: str = ""
    schema: Optional[str] = None
    assignments: List[Tuple[str, Expression]] = field(default_factory=list)
    where: Optional[Expression] = None
    returning: List[Expression] = field(default_factory=list)
    from_ref: Optional[TableRef] = None   # UPDATE ... SET ... FROM src


@dataclass
class DeleteStatement(Statement):
    table: str = ""
    schema: Optional[str] = None
    where: Optional[Expression] = None
    returning: List[Expression] = field(default_factory=list)


@dataclass
class CreateSequenceStatement(Statement):
    name: str = ""
    start: int = 1
    increment: int = 1
    if_not_exists: bool = False
    or_replace: bool = False


@dataclass
class CreateTypeStatement(Statement):
    """CREATE TYPE name AS ENUM (...) — statements/create_type.gram."""
    name: str = ""
    values: List[str] = field(default_factory=list)
    if_not_exists: bool = False
    or_replace: bool = False


def substitute_refs(node, mapping):
    """Rebuild an AST with single-part ColumnRefs whose (lowercased) name is
    in ``mapping`` replaced by the mapped expression — macro expansion. The
    original tree is not mutated; replacement expressions are deep-copied per
    site so repeated parameter uses stay independent."""
    import copy
    import dataclasses
    from ..types import LogicalType

    def walk(n):
        if isinstance(n, ColumnRef) and len(n.parts) == 1:
            rep = mapping.get(n.parts[0].lower())
            if rep is not None:
                rep = copy.deepcopy(rep)
                if n.alias is not None:
                    rep.alias = n.alias
                return rep
        if isinstance(n, LogicalType):
            return n
        if dataclasses.is_dataclass(n) and not isinstance(n, type):
            changed = False
            kwargs = {}
            for f in dataclasses.fields(n):
                v = getattr(n, f.name)
                nv = walk(v)
                kwargs[f.name] = nv
                changed = changed or nv is not v
            if not changed:
                return n
            out = type(n)(**kwargs)
            return out
        if isinstance(n, list):
            return [walk(x) for x in n]
        if isinstance(n, tuple):
            return tuple(walk(x) for x in n)
        if isinstance(n, dict):
            return {k: walk(v) for k, v in n.items()}
        return n

    return walk(node)


@dataclass
class DropStatement(Statement):
    kind: str = "TABLE"  # TABLE / VIEW / SCHEMA / PROPERTY_GRAPH
    name: str = ""
    schema: Optional[str] = None
    if_exists: bool = False
    cascade: bool = False
    info: Any = None     # DropPropertyGraphInfo for PROPERTY_GRAPH


@dataclass
class AlterStatement(Statement):
    table: str = ""
    schema: Optional[str] = None
    action: str = ""     # ADD_COLUMN / DROP_COLUMN / RENAME_COLUMN / RENAME_TABLE
    column_name: str = ""
    new_name: str = ""
    column_type: Optional[LogicalType] = None
    default: Optional[Expression] = None
    if_exists: bool = False


@dataclass
class CopyStatement(Statement):
    table: Optional[str] = None
    query: Optional[SelectStatement] = None
    filename: str = ""
    is_from: bool = False
    options: dict = field(default_factory=dict)


@dataclass
class ExplainStatement(Statement):
    child: Statement = None
    analyze: bool = False


@dataclass
class PragmaStatement(Statement):
    name: str = ""
    args: List[Expression] = field(default_factory=list)


@dataclass
class SetStatement(Statement):
    name: str = ""
    value: Any = None


@dataclass
class DescribeStatement(Statement):
    # DESCRIBE <table> / DESCRIBE <query> / DESCRIBE PROPERTY GRAPH g
    target: Any = None
    kind: str = "TABLE"   # TABLE / QUERY / PROPERTY_GRAPH


@dataclass
class SummarizeStatement(Statement):
    target: Any = None
    kind: str = "TABLE"   # TABLE / QUERY / PROPERTY_GRAPH


@dataclass
class AttachStatement(Statement):
    path: str = ""
    name: Optional[str] = None
    options: dict = field(default_factory=dict)


@dataclass
class DetachStatement(Statement):
    name: str = ""


@dataclass
class UseStatement(Statement):
    name: str = ""


@dataclass
class ImportDatabaseStatement(Statement):
    path: str = ""


@dataclass
class ExportDatabaseStatement(Statement):
    path: str = ""
    options: dict = field(default_factory=dict)


@dataclass
class CheckpointStatement(Statement):
    pass


@dataclass
class CreatePropertyGraphStatement(Statement):
    info: Any = None     # pgq.ast.CreatePropertyGraphInfo


@dataclass
class TransactionStatement(Statement):
    action: str = "BEGIN"  # BEGIN / COMMIT / ROLLBACK


@dataclass
class PivotStatement(Statement):
    """PIVOT source ON col [IN (...)] [USING aggs] [GROUP BY cols]."""
    source: TableRef = None
    on: Expression = None
    in_values: Optional[List[Expression]] = None
    using: List[Expression] = field(default_factory=list)
    group_by: List[Expression] = field(default_factory=list)
    order_by: List[OrderByNode] = field(default_factory=list)
    limit: Optional[Expression] = None
    offset: Optional[Expression] = None


@dataclass
class UnpivotStatement(Statement):
    """UNPIVOT source ON cols INTO NAME n VALUE v."""
    source: TableRef = None
    on: List[str] = field(default_factory=list)
    name_col: str = ""
    value_col: str = ""
    order_by: List[OrderByNode] = field(default_factory=list)
    limit: Optional[Expression] = None
    offset: Optional[Expression] = None



@dataclass
class CommentStatement(Statement):
    """COMMENT ON <kind> <name> IS 'text' (DuckDB comment DDL)."""
    kind: str = "TABLE"
    parts: Tuple[str, ...] = ()
    text: Optional[str] = None
