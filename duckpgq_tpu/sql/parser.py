"""Recursive-descent SQL + SQL/PGQ parser.

Grammar surface matches what the reference's vendored PEG parser accepts for
the test corpus: full SELECT (CTEs, set ops, joins, subqueries, aggregates),
DDL/DML, COPY/EXPLAIN/PRAGMA/DESCRIBE/SUMMARIZE, plus the PGQ statements from
reference third_party/duckdb_peg_parser/.../grammar/statements/pgq.gram
(CREATE/DROP PROPERTY GRAPH, GRAPH_TABLE refs with MATCH path patterns,
quantifiers, search prefixes, path modes, edge directions).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .. import types as tt
from ..errors import (BinderException, ConversionException,
                      NotImplementedException, ParserException)
from ..pgq import ast as past
from . import ast as a
from .lexer import T, Token, tokenize


# keywords that cannot begin an expression (reserved in the reference's
# grammar; pragma/create_vertex_table tests rely on the parse error)
_RESERVED_EXPR = {
    "SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
    "UNION", "EXCEPT", "INTERSECT", "ON", "USING", "WHEN", "THEN",
    "ELSE", "END", "SYMMETRIC", "ASYMMETRIC",
}

# words that terminate an implicit alias position
_ALIAS_STOP = {
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET", "UNION", "EXCEPT",
    "INTERSECT", "ON", "USING", "JOIN", "INNER", "LEFT", "RIGHT", "FULL",
    "CROSS", "NATURAL", "SEMI", "ANTI", "ASOF", "POSITIONAL", "FROM", "SELECT",
    "QUALIFY", "WINDOW", "AND", "OR", "NOT", "AS", "ASC", "DESC", "NULLS",
    "THEN", "ELSE", "END", "WHEN", "SET", "VALUES", "RETURNING", "WITH",
    "FETCH", "FOR", "INTO", "BETWEEN", "IS", "IN", "LIKE", "ILIKE", "GLOB",
    "SIMILAR", "COLLATE", "BY", "TABLESAMPLE",
}


# ---------------------------------------------------------------------------
# Error-token extraction mirroring the reference PEG tokenizer
# (third_party/duckdb_peg_parser/.../tokenizer/base_tokenizer.cpp:22-60,300-360;
# error format peg_transformer_factory.cpp:116). The reference reports the PEG
# token at the failure offset: special multi-char ops, single-byte ops, or a
# maximal run of other operator characters. Our lexer splits differently (e.g.
# '->' into '-','>'), so "at or near" re-derives the token from the raw SQL.
# ---------------------------------------------------------------------------

_PEG_SPECIAL_OPS = ("->>", "::", ":=", "->", "**", "//")
_PEG_SINGLE_BYTE = set('(){}[],?-;".')


def _peg_is_opchar(ch: str) -> bool:
    return not (ch.isalnum() or ch == "_" or ch.isspace() or ch == "'") and \
        ch not in _PEG_SINGLE_BYTE


def _peg_error_token(sql: str, start: int, fallback: str) -> str:
    """The PEG token containing byte offset ``start`` (punctuation only;
    identifiers/keywords keep our lexer's text)."""
    if start >= len(sql):
        return fallback
    c = sql[start]
    if not (_peg_is_opchar(c) or c in _PEG_SINGLE_BYTE):
        return fallback
    # find the start of the contiguous punctuation cluster
    lo = start
    while lo > 0 and (_peg_is_opchar(sql[lo - 1]) or
                      sql[lo - 1] in _PEG_SINGLE_BYTE):
        lo -= 1
    # PEG-tokenize the cluster; return the token covering `start`
    i = lo
    while i < len(sql):
        for op in _PEG_SPECIAL_OPS:
            if sql.startswith(op, i):
                if i <= start < i + len(op):
                    return op
                i += len(op)
                break
        else:
            ch = sql[i]
            if ch in _PEG_SINGLE_BYTE:
                if i == start:
                    return ch
                i += 1
            elif _peg_is_opchar(ch):
                j = i
                while j < len(sql) and _peg_is_opchar(sql[j]):
                    # a special op embedded in the run starts its own token
                    if j > i and any(sql.startswith(op, j)
                                     for op in _PEG_SPECIAL_OPS):
                        break
                    j += 1
                if i <= start < j:
                    return sql[i:j]
                i = j
            else:
                break
    return fallback


class Parser:
    def __init__(self, sql: str):
        self.sql = sql
        self.tokens = tokenize(sql)
        self.pos = 0
        self._param_counter = 0   # positional ? placeholders (1-based)

    # ------------------------------------------------------------------ utils
    def peek(self, offset: int = 0) -> Token:
        i = min(self.pos + offset, len(self.tokens) - 1)
        return self.tokens[i]

    def next(self) -> Token:
        tok = self.tokens[self.pos]
        if tok.kind != T.EOF:
            self.pos += 1
        return tok

    def _near(self, tok: Token) -> str:
        if tok.kind == T.EOF:
            return "end of input"
        return _peg_error_token(self.sql, tok.start, tok.text)

    def error(self, msg: str):
        near = self._near(self.peek())
        raise ParserException(f'syntax error at or near "{near}": {msg}')

    def accept_kw(self, *kws: str) -> Optional[Token]:
        if self.peek().is_kw(*kws):
            return self.next()
        return None

    def expect_kw(self, *kws: str) -> Token:
        if self.peek().is_kw(*kws):
            return self.next()
        raise ParserException(
            f'syntax error at or near "{self._near(self.peek())}"')

    def accept_op(self, *ops: str) -> Optional[Token]:
        if self.peek().is_op(*ops):
            return self.next()
        return None

    def expect_op(self, *ops: str) -> Token:
        if self.peek().is_op(*ops):
            return self.next()
        raise ParserException(
            f'syntax error at or near "{self._near(self.peek())}" '
            f'(expected {" or ".join(ops)})')

    def at_ident(self) -> bool:
        return self.peek().kind in (T.IDENT, T.QIDENT)

    def expect_ident(self) -> str:
        tok = self.peek()
        if tok.kind in (T.IDENT, T.QIDENT):
            self.next()
            return tok.text
        self.error("expected identifier")

    # -------------------------------------------------------------- statements
    def parse_statements(self) -> List[a.Statement]:
        out = []
        while self.peek().kind != T.EOF:
            if self.accept_op(";"):
                continue
            out.append(self.parse_statement())
            if self.peek().kind != T.EOF:
                self.expect_op(";")
        return out

    def parse_statement(self) -> a.Statement:
        tok = self.peek()
        if tok.kind != T.IDENT:
            if tok.is_op("("):
                return self.parse_select_statement()
            self.error("expected a statement")
        kw = tok.upper
        if kw in ("SELECT", "WITH", "VALUES", "FROM"):
            return self.parse_select_statement()
        if kw == "CREATE":
            return self.parse_create()
        if kw == "INSERT":
            return self.parse_insert()
        if kw == "UPDATE":
            return self.parse_update()
        if kw == "DELETE":
            return self.parse_delete()
        if kw == "DROP":
            return self.parse_drop()
        if kw == "ALTER":
            return self.parse_alter()
        if kw == "COPY":
            return self.parse_copy()
        if kw == "EXPLAIN":
            self.next()
            analyze = bool(self.accept_kw("ANALYZE"))
            return a.ExplainStatement(child=self.parse_statement(), analyze=analyze)
        if kw == "TRUNCATE":
            self.next()
            self.accept_kw("TABLE")
            name = self.expect_ident()
            return a.DeleteStatement(table=name)
        if kw == "PIVOT":
            return self.parse_pivot()
        if kw == "UNPIVOT":
            return self.parse_unpivot()
        if kw == "PRAGMA":
            return self.parse_pragma()
        if kw == "SET":
            return self.parse_set()
        if kw == "COMMENT":
            # COMMENT ON TABLE|COLUMN|VIEW|MACRO|... name IS 'text'
            self.next()
            self.expect_kw("ON")
            kind = self.next().upper
            parts = [self.expect_ident()]
            while self.accept_op("."):
                parts.append(self.expect_ident())
            self.expect_kw("IS")
            tok = self.next()
            text = None if tok.is_kw("NULL") else tok.text
            return a.CommentStatement(kind=kind, parts=tuple(parts),
                                      text=text)
        if kw == "RESET":
            # RESET name / RESET ALL: restore the setting's default
            self.next()
            if self.accept_kw("ALL"):
                return a.SetStatement(name="__reset_all__")
            self.accept_kw("SESSION", "GLOBAL", "LOCAL")
            return a.SetStatement(
                name="__reset__:" + self.expect_ident().lower())
        if kw in ("DESCRIBE", "DESC", "SHOW"):
            return self.parse_describe()
        if kw == "SUMMARIZE":
            return self.parse_summarize()
        if kw == "ATTACH":
            return self.parse_attach()
        if kw == "DETACH":
            self.next()
            self.accept_kw("DATABASE")
            return a.DetachStatement(name=self.expect_ident())
        if kw == "USE":
            self.next()
            return a.UseStatement(name=self.expect_ident())
        if kw == "IMPORT":
            self.next()
            self.expect_kw("DATABASE")
            return a.ImportDatabaseStatement(path=self.next().text)
        if kw == "EXPORT":
            self.next()
            self.expect_kw("DATABASE")
            stmt = a.ExportDatabaseStatement(path=self.next().text)
            if self.accept_op("("):
                while not self.peek().is_op(")"):
                    key = self.expect_ident().upper()
                    if self.peek().is_op(")") or self.peek().is_op(","):
                        stmt.options[key] = True
                    else:
                        stmt.options[key] = self.next().text
                    self.accept_op(",")
                self.expect_op(")")
            return stmt
        if kw in ("BEGIN", "COMMIT", "ROLLBACK", "START", "ABORT"):
            self.next()
            self.accept_kw("TRANSACTION")
            return a.TransactionStatement(
                action="BEGIN" if kw == "START" else
                "ROLLBACK" if kw == "ABORT" else kw)
        if kw == "CHECKPOINT":
            self.next()
            return a.CheckpointStatement()
        if kw in ("FORCE", "INSTALL", "LOAD", "ANALYZE", "CALL",
                  "VACUUM"):
            # compatibility no-ops (e.g. `force install duckpgq` in test prologues)
            while self.peek().kind != T.EOF and not self.peek().is_op(";"):
                self.next()
            return a.SetStatement(name="__noop__", value=None)
        self.error("unsupported statement")

    # ----------------------------------------------------------------- SELECT
    def parse_select_statement(self) -> a.SelectStatement:
        ctes: List[a.CTE] = []
        if self.accept_kw("WITH"):
            recursive = self.accept_kw("RECURSIVE")
            while True:
                name = self.expect_ident()
                col_aliases: Tuple[str, ...] = ()
                if self.accept_op("("):
                    cols = [self.expect_ident()]
                    while self.accept_op(","):
                        cols.append(self.expect_ident())
                    self.expect_op(")")
                    col_aliases = tuple(cols)
                self.expect_kw("AS")
                materialized = None
                if self.accept_kw("MATERIALIZED"):
                    materialized = True
                elif self.accept_kw("NOT"):
                    self.expect_kw("MATERIALIZED")
                    materialized = False
                self.expect_op("(")
                query = self.parse_select_statement()
                self.expect_op(")")
                ctes.append(a.CTE(name=name, query=query,
                                  column_aliases=col_aliases,
                                  materialized=materialized,
                                  recursive=recursive))
                if not self.accept_op(","):
                    break
        stmt = self.parse_set_op_tree()
        stmt.ctes = ctes + stmt.ctes
        # order/limit trailing the whole set-op tree
        self.parse_result_modifiers(stmt)
        return stmt

    def parse_set_op_tree(self) -> a.SelectStatement:
        left = self.parse_query_term()
        while True:
            tok = self.peek()
            if tok.is_kw("UNION"):
                self.next()
                op = "UNION"
                if self.accept_kw("ALL"):
                    op = "UNION_ALL"
                by_name = False
                if self.accept_kw("BY"):
                    self.expect_kw("NAME")
                    by_name = True
                right = self.parse_query_term()
                left = a.SelectStatement(node=a.SetOpNode(
                    op=op, left=left, right=right, by_name=by_name))
            elif tok.is_kw("EXCEPT"):
                self.next()
                all_ = bool(self.accept_kw("ALL"))
                right = self.parse_query_term()
                left = a.SelectStatement(node=a.SetOpNode(
                    op="EXCEPT_ALL" if all_ else "EXCEPT", left=left, right=right))
            elif tok.is_kw("INTERSECT"):
                self.next()
                all_ = bool(self.accept_kw("ALL"))
                right = self.parse_query_term()
                left = a.SelectStatement(node=a.SetOpNode(
                    op="INTERSECT_ALL" if all_ else "INTERSECT",
                    left=left, right=right))
            else:
                return left

    def parse_query_term(self) -> a.SelectStatement:
        if self.accept_op("("):
            inner = self.parse_select_statement()
            self.expect_op(")")
            return inner
        tok = self.peek()
        if tok.is_kw("VALUES"):
            self.next()
            rows = []
            while True:
                self.expect_op("(")
                row = [self.parse_expression()]
                while self.accept_op(","):
                    row.append(self.parse_expression())
                self.expect_op(")")
                rows.append(row)
                if not self.accept_op(","):
                    break
            node = a.SelectNode(select_list=[a.Star()],
                                from_table=a.ValuesRef(rows=rows))
            return a.SelectStatement(node=node)
        node = self.parse_select_node()
        return a.SelectStatement(node=node)

    def parse_select_node(self) -> a.SelectNode:
        node = a.SelectNode()
        if self.accept_kw("FROM"):
            # DuckDB FROM-first syntax: FROM t [SELECT ...]
            node.from_table = self.parse_from_list()
            if self.accept_kw("SELECT"):
                self._parse_distinct(node)
                node.select_list = self.parse_select_list()
            else:
                node.select_list = [a.Star()]
        else:
            self.expect_kw("SELECT")
            self._parse_distinct(node)
            node.select_list = self.parse_select_list()
            if self.accept_kw("FROM"):
                node.from_table = self.parse_from_list()
            else:
                node.from_table = a.EmptyTableRef()
        if self.accept_kw("USING"):
            self.expect_kw("SAMPLE")
            node.sample = self.parse_sample_clause()
        if self.accept_kw("WHERE"):
            node.where = self.parse_expression()
        if self.peek().is_kw("USING") and self.peek(1).is_kw("SAMPLE"):
            self.next(); self.next()
            node.sample = self.parse_sample_clause()
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            if self.accept_kw("ALL"):
                node.group_all = True
            elif self.peek().is_kw("GROUPING") and self.peek(1).is_kw("SETS"):
                self.next()
                self.next()
                self.expect_op("(")
                sets = [self._parse_grouping_set()]
                while self.accept_op(","):
                    sets.append(self._parse_grouping_set())
                self.expect_op(")")
                node.grouping_sets = sets
            elif self.peek().is_kw("ROLLUP") and self.peek(1).is_op("("):
                self.next()
                exprs = self._parse_grouping_set()
                # (e1..en), (e1..en-1), ..., ()
                node.grouping_sets = [exprs[:k]
                                      for k in range(len(exprs), -1, -1)]
            elif self.peek().is_kw("CUBE") and self.peek(1).is_op("("):
                self.next()
                exprs = self._parse_grouping_set()
                sets = []
                for mask in range(1 << len(exprs)):
                    sets.append([e for i, e in enumerate(exprs)
                                 if mask & (1 << i)])
                node.grouping_sets = sorted(
                    sets, key=lambda s: -len(s))
            else:
                node.groups.append(self.parse_expression())
                while self.accept_op(","):
                    node.groups.append(self.parse_expression())
        if self.accept_kw("HAVING"):
            node.having = self.parse_expression()
        windows = {}
        if self.accept_kw("WINDOW"):
            self._parse_window_clause(windows)
        if self.accept_kw("QUALIFY"):
            node.qualify = self.parse_expression()
        if self.accept_kw("WINDOW"):
            self._parse_window_clause(windows)
        # always resolve: an OVER <name> with no (or missing) WINDOW
        # definition must be a binder error, not a silent whole-partition
        # window
        self._resolve_window_refs(node, windows)
        return node

    def _parse_window_clause(self, windows: dict):
        """WINDOW w AS (spec) [, w2 AS (spec)] named-window definitions."""
        while True:
            wname = self.expect_ident().lower()
            self.expect_kw("AS")
            windows[wname] = self._parse_window_spec()
            if not self.accept_op(","):
                break

    def _resolve_window_refs(self, node: a.SelectNode, windows: dict):
        """Fill OVER <name> references from the WINDOW clause (in-place:
        WindowCall nodes are mutable dataclasses)."""
        def walk(e):
            if isinstance(e, a.WindowCall) and e.ref is not None:
                spec = windows.get(e.ref)
                if spec is None:
                    raise BinderException(
                        f'window "{e.ref}" does not exist')
                e.partition_by, e.order_by, e.frame = spec
                e.ref = None
            if not isinstance(e, a.Expression):
                return
            for f in getattr(e, "__dataclass_fields__", {}):
                v = getattr(e, f)
                if isinstance(v, a.Expression):
                    walk(v)
                elif isinstance(v, (list, tuple)):
                    for x in v:
                        if isinstance(x, a.Expression):
                            walk(x)
                        elif isinstance(x, a.OrderByNode) and \
                                x.expr is not None:
                            walk(x.expr)
                        elif isinstance(x, tuple):
                            for y in x:
                                if isinstance(y, a.Expression):
                                    walk(y)
        for e in node.select_list:
            walk(e)
        if node.qualify is not None:
            walk(node.qualify)
        if node.having is not None:
            walk(node.having)

    def _parse_grouping_set(self) -> List[a.Expression]:
        """One grouping set: ( e1, e2, ... ) or () or a bare expression."""
        if self.accept_op("("):
            exprs: List[a.Expression] = []
            if not self.peek().is_op(")"):
                exprs.append(self.parse_expression())
                while self.accept_op(","):
                    exprs.append(self.parse_expression())
            self.expect_op(")")
            return exprs
        return [self.parse_expression()]

    def parse_pivot(self) -> a.PivotStatement:
        """PIVOT <source> ON <col> [IN (v1, ...)] [USING agg(...), ...]
        [GROUP BY cols] — default USING is count(*)."""
        self.expect_kw("PIVOT")
        stmt = a.PivotStatement()
        stmt.source = self.parse_single_table_ref()
        self.expect_kw("ON")
        stmt.on = self.parse_expression()
        if isinstance(stmt.on, a.InList) and not stmt.on.negated:
            # ON col IN (v1, ...) parses as an InList; unpack it into the
            # pivot's explicit value list
            stmt.in_values = list(stmt.on.values)
            stmt.on = stmt.on.expr
        if self.accept_kw("USING"):
            stmt.using = [self.parse_aliased_expression()]
            while self.accept_op(","):
                stmt.using.append(self.parse_aliased_expression())
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            stmt.group_by = [self.parse_expression()]
            while self.accept_op(","):
                stmt.group_by.append(self.parse_expression())
        self.parse_result_modifiers(stmt)     # trailing ORDER BY / LIMIT
        return stmt

    def parse_unpivot(self) -> a.UnpivotStatement:
        """UNPIVOT <source> ON c1, c2, ... INTO NAME n VALUE v."""
        self.expect_kw("UNPIVOT")
        stmt = a.UnpivotStatement()
        stmt.source = self.parse_single_table_ref()
        self.expect_kw("ON")
        stmt.on = [self.expect_ident()]
        while self.accept_op(","):
            stmt.on.append(self.expect_ident())
        self.expect_kw("INTO")
        self.expect_kw("NAME")
        stmt.name_col = self.expect_ident()
        self.expect_kw("VALUE")
        stmt.value_col = self.expect_ident()
        self.parse_result_modifiers(stmt)
        return stmt

    def parse_sample_clause(self):
        """USING SAMPLE <n> [%|PERCENT|ROWS] [(method[, seed])] |
        USING SAMPLE method(n [ROWS|%]) [REPEATABLE (seed)]"""
        spec = {"method": "reservoir", "size": 0, "percent": False,
                "seed": None}
        tok = self.peek()
        if tok.kind == T.NUMBER:
            self.next()
            spec["size"] = float(tok.text)
            if self.accept_op("%") or self.accept_kw("PERCENT"):
                spec["percent"] = True
            else:
                self.accept_kw("ROWS")
            if self.accept_op("("):
                spec["method"] = self.expect_ident().lower()
                if self.accept_op(","):
                    spec["seed"] = int(self.next().text)
                self.expect_op(")")
        else:
            spec["method"] = self.expect_ident().lower()
            if self.accept_op("("):
                spec["size"] = float(self.next().text)
                if self.accept_op("%") or self.accept_kw("PERCENT"):
                    spec["percent"] = True
                else:
                    self.accept_kw("ROWS")
                self.expect_op(")")
            if self.accept_kw("REPEATABLE"):
                self.expect_op("(")
                spec["seed"] = int(self.next().text)
                self.expect_op(")")
        return spec

    def _parse_distinct(self, node: a.SelectNode):
        if self.accept_kw("DISTINCT"):
            node.distinct = True
            if self.accept_kw("ON"):
                self.expect_op("(")
                node.distinct_on.append(self.parse_expression())
                while self.accept_op(","):
                    node.distinct_on.append(self.parse_expression())
                self.expect_op(")")
        else:
            self.accept_kw("ALL")

    def parse_select_list(self) -> List[a.Expression]:
        exprs = [self.parse_aliased_expression()]
        while self.accept_op(","):
            exprs.append(self.parse_aliased_expression())
        return exprs

    def parse_aliased_expression(self) -> a.Expression:
        # COLUMNS('regex') in a select list expands like a filtered star
        if self.peek().is_kw("COLUMNS") and self.peek(1).is_op("(") and \
                self.peek(2).kind == T.STRING and self.peek(3).is_op(")"):
            self.next()
            self.next()
            rx = self.next().text
            self.next()
            return self._parse_star_modifiers(a.Star(name_regex=rx))
        expr = self.parse_expression()
        if self.accept_kw("AS"):
            expr.alias = self.expect_ident()
        elif self.at_ident() and self.peek().upper not in _ALIAS_STOP:
            expr.alias = self.next().text
        return expr

    def parse_result_modifiers(self, stmt: a.SelectStatement):
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            order_all = self.peek().is_kw("ALL") and not (
                self.peek(1).is_op(".") or self.peek(1).is_op("("))
            if order_all:
                self.next()
            while True:
                e = None if order_all else self.parse_expression()
                asc = True
                if self.accept_kw("DESC"):
                    asc = False
                elif self.accept_kw("ASC"):
                    asc = True
                nulls_first = None
                if self.accept_kw("NULLS"):
                    nulls_first = bool(self.accept_kw("FIRST"))
                    if nulls_first is False:
                        self.expect_kw("LAST")
                stmt.order_by.append(a.OrderByNode(
                    expr=e, ascending=asc, nulls_first=nulls_first,
                    order_all=order_all))
                if order_all or not self.accept_op(","):
                    break
        if self.accept_kw("LIMIT"):
            # LIMIT n% (DuckDB percent limit): '%' here is a postfix, not
            # modulo — detect NUMBER '%' followed by a clause boundary
            if self.peek().kind == T.NUMBER and self.peek(1).is_op("%"):
                t2 = self.peek(2)
                if t2.kind == T.EOF or t2.is_op(")", ";") or t2.is_kw(
                        "OFFSET", "ORDER", "UNION", "EXCEPT", "INTERSECT"):
                    stmt.limit = a.Constant(float(self.next().text),
                                            tt.DOUBLE)
                    self.next()              # '%'
                    stmt.limit_percent = True
            if stmt.limit is None:
                if self.accept_kw("ALL"):
                    pass                    # LIMIT ALL = no limit
                else:
                    stmt.limit = self.parse_expression()
        if self.accept_kw("OFFSET"):
            stmt.offset = self.parse_expression()
            self.accept_kw("ROWS", "ROW")
        if self.peek().is_kw("FETCH"):
            # FETCH FIRST|NEXT [n] ROWS|ROW ONLY (SQL standard)
            self.next()
            if not self.accept_kw("FIRST"):
                self.expect_kw("NEXT")
            if not self.peek().is_kw("ROWS", "ROW"):
                stmt.limit = self.parse_expression()
            else:
                stmt.limit = a.Constant(1, tt.INTEGER)
            self.accept_kw("ROWS", "ROW")
            self.accept_kw("ONLY")

    # ------------------------------------------------------------------- FROM
    def parse_from_list(self) -> a.TableRef:
        ref = self.parse_join_tree()
        while self.accept_op(","):
            right = self.parse_join_tree()
            ref = a.JoinRef(left=ref, right=right, join_type="CROSS")
        return ref

    def parse_join_tree(self) -> a.TableRef:
        left = self.parse_single_table_ref()
        while True:
            tok = self.peek()
            natural = False
            if tok.is_kw("NATURAL"):
                natural = True
                self.next()
                tok = self.peek()
            if tok.is_kw("POSITIONAL"):
                self.next()
                self.expect_kw("JOIN")
                right = self.parse_single_table_ref()
                left = a.JoinRef(left=left, right=right,
                                 join_type="POSITIONAL")
                continue
            join_type = None
            if tok.is_kw("ASOF"):
                self.next()
                if self.accept_kw("LEFT"):
                    self.accept_kw("OUTER")
                    join_type = "ASOF_LEFT"
                else:
                    join_type = "ASOF"
                self.expect_kw("JOIN")
            elif tok.is_kw("JOIN"):
                join_type = "INNER"
                self.next()
            elif tok.is_kw("INNER"):
                self.next()
                self.expect_kw("JOIN")
                join_type = "INNER"
            elif tok.is_kw("LEFT"):
                self.next()
                self.accept_kw("OUTER")
                self.expect_kw("JOIN")
                join_type = "LEFT"
            elif tok.is_kw("RIGHT"):
                self.next()
                self.accept_kw("OUTER")
                self.expect_kw("JOIN")
                join_type = "RIGHT"
            elif tok.is_kw("FULL"):
                self.next()
                self.accept_kw("OUTER")
                self.expect_kw("JOIN")
                join_type = "FULL"
            elif tok.is_kw("CROSS"):
                self.next()
                self.expect_kw("JOIN")
                join_type = "CROSS"
            elif tok.is_kw("SEMI"):
                self.next()
                self.expect_kw("JOIN")
                join_type = "SEMI"
            elif tok.is_kw("ANTI"):
                self.next()
                self.expect_kw("JOIN")
                join_type = "ANTI"
            else:
                if natural:
                    self.error("expected JOIN after NATURAL")
                return left
            right = self.parse_single_table_ref()
            join = a.JoinRef(left=left, right=right, join_type=join_type,
                             is_natural=natural)
            if join_type != "CROSS" and not natural:
                if self.accept_kw("ON"):
                    join.condition = self.parse_expression()
                elif self.accept_kw("USING"):
                    self.expect_op("(")
                    cols = [self.expect_ident()]
                    while self.accept_op(","):
                        cols.append(self.expect_ident())
                    self.expect_op(")")
                    join.using = tuple(cols)
            left = join

    def parse_single_table_ref(self) -> a.TableRef:
        tok = self.peek()
        if tok.is_kw("LATERAL") and self.peek(1).is_op("("):
            self.next()
            self.expect_op("(")
            sub = self.parse_select_statement()
            self.expect_op(")")
            ref = a.SubqueryRef(subquery=sub, lateral=True)
            self._parse_table_alias(ref)
            return ref
        if tok.kind == T.STRING:
            # FROM 'file.parquet' / 'file.csv'
            self.next()
            fname = tok.text
            lower = fname.lower()
            fn = "read_parquet" if lower.endswith(".parquet") else "read_csv"
            ref = a.TableFunctionRef(name=fn, args=[
                a.Constant(fname, tt.VARCHAR)])
            self._parse_table_alias(ref)
            return ref
        if tok.is_op("("):
            self.next()
            # subquery or parenthesized join
            if self.peek().is_kw("SELECT", "WITH", "VALUES", "FROM"):
                sub = self.parse_select_statement()
                self.expect_op(")")
                ref = a.SubqueryRef(subquery=sub)
                self._parse_table_alias(ref)
                return ref
            if self.peek().is_kw("DESCRIBE", "SUMMARIZE", "SHOW",
                                 "PIVOT", "UNPIVOT"):
                # FROM (DESCRIBE t) / (SUMMARIZE t) / (SHOW TABLES) /
                # (PIVOT ...) — statement-as-subquery (DuckDB)
                sub = self.parse_statement()
                self.expect_op(")")
                ref = a.SubqueryRef(subquery=sub)
                self._parse_table_alias(ref)
                return ref
            if self.peek().is_op("("):
                # could be a parenthesized set-op tree: ((SELECT..) UNION ..)
                save = self.pos
                try:
                    sub = self.parse_select_statement()
                    self.expect_op(")")
                    ref = a.SubqueryRef(subquery=sub)
                    self._parse_table_alias(ref)
                    return ref
                except ParserException:
                    self.pos = save
            inner = self.parse_from_list()
            self.expect_op(")")
            self._parse_table_alias(inner)
            return inner
        if tok.is_kw("VALUES"):
            stmt = self.parse_query_term()
            ref = a.SubqueryRef(subquery=stmt)
            self._parse_table_alias(ref)
            return ref
        # GRAPH_TABLE / GRAPH TABLE
        if tok.is_kw("GRAPH_TABLE") or (
                tok.is_kw("GRAPH") and self.peek(1).is_kw("TABLE")):
            if tok.is_kw("GRAPH"):
                self.next()
            self.next()
            self.expect_op("(")
            match_expr = self.parse_graph_table_body()
            self.expect_op(")")
            ref = a.GraphTableRef(match_expr=match_expr)
            self._parse_table_alias(ref)
            if ref.alias:
                match_expr.alias = ref.alias
            return ref
        # base table or table function
        if not self.at_ident():
            self.error("expected table reference")
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        if self.peek().is_op("("):
            # table function
            self.next()
            args: List[a.Expression] = []
            kwargs: List[tuple] = []
            if not self.peek().is_op(")"):
                while True:
                    kw = self._try_named_arg()
                    if kw is not None:
                        kwargs.append(kw)
                    else:
                        args.append(self.parse_expression())
                    if not self.accept_op(","):
                        break
            self.expect_op(")")
            ref = a.TableFunctionRef(name=parts[-1].lower(), args=args,
                                     kwargs=kwargs)
            self._parse_table_alias(ref)
            return ref
        ref = a.BaseTableRef(table=parts[-1])
        if len(parts) == 2:
            ref.schema = parts[0]
        elif len(parts) == 3:
            ref.catalog, ref.schema = parts[0], parts[1]
        elif len(parts) > 3:
            self.error("too many dots in table name")
        self._parse_table_alias(ref)
        if self.accept_kw("TABLESAMPLE"):
            ref.sample = self.parse_sample_clause()
        return ref

    def _parse_table_alias(self, ref: a.TableRef):
        alias = None
        if self.accept_kw("AS"):
            alias = self.expect_ident()
        elif self.at_ident() and self.peek().upper not in _ALIAS_STOP:
            alias = self.next().text
        if alias:
            ref.alias = alias
            if self.accept_op("("):
                cols = [self.expect_ident()]
                while self.accept_op(","):
                    cols.append(self.expect_ident())
                self.expect_op(")")
                ref.column_aliases = tuple(cols)

    # ------------------------------------------------------------ expressions
    def parse_expression(self) -> a.Expression:
        return self.parse_or()

    def parse_or(self) -> a.Expression:
        left = self.parse_and()
        if not self.peek().is_kw("OR"):
            return left
        children = [left]
        while self.accept_kw("OR"):
            children.append(self.parse_and())
        return a.Conjunction(op="OR", children=children)

    def parse_and(self) -> a.Expression:
        left = self.parse_not()
        if not self.peek().is_kw("AND"):
            return left
        children = [left]
        while self.accept_kw("AND"):
            children.append(self.parse_not())
        return a.Conjunction(op="AND", children=children)

    def parse_not(self) -> a.Expression:
        if self.accept_kw("NOT"):
            if self.peek().is_kw("EXISTS"):
                self.next()
                self.expect_op("(")
                sub = self.parse_select_statement()
                self.expect_op(")")
                return a.SubqueryExpr(subquery=sub, kind="NOT_EXISTS")
            return a.Not(child=self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> a.Expression:
        left = self.parse_bitor()
        while True:
            tok = self.peek()
            if tok.is_op("=", "==", "<>", "!=", "<", "<=", ">", ">="):
                op = self.next().text
                if op == "==":
                    op = "="
                if op == "!=":
                    op = "<>"
                # ANY/ALL subquery comparison
                if self.peek().is_kw("ANY", "SOME", "ALL") and \
                        self.peek(1).is_op("("):
                    kind = "ANY" if self.next().upper in ("ANY", "SOME") else "ALL"
                    self.expect_op("(")
                    sub = self.parse_select_statement()
                    self.expect_op(")")
                    left = a.SubqueryExpr(subquery=sub, kind=kind, child=left,
                                          comparison=op)
                    continue
                right = self.parse_bitor()
                left = a.Comparison(op=op, left=left, right=right)
                continue
            if tok.is_op("~~", "!~~", "~~*", "!~~*"):
                # Postgres-style LIKE operators (DuckDB supports them too)
                op = self.next().text
                pattern = self.parse_bitor()
                left = a.Like(left=left, pattern=pattern,
                              negated=op.startswith("!"),
                              case_insensitive=op.endswith("*"))
                continue
            if tok.is_op("~", "!~", "~*", "!~*"):
                # regex match operators: ~ / !~ (case-sensitive), ~* / !~*
                op = self.next().text
                pattern = self.parse_bitor()
                fnargs = [left, pattern]
                if op.endswith("*"):
                    fnargs.append(a.Constant("i", tt.VARCHAR))
                fn = a.FunctionCall(name="regexp_matches", args=fnargs)
                left = a.Not(child=fn) if op.startswith("!") else fn
                continue
            if tok.is_op("^@"):
                self.next()
                right = self.parse_bitor()
                left = a.FunctionCall(name="starts_with", args=[left, right])
                continue
            if tok.is_kw("IS"):
                self.next()
                negated = bool(self.accept_kw("NOT"))
                if self.accept_kw("NULL"):
                    left = a.IsNull(child=left, negated=negated)
                elif self.accept_kw("DISTINCT"):
                    self.expect_kw("FROM")
                    right = self.parse_bitor()
                    cmp = a.FunctionCall(name="is_distinct_from",
                                         args=[left, right])
                    left = a.Not(child=cmp) if negated else cmp
                elif self.accept_kw("TRUE"):
                    cmp = a.Comparison(op="IS_TRUE", left=left,
                                       right=a.Constant(True, tt.BOOLEAN))
                    left = a.Not(child=cmp) if negated else cmp
                elif self.accept_kw("FALSE"):
                    cmp = a.Comparison(op="IS_FALSE", left=left,
                                       right=a.Constant(False, tt.BOOLEAN))
                    left = a.Not(child=cmp) if negated else cmp
                else:
                    self.error("expected NULL after IS")
                continue
            negated = False
            if tok.is_kw("NOT"):
                nxt = self.peek(1)
                if nxt.is_kw("BETWEEN", "IN", "LIKE", "ILIKE", "GLOB",
                             "SIMILAR"):
                    self.next()
                    negated = True
                    tok = self.peek()
                else:
                    return left
            if tok.is_kw("BETWEEN"):
                self.next()
                symmetric = bool(self.accept_kw("SYMMETRIC"))
                self.accept_kw("ASYMMETRIC")
                lower = self.parse_bitor()
                self.expect_kw("AND")
                upper = self.parse_bitor()
                if symmetric:
                    # x BETWEEN SYMMETRIC a AND b == between(a,b) OR
                    # between(b,a) (bound order-insensitive)
                    both = a.Conjunction(op="OR", children=[
                        a.Between(expr=left, lower=lower, upper=upper),
                        a.Between(expr=left, lower=upper, upper=lower)])
                    left = a.Not(child=both) if negated else both
                else:
                    left = a.Between(expr=left, lower=lower, upper=upper,
                                     negated=negated)
                continue
            if tok.is_kw("IN"):
                self.next()
                self.expect_op("(")
                if self.peek().is_kw("SELECT", "WITH", "VALUES", "FROM"):
                    sub = self.parse_select_statement()
                    self.expect_op(")")
                    left = a.SubqueryExpr(
                        subquery=sub, kind="NOT_IN" if negated else "IN",
                        child=left)
                else:
                    vals = [self.parse_expression()]
                    while self.accept_op(","):
                        vals.append(self.parse_expression())
                    self.expect_op(")")
                    left = a.InList(expr=left, values=vals, negated=negated)
                continue
            if tok.is_kw("LIKE", "ILIKE", "GLOB"):
                kw = self.next().upper
                pattern = self.parse_bitor()
                esc = None
                if self.accept_kw("ESCAPE"):
                    esc = self.parse_bitor()
                left = a.Like(left=left, pattern=pattern, negated=negated,
                              case_insensitive=(kw == "ILIKE"),
                              glob=(kw == "GLOB"), escape=esc)
                continue
            if tok.is_kw("SIMILAR"):
                self.next()
                self.expect_kw("TO")
                pattern = self.parse_bitor()
                fn = a.FunctionCall(name="regexp_full_match",
                                    args=[left, pattern])
                left = a.Not(child=fn) if negated else fn
                continue
            return left

    def parse_bitor(self) -> a.Expression:
        # Postgres/DuckDB "any other operator" level: |, &, <<, >>, || share
        # ONE left-associative tier between comparison and additive
        # (reference PEG grammar gives them no relative precedence), so
        # `1 | 4 & 2` = (1|4)&2 = 0 and `1 | 2 << 3` = (1|2)<<3 = 24.
        left = self.parse_additive()
        while True:
            tok = self.peek()
            if tok.is_op("|", "&", "<<", ">>", "||"):
                op = self.next().text
                left = a.FunctionCall(name=op,
                                      args=[left, self.parse_additive()],
                                      is_operator=True)
            elif tok.is_op("-") and self.peek(1).is_op(">", ">>") and \
                    self.peek(1).start == tok.end:
                # JSON -> / ->> operators (the lexer keeps '-' separate
                # for PGQ edge patterns, and '->>' lexes as '-' + '>>';
                # adjacency disambiguates from subtraction)
                self.next()
                gt = self.next()
                name = "json_extract_string" if gt.text == ">>" \
                    else "json_extract"
                left = a.FunctionCall(name=name,
                                      args=[left, self.parse_additive()])
            else:
                return left

    def parse_additive(self) -> a.Expression:
        left = self.parse_multiplicative()
        while True:
            tok = self.peek()
            if tok.is_op("-") and self.peek(1).is_op(">", ">>") and \
                    self.peek(1).start == tok.end:
                return left      # JSON '->'/'->>' belong to the op level
            if tok.is_op("+", "-"):
                op = self.next().text
                right = self.parse_multiplicative()
                left = a.FunctionCall(name=op, args=[left, right],
                                      is_operator=True)
            else:
                return left

    def parse_multiplicative(self) -> a.Expression:
        left = self.parse_unary()
        while True:
            tok = self.peek()
            if tok.is_op("*", "/", "%", "//"):
                op = self.next().text
                right = self.parse_unary()
                left = a.FunctionCall(name=op, args=[left, right],
                                      is_operator=True)
            elif tok.is_op("^", "**"):
                self.next()
                right = self.parse_unary()
                left = a.FunctionCall(name="power", args=[left, right])
            else:
                return left

    def parse_unary(self, allow_at_tz: bool = True) -> a.Expression:
        if self.accept_op("-"):
            child = self.parse_unary()
            if isinstance(child, a.Constant) and child.type is not None and \
                    child.type.is_numeric:
                child.value = -child.value
                return child
            return a.FunctionCall(name="-", args=[child], is_operator=True)
        if self.accept_op("+"):
            return self.parse_unary()
        if self.accept_op("~"):
            return a.FunctionCall(name="~", args=[self.parse_unary()],
                                  is_operator=True)
        if self.accept_op("@"):
            # Postgres/DuckDB @ operator: absolute value
            return a.FunctionCall(name="abs", args=[self.parse_unary()])
        return self.parse_postfix(allow_at_tz)

    def parse_postfix(self, allow_at_tz: bool = True) -> a.Expression:
        expr = self.parse_primary()
        while True:
            tok = self.peek()
            if tok.is_op("::"):
                self.next()
                target = self.parse_type()
                expr = a.Cast(child=expr, target=target)
            elif tok.is_op("!") and not self.peek(1).is_op("=") and \
                    not self.peek(1).is_op("~"):
                # postfix factorial 5! (DuckDB); '!=' and '!~' are infix
                self.next()
                expr = a.FunctionCall(name="factorial", args=[expr])
            elif tok.is_op("."):
                self.next()
                # struct field extract or qualified function call chain
                name = self.expect_ident()
                if self.peek().is_op("("):
                    # method-call sugar x.f(args) -> f(x, args)
                    self.next()
                    args = [expr]
                    if not self.peek().is_op(")"):
                        args.append(self.parse_expression())
                        while self.accept_op(","):
                            args.append(self.parse_expression())
                    self.expect_op(")")
                    expr = a.FunctionCall(name=name.lower(), args=args)
                elif isinstance(expr, a.ColumnRef):
                    expr = a.ColumnRef(parts=expr.parts + (name,))
                elif self.peek().is_op("*") and isinstance(expr, a.ColumnRef):
                    pass  # handled in primary
                else:
                    expr = a.StructExtract(child=expr, field_name=name)
            elif tok.is_op("["):
                self.next()
                if self.accept_op(":"):
                    stop = None if self.peek().is_op("]") else self.parse_expression()
                    self.expect_op("]")
                    expr = a.ArrayIndex(child=expr, index=None, is_slice=True,
                                        slice_stop=stop)
                else:
                    idx = self.parse_expression()
                    if self.accept_op(":"):
                        if self.peek().is_op("-") and \
                                (self.peek(1).is_op(":") or
                                 self.peek(1).is_op("]")):
                            self.next()
                            stop = a.Constant(-1, tt.INTEGER)
                        elif self.peek().is_op("]") or self.peek().is_op(":"):
                            stop = None
                        else:
                            stop = self.parse_expression()
                        if self.accept_op(":"):
                            step = self.parse_expression()
                        else:
                            step = None
                        self.expect_op("]")
                        expr = a.ArrayIndex(child=expr, index=idx,
                                            is_slice=True, slice_stop=stop,
                                            slice_step=step)
                    else:
                        self.expect_op("]")
                        expr = a.ArrayIndex(child=expr, index=idx)
            elif tok.is_kw("COLLATE"):
                self.next()
                expr = a.Collate(child=expr, collation=self.expect_ident())
            elif allow_at_tz and tok.is_kw("AT") and \
                    self.peek(1).is_kw("TIME") and self.peek(2).is_kw("ZONE"):
                # expr AT TIME ZONE tz  ==  timezone(tz, expr)
                # (reference grammar: expression.gram:262-263 makes the tail
                # repeatable/left-associative — the tz operand itself must
                # NOT consume a following AT TIME ZONE tail, so it is
                # parsed with allow_at_tz=False and chaining happens here)
                self.next(); self.next(); self.next()
                tz = self.parse_unary(allow_at_tz=False)
                expr = a.FunctionCall(name="timezone", args=[tz, expr])
            else:
                return expr

    _AGGREGATES = {
        "count", "sum", "avg", "min", "max", "first", "last", "any_value",
        "string_agg", "group_concat", "list", "array_agg", "bool_and",
        "bool_or", "approx_quantile", "quantile", "quantile_cont",
        "quantile_disc", "median", "stddev", "stddev_samp", "stddev_pop",
        "var_samp", "var_pop", "variance", "arg_min", "arg_max", "bit_and",
        "bit_or", "bit_xor", "product", "count_star", "favg", "fsum",
        "mode", "approx_count_distinct", "arbitrary", "skewness",
        "kurtosis", "corr", "covar_pop", "covar_samp", "regr_slope",
        "regr_intercept", "entropy", "argmin", "argmax", "min_by", "max_by",
        "histogram", "bitstring_agg", "mad",
    }

    def parse_primary(self) -> a.Expression:
        tok = self.peek()
        if tok.is_kw("ARRAY") and self.peek(1).is_op("["):
            self.next()                  # ARRAY[...] == [...] (DuckDB)
            tok = self.peek()
        if tok.is_op("$") and self.peek(1).kind == T.NUMBER and \
                "." not in self.peek(1).text:
            # $N prepared-statement placeholder
            self.next()
            return a.Parameter(index=int(self.next().text))
        if tok.is_op("?"):
            self.next()
            self._param_counter += 1
            return a.Parameter(index=self._param_counter)
        if tok.kind == T.NUMBER:
            self.next()
            text = tok.text
            if "e" in text or "E" in text:
                return a.Constant(float(text), tt.DOUBLE)
            if "." in text:
                # decimal literals are DECIMAL, not DOUBLE (DuckDB
                # Transformer::TransformValue): width = digit count,
                # scale = digits after the point; value stored as the
                # scaled integer. Too wide for DECIMAL -> DOUBLE.
                digits = text.replace(".", "")
                scale = len(text.split(".", 1)[1])
                width = len(digits)
                if width <= 38:
                    return a.Constant(int(digits or "0"),
                                      tt.DECIMAL(max(width, 1), scale))
                return a.Constant(float(text), tt.DOUBLE)
            v = int(text)
            if -2147483648 <= v <= 2147483647:
                return a.Constant(v, tt.INTEGER)
            if -(1 << 63) <= v < (1 << 63):
                return a.Constant(v, tt.BIGINT)
            if -(1 << 127) < v < (1 << 127):
                # HUGEINT literal (host DuckDB: beyond-BIGINT integer
                # literals become HUGEINT)
                return a.Constant(v, tt.HUGEINT)
            # beyond-HUGEINT integer literals become DOUBLE (the host
            # transformer's last resort; -(hugeint min) lands here too
            # because the parser sees the positive magnitude first)
            return a.Constant(float(text), tt.DOUBLE)
        if tok.kind == T.STRING:
            self.next()
            return a.Constant(tok.text, tt.VARCHAR)
        if tok.is_op("("):
            self.next()
            if self.peek().is_kw("SELECT", "WITH", "VALUES", "FROM"):
                sub = self.parse_select_statement()
                self.expect_op(")")
                return a.SubqueryExpr(subquery=sub, kind="SCALAR")
            expr = self.parse_expression()
            if self.peek().is_op(","):
                # row expression -> struct with auto fields (rare); treat as list
                vals = [expr]
                while self.accept_op(","):
                    vals.append(self.parse_expression())
                self.expect_op(")")
                return a.FunctionCall(name="row", args=vals)
            self.expect_op(")")
            return expr
        if tok.is_op("["):
            self.next()
            vals: List[a.Expression] = []
            if not self.peek().is_op("]"):
                vals.append(self.parse_expression())
                if self.accept_kw("FOR"):
                    # list comprehension [expr FOR x IN lst [IF cond]]
                    # desugars to list_transform(list_filter(...), x -> e)
                    param = self.expect_ident()
                    self.expect_kw("IN")
                    src = self.parse_expression()
                    if self.accept_kw("IF"):
                        cond = self.parse_expression()
                        src = a.FunctionCall(
                            name="list_filter",
                            args=[src, a.Lambda(params=(param,), body=cond)])
                    self.expect_op("]")
                    return a.FunctionCall(
                        name="list_transform",
                        args=[src, a.Lambda(params=(param,), body=vals[0])])
                while self.accept_op(","):
                    vals.append(self.parse_expression())
            self.expect_op("]")
            return a.ListExpr(values=vals)
        if tok.is_op("{"):
            self.next()
            fields: List[Tuple[str, a.Expression]] = []
            if not self.peek().is_op("}"):
                while True:
                    key = self.next()
                    if key.kind not in (T.STRING, T.IDENT, T.QIDENT):
                        self.error("expected struct key")
                    self.expect_op(":")
                    fields.append((key.text, self.parse_expression()))
                    if not self.accept_op(","):
                        break
            self.expect_op("}")
            return a.StructExpr(fields=fields)
        if tok.is_op("*"):
            self.next()
            return self._parse_star_modifiers(a.Star())
        if tok.is_op("#"):
            self.next()
            num = self.next()
            return a.Positional(index=int(num.text))
        if tok.kind not in (T.IDENT, T.QIDENT):
            self.error("expected expression")

        kw = tok.upper
        if tok.kind == T.IDENT:
            if kw == "NULL":
                self.next()
                return a.Constant(None, tt.SQLNULL)
            if kw == "TRUE":
                self.next()
                return a.Constant(True, tt.BOOLEAN)
            if kw == "FALSE":
                self.next()
                return a.Constant(False, tt.BOOLEAN)
            if kw == "CASE":
                return self.parse_case()
            if kw in ("CAST", "TRY_CAST"):
                self.next()
                self.expect_op("(")
                child = self.parse_expression()
                self.expect_kw("AS")
                target = self.parse_type()
                self.expect_op(")")
                return a.Cast(child=child, target=target,
                              try_cast=(kw == "TRY_CAST"))
            if kw == "EXISTS" and self.peek(1).is_op("("):
                self.next()
                self.expect_op("(")
                sub = self.parse_select_statement()
                self.expect_op(")")
                return a.SubqueryExpr(subquery=sub, kind="EXISTS")
            if kw == "NOT":
                self.next()
                return a.Not(child=self.parse_not())
            if kw in ("DATE", "TIMESTAMP", "TIME", "INTERVAL",
                      "TIMESTAMP_MS", "TIMESTAMP_S", "TIMESTAMP_NS",
                      "TIMESTAMPTZ") and \
                    self.peek(1).kind == T.STRING:
                self.next()
                lit = self.next().text
                if kw == "INTERVAL" and self.peek().kind == T.IDENT and \
                        self.peek().upper not in _ALIAS_STOP:
                    # INTERVAL '90' SECOND: quoted quantity + unit ident
                    unit = self.expect_ident()
                    try:
                        qty = float(lit)
                    except ValueError:
                        self.error(f"invalid interval quantity '{lit}'")
                    return a.Constant(tt.interval_value(qty, unit),
                                      tt.INTERVAL)
                typ = tt.type_from_name(kw)
                return a.Cast(child=a.Constant(lit, tt.VARCHAR), target=typ)
            if kw == "INTERVAL" and (
                    self.peek(1).kind == T.NUMBER or
                    (self.peek(1).is_op("-") and
                     self.peek(2).kind == T.NUMBER)):
                self.next()
                sign = -1.0 if self.accept_op("-") else 1.0
                qty = sign * float(self.next().text)
                unit = self.expect_ident()
                return a.Constant(tt.interval_value(qty, unit),
                                  tt.INTERVAL)
            if kw == "DISTINCT" and self.peek(1).is_kw("FROM"):
                self.error("unexpected DISTINCT")

        if tok.kind == T.IDENT and tok.upper in _RESERVED_EXPR:
            self.error("reserved keyword")
        # identifier chain: column ref, a.*, or function call
        parts = [self.next().text]
        while self.peek().is_op(".") and not self.peek(1).is_op("*"):
            save = self.pos
            self.next()
            if self.peek().kind in (T.IDENT, T.QIDENT):
                nxt = self.next()
                if self.peek().is_op("("):
                    # qualified function name: use last part
                    self.pos -= 0
                    parts.append(nxt.text)
                    break
                parts.append(nxt.text)
            else:
                self.pos = save
                break
        if self.peek().is_op(".") and self.peek(1).is_op("*"):
            self.next()
            self.next()
            return self._parse_star_modifiers(a.Star(relation=parts[-1]))
        if self.peek().is_op("("):
            return self.parse_function_call(parts[-1])
        if len(parts) == 1 and parts[0].lower() in (
                "current_date", "current_timestamp"):
            # DuckDB nullary keyword functions usable without parens
            return a.FunctionCall(name=parts[0].lower(), args=[])
        return a.ColumnRef(parts=tuple(parts))

    def _parse_star_modifiers(self, star: a.Star) -> a.Star:
        while True:
            if self.accept_kw("EXCLUDE"):
                self.expect_op("(")
                cols = [self.expect_ident()]
                while self.accept_op(","):
                    cols.append(self.expect_ident())
                self.expect_op(")")
                star.exclude = tuple(cols)
            elif self.accept_kw("REPLACE"):
                self.expect_op("(")
                repls = []
                while True:
                    e = self.parse_expression()
                    self.expect_kw("AS")
                    repls.append((e, self.expect_ident()))
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
                star.replace = tuple(repls)
            else:
                return star

    def _arrow_at(self, i: int) -> bool:
        """Adjacent '-' '>' at lookahead offset i (the lexer never fuses
        '->'; adjacency by byte offset distinguishes it from `x < -1`)."""
        t1, t2 = self.peek(i), self.peek(i + 1)
        return t1.is_op("-") and t2.is_op(">") and t1.end == t2.start

    def _parse_lambda_or_expression(self) -> a.Expression:
        """Function-argument position: lambda `x -> expr` or
        `(a, b) -> expr` (DuckDB grammar), else a plain expression."""
        if self.peek().kind == T.IDENT and self._arrow_at(1):
            param = self.expect_ident()
            self.next()
            self.next()
            return a.Lambda(params=(param,), body=self.parse_expression())
        if self.peek().is_op("("):
            i = 1
            params = []
            while self.peek(i).kind == T.IDENT:
                params.append(self.peek(i).text)
                i += 1
                if self.peek(i).is_op(","):
                    i += 1
                    continue
                break
            if params and self.peek(i).is_op(")") and self._arrow_at(i + 1):
                self.next()                       # (
                for k, _ in enumerate(params):
                    self.expect_ident()
                    if k < len(params) - 1:
                        self.expect_op(",")
                self.expect_op(")")
                self.next()
                self.next()
                return a.Lambda(params=tuple(params),
                                body=self.parse_expression())
        return self.parse_expression()

    def _try_named_arg(self):
        """``ident := expr`` / ``ident => expr`` named argument (reference
        grammar select.gram:88-91); returns (name, expr) or None. The lexer
        splits ``:=``/``=>`` into two single-char ops."""
        tok = self.peek()
        if tok.kind != T.IDENT:
            return None
        if self.peek(1).is_op(":") and self.peek(2).is_op("="):
            self.next(); self.next(); self.next()
            return tok.text.lower(), self.parse_expression()
        if self.peek(1).is_op("=") and self.peek(2).is_op(">"):
            self.next(); self.next(); self.next()
            return tok.text.lower(), self.parse_expression()
        return None

    def parse_function_call(self, name: str) -> a.Expression:
        lname = name.lower()
        self.expect_op("(")
        if lname == "position":
            # SQL-standard position(needle IN haystack) == instr(hay, n)
            save = self.pos
            needle = self.parse_additive()
            if self.accept_kw("IN"):
                hay = self.parse_expression()
                self.expect_op(")")
                return a.FunctionCall(name="instr", args=[hay, needle])
            self.pos = save
        if lname == "extract":
            # SQL-standard EXTRACT(field FROM expr) (reference grammar
            # expression.gram ExtractExpr); field is a bare keyword or a
            # string literal
            save = self.pos
            tok = self.peek()
            from .lexer import T as _T
            if self.peek(1).is_kw("FROM") and tok.kind in (
                    _T.IDENT, _T.STRING):
                part = self.next().text
                self.next()                      # FROM
                expr = self.parse_expression()
                self.expect_op(")")
                return a.FunctionCall(
                    name="date_part",
                    args=[a.Constant(part.lower(), tt.VARCHAR), expr])
            self.pos = save
        if lname == "trim":
            # SQL-standard TRIM([BOTH|LEADING|TRAILING] [chars] FROM s)
            save = self.pos
            mode = None
            if self.peek().is_kw("BOTH", "LEADING", "TRAILING"):
                mode = self.next().upper
            chars = None
            if not self.peek().is_kw("FROM") and not self.peek().is_op(")"):
                try:
                    chars = self.parse_bitor()
                except ParserException:
                    self.pos = save
                    chars = None
            if (mode is not None or chars is not None) and \
                    self.accept_kw("FROM"):
                sexpr = self.parse_expression()
                self.expect_op(")")
                fname = {"LEADING": "ltrim",
                         "TRAILING": "rtrim"}.get(mode, "trim")
                fargs = [sexpr] + ([chars] if chars is not None else [])
                return a.FunctionCall(name=fname, args=fargs)
            self.pos = save
        if lname in ("substring", "substr"):
            # SQL-standard SUBSTRING(x FROM i [FOR n]) / SUBSTRING(x FOR n)
            # (reference grammar expression.gram:306-308)
            save = self.pos
            s_expr = self.parse_bitor()
            if self.peek().is_kw("FROM", "FOR"):
                if self.accept_kw("FROM"):
                    start = self.parse_bitor()
                else:
                    start = a.Constant(1, tt.INTEGER)
                fargs = [s_expr, start]
                if self.accept_kw("FOR"):
                    fargs.append(self.parse_bitor())
                self.expect_op(")")
                return a.FunctionCall(name="substring", args=fargs)
            self.pos = save
        distinct = False
        args: List[a.Expression] = []
        kwargs: List[tuple] = []
        order_by: List[a.OrderByNode] = []
        if self.peek().is_op("*"):
            self.next()
            self.expect_op(")")
            if lname == "count":
                filt = None
                if self.peek().is_kw("FILTER"):
                    self.next()
                    self.expect_op("(")
                    self.expect_kw("WHERE")
                    filt = self.parse_expression()
                    self.expect_op(")")
                if self.peek().is_kw("OVER"):
                    if filt is not None:
                        raise NotImplementedException(
                            "FILTER on window functions is not supported")
                    return self._parse_over("count_star", [])
                return a.AggregateCall(name="count_star", args=[],
                                       filter=filt)
            return a.FunctionCall(name=lname, args=[a.Star()])
        if not self.peek().is_op(")"):
            if self.accept_kw("DISTINCT"):
                distinct = True
            while True:
                kw = self._try_named_arg()
                if kw is not None:
                    kwargs.append(kw)
                else:
                    args.append(self._parse_lambda_or_expression())
                if not self.accept_op(","):
                    break
            if self.accept_kw("ORDER"):
                self.expect_kw("BY")
                while True:
                    e = self.parse_expression()
                    asc = not self.accept_kw("DESC")
                    if asc:
                        self.accept_kw("ASC")
                    nf = None
                    if self.accept_kw("NULLS"):
                        if self.accept_kw("FIRST"):
                            nf = True
                        else:
                            self.expect_kw("LAST")
                            nf = False
                    order_by.append(a.OrderByNode(expr=e, ascending=asc,
                                                  nulls_first=nf))
                    if not self.accept_op(","):
                        break
        self.expect_op(")")
        filt = None
        if self.peek().is_kw("FILTER"):
            self.next()
            self.expect_op("(")
            self.expect_kw("WHERE")
            filt = self.parse_expression()
            self.expect_op(")")
        ignore_nulls = False
        if self.peek().is_kw("IGNORE", "RESPECT") and \
                self.peek(1).is_kw("NULLS"):
            # fn(args) IGNORE|RESPECT NULLS OVER (...) — reference grammar
            # expression.gram:22-24
            ignore_nulls = self.next().upper == "IGNORE"
            self.next()
            if not self.peek().is_kw("OVER"):
                raise BinderException(
                    "IGNORE NULLS can only be used with window functions")
        if self.peek().is_kw("OVER"):
            if filt is not None:
                raise NotImplementedException(
                    "FILTER on window functions is not supported")
            return self._parse_over(lname, args, ignore_nulls)
        if lname in self._AGGREGATES:
            if lname == "count" and not args:
                lname = "count_star"    # DuckDB: count() == count(*)
            return a.AggregateCall(name=lname, args=args, distinct=distinct,
                                   order_by=order_by, filter=filt)
        if filt is not None:
            raise BinderException(
                "FILTER is only supported for aggregate functions")
        fn = a.FunctionCall(name=lname, args=args, distinct=distinct,
                            order_by=order_by, kwargs=kwargs)
        return fn

    _WINDOW_FUNCTIONS = {
        "row_number", "rank", "dense_rank", "lead", "lag",
        "first_value", "last_value", "ntile", "percent_rank",
        "cume_dist", "nth_value",
        "sum", "count", "count_star", "avg", "min", "max",
    }

    def _parse_over(self, lname: str, args: List[a.Expression],
                    ignore_nulls: bool = False) -> a.WindowCall:
        self.expect_kw("OVER")
        if lname == "count" and not args:
            lname = "count_star"
        if lname not in self._WINDOW_FUNCTIONS:
            # any registered aggregate can run as a window function
            # (DuckDB); the executor has a generic per-frame fallback
            from ..functions.aggregate import REGISTRY as _AGG
            if lname not in _AGG:
                raise NotImplementedException(
                    f"window function {lname} is not supported")
        if self.peek().kind == T.IDENT and not self.peek().is_op("("):
            # OVER window_name: resolved against the WINDOW clause after
            # the select node parses (select.gram WindowClause)
            return a.WindowCall(name=lname, args=args,
                                ref=self.next().text.lower(),
                                ignore_nulls=ignore_nulls)
        partition, order_by, frame = self._parse_window_spec()
        return a.WindowCall(name=lname, args=args, partition_by=partition,
                            order_by=order_by, frame=frame,
                            ignore_nulls=ignore_nulls)

    def _parse_window_spec(self):
        """Parenthesized window specification body."""
        self.expect_op("(")
        partition: List[a.Expression] = []
        order_by: List[a.OrderByNode] = []
        if self.accept_kw("PARTITION"):
            self.expect_kw("BY")
            partition.append(self.parse_expression())
            while self.accept_op(","):
                partition.append(self.parse_expression())
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            while True:
                e = self.parse_expression()
                asc = not self.accept_kw("DESC")
                if asc:
                    self.accept_kw("ASC")
                nf = None
                if self.accept_kw("NULLS"):
                    if self.accept_kw("FIRST"):
                        nf = True
                    else:
                        self.expect_kw("LAST")
                        nf = False
                order_by.append(a.OrderByNode(expr=e, ascending=asc,
                                              nulls_first=nf))
                if not self.accept_op(","):
                    break
        frame = None
        if self.peek().is_kw("ROWS", "RANGE", "GROUPS"):
            frame = self._parse_window_frame()
        self.expect_op(")")
        return partition, order_by, frame

    def _parse_window_frame(self) -> "a.WindowFrame":
        """ROWS/RANGE/GROUPS [BETWEEN bound AND bound | bound]
        (reference grammar expression.gram WindowFrameClause:70-76).
        A single bound is the frame start; the end defaults to CURRENT
        ROW."""
        kind = self.next().text.upper()

        def bound():
            if self.accept_kw("UNBOUNDED"):
                if self.accept_kw("PRECEDING"):
                    return "unbounded_preceding", None
                self.expect_kw("FOLLOWING")
                return "unbounded_following", None
            if self.accept_kw("CURRENT"):
                self.expect_kw("ROW")
                return "current", None
            e = self.parse_expression()
            if self.accept_kw("PRECEDING"):
                return "preceding", e
            self.expect_kw("FOLLOWING")
            return "following", e

        if self.accept_kw("BETWEEN"):
            st, se = bound()
            self.expect_kw("AND")
            et, ee = bound()
        else:
            st, se = bound()
            et, ee = "current", None
        exclude = None
        if self.accept_kw("EXCLUDE"):
            # EXCLUDE CURRENT ROW | GROUP | TIES | NO OTHERS
            # (expression.gram WindowExcludeClause)
            if self.accept_kw("CURRENT"):
                self.expect_kw("ROW")
                exclude = "current"
            elif self.accept_kw("GROUP"):
                exclude = "group"
            elif self.accept_kw("TIES"):
                exclude = "ties"
            elif self.accept_kw("NO"):
                self.expect_kw("OTHERS")
            else:
                self.error("expected CURRENT ROW, GROUP, TIES or "
                           "NO OTHERS after EXCLUDE")
        return a.WindowFrame(kind=kind, start_type=st, start_expr=se,
                             end_type=et, end_expr=ee, exclude=exclude)

    def parse_case(self) -> a.Expression:
        self.expect_kw("CASE")
        case = a.Case()
        if not self.peek().is_kw("WHEN"):
            case.base = self.parse_expression()
        while self.accept_kw("WHEN"):
            cond = self.parse_expression()
            self.expect_kw("THEN")
            val = self.parse_expression()
            case.whens.append((cond, val))
        if self.accept_kw("ELSE"):
            case.else_expr = self.parse_expression()
        self.expect_kw("END")
        return case

    # ------------------------------------------------------------------ types
    def parse_type(self) -> tt.LogicalType:
        name = self.expect_ident().upper()
        if name == "STRUCT":
            self.expect_op("(")
            fields = []
            while True:
                fname = self.expect_ident()
                ftype = self.parse_type()
                fields.append((fname, ftype))
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            typ = tt.STRUCT(fields)
        elif name == "MAP" and self.peek().is_op("("):
            self.next()
            ktype = self.parse_type()
            self.expect_op(",")
            vtype = self.parse_type()
            self.expect_op(")")
            typ = tt.MAP(ktype, vtype)
        elif name in ("DECIMAL", "NUMERIC", "DEC") and self.peek().is_op("("):
            self.next()
            width = int(self.next().text)
            scale = 0
            if self.accept_op(","):
                scale = int(self.next().text)
            self.expect_op(")")
            typ = tt.DECIMAL(width, scale)
        else:
            # double-word types
            if name == "DOUBLE" and self.peek().is_kw("PRECISION"):
                self.next()
            if name == "TIMESTAMP" and self.peek().is_kw("WITH", "WITHOUT"):
                with_ = self.next().upper == "WITH"
                self.expect_kw("TIME")
                self.expect_kw("ZONE")
            typ = tt.type_from_name(name)
            if typ is None:
                # defer to bind time (host: type names are catalog lookups,
                # so CREATE TYPE in the same batch works and a typo is a
                # Catalog Error)
                typ = tt.LogicalType(tt.TypeId.USERREF, type_name=name)
            if self.peek().is_op("(") and name in ("VARCHAR", "CHAR", "BPCHAR"):
                self.next()
                self.next()  # width, ignored
                self.expect_op(")")
        while self.accept_op("["):
            if self.peek().kind == T.NUMBER:
                # fixed-size ARRAY type INT[3]: capability-mapped to LIST
                # (same element access/functions surface)
                self.next()
            self.expect_op("]")
            typ = tt.LIST(typ)
        return typ

    # ------------------------------------------------------------------ DDL
    def parse_create(self) -> a.Statement:
        self.expect_kw("CREATE")
        or_replace = False
        if self.accept_kw("OR"):
            self.expect_kw("REPLACE")
            or_replace = True
        temporary = bool(self.accept_kw("TEMP", "TEMPORARY"))
        tok = self.peek()
        if tok.is_kw("TABLE"):
            return self.parse_create_table(or_replace, temporary)
        if tok.is_kw("VIEW"):
            return self.parse_create_view(or_replace)
        if tok.is_kw("SCHEMA"):
            self.next()
            if_not_exists = self._parse_if_not_exists()
            return a.CreateSchemaStatement(name=self.expect_ident(),
                                           if_not_exists=if_not_exists)
        if tok.is_kw("PROPERTY"):
            return self.parse_create_property_graph(or_replace)
        if tok.is_kw("SEQUENCE"):
            self.next()
            if_not_exists = self._parse_if_not_exists()
            stmt = a.CreateSequenceStatement(
                name=self.expect_ident(), if_not_exists=if_not_exists,
                or_replace=or_replace)
            while True:
                if self.accept_kw("START"):
                    self.accept_kw("WITH")
                    stmt.start = int(self.next().text)
                elif self.accept_kw("INCREMENT"):
                    self.accept_kw("BY")
                    neg = self.accept_op("-")
                    stmt.increment = int(self.next().text) * (-1 if neg
                                                              else 1)
                elif self.accept_kw("MINVALUE", "MAXVALUE", "CACHE"):
                    self.next()
                elif self.accept_kw("NO"):
                    self.next()
                elif self.accept_kw("CYCLE"):
                    pass
                else:
                    break
            return stmt
        if tok.is_kw("TYPE"):
            # CREATE TYPE name AS ENUM ('a', 'b', ...) — reference grammar
            # statements/create_type.gram
            self.next()
            if_not_exists = self._parse_if_not_exists()
            name = self.expect_ident()
            self.expect_kw("AS")
            if not self.accept_kw("ENUM"):
                raise NotImplementedException(
                    "CREATE TYPE only supports AS ENUM")
            self.expect_op("(")
            values = []
            if not self.peek().is_op(")"):
                while True:
                    v = self.next()
                    if v.kind != T.STRING:
                        self.error("expected string literal in ENUM")
                    values.append(v.text)
                    if not self.accept_op(","):
                        break
            self.expect_op(")")
            return a.CreateTypeStatement(name=name, values=values,
                                         or_replace=or_replace,
                                         if_not_exists=if_not_exists)
        if tok.is_kw("MACRO", "FUNCTION"):
            # CREATE MACRO name(p1, p2 := default, ...) AS expr
            # CREATE MACRO name(...) AS TABLE query   (DuckDB macros)
            self.next()
            if_not_exists = self._parse_if_not_exists()
            parts = [self.expect_ident()]
            while self.accept_op("."):
                parts.append(self.expect_ident())
            stmt = a.CreateMacroStatement(
                name=parts[-1],
                schema=parts[-2] if len(parts) >= 2 else None,
                or_replace=or_replace, if_not_exists=if_not_exists)
            self.expect_op("(")
            if not self.peek().is_op(")"):
                while True:
                    pname = self.expect_ident()
                    if self.peek().is_op(":") and self.peek(1).is_op("="):
                        self.next(); self.next()
                        stmt.defaults.append(
                            (pname.lower(), self.parse_expression()))
                    else:
                        stmt.params.append(pname.lower())
                    if not self.accept_op(","):
                        break
            self.expect_op(")")
            self.expect_kw("AS")
            if self.accept_kw("TABLE"):
                stmt.query = self.parse_select_statement()
            else:
                stmt.body = self.parse_expression()
            return stmt
        if tok.is_kw("INDEX", "UNIQUE"):
            # accepted and ignored
            while self.peek().kind != T.EOF and not self.peek().is_op(";"):
                self.next()
            return a.SetStatement(name="__noop__")
        self.error("unsupported CREATE statement")

    def _parse_if_not_exists(self) -> bool:
        if self.accept_kw("IF"):
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
            return True
        return False

    def parse_create_table(self, or_replace: bool,
                           temporary: bool) -> a.CreateTableStatement:
        self.expect_kw("TABLE")
        stmt = a.CreateTableStatement(or_replace=or_replace,
                                      temporary=temporary)
        stmt.if_not_exists = self._parse_if_not_exists()
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        stmt.name = parts[-1]
        if len(parts) >= 2:
            stmt.schema = parts[-2]
        if len(parts) >= 3:
            stmt.catalog = parts[-3]
        if self.accept_kw("AS"):
            stmt.query = self.parse_select_statement()
            return stmt
        self.expect_op("(")
        constraints: List[tuple] = []
        while True:
            if self.peek().is_op(")"):
                break   # trailing comma (DuckDB-compatible)
            # table-level constraints
            if self.peek().is_kw("PRIMARY"):
                self.next()
                self.expect_kw("KEY")
                self.expect_op("(")
                cols = [self.expect_ident()]
                while self.accept_op(","):
                    cols.append(self.expect_ident())
                self.expect_op(")")
                constraints.append(("pk", cols))
            elif self.peek().is_kw("FOREIGN"):
                self.next()
                self.expect_kw("KEY")
                self.expect_op("(")
                fk_cols = [self.expect_ident()]
                while self.accept_op(","):
                    fk_cols.append(self.expect_ident())
                self.expect_op(")")
                self.expect_kw("REFERENCES")
                rparts = [self.expect_ident()]
                while self.accept_op("."):
                    rparts.append(self.expect_ident())
                pk_cols: List[str] = []
                if self.accept_op("("):
                    pk_cols.append(self.expect_ident())
                    while self.accept_op(","):
                        pk_cols.append(self.expect_ident())
                    self.expect_op(")")
                constraints.append(("fk", fk_cols, rparts[-1], pk_cols))
            elif self.peek().is_kw("UNIQUE", "CHECK", "CONSTRAINT"):
                if self.accept_kw("CONSTRAINT"):
                    self.expect_ident()          # constraint name
                if self.accept_kw("UNIQUE"):
                    self.expect_op("(")
                    ucols = [self.expect_ident()]
                    while self.accept_op(","):
                        ucols.append(self.expect_ident())
                    self.expect_op(")")
                    constraints.append(("unique", ucols))
                elif self.accept_kw("CHECK"):
                    self.expect_op("(")
                    constraints.append(("check", self.parse_expression()))
                    self.expect_op(")")
                elif self.accept_kw("PRIMARY"):
                    self.expect_kw("KEY")
                    self.expect_op("(")
                    cols = [self.expect_ident()]
                    while self.accept_op(","):
                        cols.append(self.expect_ident())
                    self.expect_op(")")
                    constraints.append(("pk", cols))
            elif self.peek(1).is_op(",") or self.peek(1).is_op(")"):
                # names-only column list (CREATE TABLE t(a, b) AS ...)
                stmt.columns.append((self.expect_ident(), None, False, None))
            else:
                cname = self.expect_ident()
                ctype = self.parse_type()
                not_null = False
                default = None
                while True:
                    if self.accept_kw("NOT"):
                        self.expect_kw("NULL")
                        not_null = True
                    elif self.accept_kw("NULL"):
                        pass
                    elif self.accept_kw("PRIMARY"):
                        self.expect_kw("KEY")
                        not_null = True
                        constraints.append(("pk", [cname]))
                    elif self.accept_kw("UNIQUE"):
                        constraints.append(("unique", [cname]))
                    elif self.accept_kw("DEFAULT"):
                        default = self.parse_expression()
                    elif self.accept_kw("REFERENCES"):
                        rparts = [self.expect_ident()]
                        while self.accept_op("."):
                            rparts.append(self.expect_ident())
                        pk_cols = []
                        if self.accept_op("("):
                            pk_cols.append(self.expect_ident())
                            while self.accept_op(","):
                                pk_cols.append(self.expect_ident())
                            self.expect_op(")")
                        constraints.append(("fk", [cname], rparts[-1],
                                            pk_cols))
                    elif self.accept_kw("CHECK"):
                        self.expect_op("(")
                        constraints.append(("check",
                                            self.parse_expression()))
                        self.expect_op(")")
                    else:
                        break
                stmt.columns.append((cname, ctype, not_null, default))
            if not self.accept_op(","):
                break
        self.expect_op(")")
        stmt.constraints = constraints
        if self.accept_kw("AS"):
            stmt.query = self.parse_select_statement()
        elif any(c[1] is None for c in stmt.columns):
            # names-only columns are only legal with CREATE TABLE ... AS
            bad = next(c[0] for c in stmt.columns if c[1] is None)
            self.error(f'column "{bad}" has no type')
        return stmt

    def parse_create_view(self, or_replace: bool) -> a.CreateViewStatement:
        self.expect_kw("VIEW")
        stmt = a.CreateViewStatement(or_replace=or_replace)
        self._parse_if_not_exists()
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        stmt.name = parts[-1]
        if len(parts) >= 2:
            stmt.schema = parts[-2]
        if self.accept_op("("):
            cols = [self.expect_ident()]
            while self.accept_op(","):
                cols.append(self.expect_ident())
            self.expect_op(")")
            stmt.column_aliases = tuple(cols)
        self.expect_kw("AS")
        stmt.query = self.parse_select_statement()
        return stmt

    # --------------------------------------------------------------- DML etc.
    def parse_insert(self) -> a.InsertStatement:
        self.expect_kw("INSERT")
        stmt = a.InsertStatement()
        if self.accept_kw("OR"):
            # INSERT OR REPLACE / OR IGNORE shorthands (DuckDB)
            if self.accept_kw("REPLACE"):
                stmt.on_conflict = "replace_all"
            elif self.accept_kw("IGNORE"):
                stmt.on_conflict = "nothing"
            else:
                self.error("expected REPLACE or IGNORE after INSERT OR")
        self.expect_kw("INTO")
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        stmt.table = parts[-1]
        if len(parts) >= 2:
            stmt.schema = parts[-2]
        if self.peek().is_kw("BY") and self.peek(1).is_kw("NAME"):
            self.next(); self.next()
            stmt.by_name = True
        if self.peek().is_op("(") and not self.peek(1).is_kw(
                "SELECT", "WITH", "VALUES", "FROM"):
            self.next()
            cols = [self.expect_ident()]
            while self.accept_op(","):
                cols.append(self.expect_ident())
            self.expect_op(")")
            stmt.columns = tuple(cols)
        stmt.query = self.parse_select_statement()
        if self.accept_kw("ON"):
            # ON CONFLICT [(cols)] DO NOTHING | DO UPDATE SET ... [WHERE]
            self.expect_kw("CONFLICT")
            if self.accept_op("("):
                tgt = [self.expect_ident()]
                while self.accept_op(","):
                    tgt.append(self.expect_ident())
                self.expect_op(")")
                stmt.conflict_target = tuple(tgt)
            self.expect_kw("DO")
            if self.accept_kw("NOTHING"):
                stmt.on_conflict = "nothing"
            else:
                self.expect_kw("UPDATE")
                self.expect_kw("SET")
                stmt.on_conflict = "update"
                while True:
                    col = self.expect_ident()
                    self.expect_op("=")
                    stmt.conflict_updates.append(
                        (col, self.parse_expression()))
                    if not self.accept_op(","):
                        break
                if self.accept_kw("WHERE"):
                    stmt.conflict_where = self.parse_expression()
        if self.accept_kw("RETURNING"):
            stmt.returning = self.parse_select_list()
        return stmt

    def parse_update(self) -> a.UpdateStatement:
        self.expect_kw("UPDATE")
        stmt = a.UpdateStatement()
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        stmt.table = parts[-1]
        if len(parts) >= 2:
            stmt.schema = parts[-2]
        self.expect_kw("SET")
        while True:
            col = self.expect_ident()
            self.expect_op("=")
            stmt.assignments.append((col, self.parse_expression()))
            if not self.accept_op(","):
                break
        if self.accept_kw("FROM"):
            # UPDATE t SET ... FROM src [WHERE join-cond] (DuckDB)
            stmt.from_ref = self.parse_from_list()
        if self.accept_kw("WHERE"):
            stmt.where = self.parse_expression()
        if self.accept_kw("RETURNING"):
            stmt.returning = self.parse_select_list()
        return stmt

    def parse_delete(self) -> a.DeleteStatement:
        self.expect_kw("DELETE")
        self.expect_kw("FROM")
        stmt = a.DeleteStatement()
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        stmt.table = parts[-1]
        if len(parts) >= 2:
            stmt.schema = parts[-2]
        if self.accept_kw("WHERE"):
            stmt.where = self.parse_expression()
        if self.accept_kw("RETURNING"):
            stmt.returning = self.parse_select_list()
        return stmt

    def parse_drop(self) -> a.DropStatement:
        self.expect_kw("DROP")
        if self.peek().is_kw("SEQUENCE", "TYPE"):
            kind = self.next().upper
            if_exists = False
            if self.accept_kw("IF"):
                self.expect_kw("EXISTS")
                if_exists = True
            return a.DropStatement(kind=kind,
                                   name=self.expect_ident(),
                                   if_exists=if_exists)
        tok = self.peek()
        if tok.is_kw("PROPERTY"):
            self.next()
            self.expect_kw("GRAPH")
            missing_ok = False
            if self.accept_kw("IF"):
                self.expect_kw("EXISTS")
                missing_ok = True
            name = self.expect_ident()
            info = past.DropPropertyGraphInfo(property_graph_name=name,
                                              missing_ok=missing_ok)
            return a.DropStatement(kind="PROPERTY_GRAPH", name=name,
                                   if_exists=missing_ok, info=info)
        if tok.is_kw("MACRO", "FUNCTION"):
            self.next()
            self.accept_kw("TABLE")       # DROP MACRO TABLE name
            if_exists = False
            if self.accept_kw("IF"):
                self.expect_kw("EXISTS")
                if_exists = True
            return a.DropStatement(kind="MACRO",
                                   name=self.expect_ident(),
                                   if_exists=if_exists)
        kind = self.next().upper
        if kind not in ("TABLE", "VIEW", "SCHEMA", "INDEX"):
            self.error("unsupported DROP")
        if_exists = False
        if self.accept_kw("IF"):
            self.expect_kw("EXISTS")
            if_exists = True
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        cascade = bool(self.accept_kw("CASCADE"))
        self.accept_kw("RESTRICT")
        return a.DropStatement(
            kind=kind, name=parts[-1],
            schema=parts[-2] if len(parts) >= 2 else None,
            if_exists=if_exists, cascade=cascade)

    def parse_alter(self) -> a.AlterStatement:
        self.expect_kw("ALTER")
        self.expect_kw("TABLE")
        stmt = a.AlterStatement()
        if self.accept_kw("IF"):
            self.expect_kw("EXISTS")
            stmt.if_exists = True
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        stmt.table = parts[-1]
        if len(parts) >= 2:
            stmt.schema = parts[-2]
        if self.accept_kw("ADD"):
            self.accept_kw("COLUMN")
            stmt.action = "ADD_COLUMN"
            stmt.column_name = self.expect_ident()
            stmt.column_type = self.parse_type()
            if self.accept_kw("DEFAULT"):
                stmt.default = self.parse_expression()
        elif self.accept_kw("DROP"):
            self.accept_kw("COLUMN")
            stmt.action = "DROP_COLUMN"
            stmt.column_name = self.expect_ident()
        elif self.accept_kw("RENAME"):
            if self.accept_kw("TO"):
                stmt.action = "RENAME_TABLE"
                stmt.new_name = self.expect_ident()
            else:
                self.accept_kw("COLUMN")
                stmt.action = "RENAME_COLUMN"
                stmt.column_name = self.expect_ident()
                self.expect_kw("TO")
                stmt.new_name = self.expect_ident()
        elif self.accept_kw("ALTER"):
            self.accept_kw("COLUMN")
            stmt.action = "ALTER_TYPE"
            stmt.column_name = self.expect_ident()
            self.accept_kw("SET")
            self.accept_kw("DATA")
            self.expect_kw("TYPE")
            stmt.column_type = self.parse_type()
        else:
            self.error("unsupported ALTER TABLE action")
        return stmt

    def parse_copy(self) -> a.CopyStatement:
        self.expect_kw("COPY")
        stmt = a.CopyStatement()
        if self.accept_op("("):
            stmt.query = self.parse_select_statement()
            self.expect_op(")")
        else:
            parts = [self.expect_ident()]
            while self.accept_op("."):
                parts.append(self.expect_ident())
            stmt.table = parts[-1]
        if self.accept_kw("FROM"):
            stmt.is_from = True
        else:
            self.expect_kw("TO")
        stmt.filename = self.next().text
        if self.accept_op("("):
            while not self.peek().is_op(")"):
                key = self.expect_ident().upper()
                if self.peek().is_op(")") or self.peek().is_op(","):
                    stmt.options[key] = True
                else:
                    val = self.next().text
                    stmt.options[key] = val
                self.accept_op(",")
            self.expect_op(")")
        if self.accept_kw("WITH"):
            self.expect_op("(")
            while not self.peek().is_op(")"):
                key = self.expect_ident().upper()
                val = self.next().text
                stmt.options[key] = val
                self.accept_op(",")
            self.expect_op(")")
        return stmt

    def parse_pragma(self) -> a.PragmaStatement:
        self.expect_kw("PRAGMA")
        name = self.expect_ident().lower()
        stmt = a.PragmaStatement(name=name)
        if self.accept_op("("):
            if not self.peek().is_op(")"):
                stmt.args.append(self.parse_expression())
                while self.accept_op(","):
                    stmt.args.append(self.parse_expression())
            self.expect_op(")")
        elif self.accept_op("="):
            stmt.args.append(self.parse_expression())
        return stmt

    def parse_set(self) -> a.SetStatement:
        self.expect_kw("SET")
        self.accept_kw("GLOBAL", "SESSION", "LOCAL")
        name = self.expect_ident().lower()
        if self.accept_op("=") or self.accept_kw("TO"):
            pass
        tok = self.next()
        value = tok.text
        if tok.kind == T.NUMBER:
            value = float(value) if "." in value else int(value)
        elif tok.kind == T.IDENT and tok.upper in ("TRUE", "FALSE"):
            value = tok.upper == "TRUE"
        return a.SetStatement(name=name, value=value)

    def parse_describe(self) -> a.Statement:
        kw = self.next().upper  # DESCRIBE / DESC / SHOW
        if kw == "SHOW":
            if self.accept_kw("TABLES"):
                return a.DescribeStatement(kind="TABLES")
            if self.accept_kw("ALL"):
                self.expect_kw("TABLES")
                return a.DescribeStatement(kind="TABLES")
        if self.peek().is_kw("PROPERTY"):
            self.next()
            self.expect_kw("GRAPH")
            return a.DescribeStatement(target=self.expect_ident(),
                                       kind="PROPERTY_GRAPH")
        if self.peek().is_kw("SELECT", "WITH", "VALUES", "FROM"):
            return a.DescribeStatement(target=self.parse_select_statement(),
                                       kind="QUERY")
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        return a.DescribeStatement(target=parts[-1], kind="TABLE")

    def parse_summarize(self) -> a.Statement:
        self.expect_kw("SUMMARIZE")
        if self.peek().is_kw("PROPERTY"):
            self.next()
            self.expect_kw("GRAPH")
            return a.SummarizeStatement(target=self.expect_ident(),
                                        kind="PROPERTY_GRAPH")
        if self.peek().is_kw("SELECT", "WITH", "VALUES", "FROM"):
            return a.SummarizeStatement(target=self.parse_select_statement(),
                                        kind="QUERY")
        return a.SummarizeStatement(target=self.expect_ident(), kind="TABLE")

    def parse_attach(self) -> a.AttachStatement:
        self.expect_kw("ATTACH")
        if self.accept_kw("DATABASE"):
            pass
        self.accept_kw("IF")  # IF NOT EXISTS
        if self.tokens[self.pos - 1].is_kw("IF"):
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
        path = self.next().text
        stmt = a.AttachStatement(path=path)
        if self.accept_kw("AS"):
            stmt.name = self.expect_ident()
        if self.accept_op("("):
            while not self.peek().is_op(")"):
                key = self.expect_ident().upper()
                if not self.peek().is_op(",") and not self.peek().is_op(")"):
                    stmt.options[key] = self.next().text
                else:
                    stmt.options[key] = True
                self.accept_op(",")
            self.expect_op(")")
        return stmt

    # ------------------------------------------------------------------- PGQ
    def parse_create_property_graph(self, or_replace: bool) -> a.Statement:
        """CreatePropertyGraphStmt per reference pgq.gram:1-27."""
        self.expect_kw("PROPERTY")
        self.expect_kw("GRAPH")
        info = past.CreatePropertyGraphInfo()
        if or_replace:
            info.on_conflict = "REPLACE"
        if self.accept_kw("IF"):
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
            info.on_conflict = "IGNORE"
        info.property_graph_name = self.expect_ident()
        self.expect_kw("VERTEX")
        self.expect_kw("TABLES")
        self.expect_op("(")
        while True:
            info.vertex_tables.append(self.parse_pg_table(is_vertex=True))
            if not self.accept_op(","):
                break
        self.expect_op(")")
        if self.accept_kw("EDGE"):
            self.expect_kw("TABLES")
            self.expect_op("(")
            while True:
                info.edge_tables.append(self.parse_pg_table(is_vertex=False))
                if not self.accept_op(","):
                    break
            self.expect_op(")")
        for t in info.all_tables():
            info.register_label(t)
        return a.CreatePropertyGraphStatement(info=info)

    def parse_pg_table(self, is_vertex: bool) -> past.PropertyGraphTable:
        t = past.PropertyGraphTable(is_vertex_table=is_vertex)
        parts = [self.expect_ident()]
        while self.accept_op("."):
            parts.append(self.expect_ident())
        t.table_name = parts[-1]
        if len(parts) >= 2:
            t.schema_name = parts[-2]
        if len(parts) >= 3:
            t.catalog_name = parts[-3]
        if self.accept_kw("AS"):
            t.table_name_alias = self.expect_ident()
        if not is_vertex:
            self._parse_pg_key_reference(t, source=True)
            self._parse_pg_key_reference(t, source=False)
        self._parse_pg_properties(t)
        self._parse_pg_label(t)
        if not t.main_label:
            t.main_label = t.table_name
        return t

    def _parse_pg_key_reference(self, t: past.PropertyGraphTable, source: bool):
        self.expect_kw("SOURCE" if source else "DESTINATION")
        if self.accept_kw("KEY"):
            self.expect_op("(")
            fks = [self.expect_ident()]
            while self.accept_op(","):
                fks.append(self.expect_ident())
            self.expect_op(")")
            self.expect_kw("REFERENCES")
            parts = [self.expect_ident()]
            while self.accept_op("."):
                parts.append(self.expect_ident())
            self.expect_op("(")
            pks = [self.expect_ident()]
            while self.accept_op(","):
                pks.append(self.expect_ident())
            self.expect_op(")")
        else:
            # bare table reference; keys discovered from catalog FKs at bind
            parts = [self.expect_ident()]
            while self.accept_op("."):
                parts.append(self.expect_ident())
            fks, pks = [], []
        ref = parts[-1]
        schema = parts[-2] if len(parts) >= 2 else ""
        catalog = parts[-3] if len(parts) >= 3 else ""
        if source:
            t.source_fk, t.source_pk = fks, pks
            t.source_reference, t.source_schema, t.source_catalog = \
                ref, schema, catalog
        else:
            t.destination_fk, t.destination_pk = fks, pks
            t.destination_reference, t.destination_schema, \
                t.destination_catalog = ref, schema, catalog

    def _parse_pg_properties(self, t: past.PropertyGraphTable):
        if self.accept_kw("NO"):
            self.expect_kw("PROPERTIES")
            t.no_columns = True
            t.all_columns = False
            return
        if self.peek().is_kw("ALL") and self.peek(1).is_kw("PROPERTIES"):
            self.next()
            self.next()
            t.all_columns = True
            return
        if not self.peek().is_kw("PROPERTIES"):
            return
        self.next()
        if self.accept_kw("ARE") or self.peek().is_kw("ALL"):
            self.expect_kw("ALL")
            self.expect_kw("COLUMNS")
            t.all_columns = True
            if self.accept_kw("EXCEPT"):
                self.expect_op("(")
                t.except_columns.append(self.expect_ident())
                while self.accept_op(","):
                    t.except_columns.append(self.expect_ident())
                self.expect_op(")")
            return
        self.expect_op("(")
        t.all_columns = False
        while True:
            col = self.expect_ident()
            t.column_names.append(col)
            if self.accept_kw("AS"):
                t.column_aliases[col] = self.expect_ident()
            if not self.accept_op(","):
                break
        self.expect_op(")")

    def _parse_pg_label(self, t: past.PropertyGraphTable):
        if self.accept_kw("LABEL"):
            t.main_label = self.expect_ident()
            self._parse_pg_sublabels(t)
        elif self.peek().is_kw("IN"):
            self._parse_pg_sublabels(t)

    def _parse_pg_sublabels(self, t: past.PropertyGraphTable):
        if not self.accept_kw("IN"):
            return
        t.discriminator = self.expect_ident()
        self.expect_op("(")
        t.sub_labels.append(self.expect_ident())
        while self.accept_op(","):
            t.sub_labels.append(self.expect_ident())
        self.expect_op(")")

    # ---- GRAPH_TABLE body: pg MATCH patterns [WHERE] [COLUMNS(...)] --------
    def parse_graph_table_body(self) -> past.MatchExpression:
        m = past.MatchExpression()
        m.pg_name = self.expect_ident()
        self.expect_kw("MATCH")
        while True:
            m.path_patterns.append(self.parse_path_pattern())
            if not self.accept_op(","):
                break
        if self.accept_kw("WHERE"):
            m.where_clause = self.parse_expression()
        if self.accept_kw("COLUMNS"):
            self.expect_op("(")
            m.column_list.append(self.parse_aliased_expression())
            while self.accept_op(","):
                if self.peek().is_op(")"):
                    break   # trailing comma tolerated
                m.column_list.append(self.parse_aliased_expression())
            self.expect_op(")")
        return m

    def parse_path_pattern(self) -> past.PathPattern:
        p = past.PathPattern()
        # optional path variable: ident '='  (but not part of a vertex '(')
        if self.at_ident() and self.peek(1).is_op("=") and not \
                self.peek().is_kw("ALL", "ANY", "SHORTEST", "WALK", "TRAIL",
                                  "SIMPLE", "ACYCLIC"):
            p.path_variable = self.next().text
            self.next()  # '='
        # search prefix
        if self.accept_kw("ALL"):
            if self.accept_kw("SHORTEST"):
                p.all = True
                p.shortest = True
            else:
                p.all = True
        elif self.accept_kw("ANY"):
            self.expect_kw("SHORTEST")
            p.shortest = True
        elif self.peek().is_kw("SHORTEST"):
            self.next()
            num = self.next()
            p.topk = int(num.text)
        # path mode
        if self.accept_kw("WALK"):
            p.mode = past.PGQPathMode.WALK
        elif self.accept_kw("TRAIL"):
            p.mode = past.PGQPathMode.TRAIL
        elif self.accept_kw("SIMPLE"):
            p.mode = past.PGQPathMode.SIMPLE
        elif self.accept_kw("ACYCLIC"):
            p.mode = past.PGQPathMode.ACYCLIC
        # vertex (edge vertex)*
        p.path_elements.append(self.parse_vertex_pattern())
        while self.peek().is_op("-", "<"):
            edge = self.parse_edge_pattern()
            p.path_elements.append(edge)
            p.path_elements.append(self.parse_vertex_pattern())
        return p

    def parse_vertex_pattern(self) -> past.PathReference:
        self.expect_op("(")
        el = past.PathElement(match_type=past.PGQMatchType.MATCH_VERTEX)
        # binding identifier is mandatory in the reference grammar
        # (pgq.gram GraphVertexReference <- '(' Identifier ...)
        if self.peek().is_kw("WHERE") or not self.at_ident():
            self.error("expected vertex binding identifier")
        el.variable_binding = self.expect_ident()
        if self.accept_op(":") or self.accept_kw("IS"):
            el.label = self.expect_ident()
        where = None
        if self.accept_kw("WHERE"):
            where = self.parse_expression()
        self.expect_op(")")
        if where is not None:
            return past.SubPath(path_list=[el], where_clause=where,
                                single_bind=True)
        return el

    def _adjacent(self, t1: Token, t2: Token) -> bool:
        return t1.end == t2.start

    def parse_edge_pattern(self) -> past.PathReference:
        """Edge directions per reference pgq.gram:60-68: ``-[b]->`` ``<-[b]-``
        ``-[b]-`` ``<-[b]->`` — the bracketed body is mandatory (the reference
        grammar rejects abbreviated ``->`` edges and empty ``[]`` bodies,
        test/sql/path_finding/parser_arrow_kleene.test), arrows may be spaced
        (``- >``); then an optional quantifier ``* + ? {n} {n,m}``."""
        left_arrow = False
        if self.peek().is_op("<"):
            self.next()
            self.expect_op("-")
            left_arrow = True
        else:
            self.expect_op("-")
        el = past.PathElement()
        where = None
        self.expect_op("[")
        if self.peek().is_kw("WHERE") or not self.at_ident():
            self.error("expected edge binding identifier")
        el.variable_binding = self.expect_ident()
        if self.accept_op(":") or self.accept_kw("IS"):
            el.label = self.expect_ident()
        if self.accept_kw("WHERE"):
            where = self.parse_expression()
        self.expect_op("]")
        # right endpoint: '-' optionally followed by '>'
        self.expect_op("-")
        right_arrow = bool(self.accept_op(">"))
        if left_arrow and right_arrow:
            el.match_type = past.PGQMatchType.MATCH_EDGE_LEFT_RIGHT
        elif left_arrow:
            el.match_type = past.PGQMatchType.MATCH_EDGE_LEFT
        elif right_arrow:
            el.match_type = past.PGQMatchType.MATCH_EDGE_RIGHT
        else:
            el.match_type = past.PGQMatchType.MATCH_EDGE_ANY
        # quantifier
        lower, upper = self._parse_quantifier()
        result: past.PathReference = el
        if where is not None:
            result = past.SubPath(path_list=[el], where_clause=where,
                                  single_bind=True)
        if lower is not None:
            result = past.SubPath(path_list=[result], lower=lower, upper=upper)
        return result

    def _parse_quantifier(self):
        """Returns (lower, upper) or (None, None). Unbounded upper = 1<<30
        (reference uses INT32_MAX-like sentinel via transform_pgq.cpp:488-528)."""
        UNBOUNDED = 1 << 30
        tok = self.peek()
        if tok.is_op("*"):
            self.next()
            return 0, UNBOUNDED
        if tok.is_op("+"):
            self.next()
            return 1, UNBOUNDED
        if tok.is_op("?"):
            self.next()
            return 0, 1
        if tok.is_op("{"):
            self.next()
            lower = None
            upper = None
            if self.peek().kind == T.NUMBER:
                lower = int(self.next().text)
            if self.accept_op(","):
                if self.peek().kind == T.NUMBER:
                    upper = int(self.next().text)
                else:
                    upper = UNBOUNDED
            else:
                upper = lower
            self.expect_op("}")
            if lower is None and upper is None:
                self.error("quantifier {} requires at least one bound")
            lower = lower if lower is not None else 0
            if lower > upper:
                from ..errors import ConstraintException
                raise ConstraintException(
                    "Lower bound greater than upper bound")
            return lower, upper
        return None, None


def parse_sql(sql: str) -> List[a.Statement]:
    return Parser(sql).parse_statements()


def parse_expression(text: str) -> a.Expression:
    p = Parser(text)
    e = p.parse_expression()
    return e
