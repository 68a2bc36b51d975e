"""Database + Connection: session state, property-graph registry, CSR store.

Capability-equivalent of the reference's DuckPGQState (reference
src/duckpgq_state.cpp): a per-session registry of property graphs persisted in
the ``__duckpgq_internal`` table, and a CSR side-channel keyed by integer id
that graph kernels read and that is garbage-collected at query end
(duckpgq_state.cpp:162-170).
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional

from .errors import BinderException, CatalogException, InvalidException
from .exec.executor import Executor
# register SQL-facing graph kernels (create_csr_*, iterativelength, ...) into
# the scalar function registry
from .pgq import kernels_sql as _kernels_sql  # noqa: F401
from .exec.result import QueryResult
from .sql import ast as _ast
from .sql.parser import parse_sql
from .storage.catalog import Catalog


class Database:
    """Shared database instance (catalog + property-graph registry)."""

    def __init__(self, path: str = ":memory:"):
        self.path = path
        self.catalog = Catalog("memory")
        self.attached: Dict[str, Catalog] = {}
        self.base_path = "."
        self.lock = threading.RLock()
        # property-graph registry: name(lower) -> CreatePropertyGraphInfo
        self.registered_property_graphs: Dict[str, object] = {}
        self.connections: List["Connection"] = []
        # cached CSRs keyed by (graph build signature); invalidated on writes
        self._csr_cache: Dict[tuple, object] = {}
        # CREATE SEQUENCE state: name -> {next, inc, cur}
        self.sequences: Dict[str, dict] = {}
        self.comments: Dict[tuple, str] = {}   # COMMENT ON side table
        # durable databases (reference: PG metadata persists inside the
        # user's database file, duckpgq_state.cpp:34-160): a non-:memory:
        # path restores on open; CHECKPOINT / close() save
        if self.is_durable and os.path.exists(
                os.path.join(path, "catalog.json")):
            from .storage.persist import load_database
            load_database(self, path)

    @property
    def is_durable(self) -> bool:
        return self.path not in (":memory:", "")

    def checkpoint(self):
        """Write the catalog, table data, views, and property-graph
        registry to ``self.path`` (no-op for in-memory databases)."""
        if not self.is_durable:
            return
        from .storage.persist import save_database
        with self.lock:
            save_database(self, self.path)

    def close(self):
        self.checkpoint()

    def connect(self) -> "Connection":
        con = Connection(self)
        self.connections.append(con)
        return con

    def attach(self, path: str, name: Optional[str]):
        alias = name or os.path.splitext(os.path.basename(path))[0]
        if alias.lower() in self.attached:
            raise CatalogException(
                f'Unique file handle conflict: Database "{alias}" is already '
                f'attached')
        catalog = Catalog(alias)
        self.attached[alias.lower()] = catalog
        resolved = self.resolve_path(path)
        # a directory with schema.sql/load.sql is an exported database;
        # a .duckdb file is DuckDB binary storage (io/duckdb_file.py)
        if os.path.isdir(resolved):
            con = self.connect()
            con.execute(f"IMPORT DATABASE '{path}'")
        elif os.path.isfile(resolved):
            try:
                self._load_duckdb_file(resolved, catalog)
            except Exception:
                del self.attached[alias.lower()]
                raise

    def _load_duckdb_file(self, path: str, catalog: Catalog):
        """Materialize every table of a DuckDB storage file into the
        attached catalog (reference test/sql/create_pg/attach_pg.test)."""
        from .io.duckdb_file import DuckDBFile
        from .storage.table import ColumnDefinition, DataTable
        from .storage.vector import Vector
        from .types import type_from_name

        dbfile = DuckDBFile(path)
        for schema_name in dbfile.catalog.schemas:
            catalog.create_schema(schema_name, if_not_exists=True)
        for schema_name, table_name in dbfile.table_names():
            cols, data = dbfile.read_table(table_name, schema_name)
            cdefs = [ColumnDefinition(c.name, type_from_name(c.sql_type))
                     for c in cols]
            table = DataTable(table_name, cdefs, schema=schema_name,
                              catalog=catalog.name)
            table.append([Vector.from_values(vals, cdefs[i].type)
                          for i, vals in enumerate(data)])
            catalog.create_table(table)

    def detach(self, name: str):
        if name.lower() not in self.attached:
            raise CatalogException(f'database "{name}" not found')
        del self.attached[name.lower()]

    def resolve_path(self, path: str) -> str:
        if os.path.isabs(path):
            return path
        return os.path.join(self.base_path, path)

    def invalidate_graph_caches(self, table_name: str):
        self._csr_cache.clear()


class Connection:
    """A client session. Mirrors DuckPGQState: per-connection CSR maps with
    query-end GC; the PG registry is shared via the Database (the reference
    replicates registry entries into every open connection on CREATE,
    create_property_graph.cpp:318-321 — shared storage is observably the
    same)."""

    _next_csr_key = 0

    def __init__(self, database: Database):
        self.database = database
        self.executor = Executor(self)
        self.settings: Dict[str, object] = {}
        self.default_catalog: Optional[str] = None
        # CSR side-channel (reference duckpgq_state.hpp:35-38)
        self.csr_list: Dict[int, object] = {}
        self.csr_to_delete: set = set()
        # cached per-query algorithm state (pagerank ranks, wcc forest)
        self.algo_state: Dict[tuple, object] = {}
        # prepared statements: name -> parsed statement AST (validated at
        # PREPARE; Parameter nodes bound to Constants at EXECUTE)
        self.prepared: Dict[str, object] = {}

    # ------------------------------------------------------------- catalogs
    @property
    def catalog(self) -> Catalog:
        return self.database.catalog

    def resolve_catalog(self, name: Optional[str]) -> Catalog:
        if name is None:
            if self.default_catalog:
                return self.database.attached.get(
                    self.default_catalog.lower(), self.database.catalog)
            return self.database.catalog
        if name.lower() == self.database.catalog.name.lower() or \
                name.lower() in ("memory", "main"):
            return self.database.catalog
        cat = self.database.attached.get(name.lower())
        if cat is None:
            raise CatalogException(
                f'Catalog "{name}" does not exist!')
        return cat

    def find_table_any_catalog(self, table: str, schema, catalog):
        if catalog is not None:
            cat = self.database.attached.get(catalog.lower())
            if cat:
                return cat.get_table(table, schema, missing_ok=True)
            return None
        # DuckDB resolves a two-part name first as schema.table, then as
        # catalog.table (default schema) against attached databases;
        # unqualified names never search attached catalogs
        if schema is not None:
            cat = self.database.attached.get(schema.lower())
            if cat:
                return cat.get_table(table, None, missing_ok=True)
        return None

    # ------------------------------------------------------------ execution
    def execute(self, sql: str, parameters=None) -> QueryResult:
        """Run SQL; ``?`` placeholders are bound positionally from
        ``parameters`` (the DuckDB Python client convention)."""
        if parameters is not None:
            sql = _bind_parameters(sql, parameters)
        handled = self._prepared_statement_dispatch(sql)
        if handled is not None:
            return handled
        statements = parse_sql(sql)
        result = QueryResult([], [])
        for stmt in statements:
            try:
                result = self.executor.execute_statement(stmt)
            finally:
                self.query_end()
        return result

    def _prepared_statement_dispatch(self, sql: str):
        """PREPARE name AS <stmt> / EXECUTE name(args) / DEALLOCATE name —
        DuckDB-style prepared statements, per connection. Statement-aware:
        the input is split on top-level semicolons first, so a PREPARE body
        ends at the statement boundary and prepared-family statements mix
        with ordinary ones in one batch. Returns None when no statement in
        ``sql`` is prepared-family (the normal path re-parses the whole
        text once)."""
        import re
        from .errors import BinderException
        pieces = [p for p in _split_statements(sql) if p.strip()]
        pat_prepare = r"(?is)^\s*PREPARE\s+([A-Za-z_][\w]*)\s+AS\s+(.+)$"
        pat_execute = r"(?is)^\s*EXECUTE\s+([A-Za-z_][\w]*)\s*(\((.*)\))?\s*$"
        pat_dealloc = r"(?is)^\s*DEALLOCATE\s+(?:PREPARE\s+)?([A-Za-z_][\w]*)\s*$"
        if not any(re.match(pat_prepare, p) or re.match(pat_execute, p)
                   or re.match(pat_dealloc, p) for p in pieces):
            return None
        result = QueryResult([], [])
        for piece in pieces:
            m = re.match(pat_prepare, piece)
            if m:
                # parse ONCE at PREPARE so malformed bodies error here, not
                # at EXECUTE (DuckDB validates at prepare; ADVICE r2)
                stmts = parse_sql(m.group(2))
                if len(stmts) != 1:
                    raise BinderException(
                        "PREPARE body must be a single statement")
                self.prepared[m.group(1).lower()] = stmts[0]
                result = QueryResult([], [])
                continue
            m = re.match(pat_execute, piece)
            if m:
                name = m.group(1).lower()
                body = self.prepared.get(name)
                if body is None:
                    raise BinderException(
                        f"Prepared statement \"{m.group(1)}\" does not "
                        "exist")
                args = _split_top_level(m.group(3) or "")
                # arguments bind as evaluated typed Constants, never as
                # spliced text (so `1+1` binds the value 2 and strings
                # cannot re-shape the statement)
                binds = {}
                if args:
                    vals = self.execute("SELECT " + ", ".join(args))
                    for i, col in enumerate(vals.columns, 1):
                        binds[i] = _ast.Constant(col.value(0), col.type)
                stmt = _bind_prepared(body, binds)
                try:
                    result = self.executor.execute_statement(stmt)
                finally:
                    self.query_end()
                continue
            m = re.match(pat_dealloc, piece)
            if m:
                name = m.group(1).lower()
                if name not in self.prepared:
                    raise BinderException(
                        f"Prepared statement \"{m.group(1)}\" does not "
                        "exist")
                del self.prepared[name]
                result = QueryResult([], [])
                continue
            result = self.execute(piece)
        return result

    def executemany(self, sql: str, parameter_sets) -> QueryResult:
        result = QueryResult([], [])
        for params in parameter_sets:
            result = self.execute(sql, params)
        return result

    def sql(self, query: str) -> QueryResult:
        return self.execute(query)

    def close(self):
        self.database.close()


    def query_end(self):
        """GC CSRs flagged for deletion (reference duckpgq_state.cpp:162-170)."""
        for key in self.csr_to_delete:
            self.csr_list.pop(key, None)
        self.csr_to_delete.clear()
        self.algo_state.clear()

    # ------------------------------------------------------------ pg registry
    @property
    def registered_property_graphs(self) -> Dict[str, object]:
        return self.database.registered_property_graphs

    def get_property_graph(self, name: str):
        info = self.registered_property_graphs.get(name.lower())
        if info is None:
            raise InvalidException(f"Property graph {name} not found")
        return info


def _sql_literal(v) -> str:
    """Render a Python value as a SQL literal (parameter binding)."""
    import datetime

    import numpy as np
    if v is None:
        return "NULL"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (datetime.date, datetime.datetime)):
        return "'" + v.isoformat().replace("T", " ") + "'"
    if isinstance(v, (list, tuple)):
        return "list_value(" + ", ".join(_sql_literal(x) for x in v) + ")"
    return "'" + str(v).replace("'", "''") + "'"


def _bind_parameters(sql: str, parameters) -> str:
    """Substitute ``?`` placeholders (outside quotes/comments) with escaped
    literals, positionally."""
    from .errors import InvalidInputException
    params = list(parameters)
    out = []
    i, n, used = 0, len(sql), 0
    while i < n:
        ch = sql[i]
        if ch in ("'", '"'):
            q = ch
            out.append(ch)
            i += 1
            while i < n:
                out.append(sql[i])
                if sql[i] == q:
                    i += 1
                    break
                i += 1
            continue
        if ch == "-" and sql[i:i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out.append(sql[i:j])
            i = j
            continue
        if ch == "?":
            if used >= len(params):
                raise InvalidInputException(
                    f"Expected {used + 1} or more parameters, got "
                    f"{len(params)}")
            out.append(_sql_literal(params[used]))
            used += 1
            i += 1
            continue
        out.append(ch)
        i += 1
    if used != len(params):
        raise InvalidInputException(
            f"Expected {used} parameters, got {len(params)}")
    return "".join(out)


def _split_statements(sql: str):
    """Split a SQL batch on top-level semicolons (strings, quoted
    identifiers, and -- comments respected)."""
    out, cur, i, n = [], [], 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            cur.append(sql[i:j])
            i = j
            continue
        if ch == '"':
            j = i + 1
            while j < n and sql[j] != '"':
                j += 1
            cur.append(sql[i:j + 1])
            i = j + 1
            continue
        if ch == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            cur.append(sql[i:j])
            i = j
            continue
        if ch == ";":
            out.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    tail = "".join(cur)
    if tail.strip():
        out.append(tail)
    return out


def _split_top_level(text: str):
    """Split EXECUTE argument text on top-level commas (strings and nesting
    respected)."""
    out, depth, cur, i, n = [], 0, [], 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            cur.append(ch)
            i += 1
            while i < n:
                cur.append(text[i])
                if text[i] == "'":
                    if i + 1 < n and text[i + 1] == "'":
                        cur.append(text[i + 1])
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def _bind_prepared(stmt, binds):
    """Deep-copy a prepared statement AST and replace every Parameter node
    with its bound Constant (missing indices are left in place and raise a
    clean binder error when evaluated)."""
    import copy
    import dataclasses
    stmt = copy.deepcopy(stmt)

    def walk(obj):
        if isinstance(obj, _ast.Parameter):
            return binds.get(obj.index, obj)
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            if obj.__dataclass_params__.frozen:   # e.g. LogicalType
                return obj
            for f in dataclasses.fields(obj):
                setattr(obj, f.name, walk(getattr(obj, f.name)))
            return obj
        if isinstance(obj, list):
            return [walk(x) for x in obj]
        if isinstance(obj, tuple):
            return tuple(walk(x) for x in obj)
        if isinstance(obj, dict):
            return {k: walk(v) for k, v in obj.items()}
        return obj

    return walk(stmt)
