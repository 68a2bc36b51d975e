"""Catalog: schemas, tables, and views, plus attached-database support.

Mirrors the capability surface the reference exercises through its host engine
(multiple schemas: reference test/sql/211_using_other_schemas.test; attached
databases: test/sql/create_pg/attach_pg.test; views rejected as PG vertex
tables: test/sql/create_pg/create_pg_on_view.test).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from ..errors import BinderException, CatalogException
from .table import ColumnDefinition, DataTable


class View:
    __slots__ = ("name", "schema", "catalog", "query", "column_aliases")

    def __init__(self, name: str, query, column_aliases=None,
                 schema: str = "main", catalog: str = "memory"):
        self.name = name
        self.schema = schema
        self.catalog = catalog
        self.query = query            # parsed SelectStatement AST
        self.column_aliases = column_aliases


class Macro:
    """A DuckDB-style macro: positional params + named defaults wrapping
    either a scalar expression (``body``) or a query (``query`` — table
    macro)."""
    __slots__ = ("name", "schema", "params", "defaults", "body", "query")

    def __init__(self, name: str, params, defaults, body=None, query=None,
                 schema: str = "main"):
        self.name = name
        self.schema = schema
        self.params = list(params)
        self.defaults = list(defaults)   # [(name, Expression), ...]
        self.body = body
        self.query = query


class Schema:
    def __init__(self, name: str):
        self.name = name
        self.tables: Dict[str, DataTable] = {}   # keys lower-cased
        self.views: Dict[str, View] = {}
        self.macros: Dict[str, Macro] = {}


class Catalog:
    """One database's catalog (the default is named ``memory``)."""

    def __init__(self, name: str = "memory"):
        self.name = name
        self.schemas: Dict[str, Schema] = {"main": Schema("main")}

    def get_schema(self, name: str, missing_ok: bool = False) -> Optional[Schema]:
        s = self.schemas.get(name.lower())
        if s is None and not missing_ok:
            raise CatalogException(
                f'Schema with name {name} does not exist!')
        return s

    def create_schema(self, name: str, if_not_exists: bool = False):
        key = name.lower()
        if key in self.schemas:
            if if_not_exists:
                return
            raise CatalogException(f'Schema with name "{name}" already exists!')
        self.schemas[key] = Schema(name)

    def create_table(self, table: DataTable, or_replace: bool = False,
                     if_not_exists: bool = False):
        schema = self.get_schema(table.schema)
        key = table.name.lower()
        if key in schema.tables or key in schema.views:
            if or_replace:
                schema.tables.pop(key, None)
                schema.views.pop(key, None)
            elif if_not_exists:
                return
            else:
                raise CatalogException(
                    f'Table with name "{table.name}" already exists!')
        table.catalog = self.name
        schema.tables[key] = table

    def create_view(self, view: View, or_replace: bool = False):
        schema = self.get_schema(view.schema)
        key = view.name.lower()
        if key in schema.views or key in schema.tables:
            if not or_replace:
                raise CatalogException(
                    f'View with name "{view.name}" already exists!')
            schema.tables.pop(key, None)
        view.catalog = self.name
        schema.views[key] = view

    def create_macro(self, macro: Macro, or_replace: bool = False,
                     if_not_exists: bool = False):
        schema = self.get_schema(macro.schema)
        key = macro.name.lower()
        if key in schema.macros:
            if if_not_exists:
                return
            if not or_replace:
                raise CatalogException(
                    f'Macro with name "{macro.name}" already exists!')
        schema.macros[key] = macro

    def get_macro(self, name: str,
                  schema: Optional[str] = None) -> Optional[Macro]:
        if schema is not None:
            s = self.get_schema(schema, missing_ok=True)
            return s.macros.get(name.lower()) if s else None
        for s in self.schemas.values():
            m = s.macros.get(name.lower())
            if m is not None:
                return m
        return None

    def drop_macro(self, name: str, schema: str = "main",
                   if_exists: bool = False):
        s = self.get_schema(schema, missing_ok=True)
        if s is None or name.lower() not in s.macros:
            if if_exists:
                return
            raise CatalogException(
                f"Macro with name {name} does not exist!")
        del s.macros[name.lower()]

    def drop_table(self, name: str, schema: str = "main",
                   missing_ok: bool = False):
        s = self.get_schema(schema, missing_ok=missing_ok)
        if s is None:
            return
        if name.lower() not in s.tables:
            if missing_ok:
                return
            raise CatalogException(
                f'Table with name {name} does not exist!')
        del s.tables[name.lower()]

    def drop_view(self, name: str, schema: str = "main",
                  missing_ok: bool = False):
        s = self.get_schema(schema, missing_ok=missing_ok)
        if s is None:
            return
        if name.lower() not in s.views:
            if missing_ok:
                return
            raise CatalogException(
                f'View with name {name} does not exist!')
        del s.views[name.lower()]

    def get_table(self, name: str, schema: Optional[str] = None,
                  missing_ok: bool = False) -> Optional[DataTable]:
        for sname in ([schema] if schema else ["main"]):
            s = self.schemas.get(sname.lower())
            if s is None:
                continue
            t = s.tables.get(name.lower())
            if t is not None:
                return t
        if missing_ok:
            return None
        raise CatalogException(
            f'Table with name {name} does not exist!\n'
            f'Did you mean to query a different table?')

    def get_view(self, name: str, schema: Optional[str] = None) -> Optional[View]:
        for sname in ([schema] if schema else ["main"]):
            s = self.schemas.get(sname.lower())
            if s is None:
                continue
            v = s.views.get(name.lower())
            if v is not None:
                return v
        return None

    def list_tables(self) -> List[DataTable]:
        out = []
        for s in self.schemas.values():
            out.extend(s.tables.values())
        return out
