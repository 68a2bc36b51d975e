"""Base table storage: an ordered set of named column vectors.

Row identifiers are implicit dense 0..N-1 positions (the reference leans on
DuckDB ``rowid`` this way throughout its transpiler, e.g. reference
src/core/functions/table/match.cpp:598-600); after deletes we re-densify, which
preserves the semantics the PGQ layer needs (CSR build keys on dense rowids).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..errors import BinderException, CatalogException, ConstraintException
from ..types import LogicalType
from .vector import Vector


class ColumnDefinition:
    __slots__ = ("name", "type", "not_null", "default", "comment")

    def __init__(self, name: str, typ: LogicalType, not_null: bool = False,
                 default=None, comment=None):
        self.name = name
        self.type = typ
        self.not_null = not_null
        self.default = default
        self.comment = comment


class DataTable:
    """In-memory columnar table."""

    def __init__(self, name: str, columns: Sequence[ColumnDefinition],
                 schema: str = "main", catalog: str = "memory"):
        self.name = name
        self.schema = schema
        self.catalog = catalog
        self.column_defs: List[ColumnDefinition] = list(columns)
        self.columns: List[Vector] = [Vector.empty(c.type) for c in columns]
        # version bumps on any mutation; used to invalidate cached CSRs
        self.version = 0
        # constraints (mirrors the catalog metadata the reference's FK-based
        # key discovery walks, create_property_graph.cpp:106-154):
        # ("pk", [cols]) and ("fk", [fk_cols], ref_table, [pk_cols])
        self.constraints: List[tuple] = []

    # -- lookups ------------------------------------------------------------
    @property
    def column_names(self) -> List[str]:
        return [c.name for c in self.column_defs]

    @property
    def column_types(self) -> List[LogicalType]:
        return [c.type for c in self.column_defs]

    def column_index(self, name: str) -> Optional[int]:
        lname = name.lower()
        for i, c in enumerate(self.column_defs):
            if c.name.lower() == lname:
                return i
        return None

    def has_column(self, name: str) -> bool:
        return self.column_index(name) is not None

    def get_column(self, name: str) -> Vector:
        idx = self.column_index(name)
        if idx is None:
            raise BinderException(
                f'Table "{self.name}" does not have a column named "{name}"')
        return self.columns[idx]

    @property
    def row_count(self) -> int:
        return len(self.columns[0]) if self.columns else 0

    # -- mutation -----------------------------------------------------------
    def append(self, vectors: Sequence[Vector]):
        if len(vectors) != len(self.columns):
            raise BinderException(
                f"table {self.name} has {len(self.columns)} columns but "
                f"{len(vectors)} values were supplied")
        for i, (dst, src) in enumerate(zip(self.columns, vectors)):
            cdef = self.column_defs[i]
            if cdef.not_null and not src.validity.all():
                raise ConstraintException(
                    f"NOT NULL constraint failed: {self.name}.{cdef.name}")
            self.columns[i] = Vector.concat([dst, src])
        self.version += 1

    def add_column(self, cdef: ColumnDefinition):
        if self.has_column(cdef.name):
            raise CatalogException(
                f'Column with name "{cdef.name}" already exists!')
        self.column_defs.append(cdef)
        n = self.row_count if self.columns else 0
        self.columns.append(Vector.constant(cdef.default, cdef.type, n))
        self.version += 1

    def drop_column(self, name: str):
        idx = self.column_index(name)
        if idx is None:
            raise CatalogException(
                f'Table "{self.name}" does not have a column with name "{name}"')
        del self.column_defs[idx]
        del self.columns[idx]
        self.version += 1

    def rename_column(self, old: str, new: str):
        idx = self.column_index(old)
        if idx is None:
            raise CatalogException(
                f'Table "{self.name}" does not have a column with name "{old}"')
        self.column_defs[idx].name = new
        self.version += 1

    def delete_rows(self, mask: np.ndarray):
        keep = ~mask
        self.columns = [c.filter(keep) for c in self.columns]
        self.version += 1

    def update_column(self, idx: int, vector: Vector):
        self.columns[idx] = vector
        self.version += 1
