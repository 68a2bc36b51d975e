"""Query result: named columns + row accessors."""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

from ..storage.vector import Vector
from ..types import LogicalType, value_to_string


class QueryResult:
    def __init__(self, names: List[str], columns: List[Vector]):
        self.names = names
        self.columns = columns

    @property
    def row_count(self) -> int:
        return len(self.columns[0]) if self.columns else 0

    @property
    def types(self) -> List[LogicalType]:
        return [c.type for c in self.columns]

    def fetchall(self) -> List[Tuple[Any, ...]]:
        n = self.row_count
        return [tuple(c.value(i) for c in self.columns) for i in range(n)]

    def fetchone(self) -> Optional[Tuple[Any, ...]]:
        if self.row_count == 0:
            return None
        return tuple(c.value(0) for c in self.columns)

    def fetchnumpy(self):
        """Column name -> numpy array (NULLs become NaN/None per dtype;
        the DuckDB Python convention)."""
        import numpy as np
        out = {}
        for name, c in zip(self.names, self.columns):
            if c.type.numpy_dtype() is object or not c.validity.all():
                out[name] = np.array([c.value(i) for i in range(len(c))],
                                     dtype=object)
            else:
                out[name] = c.data.copy()
        return out

    def fetchdf(self):
        """Result as a pandas DataFrame (duckdb .fetchdf()/.df())."""
        import pandas as pd
        return pd.DataFrame(self.fetchnumpy(), columns=list(self.names))

    df = fetchdf

    def arrow(self):
        """Result as a pyarrow Table."""
        import pyarrow as pa
        cols, names = [], []
        for name, c in zip(self.names, self.columns):
            names.append(name)
            cols.append(pa.array(
                [c.value(i) for i in range(len(c))]))
        return pa.table(cols, names=names)

    def rows_as_strings(self) -> List[List[str]]:
        """Rows rendered with the engine's text formatting (NULL for nulls)."""
        out = []
        for i in range(self.row_count):
            row = []
            for c in self.columns:
                v = c.value(i)
                row.append("NULL" if v is None else value_to_string(v, c.type))
            out.append(row)
        return out

    def __repr__(self):
        head = " | ".join(self.names)
        lines = [head, "-" * len(head)]
        for row in self.rows_as_strings()[:20]:
            lines.append(" | ".join(row))
        if self.row_count > 20:
            lines.append(f"... ({self.row_count} rows)")
        return "\n".join(lines)


EMPTY_RESULT = QueryResult([], [])
