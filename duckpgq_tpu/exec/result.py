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
