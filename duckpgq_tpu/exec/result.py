"""Query result: named columns + row accessors.

``fetchall``/``fetchone`` return TYPED Python values, matching what the
reference host's Python client yields (DATE -> datetime.date, TIMESTAMP ->
datetime.datetime, TIMESTAMP_TZ tz-aware, TIME -> datetime.time, INTERVAL ->
Interval, DECIMAL -> decimal.Decimal, STRUCT/MAP -> dict, LIST -> list).
Pass raw=True (or use the column Vectors directly) for the engine's internal
representations (epoch-day/epoch-micro ints, scaled decimal ints, tuples) —
the sqllogictest runner renders through rows_as_strings, which is
representation-level and unaffected.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Any, List, Optional, Tuple

from ..storage.vector import Vector
from ..types import Interval, LogicalType, TypeId, value_to_string

_EPOCH_D = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)
_EPOCH_UTC = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)

_TS_TO_MICROS = {TypeId.TIMESTAMP: 1, TypeId.TIMESTAMP_MS: 1_000,
                 TypeId.TIMESTAMP_S: 1_000_000}

# types whose raw representation already IS the client value
_PASSTHROUGH = {TypeId.BOOLEAN, TypeId.TINYINT, TypeId.SMALLINT,
                TypeId.INTEGER, TypeId.BIGINT, TypeId.HUGEINT,
                TypeId.UTINYINT, TypeId.USMALLINT, TypeId.UINTEGER,
                TypeId.UBIGINT, TypeId.FLOAT, TypeId.DOUBLE,
                TypeId.VARCHAR, TypeId.BLOB, TypeId.SQLNULL,
                TypeId.JSON, TypeId.BIT, TypeId.ENUM}


def _needs_typing(t: LogicalType) -> bool:
    if t.id in _PASSTHROUGH:
        return False
    if t.id == TypeId.LIST:
        return t.child is None or _needs_typing(t.child)
    return True


def typed_value(v, t: LogicalType):
    """Raw engine value -> typed Python client value (None passes)."""
    if v is None:
        return None
    tid = t.id
    if tid in _PASSTHROUGH:
        return v
    if tid == TypeId.DECIMAL:
        return decimal.Decimal(int(v)).scaleb(-t.scale)
    if tid == TypeId.DATE:
        try:
            return _EPOCH_D + datetime.timedelta(days=int(v))
        except OverflowError:
            return v                      # out of datetime range: raw
    if tid == TypeId.TIME:
        us = int(v)
        secs, frac = divmod(us, 1_000_000)
        hh, rest = divmod(secs, 3600)
        mm, ss = divmod(rest, 60)
        return datetime.time(hh % 24, mm, ss, frac)
    if tid in _TS_TO_MICROS:
        try:
            return _EPOCH_DT + datetime.timedelta(
                microseconds=int(v) * _TS_TO_MICROS[tid])
        except OverflowError:
            return v
    if tid == TypeId.TIMESTAMP_NS:
        try:
            return _EPOCH_DT + datetime.timedelta(microseconds=int(v) // 1000)
        except OverflowError:
            return v
    if tid == TypeId.TIMESTAMP_TZ:
        try:
            return _EPOCH_UTC + datetime.timedelta(microseconds=int(v))
        except OverflowError:
            return v
    if tid == TypeId.INTERVAL:
        from ..types import interval_parts
        return Interval(*interval_parts(v))
    if tid == TypeId.LIST:
        child = t.child
        return [typed_value(x, child) if child is not None else x
                for x in v]
    if tid == TypeId.STRUCT:
        if t.fields and all(not nm for nm, _ in t.fields):
            # unnamed struct (row(...)): tuple, like the host client
            return tuple(typed_value(x, ft)
                         for (_, ft), x in zip(t.fields, v))
        return {nm: typed_value(x, ft)
                for (nm, ft), x in zip(t.fields or (), v)}
    if tid == TypeId.MAP:
        kt, vt = t.fields[0][1], t.fields[1][1]
        return {typed_value(k, kt): typed_value(x, vt)
                for k, x in v.items()}
    return v


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

    def fetchall(self, raw: bool = False) -> List[Tuple[Any, ...]]:
        n = self.row_count
        if raw or not any(_needs_typing(c.type) for c in self.columns):
            return [tuple(c.value(i) for c in self.columns)
                    for i in range(n)]
        conv = [(_needs_typing(c.type), c.type) for c in self.columns]
        return [tuple(typed_value(c.value(i), t) if need else c.value(i)
                      for c, (need, t) in zip(self.columns, conv))
                for i in range(n)]

    def fetchone(self, raw: bool = False) -> Optional[Tuple[Any, ...]]:
        if self.row_count == 0:
            return None
        if raw:
            return tuple(c.value(0) for c in self.columns)
        return tuple(typed_value(c.value(0), c.type) for c in self.columns)

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
