"""COPY statement execution: table/query <-> CSV/Parquet files."""

from __future__ import annotations

import os

from ..errors import BinderException, CatalogException, IOException, \
    NotImplementedException
from ..exec.result import QueryResult
from ..sql import ast as a
from ..storage.vector import Vector
from ..types import BIGINT


def _format_of(stmt: a.CopyStatement) -> str:
    fmt = str(stmt.options.get("FORMAT", "")).upper()
    if not fmt:
        ext = os.path.splitext(stmt.filename)[1].lower()
        fmt = {".parquet": "PARQUET", ".csv": "CSV", ".tsv": "CSV"}.get(
            ext, "CSV")
    return fmt


def execute_copy(executor, stmt: a.CopyStatement) -> QueryResult:
    con = executor.connection
    path = con.database.resolve_path(stmt.filename)
    fmt = _format_of(stmt)
    if stmt.is_from:
        table = con.catalog.get_table(stmt.table)
        if fmt == "PARQUET":
            from .parquet import read_parquet
            names, cols = read_parquet(path)
        else:
            from .csv import read_csv
            delim = str(stmt.options.get("DELIMITER",
                                         stmt.options.get("DELIM", ",")))
            names, cols = read_csv(path, delimiter=delim)
        # align by position against table schema, cast as needed
        from ..exec.cast import cast_vector
        if len(cols) != len(table.column_defs):
            # try aligning by name
            by_name = {n.lower(): c for n, c in zip(names, cols)}
            aligned = []
            for cdef in table.column_defs:
                c = by_name.get(cdef.name.lower())
                if c is None:
                    raise BinderException(
                        f"COPY column mismatch for table {table.name}")
                aligned.append(c)
            cols = aligned
        casted = []
        for cdef, c in zip(table.column_defs, cols):
            if c.type.id != cdef.type.id:
                c = cast_vector(c, cdef.type)
            casted.append(c)
        table.append(casted)
        con.database.invalidate_graph_caches(table.name)
        n = len(casted[0]) if casted else 0
        return QueryResult(["Count"], [Vector.from_values([n], BIGINT)])
    # COPY ... TO
    if stmt.query is not None:
        res = executor.execute_select(stmt.query)
    else:
        res = con.execute(f'SELECT * FROM "{stmt.table}"')
    if fmt == "PARQUET":
        from .parquet import write_parquet
        write_parquet(path, res.names, res.columns)
    else:
        from .csv import write_csv
        delim = str(stmt.options.get("DELIMITER",
                                     stmt.options.get("DELIM", ",")))
        hv = stmt.options.get("HEADER", True)
        # option values arrive as raw token text: 'false'/'0'/'off'
        # must disable (HEADER false previously coerced to True)
        header = hv if isinstance(hv, bool) else \
            str(hv).lower() not in ("false", "0", "off", "no")
        write_csv(path, res.names, res.columns, delimiter=delim,
                  header=header)
    return QueryResult(["Count"],
                       [Vector.from_values([res.row_count], BIGINT)])
