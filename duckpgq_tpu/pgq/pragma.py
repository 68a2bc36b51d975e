"""PGQ pragmas (reference src/core/pragma/): ``PRAGMA show_property_graphs``
and ``PRAGMA create_vertex_table(edge, src_col, dst_col, vname, idcol)``."""

from __future__ import annotations

from ..errors import BinderException
from ..exec.result import QueryResult
from ..sql import ast as a
from ..storage.vector import Vector
from ..types import VARCHAR


def execute_pragma(executor, stmt: a.PragmaStatement) -> QueryResult:
    name = stmt.name.lower()
    if name == "show_property_graphs":
        names = sorted({info.property_graph_name for info in
                        executor.connection.registered_property_graphs
                        .values()})
        return QueryResult(["property_graph"],
                           [Vector.from_values(names, VARCHAR)])
    if name == "create_vertex_table":
        from ..functions.table import arg_to_string
        if len(stmt.args) != 5:
            # DuckDB's overload-resolution error verbatim (the reference
            # registers a fixed 5xVARCHAR pragma signature —
            # create_vertex_table.test:44-50)
            arg_types = ", ".join(["VARCHAR"] * len(stmt.args))
            raise BinderException(
                f"No function matches the given name and argument types "
                f"'create_vertex_table({arg_types})'. You might need to add "
                f"explicit type casts.")
        edge_tbl = arg_to_string(stmt.args[0])
        src_col = arg_to_string(stmt.args[1])
        dst_col = arg_to_string(stmt.args[2])
        vname = arg_to_string(stmt.args[3])
        idcol = arg_to_string(stmt.args[4])
        sql = (f'CREATE TABLE "{vname}" AS SELECT DISTINCT "{idcol}" FROM ('
               f'SELECT "{src_col}" AS "{idcol}" FROM "{edge_tbl}" '
               f'UNION ALL SELECT "{dst_col}" AS "{idcol}" FROM "{edge_tbl}")')
        executor.connection.execute(sql)
        return QueryResult([], [])
    # unknown pragmas are accepted as no-ops (settings-style)
    return QueryResult([], [])
