"""Property-graph DDL: CREATE/DROP/DESCRIBE/SUMMARIZE PROPERTY GRAPH.

Validation mirrors the reference's bind phase (reference
src/core/functions/table/create_property_graph.cpp): tables exist and are not
views, property/discriminator/key columns exist, conflict handling
ERROR/IGNORE/REPLACE, and the registry persists into ``__duckpgq_internal``
(reference duckpgq_state.cpp:7-28, create_property_graph.cpp:323-449).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..errors import BinderException, CatalogException, InvalidException
from ..exec.result import QueryResult
from ..storage.table import ColumnDefinition, DataTable
from ..storage.vector import Vector
from ..types import BIGINT, BOOLEAN, DOUBLE, LIST, VARCHAR, TypeId
from .ast import CreatePropertyGraphInfo, DropPropertyGraphInfo, \
    PropertyGraphTable


def _ensure_internal_table(executor):
    catalog = executor.connection.catalog
    if catalog.get_table("__duckpgq_internal", missing_ok=True) is not None:
        return catalog.get_table("__duckpgq_internal")
    cols = [
        ColumnDefinition("property_graph", VARCHAR),
        ColumnDefinition("table_name", VARCHAR),
        ColumnDefinition("label", VARCHAR),
        ColumnDefinition("is_vertex_table", BOOLEAN),
        ColumnDefinition("source_table", VARCHAR),
        ColumnDefinition("source_pk", LIST(VARCHAR)),
        ColumnDefinition("source_fk", LIST(VARCHAR)),
        ColumnDefinition("destination_table", VARCHAR),
        ColumnDefinition("destination_pk", LIST(VARCHAR)),
        ColumnDefinition("destination_fk", LIST(VARCHAR)),
        ColumnDefinition("discriminator", VARCHAR),
        ColumnDefinition("sub_labels", LIST(VARCHAR)),
        ColumnDefinition("catalog", VARCHAR),
        ColumnDefinition("schema", VARCHAR),
        ColumnDefinition("source_catalog", VARCHAR),
        ColumnDefinition("source_schema", VARCHAR),
        ColumnDefinition("destination_catalog", VARCHAR),
        ColumnDefinition("destination_schema", VARCHAR),
        ColumnDefinition("properties", LIST(VARCHAR)),
        ColumnDefinition("column_aliases", LIST(VARCHAR)),
    ]
    table = DataTable("__duckpgq_internal", cols)
    catalog.create_table(table)
    return table


def _resolve_table(executor, pg_table: PropertyGraphTable) -> DataTable:
    con = executor.connection
    # a two-part qualifier naming an attached database is catalog.table
    # (DuckDB name resolution; reference test/sql/create_pg/attach_pg.test)
    if (not pg_table.catalog_name and pg_table.schema_name and
            pg_table.schema_name.lower() in con.database.attached):
        pg_table.catalog_name = pg_table.schema_name
        pg_table.schema_name = ""
    if pg_table.catalog_name:
        try:
            catalog = con.resolve_catalog(pg_table.catalog_name)
        except CatalogException:
            raise InvalidException(
                f"Catalog '{pg_table.catalog_name}' does not exist!")
    else:
        catalog = con.catalog
    schemas = executor.schema_search_order(pg_table.schema_name or None)
    for sch in schemas:
        view = catalog.get_view(pg_table.table_name, sch)
        if view is not None:
            # reference create_property_graph.cpp:230-234
            raise InvalidException(
                f"Found a view with name {pg_table.table_name}. Creating "
                f"property graph tables over views is currently not "
                f"supported.")
    table = None
    for sch in schemas:
        table = catalog.get_table(pg_table.table_name, sch, missing_ok=True)
        if table is not None:
            break
    if table is None and not pg_table.catalog_name:
        table = con.find_table_any_catalog(
            pg_table.table_name, pg_table.schema_name or None, None)
    if table is None:
        raise InvalidException(
            f"Table with name {pg_table.table_name} does not exist")
    return table


def _validate_columns(pg_table: PropertyGraphTable, table: DataTable):
    if pg_table.no_columns:
        pass
    elif pg_table.all_columns:
        for col in pg_table.except_columns:
            if not table.has_column(col):
                raise InvalidException(
                    f"Except column {col} not found in table "
                    f"{pg_table.table_name}")
    else:
        for col in pg_table.column_names:
            if not table.has_column(col):
                raise InvalidException(
                    f"Column {col} not found in table {pg_table.table_name}")
    if pg_table.discriminator:
        idx = table.column_index(pg_table.discriminator)
        if idx is None:
            raise InvalidException(
                f"The discriminator column {pg_table.discriminator} "
                f"not found in table {pg_table.table_name}")
        ctype = table.column_defs[idx].type
        if ctype.id not in (TypeId.INTEGER, TypeId.BIGINT):
            raise InvalidException(
                f"The discriminator column {pg_table.discriminator} "
                f"of table {pg_table.table_name} has to be of type INTEGER "
                f"or BIGINT")


def _discover_keys(executor, edge: PropertyGraphTable, edge_table: DataTable,
                   key_type: str, ref: str, pks: List[str], fks: List[str]):
    """FK-constraint key discovery (reference
    create_property_graph.cpp:104-154 ValidateKeys): when no explicit keys
    were given, find exactly one FK constraint on the edge table referencing
    ``ref``; zero with no constraints at all / ambiguity / partial => the
    reference's exact errors."""
    if fks or pks:
        return pks, fks
    constraints = edge_table.constraints
    if not constraints:
        raise InvalidException(
            f"No primary key - foreign key relationship found in "
            f"{edge.table_name} with {key_type.upper()} table {ref}")
    found_pk: List[str] = []
    found_fk: List[str] = []
    for c in constraints:
        if c[0] != "fk":
            continue
        _, fk_cols, ref_table, pk_cols = c
        if ref_table.lower() != ref.lower():
            continue
        if found_pk and found_fk:
            raise InvalidException(
                f"Multiple primary key - foreign key relationships "
                f"detected between {edge.table_name} and {ref}. "
                f"Please explicitly define the primary key and "
                f"foreign key columns using `{key_type.upper()}"
                f" KEY <primary key> REFERENCES {ref} <foreign key>`")
        found_pk = list(pk_cols)
        found_fk = list(fk_cols)
    if found_fk and not found_pk:
        # bare REFERENCES <table>: resolve the referenced table's PRIMARY KEY
        cat = executor.connection.catalog
        for sch in executor.schema_search_order(None):
            rt = cat.get_table(ref, sch, missing_ok=True)
            if rt is not None:
                for c in rt.constraints:
                    if c[0] == "pk":
                        found_pk = list(c[1])
                        break
                break
    if not found_pk:
        raise InvalidException(
            f"The primary key for the {key_type.upper()} table {ref} is "
            f"not defined in the edge table {edge.table_name}")
    if not found_fk:
        raise InvalidException(
            f"The foreign key for the {key_type.upper()} table {ref} is "
            f"not defined in the edge table {edge.table_name}")
    return found_pk, found_fk


def _validate_keys(executor, edge: PropertyGraphTable,
                   info: CreatePropertyGraphInfo):
    edge_table = _resolve_table(executor, edge)
    edge.source_pk, edge.source_fk = _discover_keys(
        executor, edge, edge_table, "source", edge.source_reference,
        edge.source_pk, edge.source_fk)
    edge.destination_pk, edge.destination_fk = _discover_keys(
        executor, edge, edge_table, "destination", edge.destination_reference,
        edge.destination_pk, edge.destination_fk)
    for key_type, pks, fks, ref in (
            ("source", edge.source_pk, edge.source_fk, edge.source_reference),
            ("destination", edge.destination_pk, edge.destination_fk,
             edge.destination_reference)):
        # referenced vertex table must be registered; a qualified reference
        # must match the vertex table's registered qualifier (reference
        # test/sql/create_pg/attach_pg.test: references
        # nonexistingschema.account fails against bluesky.account)
        ref_schema = (edge.source_schema if key_type == "source"
                      else edge.destination_schema) or ""
        ref_catalog = (edge.source_catalog if key_type == "source"
                       else edge.destination_catalog) or ""
        vt = None
        for v in info.vertex_tables:
            name_hit = (v.table_name.lower() == ref.lower() or
                        (v.table_name_alias and
                         v.table_name_alias.lower() == ref.lower()))
            if not name_hit:
                continue
            if ref_schema or ref_catalog:
                qualifiers = {q.lower() for q in
                              (v.schema_name, v.catalog_name, "main") if q}
                wanted = {q.lower() for q in (ref_schema, ref_catalog) if q}
                if not wanted.issubset(qualifiers):
                    continue
            vt = v
            break
        if vt is None:
            if ref_schema or ref_catalog:
                qualified = ".".join(
                    p for p in (ref_catalog, ref_schema, ref) if p)
                raise InvalidException(
                    f"Table '{qualified}' not found in the property graph "
                    f"{info.property_graph_name}.")
            # reference: an unlinked source/destination reference throws via
            # GetTableByName (ThrowMissingVertexReference ->
            # create_property_graph_info.hpp:138-142)
            raise InvalidException(
                f"Table '{ref}' not found in the property graph "
                f"{info.property_graph_name}.")
        ref_table = _resolve_table(executor, vt)
        for pk in pks:
            if not ref_table.has_column(pk):
                raise InvalidException(
                    f"Primary key {pk} does not exist in table "
                    f"{vt.table_name}")
        for fk in fks:
            if not edge_table.has_column(fk):
                raise InvalidException(
                    f"Foreign key {fk} does not exist in table "
                    f"{edge.table_name}")
        if key_type == "source":
            edge.source_pg_table = vt
        else:
            edge.destination_pg_table = vt


def execute_create_property_graph(executor, info: CreatePropertyGraphInfo
                                  ) -> QueryResult:
    con = executor.connection
    key = info.property_graph_name.lower()
    existing = con.registered_property_graphs.get(key)
    if existing is not None:
        if info.on_conflict == "IGNORE":
            return QueryResult([], [])
        if info.on_conflict == "ERROR":
            # reference create_property_graph.cpp:213
            raise InvalidException(
                f"Property graph table with name "
                f"{info.property_graph_name} already exists")
    # validate all member tables
    for vt in info.vertex_tables:
        table = _resolve_table(executor, vt)
        _validate_columns(vt, table)
    for et in info.edge_tables:
        table = _resolve_table(executor, et)
        _validate_columns(et, table)
        _validate_keys(executor, et, info)
    con.registered_property_graphs[key] = info
    _persist(executor, info)
    return QueryResult([], [])


def execute_drop_property_graph(executor, info: DropPropertyGraphInfo
                                ) -> QueryResult:
    con = executor.connection
    key = info.property_graph_name.lower()
    if key not in con.registered_property_graphs:
        if info.missing_ok:
            return QueryResult([], [])
        # reference drop_property_graph.cpp:45 (BinderException)
        raise BinderException(
            f"Property graph {info.property_graph_name} does not exist.")
    del con.registered_property_graphs[key]
    internal = con.catalog.get_table("__duckpgq_internal", missing_ok=True)
    if internal is not None and internal.row_count:
        col = internal.get_column("property_graph")
        mask = np.array([str(col.value(i)).lower() == key
                         for i in range(internal.row_count)])
        internal.delete_rows(mask)
    return QueryResult([], [])


def _persist(executor, info: CreatePropertyGraphInfo):
    internal = _ensure_internal_table(executor)
    # REPLACE: drop previous rows for this graph
    if internal.row_count:
        col = internal.get_column("property_graph")
        key = info.property_graph_name.lower()
        mask = np.array([str(col.value(i)).lower() == key
                         for i in range(internal.row_count)])
        if mask.any():
            internal.delete_rows(mask)
    rows = []
    for t in info.all_tables():
        props = None
        if not t.all_columns and not t.no_columns:
            props = list(t.column_names)
        aliases = [t.column_aliases.get(c, c) for c in t.column_names] \
            if t.column_aliases else None
        rows.append([
            info.property_graph_name, t.table_name, t.main_label,
            t.is_vertex_table,
            t.source_reference or None,
            t.source_pk or None, t.source_fk or None,
            t.destination_reference or None,
            t.destination_pk or None, t.destination_fk or None,
            t.discriminator or None, t.sub_labels or None,
            t.catalog_name or None, t.schema_name or "",
            t.source_catalog or None, t.source_schema or None,
            t.destination_catalog or None, t.destination_schema or None,
            props, aliases,
        ])
    cols = []
    for j, cdef in enumerate(internal.column_defs):
        cols.append(Vector.from_values([r[j] for r in rows], cdef.type))
    internal.append(cols)


def execute_describe_property_graph(executor, name: str) -> QueryResult:
    con = executor.connection
    info = con.registered_property_graphs.get(name.lower())
    if info is None:
        # reference describe_property_graph.cpp:31 (trailing period)
        raise InvalidException(f"Property graph {name} does not exist.")
    names = ["property_graph", "table_name", "label", "is_vertex_table",
             "source_table", "source_pk", "source_fk", "destination_table",
             "destination_pk", "destination_fk", "discriminator",
             "sub_labels", "catalog", "schema"]
    rows = []
    for t in info.all_tables():
        if t.is_vertex_table:
            rows.append([info.property_graph_name, t.table_name, t.main_label,
                         1, None, None, None, None, None, None,
                         t.discriminator or None, t.sub_labels or None,
                         t.catalog_name or None, t.schema_name or ""])
        else:
            rows.append([info.property_graph_name, t.table_name, t.main_label,
                         0, t.source_reference, t.source_pk, t.source_fk,
                         t.destination_reference, t.destination_pk,
                         t.destination_fk,
                         t.discriminator or None, t.sub_labels or None,
                         t.catalog_name or None, t.schema_name or ""])
    types = [VARCHAR, VARCHAR, VARCHAR, BIGINT, VARCHAR, LIST(VARCHAR),
             LIST(VARCHAR), VARCHAR, LIST(VARCHAR), LIST(VARCHAR), VARCHAR,
             LIST(VARCHAR), VARCHAR, VARCHAR]
    cols = [Vector.from_values([r[j] for r in rows], types[j])
            for j in range(len(names))]
    return QueryResult(names, cols)


def _summarize_vertex_sql(t) -> str:
    from .transpiler import _tref_sql
    null_cols = ["source_table", "destination_table"]
    head = (f"SELECT '{t.table_name}' AS table_name, "
            f"true AS is_vertex_table, NULL AS source_table, "
            f"NULL AS destination_table, count(*) AS vertex_count")
    rest = ["edge_count", "unique_source_count", "unique_destination_count",
            "isolated_sources", "isolated_destinations",
            "avg_in_degree", "min_in_degree", "max_in_degree",
            "q25_in_degree", "q50_in_degree", "q75_in_degree",
            "avg_out_degree", "min_out_degree", "max_out_degree",
            "q25_out_degree", "q50_out_degree", "q75_out_degree"]
    nulls = ", ".join(f"NULL AS {c}" for c in rest)
    return f"{head}, {nulls} FROM {_tref_sql(t, 'vertex_table')}"


def _summarize_degree_cte(t, fk: str, is_in: bool) -> str:
    from .transpiler import _q, _tref_sql
    d = "in_degree" if is_in else "out_degree"
    return (f"SELECT avg({_q(d)}) AS avg_{d}, min({_q(d)}) AS min_{d}, "
            f"max({_q(d)}) AS max_{d}, "
            f"approx_quantile({_q(d)}, 0.25) AS q25_{d}, "
            f"approx_quantile({_q(d)}, 0.5) AS q50_{d}, "
            f"approx_quantile({_q(d)}, 0.75) AS q75_{d} FROM ("
            f"SELECT {_q(fk)}, count(*) AS {_q(d)} FROM "
            f"{_tref_sql(t, 'degree_source')} GROUP BY {_q(fk)}) "
            f"AS degree_groups")


def _summarize_isolated_sql(t, is_source: bool) -> str:
    from .transpiler import _col_sql, _q, _tref_sql
    ref = t.source_reference if is_source else t.destination_reference
    pk = t.source_pk[0] if is_source else t.destination_pk[0]
    fk = t.source_fk[0] if is_source else t.destination_fk[0]
    vt = t.source_pg_table if is_source else t.destination_pg_table
    return (f"(SELECT count({_col_sql(pk, 'vertex_table')}) FROM "
            f"{_tref_sql(vt, 'vertex_table')} LEFT JOIN "
            f"{_tref_sql(t, 'edge_table')} ON "
            f"{_col_sql(pk, 'vertex_table')} = {_col_sql(fk, 'edge_table')} "
            f"WHERE {_col_sql(fk, 'edge_table')} IS NULL)")


def _summarize_edge_sql(t) -> str:
    from .transpiler import _col_sql, _q, _tref_sql
    stats_in = ", ".join(f"(SELECT {c}_in_degree FROM in_degrees) AS "
                         f"{c}_in_degree"
                         for c in ("avg", "min", "max", "q25", "q50", "q75"))
    stats_out = ", ".join(f"(SELECT {c}_out_degree FROM out_degrees) AS "
                          f"{c}_out_degree"
                          for c in ("avg", "min", "max", "q25", "q50", "q75"))
    # reference quirk: the qXX scalars are named qXX_* already in the CTE
    stats_in = stats_in.replace("avg_in_degree FROM", "avg_in_degree FROM") \

    return (
        f"WITH in_degrees AS "
        f"({_summarize_degree_cte(t, t.destination_fk[0], True)}), "
        f"out_degrees AS "
        f"({_summarize_degree_cte(t, t.source_fk[0], False)}) "
        f"SELECT '{t.table_name}' AS table_name, "
        f"false AS is_vertex_table, "
        f"'{t.source_reference}' AS source_table, "
        f"'{t.destination_reference}' AS destination_table, "
        f"NULL AS vertex_count, count(*) AS edge_count, "
        f"(SELECT count(DISTINCT {_col_sql(t.source_fk[0], 'edge_count')}) "
        f"FROM {_tref_sql(t, 'edge_count')}) AS unique_source_count, "
        f"(SELECT count(DISTINCT "
        f"{_col_sql(t.destination_fk[0], 'edge_count')}) FROM "
        f"{_tref_sql(t, 'edge_count')}) AS unique_destination_count, "
        f"{_summarize_isolated_sql(t, True)} AS isolated_sources, "
        f"{_summarize_isolated_sql(t, False)} AS isolated_destinations, "
        f"{stats_in}, {stats_out} FROM {_tref_sql(t, 'edge_table')}")


def summarize_property_graph_statement(executor, name: str):
    """Build the UNION ALL summarize statement (mirrors reference
    summarize_property_graph.cpp:100-274)."""
    from ..sql.parser import Parser
    con = executor.connection
    info = con.registered_property_graphs.get(name.lower())
    if info is None:
        # reference duckpgq_state.cpp:175 (BinderException, no period)
        raise BinderException(f"Property graph {name} does not exist")
    parts = []
    for t in info.vertex_tables:
        parts.append("(" + _summarize_vertex_sql(t) + ")")
    for t in info.edge_tables:
        if getattr(t, "source_pg_table", None) is None:
            for v in info.vertex_tables:
                if v.table_name.lower() == t.source_reference.lower():
                    t.source_pg_table = v
                if v.table_name.lower() == t.destination_reference.lower():
                    t.destination_pg_table = v
        parts.append("(" + _summarize_edge_sql(t) + ")")
    sql = " UNION ALL ".join(parts)
    return Parser(sql).parse_statements()[0]


def execute_summarize_property_graph(executor, name: str) -> QueryResult:
    stmt = summarize_property_graph_statement(executor, name)
    return executor.execute_select(stmt)
