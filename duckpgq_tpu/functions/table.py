"""Table function registry: PGQ algorithm bind-replace functions,
CSR/property-graph introspection scans (reference
src/core/functions/table/pgq_scan.cpp), and general builtins
(range/generate_series, read_csv, read_parquet).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from ..errors import (BinderException, CatalogException, ConstraintException,
                      InvalidInputException)
from ..exec.relation import Relation
from ..sql import ast as a
from ..storage.vector import Vector
from ..types import BIGINT, DOUBLE, VARCHAR, UBIGINT


def arg_to_string(e: a.Expression) -> str:
    if isinstance(e, a.ColumnRef):
        return ".".join(e.parts)
    if isinstance(e, a.Constant):
        return str(e.value)
    raise BinderException("expected a constant or identifier argument")


def _arg_value(executor, e: a.Expression, outer, env):
    from ..exec.expression import Evaluator
    from ..exec.relation import Binding
    rel = Relation([Vector(BIGINT, np.zeros(1, dtype=np.int64))],
                   [Binding("", ["__row__"], [0], [True])])
    return Evaluator(executor, rel, outer).evaluate(e).value(0)


# ---------------------------------------------------------------------------

def execute_table_function(executor, ref: a.TableFunctionRef, outer, env
                           ) -> Relation:
    name = ref.name.lower()
    handler = REGISTRY.get(name)
    if handler is None:
        rel = _try_table_macro(executor, ref, outer, env, name)
        if rel is not None:
            return rel
        raise CatalogException(
            f"Table Function with name {name} does not exist!")
    return handler(executor, ref, outer, env)


def _try_table_macro(executor, ref, outer, env, name):
    """CREATE MACRO ... AS TABLE expansion: substitute the call's argument
    ASTs into the stored query and run it as a derived table."""
    con = getattr(executor, "connection", None)
    if con is None:
        return None
    macro = con.resolve_catalog(None).get_macro(name)
    if macro is None or macro.query is None:
        return None
    if len(ref.args) != len(macro.params):
        raise BinderException(
            f"Macro function '{macro.name}' requires "
            f"{len(macro.params)} positional arguments, but "
            f"{len(ref.args)} were provided")
    mapping = {dn: de for dn, de in macro.defaults}
    for p, arg in zip(macro.params, ref.args):
        mapping[p] = arg
    declared = {dn for dn, _ in macro.defaults}
    for kn, ke in getattr(ref, "kwargs", ()):
        if kn.lower() not in declared:
            raise BinderException(
                f'Invalid named parameter "{kn}" for macro {macro.name}')
        mapping[kn.lower()] = ke
    from ..sql.ast import substitute_refs
    stmt = substitute_refs(macro.query, mapping)
    res = executor.execute_select(stmt, outer, env)
    alias = ref.alias or macro.name
    names = list(res.names)
    if ref.column_aliases:
        names[:len(ref.column_aliases)] = list(ref.column_aliases)
    return Relation.from_columns(alias, names, res.columns,
                                 with_rowid=True)


def _bind_replace(bind_fn):
    """Wrap a (executor, args) -> (SelectStatement, default_alias) binder."""
    def handler(executor, ref, outer, env):
        stmt, default_alias = bind_fn(executor, ref.args)
        res = executor.execute_select(stmt, outer, env)
        alias = ref.alias or default_alias
        names = list(res.names)
        if ref.column_aliases:
            names[:len(ref.column_aliases)] = list(ref.column_aliases)
        return Relation.from_columns(alias, names, res.columns,
                                     with_rowid=True)
    return handler


_NAMED_PARAMS = {
    # table functions with named parameters (DuckDB read_csv options)
    "read_csv": {"header", "delim", "sep", "delimiter"},
    "read_csv_auto": {"header", "delim", "sep", "delimiter"},
}


def _relation_fn(fn):
    def handler(executor, ref, outer, env):
        args = [_arg_value(executor, x, outer, env) for x in ref.args]
        kwargs = {}
        for k, e in getattr(ref, "kwargs", ()):
            if k not in _NAMED_PARAMS.get(ref.name.lower(), ()):
                raise BinderException(
                    f'Invalid named parameter "{k}" for function '
                    f"{ref.name.lower()}")
            kwargs[k] = _arg_value(executor, e, outer, env)
        names, cols = fn(executor, args, kwargs) if kwargs else \
            fn(executor, args)
        alias = ref.alias or ref.name
        if ref.column_aliases:
            names = list(names)
            names[:len(ref.column_aliases)] = list(ref.column_aliases)
        return Relation.from_columns(alias, names, cols, with_rowid=True)
    return handler


# ---------------------------------------------------------------- builtins

def _fn_range(executor, args):
    if len(args) == 1:
        lo, hi, step = 0, int(args[0]), 1
    elif len(args) == 2:
        lo, hi, step = int(args[0]), int(args[1]), 1
    else:
        lo, hi, step = int(args[0]), int(args[1]), int(args[2])
    data = np.arange(lo, hi, step, dtype=np.int64)
    return ["range"], [Vector(BIGINT, data)]


def _fn_generate_series(executor, args):
    if len(args) == 1:
        lo, hi, step = 0, int(args[0]), 1
    elif len(args) == 2:
        lo, hi, step = int(args[0]), int(args[1]), 1
    else:
        lo, hi, step = int(args[0]), int(args[1]), int(args[2])
    data = np.arange(lo, hi + (1 if step > 0 else -1), step, dtype=np.int64)
    return ["generate_series"], [Vector(BIGINT, data)]


def _temporal_series(vecs, name, inclusive):
    """range/generate_series over DATE/TIMESTAMP bounds with an INTERVAL
    step (DuckDB: the series is TIMESTAMP-typed; range is end-exclusive,
    generate_series end-inclusive)."""
    from ..types import (TIMESTAMP, TypeId, interval_parts,
                         add_months_to_days)
    DAY_US = 86_400_000_000
    def to_us(v):
        if v.type.id == TypeId.DATE:
            return int(v.data[0]) * DAY_US
        if v.type.id == TypeId.TIMESTAMP_S:
            return int(v.data[0]) * 1_000_000
        if v.type.id == TypeId.TIMESTAMP_MS:
            return int(v.data[0]) * 1_000
        return int(v.data[0])
    start, stop = to_us(vecs[0]), to_us(vecs[1])
    months, days, micros = interval_parts(vecs[2].data[0])
    months, step_rest = int(months), int(days) * DAY_US + int(micros)
    if months == 0 and step_rest == 0:
        raise InvalidInputException(f"{name}: step size cannot be zero")
    ascending = months > 0 or (months == 0 and step_rest > 0)
    out = []
    cur = start
    k = 0
    while (cur < stop or (inclusive and cur == stop)) if ascending else \
            (cur > stop or (inclusive and cur == stop)):
        out.append(cur)
        k += 1
        if k >= 1 << 24:
            raise InvalidInputException(
                f"{name}: series exceeds the 16M-row cap")
        if months:
            # month stepping composes from the ORIGIN (DuckDB): Jan 31 +
            # 1 month repeatedly gives Feb 29, Mar 31, ... not Feb 29,
            # Mar 29
            d0, tod0 = divmod(start, DAY_US)
            cur = int(add_months_to_days(np.int64(d0),
                                         np.int64(months * k))) * DAY_US \
                + tod0 + step_rest * k
        else:
            cur = start + step_rest * k
    return [name], [Vector(TIMESTAMP, np.array(out, dtype=np.int64))]


def _unnest_table_fn(executor, ref, outer, env):
    """FROM unnest(list) — one row per element; FROM unnest(struct) —
    one column per field (DuckDB table-function unnest)."""
    from ..exec.expression import Evaluator
    from ..exec.relation import Binding
    from ..types import TypeId, SQLNULL
    rel = Relation([Vector(BIGINT, np.zeros(1, dtype=np.int64))],
                   [Binding("", ["__row__"], [0], [True])])
    ev = Evaluator(executor, rel, outer)
    vecs = [ev.evaluate(x) for x in ref.args]
    if not vecs:
        raise BinderException("unnest requires an argument")
    alias = ref.alias or "unnest"
    if vecs[0].type.id == TypeId.STRUCT:
        sv = vecs[0]
        names = [nm for nm, _ in (sv.type.fields or ())]
        vals = sv.data[0] if sv.validity[0] else None
        cols = [Vector.from_values(
            [None if vals is None else vals[j]], ft)
            for j, (nm, ft) in enumerate(sv.type.fields or ())]
        if ref.column_aliases:
            names[:len(ref.column_aliases)] = list(ref.column_aliases)
        return Relation.from_columns(alias, names, cols, with_rowid=True)
    cols = []
    names = []
    ln = 0
    for k, v in enumerate(vecs):
        if v.type.id != TypeId.LIST and v.type.id != TypeId.SQLNULL:
            raise BinderException(
                f"UNNEST() can only be applied to lists, structs and "
                f"NULL, not {v.type}")
        elems = list(v.data[0]) if v.validity[0] and \
            v.data[0] is not None else []
        ln = max(ln, len(elems))
        child = v.type.child if v.type.id == TypeId.LIST and \
            v.type.child is not None else SQLNULL
        cols.append((elems, child))
        names.append("unnest" if len(vecs) == 1 else f"unnest_{k + 1}")
    out = [Vector.from_values(
        elems + [None] * (ln - len(elems)), child)
        for elems, child in cols]
    if ref.column_aliases:
        names[:len(ref.column_aliases)] = list(ref.column_aliases)
    return Relation.from_columns(alias, names, out, with_rowid=True)


def _series_handler(name, inclusive, int_fn):
    """Dispatch range/generate_series between the integer and the
    temporal forms by argument type."""
    def handler(executor, ref, outer, env):
        from ..exec.expression import Evaluator
        from ..exec.relation import Binding
        from ..types import TypeId
        rel = Relation([Vector(BIGINT, np.zeros(1, dtype=np.int64))],
                       [Binding("", ["__row__"], [0], [True])])
        ev = Evaluator(executor, rel, outer)
        vecs = [ev.evaluate(x) for x in ref.args]
        if len(vecs) == 3 and vecs[2].type.id == TypeId.INTERVAL:
            names, cols = _temporal_series(vecs, name, inclusive)
        else:
            names, cols = int_fn(executor,
                                 [v.value(0) for v in vecs])
        alias = ref.alias or name
        if ref.column_aliases:
            names = list(names)
            names[:len(ref.column_aliases)] = list(ref.column_aliases)
        return Relation.from_columns(alias, names, cols, with_rowid=True)
    return handler


def _fn_read_parquet(executor, args):
    from ..io.parquet import read_parquet
    path = executor.connection.database.resolve_path(str(args[0]))
    names, cols = read_parquet(path)
    return names, cols


def _fn_read_csv(executor, args, kwargs=None):
    from ..io.csv import read_csv
    kwargs = kwargs or {}
    path = executor.connection.database.resolve_path(str(args[0]))
    delim = str(kwargs.get("delim") or kwargs.get("sep") or
                kwargs.get("delimiter") or ",")
    header = kwargs.get("header")
    names, cols = read_csv(path, delimiter=delim,
                           header=None if header is None else bool(header))
    return names, cols


# -------------------------------------------------------- pgq introspection

def _csr(executor, csr_id: int):
    csr = executor.connection.csr_list.get(int(csr_id))
    if csr is None:
        # reference DuckPGQState::GetCSR (duckpgq_state.cpp:181-185)
        raise ConstraintException(f"CSR not found with ID {int(csr_id)}")
    return csr


def _fn_get_csr_v(executor, args):
    csr = _csr(executor, args[0])
    # reference layout is V+2 entries (padded, csr_creation.cpp:29-30); our
    # canonical offsets are [V+1] — expose the padded view for parity
    v = np.asarray(csr.v, dtype=np.int64)
    v = np.append(v, v[-1] if len(v) else 0)
    return ["csrv"], [Vector(BIGINT, v)]


def _fn_get_csr_e(executor, args):
    csr = _csr(executor, args[0])
    return ["csre"], [Vector(BIGINT, np.asarray(csr.e, dtype=np.int64))]


def _fn_get_csr_w(executor, args):
    csr = _csr(executor, args[0])
    if csr.w_double is not None:
        return ["csrw"], [Vector(DOUBLE, csr.w_double)]
    if csr.w is not None:
        return ["csrw"], [Vector(BIGINT, csr.w)]
    raise ConstraintException("No weights in CSR")


def _fn_get_csr_ptr(executor, args):
    # raw pointers are meaningless in this runtime; expose stable ids plus
    # the weight-type tag like the reference's scan (pgq_scan.cpp:44-82)
    csr = _csr(executor, args[0])
    if csr.w_double is not None:
        wtype = 2
    elif csr.w is not None:
        wtype = 1
    else:
        wtype = 0
    ptrs = [id(csr.v), id(csr.e), id(csr.edge_ids), wtype]
    return ["ptr"], [Vector(BIGINT, np.asarray(ptrs, dtype=np.int64))]


def _pg(executor, name: str):
    info = executor.connection.registered_property_graphs.get(
        str(name).lower())
    if info is None:
        raise InvalidInputException(f"Property graph {name} not found")
    return info


def _fn_get_pg_vtablenames(executor, args):
    info = _pg(executor, args[0])
    names = [t.table_name for t in info.vertex_tables]
    return ["table"], [Vector.from_values(names, VARCHAR)]


def _fn_get_pg_etablenames(executor, args):
    info = _pg(executor, args[0])
    names = [t.table_name for t in info.edge_tables]
    return ["table"], [Vector.from_values(names, VARCHAR)]


def _colnames(executor, info, table_name, is_vertex):
    for t in (info.vertex_tables if is_vertex else info.edge_tables):
        if t.table_name.lower() == str(table_name).lower():
            from ..pgq.ddl import _resolve_table
            data_table = _resolve_table(executor, t)
            if t.no_columns:
                return []
            if t.all_columns:
                excl = {c.lower() for c in t.except_columns}
                return [c for c in data_table.column_names
                        if c.lower() not in excl]
            return list(t.column_names)
    raise InvalidInputException(f"Table {table_name} not found")


def _fn_get_pg_vcolnames(executor, args):
    info = _pg(executor, args[0])
    cols = _colnames(executor, info, args[1], True)
    return ["colnames"], [Vector.from_values(cols, VARCHAR)]


def _fn_get_pg_ecolnames(executor, args):
    info = _pg(executor, args[0])
    cols = _colnames(executor, info, args[1], False)
    return ["colnames"], [Vector.from_values(cols, VARCHAR)]


def _fn_describe_property_graph(executor, args):
    from ..pgq.ddl import execute_describe_property_graph
    res = execute_describe_property_graph(executor, arg_to_string_any(args))
    return res.names, res.columns


def arg_to_string_any(args):
    return str(args[0])


def _fn_duckdb_constraints(executor, args):
    """duckdb_constraints() system table function (constraint metadata the
    reference corpus inspects, e.g. test/sql/source_keyword.test)."""
    rows = []
    db = executor.connection.database
    for schema in db.catalog.schemas.values():
        for table in schema.tables.values():
            for c in table.constraints:
                if c[0] == "pk":
                    text = f"PRIMARY KEY({', '.join(c[1])})"
                    rows.append(["memory", schema.name, table.name,
                                 "PRIMARY KEY", text])
                elif c[0] == "fk":
                    _, fk_cols, ref, pk_cols = c
                    text = (f"FOREIGN KEY ({', '.join(fk_cols)}) REFERENCES "
                            f"{ref}({', '.join(pk_cols) if pk_cols else ''})")
                    rows.append(["memory", schema.name, table.name,
                                 "FOREIGN KEY", text])
            for cdef in table.column_defs:
                if cdef.not_null:
                    rows.append(["memory", schema.name, table.name,
                                 "NOT NULL", f"NOT NULL({cdef.name})"])
    names = ["database_name", "schema_name", "table_name",
             "constraint_type", "constraint_text"]
    cols = [Vector.from_values([r[j] for r in rows], VARCHAR)
            for j in range(5)]
    return names, cols


def _fn_duckdb_tables(executor, args):
    rows = []
    db = executor.connection.database
    for schema in db.catalog.schemas.values():
        for table in schema.tables.values():
            rows.append(["memory", schema.name, table.name,
                         len(table.column_defs), table.row_count,
                         getattr(table, "comment", None)])
    names = ["database_name", "schema_name", "table_name",
             "column_count", "estimated_size", "comment"]
    cols = [
        Vector.from_values([r[0] for r in rows], VARCHAR),
        Vector.from_values([r[1] for r in rows], VARCHAR),
        Vector.from_values([r[2] for r in rows], VARCHAR),
        Vector.from_values([r[3] for r in rows], BIGINT),
        Vector.from_values([r[4] for r in rows], BIGINT),
        Vector.from_values([r[5] for r in rows], VARCHAR),
    ]
    return names, cols


def _fn_duckdb_columns(executor, args):
    rows = []
    db = executor.connection.database
    for schema in db.catalog.schemas.values():
        for table in schema.tables.values():
            for i, cdef in enumerate(table.column_defs):
                rows.append(["memory", schema.name, table.name, cdef.name,
                             i, str(cdef.type)])
    names = ["database_name", "schema_name", "table_name", "column_name",
             "column_index", "data_type"]
    cols = [
        Vector.from_values([r[0] for r in rows], VARCHAR),
        Vector.from_values([r[1] for r in rows], VARCHAR),
        Vector.from_values([r[2] for r in rows], VARCHAR),
        Vector.from_values([r[3] for r in rows], VARCHAR),
        Vector.from_values([r[4] for r in rows], BIGINT),
        Vector.from_values([r[5] for r in rows], VARCHAR),
    ]
    return names, cols


def _fn_summarize_pg(executor, ref, outer, env):
    from ..pgq.ddl import summarize_property_graph_statement
    name = arg_to_string(ref.args[0])
    stmt = summarize_property_graph_statement(executor, name)
    res = executor.execute_select(stmt, outer, env)
    alias = ref.alias or "summarize"
    return Relation.from_columns(alias, res.names, res.columns,
                                 with_rowid=True)


def _fn_describe_pg(executor, ref, outer, env):
    from ..pgq.ddl import execute_describe_property_graph
    name = arg_to_string(ref.args[0])
    res = execute_describe_property_graph(executor, name)
    alias = ref.alias or "describe"
    return Relation.from_columns(alias, res.names, res.columns,
                                 with_rowid=True)


def _fn_duckdb_databases(executor, args):
    from ..types import BOOLEAN
    db = executor.connection.database
    rows = [[1000, "memory", None, False]]
    for i, name in enumerate(sorted(db.attached)):
        rows.append([1001 + i, name, name, False])
    return (["database_oid", "database_name", "path", "internal"],
            [Vector.from_values([r[0] for r in rows], BIGINT),
             Vector.from_values([r[1] for r in rows], VARCHAR),
             Vector.from_values([r[2] for r in rows], VARCHAR),
             Vector.from_values([r[3] for r in rows], BOOLEAN)])


def _register_all():
    from ..pgq import algorithms as alg
    registry: Dict[str, Callable] = {
        "pagerank": _bind_replace(alg.bind_pagerank),
        "weakly_connected_component": _bind_replace(
            alg.bind_weakly_connected_component),
        "local_clustering_coefficient": _bind_replace(
            alg.bind_local_clustering_coefficient),
        "unnest": _unnest_table_fn,
        "range": _series_handler("range", False, _fn_range),
        "generate_series": _series_handler("generate_series", True,
                                           _fn_generate_series),
        "read_parquet": _relation_fn(_fn_read_parquet),
        "parquet_scan": _relation_fn(_fn_read_parquet),
        "read_csv": _relation_fn(_fn_read_csv),
        "read_csv_auto": _relation_fn(_fn_read_csv),
        "get_csr_v": _relation_fn(_fn_get_csr_v),
        "get_csr_e": _relation_fn(_fn_get_csr_e),
        "get_csr_w": _relation_fn(_fn_get_csr_w),
        "get_csr_ptr": _relation_fn(_fn_get_csr_ptr),
        "get_pg_vtablenames": _relation_fn(_fn_get_pg_vtablenames),
        "get_pg_etablenames": _relation_fn(_fn_get_pg_etablenames),
        "get_pg_vcolnames": _relation_fn(_fn_get_pg_vcolnames),
        "get_pg_ecolnames": _relation_fn(_fn_get_pg_ecolnames),
        "duckdb_constraints": _relation_fn(_fn_duckdb_constraints),
        "duckdb_tables": _relation_fn(_fn_duckdb_tables),
        "duckdb_columns": _relation_fn(_fn_duckdb_columns),
        "summarize_property_graph": _fn_summarize_pg,
        "describe_property_graph": _fn_describe_pg,
        "duckdb_databases": _relation_fn(_fn_duckdb_databases),
        "duckdb_views": _relation_fn(_fn_duckdb_views),
        "duckdb_functions": _relation_fn(_fn_duckdb_functions),
        "duckdb_settings": _relation_fn(_fn_duckdb_settings),
        "duckdb_schemas": _relation_fn(_fn_duckdb_schemas),
        "duckdb_sequences": _relation_fn(_fn_duckdb_sequences),
        "pragma_table_info": _relation_fn(_fn_pragma_table_info),
        "pragma_version": _relation_fn(_fn_pragma_version),
        "pragma_database_size": _relation_fn(_fn_pragma_database_size),
    }
    return registry


def _fn_duckdb_views(executor, args):
    rows = []
    db = executor.connection.database
    for schema in db.catalog.schemas.values():
        for v in schema.views.values():
            rows.append(["memory", schema.name, v.name])
    names = ["database_name", "schema_name", "view_name"]
    return names, [Vector.from_values([r[j] for r in rows], VARCHAR)
                   for j in range(3)]


def _fn_duckdb_functions(executor, args):
    from . import scalar as _s, aggregate as _a
    rows = []
    for nm in sorted(_s.REGISTRY):
        rows.append(["memory", "main", nm, "scalar"])
    for nm in sorted(_a.REGISTRY):
        rows.append(["memory", "main", nm, "aggregate"])
    for nm in sorted(REGISTRY):
        rows.append(["memory", "main", nm, "table"])
    for cat in [executor.connection.database.catalog]:
        for schema in cat.schemas.values():
            for m in schema.macros.values():
                rows.append(["memory", schema.name, m.name,
                             "table_macro" if m.query is not None
                             else "macro"])
    names = ["database_name", "schema_name", "function_name",
             "function_type"]
    return names, [Vector.from_values([r[j] for r in rows], VARCHAR)
                   for j in range(4)]


def _fn_duckdb_settings(executor, args):
    settings = dict(executor.connection.settings)
    for k, v in (("threads", 1), ("memory_limit", "14.0 GiB")):
        settings.setdefault(k, v)
    names = ["name", "value", "description", "input_type", "scope"]
    keys = sorted(settings)
    return names, [
        Vector.from_values(keys, VARCHAR),
        Vector.from_values([str(settings[k]) for k in keys], VARCHAR),
        Vector.from_values(["" for _ in keys], VARCHAR),
        Vector.from_values(["VARCHAR" for _ in keys], VARCHAR),
        Vector.from_values(["GLOBAL" for _ in keys], VARCHAR),
    ]


def _fn_duckdb_schemas(executor, args):
    db = executor.connection.database
    rows = [["memory", s.name] for s in db.catalog.schemas.values()]
    names = ["database_name", "schema_name"]
    return names, [Vector.from_values([r[j] for r in rows], VARCHAR)
                   for j in range(2)]


def _fn_duckdb_sequences(executor, args):
    db = executor.connection.database
    rows = [["memory", "main", nm, seq["next"], seq["inc"]]
            for nm, seq in db.sequences.items()]
    names = ["database_name", "schema_name", "sequence_name",
             "last_value", "increment_by"]
    return names, [
        Vector.from_values([r[0] for r in rows], VARCHAR),
        Vector.from_values([r[1] for r in rows], VARCHAR),
        Vector.from_values([r[2] for r in rows], VARCHAR),
        Vector.from_values([r[3] for r in rows], BIGINT),
        Vector.from_values([r[4] for r in rows], BIGINT),
    ]


def _fn_pragma_table_info(executor, args):
    """pragma_table_info('t'): cid, name, type, notnull, dflt_value, pk
    (DuckDB/SQLite pragma shape)."""
    from ..types import BOOLEAN
    tname = str(args[0])
    table = executor.connection.resolve_catalog(None).get_table(tname,
                                                                None)
    pk = next((set(c.lower() for c in cons[1])
               for cons in getattr(table, "constraints", ())
               if cons and cons[0] == "pk"), set())
    names = ["cid", "name", "type", "notnull", "dflt_value", "pk"]
    cids, cnames, types, notn, dflt, pks = [], [], [], [], [], []
    for i, cdef in enumerate(table.column_defs):
        cids.append(i)
        cnames.append(cdef.name)
        types.append(str(cdef.type))
        notn.append(bool(cdef.not_null))
        dflt.append(None)
        pks.append(cdef.name.lower() in pk)
    return names, [
        Vector.from_values(cids, BIGINT),
        Vector.from_values(cnames, VARCHAR),
        Vector.from_values(types, VARCHAR),
        Vector.from_values(notn, BOOLEAN),
        Vector.from_values(dflt, VARCHAR),
        Vector.from_values(pks, BOOLEAN),
    ]


def _fn_pragma_version(executor, args):
    return (["library_version", "source_id"],
            [Vector.from_values(["v1.1.3"], VARCHAR),
             Vector.from_values(["duckpgq_tpu"], VARCHAR)])


def _fn_pragma_database_size(executor, args):
    db = executor.connection.database
    nbytes = 0
    for schema in db.catalog.schemas.values():
        for t in schema.tables.values():
            for c in t.columns:
                nbytes += getattr(c.data, "nbytes", 0)
    names = ["database_name", "database_size", "block_size",
             "total_blocks", "used_blocks", "free_blocks", "wal_size",
             "memory_usage", "memory_limit"]
    vals = ["memory", f"{nbytes} bytes", 0, 0, 0, 0, "0 bytes",
            f"{nbytes} bytes", "14.0 GiB"]
    return names, [
        Vector.from_values([vals[0]], VARCHAR),
        Vector.from_values([vals[1]], VARCHAR),
        Vector.from_values([vals[2]], BIGINT),
        Vector.from_values([vals[3]], BIGINT),
        Vector.from_values([vals[4]], BIGINT),
        Vector.from_values([vals[5]], BIGINT),
        Vector.from_values([vals[6]], VARCHAR),
        Vector.from_values([vals[7]], VARCHAR),
        Vector.from_values([vals[8]], VARCHAR),
    ]


REGISTRY = _register_all()
