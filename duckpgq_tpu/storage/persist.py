"""Durable database storage: open a path, CHECKPOINT writes it, reopening
restores it.

The reference persists property-graph metadata inside the user's database
file and reloads it lazily (reference duckpgq_state.cpp:7-28,34-160 via the
``__duckpgq_internal`` table); tables persist because DuckDB itself is
durable. This framework's durable format is a directory:

    <path>/
      catalog.json          # schemas, table defs (full type trees),
                            # constraints, property-graph registry
      data/<schema>.<table>.npz   # one column per entry (numpy, object
                            # columns pickled inside the npz)
      views.pkl             # view ASTs (present only if views exist)

``CHECKPOINT`` (or ``Database.checkpoint()``) saves; ``connect(path)``
restores when the directory exists. ``:memory:`` databases skip all of it.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Dict, List

import numpy as np

from ..types import LogicalType, TypeId
from .table import ColumnDefinition, DataTable
from .vector import Vector

FORMAT_VERSION = 1


# ---------------------------------------------------------------- type trees

def type_to_dict(t: LogicalType) -> dict:
    d: dict = {"id": t.id.value}
    if t.child is not None:
        d["child"] = type_to_dict(t.child)
    if t.fields is not None:
        d["fields"] = [[n, type_to_dict(ft)] for n, ft in t.fields]
    if t.width or t.scale:
        d["width"] = t.width
        d["scale"] = t.scale
    return d


def type_from_dict(d: dict) -> LogicalType:
    return LogicalType(
        TypeId(d["id"]),
        child=type_from_dict(d["child"]) if "child" in d else None,
        fields=tuple((n, type_from_dict(ft))
                     for n, ft in d["fields"]) if "fields" in d else None,
        width=d.get("width", 0), scale=d.get("scale", 0))


# ------------------------------------------------------------------ save

def save_database(db, path: str) -> None:
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    tables = []
    views = {}
    checks: dict = {}
    for schema in db.catalog.schemas.values():
        for table in schema.tables.values():
            if table.name.lower() == "__duckpgq_internal":
                continue  # rebuilt from the registry on load
            rel = f"{schema.name}.{table.name}.npz".replace(os.sep, "_")
            tables.append({
                "schema": schema.name, "name": table.name, "file": rel,
                "columns": [{"name": c.name, "type": type_to_dict(c.type),
                             "not_null": c.not_null}
                            for c in table.column_defs],
                # CHECK constraints carry expression ASTs -> pickled below
                "constraints": [list(c) for c in table.constraints
                                if not c or c[0] != "check"],
            })
            tchecks = [c for c in table.constraints
                       if c and c[0] == "check"]
            if tchecks:
                checks[f"{schema.name}.{table.name}"] = tchecks
            arrays = {}
            for i, vec in enumerate(table.columns):
                arrays[f"c{i}"] = vec.data
                arrays[f"v{i}"] = vec.validity
            np.savez(os.path.join(path, "data", rel), **arrays)
        for view in schema.views.values():
            views[f"{schema.name}.{view.name}"] = view
    macros = {}
    for schema in db.catalog.schemas.values():
        for macro in schema.macros.values():
            macros[f"{schema.name}.{macro.name}"] = macro
    registry = [_pg_to_dict(info)
                for info in db.registered_property_graphs.values()]
    catalog = {
        "format_version": FORMAT_VERSION,
        "schemas": [s.name for s in db.catalog.schemas.values()],
        "tables": tables,
        "property_graphs": registry,
    }
    with open(os.path.join(path, "catalog.json"), "w") as f:
        json.dump(catalog, f, indent=1)
    views_path = os.path.join(path, "views.pkl")
    if views:
        with open(views_path, "wb") as f:
            pickle.dump(views, f)
    elif os.path.exists(views_path):
        os.remove(views_path)
    macros_path = os.path.join(path, "macros.pkl")
    if macros:
        with open(macros_path, "wb") as f:
            pickle.dump(macros, f)
    elif os.path.exists(macros_path):
        os.remove(macros_path)
    checks_path = os.path.join(path, "checks.pkl")
    if checks:
        with open(checks_path, "wb") as f:
            pickle.dump(checks, f)
    elif os.path.exists(checks_path):
        os.remove(checks_path)


# ------------------------------------------------------------------ load

def load_database(db, path: str) -> None:
    with open(os.path.join(path, "catalog.json")) as f:
        catalog = json.load(f)
    if catalog.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"{path}: written by a newer duckpgq_tpu (format "
            f"{catalog['format_version']})")
    for name in catalog["schemas"]:
        db.catalog.create_schema(name, if_not_exists=True)
    for t in catalog["tables"]:
        cdefs = [ColumnDefinition(c["name"], type_from_dict(c["type"]),
                                  not_null=c.get("not_null", False))
                 for c in t["columns"]]
        table = DataTable(t["name"], cdefs, schema=t["schema"],
                          catalog=db.catalog.name)
        table.constraints = [tuple(c) for c in t.get("constraints", [])]
        with np.load(os.path.join(path, "data", t["file"]),
                     allow_pickle=True) as z:
            vectors = [Vector(cdefs[i].type, z[f"c{i}"], z[f"v{i}"])
                       for i in range(len(cdefs))]
        table.columns = vectors
        db.catalog.create_table(table, or_replace=True)
    views_path = os.path.join(path, "views.pkl")
    if os.path.exists(views_path):
        with open(views_path, "rb") as f:
            views = pickle.load(f)
        for view in views.values():
            db.catalog.create_view(view, or_replace=True)
    macros_path = os.path.join(path, "macros.pkl")
    if os.path.exists(macros_path):
        with open(macros_path, "rb") as f:
            macros = pickle.load(f)
        for macro in macros.values():
            db.catalog.create_macro(macro, or_replace=True)
    checks_path = os.path.join(path, "checks.pkl")
    if os.path.exists(checks_path):
        with open(checks_path, "rb") as f:
            checks = pickle.load(f)
        for key, tchecks in checks.items():
            sname, _, tname = key.partition(".")
            t = db.catalog.get_table(tname, sname, missing_ok=True)
            if t is not None:
                t.constraints = list(t.constraints) + list(tchecks)
    for d in catalog.get("property_graphs", []):
        info = _pg_from_dict(d)
        db.registered_property_graphs[
            info.property_graph_name.lower()] = info


# ----------------------------------------------- property-graph registry

def _pg_to_dict(info) -> dict:
    from ..pgq.ast import PropertyGraphTable

    def table_to_dict(t: PropertyGraphTable) -> dict:
        return dataclasses.asdict(t)

    return {
        "name": info.property_graph_name,
        "on_conflict": info.on_conflict,
        "vertex_tables": [table_to_dict(t) for t in info.vertex_tables],
        "edge_tables": [table_to_dict(t) for t in info.edge_tables],
    }


def _pg_from_dict(d: dict):
    from ..pgq.ast import CreatePropertyGraphInfo, PropertyGraphTable

    def table_from_dict(td: dict) -> PropertyGraphTable:
        return PropertyGraphTable(**td)

    info = CreatePropertyGraphInfo(
        property_graph_name=d["name"],
        vertex_tables=[table_from_dict(t) for t in d["vertex_tables"]],
        edge_tables=[table_from_dict(t) for t in d["edge_tables"]],
        on_conflict=d.get("on_conflict", "ERROR"))
    for t in info.vertex_tables + info.edge_tables:
        for label in t.all_labels():
            info.label_map[label.lower()] = t
    return info
