"""SQL/PGQ metadata and MATCH AST.

Capability-equivalent to the reference's parsed AST layer (reference
src/parser/ and src/include/duckpgq/parser/: PathElement, SubPath, PathPattern,
MatchExpression, PropertyGraphTable, CreatePropertyGraphInfo) including the
label-lookup semantics with Levenshtein "did you mean" suggestions (reference
src/include/duckpgq/parser/parsed_data/create_property_graph_info.hpp:146-212).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Optional, Tuple

from ..errors import ConstraintException, InvalidException


class PGQMatchType(Enum):
    MATCH_VERTEX = "vertex"
    MATCH_EDGE_ANY = "-"
    MATCH_EDGE_LEFT = "<-"
    MATCH_EDGE_RIGHT = "->"
    MATCH_EDGE_LEFT_RIGHT = "<->"


class PGQPathMode(Enum):
    NONE = 0
    WALK = 1
    SIMPLE = 2
    TRAIL = 3
    ACYCLIC = 4


class PathReference:
    """Base of the path AST (PATH_ELEMENT or SUBPATH)."""


@dataclass
class PathElement(PathReference):
    match_type: PGQMatchType = PGQMatchType.MATCH_VERTEX
    label: str = ""
    variable_binding: str = ""


@dataclass
class SubPath(PathReference):
    path_list: List[PathReference] = field(default_factory=list)
    where_clause: object = None      # sql.ast.Expression
    path_mode: PGQPathMode = PGQPathMode.NONE   # parser sets modes on the
    # pattern; a subpath-level mode only appears via explicit quantifier
    # parens (not in the reference grammar either — pgq.gram:1-69)
    lower: int = 1
    upper: int = 1
    single_bind: bool = False        # wraps one element only (per-element WHERE)
    path_variable: str = ""


@dataclass
class PathPattern:
    path_elements: List[PathReference] = field(default_factory=list)
    all: bool = False            # ALL SHORTEST
    shortest: bool = False       # ANY SHORTEST
    group: bool = False
    topk: int = 0                # SHORTEST k
    path_variable: str = ""
    mode: PGQPathMode = PGQPathMode.NONE


@dataclass
class MatchExpression:
    pg_name: str = ""
    alias: str = ""
    path_patterns: List[PathPattern] = field(default_factory=list)
    column_list: List[object] = field(default_factory=list)   # sql.ast.Expression
    where_clause: object = None


@dataclass
class PropertyGraphTable:
    table_name: str = ""
    catalog_name: str = ""
    schema_name: str = ""
    table_name_alias: str = ""
    column_names: List[str] = field(default_factory=list)
    column_aliases: Dict[str, str] = field(default_factory=dict)  # col -> alias
    except_columns: List[str] = field(default_factory=list)
    all_columns: bool = True
    no_columns: bool = False
    main_label: str = ""
    sub_labels: List[str] = field(default_factory=list)
    discriminator: str = ""
    is_vertex_table: bool = True
    # edge-only: keys and referenced tables
    source_catalog: str = ""
    source_schema: str = ""
    source_reference: str = ""
    source_pk: List[str] = field(default_factory=list)
    source_fk: List[str] = field(default_factory=list)
    destination_catalog: str = ""
    destination_schema: str = ""
    destination_reference: str = ""
    destination_pk: List[str] = field(default_factory=list)
    destination_fk: List[str] = field(default_factory=list)

    def all_labels(self) -> List[str]:
        out = [self.main_label] if self.main_label else []
        out.extend(self.sub_labels)
        return out

    def full_name(self) -> str:
        parts = [p for p in (self.catalog_name,
                             self.schema_name if self.schema_name != "main" else "",
                             self.table_name) if p]
        return ".".join(parts)


def _levenshtein(s1: str, s2: str) -> int:
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


@dataclass
class CreatePropertyGraphInfo:
    property_graph_name: str = ""
    vertex_tables: List[PropertyGraphTable] = field(default_factory=list)
    edge_tables: List[PropertyGraphTable] = field(default_factory=list)
    # lower-cased label -> table
    label_map: Dict[str, PropertyGraphTable] = field(default_factory=dict)
    on_conflict: str = "ERROR"   # ERROR / IGNORE (IF NOT EXISTS) / REPLACE

    def all_tables(self) -> List[PropertyGraphTable]:
        return list(self.vertex_tables) + list(self.edge_tables)

    def get_table_by_name(self, table_name: str, schema: str = "main",
                          is_vertex_table: bool = True,
                          error_not_found: bool = True
                          ) -> Optional[PropertyGraphTable]:
        tables = self.vertex_tables if is_vertex_table else self.edge_tables
        for t in tables:
            if t.table_name.lower() == table_name.lower() and \
                    t.schema_name.lower() == (schema or "main").lower():
                return t
        if error_not_found:
            raise InvalidException(
                f"Table '{table_name}' not found in the property graph "
                f"{self.property_graph_name}.")
        return None

    def get_table_by_label(self, label: str, error_not_found: bool = True,
                           is_vertex_table: bool = True
                           ) -> Optional[PropertyGraphTable]:
        """Reference semantics: exact label-map hit first (with a type check),
        then exact-table-name suggestion, then Levenshtein closest label
        (create_property_graph_info.hpp:146-212)."""
        key = label.lower()
        entry = self.label_map.get(key)
        if entry is not None:
            if entry.is_vertex_table == is_vertex_table:
                return entry
            if error_not_found:
                kind = "vertex" if is_vertex_table else "edge"
                raise InvalidException(
                    f"Exact label '{key}' found, but it is not a {kind} "
                    f"table.")
            return None

        closest = None
        min_dist = None
        for pg_table in self.label_map.values():
            if pg_table.is_vertex_table != is_vertex_table:
                continue
            # case-SENSITIVE name check like the reference
            # (create_property_graph_info.hpp:174-180: std::string ==;
            # callers pass a lowercased label, so a mixed-case table name
            # falls through to the Levenshtein suggestion —
            # label_optional.test:50)
            if pg_table.table_name == key:
                raise InvalidException(
                    f"Table '{key}' found in the property graph, but does not "
                    f"have the correct label. Did you mean the label "
                    f"'{pg_table.main_label}' instead?")
            for cand in pg_table.all_labels():
                d = _levenshtein(key, cand.lower())
                if min_dist is None or d < min_dist:
                    min_dist = d
                    closest = cand
        kind = "vertex" if is_vertex_table else "edge"
        if closest is not None and error_not_found:
            raise InvalidException(
                f"Label '{key}' not found. Did you mean the {kind} label "
                f"'{closest.lower()}'?")
        if error_not_found:
            raise InvalidException(
                f"Label '{key}' not found in the property graph for a "
                f"{kind} table.")
        return None

    def register_label(self, table: PropertyGraphTable):
        for lbl in table.all_labels():
            key = lbl.lower()
            if key in self.label_map:
                # reference lowercases the label in this message
                # (transform_pgq.cpp:132: StringUtil::Lower)
                raise ConstraintException(
                    f"Label {key} is not unique, make sure all labels "
                    f"are unique")
            self.label_map[key] = table


@dataclass
class DropPropertyGraphInfo:
    property_graph_name: str = ""
    missing_ok: bool = False
