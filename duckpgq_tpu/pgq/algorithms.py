"""Algorithm table functions: pagerank / weakly_connected_component /
local_clustering_coefficient (reference src/core/functions/table/pagerank.cpp,
weakly_connected_component.cpp, local_clustering_coefficient.cpp).

Each is a bind-replace producing ``SELECT pk, add(__x.temp, fn(0, rowid)) AS
alias FROM vtable CROSS JOIN (count csr_cte) __x`` with the CSR CTE attached
(reference duckpgq_utils.cpp:63-88).
"""

from __future__ import annotations

from typing import Tuple

from ..errors import BinderException, InvalidException
from ..sql import ast as a
from .ast import CreatePropertyGraphInfo, PropertyGraphTable
from .transpiler import (_col_sql, _q, _tref_sql, directed_csr_cte_sql,
                         edges_cte_sql, parse_one_select,
                         undirected_csr_cte_sql)


def validate_source_node_and_edge_table(info: CreatePropertyGraphInfo,
                                        node_label: str, edge_label: str
                                        ) -> PropertyGraphTable:
    """Reference duckpgq_utils.cpp:44-60."""
    source_node = info.get_table_by_label(node_label, True, True)
    edge = info.get_table_by_label(edge_label, True, False)
    if edge.source_reference.lower() != source_node.table_name.lower():
        raise InvalidException(
            f"Vertex table {node_label} is not a source of edge table "
            f"{edge_label}")
    return edge


def _link_pg_tables(executor, info: CreatePropertyGraphInfo,
                    edge: PropertyGraphTable):
    if getattr(edge, "source_pg_table", None) is None:
        for v in info.vertex_tables:
            if v.table_name.lower() == edge.source_reference.lower():
                edge.source_pg_table = v
            if v.table_name.lower() == edge.destination_reference.lower():
                edge.destination_pg_table = v


def _algorithm_select(edge: PropertyGraphTable, function_name: str,
                      function_alias: str) -> a.SelectStatement:
    src_ref = edge.source_reference
    sql = (
        f"SELECT {_col_sql(edge.source_pk[0], src_ref)}, "
        f"add(__x.temp, {function_name}(0, {_col_sql('rowid', src_ref)})) "
        f"AS {_q(function_alias)} "
        f"FROM {_tref_sql(edge.source_pg_table, src_ref)} CROSS JOIN "
        f"(SELECT multiply(0, count(csr_cte.temp)) AS temp FROM csr_cte) "
        f"AS __x")
    return parse_one_select(sql)


def _bind_algorithm(executor, args, function_name: str, function_alias: str,
                    subquery_alias: str, directed: bool
                    ) -> Tuple[a.SelectStatement, str]:
    from ..functions.table import arg_to_string
    pg_name = arg_to_string(args[0]).lower()
    node_label = arg_to_string(args[1]).lower()
    edge_label = arg_to_string(args[2]).lower()
    info = executor.connection.registered_property_graphs.get(pg_name)
    if info is None:
        # reference GetPropertyGraphInfo (duckpgq_utils.cpp:35-41): the
        # algorithm table functions use the INVALID "not found" variant,
        # unlike summarize's Binder "does not exist" (duckpgq_state.cpp:175)
        raise InvalidException(f"Property graph {pg_name} not found")
    edge = validate_source_node_and_edge_table(info, node_label, edge_label)
    _link_pg_tables(executor, info, edge)
    stmt = _algorithm_select(edge, function_name, function_alias)
    if directed:
        stmt.ctes.append(a.CTE(name="csr_cte", query=parse_one_select(
            directed_csr_cte_sql(edge, "src", "edge", "dst"))))
    else:
        stmt.ctes.append(a.CTE(name="edges_cte",
                               query=parse_one_select(edges_cte_sql(edge))))
        # csr_cte references edges_cte, registered just above
        stmt.ctes.append(a.CTE(name="csr_cte", query=parse_one_select(
            undirected_csr_cte_sql(edge))))
    return stmt, subquery_alias


def bind_pagerank(executor, args):
    return _bind_algorithm(executor, args, "pagerank", "pagerank",
                           "pagerank", directed=True)


def bind_weakly_connected_component(executor, args):
    return _bind_algorithm(executor, args, "weakly_connected_component",
                           "componentId", "wcc", directed=False)


def bind_local_clustering_coefficient(executor, args):
    return _bind_algorithm(executor, args, "local_clustering_coefficient",
                           "local_clustering_coefficient", "lcc",
                           directed=False)
