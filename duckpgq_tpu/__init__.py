"""duckpgq_tpu — a TPU-native SQL/PGQ graph query engine.

Brand-new framework with the capabilities of the DuckPGQ DuckDB extension
(SQL:2023 property graph queries, path-finding, graph algorithms), built
TPU-first on JAX/XLA/Pallas: relational MATCH binding via vectorized joins,
CSR construction as sort+segment ops, and lane-packed multi-source BFS /
shortest-path / Bellman-Ford kernels.

Public API:
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE ...")
    con.execute("SELECT * FROM GRAPH_TABLE (...)").fetchall()
"""

__version__ = "0.1.0"


def connect(database: str = ":memory:"):
    from .connection import Database
    return Database(database).connect()
