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


def _tune_allocator():
    """Keep large numpy buffers on the heap instead of per-allocation mmaps.

    glibc mmaps allocations over ~128 KiB and unmaps them on free, so every
    whole-column temporary (the executor is fully vectorized — one buffer per
    operator per column) pays fresh page faults: measured 15-70x slowdown on
    this class of VM for 100 MB+ vectors. Raising M_MMAP_THRESHOLD and
    M_TRIM_THRESHOLD makes free() retain and reuse the pages."""
    import ctypes
    import sys
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 40)   # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 40)   # M_TRIM_THRESHOLD
    except (OSError, AttributeError):
        pass


_tune_allocator()


def connect(database: str = ":memory:"):
    from .connection import Database
    return Database(database).connect()
