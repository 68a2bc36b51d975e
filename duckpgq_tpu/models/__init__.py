"""High-level graph-analytics API over the TPU device kernels.

The SQL layer (GRAPH_TABLE / algorithm table functions) is the
reference-parity surface; this module is the direct, TPU-first programmatic
surface for the same capabilities: build a graph once, run batched BFS /
shortest paths / PageRank / WCC on device.
"""

from .graph import Graph  # noqa: F401
