"""Profiling/tracing hooks (SURVEY.md §5: the reference inherits DuckDB's
EXPLAIN/profiler; the TPU equivalents are EXPLAIN / EXPLAIN ANALYZE in
exec/explain.py plus the device traces here).

``device_trace`` wraps ``jax.profiler`` so a query's device work (CSR
build, BFS waves, algorithm iterations) shows up in xprof/TensorBoard:

    from duckpgq_tpu.utils.tracing import device_trace
    with device_trace("/tmp/pgq_trace"):
        con.execute("... GRAPH_TABLE ...")

``annotate`` labels a region inside a trace (host-side span named in the
profile timeline).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: str,
                 create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a JAX device+host profile into ``log_dir`` (TensorBoard /
    xprof format) for the duration of the block."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Name a region in the active trace (no-op overhead when not tracing)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
