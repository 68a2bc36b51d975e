"""ctypes bindings for the native graph runtime (native/graphrt.cpp).

The native library owns host-resident graph kernels (CSR build, 512-lane
MS-BFS, shortest path, Bellman-Ford, PageRank, WCC, LCC) — the same layer the
reference implements in C++ (src/core/functions/scalar/*). The engine
dispatches here for graphs below the device threshold; the JAX/Pallas kernels
own large graphs on TPU. Falls back silently to the numpy mirrors in
ops/msbfs.py / ops/algorithms.py when no compiler is available.

Set DUCKPGQ_NATIVE=0 to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libgraphrt.so")

_lib = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i64 = ctypes.c_int64
_f64 = ctypes.c_double


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "graphrt.cpp")
    if not os.path.exists(src):
        return False
    try:
        os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             src, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


_allocator_tuned = False


def _tune_allocator():
    """Long-session performance fix (BASELINE.md §3 in-session ~5x decay):
    the MATCH-binding hot path allocates/frees multi-hundred-MB numpy
    buffers (gathers, join fills) every query. Above glibc's dynamic mmap
    threshold each cycle is a fresh mmap/munmap, so every query re-faults
    every page it touches — allocation cost grows with the working set and
    the session 'ages'. Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD keeps
    those buffers on the reusable heap (pages stay mapped between
    queries). Linux/glibc only; silently skipped elsewhere."""
    global _allocator_tuned
    if _allocator_tuned:
        return
    _allocator_tuned = True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        threshold = int(os.environ.get("DUCKPGQ_MMAP_THRESHOLD",
                                       str(1 << 30)))
        libc.mallopt(M_MMAP_THRESHOLD, threshold)
        libc.mallopt(M_TRIM_THRESHOLD, threshold)
    except (OSError, AttributeError):
        pass


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("DUCKPGQ_NATIVE", "1") == "0":
        return None
    _tune_allocator()
    src = os.path.join(_NATIVE_DIR, "graphrt.cpp")
    needs_build = not os.path.exists(_SO_PATH) or (
        os.path.exists(src) and
        os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
    if needs_build and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.gr_csr_build.argtypes = [_i64, _i64, _i64p, _i64p, _i64p, _i64p,
                                 _i64p]
    lib.gr_msbfs_lengths.argtypes = [_i64, _i64p, _i64p, _i64, _i64p, _i64p,
                                     _i64p]
    lib.gr_msbfs_paths.argtypes = [_i64, _i64p, _i64p, _i64p, _i64p, _i64,
                                   _i64p, _i64p, _i64p, _i64p, _i64p]
    lib.gr_msbfs_reachability.argtypes = [_i64, _i64p, _i64p, _i64, _i64p,
                                          _i64p, _u8p]
    lib.gr_bellman_ford_f64.argtypes = [_i64, _i64p, _i64p, _f64p, _i64,
                                        _i64p, _i64p, _f64p, _u8p]
    lib.gr_bellman_ford_i64.argtypes = [_i64, _i64p, _i64p, _i64p, _i64,
                                        _i64p, _i64p, _i64p, _u8p]
    lib.gr_pagerank.argtypes = [_i64, _i64, _i64p, _i64p, _f64, _f64, _f64p]
    lib.gr_wcc.argtypes = [_i64, _i64, _i64p, _i64p, _i64p]
    lib.gr_lcc.argtypes = [_i64, _i64p, _i64p, _f32p]
    lib.gr_lut_bucket_build.argtypes = [_i64p, _i64, ctypes.c_void_p, _i64,
                                        _i64, _i64p, _i64p]
    lib.gr_lut_join_total.argtypes = [_i64p, _i64, ctypes.c_void_p, _i64p,
                                      _i64, _i64]
    lib.gr_lut_join_total.restype = _i64
    lib.gr_lut_join_fill.argtypes = [_i64p, _i64, ctypes.c_void_p, _i64p,
                                     _i64p, _i64, _i64, _i64p, _i64p]
    lib.gr_gather_bytes.argtypes = [ctypes.c_void_p, _i64, _i64p, _i64,
                                    ctypes.c_void_p]
    lib.gr_version.restype = _i64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def msbfs_lengths(vcount: int, offsets, adj, qs, qd) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    qs = _c64(qs)
    qd = _c64(qd)
    out = np.empty(len(qs), dtype=np.int64)
    lib.gr_msbfs_lengths(vcount, _c64(offsets), _c64(adj), len(qs), qs, qd,
                         out)
    return out


def msbfs_paths(vcount: int, offsets, adj, eid_of_slot, src_of_slot, qs, qd
                ) -> Optional[Tuple[np.ndarray, List[Optional[List[int]]]]]:
    """Returns (lengths, paths) or None when native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    qs = _c64(qs)
    qd = _c64(qd)
    offsets = _c64(offsets)
    adj = _c64(adj)
    lengths = np.empty(len(qs), dtype=np.int64)
    lib.gr_msbfs_lengths(vcount, offsets, adj, len(qs), qs, qd, lengths)
    sizes = np.where(lengths >= 0, 2 * np.maximum(lengths, 0) + 1, 0)
    path_offsets = np.zeros(len(qs), dtype=np.int64)
    if len(qs) > 1:
        path_offsets[1:] = np.cumsum(sizes[:-1])
    buf = np.zeros(int(sizes.sum()), dtype=np.int64)
    lib.gr_msbfs_paths(vcount, offsets, adj, _c64(eid_of_slot),
                       _c64(src_of_slot), len(qs), qs, qd, lengths,
                       path_offsets, buf)
    paths: List[Optional[List[int]]] = []
    for q in range(len(qs)):
        if lengths[q] < 0:
            paths.append(None)
        else:
            o = int(path_offsets[q])
            paths.append([int(x) for x in buf[o:o + int(sizes[q])]])
    return lengths, paths


def bellman_ford(vcount: int, offsets, adj, w: np.ndarray, qs, qd
                 ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Returns (costs, reached bool) or None. w dtype picks the variant."""
    lib = _load()
    if lib is None:
        return None
    qs = _c64(qs)
    qd = _c64(qd)
    reached = np.empty(len(qs), dtype=np.uint8)
    if w.dtype == np.float64:
        out = np.empty(len(qs), dtype=np.float64)
        lib.gr_bellman_ford_f64(vcount, _c64(offsets), _c64(adj),
                                np.ascontiguousarray(w, np.float64),
                                len(qs), qs, qd, out, reached)
    else:
        out = np.empty(len(qs), dtype=np.int64)
        lib.gr_bellman_ford_i64(vcount, _c64(offsets), _c64(adj), _c64(w),
                                len(qs), qs, qd, out, reached)
    return out, reached.astype(bool)


def pagerank(vcount: int, n: int, offsets, adj, damping: float,
             threshold: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rank = np.empty(n, dtype=np.float64)
    lib.gr_pagerank(vcount, n, _c64(offsets), _c64(adj), damping, threshold,
                    rank)
    return rank


def wcc(vcount: int, n: int, offsets, adj) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.int64)
    lib.gr_wcc(vcount, n, _c64(offsets), _c64(adj), out)
    return out


def lcc(vcount: int, offsets, adj) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(vcount, dtype=np.float32)
    lib.gr_lcc(vcount, _c64(offsets), _c64(adj), out)
    return out


def lut_join_pairs(lcode: np.ndarray, lvalid: Optional[np.ndarray],
                   rcode: np.ndarray, rvalid: Optional[np.ndarray],
                   lo: int, span: int
                   ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Equi-join pair construction via a dense build-side lookup table
    (native/graphrt.cpp gr_lut_*). Caller guarantees every valid rcode lies
    in [lo, lo+span). Returns (li, ri) or None when native is unavailable.
    Output order matches the sort-based join: probe order, ties in build-row
    order."""
    lib = _load()
    if lib is None:
        return None
    lcode = _c64(lcode)
    rcode = _c64(rcode)
    lv = None if lvalid is None else np.ascontiguousarray(lvalid, np.uint8)
    rv = None if rvalid is None else np.ascontiguousarray(rvalid, np.uint8)
    lvp = lv.ctypes.data_as(ctypes.c_void_p) if lv is not None else None
    rvp = rv.ctypes.data_as(ctypes.c_void_p) if rv is not None else None
    offsets = np.empty(span + 1, dtype=np.int64)
    order = np.empty(len(rcode), dtype=np.int64)
    lib.gr_lut_bucket_build(rcode, len(rcode), rvp, lo, span, offsets, order)
    total = lib.gr_lut_join_total(lcode, len(lcode), lvp, offsets, lo, span)
    li = np.empty(total, dtype=np.int64)
    ri = np.empty(total, dtype=np.int64)
    lib.gr_lut_join_fill(lcode, len(lcode), lvp, offsets, order, lo, span,
                         li, ri)
    return li, ri


def gather(base: np.ndarray, idx: np.ndarray) -> Optional[np.ndarray]:
    """Parallel out[i] = base[idx[i]] for fixed-size dtypes (the
    late-materialization hot path). Returns None when native is
    unavailable or the dtype is object (caller falls back to numpy)."""
    lib = _load()
    if lib is None or base.dtype == object or not base.flags.c_contiguous:
        return None
    elem = base.dtype.itemsize
    idx = _c64(idx)
    # gr_gather_bytes dereferences unchecked — enforce numpy's indexing
    # contract here (negative wrap, IndexError out of range) so a bad index
    # can never become a silent out-of-bounds read (ADVICE r2). The min/max
    # scan is sequential and cheap next to the random-access gather.
    nb = len(base)
    if len(idx):
        mn, mx = int(idx.min()), int(idx.max())
        if mx >= nb or mn < -nb:
            raise IndexError(
                f"index {mx if mx >= nb else mn} is out of bounds for "
                f"axis 0 with size {nb}")
        if mn < 0:
            idx = np.where(idx < 0, idx + nb, idx)
            idx = _c64(idx)
    out = _pool_buffer(len(idx), base.dtype)
    lib.gr_gather_bytes(base.ctypes.data_as(ctypes.c_void_p),
                        ctypes.c_int64(elem),
                        idx, ctypes.c_int64(len(idx)),
                        out.ctypes.data_as(ctypes.c_void_p))
    return out


# Output-buffer pool for the big gather results (round-4 variance
# attribution: repeated identical queries showed a bimodal 1.7x wall
# spread with proportional CPU burn — per-query multi-hundred-MB
# allocations landing on alternating heap/page states). Reuse is gated
# on the REFCOUNT: a pooled buffer is handed out again only when the
# pool list holds its sole reference (numpy views keep the base alive,
# so a live view also blocks reuse). False negatives just allocate.
_POOL: dict = {}
_POOL_MIN_BYTES = 1 << 24          # only pool >=16 MB outputs
_POOL_MAX_BYTES = int(os.environ.get("DUCKPGQ_POOL_BYTES",
                                     str(2 << 30)))
_pool_bytes = 0


def _pool_buffer(n: int, dtype) -> np.ndarray:
    """CONTRACT for callers: the returned array may be recycled for a later
    query the moment no Python reference to the ndarray (or a numpy view of
    it) remains. Consumers must hold the ndarray itself for as long as the
    DATA must stay valid — a bare ctypes pointer, an early-released
    memoryview, or a C-side copy of the address does NOT keep the buffer
    reserved and will observe it being overwritten. Every in-repo caller
    returns the ndarray into a Vector, which satisfies this; new callers
    that pass the address to native code must keep the ndarray alive for
    the duration of the native call (the gather() sites do)."""
    global _pool_bytes
    nbytes = n * dtype.itemsize
    if nbytes < _POOL_MIN_BYTES:
        return np.empty(n, dtype=dtype)
    key = (n, dtype.str)
    bufs = _POOL.get(key)
    if bufs:
        for b in bufs:
            # refs when free: pool list + loop var + getrefcount arg
            if sys.getrefcount(b) <= 3:
                return b
    out = np.empty(n, dtype=dtype)
    if _pool_bytes + nbytes <= _POOL_MAX_BYTES:
        _POOL.setdefault(key, []).append(out)
        _pool_bytes += nbytes
    return out
