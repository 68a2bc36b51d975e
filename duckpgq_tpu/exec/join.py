"""Vectorized join machinery.

Equi-joins run as factorize + sort + searchsorted (the numpy mirror of the
radix-hash join the TPU path implements in duckpgq_tpu.ops.rel — same
algorithm, same output order: probe-side order preserved, build matches in
build-row order, which keeps results deterministic).
NULL keys never match (SQL semantics).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..storage.vector import Vector


def factorize_keys(left_cols: List[Vector], right_cols: List[Vector]
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Encode multi-column join keys into dense int64 codes; rows with any
    NULL key get code -1 (never matches)."""
    ln = len(left_cols[0]) if left_cols else 0
    rn = len(right_cols[0]) if right_cols else 0
    lcode = np.zeros(ln, dtype=np.int64)
    rcode = np.zeros(rn, dtype=np.int64)
    lvalid = np.ones(ln, dtype=bool)
    rvalid = np.ones(rn, dtype=bool)
    for lc, rc in zip(left_cols, right_cols):
        lvalid &= lc.validity
        rvalid &= rc.validity
        if lc.type.numpy_dtype() is object or rc.type.numpy_dtype() is object:
            combined = np.concatenate([
                np.array([None if v is None else str(v) for v in lc.data],
                         dtype=object),
                np.array([None if v is None else str(v) for v in rc.data],
                         dtype=object)])
            combined = np.where(combined == None, "", combined)  # noqa: E711
            _, inv = np.unique(combined.astype(str), return_inverse=True)
        else:
            ld = lc.data.astype(np.float64) if lc.data.dtype != rc.data.dtype \
                else lc.data
            rd = rc.data.astype(np.float64) if lc.data.dtype != rc.data.dtype \
                else rc.data
            combined = np.concatenate([ld, rd])
            _, inv = np.unique(combined, return_inverse=True)
        card = int(inv.max()) + 2 if len(inv) else 1
        lcode = lcode * card + inv[:ln]
        rcode = rcode * card + inv[ln:]
    lcode[~lvalid] = -1
    rcode[~rvalid] = -1
    return lcode, rcode


def equi_join_pairs(lcode: np.ndarray, rcode: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """All matching (left_idx, right_idx) pairs, ordered by left index then
    right index. NULL codes (-1) excluded."""
    rn = len(rcode)
    order = np.argsort(rcode, kind="stable")
    sorted_r = rcode[order]
    starts = np.searchsorted(sorted_r, lcode, side="left")
    ends = np.searchsorted(sorted_r, lcode, side="right")
    valid = lcode >= 0
    counts = np.where(valid, ends - starts, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    li = np.repeat(np.arange(len(lcode), dtype=np.int64), counts)
    # offsets within each left row's match range
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)
    ri = order[np.repeat(starts, counts) + offs]
    return li, ri


def cross_pairs(ln: int, rn: int) -> Tuple[np.ndarray, np.ndarray]:
    li = np.repeat(np.arange(ln, dtype=np.int64), rn)
    ri = np.tile(np.arange(rn, dtype=np.int64), ln)
    return li, ri
