"""Vectorized join machinery.

Equi-joins run as factorize + sort + searchsorted. Three backends, all
producing the same output order (probe-side order preserved, build matches
in build-row order — deterministic results): the numpy path below, a native
C++ lookup-table probe for dense keys (native/graphrt.cpp), and the TPU
path in duckpgq_tpu.ops.rel (device sort + searchsorted + gather expansion)
used on accelerator backends for large inputs or when DUCKPGQ_DEVICE_REL=1.
NULL keys never match (SQL semantics).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..storage.vector import Vector


def _int_key_codes(left_cols, right_cols):
    """Integer fast path: the values themselves are the codes (shifted and
    combined by per-column value ranges for multi-column keys) — no
    ``np.unique`` pass over the probe side. Returns (lcode, rcode) or None
    when any column is non-integral or the combined range overflows."""
    lcode = rcode = None
    for lc, rc in zip(left_cols, right_cols):
        if lc.data.dtype.kind not in "iu" or rc.data.dtype.kind not in "iu":
            return None
        ld = lc.data.astype(np.int64, copy=False)
        rd = rc.data.astype(np.int64, copy=False)
        lo = min(int(ld.min()) if len(ld) else 0,
                 int(rd.min()) if len(rd) else 0)
        hi = max(int(ld.max()) if len(ld) else 0,
                 int(rd.max()) if len(rd) else 0)
        span = hi - lo + 1
        if lcode is None:
            lcode, rcode, width = ld - lo, rd - lo, span
        else:
            if width > (1 << 62) // max(span, 1):
                return None
            lcode = lcode * span + (ld - lo)
            rcode = rcode * span + (rd - lo)
            width *= span
    return lcode, rcode


def factorize_keys(left_cols: List[Vector], right_cols: List[Vector]
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Encode multi-column join keys into int64 codes. Returns
    (lcode, rcode, lvalid, rvalid); invalid rows must never match."""
    ln = len(left_cols[0]) if left_cols else 0
    rn = len(right_cols[0]) if right_cols else 0
    lvalid = np.ones(ln, dtype=bool)
    rvalid = np.ones(rn, dtype=bool)
    for lc, rc in zip(left_cols, right_cols):
        lvalid &= lc.validity
        rvalid &= rc.validity
    fast = _int_key_codes(left_cols, right_cols)
    if fast is not None:
        return fast[0], fast[1], lvalid, rvalid
    lcode = np.zeros(ln, dtype=np.int64)
    rcode = np.zeros(rn, dtype=np.int64)
    for lc, rc in zip(left_cols, right_cols):
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
    return lcode, rcode, lvalid, rvalid


def _use_device_rel(n_rows: int) -> bool:
    """Route this join to the device backend? Forced by DUCKPGQ_DEVICE_REL
    (1/0); by default only on non-CPU backends for joins big enough to
    amortize host<->device transfers."""
    import os
    flag = os.environ.get("DUCKPGQ_DEVICE_REL")
    if flag == "1":
        return True
    if flag == "0":
        return False
    if n_rows < (1 << 22):
        return False
    try:
        import jax
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def equi_join_pairs(lcode: np.ndarray, rcode: np.ndarray,
                    lvalid: Optional[np.ndarray] = None,
                    rvalid: Optional[np.ndarray] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """All matching (left_idx, right_idx) pairs, ordered by left index then
    right index (probe order preserved; build matches in build-row order).
    NULL keys (valid masks False) never match."""
    # device path: accelerator backends for large joins (opt-in/out via
    # DUCKPGQ_DEVICE_REL); same ordering contract as below
    if _use_device_rel(len(lcode) + len(rcode)):
        from ..ops.rel import device_equi_join
        out = device_equi_join(lcode, rcode, lvalid, rvalid)
        if out is not None:
            return out
    # dense-key native path: one C++ lookup-table probe instead of
    # sort + searchsorted + repeat expansion (native/graphrt.cpp gr_lut_*)
    if len(rcode) and len(lcode) >= 4096:
        rv = rvalid if rvalid is not None and not rvalid.all() else None
        rc = rcode if rv is None else rcode[rv]
        if len(rc):
            lo, hi = int(rc.min()), int(rc.max())
            span = hi - lo + 1
            if span <= max(16 * len(rc), 1 << 20):
                from ..native_rt import lut_join_pairs
                lv = lvalid if lvalid is not None and not lvalid.all() \
                    else None
                out = lut_join_pairs(lcode, lv, rcode, rvalid, lo, span)
                if out is not None:
                    return out
    if rvalid is not None and not rvalid.all():
        rkeep = np.flatnonzero(rvalid)
        rc = rcode[rkeep]
    else:
        rkeep = None
        rc = rcode
    order = np.argsort(rc, kind="stable")
    sorted_r = rc[order]
    rn = len(sorted_r)
    valid = lvalid if lvalid is not None else None

    # unique build side (PK joins — the dominant MATCH-binding shape):
    # each probe row has 0 or 1 match, so pair construction is one
    # searchsorted + mask instead of repeat/cumsum expansion
    if rn and bool((sorted_r[1:] != sorted_r[:-1]).all()):
        pos = np.searchsorted(sorted_r, lcode, side="left")
        posc = np.minimum(pos, rn - 1)
        hit = (pos < rn) & (sorted_r[posc] == lcode)
        if valid is not None:
            hit &= valid
        li = np.flatnonzero(hit)
        ri = order[posc[li]]
        if rkeep is not None:
            ri = rkeep[ri]
        return li, ri

    starts = np.searchsorted(sorted_r, lcode, side="left")
    ends = np.searchsorted(sorted_r, lcode, side="right")
    counts = ends - starts
    if valid is not None:
        counts = np.where(valid, counts, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    li = np.repeat(np.arange(len(lcode), dtype=np.int64), counts)
    # offsets within each left row's match range
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)
    ri = order[np.repeat(starts, counts) + offs]
    if rkeep is not None:
        ri = rkeep[ri]
    return li, ri


def cross_pairs(ln: int, rn: int) -> Tuple[np.ndarray, np.ndarray]:
    """Cross product in the reference host engine's physical order
    (asserted by multiple_graph_table.test's ordered expectations):
    the optimizer materializes the SMALLER input as the RHS (ties keep the
    second input on the right), then streams the LHS through it in
    2048-row chunks — for each LHS chunk, each RHS row is paired with the
    whole chunk, so the streamed side varies fastest within a chunk."""
    if ln == 0 or rn == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    swapped = rn > ln                 # build side = smaller input
    lhs_n, rhs_n = (rn, ln) if swapped else (ln, rn)
    CH = 2048
    lhs_parts, rhs_parts = [], []
    for start in range(0, lhs_n, CH):
        m = min(CH, lhs_n - start)
        lhs_parts.append(np.tile(np.arange(start, start + m,
                                           dtype=np.int64), rhs_n))
        rhs_parts.append(np.repeat(np.arange(rhs_n, dtype=np.int64), m))
    lhs_i = np.concatenate(lhs_parts)
    rhs_i = np.concatenate(rhs_parts)
    return (rhs_i, lhs_i) if swapped else (lhs_i, rhs_i)
