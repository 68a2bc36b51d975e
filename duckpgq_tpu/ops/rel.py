"""TPU relational operators for MATCH pattern binding: equi-join, group-by
aggregation, filter compaction (SURVEY.md §7.1 item 4; the north-star
operator set "hash join / hash aggregate / filter ... in JAX/XLA").

TPU-first formulations — sort + searchsorted + gather + segmented scan, no
scatters (scatter lowers to minutes-long compiles on some TPU backends; see
ops/segscan.py), no data-dependent shapes inside jit:

- ``device_equi_join``: two phases. A jitted count pass (stable-sort the
  build side, searchsorted both bounds per probe key, exclusive cumsum of
  match counts) returns the exact output size; the host picks a padded
  bucket, and a jitted expansion pass materializes pairs by rank — output
  slot t maps to probe row p = searchsorted(offsets, t) and within-probe
  match j = t - offsets[p]. Ordering matches exec/join.equi_join_pairs
  exactly (probe order, build matches in build-row order, NULL keys never
  match), so the engine can switch backends without result drift.
- ``device_group_sums``: sort codes, segment boundaries, segmented-scan
  reductions (count/sum per group).
- ``device_filter_indices``: mask -> selected row indices via sort by
  (miss, position) — compaction without scatter.

The SQL executor routes large joins here when a non-CPU backend is active
(or DUCKPGQ_DEVICE_REL=1 forces it; =0 disables); codes must be
non-negative and fit int32 after range-shifting (exec/join.factorize_keys
produces shifted codes, so SNB-style 1e12 ids still qualify).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .csr_jax import pad_bucket

# probe/build NULL sentinels: factorized codes are >= 0, so negatives never
# match anything (and the two sides use different negatives)
_L_NULL = -1
_R_NULL = -3


@jax.jit
def _join_count(lcode: jnp.ndarray, rcode: jnp.ndarray):
    order = jnp.argsort(rcode, stable=True)
    rs = rcode[order]
    lo = jnp.searchsorted(rs, lcode, side="left")
    hi = jnp.searchsorted(rs, lcode, side="right")
    cnt = (hi - lo).astype(jnp.int32)
    # offsets/total stay int32: the host wrapper recomputes the exact total
    # from cnt in int64 and rejects >= 2^31 outputs before any expansion,
    # so no prefix here can wrap when the result is actually used
    offs = jnp.cumsum(cnt) - cnt                      # exclusive
    return order, lo.astype(jnp.int32), offs, cnt


@functools.partial(jax.jit, static_argnames=("domain",))
def _join_count_dense(lcode: jnp.ndarray, rcode: jnp.ndarray,
                      domain: int):
    """_join_count via a DENSE code-domain offsets table (round-4 device-
    join lever, VERDICT r3 item 6): a bincount + cumsum over [domain]
    replaces the per-probe binary search — two gathers per probe instead
    of 2 log(rn) search rounds. Valid when all codes < domain (the host
    wrapper checks). Bit-identical ordering: the stable argsort groups
    build rows by code in row order, and code c's group starts at
    n_negative_pads + exclusive-prefix(counts)[c]."""
    order = jnp.argsort(rcode, stable=True)
    neg = (rcode < 0)
    n_neg = neg.sum(dtype=jnp.int32)
    rc_cl = jnp.where(neg, domain, rcode).astype(jnp.int32)
    counts = jnp.bincount(rc_cl, length=domain + 1)[:domain].astype(
        jnp.int32)
    starts = n_neg + (jnp.cumsum(counts) - counts)
    lc_cl = jnp.clip(lcode, 0, domain - 1)
    lo = starts[lc_cl]
    cnt = jnp.where(lcode < 0, 0, counts[lc_cl]).astype(jnp.int32)
    offs = jnp.cumsum(cnt) - cnt                      # exclusive
    return order, lo.astype(jnp.int32), offs, cnt


@functools.partial(jax.jit, static_argnames=("cap",))
def _join_expand(order: jnp.ndarray, lo: jnp.ndarray, offs: jnp.ndarray,
                 cap: int):
    # output-slot -> probe-row via run-start scatter + cumsum (O(cap))
    # instead of searchsorted (O(cap log probes)): scatter 1 at each
    # probe's run start (empty runs stack at the same slot and the
    # cumsum skips them), p = prefix-count - 1. Bounded int32 scatter —
    # the class proven cheap-and-compilable by the sparse-tail campaign.
    t = jnp.arange(cap, dtype=jnp.int32)
    heads = jnp.zeros(cap + 1, jnp.int32).at[
        jnp.minimum(offs, cap)].add(1, mode="drop")
    p = (jnp.cumsum(heads[:cap]) - 1).astype(jnp.int32)
    p = jnp.maximum(p, 0)
    j = t - offs[p]
    rn = order.shape[0]
    ri = order[jnp.clip(lo[p] + j, 0, max(rn - 1, 0))]
    return p, ri.astype(jnp.int32)


def device_equi_join(lcode: np.ndarray, rcode: np.ndarray,
                     lvalid: Optional[np.ndarray] = None,
                     rvalid: Optional[np.ndarray] = None
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """All matching (left_idx, right_idx) pairs on the active JAX backend,
    ordered like exec/join.equi_join_pairs. Returns None when the codes
    don't qualify for the int32 device path (caller falls back to host)."""
    if len(lcode) == 0 or len(rcode) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lmax = int(lcode.max()) if len(lcode) else 0
    rmax = int(rcode.max()) if len(rcode) else 0
    lmin = int(lcode.min()) if len(lcode) else 0
    rmin = int(rcode.min()) if len(rcode) else 0
    if min(lmin, rmin) < 0 or max(lmax, rmax) >= np.iinfo(np.int32).max:
        return None
    # pad both sides to shape buckets with the (non-matching) NULL
    # sentinels so differently-sized joins reuse compiled kernels
    lc = np.full(pad_bucket(len(lcode)), _L_NULL, dtype=np.int32)
    rc = np.full(pad_bucket(len(rcode)), _R_NULL, dtype=np.int32)
    lc[:len(lcode)] = lcode.astype(np.int32)
    rc[:len(rcode)] = rcode.astype(np.int32)
    if lvalid is not None and not lvalid.all():
        lc[:len(lcode)] = np.where(lvalid, lc[:len(lcode)], _L_NULL)
    if rvalid is not None and not rvalid.all():
        rc[:len(rcode)] = np.where(rvalid, rc[:len(rcode)], _R_NULL)
    domain = max(lmax, rmax) + 1
    if domain <= (1 << 22):
        # compact code domains (factorized keys): dense offsets table,
        # two gathers per probe instead of 2 log(rn) search rounds
        order, lo, offs, cnt = _join_count_dense(
            jnp.asarray(lc), jnp.asarray(rc), pad_bucket(domain))
    else:
        order, lo, offs, cnt = _join_count(jnp.asarray(lc),
                                           jnp.asarray(rc))
    n = int(np.asarray(cnt).astype(np.int64).sum())   # exact, host-side
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if n >= np.iinfo(np.int32).max:
        return None  # int32 offsets would wrap; host path handles it
    cap = pad_bucket(n)
    li, ri = _join_expand(order, lo, offs, cap)
    return (np.asarray(li[:n]).astype(np.int64),
            np.asarray(ri[:n]).astype(np.int64))


@jax.jit
def _group_sums(codes: jnp.ndarray, values: jnp.ndarray):
    order = jnp.argsort(codes, stable=True)
    sc = codes[order]
    sv = values[order]
    heads = jnp.concatenate([jnp.ones(1, jnp.bool_), sc[1:] != sc[:-1]])

    # segmented inclusive sum; each group's total sits at its last slot
    def op(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, av + bv)

    _, scanned = jax.lax.associative_scan(op, (heads, sv), axis=0)
    is_last = jnp.concatenate([sc[1:] != sc[:-1], jnp.ones(1, jnp.bool_)])
    # compact last-slot positions to the front (ascending = ascending code
    # order, since sc is sorted) — sort-based, no scatter
    n = sc.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    sel = jnp.sort(jnp.where(is_last, pos, n + pos))
    selc = jnp.clip(sel, 0, n - 1)
    n_groups = jnp.sum(heads.astype(jnp.int32))
    return sc[selc], scanned[selc], selc + 1, n_groups


def device_group_sums(codes: np.ndarray, values: np.ndarray
                      ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                          np.ndarray]]:
    """Group-by-sum on device: returns (group_codes, sums, group_sizes)
    ordered by code ascending. None when codes don't fit int32 or integer
    sums could overflow the device's int32 accumulator (float inputs
    accumulate in float32 — callers needing exact/wider sums use the host
    path, which the SQL executor does for final aggregates)."""
    if len(codes) == 0:
        return (np.empty(0, np.int64), np.empty(0, values.dtype),
                np.empty(0, np.int64))
    if int(codes.min()) < 0 or int(codes.max()) >= np.iinfo(np.int32).max:
        return None
    if values.dtype.kind in "iu":
        vmax = int(np.abs(values).max()) if len(values) else 0
        if vmax * max(len(values), 1) >= np.iinfo(np.int32).max:
            return None  # a group total could wrap int32
    cap = pad_bucket(len(codes))
    # pad with the max code so pads join the last group's tail; their
    # padded values are 0 so sums are unaffected, and sizes subtract pads
    pad_code = int(codes.max())
    c = np.full(cap, pad_code, dtype=np.int32)
    c[:len(codes)] = codes.astype(np.int32)
    v = np.zeros(cap, dtype=np.float32 if values.dtype.kind == "f"
                 else np.int32)
    v[:len(codes)] = values
    gcodes, gsums, gends, n_groups = _group_sums(
        jnp.asarray(c), jnp.asarray(v))
    k = int(n_groups)
    gc = np.asarray(gcodes)[:k]                        # ascending codes
    gs = np.asarray(gsums)[:k]
    ge = np.asarray(gends)[:k]
    sizes = np.diff(np.concatenate([[0], ge]))
    sizes[-1] -= cap - len(codes)                      # remove pad rows
    return gc.astype(np.int64), gs, sizes.astype(np.int64)


@functools.partial(jax.jit, static_argnames=("cap",))
def _filter_indices(mask: jnp.ndarray, cap: int):
    n = mask.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, pos, n + pos)
    idx = jnp.sort(key)[:cap]
    total = jnp.sum(mask.astype(jnp.int32))
    return idx, total


def device_filter_indices(mask: np.ndarray) -> np.ndarray:
    """Selected row positions of a boolean mask (ascending), computed on
    device without scatter (sort-based compaction). Input is padded to a
    shape bucket so repeated calls share compiled kernels."""
    if len(mask) == 0:
        return np.empty(0, np.int64)
    m = np.zeros(pad_bucket(len(mask)), dtype=bool)
    m[:len(mask)] = mask
    idx, total = _filter_indices(jnp.asarray(m), len(m))
    n = int(total)
    return np.asarray(idx[:n]).astype(np.int64)
