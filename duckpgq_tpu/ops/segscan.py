"""Segmented reductions over sorted segments via associative scan.

Why this exists: XLA lowers ``jax.ops.segment_{sum,max,min}`` to scatter,
which on some TPU backends costs minutes of compile time per shape. For
segment ids that are SORTED (our CSR edge views always are), the same
reduction is an associative scan with head-flag resets — pure elementwise +
log-depth slicing, which compiles in seconds and runs at HBM bandwidth.

Usage pattern (per CSR): precompute ``heads`` (first-slot-of-segment flags)
and ``last_pos`` (last slot per segment id) once, then reduce any per-edge
value array to per-vertex results.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def segment_heads(ids: jnp.ndarray) -> jnp.ndarray:
    """heads[i] = ids[i] != ids[i-1] (first slot of each run)."""
    return jnp.concatenate([jnp.ones(1, jnp.bool_), ids[1:] != ids[:-1]])


def last_positions(offsets: jnp.ndarray) -> jnp.ndarray:
    """Per segment id, the last slot (= offsets[v+1]-1); segments with no
    slots yield offsets[v]-1 — mask with ``has_segment``."""
    return jnp.maximum(offsets[1:] - 1, 0)


def has_segment(offsets: jnp.ndarray) -> jnp.ndarray:
    return offsets[1:] > offsets[:-1]


def _seg_scan(values: jnp.ndarray, heads: jnp.ndarray,
              combine: Callable) -> jnp.ndarray:
    """Inclusive segmented scan: within each run (delimited by heads),
    scan with ``combine``; runs reset at heads."""
    expand = heads
    if values.ndim > 1:
        expand = heads.reshape(heads.shape + (1,) * (values.ndim - 1))

    def op(a, b):
        af, av = a
        bf, bv = b
        keep = bf
        if values.ndim > 1:
            keep = bf.reshape(bf.shape + (1,) * (values.ndim - 1))
        return af | bf, jnp.where(keep, bv, combine(av, bv))

    _, scanned = jax.lax.associative_scan(op, (heads, values), axis=0)
    return scanned


def segment_reduce_sorted(values: jnp.ndarray, heads: jnp.ndarray,
                          last_pos: jnp.ndarray, has_seg: jnp.ndarray,
                          combine: Callable, identity) -> jnp.ndarray:
    """Reduce per-slot ``values`` into per-segment results.

    values: [E, ...]; heads: [E] bool; last_pos/has_seg: [S].
    Returns [S, ...]: combine-reduction of each segment's slots, or
    ``identity`` for empty segments."""
    scanned = _seg_scan(values, heads, combine)
    out = scanned[last_pos]
    mask = has_seg
    if values.ndim > 1:
        mask = has_seg.reshape(has_seg.shape + (1,) * (values.ndim - 1))
    return jnp.where(mask, out, identity)


def segment_sum_sorted(values, heads, last_pos, has_seg):
    return segment_reduce_sorted(values, heads, last_pos, has_seg,
                                 lambda a, b: a + b, 0)


def segment_max_sorted(values, heads, last_pos, has_seg, identity):
    return segment_reduce_sorted(values, heads, last_pos, has_seg,
                                 jnp.maximum, identity)


def segment_min_sorted(values, heads, last_pos, has_seg, identity):
    return segment_reduce_sorted(values, heads, last_pos, has_seg,
                                 jnp.minimum, identity)


def segment_or_sorted(values, heads, last_pos, has_seg):
    return segment_reduce_sorted(values, heads, last_pos, has_seg,
                                 lambda a, b: a | b, 0)


def segment_or_sorted_rows(values: jnp.ndarray, heads: jnp.ndarray,
                           last_pos: jnp.ndarray, has_seg: jnp.ndarray
                           ) -> jnp.ndarray:
    """Lane-major variant: values [W, E] scanned along axis 1 (heads [E],
    last_pos/has_seg [S]); returns [W, S]. Mirrors segment_or_sorted for the
    transposed packed-BFS layout."""
    flags = heads.reshape(1, -1)

    def op(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, av | bv)

    _, scanned = jax.lax.associative_scan(op, (flags, values), axis=1)
    return jnp.where(has_seg[None, :], scanned[:, last_pos], 0)
