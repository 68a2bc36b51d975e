"""Pallas TPU kernel: segmented OR-scan over packed frontier words.

Replaces the XLA ``associative_scan`` in the packed MS-BFS expansion
(ops/msbfs_jax.py). Why: the XLA scan lowers to ~log2(E) slice/concat levels
over the full [E, W] array — at RMAT-18 shapes that graph OOM-kills the
local 2-core AOT compile helper and, when it does compile, re-reads the
array once per level (~23 passes of HBM traffic). This kernel is ONE pass:
a sequential grid over [C, W] chunks, a log2(C)-step in-register roll-OR
segmented scan per chunk, and a cross-chunk carry in VMEM scratch (TPU grid
steps run sequentially on the core, so the carry is exact).

Layout note: chunks are [C sublanes, W lanes]; W is the packed word count
(lanes/32), so W=128 (4096 BFS lanes) tiles vregs perfectly; smaller W pads
the lane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(vals_ref, heads_ref, out_ref, carry_ref, *, C: int):
    """One chunk: inclusive segmented OR-scan with carry-in from the
    previous chunk. heads are int32 (1 = first slot of a segment)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0, :] = jnp.zeros_like(carry_ref[0, :])

    v = vals_ref[:]                           # [C, W] uint32
    f = heads_ref[:]                          # [C, 1] int32 (Mosaic can't
    row = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)   # rotate i1)
    s = 1
    while s < C:
        v_s = pltpu.roll(v, s, axis=0)        # circular: row i <- i-s
        f_s = pltpu.roll(f, s, axis=0)
        wrap = row < s                        # rows whose source wrapped:
        v_s = jnp.where(wrap, jnp.uint32(0), v_s)   # identity (0, 0)
        f_s = jnp.where(wrap, 0, f_s)
        v = jnp.where(f != 0, v, v | v_s)
        f = f | f_s
        s *= 2
    # rows whose run started before this chunk (no head up to and incl. row)
    open_prefix = f == 0
    v = jnp.where(open_prefix, v | carry_ref[0, :][None, :], v)
    out_ref[:] = v
    carry_ref[0, :] = v[C - 1, :]


def _scan_rows_kernel(vals_ref, heads_ref, out_ref, carry_ref, *, C: int):
    """Transposed chunk: values [W, C] with the SCAN AXIS ALONG LANES —
    a [W, C] uint32 block occupies W*C/1024 vregs with full lane
    utilization, vs [C, W] wasting (128-W)/128 of every vreg when W < 128.
    Head flags are a single [1, C] row (shared across words), so the flag
    scan costs 1/W of the value scan."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[:, 0] = jnp.zeros_like(carry_ref[:, 0])

    v = vals_ref[:]                            # [W, C] uint32
    f = heads_ref[:]                           # [1, C] int32
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    s = 1
    while s < C:
        v_s = pltpu.roll(v, s, axis=1)         # circular: col i <- i-s
        f_s = pltpu.roll(f, s, axis=1)
        wrap = col < s                         # wrapped columns: identity
        v_s = jnp.where(wrap, jnp.uint32(0), v_s)
        f_s = jnp.where(wrap, 0, f_s)
        v = jnp.where(f != 0, v, v | v_s)      # [1,C] gate broadcasts over W
        f = f | f_s
        s *= 2
    open_prefix = f == 0                       # run started before the chunk
    v = jnp.where(open_prefix, v | carry_ref[:, 0][:, None], v)
    out_ref[:] = v
    carry_ref[:, 0] = v[:, C - 1]


@functools.partial(jax.jit, static_argnames=("chunk",))
def seg_or_scan_rows(values: jnp.ndarray, heads: jnp.ndarray,
                     chunk: int = 512) -> jnp.ndarray:
    """Inclusive segmented OR-scan of ``values`` [W, E] uint32 along axis 1
    with segment head flags ``heads`` [E] bool. E must be a multiple of
    ``chunk``. This is the lane-major layout the packed MS-BFS uses."""
    W, E = values.shape
    assert E % chunk == 0, (E, chunk)
    n_chunks = E // chunk
    heads_i = heads.astype(jnp.int32).reshape(1, E)
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((W, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, chunk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, 1), jnp.uint32)],
    )
    return pl.pallas_call(
        functools.partial(_scan_rows_kernel, C=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W, E), jnp.uint32),
    )(values, heads_i)


def _scan_kernel_carry(vals_ref, heads_ref, cin_ref, out_ref, cout_ref,
                       carry_ref, *, C: int):
    """Like _scan_kernel but with an explicit carry-in operand and carry-out
    output, so a [E, W] scan can be split across multiple kernel calls (the
    chunked wide-wave BFS expansion streams edge super-chunks and threads
    the open-segment carry between them)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0, :] = cin_ref[0, :]

    v = vals_ref[:]                           # [C, W] uint32
    f = heads_ref[:]                          # [C, 1] int32
    row = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    s = 1
    while s < C:
        v_s = pltpu.roll(v, s, axis=0)
        f_s = pltpu.roll(f, s, axis=0)
        wrap = row < s
        v_s = jnp.where(wrap, jnp.uint32(0), v_s)
        f_s = jnp.where(wrap, 0, f_s)
        v = jnp.where(f != 0, v, v | v_s)
        f = f | f_s
        s *= 2
    open_prefix = f == 0
    v = jnp.where(open_prefix, v | carry_ref[0, :][None, :], v)
    out_ref[:] = v
    carry_ref[0, :] = v[C - 1, :]
    cout_ref[0, :] = v[C - 1, :]


def _scan_rows_kernel_carry(vals_ref, heads_ref, cin_ref, out_ref, cout_ref,
                            carry_ref, *, C: int):
    """Lane-major twin of _scan_kernel_carry: values [W, C] scanned along
    lanes with an explicit carry-in column and carry-out output."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[:, 0] = cin_ref[:, 0]

    v = vals_ref[:]                            # [W, C] uint32
    f = heads_ref[:]                           # [1, C] int32
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    s = 1
    while s < C:
        v_s = pltpu.roll(v, s, axis=1)
        f_s = pltpu.roll(f, s, axis=1)
        wrap = col < s
        v_s = jnp.where(wrap, jnp.uint32(0), v_s)
        f_s = jnp.where(wrap, 0, f_s)
        v = jnp.where(f != 0, v, v | v_s)
        f = f | f_s
        s *= 2
    open_prefix = f == 0
    v = jnp.where(open_prefix, v | carry_ref[:, 0][:, None], v)
    out_ref[:] = v
    carry_ref[:, 0] = v[:, C - 1]
    cout_ref[:, 0] = v[:, C - 1]


@functools.partial(jax.jit, static_argnames=("chunk",))
def seg_or_scan_rows_carry(values: jnp.ndarray, heads: jnp.ndarray,
                           carry_in: jnp.ndarray, chunk: int = 512):
    """Lane-major segmented OR-scan of ``values`` [W, E] along axis 1 with
    the leading open segment primed by ``carry_in`` [W, 1]. Returns
    (scanned [W, E], carry_out [W, 1])."""
    W, E = values.shape
    assert E % chunk == 0, (E, chunk)
    n_chunks = E // chunk
    heads_i = heads.astype(jnp.int32).reshape(1, E)
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((W, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((W, 1), jnp.uint32)],
    )
    return pl.pallas_call(
        functools.partial(_scan_rows_kernel_carry, C=chunk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((W, E), jnp.uint32),
                   jax.ShapeDtypeStruct((W, 1), jnp.uint32)],
    )(values, heads_i, carry_in)


@functools.partial(jax.jit, static_argnames=("chunk",))
def seg_or_scan_packed_carry(values: jnp.ndarray, heads: jnp.ndarray,
                             carry_in: jnp.ndarray, chunk: int = 512):
    """Inclusive segmented OR-scan of ``values`` [E, W] uint32 (heads [E]
    bool) whose leading open segment is primed with ``carry_in`` [1, W] —
    the running OR of that segment's rows from earlier super-chunks.
    Returns (scanned [E, W], carry_out [1, W])."""
    E, W = values.shape
    if W < 128:
        # Mosaic faults on sub-vreg lane widths (the round-2 scale-23
        # W=48 TPU-worker crash): pad the word axis to one full vreg; pad
        # lanes carry zeros through the OR-scan and are sliced off after.
        Wp = 128
        out, carry = seg_or_scan_packed_carry(
            jnp.pad(values, ((0, 0), (0, Wp - W))), heads,
            jnp.pad(carry_in, ((0, 0), (0, Wp - W))), chunk)
        return out[:, :W], carry[:, :W]
    assert E % chunk == 0, (E, chunk)
    n_chunks = E // chunk
    heads_i = heads.astype(jnp.int32).reshape(E, 1)
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, W), jnp.uint32)],
    )
    return pl.pallas_call(
        functools.partial(_scan_kernel_carry, C=chunk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, W), jnp.uint32),
                   jax.ShapeDtypeStruct((1, W), jnp.uint32)],
    )(values, heads_i, carry_in)


@functools.partial(jax.jit, static_argnames=("chunk",))
def seg_or_scan_packed(values: jnp.ndarray, heads: jnp.ndarray,
                       chunk: int = 512) -> jnp.ndarray:
    """Inclusive segmented OR-scan of ``values`` [E, W] uint32 with segment
    head flags ``heads`` [E] bool. E must be a multiple of ``chunk``."""
    E, W = values.shape
    assert E % chunk == 0, (E, chunk)
    n_chunks = E // chunk
    heads_i = heads.astype(jnp.int32).reshape(E, 1)
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.uint32)],
    )
    return pl.pallas_call(
        functools.partial(_scan_kernel, C=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, W), jnp.uint32),
    )(values, heads_i)
