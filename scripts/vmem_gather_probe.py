"""Can Mosaic vector-gather rows of a VMEM block by a dynamic index vector?

Decides whether the fused chunked-BFS kernel (scan + in-kernel compact
extraction, eliding the [Ec, W] scan-output write) is buildable: it needs
``out[j, :] = scanned[rel[j], :]`` vectorized inside the kernel. Tries
``jnp.take(..., axis=0)`` on a VMEM-resident block; falls back to reporting
the per-row dynamic-slice loop cost if take does not lower.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = os.environ.get("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    C, W = 1024, 256
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 1 << 32, size=(C, W), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, C, size=C).astype(np.int32))

    def take_kernel(idx_ref, vals_ref, out_ref):
        out_ref[:] = jnp.take(vals_ref[:], idx_ref[:], axis=0)

    def run_take():
        return pl.pallas_call(
            take_kernel,
            grid_spec=pl.GridSpec(
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((C,), lambda i: (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C, W), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((C, W), jnp.uint32),
        )(idx, vals)

    def loop_kernel(idx_ref, vals_ref, out_ref):
        def body(j, _):
            out_ref[pl.ds(j, 1), :] = vals_ref[pl.ds(idx_ref[j], 1), :]
            return 0
        jax.lax.fori_loop(0, C, body, 0)

    def run_loop():
        return pl.pallas_call(
            loop_kernel,
            grid_spec=pl.GridSpec(
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((C,), lambda i: (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C, W), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((C, W), jnp.uint32),
        )(idx, vals)

    want = np.asarray(vals)[np.asarray(idx)]
    for name, fn in [("take", run_take), ("dslice-loop", run_loop)]:
        try:
            out = fn()
            got = np.asarray(out)
            ok = bool((got == want).all())
            t0 = time.time()
            for _ in range(50):
                out = fn()
            np.asarray(out[0, :1])
            dt = (time.time() - t0) / 50
            print(f"{name}: lowered ok, correct={ok}, {dt * 1e6:.0f} us "
                  f"per [{C},{W}] block "
                  f"({C / dt / 1e6:.0f} Mrows/s)")
        except Exception as exc:  # noqa: BLE001 — report lowering failure
            print(f"{name}: FAILED — {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
