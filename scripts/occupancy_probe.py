"""Measured wide-wave frontier occupancy profile (VERDICT r4 item 10).

Runs the production chunked wave config at a given scale/width, stepping
ONE iteration per dispatch, and after each iteration pulls two scalars:
nonzero frontier words and total set bits. The per-iteration nonzero-word
ratio is exactly the compressed-ring exchange ratio at that width (the
ring ships only nonzero words + a word bitmap), so this replaces the
128/512-lane extrapolation in BASELINE.md's DCN projection with a
measured W-wide profile.

Usage (TPU):  python scripts/occupancy_probe.py
Env: PROBE_SCALE (18), PROBE_LANES (0 = auto plan, the bench width),
     PROBE_ITERS (16), PROBE_SEEDS (seed count = lanes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: F401
    import jax.numpy as jnp

    from duckpgq_tpu.ops import msbfs_jax as dev
    from duckpgq_tpu.ops.csr_jax import build_lengths_csr_on_device
    from duckpgq_tpu.utils.rmat import rmat_edges_device

    scale = int(os.environ.get("PROBE_SCALE", "18"))
    want_lanes = int(os.environ.get("PROBE_LANES", "0"))
    max_iters = int(os.environ.get("PROBE_ITERS", "16"))
    v = 1 << scale
    t0 = time.time()
    src_d, dst_d = rmat_edges_device(scale, 16, seed=11)
    csr = build_lengths_csr_on_device(v, src_d, dst_d)
    np.asarray(csr.in_offsets[-1:])
    print(f"# csr built: {time.time() - t0:.1f}s", file=sys.stderr)
    plan = dev.plan_packed_wave(csr, lanes=want_lanes or None)
    lanes = plan.lanes
    W = lanes // 32
    print(f"# plan: {lanes} lanes (W={W}), K={plan.n_chunks}",
          file=sys.stderr)

    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, v, size=lanes).astype(np.int32))
    active = jnp.ones(lanes, dtype=bool)

    # production edge-major state + body (bit-identical op sequence)
    word_of_lane, bit_of_lane, searching, result = dev._wave_state_jit(
        src, dst, active)
    frontier, seen = dev._chunked_wave_init(csr, src, word_of_lane,
                                            bit_of_lane, searching,
                                            lane_major=False)
    body = dev._chunked_wave_body(csr, plan, src, dst, word_of_lane,
                                  bit_of_lane, searching,
                                  use_pallas=False)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state):
        # donated: at W=2048 each state buffer is 2.15 GB — in/out copies
        # without donation OOM the chip at iteration 2
        return body(state)

    @jax.jit
    def occ(frontier):
        nz = (frontier != 0).sum()
        bits = jax.lax.population_count(frontier).sum()
        return nz, bits

    state = (jnp.int32(1), frontier, seen, result)
    total_words = (csr.vpad + 1) * W
    print("iter,nonzero_words,total_words,ratio,set_bits")
    t0 = time.time()
    for it in range(1, max_iters + 1):
        state = step(state)
        nz, bits = occ(state[1])
        nz = int(np.asarray(nz))
        bits = int(np.asarray(bits))
        print(f"{it},{nz},{total_words},{nz / total_words:.6f},{bits}",
              flush=True)
        if nz == 0:
            break
    print(f"# probe wall: {time.time() - t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
