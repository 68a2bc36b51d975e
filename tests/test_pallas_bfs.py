"""Pallas BFS kernel validated in interpret mode against the host mirrors
(real-TPU timing happens in bench.py)."""

import numpy as np
import pytest

from duckpgq_tpu.ops import msbfs as host_msbfs
from duckpgq_tpu.ops.csr import build_csr


@pytest.mark.parametrize("seed,v,e", [(4, 200, 800), (8, 64, 96)])
def test_pallas_bfs_interpret_matches_host(seed, v, e):
    from jax.experimental.pallas import tpu as pltpu

    from duckpgq_tpu.kernels.bfs_pallas import PallasBFS, pack_csr

    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    packed = pack_csr(v, src, dst)
    assert packed is not None
    qs = rng.integers(0, v, size=64).astype(np.int64)
    qd = rng.integers(0, v, size=64).astype(np.int64)
    qs[2] = qd[2]
    with pltpu.force_tpu_interpret_mode():
        bfs = PallasBFS(packed, lanes=64)
        res, traversed = bfs.run(qs, qd)
    csr = build_csr(v, src, dst, np.arange(e, dtype=np.int64))
    want, valid = host_msbfs.iterative_length(csr, qs, qd)
    np.testing.assert_array_equal(res, np.where(valid, want, -1))
    assert traversed > 0
