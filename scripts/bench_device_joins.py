"""Device-resident MATCH-binding join benchmark on the REAL TPU
(VERDICT r2 item 4: "benchmark device joins on the actual TPU").

The SQL-stack device-join comparison had to run on the CPU backend because
it ships join columns and result indices host<->device per query — over
this environment's ~0.1 MB/s tunnel that measures the link, not the joins.
This bench applies the bench.py trick to the JOIN pipeline instead:

- the Person/knows tables are GENERATED ON DEVICE (skewed endpoints from
  the same RMAT generator, folded into the person range);
- the whole 2-hop / 3-hop MATCH binding pipeline — per-hop count pass,
  padded expansion, endpoint gathers, the a.id < lim and a != c filters —
  runs on device via the ops/rel.py kernels (_join_count/_join_expand,
  the same code the SQL executor routes to);
- intermediate bindings stay device-resident index arrays; ONLY the final
  int64 binding count is pulled.

Correctness of the device pipeline vs the host executor's join
(exec/join.equi_join_pairs ordering contract) is covered by
tests/test_device_rel.py and the DUCKPGQ_DEVICE_REL=1 corpus run; this
script is the throughput measurement at SF scale.

Env: BENCH_SF (1|10), BENCH_RUNS, BENCH_HOST=1 to also run the numpy host
mirror on an identically-shaped host-generated graph (for the rows/s
comparison without shipping edges over the tunnel).
Prints one JSON line per metric.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    if os.environ.get("BENCH_FORCE_CPU", "0") == "1":
        # the axon plugin overrides JAX_PLATFORMS=cpu; config wins
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_LOCAL_CACHE", "/root/repo/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except (OSError, AttributeError):
        pass

    from duckpgq_tpu.ops.csr_jax import pad_bucket
    from duckpgq_tpu.ops.rel import (_join_count, _join_count_dense,
                                     _join_expand)
    from duckpgq_tpu.utils.rmat import rmat_edges_device

    sf = os.environ.get("BENCH_SF", "10")
    n_person, n_knows = {"1": (10620, 180000),
                         "10": (73000, 1900000)}.get(sf, (73000, 1900000))
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    dev = jax.devices()[0]
    print(f"# device joins: SF{sf} persons={n_person} knows={n_knows} "
          f"device={dev}", file=sys.stderr)

    # ---- generate the knows edge table ON DEVICE (skewed RMAT endpoints
    # folded into [0, n_person)) -------------------------------------
    t0 = time.time()
    scale = int(np.ceil(np.log2(n_person)))
    factor = max((n_knows + (1 << scale) - 1) // (1 << scale), 1)
    s_d, d_d = rmat_edges_device(scale, factor, seed=13)
    src = (jnp.asarray(s_d, jnp.int32) % n_person)[:n_knows]
    dst = (jnp.asarray(d_d, jnp.int32) % n_person)[:n_knows]
    src.block_until_ready()
    e = int(src.shape[0])
    print(f"# edge gen on device: {e} edges, {time.time() - t0:.1f}s",
          file=sys.stderr)

    lim = int((n_person // 40) )  # same selectivity as the SQL bench
    dom = pad_bucket(n_person)  # dense code-domain offsets (round 4)

    @jax.jit
    def total_of(cnt):
        return cnt.astype(jnp.int64).sum()

    @jax.jit
    def hop1_codes(src, dst):
        # edges whose source passes the a.id < lim filter probe with their
        # dst; filtered-out rows get a never-matching sentinel
        return jnp.where(src < lim, dst, jnp.int32(-1))

    def run_2hop():
        probe = hop1_codes(src, dst)
        order, lo, offs, cnt = _join_count_dense(probe, src, dom)
        n = int(total_of(cnt))
        cap = pad_bucket(n)
        li, ri = _join_expand(order, lo, offs, cap)
        c = _count_2hop(li, ri, src, dst, jnp.int64(n))
        return int(c)

    @jax.jit
    def _count_2hop(li, ri, src, dst, n):
        t = jnp.arange(li.shape[0], dtype=jnp.int64)
        valid = t < n
        aid = src[li]
        cid = dst[ri]
        return (valid & (aid != cid)).astype(jnp.int64).sum()

    def run_3hop(lim3):
        probe = jnp.where(src < lim3, dst, jnp.int32(-1))
        order, lo, offs, cnt = _join_count_dense(probe, src, dom)
        n1 = int(total_of(cnt))
        cap1 = pad_bucket(n1)
        li1, ri1 = _join_expand(order, lo, offs, cap1)
        probe2 = _chain_codes(ri1, dst, jnp.int64(n1))
        order2, lo2, offs2, cnt2 = _join_count_dense(probe2, src, dom)
        n2 = int(total_of(cnt2))
        cap2 = pad_bucket(n2)
        li2, ri2 = _join_expand(order2, lo2, offs2, cap2)
        c = _count_3hop(li1, li2, ri2, src, dst, jnp.int64(n2))
        return int(c)

    @jax.jit
    def _chain_codes(ri, dst, n):
        t = jnp.arange(ri.shape[0], dtype=jnp.int64)
        return jnp.where(t < n, dst[ri], jnp.int32(-1))

    @jax.jit
    def _count_3hop(li1, li2, ri2, src, dst, n):
        t = jnp.arange(li2.shape[0], dtype=jnp.int64)
        valid = t < n
        return valid.astype(jnp.int64).sum()

    # selectivities matching scripts/bench_snb_scaled.py
    lim3 = max(n_person // 36500, 1) if sf == "10" else \
        max(n_person // 100, 1)

    for name, fn in (("2hop", run_2hop), ("3hop", lambda: run_3hop(lim3))):
        cnt = fn()  # warmup/compile
        times = []
        for _ in range(runs):
            t0 = time.time()
            c = fn()
            times.append(time.time() - t0)
        t = sorted(times)[len(times) // 2]
        print(f"# {name}: {cnt} bindings in {t:.3f}s "
              f"({['%.3f' % x for x in times]})", file=sys.stderr)
        print(json.dumps({
            "metric": f"device_join_{name}_rows_per_s",
            "value": round(cnt / t, 1),
            "unit": "rows/s",
            "detail": {"bindings": int(cnt), "seconds": round(t, 4),
                       "sf": sf, "backend": str(dev)}}))

    if os.environ.get("BENCH_HOST", "0") == "1":
        # numpy host mirror on an identically-shaped host graph
        from duckpgq_tpu.exec.join import equi_join_pairs
        rng = np.random.default_rng(13)
        hsrc = rng.integers(0, n_person, size=e).astype(np.int64)
        hdst = rng.integers(0, n_person, size=e).astype(np.int64)
        def host_2hop():
            sel = hsrc < lim
            li, ri = equi_join_pairs(
                np.where(sel, hdst, -1), hsrc, None, None)
            return int((hsrc[li] != hdst[ri]).sum())
        cnt = host_2hop()
        times = []
        for _ in range(runs):
            t0 = time.time()
            host_2hop()
            times.append(time.time() - t0)
        t = sorted(times)[len(times) // 2]
        print(json.dumps({
            "metric": "host_join_2hop_rows_per_s",
            "value": round(cnt / t, 1), "unit": "rows/s",
            "detail": {"bindings": cnt, "seconds": round(t, 4)}}))


if __name__ == "__main__":
    main()
