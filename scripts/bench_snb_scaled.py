"""Scaled SNB-shape benchmark (BASELINE.md measurement config 3 stand-in).

LDBC SF1 data is not bundled and the environment has no egress, so this
generates a Person/Person_knows_person graph at SF1-like scale (~10.6k
persons, ~180k knows edges, power-law degrees via RMAT) and runs the same
query shapes as config 3: multi-source BFS (quantified ANY SHORTEST) and
the 2-hop MATCH binding — through the full SQL stack (parquet ingest,
CREATE PROPERTY GRAPH, transpile, CSR build, device kernels).

Prints one JSON line per metric (informational; the driver's headline
metric stays bench.py's GTEPS).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import duckpgq_tpu
from duckpgq_tpu.io.parquet import write_parquet
from duckpgq_tpu.storage.vector import Vector
from duckpgq_tpu.types import BIGINT, VARCHAR
from duckpgq_tpu.utils.rmat import rmat_edges

# BENCH_SF picks LDBC-like scale: 1 -> ~10.6k persons / 180k knows,
# 10 -> ~73k persons / 1.9M knows (SF10-equivalent row counts)
_SF = os.environ.get("BENCH_SF", "1")
_SF_DEFAULTS = {"1": (10620, 180000), "10": (73000, 1900000)}
_P_DEF, _K_DEF = _SF_DEFAULTS.get(_SF, _SF_DEFAULTS["1"])
N_PERSON = int(os.environ.get("BENCH_PERSONS", str(_P_DEF)))
N_KNOWS = int(os.environ.get("BENCH_KNOWS", str(_K_DEF)))


def main():
    # the relational device backend is exercised on whatever backend JAX
    # has; on this machine force CPU BEFORE first device use (the axon TPU
    # plugin overrides JAX_PLATFORMS=cpu) unless the user asks for TPU —
    # join columns/results ship per query, which the ~0.1 MB/s tunnel
    # would turn into a transfer benchmark
    if os.environ.get("BENCH_REL_DEVICE", "cpu") == "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    rng = np.random.default_rng(42)
    scale = int(np.ceil(np.log2(N_PERSON)))
    # oversample 4x: the keep-filter (ids < N_PERSON, no self loops) drops
    # a large skew-dependent fraction when N_PERSON < 2**scale
    src, dst = rmat_edges(scale, max(4 * N_KNOWS // (1 << scale), 1),
                          seed=7)
    keep = (src < N_PERSON) & (dst < N_PERSON) & (src != dst)
    src, dst = src[keep][:N_KNOWS], dst[keep][:N_KNOWS]
    person_ids = np.arange(N_PERSON, dtype=np.int64) * 10 + 933  # SNB-ish ids

    tmp = tempfile.mkdtemp(prefix="snb_scaled_")
    write_parquet(os.path.join(tmp, "person.parquet"), ["id", "name"], [
        Vector.from_values(person_ids.tolist(), BIGINT),
        Vector.from_values([f"p{i}" for i in range(N_PERSON)], VARCHAR)])
    write_parquet(os.path.join(tmp, "knows.parquet"),
                  ["Person1Id", "Person2Id"], [
        Vector.from_values(person_ids[src].tolist(), BIGINT),
        Vector.from_values(person_ids[dst].tolist(), BIGINT)])

    con = duckpgq_tpu.connect()
    t0 = time.time()
    con.execute(f"CREATE TABLE Person AS FROM read_parquet("
                f"'{tmp}/person.parquet')")
    con.execute(f"CREATE TABLE Person_knows_person AS FROM read_parquet("
                f"'{tmp}/knows.parquet')")
    load_s = time.time() - t0
    print(f"# generated SNB-shape graph: {N_PERSON} persons, {len(src)} "
          f"knows; ingest {load_s:.2f}s", file=sys.stderr)

    con.execute("""
    CREATE PROPERTY GRAPH snb
    VERTEX TABLES (Person LABEL Person)
    EDGE TABLES (
        Person_knows_person SOURCE KEY (Person1Id) REFERENCES Person (id)
                            DESTINATION KEY (Person2Id) REFERENCES Person (id)
                            LABEL Knows)
    """)

    # multi-source BFS through the SQL surface: ANY SHORTEST from a bounded
    # source set to every person (source x person pairs run through the
    # 512-lane MS-BFS in batches)
    n_src = int(os.environ.get("BENCH_SOURCES", "4"))
    src_ids = ", ".join(str(i) for i in
                        person_ids[rng.integers(0, N_PERSON, size=n_src)])
    q_path = f"""
    SELECT count(*) FROM GRAPH_TABLE (snb
      MATCH p = ANY SHORTEST (a:Person WHERE a.id IN ({src_ids}))
                -[k:Knows]->{{1,4}}(b:Person)
      COLUMNS (a.id AS aid, b.id AS bid, path_length(p) AS len)) t
    """
    pairs = n_src * N_PERSON
    t0 = time.time()
    rows = con.execute(q_path).fetchall()
    path_s = time.time() - t0
    print(f"# bounded shortest-path: {rows[0][0]} reached of {pairs} pairs "
          f"in {path_s:.2f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "snb_scaled_shortest_path_pairs_per_s",
        "value": round(pairs / path_s, 1), "unit": "pairs/s",
        "detail": {"persons": N_PERSON, "knows": int(len(src)),
                   "reached": int(rows[0][0]),
                   "seconds": round(path_s, 3)}}))

    # source filters keep binding counts tractable as SF scales the edge
    # count (bindings grow ~cubically in degree for 3 hops)
    div2, div3 = (40, 36500) if _SF == "10" else (10, 100)
    hop_src = int(os.environ.get("BENCH_2HOP_MAXID",
                                 str(person_ids[max(N_PERSON // div2, 1)])))
    q_2hop = f"""
    SELECT count(*) FROM GRAPH_TABLE (snb
      MATCH (a:Person)-[k1:Knows]->(b:Person)-[k2:Knows]->(c:Person)
      WHERE a.id <> c.id AND a.id < {hop_src}
      COLUMNS (a.id AS aid, c.id AS cid)) t
    """
    hop3_src = person_ids[max(N_PERSON // div3, 1)]
    q_3hop = f"""
    SELECT count(*) FROM GRAPH_TABLE (snb
      MATCH (a:Person)-[k1:Knows]->(b:Person)-[k2:Knows]->(c:Person)
                      -[k3:Knows]->(d:Person)
      WHERE a.id < {hop3_src}
      COLUMNS (a.id AS aid, d.id AS did)) t
    """
    # MATCH-binding throughput: the same query on the host relational
    # backend and forced through the device joins (ops/rel.py) — the
    # "SNB pattern-query rows/s" north-star comparison
    backends = os.environ.get("BENCH_REL_BACKENDS", "host,device").split(",")
    prev = os.environ.get("DUCKPGQ_DEVICE_REL")
    counts = {}
    for hops, q in (("2hop", q_2hop), ("3hop", q_3hop)):
        for backend in backends:
            os.environ["DUCKPGQ_DEVICE_REL"] = \
                "1" if backend == "device" else "0"
            t0 = time.time()
            rows = con.execute(q).fetchall()
            hop_s = time.time() - t0
            n_bind = int(rows[0][0])
            if hops in counts:
                assert counts[hops] == n_bind, (backend, counts[hops],
                                                n_bind)
            counts[hops] = n_bind
            print(f"# {hops} MATCH [{backend}]: {n_bind} bindings in "
                  f"{hop_s:.2f}s", file=sys.stderr)
            print(json.dumps({
                "metric": f"snb_scaled_{hops}_bindings_per_s_{backend}",
                "value": round(n_bind / hop_s, 1), "unit": "rows/s",
                "detail": {"bindings": n_bind, "sf": _SF,
                           "seconds": round(hop_s, 3)}}))
    if prev is None:
        os.environ.pop("DUCKPGQ_DEVICE_REL", None)
    else:
        os.environ["DUCKPGQ_DEVICE_REL"] = prev


if __name__ == "__main__":
    main()
