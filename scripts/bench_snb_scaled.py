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

N_PERSON = int(os.environ.get("BENCH_PERSONS", str(10620)))
N_KNOWS = int(os.environ.get("BENCH_KNOWS", str(180000)))


def main():
    rng = np.random.default_rng(42)
    scale = int(np.ceil(np.log2(N_PERSON)))
    src, dst = rmat_edges(scale, max(N_KNOWS // (1 << scale), 1), seed=7)
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

    hop_src = int(os.environ.get("BENCH_2HOP_MAXID",
                                 str(person_ids[max(N_PERSON // 10, 1)])))
    q_2hop = f"""
    SELECT count(*) FROM GRAPH_TABLE (snb
      MATCH (a:Person)-[k1:Knows]->(b:Person)-[k2:Knows]->(c:Person)
      WHERE a.id <> c.id AND a.id < {hop_src}
      COLUMNS (a.id AS aid, c.id AS cid)) t
    """
    t0 = time.time()
    rows = con.execute(q_2hop).fetchall()
    hop_s = time.time() - t0
    print(f"# 2-hop MATCH: {rows[0][0]} bindings in {hop_s:.2f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "snb_scaled_2hop_bindings_per_s",
        "value": round(rows[0][0] / hop_s, 1), "unit": "rows/s",
        "detail": {"bindings": int(rows[0][0]),
                   "seconds": round(hop_s, 3)}}))


if __name__ == "__main__":
    main()
