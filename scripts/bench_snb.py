"""SNB SF0.003 end-to-end benchmark (BASELINE.md measurement config 1):
full-stack SQL — import parquet, CREATE PROPERTY GRAPH, CSR build +
shortest-path MATCH over Person-knows-Person, and a 2-hop pattern binding.

Prints one JSON line per metric (informational; the driver's headline metric
stays bench.py's GTEPS).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckpgq_tpu

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")


def main():
    os.chdir(REFERENCE_ROOT)  # load.sql uses relative paths
    con = duckpgq_tpu.connect()
    t0 = time.time()
    con.execute("import database 'data/SNB0.003'")
    load_s = time.time() - t0
    n_person = con.execute("SELECT count(*) FROM Person").fetchall()[0][0]
    n_knows = con.execute(
        "SELECT count(*) FROM Person_knows_person").fetchall()[0][0]
    print(f"# loaded SNB SF0.003: {n_person} persons, {n_knows} knows "
          f"in {load_s:.2f}s", file=sys.stderr)

    con.execute("""
    CREATE PROPERTY GRAPH snb
    VERTEX TABLES (Person LABEL Person)
    EDGE TABLES (
        Person_knows_person SOURCE KEY (Person1Id) REFERENCES Person (id)
                            DESTINATION KEY (Person2Id) REFERENCES Person (id)
                            LABEL Knows)
    """)

    # config 1: CSR build + shortest path lengths over all person pairs
    # reachable within 3 hops (quantified ANY SHORTEST)
    q_path = """
    SELECT count(*), sum(len) FROM GRAPH_TABLE (snb
      MATCH p = ANY SHORTEST (a:Person)-[k:Knows]->{1,3}(b:Person)
      COLUMNS (path_length(p) AS len)) t
    """
    t0 = time.time()
    rows = con.execute(q_path).fetchall()
    path_s = time.time() - t0
    pairs = rows[0][0]
    print(f"# shortest-path MATCH: {pairs} pairs in {path_s:.2f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "snb003_shortest_path_pairs_per_s",
        "value": round(pairs / path_s, 1), "unit": "pairs/s",
        "detail": {"pairs": int(pairs), "seconds": round(path_s, 3)}}))

    # config 2 shape: 2-hop MATCH pattern binding (join + filter + aggregate)
    q_2hop = """
    SELECT count(*) FROM GRAPH_TABLE (snb
      MATCH (a:Person)-[k1:Knows]->(b:Person)-[k2:Knows]->(c:Person)
      WHERE a.id <> c.id
      COLUMNS (a.id AS aid, c.id AS cid)) t
    """
    t0 = time.time()
    rows = con.execute(q_2hop).fetchall()
    hop_s = time.time() - t0
    bindings = rows[0][0]
    print(f"# 2-hop MATCH: {bindings} bindings in {hop_s:.2f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "snb003_2hop_bindings_per_s",
        "value": round(bindings / hop_s, 1), "unit": "rows/s",
        "detail": {"bindings": int(bindings), "seconds": round(hop_s, 3)}}))


if __name__ == "__main__":
    main()
