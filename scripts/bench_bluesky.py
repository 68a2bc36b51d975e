"""Bluesky follow-graph benchmark (BASELINE.md measurement config 2):
ATTACH the reference's binary ``bluesky.duckdb`` (read natively by
duckpgq_tpu/io/duckdb_file.py), CREATE PROPERTY GRAPH over account/follows,
and time the 2-hop MATCH pattern binding (hash join + filter + aggregate).

Prints one JSON line per metric (informational; the driver's headline
metric stays bench.py's GTEPS).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckpgq_tpu

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
REPEATS = int(os.environ.get("BENCH_REPEATS", "50"))


def main():
    con = duckpgq_tpu.connect()
    con.database.base_path = REFERENCE_ROOT
    t0 = time.time()
    con.execute("ATTACH 'data/bluesky/bluesky.duckdb' (READ_ONLY)")
    attach_s = time.time() - t0
    n_acc = con.execute(
        "SELECT count(*) FROM bluesky.account").fetchall()[0][0]
    n_fol = con.execute(
        "SELECT count(*) FROM bluesky.follows").fetchall()[0][0]
    print(f"# attached bluesky.duckdb: {n_acc} accounts, {n_fol} follows "
          f"in {attach_s:.3f}s", file=sys.stderr)

    con.execute("""
    CREATE PROPERTY GRAPH bluesky
    VERTEX TABLES (bluesky.account LABEL account)
    EDGE TABLES (
        bluesky.follows SOURCE KEY (source) REFERENCES bluesky.account (did)
                        DESTINATION KEY (destination)
                            REFERENCES bluesky.account (did)
        LABEL follows)
    """)

    q = """
    SELECT count(*) AS paths, count(DISTINCT a_id) AS sources
    FROM GRAPH_TABLE (bluesky
      MATCH (a:account)-[f:follows]->(b:account)-[g:follows]->(c:account)
      WHERE a.did <> c.did
      COLUMNS (a.did AS a_id, c.did AS c_id)) t
    """
    rows = con.execute(q).fetchall()   # warm caches
    t0 = time.time()
    for _ in range(REPEATS):
        rows = con.execute(q).fetchall()
    dt = (time.time() - t0) / REPEATS
    print(f"# 2-hop MATCH binding: {rows[0][0]} paths, "
          f"{rows[0][1]} sources, {dt * 1e3:.2f} ms/query", file=sys.stderr)
    print(json.dumps({
        "metric": "bluesky_2hop_match_queries_per_s",
        "value": round(1.0 / dt, 1), "unit": "queries/s",
        "detail": {"paths": int(rows[0][0]),
                   "ms_per_query": round(dt * 1e3, 3)}}))


if __name__ == "__main__":
    main()
