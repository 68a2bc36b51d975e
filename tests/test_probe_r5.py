"""Round-5 self-probe battery as a regression suite: every case in
scripts/probe_r5.py (DuckDB-host semantics for classes the corpus and
prior differential families never exercised — star modifiers, macros,
ON CONFLICT, EXCLUDE frames, temporal series, decimal-in-list payloads,
date_part field set, implicit VARCHAR arithmetic casts, ...) must keep
passing. The script exits non-zero on any divergence."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_probe_battery():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "probe_r5.py")],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]


def test_constraint_enforcement():
    import duckpgq_tpu
    import pytest
    from duckpgq_tpu.errors import DuckPGQError
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE ck(a INT CHECK (a > 0), b INT UNIQUE)")
    con.execute("INSERT INTO ck VALUES (1, 9)")
    with pytest.raises(DuckPGQError, match="CHECK constraint"):
        con.execute("INSERT INTO ck VALUES (-1, 8)")
    with pytest.raises(DuckPGQError, match="unique constraint"):
        con.execute("INSERT INTO ck VALUES (2, 9)")
    with pytest.raises(DuckPGQError, match="CHECK constraint"):
        con.execute("UPDATE ck SET a = -5")
    con.execute("CREATE TABLE pa(id INT PRIMARY KEY)")
    con.execute("INSERT INTO pa VALUES (1)")
    con.execute("CREATE TABLE ch(pid INT REFERENCES pa(id))")
    with pytest.raises(DuckPGQError, match="foreign key"):
        con.execute("INSERT INTO ch VALUES (5)")
    con.execute("INSERT INTO ch VALUES (1)")
    with pytest.raises(DuckPGQError, match="foreign key"):
        con.execute("DELETE FROM pa WHERE id = 1")
    con.execute("DELETE FROM ch")
    con.execute("DELETE FROM pa WHERE id = 1")
    # UPDATE that collides primary keys
    con.execute("CREATE TABLE pu(id INT PRIMARY KEY)")
    con.execute("INSERT INTO pu VALUES (1), (2)")
    with pytest.raises(DuckPGQError, match="primary key"):
        con.execute("UPDATE pu SET id = 1 WHERE id = 2")
