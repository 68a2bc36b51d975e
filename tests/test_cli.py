"""The interactive shell (python -m duckpgq_tpu)."""

import os
import subprocess
import sys


def test_cli_end_to_end(tmp_path):
    script = """
CREATE TABLE P(id BIGINT);
INSERT INTO P VALUES (0),(1),(2);
CREATE TABLE K(s BIGINT, d BIGINT);
INSERT INTO K VALUES (0,1),(1,2);
CREATE PROPERTY GRAPH g
  VERTEX TABLES (P LABEL p)
  EDGE TABLES (K SOURCE KEY (s) REFERENCES P (id)
                 DESTINATION KEY (d) REFERENCES P (id) LABEL k);
.graphs
SELECT * FROM GRAPH_TABLE (g MATCH (a:p)-[e:k]->(b:p)
  COLUMNS (a.id AS s, b.id AS d)) t ORDER BY s;
.tables
.exit
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "duckpgq_tpu"], input=script,
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    assert "g" in out.stdout            # .graphs
    assert "(2 rows)" in out.stdout     # MATCH result
    assert "Error" not in out.stdout


def test_cli_reports_errors_and_continues():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "duckpgq_tpu"],
        input="SELECT * FROM missing;\nSELECT 1 AS ok;\n.exit\n",
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    assert "Error" in out.stdout
    assert "ok" in out.stdout
