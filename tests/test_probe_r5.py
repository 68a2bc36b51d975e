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
