"""Run the reference's SQLLogicTest corpus (the behavioral spec; SURVEY.md §4)
against this engine. One pytest per .test file."""

import glob
import os

import pytest

from duckpgq_tpu.testing.sqllogic import SQLLogicRunner

from .conftest import REFERENCE_ROOT, requires_reference

# Files whose remaining records require capabilities outside this framework's
# scope (none at present: .duckdb binary storage files are read natively by
# duckpgq_tpu/io/duckdb_file.py).
KNOWN_UNSUPPORTED = {}


def _corpus_files():
    root = os.path.join(REFERENCE_ROOT, "test", "sql")
    files = sorted(glob.glob(os.path.join(root, "**", "*.test"),
                             recursive=True) +
                   glob.glob(os.path.join(root, "**", "*.test_slow"),
                             recursive=True))
    return [os.path.relpath(f, root) for f in files]


def _run_one(relpath):
    if relpath in KNOWN_UNSUPPORTED:
        pytest.skip(KNOWN_UNSUPPORTED[relpath])
    runner = SQLLogicRunner(base_path=REFERENCE_ROOT)
    result = runner.run_file(
        os.path.join(REFERENCE_ROOT, "test", "sql", relpath))
    if result.skipped_file:
        pytest.skip(result.skipped_file)
    failures = result.failures
    assert not failures, "\n".join(
        f"line {r.record.line}: {r.message}" for r in failures)


@requires_reference
@pytest.mark.parametrize("relpath", _corpus_files())
def test_corpus_file(relpath):
    _run_one(relpath)


@requires_reference
@pytest.mark.parametrize("relpath", [
    f for f in _corpus_files()
    if f.replace("\\", "/").startswith(("scalar/", "path_finding/",
                                        "snb/"))])
def test_corpus_file_mesh_kernels(relpath, monkeypatch):
    """Fourth corpus parameterization (VERDICT r2 item 1): scalar/* +
    path_finding/* + snb/* with every graph kernel routed through the
    DISTRIBUTED mesh implementations on the 8-device virtual CPU mesh
    (DUCKPGQ_MESH_DEVICES=8 -> parallel/sql_mesh): partitioned-ring BFS,
    dist parents + host stitch, dist Bellman-Ford, f64 dist PageRank
    (V+2 quirk), dist Boruvka-MSF WCC + host replay, dist LCC — results
    must be bit-identical to the single-device backends."""
    monkeypatch.setenv("DUCKPGQ_MESH_DEVICES", "8")
    _run_one(relpath)


@requires_reference
@pytest.mark.parametrize("relpath", [
    f for f in _corpus_files()
    if f.replace("\\", "/").startswith(("scalar/", "path_finding/",
                                        "snb/"))])
def test_corpus_file_force_device_kernels(relpath, monkeypatch):
    """scalar/* + path_finding/* with every graph kernel forced through the
    TPU device path (DUCKPGQ_DEVICE_MIN_EDGES=0): iterativelength (+2,
    bidirectional), shortestpath, reachability, cheapest_path_length,
    pagerank, weakly_connected_component, local_clustering_coefficient —
    the full reference scalar surface (scalar.hpp:7-20) — must be
    bit-identical to the host backends."""
    monkeypatch.setenv("DUCKPGQ_DEVICE_MIN_EDGES", "0")
    _run_one(relpath)


@requires_reference
@pytest.mark.parametrize("relpath", _corpus_files())
def test_corpus_file_device_rel(relpath, monkeypatch):
    """Whole corpus again with MATCH-binding joins forced through the
    device relational backend (ops/rel.py) — row ORDER must be identical
    to the host backends (strict ordered comparison enforces it)."""
    monkeypatch.setenv("DUCKPGQ_DEVICE_REL", "1")
    _run_one(relpath)
