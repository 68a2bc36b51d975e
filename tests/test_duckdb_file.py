"""Unit tests for the DuckDB binary storage reader (io/duckdb_file.py)
against the reference's bundled bluesky.duckdb (v1.4-era file, storage
version 64)."""

import os

import pytest

from .conftest import REFERENCE_ROOT, requires_reference

BLUESKY = os.path.join(REFERENCE_ROOT, "data", "bluesky", "bluesky.duckdb")


@requires_reference
def test_catalog_and_rows():
    from duckpgq_tpu.io.duckdb_file import DuckDBFile

    f = DuckDBFile(BLUESKY)
    assert f.table_names() == [("main", "account"), ("main", "follows")]

    cols, data = f.read_table("account")
    assert [c.name for c in cols] == ["did", "displayName", "handle"]
    assert all(c.sql_type == "VARCHAR" for c in cols)
    rows = sorted(zip(*data))
    assert rows[0] == ("did:plc:alice", "Alice", "alice.test")
    assert len(rows) == 4

    cols, data = f.read_table("follows")
    assert [c.name for c in cols] == ["source", "destination"]
    assert sorted(zip(*data)) == [
        ("did:plc:alice", "did:plc:bob"),
        ("did:plc:alice", "did:plc:carol"),
        ("did:plc:bob", "did:plc:carol"),
        ("did:plc:carol", "did:plc:alice"),
        ("did:plc:dave", "did:plc:alice"),
    ]


@requires_reference
def test_missing_table_raises():
    from duckpgq_tpu.io.duckdb_file import DuckDBFile

    f = DuckDBFile(BLUESKY)
    with pytest.raises(KeyError):
        f.read_table("nope")


def test_not_a_duckdb_file(tmp_path):
    from duckpgq_tpu.io.duckdb_file import BlockFile, CorruptDuckDBFile

    p = tmp_path / "x.duckdb"
    p.write_bytes(b"\x00" * 20000)
    with pytest.raises(CorruptDuckDBFile):
        BlockFile(str(p))
