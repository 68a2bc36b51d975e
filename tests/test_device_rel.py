"""Device relational operators (ops/rel.py) vs the host join/aggregate
oracles — same pairs, same ORDER (the engine's determinism contract)."""

import numpy as np
import pytest


@pytest.mark.parametrize("seed,ln,rn,card", [
    (0, 500, 300, 50), (1, 2000, 10, 5), (2, 1, 1000, 1000),
    (3, 777, 777, 2), (4, 100, 0, 10)])
def test_device_join_matches_host(seed, ln, rn, card):
    from duckpgq_tpu.exec.join import equi_join_pairs
    from duckpgq_tpu.ops.rel import device_equi_join

    rng = np.random.default_rng(seed)
    lcode = rng.integers(0, card, size=ln).astype(np.int64)
    rcode = rng.integers(0, card, size=rn).astype(np.int64)
    lvalid = rng.random(ln) > 0.1
    rvalid = rng.random(rn) > 0.1
    want = equi_join_pairs(lcode, rcode, lvalid, rvalid)
    got = device_equi_join(lcode, rcode, lvalid, rvalid)
    assert got is not None
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_device_join_declines_wide_codes():
    from duckpgq_tpu.ops.rel import device_equi_join
    lcode = np.array([1 << 40], dtype=np.int64)
    rcode = np.array([1 << 40], dtype=np.int64)
    assert device_equi_join(lcode, rcode) is None


def test_device_join_through_sql_engine(monkeypatch):
    """Force every executor join through the device path; MATCH results
    must be identical."""
    import duckpgq_tpu

    def run():
        con = duckpgq_tpu.connect()
        con.execute("CREATE TABLE P(id BIGINT)")
        con.execute("CREATE TABLE K(s BIGINT, d BIGINT)")
        rng = np.random.default_rng(5)
        ids = ",".join(f"({i})" for i in range(40))
        con.execute(f"INSERT INTO P VALUES {ids}")
        edges = ",".join(f"({rng.integers(0, 40)},{rng.integers(0, 40)})"
                         for _ in range(200))
        con.execute(f"INSERT INTO K VALUES {edges}")
        con.execute("""CREATE PROPERTY GRAPH g
          VERTEX TABLES (P LABEL p)
          EDGE TABLES (K SOURCE KEY (s) REFERENCES P (id)
                         DESTINATION KEY (d) REFERENCES P (id) LABEL k)""")
        return con.execute("""
          SELECT * FROM GRAPH_TABLE (g
            MATCH (a:p)-[e1:k]->(b:p)-[e2:k]->(c:p)
            COLUMNS (a.id AS x, b.id AS y, c.id AS z)) t
          ORDER BY x, y, z""").fetchall()

    monkeypatch.setenv("DUCKPGQ_DEVICE_REL", "0")
    want = run()
    monkeypatch.setenv("DUCKPGQ_DEVICE_REL", "1")
    got = run()
    assert got == want
    assert len(want) > 0


@pytest.mark.parametrize("seed,n,card,floaty", [
    (0, 1000, 30, True), (1, 500, 1, False), (2, 3000, 300, True)])
def test_device_group_sums(seed, n, card, floaty):
    from duckpgq_tpu.ops.rel import device_group_sums

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, card, size=n).astype(np.int64)
    vals = (rng.random(n).astype(np.float32) if floaty
            else rng.integers(0, 100, size=n).astype(np.int32))
    gc, gs, sizes = device_group_sums(codes, vals)
    want_codes = np.unique(codes)
    np.testing.assert_array_equal(gc, want_codes)
    for c, s, z in zip(gc, gs, sizes):
        m = codes == c
        assert z == m.sum()
        np.testing.assert_allclose(s, vals[m].sum(), rtol=1e-5)


def test_device_filter_indices():
    from duckpgq_tpu.ops.rel import device_filter_indices

    rng = np.random.default_rng(9)
    mask = rng.random(5000) < 0.3
    got = device_filter_indices(mask)
    np.testing.assert_array_equal(got, np.flatnonzero(mask))
