"""Unit tests for the vectorized join machinery's fast paths: integer key
codes, unique-build-side (PK) joins, the native C++ LUT join, and lazy
column materialization — all must agree with the generic sort-based path."""

import numpy as np
import pytest

from duckpgq_tpu.exec.join import (_int_key_codes, equi_join_pairs,
                                   factorize_keys)
from duckpgq_tpu.storage.vector import LazyVector, SelChain, Vector
from duckpgq_tpu.types import BIGINT, DOUBLE, VARCHAR


def _reference_pairs(lcode, rcode, lvalid, rvalid):
    """Brute-force oracle: probe order, build matches in build order."""
    li, ri = [], []
    for i in range(len(lcode)):
        if not lvalid[i]:
            continue
        for j in range(len(rcode)):
            if rvalid[j] and lcode[i] == rcode[j]:
                li.append(i)
                ri.append(j)
    return np.array(li, dtype=np.int64), np.array(ri, dtype=np.int64)


@pytest.mark.parametrize("dup_build", [False, True])
@pytest.mark.parametrize("with_nulls", [False, True])
def test_equi_join_pairs_matches_oracle(dup_build, with_nulls):
    rng = np.random.default_rng(3)
    n_keys = 40 if dup_build else 4000
    lc = rng.integers(0, n_keys, 500).astype(np.int64)
    rc = rng.integers(0, n_keys, 200).astype(np.int64)
    if not dup_build:
        rc = np.unique(rc)
    lv = rng.random(len(lc)) > (0.2 if with_nulls else 0.0)
    rv = rng.random(len(rc)) > (0.2 if with_nulls else 0.0)
    li, ri = equi_join_pairs(lc, rc, lv, rv)
    eli, eri = _reference_pairs(lc, rc, lv, rv)
    assert np.array_equal(li, eli)
    assert np.array_equal(ri, eri)


def test_native_lut_join_parity_large():
    """Above the native-dispatch threshold, the C++ LUT join must equal the
    numpy sort path bit-for-bit (order included)."""
    from duckpgq_tpu import native_rt
    if not native_rt.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    lc = rng.integers(100, 5000, 50000).astype(np.int64)
    rc = rng.integers(100, 5000, 3000).astype(np.int64)
    lv = rng.random(len(lc)) > 0.05
    rv = rng.random(len(rc)) > 0.05
    li, ri = equi_join_pairs(lc, rc, lv, rv)     # native path (len >= 4096)
    # force the numpy path by shrinking below the threshold in chunks
    eli, eri = [], []
    # sort-based reference on the full arrays, bypassing the native branch:
    order = np.argsort(rc[rv], kind="stable")
    rkeep = np.flatnonzero(rv)
    sorted_r = rc[rkeep][order]
    starts = np.searchsorted(sorted_r, lc, side="left")
    ends = np.searchsorted(sorted_r, lc, side="right")
    counts = np.where(lv, ends - starts, 0)
    total = int(counts.sum())
    exp_li = np.repeat(np.arange(len(lc), dtype=np.int64), counts)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)
    exp_ri = rkeep[order[np.repeat(starts, counts) + offs]]
    assert np.array_equal(li, exp_li)
    assert np.array_equal(ri, exp_ri)


def test_int_key_codes_multi_column():
    a_l = Vector(BIGINT, np.array([1, 2, 3, 1], dtype=np.int64))
    b_l = Vector(BIGINT, np.array([-5, 0, 5, -5], dtype=np.int64))
    a_r = Vector(BIGINT, np.array([1, 3], dtype=np.int64))
    b_r = Vector(BIGINT, np.array([-5, 5], dtype=np.int64))
    out = _int_key_codes([a_l, b_l], [a_r, b_r])
    assert out is not None
    lc, rc = out
    # rows (1,-5) and (3,5) must match, codes equal exactly there
    assert lc[0] == rc[0] and lc[2] == rc[1] and lc[3] == rc[0]
    assert lc[1] not in (rc[0], rc[1])


def test_int_key_codes_overflow_falls_back():
    big = np.array([0, 1 << 61], dtype=np.int64)
    cols_l = [Vector(BIGINT, big), Vector(BIGINT, big)]
    cols_r = [Vector(BIGINT, big.copy()), Vector(BIGINT, big.copy())]
    assert _int_key_codes(cols_l, cols_r) is None
    # factorize_keys still joins correctly through the unique path
    lc, rc, lv, rv = factorize_keys(cols_l, cols_r)
    li, ri = equi_join_pairs(lc, rc, lv, rv)
    assert np.array_equal(li, np.array([0, 1]))
    assert np.array_equal(ri, np.array([0, 1]))


def test_factorize_mixed_types_uses_generic_path():
    l = [Vector(DOUBLE, np.array([1.5, 2.5], dtype=np.float64))]
    r = [Vector(DOUBLE, np.array([2.5], dtype=np.float64))]
    lc, rc, lv, rv = factorize_keys(l, r)
    li, ri = equi_join_pairs(lc, rc, lv, rv)
    assert li.tolist() == [1] and ri.tolist() == [0]


def test_factorize_null_keys_never_match():
    l = [Vector(BIGINT, np.array([1, 2], dtype=np.int64),
                np.array([True, False]))]
    r = [Vector(BIGINT, np.array([2, 1], dtype=np.int64),
                np.array([False, True]))]
    lc, rc, lv, rv = factorize_keys(l, r)
    li, ri = equi_join_pairs(lc, rc, lv, rv)
    assert li.tolist() == [0] and ri.tolist() == [1]


# ---------------------------------------------------------------------------
# lazy column views
# ---------------------------------------------------------------------------

def test_lazy_vector_materializes_like_eager():
    base = Vector(VARCHAR, np.array(["a", "b", "c", "d"], dtype=object),
                  np.array([True, True, False, True]))
    idx1 = np.array([3, 1, 2, 0, 1])
    idx2 = np.array([4, 0, 2])
    lazy = LazyVector(base, idx1).take(idx2)
    eager = base.take(idx1).take(idx2)
    assert lazy.data.tolist() == ["b", "d", "c"]
    assert np.array_equal(lazy.validity, eager.validity)
    assert lazy.value(2) is None and lazy.value(0) == "b"


def test_selchain_shared_prefix_resolves_once():
    root = SelChain(np.array([2, 1, 0]))
    a = SelChain(np.array([0, 2]), root)
    b = SelChain(np.array([1]), root)
    a.resolve()
    assert root._resolved is not None
    cached = root._resolved
    b.resolve()
    assert root._resolved is cached


def test_lazy_nullmask_outer_join_semantics():
    base = Vector(BIGINT, np.arange(5, dtype=np.int64))
    nm = np.array([False, True, False])
    lazy = LazyVector(base, np.array([4, 0, 2]), nm)
    assert lazy.value(1) is None
    assert lazy.validity.tolist() == [True, False, True]
    taken = lazy.take(np.array([1, 2]))
    assert taken.validity.tolist() == [False, True]


def test_lateral_join():
    """LATERAL subqueries see earlier FROM items row-wise (comma and
    CROSS JOIN syntax, correlated filters, WHERE on lateral outputs)."""
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE lt(a BIGINT)")
    con.execute("INSERT INTO lt VALUES (1),(2),(3)")
    assert con.execute(
        "SELECT * FROM lt, LATERAL (SELECT lt.a * 10) s(x) ORDER BY a"
    ).fetchall() == [(1, 10), (2, 20), (3, 30)]
    # correlated filtering subquery: rows multiply/vanish per left row
    assert con.execute(
        "SELECT * FROM lt, LATERAL (SELECT u.a FROM lt u WHERE u.a < lt.a) "
        "s(smaller) ORDER BY a, smaller").fetchall() == \
        [(2, 1), (3, 1), (3, 2)]
    # WHERE over lateral outputs
    assert con.execute(
        "SELECT * FROM lt, LATERAL (SELECT lt.a + 1) s(x) WHERE x > 2 "
        "ORDER BY a").fetchall() == [(2, 3), (3, 4)]


def test_asof_join():
    """ASOF [LEFT] JOIN: greatest right key satisfying the inequality,
    per equality partition (DuckDB semantics), both directions."""
    import duckpgq_tpu
    con = duckpgq_tpu.connect()
    con.execute("CREATE TABLE tr(sym VARCHAR, t BIGINT)")
    con.execute("INSERT INTO tr VALUES ('A',1),('A',5),('B',3),('C',7)")
    con.execute("CREATE TABLE qt(sym VARCHAR, t BIGINT)")
    con.execute("INSERT INTO qt VALUES ('A',0),('A',4),('A',6),('B',2),"
                "('B',10)")
    assert con.execute(
        "SELECT tr.sym, tr.t, qt.t FROM tr ASOF JOIN qt "
        "ON tr.sym = qt.sym AND tr.t >= qt.t ORDER BY tr.sym, tr.t"
    ).fetchall() == [("A", 1, 0), ("A", 5, 4), ("B", 3, 2)]
    # LEFT keeps unmatched ('C' and any sym with no earlier quote)
    assert con.execute(
        "SELECT tr.sym, tr.t, qt.t FROM tr ASOF LEFT JOIN qt "
        "ON tr.sym = qt.sym AND tr.t >= qt.t ORDER BY tr.sym, tr.t"
    ).fetchall() == [("A", 1, 0), ("A", 5, 4), ("B", 3, 2), ("C", 7, None)]
    # <= matches the smallest right key at-or-after
    assert con.execute(
        "SELECT tr.sym, tr.t, qt.t FROM tr ASOF JOIN qt "
        "ON tr.sym = qt.sym AND tr.t <= qt.t ORDER BY tr.sym, tr.t"
    ).fetchall() == [("A", 1, 4), ("A", 5, 6), ("B", 3, 10)]
