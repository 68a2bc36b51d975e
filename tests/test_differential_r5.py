"""Round-5 differential families aimed at the classes that survived the
round-4 harness (VERDICT r4 item 9): decimal arithmetic vs the Python
``decimal`` oracle, integer boundary values vs exact Python ints,
USING/NATURAL join shape+values vs a Python join oracle, a named-argument
fuzz pass over the whole scalar catalog, window NULLS FIRST/LAST ordering,
and nested list functions vs list comprehensions.

Every case is RESULT-checked (or error-parity-checked) — the round-4
finding was that silent-wrong-answer classes live exactly where generated
queries don't compare results.
"""

import random
from decimal import ROUND_HALF_UP, Decimal

import pytest

import duckpgq_tpu
from duckpgq_tpu.errors import DuckPGQError, OutOfRangeException

SEED = 0x5EED5


@pytest.fixture(scope="module")
def con():
    return duckpgq_tpu.connect()


# ---------------------------------------------------------------- decimals

def _dec_literals(rng, k):
    out = []
    for _ in range(k):
        scale = rng.randint(0, 6)
        intdigits = rng.randint(1, 8)
        digits = "".join(rng.choice("0123456789")
                         for _ in range(intdigits + scale))
        txt = digits[:intdigits] + ("." + digits[intdigits:] if scale
                                    else "")
        if rng.random() < 0.4:
            txt = "-" + txt
        out.append(txt)
    return out


def _gen_decimal_cases():
    rng = random.Random(SEED)
    lits = _dec_literals(rng, 60)
    cases = []
    for i in range(240):
        a = rng.choice(lits)
        b = rng.choice(lits)
        op = rng.choice(["+", "-", "*", "=", "<", ">=", "cast", "cmp3"])
        cases.append((i, a, b, op))
    return cases


def _lit_shape(txt):
    """(width, scale) of a decimal literal the way the engine types it."""
    body = txt.lstrip("-")
    intpart, _, frac = body.partition(".")
    return len(intpart) + len(frac), len(frac)


def _result_shape(wa, sa, wb, sb, op):
    """Engine/host decimal binder rule -> (width, scale, checked)."""
    if op == "*":
        s = sa + sb
        w = wa + wb
    else:
        s = max(sa, sb)
        w = max(wa - sa, wb - sb) + 1 + s
    checked = False
    if w > 18 and wa <= 18 and wb <= 18 and s <= 18:
        w, checked = 18, True
    elif w > 38:
        w, checked = 38, True
    return w, s, checked


@pytest.mark.parametrize("i,a,b,op", _gen_decimal_cases(),
                         ids=lambda v: str(v))
def test_decimal_differential(con, i, a, b, op):
    da, db = Decimal(a), Decimal(b)
    if op in ("+", "-", "*"):
        want = da + db if op == "+" else da - db if op == "-" else da * db
        wa, sa = _lit_shape(a)
        wb, sb = _lit_shape(b)
        w, s, checked = _result_shape(wa, sa, wb, sb, op)
        if checked and abs(int(want.scaleb(s))) >= 10 ** w:
            # capped result width: the host errors at runtime
            with pytest.raises(OutOfRangeException):
                con.execute(f"SELECT {a} {op} {b}").fetchall()
            return
        (got,), = con.execute(f"SELECT {a} {op} {b}").fetchall()
        if sa == 0 and sb == 0:
            # fraction-less literals are INTEGER/BIGINT (host typing), so
            # the result is integer arithmetic, not DECIMAL
            assert isinstance(got, int), f"{a} {op} {b} -> {type(got)}"
        else:
            assert isinstance(got, Decimal), f"{a} {op} {b} -> {type(got)}"
        assert got == want, f"{a} {op} {b}: {got} != {want}"
    elif op == "cast":
        p, s = 12, random.Random(SEED + i).randint(0, 4)
        q = da.scaleb(s).to_integral_value(rounding=ROUND_HALF_UP)
        fits = abs(int(q)) < 10 ** p
        sql = f"SELECT CAST({a} AS DECIMAL({p},{s}))"
        if fits:
            (got,), = con.execute(sql).fetchall()
            assert got == Decimal(int(q)).scaleb(-s), \
                f"{sql}: {got} != {q}E-{s}"
        else:
            with pytest.raises(DuckPGQError):
                con.execute(sql).fetchall()
    elif op == "cmp3":
        # associativity probe: (a + b) - b == a must hold EXACTLY
        wa, sa = _lit_shape(a)
        wb, sb = _lit_shape(b)
        w, s, checked = _result_shape(wa, sa, wb, sb, "+")
        if checked and abs(int((da + db).scaleb(s))) >= 10 ** w:
            return   # the add itself overflows (host errors too)
        (got,), = con.execute(
            f"SELECT ({a} + {b}) - {b} = {a}").fetchall()
        assert got is True, f"({a} + {b}) - {b} != {a}"
    else:
        want = {"=": da == db, "<": da < db, ">=": da >= db}[op]
        (got,), = con.execute(f"SELECT {a} {op} {b}").fetchall()
        assert got == want, f"{a} {op} {b}: {got} != {want}"


def test_decimal_division_is_double(con):
    (v, t), = con.execute("SELECT 1.0 / 4.0, typeof(1.0 / 4.0)").fetchall()
    assert v == 0.25 and t == "DOUBLE"


# ---------------------------------------------------- integer boundaries

_INT_TYPES = {
    "TINYINT": (-(1 << 7), (1 << 7) - 1),
    "SMALLINT": (-(1 << 15), (1 << 15) - 1),
    "INTEGER": (-(1 << 31), (1 << 31) - 1),
    "BIGINT": (-(1 << 63), (1 << 63) - 1),
}


def _gen_int_cases():
    rng = random.Random(SEED + 1)
    cases = []
    for i in range(160):
        t = rng.choice(list(_INT_TYPES))
        lo, hi = _INT_TYPES[t]
        pick = rng.choice(["edge", "mid", "small"])
        if pick == "edge":
            x = rng.choice([lo, lo + 1, hi, hi - 1])
            y = rng.choice([-2, -1, 0, 1, 2, hi, lo])
        elif pick == "mid":
            x = rng.randint(lo // 2, hi // 2)
            y = rng.randint(-3, 3)
        else:
            x = rng.randint(-100, 100)
            y = rng.randint(-100, 100)
        if not lo <= y <= hi:
            y = max(lo, min(hi, y))
        op = rng.choice(["+", "-", "*"])
        cases.append((i, t, x, y, op))
    return cases


@pytest.mark.parametrize("i,t,x,y,op", _gen_int_cases(),
                         ids=lambda v: str(v))
def test_integer_boundary_differential(con, i, t, x, y, op):
    lo, hi = _INT_TYPES[t]
    want = x + y if op == "+" else x - y if op == "-" else x * y
    sql = f"SELECT CAST({x} AS {t}) {op} CAST({y} AS {t})"
    if lo <= want <= hi:
        (got,), = con.execute(sql).fetchall()
        assert got == want, f"{sql}: {got} != {want}"
    else:
        with pytest.raises(OutOfRangeException):
            con.execute(sql).fetchall()


def test_sum_never_wraps(con):
    big = (1 << 63) - 1
    (got,), = con.execute(
        f"SELECT sum(x) FROM (VALUES ({big}), ({big}), ({big})) t(x)"
    ).fetchall()
    assert got == 3 * big


def test_negate_abs_overflow(con):
    with pytest.raises(OutOfRangeException):
        con.execute("SELECT -CAST(-128 AS TINYINT)").fetchall()
    with pytest.raises(OutOfRangeException):
        con.execute("SELECT abs(CAST(-2147483648 AS INTEGER))").fetchall()


# ------------------------------------------------- USING / NATURAL joins

def _join_fixture(con):
    con.execute("DROP TABLE IF EXISTS jl; DROP TABLE IF EXISTS jr")
    con.execute("CREATE TABLE jl(k BIGINT, m BIGINT, s VARCHAR)")
    con.execute("CREATE TABLE jr(k BIGINT, m BIGINT, v VARCHAR)")
    rng = random.Random(SEED + 2)
    lrows = [(rng.randint(0, 5), rng.randint(0, 3),
              rng.choice(["a", "b", "c"])) for _ in range(14)]
    rrows = [(rng.randint(0, 5), rng.randint(0, 3),
              rng.choice(["p", "q"])) for _ in range(11)]
    con.execute("INSERT INTO jl VALUES " + ", ".join(
        f"({a}, {b}, '{c}')" for a, b, c in lrows))
    con.execute("INSERT INTO jr VALUES " + ", ".join(
        f"({a}, {b}, '{c}')" for a, b, c in rrows))
    return lrows, rrows


def _oracle_using_join(lrows, rrows, cols, jt):
    """Python oracle for jl <jt> JOIN jr USING (cols): SELECT * keeps the
    LEFT column order (the using column coalesced in place), then the
    right side's remaining columns — DuckDB's projection order."""
    def key(row, names, src):
        return tuple(row[src.index(c)] for c in names)
    lsrc, rsrc = ["k", "m", "s"], ["k", "m", "v"]
    rkeep = [c for c in rsrc if c not in cols]
    out = []
    rmatched = [False] * len(rrows)
    for lr in lrows:
        hit = False
        for j, rr in enumerate(rrows):
            if key(lr, cols, lsrc) == key(rr, cols, rsrc):
                hit = True
                rmatched[j] = True
                out.append(tuple(lr) +
                           tuple(rr[rsrc.index(c)] for c in rkeep))
        if not hit and jt in ("LEFT", "FULL"):
            out.append(tuple(lr) + (None,) * len(rkeep))
    if jt in ("RIGHT", "FULL"):
        for j, rr in enumerate(rrows):
            if not rmatched[j]:
                # left slots NULL except the coalesced using columns
                lrow = tuple(rr[rsrc.index(c)] if c in cols else None
                             for c in lsrc)
                out.append(lrow +
                           tuple(rr[rsrc.index(c)] for c in rkeep))
    return out


@pytest.mark.parametrize("jt", ["INNER", "LEFT", "RIGHT", "FULL"])
@pytest.mark.parametrize("cols", [["k"], ["k", "m"], ["m"]],
                         ids=["k", "km", "m"])
def test_using_join_differential(con, jt, cols):
    lrows, rrows = _join_fixture(con)
    res = con.execute(
        f"SELECT * FROM jl {jt} JOIN jr USING ({', '.join(cols)})")
    want = _oracle_using_join(lrows, rrows, cols, jt)
    n_cols = 6 - len(cols)
    assert len(res.names) == n_cols, \
        f"{jt} USING {cols}: {len(res.names)} output columns, " \
        f"want {n_cols} ({res.names})"
    got = res.fetchall()
    key = lambda r: tuple((v is None, str(v)) for v in r)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key), \
        f"{jt} USING {cols} rows diverge"


def test_natural_join_matches_using(con):
    _join_fixture(con)
    nat = con.execute("SELECT * FROM jl NATURAL JOIN jr")
    usg = con.execute("SELECT * FROM jl JOIN jr USING (k, m)")
    assert nat.names == usg.names
    assert sorted(map(str, nat.fetchall())) == \
        sorted(map(str, usg.fetchall()))


def test_using_unqualified_and_qualified(con):
    _join_fixture(con)
    rows = con.execute(
        "SELECT k, jl.k, jr.k FROM jl JOIN jr USING (k)").fetchall()
    assert all(a == b == c for a, b, c in rows) and rows


# ----------------------------------------------------- named-arg fuzzing

# functions that legitimately DECLARE named parameters
_NAMED_ARG_OK = {"struct_pack", "struct_insert"}


def _catalog_functions():
    from duckpgq_tpu.functions.scalar import REGISTRY
    return sorted(n for n in REGISTRY
                  if n.isidentifier() and not n.startswith("__")
                  and n not in _NAMED_ARG_OK)


@pytest.mark.parametrize("fname", _catalog_functions())
def test_named_arg_fuzz(con, fname):
    """Every catalog function must reject an undeclared named argument
    with a clean engine error — never accept-and-drop it (the round-4
    unnest(recursive := true) class), never crash with a raw Python
    error."""
    try:
        con.execute(
            f"SELECT {fname}(__bogus_param__ := 1)").fetchall()
    except DuckPGQError:
        return  # clean engine error: pass
    pytest.fail(f"{fname} silently accepted a bogus named argument")


# ------------------------------------------------ window NULLS ordering

def _win_fixture(con):
    con.execute("DROP TABLE IF EXISTS wn")
    con.execute("CREATE TABLE wn(i BIGINT, x BIGINT)")
    rng = random.Random(SEED + 3)
    rows = [(i, None if rng.random() < 0.3 else rng.randint(0, 5))
            for i in range(16)]
    con.execute("INSERT INTO wn VALUES " + ", ".join(
        f"({i}, {'NULL' if x is None else x})" for i, x in rows))
    return rows


@pytest.mark.parametrize("desc", [False, True], ids=["asc", "desc"])
@pytest.mark.parametrize("nulls", [None, "FIRST", "LAST"],
                         ids=["default", "first", "last"])
def test_window_nulls_ordering(con, desc, nulls):
    rows = _win_fixture(con)
    dirn = "DESC" if desc else "ASC"
    nspec = f" NULLS {nulls}" if nulls else ""
    got = dict(con.execute(
        f"SELECT i, row_number() OVER (ORDER BY x {dirn}{nspec}) "
        f"FROM wn").fetchall())
    nulls_first = nulls == "FIRST"   # default: NULLS LAST (host default)

    def key(iv):
        i, x = iv
        if x is None:
            return (0 if nulls_first else 1, 0, i)
        return (0 if not nulls_first else 1,
                -x if desc else x, i)
    want = {i: rank + 1 for rank, (i, _x) in
            enumerate(sorted(rows, key=key))}
    assert got == want, f"{dirn}{nspec}: {got} != {want}"


# ---------------------------------------------- nested list functions

def _gen_nested_cases():
    rng = random.Random(SEED + 4)
    cases = []
    for i in range(90):
        inner = [[rng.randint(-5, 9) for _ in range(rng.randint(0, 3))]
                 for _ in range(rng.randint(0, 3))]
        fam = rng.choice(["flatten", "rec_unnest", "transform",
                          "filter", "len", "concat"])
        cases.append((i, inner, fam))
    return cases


@pytest.mark.parametrize("i,nested,fam", _gen_nested_cases(),
                         ids=lambda v: str(v))
def test_nested_list_differential(con, i, nested, fam):
    lit = "[" + ", ".join(
        "[" + ", ".join(map(str, sub)) + "]" for sub in nested) + "]"
    flat = [x for sub in nested for x in sub]
    if fam == "flatten":
        (got,), = con.execute(f"SELECT flatten({lit})").fetchall()
        assert got == flat
    elif fam == "rec_unnest":
        got = [r[0] for r in con.execute(
            f"SELECT unnest({lit}, recursive := true)").fetchall()]
        assert got == flat
    elif fam == "transform":
        (got,), = con.execute(
            f"SELECT list_transform({lit}, x -> len(x))").fetchall()
        assert got == [len(s) for s in nested]
    elif fam == "filter":
        (got,), = con.execute(
            f"SELECT list_filter({lit}, x -> len(x) > 1)").fetchall()
        assert got == [s for s in nested if len(s) > 1]
    elif fam == "len":
        (got,), = con.execute(f"SELECT len({lit})").fetchall()
        assert got == len(nested)
    else:
        (got,), = con.execute(
            f"SELECT list_concat({lit}, {lit})").fetchall()
        assert got == nested + nested


def test_map_nested_oracle(con):
    (got,), = con.execute(
        "SELECT map_extract(map([1, 2], [[10], [20, 21]]), 2)").fetchall()
    assert got == [[20, 21]]
    (bare,), = con.execute(
        "SELECT map([1, 2], [[10], [20, 21]])[2]").fetchall()
    assert bare == [20, 21]


def test_order_by_exact_above_2_53(con):
    """float64 sort keys collapse >2^53 integers — the exact int64 key
    path must keep BIGINT and wide-DECIMAL ordering correct."""
    rows = con.execute(
        "SELECT x FROM (VALUES (9007199254740993), (9007199254740992)) "
        "t(x) ORDER BY x").fetchall()
    assert rows == [(9007199254740992,), (9007199254740993,)]
    rows = con.execute(
        "SELECT x FROM (VALUES (9007199254740993), (9007199254740992), "
        "(NULL)) t(x) ORDER BY x DESC").fetchall()
    assert rows == [(9007199254740993,), (9007199254740992,), (None,)]
    rows = con.execute(
        "SELECT x FROM (VALUES (-9223372036854775808), "
        "(9223372036854775807)) t(x) ORDER BY x DESC").fetchall()
    assert rows == [(9223372036854775807,), (-9223372036854775808,)]
    rows = con.execute(
        "SELECT x FROM (VALUES "
        "(CAST('123456789012345.03' AS DECIMAL(18,2))), "
        "(CAST('123456789012345.02' AS DECIMAL(18,2)))) t(x) "
        "ORDER BY x").fetchall()
    assert [str(r[0]) for r in rows] == ["123456789012345.02",
                                        "123456789012345.03"]
