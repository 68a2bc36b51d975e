"""Generative differential testing (VERDICT r3 item 8).

The 62-file corpus covers what the reference's tests cover; the round-3
QUALIFY/COLLATE holes lived outside it. This harness generates >=1000
random queries from a seeded grammar and checks every RESULT against an
INDEPENDENT Python oracle that implements SQL semantics directly
(three-valued logic, NULL propagation, C-style modulo, LIKE matching via
a recursive matcher rather than the engine's regex translation) — so a
parse-then-ignore or wrong-semantics class diverges instead of passing
silently.

Check families (1360 generated queries):
  A scalar expressions        SELECT <e>
  B projections               SELECT <e> FROM t
  C filters                   SELECT * FROM t WHERE <p>
  D aggregation               SELECT <e>, count(*), sum(d) GROUP BY 1
  E ordering                  SELECT <e> AS k FROM t ORDER BY k
  F distinct                  SELECT DISTINCT <e> FROM t
  G windows + QUALIFY         row_number() OVER (PARTITION BY <e> ORDER BY u)
  H limit/offset              ORDER BY u LIMIT k OFFSET j
  I joins                     INNER / LEFT / filtered cross vs nested loop
  J aggregates + HAVING       min/max/sum/count grouped, HAVING count(*)
  K set ops                   UNION [ALL] / INTERSECT / EXCEPT
"""

import math
import random

import pytest

import duckpgq_tpu

SEED = 0xD1FF
N_ROWS = 40

STRS = [None, "x", "y", "abc", "Xy", "hello", "a%b", "", "zz", "Abc"]


def _make_rows():
    rng = random.Random(SEED)
    rows = []
    for u in range(N_ROWS):
        a = None if rng.random() < 0.15 else rng.randint(-5, 9)
        b = rng.choice(STRS)
        d = rng.randint(0, 6)
        rows.append({"a": a, "b": b, "d": d, "u": u})
    return rows


ROWS = _make_rows()


@pytest.fixture(scope="module")
def con():
    c = duckpgq_tpu.connect()
    c.execute("CREATE TABLE t_diff(a BIGINT, b VARCHAR, d BIGINT, "
              "u BIGINT)")
    vals = ", ".join(
        "({}, {}, {}, {})".format(
            "NULL" if r["a"] is None else r["a"],
            "NULL" if r["b"] is None else "'" + r["b"].replace("'", "''")
            + "'",
            r["d"], r["u"])
        for r in ROWS)
    c.execute(f"INSERT INTO t_diff VALUES {vals}")
    return c


# --------------------------------------------------------------- the oracle

def _like(s, p):
    if p == "":
        return s == ""
    if p[0] == "%":
        return any(_like(s[i:], p[1:]) for i in range(len(s) + 1))
    if p[0] == "_":
        return s != "" and _like(s[1:], p[1:])
    return s != "" and s[0] == p[0] and _like(s[1:], p[1:])


def oracle(e, row):
    """Evaluate an expression tuple with SQL semantics; None == NULL."""
    op = e[0]
    if op == "const":
        return e[1]
    if op == "col":
        return row[e[1]]
    if op in ("add", "sub", "mul", "mod"):
        l, r = oracle(e[1], row), oracle(e[2], row)
        if l is None or r is None:
            return None
        if op == "add":
            return l + r
        if op == "sub":
            return l - r
        if op == "mul":
            return l * r
        # C-style truncating modulo (DuckDB): sign of the dividend
        return int(math.fmod(l, r))
    if op == "neg":
        v = oracle(e[1], row)
        return None if v is None else -v
    if op == "abs":
        v = oracle(e[1], row)
        return None if v is None else abs(v)
    if op == "len":
        v = oracle(e[1], row)
        return None if v is None else len(v)
    if op in ("upper", "lower"):
        v = oracle(e[1], row)
        if v is None:
            return None
        return v.upper() if op == "upper" else v.lower()
    if op == "concat":
        l, r = oracle(e[1], row), oracle(e[2], row)
        if l is None or r is None:
            return None
        return l + r
    if op == "cmp":
        l, r = oracle(e[2], row), oracle(e[3], row)
        if l is None or r is None:
            return None
        c = e[1]
        if c == "=":
            return l == r
        if c == "<>":
            return l != r
        if c == "<":
            return l < r
        if c == "<=":
            return l <= r
        if c == ">":
            return l > r
        return l >= r
    if op == "and":
        l, r = oracle(e[1], row), oracle(e[2], row)
        if l is False or r is False:
            return False
        if l is None or r is None:
            return None
        return True
    if op == "or":
        l, r = oracle(e[1], row), oracle(e[2], row)
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return False
    if op == "not":
        v = oracle(e[1], row)
        return None if v is None else not v
    if op == "isnull":
        return oracle(e[1], row) is None
    if op == "case":
        c = oracle(e[1], row)
        return oracle(e[2], row) if c is True else oracle(e[3], row)
    if op == "coalesce":
        l = oracle(e[1], row)
        return l if l is not None else oracle(e[2], row)
    if op == "nullif":
        l, r = oracle(e[1], row), oracle(e[2], row)
        if l is None:
            return None
        if r is not None and l == r:
            return None
        return l
    if op == "like":
        s, p = oracle(e[1], row), e[2]
        if s is None:
            return None
        return _like(s, p)
    if op == "between":
        v = oracle(e[1], row)
        lo, hi = oracle(e[2], row), oracle(e[3], row)
        if v is None or lo is None or hi is None:
            return None
        return lo <= v <= hi
    if op == "inlist":
        v = oracle(e[1], row)
        if v is None:
            return None
        vals = e[2]
        if v in vals:
            return True
        return None if None in vals else False
    raise AssertionError(f"unknown oracle op {op}")


def render(e):
    op = e[0]
    if op == "const":
        v = e[1]
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)
    if op == "col":
        return e[1]
    two = {"add": "+", "sub": "-", "mul": "*", "mod": "%",
           "and": "AND", "or": "OR", "concat": "||"}
    if op in two:
        return f"({render(e[1])} {two[op]} {render(e[2])})"
    if op == "neg":
        return f"(- {render(e[1])})"
    if op == "abs":
        return f"abs({render(e[1])})"
    if op == "len":
        return f"length({render(e[1])})"
    if op in ("upper", "lower"):
        return f"{op}({render(e[1])})"
    if op == "cmp":
        return f"({render(e[2])} {e[1]} {render(e[3])})"
    if op == "not":
        return f"(NOT {render(e[1])})"
    if op == "isnull":
        return f"({render(e[1])} IS NULL)"
    if op == "case":
        return (f"(CASE WHEN {render(e[1])} THEN {render(e[2])} "
                f"ELSE {render(e[3])} END)")
    if op in ("coalesce", "nullif"):
        return f"{op}({render(e[1])}, {render(e[2])})"
    if op == "like":
        return f"({render(e[1])} LIKE '{e[2]}')"
    if op == "between":
        return (f"({render(e[1])} BETWEEN {render(e[2])} "
                f"AND {render(e[3])})")
    if op == "inlist":
        vals = ", ".join("NULL" if v is None else
                         ("'" + v.replace("'", "''") + "'"
                          if isinstance(v, str) else str(v))
                         for v in e[2])
        return f"({render(e[1])} IN ({vals}))"
    raise AssertionError(f"unknown render op {op}")


# ------------------------------------------------------------- the grammar

LIKE_PATTERNS = ["%", "x%", "%y", "_", "ab%", "%b%", "x_", "", "%ell%",
                 "A%"]


def gen_int(rng, depth, cols=True):
    if depth <= 0 or rng.random() < 0.3:
        if cols and rng.random() < 0.5:
            return ("col", rng.choice(["a", "d", "u"]))
        return ("const",
                None if rng.random() < 0.07 else rng.randint(-9, 9))
    op = rng.choice(["add", "sub", "mul", "neg", "abs", "mod", "case",
                     "coalesce", "nullif", "len"])
    if op in ("add", "sub", "mul"):
        return (op, gen_int(rng, depth - 1, cols),
                gen_int(rng, depth - 1, cols))
    if op == "mod":
        div = rng.choice([2, 3, 5, 7, -3])
        return ("mod", gen_int(rng, depth - 1, cols), ("const", div))
    if op in ("neg", "abs"):
        return (op, gen_int(rng, depth - 1, cols))
    if op == "case":
        return ("case", gen_bool(rng, depth - 1, cols),
                gen_int(rng, depth - 1, cols), gen_int(rng, depth - 1, cols))
    if op in ("coalesce", "nullif"):
        return (op, gen_int(rng, depth - 1, cols),
                gen_int(rng, depth - 1, cols))
    return ("len", gen_str(rng, depth - 1, cols))


def gen_str(rng, depth, cols=True):
    if depth <= 0 or rng.random() < 0.4:
        if cols and rng.random() < 0.55:
            return ("col", "b")
        return ("const", rng.choice(STRS))
    op = rng.choice(["upper", "lower", "concat", "case", "coalesce",
                     "nullif"])
    if op in ("upper", "lower"):
        return (op, gen_str(rng, depth - 1, cols))
    if op == "concat":
        return ("concat", gen_str(rng, depth - 1, cols),
                gen_str(rng, depth - 1, cols))
    if op == "case":
        return ("case", gen_bool(rng, depth - 1, cols),
                gen_str(rng, depth - 1, cols), gen_str(rng, depth - 1, cols))
    return (op, gen_str(rng, depth - 1, cols),
            gen_str(rng, depth - 1, cols))


def gen_bool(rng, depth, cols=True):
    if depth <= 0 or rng.random() < 0.3:
        kind = rng.random()
        if kind < 0.45:
            return ("cmp", rng.choice(["=", "<>", "<", "<=", ">", ">="]),
                    gen_int(rng, 0, cols), gen_int(rng, 0, cols))
        if kind < 0.65:
            return ("cmp", rng.choice(["=", "<>", "<", ">"]),
                    gen_str(rng, 0, cols), gen_str(rng, 0, cols))
        if kind < 0.8:
            return ("like", gen_str(rng, 0, cols),
                    rng.choice(LIKE_PATTERNS))
        return ("isnull", gen_int(rng, 0, cols) if rng.random() < 0.5
                else gen_str(rng, 0, cols))
    op = rng.choice(["and", "or", "not", "between", "inlist", "cmp"])
    if op in ("and", "or"):
        return (op, gen_bool(rng, depth - 1, cols),
                gen_bool(rng, depth - 1, cols))
    if op == "not":
        return ("not", gen_bool(rng, depth - 1, cols))
    if op == "between":
        lo = rng.randint(-6, 4)
        return ("between", gen_int(rng, depth - 1, cols),
                ("const", lo), ("const", lo + rng.randint(0, 8)))
    if op == "inlist":
        vals = [rng.randint(-5, 9) for _ in range(rng.randint(1, 4))]
        if rng.random() < 0.2:
            vals.append(None)
        return ("inlist", gen_int(rng, depth - 1, cols), vals)
    return ("cmp", rng.choice(["=", "<>", "<", "<=", ">", ">="]),
            gen_int(rng, depth - 1, cols), gen_int(rng, depth - 1, cols))


def _norm(v):
    # engine fetches bools for BOOLEAN and ints for BIGINT; unify
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


CASES_A = [(i, gen_int(random.Random(SEED + i), 3, cols=False)
            if i % 3 else gen_str(random.Random(SEED + i), 3, cols=False))
           for i in range(250)]


@pytest.mark.parametrize("i,e", CASES_A, ids=[f"scalar{i}"
                                              for i, _ in CASES_A])
def test_scalar_expression(con, i, e):
    sql = f"SELECT {render(e)}"
    got = _norm(con.execute(sql).fetchall()[0][0])
    want = _norm(oracle(e, {}))
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


CASES_B = [(i, gen_int(random.Random(2 * SEED + i), 3)
            if i % 2 else gen_str(random.Random(2 * SEED + i), 3))
           for i in range(250)]


@pytest.mark.parametrize("i,e", CASES_B, ids=[f"proj{i}"
                                              for i, _ in CASES_B])
def test_projection(con, i, e):
    sql = f"SELECT {render(e)} FROM t_diff"
    got = [_norm(r[0]) for r in con.execute(sql).fetchall()]
    want = [_norm(oracle(e, r)) for r in ROWS]
    assert got == want, f"{sql}: first diff at " \
        f"{next(j for j in range(len(ROWS)) if got[j] != want[j])}"


CASES_C = [(i, gen_bool(random.Random(3 * SEED + i), 3))
           for i in range(250)]


@pytest.mark.parametrize("i,p", CASES_C, ids=[f"where{i}"
                                              for i, _ in CASES_C])
def test_where_filter(con, i, p):
    sql = f"SELECT u FROM t_diff WHERE {render(p)}"
    got = [r[0] for r in con.execute(sql).fetchall()]
    want = [r["u"] for r in ROWS if oracle(p, r) is True]
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


CASES_D = [(i, gen_int(random.Random(4 * SEED + i), 2))
           for i in range(100)]


@pytest.mark.parametrize("i,e", CASES_D, ids=[f"group{i}"
                                              for i, _ in CASES_D])
def test_group_by(con, i, e):
    sql = (f"SELECT {render(e)} AS g, count(*), sum(d) FROM t_diff "
           f"GROUP BY g")
    got = sorted(((_norm(g), c, s) for g, c, s in
                  con.execute(sql).fetchall()),
                 key=lambda r: (r[0] is None, str(r[0])))
    groups = {}
    for r in ROWS:
        k = _norm(oracle(e, r))
        cnt, tot = groups.get(k, (0, 0))
        groups[k] = (cnt + 1, tot + r["d"])
    want = sorted(((k, c, s) for k, (c, s) in groups.items()),
                  key=lambda r: (r[0] is None, str(r[0])))
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


CASES_E = [(i, gen_int(random.Random(5 * SEED + i), 2))
           for i in range(100)]


@pytest.mark.parametrize("i,e", CASES_E, ids=[f"order{i}"
                                              for i, _ in CASES_E])
def test_order_by(con, i, e):
    sql = f"SELECT {render(e)} AS k FROM t_diff ORDER BY k"
    got = [_norm(r[0]) for r in con.execute(sql).fetchall()]
    want = sorted((_norm(oracle(e, r)) for r in ROWS),
                  key=lambda v: (v is None, v if v is not None else 0))
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


CASES_F = [(i, gen_int(random.Random(6 * SEED + i), 2))
           for i in range(50)]


@pytest.mark.parametrize("i,e", CASES_F, ids=[f"distinct{i}"
                                              for i, _ in CASES_F])
def test_distinct(con, i, e):
    sql = f"SELECT DISTINCT {render(e)} FROM t_diff"
    got = sorted((_norm(r[0]) for r in con.execute(sql).fetchall()),
                 key=lambda v: (v is None, str(v)))
    want = sorted({_norm(oracle(e, r)) for r in ROWS},
                  key=lambda v: (v is None, str(v)))
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


CASES_G = [(i, gen_int(random.Random(7 * SEED + i), 2))
           for i in range(50)]


@pytest.mark.parametrize("i,e", CASES_G, ids=[f"window{i}"
                                              for i, _ in CASES_G])
def test_window_qualify(con, i, e):
    part = render(e)
    sql = (f"SELECT u, row_number() OVER (PARTITION BY {part} "
           f"ORDER BY u) AS rn FROM t_diff QUALIFY rn <= 2 ORDER BY u")
    got = con.execute(sql).fetchall()
    seen = {}
    want = []
    for r in ROWS:                       # already in u order
        k = _norm(oracle(e, r))
        key = ("\0N",) if k is None else (type(k).__name__, k)
        rn = seen.get(key, 0) + 1
        seen[key] = rn
        if rn <= 2:
            want.append((r["u"], rn))
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


CASES_H = [(i, random.Random(8 * SEED + i).randint(0, 45),
            random.Random(9 * SEED + i).randint(0, 10))
           for i in range(50)]


@pytest.mark.parametrize("i,k,off", CASES_H, ids=[f"limit{i}"
                                                  for i, *_ in CASES_H])
def test_limit_offset(con, i, k, off):
    sql = f"SELECT u FROM t_diff ORDER BY u LIMIT {k} OFFSET {off}"
    got = [r[0] for r in con.execute(sql).fetchall()]
    want = [r["u"] for r in ROWS][off:off + k]
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


# ---- family I: two-table joins vs a nested-loop oracle --------------------

ROWS2 = [{"x": (None if (i * 7) % 11 == 0 else (i * 3) % 9 - 2),
          "y": ["x", "y", "abc", None, "zz"][i % 5],
          "w": i}
         for i in range(25)]


@pytest.fixture(scope="module")
def con2(con):
    vals = ", ".join(
        "({}, {}, {})".format(
            "NULL" if r["x"] is None else r["x"],
            "NULL" if r["y"] is None else "'" + r["y"] + "'",
            r["w"])
        for r in ROWS2)
    con.execute("CREATE TABLE t_diff2(x BIGINT, y VARCHAR, w BIGINT)")
    con.execute(f"INSERT INTO t_diff2 VALUES {vals}")
    return con


CASES_I = [(i,
            gen_int(random.Random(10 * SEED + i), 1),
            random.Random(11 * SEED + i).choice(
                ["inner", "left", "cross_filter"]))
           for i in range(100)]


@pytest.mark.parametrize("i,e,kind", CASES_I, ids=[f"join{i}"
                                                   for i, *_ in CASES_I])
def test_join_differential(con2, i, e, kind):
    """INNER / LEFT equi-joins and filtered cross joins vs a Python
    nested-loop oracle (SQL NULL-key semantics: NULL never matches)."""
    key = render(e)
    if kind == "inner":
        sql = (f"SELECT a.u, b.w FROM t_diff a JOIN t_diff2 b "
               f"ON {key} = b.x ORDER BY a.u, b.w")
        want = sorted((ra["u"], rb["w"]) for ra in ROWS for rb in ROWS2
                      if oracle(e, ra) is not None
                      and rb["x"] is not None
                      and oracle(e, ra) == rb["x"])
    elif kind == "left":
        sql = (f"SELECT a.u, b.w FROM t_diff a LEFT JOIN t_diff2 b "
               f"ON {key} = b.x ORDER BY a.u, b.w NULLS FIRST")
        want = []
        for ra in ROWS:
            k = oracle(e, ra)
            matches = [rb["w"] for rb in ROWS2
                       if k is not None and rb["x"] is not None
                       and k == rb["x"]]
            if matches:
                want.extend((ra["u"], w) for w in sorted(matches))
            else:
                want.append((ra["u"], None))
        # ORDER BY a.u, b.w NULLS FIRST
        want.sort(key=lambda r: (r[0], r[1] is not None,
                                 r[1] if r[1] is not None else 0))
    else:
        sql = (f"SELECT a.u, b.w FROM t_diff a, t_diff2 b "
               f"WHERE {key} > b.x ORDER BY a.u, b.w")
        want = sorted((ra["u"], rb["w"]) for ra in ROWS for rb in ROWS2
                      if oracle(e, ra) is not None
                      and rb["x"] is not None
                      and oracle(e, ra) > rb["x"])
    got = con2.execute(sql).fetchall()
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


# ---- family J: aggregates, HAVING, set ops --------------------------------

CASES_J = [(i, gen_int(random.Random(12 * SEED + i), 2),
            gen_bool(random.Random(13 * SEED + i), 1))
           for i in range(100)]


@pytest.mark.parametrize("i,g,p", CASES_J, ids=[f"agg{i}"
                                                for i, *_ in CASES_J])
def test_aggregate_differential(con, i, g, p):
    """min/max/avg/sum with GROUP BY + HAVING vs a Python oracle."""
    sql = (f"SELECT {render(g)} AS k, min(d), max(d), sum(a), count(a) "
           f"FROM t_diff WHERE {render(p)} GROUP BY k "
           f"HAVING count(*) > 1")
    got = sorted(con.execute(sql).fetchall(),
                 key=lambda r: (r[0] is None, str(r[0])))
    groups = {}
    for r in ROWS:
        if oracle(p, r) is not True:
            continue
        k = _norm(oracle(g, r))
        groups.setdefault(k, []).append(r)
    want = []
    for k, rs in groups.items():
        if len(rs) <= 1:
            continue
        avals = [r["a"] for r in rs if r["a"] is not None]
        want.append((k, min(r["d"] for r in rs), max(r["d"] for r in rs),
                     sum(avals) if avals else None, len(avals)))
    want.sort(key=lambda r: (r[0] is None, str(r[0])))
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"


CASES_K = [(i, gen_bool(random.Random(14 * SEED + i), 1),
            gen_bool(random.Random(15 * SEED + i), 1),
            random.Random(16 * SEED + i).choice(
                ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]))
           for i in range(60)]


@pytest.mark.parametrize("i,p1,p2,op", CASES_K, ids=[f"setop{i}"
                                                     for i, *_ in CASES_K])
def test_set_op_differential(con, i, p1, p2, op):
    """UNION [ALL] / INTERSECT / EXCEPT vs Python set/multiset
    semantics."""
    sql = (f"SELECT u FROM t_diff WHERE {render(p1)} {op} "
           f"SELECT u FROM t_diff WHERE {render(p2)} ORDER BY u")
    got = [r[0] for r in con.execute(sql).fetchall()]
    s1 = [r["u"] for r in ROWS if oracle(p1, r) is True]
    s2 = [r["u"] for r in ROWS if oracle(p2, r) is True]
    if op == "UNION":
        want = sorted(set(s1) | set(s2))
    elif op == "UNION ALL":
        want = sorted(s1 + s2)
    elif op == "INTERSECT":
        want = sorted(set(s1) & set(s2))
    else:
        want = sorted(set(s1) - set(s2))
    assert got == want, f"{sql}: engine {got!r} != oracle {want!r}"
