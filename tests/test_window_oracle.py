"""Brute-force differential oracle for window frames.

Random small partitions x random frame specs (ROWS/RANGE/GROUPS, all
bound types, EXCLUDE CURRENT ROW/GROUP/TIES) x aggregates
(sum/count/min/max/avg and the generic path via product/string_agg):
the engine's framed window output must match a row-at-a-time Python
reimplementation of the SQL standard's frame semantics. This guards the
prefix-sum/extrema/exclusion index math in
exec/executor._compute_window_framed."""

import math
import random

import pytest

import duckpgq_tpu


def brute_frame(rows, i, kind, s_type, s_off, e_type, e_off, exclude):
    """Indices of the frame of sorted-position i (rows sorted by key),
    per SQL semantics. rows: list of (key,). Peers share the key."""
    n = len(rows)
    key = [r[0] for r in rows]

    def peers(j):
        return [k for k in range(n) if key[k] == key[j]]

    if kind == "ROWS":
        def bound(btype, off, is_start):
            if btype == "up":
                return 0
            if btype == "uf":
                return n - 1
            if btype == "cur":
                return i
            return i - off if btype == "prec" else i + off
        lo = bound(s_type, s_off, True)
        hi = bound(e_type, e_off, False)
    elif kind == "GROUPS":
        gfirst = {}
        gid = []
        g = -1
        for j in range(n):
            if j == 0 or key[j] != key[j - 1]:
                g += 1
            gid.append(g)
        ngroups = g + 1

        def gbound(btype, off, is_start):
            if btype == "up":
                return 0
            if btype == "uf":
                return ngroups - 1
            if btype == "cur":
                return gid[i]
            return gid[i] - off if btype == "prec" else gid[i] + off
        glo, ghi = gbound(s_type, s_off, True), gbound(e_type, e_off, False)
        members = [j for j in range(n) if glo <= gid[j] <= ghi]
        lo = min(members) if members else 1
        hi = max(members) if members else 0
    else:                                         # RANGE
        def rbound(btype, off, is_start):
            if btype == "up":
                return 0 if is_start else None
            if btype == "uf":
                return n - 1 if not is_start else None
            if btype == "cur":
                ps = peers(i)
                return min(ps) if is_start else max(ps)
            tgt = key[i] - off if btype == "prec" else key[i] + off
            if is_start:
                cands = [j for j in range(n) if key[j] >= tgt]
                return min(cands) if cands else n
            cands = [j for j in range(n) if key[j] <= tgt]
            return max(cands) if cands else -1
        lo = rbound(s_type, s_off, True)
        hi = rbound(e_type, e_off, False)
        if lo is None:
            lo = 0
        if hi is None:
            hi = n - 1
    idx = [j for j in range(n) if lo <= j <= hi]
    if exclude == "current":
        idx = [j for j in idx if j != i]
    elif exclude == "group":
        ps = set(peers(i))
        idx = [j for j in idx if j not in ps]
    elif exclude == "ties":
        ps = set(peers(i))
        idx = [j for j in idx if j == i or j not in ps]
    return idx


def agg_value(name, vals):
    if name == "count":
        return len(vals)
    if not vals:
        return None
    if name == "sum":
        return sum(vals)
    if name == "min":
        return min(vals)
    if name == "max":
        return max(vals)
    if name == "avg":
        return sum(vals) / len(vals)
    if name == "product":
        p = 1.0
        for v in vals:
            p *= v
        return p
    raise AssertionError(name)


BOUNDS = [("up", 0), ("prec", 2), ("prec", 1), ("cur", 0)]
END_BOUNDS = [("cur", 0), ("foll", 1), ("foll", 2), ("uf", 0)]
EXCLUDES = [None, "current", "group", "ties"]
AGGS = ["sum", "count", "min", "max", "avg", "product"]


def frame_sql(kind, st, so, et, eo, exclude):
    def b(t, o, side):
        return {"up": "UNBOUNDED PRECEDING", "uf": "UNBOUNDED FOLLOWING",
                "cur": "CURRENT ROW", "prec": f"{o} PRECEDING",
                "foll": f"{o} FOLLOWING"}[t]
    sql = f"{kind} BETWEEN {b(st, so, 's')} AND {b(et, eo, 'e')}"
    if exclude:
        sql += {"current": " EXCLUDE CURRENT ROW",
                "group": " EXCLUDE GROUP",
                "ties": " EXCLUDE TIES"}[exclude]
    return sql


@pytest.mark.parametrize("seed", range(12))
def test_window_frame_oracle(seed):
    rng = random.Random(seed)
    con = duckpgq_tpu.connect()
    n = rng.randint(3, 9)
    # duplicate keys exercise peer groups; values distinct for min/max
    keys = sorted(rng.choice([1, 2, 3, 4, 5]) for _ in range(n))
    vals = [float(rng.randint(1, 9)) for _ in range(n)]
    rows_sql = ", ".join(f"({k}, {v}, {i})"
                         for i, (k, v) in enumerate(zip(keys, vals)))
    checked = 0
    for _ in range(24):
        kind = rng.choice(["ROWS", "RANGE", "GROUPS"])
        st, so = rng.choice(BOUNDS)
        et, eo = rng.choice(END_BOUNDS)
        exclude = rng.choice(EXCLUDES)
        agg = rng.choice(AGGS)
        fr = frame_sql(kind, st, so, et, eo, exclude)
        sql = (f"SELECT rid, {agg}(v) OVER (ORDER BY k {fr}) FROM "
               f"(VALUES {rows_sql}) t(k, v, rid) ORDER BY rid")
        got = {rid: v for rid, v in con.execute(sql).fetchall()}
        rows = list(zip(keys, vals))
        for i in range(n):
            idx = brute_frame(rows, i, kind, st, so, et, eo, exclude)
            expect = agg_value(agg, [vals[j] for j in idx])
            g = got[i]
            if expect is None:
                assert g is None or (agg == "count" and g == 0), \
                    f"{sql}\nrow {i}: expected NULL, got {g}"
            else:
                assert g is not None and \
                    math.isclose(float(g), float(expect),
                                 rel_tol=1e-9), \
                    f"{sql}\nrow {i}: expected {expect}, got {g} " \
                    f"(frame idx {idx}, keys {keys}, vals {vals})"
            checked += 1
    assert checked

@pytest.mark.parametrize("seed", range(8))
def test_setop_bag_oracle(seed):
    """EXCEPT ALL / INTERSECT ALL against Counter arithmetic."""
    from collections import Counter
    rng = random.Random(100 + seed)
    con = duckpgq_tpu.connect()
    left = [rng.randint(1, 4) for _ in range(rng.randint(1, 8))]
    right = [rng.randint(1, 4) for _ in range(rng.randint(1, 8))]
    lsql = ", ".join(f"({v})" for v in left)
    rsql = ", ".join(f"({v})" for v in right)
    got = sorted(v for (v,) in con.execute(
        f"SELECT x FROM (VALUES {lsql}) t(x) EXCEPT ALL "
        f"SELECT x FROM (VALUES {rsql}) s(x)").fetchall())
    expect = sorted((Counter(left) - Counter(right)).elements())
    assert got == expect, (left, right, got, expect)
    got = sorted(v for (v,) in con.execute(
        f"SELECT x FROM (VALUES {lsql}) t(x) INTERSECT ALL "
        f"SELECT x FROM (VALUES {rsql}) s(x)").fetchall())
    expect = sorted((Counter(left) & Counter(right)).elements())
    assert got == expect, (left, right, got, expect)
