"""Aggregate function implementations over group ids.

Each aggregate maps (argument vectors, group ids, group count) -> one Vector of
length n_groups. Grouped reductions are segment ops: np.*.at on host (exact,
the SQL default), with a device group-by (sorted segmented scan, no scatter)
in duckpgq_tpu.ops.rel.device_group_sums for large device-resident pipelines.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from ..errors import BinderException, InvalidInputException
from ..storage.vector import Vector
from ..types import (BIGINT, BOOLEAN, DOUBLE, LIST, LogicalType, TypeId,
                     VARCHAR, SQLNULL)


class AggregateFunction:
    def __init__(self, name: str, impl: Callable):
        self.name = name
        self.impl = impl

    def __call__(self, args: List[Vector], gids: np.ndarray, n_groups: int,
                 distinct: bool = False) -> Vector:
        return self.impl(args, gids, n_groups, distinct)


REGISTRY: Dict[str, AggregateFunction] = {}


def register(name: str):
    def deco(fn):
        REGISTRY[name] = AggregateFunction(name, fn)
        return fn
    return deco


def get_aggregate(name: str) -> Optional[AggregateFunction]:
    return REGISTRY.get(name.lower())


# Aggregates whose implementations understand the scaled-integer DECIMAL
# representation (or are representation-agnostic value pickers). The
# executor converts DECIMAL args to DOUBLE for everything else.
DECIMAL_AWARE = {
    "sum", "fsum", "min", "max", "avg", "favg", "mean", "count",
    "count_star", "first", "arbitrary", "last", "any_value", "list",
    "array_agg", "histogram", "mode", "arg_min", "arg_max", "argmin",
    "argmax", "min_by", "max_by",
}


def _dedup(args: List[Vector], gids: np.ndarray):
    """Keep one row per distinct (gid, value) for DISTINCT aggregates."""
    a = args[0]
    if a.type.numpy_dtype() is object:
        seen = set()
        keep = np.zeros(len(gids), dtype=bool)
        for i in range(len(gids)):
            key = (gids[i], a.value(i))
            if key not in seen:
                seen.add(key)
                keep[i] = True
    else:
        arr = np.stack([gids.astype(np.int64),
                        a.data.astype(np.float64).view(np.int64)
                        if a.data.dtype != np.int64 else a.data], axis=1)
        # include validity so one NULL survives per group
        arr = np.column_stack([arr, (~a.validity).astype(np.int64)])
        _, first = np.unique(arr, axis=0, return_index=True)
        keep = np.zeros(len(gids), dtype=bool)
        keep[first] = True
    return [v.filter(keep) for v in args], gids[keep]


@register("count_star")
def agg_count_star(args, gids, n_groups, distinct):
    out = np.bincount(gids, minlength=n_groups).astype(np.int64)
    return Vector(BIGINT, out, np.ones(n_groups, dtype=bool))


@register("count")
def agg_count(args, gids, n_groups, distinct):
    if not args:
        return agg_count_star(args, gids, n_groups, distinct)
    if distinct:
        args, gids = _dedup(args, gids)
    a = args[0]
    valid = a.validity
    out = np.bincount(gids[valid], minlength=n_groups).astype(np.int64)
    return Vector(BIGINT, out, np.ones(n_groups, dtype=bool))


def _sum_impl(args, gids, n_groups, distinct):
    if distinct:
        args, gids = _dedup(args, gids)
    a = args[0]
    valid = a.validity
    if a.type.id == TypeId.DECIMAL:
        # exact scaled-int accumulate; result DECIMAL(38, s) (host DuckDB
        # sum(DECIMAL) widens to the max width)
        from ..types import DECIMAL
        acc = np.zeros(n_groups, dtype=object)
        np.add.at(acc, gids[valid], a.data[valid].astype(object))
        typ = DECIMAL(38, a.type.scale)
    elif a.type.is_integral:
        # result is HUGEINT (host DuckDB sum(INT*) -> HUGEINT, immune to
        # int64 wrap). Fast path: accumulate in int64 when the worst-case
        # |sum| provably fits; otherwise exact object ints.
        data = a.data[valid]
        if a.type.numpy_dtype() is object:
            acc = np.zeros(n_groups, dtype=object)
            np.add.at(acc, gids[valid], data.astype(object))
        else:
            d64 = data.astype(np.int64)
            bound = (float(np.abs(d64).max()) if len(d64) else 0.0) \
                * max(len(d64), 1)
            if bound < float(1 << 62):
                acc64 = np.zeros(n_groups, dtype=np.int64)
                np.add.at(acc64, gids[valid], d64)
                acc = acc64.astype(object)
            else:
                acc = np.zeros(n_groups, dtype=object)
                np.add.at(acc, gids[valid], d64.astype(object))
        from ..types import HUGEINT
        typ = HUGEINT
    else:
        acc = np.zeros(n_groups, dtype=np.float64)
        np.add.at(acc, gids[valid], a.data[valid].astype(np.float64))
        typ = DOUBLE
    has = np.zeros(n_groups, dtype=bool)
    has[gids[valid]] = True
    return Vector(typ, acc, has)


register("sum")(_sum_impl)
register("fsum")(_sum_impl)


@register("avg")
@register("favg")
@register("mean")
def agg_avg(args, gids, n_groups, distinct):
    if distinct:
        args, gids = _dedup(args, gids)
    a = args[0]
    valid = a.validity
    acc = np.zeros(n_groups, dtype=np.float64)
    np.add.at(acc, gids[valid], a.data[valid].astype(np.float64))
    if a.type.id == TypeId.DECIMAL:
        acc /= float(10 ** a.type.scale)   # unscale (avg(DECIMAL) -> DOUBLE)
    cnt = np.bincount(gids[valid], minlength=n_groups)
    has = cnt > 0
    out = np.where(has, acc / np.maximum(cnt, 1), 0.0)
    return Vector(DOUBLE, out, has)


def _minmax(args, gids, n_groups, is_min):
    a = args[0]
    valid = a.validity
    has = np.zeros(n_groups, dtype=bool)
    has[gids[valid]] = True
    if a.type.numpy_dtype() is object:
        out = np.empty(n_groups, dtype=object)
        for i in np.flatnonzero(valid):
            g = gids[i]
            v = a.data[i]
            if out[g] is None or (v < out[g]) == is_min and v != out[g]:
                out[g] = v
        return Vector(a.type, out, has)
    if a.type.id == TypeId.INTERVAL:
        # order by DuckDB's normalized micros, return the ORIGINAL triple
        from ..types import INTERVAL_DTYPE, interval_total_micros
        key = interval_total_micros(a.data["months"], a.data["days"],
                                    a.data["micros"])
        init = np.iinfo(np.int64).max if is_min else np.iinfo(np.int64).min
        acc = np.full(n_groups, init, dtype=np.int64)
        op = np.minimum if is_min else np.maximum
        getattr(op, "at")(acc, gids[valid], key[valid])
        out = np.zeros(n_groups, dtype=INTERVAL_DTYPE)
        for i in np.flatnonzero(valid):
            if key[i] == acc[gids[i]]:
                out[gids[i]] = a.data[i]
        return Vector(a.type, out, has)
    if a.type.is_integral or a.type.id == TypeId.BOOLEAN \
            or a.type.is_temporal or a.type.id == TypeId.DECIMAL:
        # (int64-backed DECIMAL included: scaled ints order correctly; a
        # float64 path would corrupt scaled values above 2^53)
        init = np.iinfo(np.int64).max if is_min else np.iinfo(np.int64).min
        acc = np.full(n_groups, init, dtype=np.int64)
        op = np.minimum if is_min else np.maximum
        getattr(op, "at")(acc, gids[valid], a.data[valid].astype(np.int64))
        return Vector(a.type, acc.astype(a.type.numpy_dtype()), has)
    init = np.inf if is_min else -np.inf
    acc = np.full(n_groups, init, dtype=np.float64)
    op = np.minimum if is_min else np.maximum
    getattr(op, "at")(acc, gids[valid], a.data[valid].astype(np.float64))
    return Vector(a.type, acc.astype(a.type.numpy_dtype()), has)


@register("min")
def agg_min(args, gids, n_groups, distinct):
    if len(args) > 1:
        return _minmax_topn(args, gids, n_groups, True)
    return _minmax(args, gids, n_groups, True)


@register("max")
def agg_max(args, gids, n_groups, distinct):
    if len(args) > 1:
        return _minmax_topn(args, gids, n_groups, False)
    return _minmax(args, gids, n_groups, False)


def _minmax_topn(args, gids, n_groups, is_min):
    """min/max(x, n) -> LIST of the n smallest/largest (DuckDB)."""
    from ..errors import InvalidInputException
    a = args[0]
    k = int(args[1].value(0)) if args[1].validity[0] else 0
    if k < 1:
        raise InvalidInputException(
            ("min" if is_min else "max") + ": n must be greater than 0")
    pairs = [(gids[i], a.value(i), a.value(i))
             for i in range(len(gids)) if a.validity[i]]
    return _topn_list(pairs, n_groups, is_min, k, a.type)


def _first_impl(args, gids, n_groups, distinct):
    a = args[0]
    out = Vector.constant(None, a.type, n_groups)
    seen = np.zeros(n_groups, dtype=bool)
    for i in range(len(gids)):
        g = gids[i]
        if not seen[g]:
            seen[g] = True
            if a.validity[i]:
                out.data[g] = a.data[i]
                out.validity[g] = True
    return out


register("first")(_first_impl)
register("arbitrary")(_first_impl)


@register("any_value")
def agg_any_value(args, gids, n_groups, distinct):
    """First non-NULL value per group (DuckDB any_value semantics)."""
    a = args[0]
    out = Vector.constant(None, a.type, n_groups)
    for i in range(len(gids)):
        g = gids[i]
        if not out.validity[g] and a.validity[i]:
            out.data[g] = a.data[i]
            out.validity[g] = True
    return out


@register("last")
def agg_last(args, gids, n_groups, distinct):
    a = args[0]
    out = Vector.constant(None, a.type, n_groups)
    for i in range(len(gids)):
        g = gids[i]
        if a.validity[i]:
            out.data[g] = a.data[i]
            out.validity[g] = True
        else:
            out.validity[g] = False
    return out


@register("list")
@register("array_agg")
def agg_list(args, gids, n_groups, distinct):
    a = args[0]
    lists = [[] for _ in range(n_groups)]
    for i in range(len(gids)):
        lists[gids[i]].append(a.value(i))
    out = np.empty(n_groups, dtype=object)
    for g in range(n_groups):
        out[g] = lists[g]
    return Vector(LIST(a.type), out, np.ones(n_groups, dtype=bool))


@register("string_agg")
@register("group_concat")
def agg_string_agg(args, gids, n_groups, distinct):
    a = args[0]
    sep_vec = args[1] if len(args) > 1 else None
    lists = [[] for _ in range(n_groups)]
    seps = [","] * n_groups
    seen = [set() for _ in range(n_groups)] if distinct else None
    for i in range(len(gids)):
        if a.validity[i]:
            v = str(a.data[i])
            if distinct:
                if v in seen[gids[i]]:
                    continue
                seen[gids[i]].add(v)
            lists[gids[i]].append(v)
            if sep_vec is not None and sep_vec.validity[i]:
                seps[gids[i]] = str(sep_vec.data[i])
    out = np.empty(n_groups, dtype=object)
    has = np.zeros(n_groups, dtype=bool)
    for g in range(n_groups):
        if lists[g]:
            out[g] = seps[g].join(lists[g])
            has[g] = True
    return Vector(VARCHAR, out, has)


@register("bool_and")
def agg_bool_and(args, gids, n_groups, distinct):
    a = args[0]
    valid = a.validity
    acc = np.ones(n_groups, dtype=bool)
    np.logical_and.at(acc, gids[valid], a.data[valid].astype(bool))
    has = np.zeros(n_groups, dtype=bool)
    has[gids[valid]] = True
    return Vector(BOOLEAN, acc, has)


@register("bool_or")
def agg_bool_or(args, gids, n_groups, distinct):
    a = args[0]
    valid = a.validity
    acc = np.zeros(n_groups, dtype=bool)
    np.logical_or.at(acc, gids[valid], a.data[valid].astype(bool))
    has = np.zeros(n_groups, dtype=bool)
    has[gids[valid]] = True
    return Vector(BOOLEAN, acc, has)


def _bit_agg_impl(ufunc, init):
    def impl(args, gids, n_groups, distinct):
        a = args[0]
        valid = a.validity
        g = gids[valid]
        v = a.data[valid].astype(np.int64)
        if distinct and len(v):
            pairs = np.unique(np.stack([g.astype(np.int64), v]), axis=1)
            g, v = pairs[0], pairs[1]
        acc = np.full(n_groups, init, dtype=np.int64)
        ufunc.at(acc, g, v)
        has = np.zeros(n_groups, dtype=bool)
        has[g] = True
        return Vector(BIGINT, acc, has)
    return impl


register("bit_and")(_bit_agg_impl(np.bitwise_and, -1))
register("bit_or")(_bit_agg_impl(np.bitwise_or, 0))
register("bit_xor")(_bit_agg_impl(np.bitwise_xor, 0))


def _arg_minmax_impl(prefer_smaller: bool):
    def impl(args, gids, n_groups, distinct):
        arg, val = args[0], args[1]
        best = [None] * n_groups
        out = [None] * n_groups
        for i in range(len(gids)):
            if not val.validity[i]:
                continue        # rows with a NULL ordering value are ignored
            g = gids[i]
            v = val.value(i)
            if best[g] is None or (v < best[g] if prefer_smaller
                                   else v > best[g]):
                best[g] = v
                out[g] = arg.value(i) if arg.validity[i] else None
        return Vector.from_values(out, arg.type)
    return impl


register("arg_min")(_arg_minmax_impl(True))
register("argmin")(_arg_minmax_impl(True))
register("min_by")(_arg_minmax_impl(True))
register("arg_max")(_arg_minmax_impl(False))
register("argmax")(_arg_minmax_impl(False))
register("max_by")(_arg_minmax_impl(False))


@register("histogram")
def agg_histogram(args, gids, n_groups, distinct):
    """histogram(x) -> MAP(x_type, BIGINT) of value counts, keys sorted."""
    from ..types import MAP
    a = args[0]
    counts = [dict() for _ in range(n_groups)]
    for i in range(len(gids)):
        if a.validity[i]:
            d = counts[gids[i]]
            v = a.value(i)
            d[v] = d.get(v, 0) + 1
    out = np.empty(n_groups, dtype=object)
    has = np.zeros(n_groups, dtype=bool)
    for g in range(n_groups):
        if counts[g]:
            out[g] = dict(sorted(counts[g].items()))
            has[g] = True
    return Vector(MAP(a.type, BIGINT), out, has)


def _quantile_impl(mode: str):
    def impl(args, gids, n_groups, distinct):
        a = args[0]
        if len(args) > 1 and args[1].type.id == TypeId.LIST:
            # quantile(x, [q1, q2, ...]) -> LIST of quantiles (DuckDB)
            qs = [float(v) for v in (args[1].data[0] or [])]
            single = _quantile_impl(mode)
            parts = [single([a, Vector.from_values([qv], DOUBLE)],
                            gids, n_groups, distinct) for qv in qs]
            out = np.empty(n_groups, dtype=object)
            has = np.zeros(n_groups, dtype=bool)
            for g in range(n_groups):
                if parts and parts[0].validity[g]:
                    out[g] = [p.value(g) for p in parts]
                    has[g] = True
            elem_t = parts[0].type if parts else DOUBLE
            return Vector(LIST(elem_t), out, has)
        q = float(args[1].data[0]) if len(args) > 1 else 0.5
        valid = a.validity
        out = np.zeros(n_groups, dtype=np.float64)
        has = np.zeros(n_groups, dtype=bool)
        data = a.data.astype(np.float64)
        for g in range(n_groups):
            sel = valid & (gids == g)
            if sel.any():
                vals = np.sort(data[sel])
                if mode == "cont":
                    out[g] = np.quantile(vals, q)
                elif mode == "approx":
                    # DuckDB's t-digest behaves like continuous
                    # interpolation on small inputs, rounded back to the
                    # input type
                    v = np.quantile(vals, q)
                    if a.type.is_integral:
                        v = np.floor(np.abs(v) + 0.5) * np.sign(v)
                    out[g] = v
                else:
                    idx = min(len(vals) - 1, int(np.ceil(q * len(vals))) - 1)
                    idx = max(idx, 0)
                    out[g] = vals[idx]
                has[g] = True
        interpolate = mode == "cont"
        typ = DOUBLE if interpolate else a.type
        if not interpolate and a.type.is_integral:
            return Vector(typ, out.astype(a.type.numpy_dtype()), has)
        return Vector(DOUBLE, out, has)
    return impl


register("quantile_cont")(_quantile_impl("cont"))
register("median")(_quantile_impl("cont"))
register("quantile")(_quantile_impl("disc"))
register("quantile_disc")(_quantile_impl("disc"))
register("approx_quantile")(_quantile_impl("approx"))


def _stddev_impl(pop: bool, var: bool):
    def impl(args, gids, n_groups, distinct):
        a = args[0]
        valid = a.validity
        data = a.data.astype(np.float64)
        s = np.zeros(n_groups)
        s2 = np.zeros(n_groups)
        np.add.at(s, gids[valid], data[valid])
        np.add.at(s2, gids[valid], data[valid] ** 2)
        cnt = np.bincount(gids[valid], minlength=n_groups).astype(np.float64)
        denom = cnt if pop else np.maximum(cnt - 1, 1)
        has = cnt > (0 if pop else 1)
        mean = np.where(cnt > 0, s / np.maximum(cnt, 1), 0)
        v = np.maximum((s2 - cnt * mean ** 2) / np.maximum(denom, 1), 0)
        out = v if var else np.sqrt(v)
        return Vector(DOUBLE, out, has)
    return impl


register("stddev")(_stddev_impl(False, False))
register("stddev_samp")(_stddev_impl(False, False))
register("stddev_pop")(_stddev_impl(True, False))
register("var_samp")(_stddev_impl(False, True))
register("variance")(_stddev_impl(False, True))
register("var_pop")(_stddev_impl(True, True))


def _topn_list(pairs, n_groups, is_min, k, elem_type):
    """Top-k helper for min/max/arg_min/arg_max with an n argument
    (DuckDB 'top-N' overloads): per group, the k best values ordered
    best-first, as a LIST."""
    from ..types import LIST
    buckets = [[] for _ in range(n_groups)]
    for g, key, val in pairs:
        buckets[g].append((key, val))
    out = np.empty(n_groups, dtype=object)
    has = np.zeros(n_groups, dtype=bool)
    for g in range(n_groups):
        if buckets[g]:
            ordered = sorted(buckets[g], key=lambda t: t[0],
                             reverse=not is_min)[:k]
            out[g] = [v for _, v in ordered]
            has[g] = True
    return Vector(LIST(elem_type), out, has)


def _arg_minmax(is_min):
    def impl(args, gids, n_groups, distinct):
        a, by = args[0], args[1]
        if len(args) > 2:
            # arg_min/arg_max(a, by, n) -> LIST of the n best 'a' values
            k = int(args[2].value(0)) if args[2].validity[0] else 0
            if k < 1:
                raise InvalidInputException(
                    ("arg_min" if is_min else "arg_max") +
                    ": n must be greater than 0")
            pairs = [(gids[i], by.value(i), a.value(i))
                     for i in range(len(gids))
                     if by.validity[i] and a.validity[i]]
            return _topn_list(pairs, n_groups, is_min, k, a.type)
        out = Vector.constant(None, a.type, n_groups)
        best = [None] * n_groups
        for i in range(len(gids)):
            if not by.validity[i]:
                continue
            g = gids[i]
            v = by.value(i)
            if best[g] is None or ((v < best[g]) if is_min else (v > best[g])):
                best[g] = v
                out.data[g] = a.data[i]
                out.validity[g] = a.validity[i]
        return out
    return impl


register("arg_min")(_arg_minmax(True))
register("min_by")(_arg_minmax(True))
register("arg_max")(_arg_minmax(False))
register("max_by")(_arg_minmax(False))


@register("product")
def agg_product(args, gids, n_groups, distinct):
    a = args[0]
    valid = a.validity
    acc = np.ones(n_groups, dtype=np.float64)
    np.multiply.at(acc, gids[valid], a.data[valid].astype(np.float64))
    has = np.zeros(n_groups, dtype=bool)
    has[gids[valid]] = True
    return Vector(DOUBLE, acc, has)


@register("mode")
def agg_mode(args, gids, n_groups, distinct):
    """Most frequent non-NULL value per group (ties: smallest value,
    deterministic)."""
    a = args[0]
    counts: list = [dict() for _ in range(n_groups)]
    for i in range(len(gids)):
        if a.validity[i]:
            d = counts[gids[i]]
            v = a.value(i)
            d[v] = d.get(v, 0) + 1
    vals = []
    for d in counts:
        if not d:
            vals.append(None)
        else:
            best = max(d.items(), key=lambda kv: (kv[1], _neg_key(kv[0])))
            vals.append(best[0])
    return Vector.from_values(vals, a.type)


def _neg_key(v):
    # tie-break toward the SMALLEST value: invert ordering where possible
    try:
        return -v
    except TypeError:
        return tuple(-ord(c) for c in str(v))


@register("approx_count_distinct")
def agg_approx_count_distinct(args, gids, n_groups, distinct):
    """Exact distinct count (the engine has no sketch pressure at these
    cardinalities; DuckDB's HLL is an approximation of this value)."""
    a = args[0]
    sets: list = [set() for _ in range(n_groups)]
    for i in range(len(gids)):
        if a.validity[i]:
            sets[gids[i]].add(a.value(i))
    out = np.array([len(s) for s in sets], dtype=np.int64)
    return Vector(BIGINT, out, np.ones(n_groups, dtype=bool))


REGISTRY["arbitrary"] = REGISTRY["any_value"]


def _moments(args, gids, n_groups):
    a = args[0]
    valid = a.validity
    x = np.where(valid, a.data.astype(np.float64), 0.0)
    n = np.bincount(gids[valid], minlength=n_groups).astype(np.float64)
    s1 = np.bincount(gids, weights=x * valid, minlength=n_groups)
    mean = np.divide(s1, n, out=np.zeros(n_groups), where=n > 0)
    d = np.where(valid, x - mean[gids], 0.0)
    m2 = np.bincount(gids, weights=d * d, minlength=n_groups)
    m3 = np.bincount(gids, weights=d ** 3, minlength=n_groups)
    m4 = np.bincount(gids, weights=d ** 4, minlength=n_groups)
    return n, mean, m2, m3, m4


@register("skewness")
def agg_skewness(args, gids, n_groups, distinct):
    """Sample skewness (DuckDB: g1 * sqrt(n(n-1))/(n-2))."""
    n, _, m2, m3, _ = _moments(args, gids, n_groups)
    out = np.zeros(n_groups)
    ok = (n > 2) & (m2 > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        g1 = (m3 / n) / np.power(m2 / np.maximum(n, 1), 1.5)
        out = np.where(ok, g1 * np.sqrt(n * (n - 1)) / np.maximum(
            n - 2, 1), 0.0)
    return Vector(DOUBLE, out, ok)


@register("kurtosis")
def agg_kurtosis(args, gids, n_groups, distinct):
    """Sample excess kurtosis (DuckDB formula)."""
    n, _, m2, _, m4 = _moments(args, gids, n_groups)
    ok = (n > 3) & (m2 > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        g2 = n * m4 / np.maximum(m2 * m2, 1e-300)
        out = ((n + 1) * g2 - 3 * (n - 1)) * (n - 1) / np.maximum(
            (n - 2) * (n - 3), 1)
    return Vector(DOUBLE, np.where(ok, out, 0.0), ok)


def _pair_stats(args, gids, n_groups):
    a, b = args[0], args[1]
    valid = a.validity & b.validity
    x = np.where(valid, a.data.astype(np.float64), 0.0)
    y = np.where(valid, b.data.astype(np.float64), 0.0)
    n = np.bincount(gids[valid], minlength=n_groups).astype(np.float64)
    sx = np.bincount(gids, weights=x * valid, minlength=n_groups)
    sy = np.bincount(gids, weights=y * valid, minlength=n_groups)
    sxx = np.bincount(gids, weights=x * x * valid, minlength=n_groups)
    syy = np.bincount(gids, weights=y * y * valid, minlength=n_groups)
    sxy = np.bincount(gids, weights=x * y * valid, minlength=n_groups)
    return n, sx, sy, sxx, syy, sxy


@register("corr")
def agg_corr(args, gids, n_groups, distinct):
    n, sx, sy, sxx, syy, sxy = _pair_stats(args, gids, n_groups)
    cov = sxy - sx * sy / np.maximum(n, 1)
    vx = sxx - sx * sx / np.maximum(n, 1)
    vy = syy - sy * sy / np.maximum(n, 1)
    ok = (n > 1) & (vx > 0) & (vy > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = cov / np.sqrt(np.maximum(vx * vy, 1e-300))
    return Vector(DOUBLE, np.where(ok, out, 0.0), ok)


@register("covar_pop")
def agg_covar_pop(args, gids, n_groups, distinct):
    n, sx, sy, _, _, sxy = _pair_stats(args, gids, n_groups)
    ok = n > 0
    out = (sxy - sx * sy / np.maximum(n, 1)) / np.maximum(n, 1)
    return Vector(DOUBLE, np.where(ok, out, 0.0), ok)


@register("covar_samp")
def agg_covar_samp(args, gids, n_groups, distinct):
    n, sx, sy, _, _, sxy = _pair_stats(args, gids, n_groups)
    ok = n > 1
    out = (sxy - sx * sy / np.maximum(n, 1)) / np.maximum(n - 1, 1)
    return Vector(DOUBLE, np.where(ok, out, 0.0), ok)


@register("regr_slope")
def agg_regr_slope(args, gids, n_groups, distinct):
    # regr_slope(y, x): args are (y, x) in SQL order
    n, sy, sx, syy, sxx, sxy = _pair_stats(args, gids, n_groups)
    vx = sxx - sx * sx / np.maximum(n, 1)
    cov = sxy - sx * sy / np.maximum(n, 1)
    ok = (n > 1) & (vx > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = cov / np.maximum(vx, 1e-300)
    return Vector(DOUBLE, np.where(ok, out, 0.0), ok)


@register("regr_intercept")
def agg_regr_intercept(args, gids, n_groups, distinct):
    n, sy, sx, syy, sxx, sxy = _pair_stats(args, gids, n_groups)
    vx = sxx - sx * sx / np.maximum(n, 1)
    cov = sxy - sx * sy / np.maximum(n, 1)
    ok = (n > 1) & (vx > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = cov / np.maximum(vx, 1e-300)
        out = sy / np.maximum(n, 1) - slope * sx / np.maximum(n, 1)
    return Vector(DOUBLE, np.where(ok, out, 0.0), ok)


@register("entropy")
def agg_entropy(args, gids, n_groups, distinct):
    """Shannon entropy in bits over the value distribution per group."""
    a = args[0]
    counts: list = [dict() for _ in range(n_groups)]
    for i in range(len(gids)):
        if a.validity[i]:
            d = counts[gids[i]]
            v = a.value(i)
            d[v] = d.get(v, 0) + 1
    out = np.zeros(n_groups)
    ok = np.zeros(n_groups, dtype=bool)
    for g, d in enumerate(counts):
        tot = sum(d.values())
        if tot:
            ok[g] = True
            p = np.array(list(d.values()), dtype=np.float64) / tot
            out[g] = float(-(p * np.log2(p)).sum())
    return Vector(DOUBLE, out, ok)


@register("bitstring_agg")
def agg_bitstring(args, gids, n_groups, distinct):
    """Host bitstring_agg: a BIT with one position per value in
    [min, max] of the whole input (explicit bounds via the 3-arg form),
    set where the group contains that value."""
    from ..errors import OutOfRangeException
    from ..types import BIT
    a = args[0]
    if not a.type.is_integral:
        raise BinderException(
            "No function matches the given name and argument types "
            f"'bitstring_agg({a.type})'")
    valid = a.validity
    vals = a.data[valid].astype(np.int64)
    has = np.zeros(n_groups, dtype=bool)
    has[gids[valid]] = True
    out = np.empty(n_groups, dtype=object)
    if len(args) >= 3:
        lo = int(args[1].data[0])
        hi = int(args[2].data[0])
    elif len(vals):
        lo, hi = int(vals.min()), int(vals.max())
    else:
        return Vector(BIT, out, has)
    width = hi - lo + 1
    if width <= 0 or width > (1 << 24):
        raise OutOfRangeException(
            "bitstring_agg range is invalid or too large")
    bits = [None] * n_groups
    for i in np.flatnonzero(valid):
        g = int(gids[i])
        v = int(a.data[i])
        if not lo <= v <= hi:
            raise OutOfRangeException(
                f"Value {v} is outside of provided min and max range "
                f"({lo} <-> {hi})")
        if bits[g] is None:
            bits[g] = bytearray(b"0" * width)
        bits[g][v - lo] = 0x31
    for g in range(n_groups):
        if bits[g] is not None:
            out[g] = bits[g].decode()
    return Vector(BIT, out, has)


@register("mad")
def agg_mad(args, gids, n_groups, distinct):
    """Median absolute deviation (DuckDB mad)."""
    a = args[0]
    valid = a.validity
    out = np.zeros(n_groups, dtype=np.float64)
    has = np.zeros(n_groups, dtype=bool)
    data = a.data.astype(np.float64)
    for g in range(n_groups):
        sel = valid & (gids == g)
        if sel.any():
            vals = data[sel]
            med = np.median(vals)
            out[g] = np.median(np.abs(vals - med))
            has[g] = True
    return Vector(DOUBLE, out, has)
