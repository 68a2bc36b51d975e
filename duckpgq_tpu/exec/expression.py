"""Vectorized expression evaluation with SQL NULL semantics.

Whole-column evaluation over a Relation; three-valued logic for AND/OR;
correlated subqueries resolve outer columns through an OuterScope chain and
re-run per outer row only when correlation is actually detected.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..errors import BinderException, ConversionException, InternalException
from ..functions.scalar import get_function, glob_to_regex, like_to_regex
from ..storage.vector import Vector
from ..types import (BIGINT, BOOLEAN, DOUBLE, LogicalType, TypeId, VARCHAR,
                     SQLNULL, STRUCT, max_numeric_type)
from ..sql import ast as a
from .cast import cast_vector
from .relation import Relation


# ---------------------------------------------------------------------------
# expression fingerprints (structural equality for GROUP BY / ORDER BY match)
# ---------------------------------------------------------------------------

def fingerprint(e: a.Expression) -> str:
    if isinstance(e, a.Constant):
        # include the type: the DECIMAL literal 0.1 stores scaled value 1,
        # which must not collide with the INTEGER literal 1
        return f"const:{e.value!r}:{e.type}"
    if isinstance(e, a.ColumnRef):
        return "col:" + ".".join(p.lower() for p in e.parts)
    if isinstance(e, a.FunctionCall):
        kw = "" if not e.kwargs else ";" + ",".join(
            f"{k}:{fingerprint(v)}" for k, v in e.kwargs)
        return f"fn:{e.name.lower()}(" + ",".join(
            fingerprint(x) for x in e.args) + f"{kw})"
    if isinstance(e, a.AggregateCall):
        d = "distinct " if e.distinct else ""
        ob = "" if not e.order_by else " order:" + ",".join(
            fingerprint(o.expr) + ("" if o.ascending else " desc")
            for o in e.order_by)
        fl = "" if e.filter is None else " filter:" + fingerprint(e.filter)
        return f"agg:{e.name.lower()}({d}" + ",".join(
            fingerprint(x) for x in e.args) + f"){ob}{fl}"
    if isinstance(e, a.WindowCall):
        pb = ",".join(fingerprint(x) for x in e.partition_by)
        ob = ",".join(fingerprint(o.expr) + ("" if o.ascending else " desc")
                      for o in e.order_by)
        fr = ""
        if e.frame is not None:
            f = e.frame
            fr = (f" frame:{f.kind}:{f.start_type}"
                  f"({fingerprint(f.start_expr) if f.start_expr else ''})"
                  f":{f.end_type}"
                  f"({fingerprint(f.end_expr) if f.end_expr else ''})")
        return (f"win:{e.name.lower()}(" +
                ",".join(fingerprint(x) for x in e.args) +
                f") partition:{pb} order:{ob}{fr}")
    if isinstance(e, a.Comparison):
        return f"cmp:{e.op}({fingerprint(e.left)},{fingerprint(e.right)})"
    if isinstance(e, a.Conjunction):
        return f"conj:{e.op}(" + ",".join(fingerprint(c) for c in e.children) + ")"
    if isinstance(e, a.Not):
        return f"not({fingerprint(e.child)})"
    if isinstance(e, a.IsNull):
        return f"isnull:{e.negated}({fingerprint(e.child)})"
    if isinstance(e, a.Between):
        return (f"between:{e.negated}({fingerprint(e.expr)},"
                f"{fingerprint(e.lower)},{fingerprint(e.upper)})")
    if isinstance(e, a.Cast):
        return f"cast({fingerprint(e.child)} as {e.target})"
    if isinstance(e, a.Case):
        parts = [f"{fingerprint(w)}:{fingerprint(t)}" for w, t in e.whens]
        base = fingerprint(e.base) if e.base else ""
        els = fingerprint(e.else_expr) if e.else_expr else ""
        return f"case({base};{';'.join(parts)};{els})"
    if isinstance(e, a.StructExtract):
        return f"sx({fingerprint(e.child)}.{e.field_name.lower()})"
    if isinstance(e, a.ArrayIndex):
        idx = fingerprint(e.index) if e.index else ""
        return f"idx({fingerprint(e.child)}[{idx}])"
    if isinstance(e, a.InList):
        return (f"in:{e.negated}({fingerprint(e.expr)};" +
                ",".join(fingerprint(v) for v in e.values) + ")")
    if isinstance(e, a.Like):
        return (f"like:{e.negated}:{e.case_insensitive}:{e.glob}"
                f"({fingerprint(e.left)},{fingerprint(e.pattern)})")
    if isinstance(e, a.ListExpr):
        return "list(" + ",".join(fingerprint(v) for v in e.values) + ")"
    if isinstance(e, a.StructExpr):
        return "struct(" + ",".join(
            f"{k}:{fingerprint(v)}" for k, v in e.fields) + ")"
    if isinstance(e, a.SubqueryExpr):
        return f"subq:{id(e)}"
    if isinstance(e, a.Star):
        return f"star:{e.relation or ''}"
    if isinstance(e, a.Positional):
        return f"pos:{e.index}"
    if isinstance(e, a.Collate):
        return f"collate({fingerprint(e.child)},{e.collation})"
    return f"expr:{id(e)}"


# ---------------------------------------------------------------------------
# collations (reference grammar expression.gram:258-259 COLLATE postfix;
# DuckDB builtins: NOCASE, NOACCENT, NFC and dot-combinations, plus the
# no-op binary collations C/POSIX/BINARY)
# ---------------------------------------------------------------------------

_KNOWN_COLLATIONS = {"nocase", "noaccent", "nfc", "c", "binary", "posix"}


def collect_collations(e: a.Expression) -> List[str]:
    """Collation names from a (possibly nested) Collate wrapper; empty if
    ``e`` is not a Collate node. Unknown names raise like DuckDB's catalog
    lookup."""
    from ..errors import CatalogException
    colls: List[str] = []
    while isinstance(e, a.Collate):
        for part in e.collation.split("."):
            c = part.lower()
            if c not in _KNOWN_COLLATIONS:
                raise CatalogException(
                    f"Collation with name {part} does not exist!")
            colls.append(c)
        e = e.child
    return colls


def apply_collation(values: np.ndarray, colls: List[str]) -> np.ndarray:
    """Map an object array of strings to their collation keys (NOCASE →
    casefold, NOACCENT → strip combining marks, NFC → normalize); non-str
    entries pass through."""
    import unicodedata
    nocase = "nocase" in colls
    noaccent = "noaccent" in colls
    nfc = "nfc" in colls
    if not (nocase or noaccent or nfc):
        return values
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        if not isinstance(v, str):
            out[i] = v
            continue
        s = unicodedata.normalize("NFC", v) if nfc else v
        if noaccent:
            s = "".join(ch for ch in unicodedata.normalize("NFD", s)
                        if not unicodedata.combining(ch))
        if nocase:
            s = s.lower()
        out[i] = s
    return out


def collation_key_values(vals: List, colls: List[str]) -> List:
    """apply_collation for a plain python list (ORDER BY key path)."""
    arr = apply_collation(np.array(vals, dtype=object), colls)
    return list(arr)


def collect_aggregates(e: a.Expression, out: List[a.AggregateCall]):
    if e is None:
        return
    if isinstance(e, a.AggregateCall):
        out.append(e)
        return  # no nested aggregates
    for child in _children(e):
        collect_aggregates(child, out)


def collect_windows(e: a.Expression, out: List["a.WindowCall"]):
    if e is None:
        return
    if isinstance(e, a.WindowCall):
        out.append(e)
        return  # no nested windows
    for child in _children(e):
        collect_windows(child, out)


def _children(e: a.Expression):
    if isinstance(e, a.FunctionCall):
        return e.args + [v for _, v in e.kwargs]
    if isinstance(e, a.AggregateCall):
        return e.args
    if isinstance(e, a.WindowCall):
        out = (e.args + e.partition_by +
               [ob.expr for ob in e.order_by])
        if e.frame is not None:
            out += [x for x in (e.frame.start_expr, e.frame.end_expr)
                    if x is not None]
        return out
    if isinstance(e, a.Comparison):
        return [e.left, e.right]
    if isinstance(e, a.Conjunction):
        return e.children
    if isinstance(e, a.Not):
        return [e.child]
    if isinstance(e, a.IsNull):
        return [e.child]
    if isinstance(e, a.Between):
        return [e.expr, e.lower, e.upper]
    if isinstance(e, a.Cast):
        return [e.child]
    if isinstance(e, a.Case):
        out = []
        if e.base:
            out.append(e.base)
        for w, t in e.whens:
            out.extend([w, t])
        if e.else_expr:
            out.append(e.else_expr)
        return out
    if isinstance(e, a.StructExtract):
        return [e.child]
    if isinstance(e, a.ArrayIndex):
        out = [e.child]
        if e.index is not None:
            out.append(e.index)
        if e.slice_stop is not None:
            out.append(e.slice_stop)
        return out
    if isinstance(e, a.InList):
        return [e.expr] + e.values
    if isinstance(e, a.Like):
        return [e.left, e.pattern]
    if isinstance(e, a.ListExpr):
        return e.values
    if isinstance(e, a.StructExpr):
        return [v for _, v in e.fields]
    if isinstance(e, a.SubqueryExpr):
        return [e.child] if e.child is not None else []
    if isinstance(e, a.Collate):
        return [e.child]
    return []


def _infer_constant_type(value):
    from ..types import BIGINT, BOOLEAN, DOUBLE, INTEGER, VARCHAR, SQLNULL
    if value is None:
        return SQLNULL
    if isinstance(value, bool):
        return BOOLEAN
    if isinstance(value, int):
        return INTEGER if -2**31 <= value < 2**31 else BIGINT
    if isinstance(value, float):
        return DOUBLE
    if isinstance(value, str):
        return VARCHAR
    return SQLNULL


class OuterScope:
    """Chained outer-row context for correlated subqueries."""

    __slots__ = ("relation", "row", "parent", "accessed")

    def __init__(self, relation: Relation, row: int,
                 parent: Optional["OuterScope"] = None):
        self.relation = relation
        self.row = row
        self.parent = parent
        self.accessed = False

    def try_resolve(self, parts: Tuple[str, ...]):
        scope = self
        while scope is not None:
            idx = scope.relation.resolve(parts)
            if idx is not None:
                scope.accessed = True
                col = scope.relation.columns[idx]
                return col.value(scope.row), col.type
            scope = scope.parent
        return None


class Evaluator:
    """Evaluates expressions against a Relation.

    ``replacements`` maps expression fingerprints to physical column slots —
    used after aggregation so group/aggregate subtrees resolve to computed
    columns.
    """

    def __init__(self, executor, relation: Relation, outer: Optional[OuterScope]
                 = None, replacements: Optional[Dict[str, int]] = None,
                 env=None):
        self.executor = executor
        self.rel = relation
        self.outer = outer
        self.replacements = replacements or {}
        self.env = env   # lexical CTE environment for subqueries

    @property
    def n(self) -> int:
        return self.rel.row_count

    # ------------------------------------------------------------------ main
    def evaluate(self, e: a.Expression) -> Vector:
        if self.replacements:
            fp = fingerprint(e)
            slot = self.replacements.get(fp)
            if slot is not None:
                return self.rel.columns[slot]
        if isinstance(e, a.Constant):
            typ = e.type
            if typ is None:
                typ = _infer_constant_type(e.value)
            vec = Vector.constant(e.value, typ, self.n)
            vec.constant_hint = True   # literal: casts may parse once
            return vec
        if isinstance(e, a.Parameter):
            raise BinderException(
                "Values were not provided for the following prepared "
                f"statement parameters: {e.index}")
        if isinstance(e, a.ColumnRef):
            return self.evaluate_column_ref(e)
        if isinstance(e, a.Comparison):
            return self.evaluate_comparison(e)
        if isinstance(e, a.Conjunction):
            return self.evaluate_conjunction(e)
        if isinstance(e, a.Not):
            child = self.as_bool(self.evaluate(e.child))
            return Vector(BOOLEAN, ~child.data.astype(bool),
                          child.validity.copy())
        if isinstance(e, a.IsNull):
            child = self.evaluate(e.child)
            out = child.validity if e.negated else ~child.validity
            return Vector(BOOLEAN, out.copy(), np.ones(self.n, dtype=bool))
        if isinstance(e, a.Between):
            lo = a.Comparison(op=">=", left=e.expr, right=e.lower)
            hi = a.Comparison(op="<=", left=e.expr, right=e.upper)
            result = self.evaluate(a.Conjunction(op="AND", children=[lo, hi]))
            if e.negated:
                return Vector(BOOLEAN, ~result.data.astype(bool),
                              result.validity)
            return result
        if isinstance(e, a.InList):
            return self.evaluate_in_list(e)
        if isinstance(e, a.Cast):
            child = self.evaluate(e.child)
            return cast_vector(child, e.target, e.try_cast)
        if isinstance(e, a.Case):
            return self.evaluate_case(e)
        if isinstance(e, a.FunctionCall):
            return self.evaluate_function(e)
        if isinstance(e, a.AggregateCall):
            raise BinderException(
                f"aggregate function {e.name} used outside of an aggregation "
                f"context")
        if isinstance(e, a.WindowCall):
            raise BinderException(
                f"window function {e.name} is only allowed in the SELECT "
                f"list")
        if isinstance(e, a.SubqueryExpr):
            return self.evaluate_subquery(e)
        if isinstance(e, a.StructExtract):
            return self.evaluate_struct_extract(e)
        if isinstance(e, a.ArrayIndex):
            return self.evaluate_array_index(e)
        if isinstance(e, a.Like):
            return self.evaluate_like(e)
        if isinstance(e, a.ListExpr):
            if not e.values:
                # empty list literal [] — one empty list per row (the
                # zero-arg path otherwise yields a zero-length vector)
                from ..types import LIST
                data = np.empty(self.n, dtype=object)
                for i in range(self.n):
                    data[i] = []
                return Vector(LIST(SQLNULL), data,
                              np.ones(self.n, dtype=bool))
            fn = get_function("list_value")
            return fn([self.evaluate(v) for v in e.values])
        if isinstance(e, a.StructExpr):
            return self.evaluate_struct_expr(e)
        if isinstance(e, a.Collate):
            return self.evaluate(e.child)
        if isinstance(e, a.Star):
            raise BinderException("* cannot be used in this context")
        if isinstance(e, a.Positional):
            raise BinderException("positional reference not allowed here")
        raise InternalException(f"unsupported expression {type(e).__name__}")

    # -------------------------------------------------------------- columns
    def evaluate_column_ref(self, e: a.ColumnRef) -> Vector:
        idx = self.rel.resolve(e.parts)
        if idx is not None:
            return self.rel.columns[idx]
        # struct-field access via alias.column.field chains
        if len(e.parts) >= 2:
            head = self.rel.resolve(e.parts[:-1])
            if head is not None:
                base = self.rel.columns[head]
                if base.type.id == TypeId.STRUCT:
                    return self._struct_field(base, e.parts[-1])
            if len(e.parts) >= 3:
                head = self.rel.resolve(e.parts[:2])
                if head is not None:
                    base = self.rel.columns[head]
                    out = base
                    for f in e.parts[2:]:
                        out = self._struct_field(out, f)
                    return out
        # outer (correlated) scope
        if self.outer is not None:
            hit = self.outer.try_resolve(e.parts)
            if hit is not None:
                value, typ = hit
                return Vector.constant(value, typ, self.n)
        # row-as-struct: a bare table alias names the whole row (DuckDB
        # `SELECT t FROM t` -> STRUCT of t's visible columns)
        if len(e.parts) == 1:
            b = self.rel.find_binding(e.parts[0])
            if b is not None:
                fields = [(nm, self.rel.columns[i]) for nm, i in b.visible()]
                typ = STRUCT([(nm, v.type) for nm, v in fields])
                n = self.n
                data = np.empty(n, dtype=object)
                validity = np.ones(n, dtype=bool)
                for i in range(n):
                    data[i] = tuple(v.value(i) for _, v in fields)
                return Vector(typ, data, validity)
        name = ".".join(e.parts)
        raise BinderException(
            f'Referenced column "{name}" not found in FROM clause!')

    def _struct_field(self, base: Vector, field_name: str) -> Vector:
        fn = get_function("struct_extract")
        name_vec = Vector.constant(field_name, VARCHAR, len(base))
        return fn([base, name_vec])

    # --------------------------------------------------------- comparisons
    @staticmethod
    def coerce_pair(left: Vector, right: Vector) -> Tuple[Vector, Vector]:
        lt, rt = left.type, right.type
        if lt.id == rt.id:
            if lt.id == TypeId.DECIMAL and lt != rt:
                # same TypeId is NOT same representation: different scales
                # must rescale to the covering type before comparing
                target = max_numeric_type(lt, rt)
                return cast_vector(left, target), cast_vector(right, target)
            return left, right
        if lt.id == TypeId.SQLNULL:
            return cast_vector(left, rt), right
        if rt.id == TypeId.SQLNULL:
            return left, cast_vector(right, lt)
        if lt.is_numeric and rt.is_numeric:
            target = max_numeric_type(lt, rt)
            return cast_vector(left, target), cast_vector(right, target)
        if lt.id == TypeId.VARCHAR and (rt.is_numeric or rt.is_temporal):
            return cast_vector(left, rt), right
        if rt.id == TypeId.VARCHAR and (lt.is_numeric or lt.is_temporal):
            return left, cast_vector(right, lt)
        if lt.is_temporal and rt.is_temporal:
            if TypeId.INTERVAL in (lt.id, rt.id):
                # a span and an instant are not comparable
                raise ConversionException(f"cannot compare {lt} and {rt}")
            from ..types import TIMESTAMP
            return cast_vector(left, TIMESTAMP), cast_vector(right, TIMESTAMP)
        if lt.id == TypeId.BOOLEAN and rt.is_numeric:
            return cast_vector(left, rt), right
        if rt.id == TypeId.BOOLEAN and lt.is_numeric:
            return left, cast_vector(right, lt)
        if TypeId.ENUM in (lt.id, rt.id) and \
                {lt.id, rt.id} <= {TypeId.ENUM, TypeId.VARCHAR}:
            # enum vs string (or two enums): compare as text
            return cast_vector(left, VARCHAR), cast_vector(right, VARCHAR)
        if TypeId.JSON in (lt.id, rt.id) and \
                {lt.id, rt.id} <= {TypeId.JSON, TypeId.VARCHAR}:
            return cast_vector(left, VARCHAR), cast_vector(right, VARCHAR)
        raise ConversionException(f"cannot compare {lt} and {rt}")

    def evaluate_comparison(self, e: a.Comparison) -> Vector:
        if e.op in ("IS_TRUE", "IS_FALSE"):
            child = self.as_bool(self.evaluate(e.left))
            want = e.op == "IS_TRUE"
            out = child.validity & (child.data.astype(bool) == want)
            return Vector(BOOLEAN, out, np.ones(self.n, dtype=bool))
        left = self.evaluate(e.left)
        right = self.evaluate(e.right)
        left, right = self.coerce_pair(left, right)
        validity = left.validity & right.validity
        n = len(left)
        if left.type.numpy_dtype() is object and \
                left.type.id not in (TypeId.VARCHAR,):
            # lists/structs compare elementwise via python
            out = np.zeros(n, dtype=bool)
            for i in range(n):
                if validity[i]:
                    out[i] = self._py_compare(e.op, left.data[i], right.data[i])
            return Vector(BOOLEAN, out, validity)
        ld, rd = left.data, right.data
        if left.type.id == TypeId.INTERVAL:
            # DuckDB compares intervals on normalized micros (months ~ 30 d)
            from ..types import interval_total_micros
            ld = interval_total_micros(ld["months"], ld["days"], ld["micros"])
            rd = interval_total_micros(rd["months"], rd["days"], rd["micros"])
        if left.type.id == TypeId.VARCHAR:
            # object-dtype string compare; numpy handles elementwise on objects
            ld = ld.astype(object)
            rd = rd.astype(object)
            colls = collect_collations(e.left) + collect_collations(e.right)
            if colls:
                # COLLATE on either side collates the whole comparison
                # (expression.gram:258-259; DuckDB PushCollation)
                ld = apply_collation(ld, colls)
                rd = apply_collation(rd, colls)
            out = np.zeros(n, dtype=bool)
            idx = np.flatnonzero(validity)
            for i in idx:
                out[i] = self._py_compare(e.op, ld[i], rd[i])
            return Vector(BOOLEAN, out, validity)
        with np.errstate(invalid="ignore"):
            if e.op == "=":
                out = ld == rd
            elif e.op == "<>":
                out = ld != rd
            elif e.op == "<":
                out = ld < rd
            elif e.op == "<=":
                out = ld <= rd
            elif e.op == ">":
                out = ld > rd
            elif e.op == ">=":
                out = ld >= rd
            else:
                raise InternalException(f"bad comparison {e.op}")
        return Vector(BOOLEAN, np.asarray(out, dtype=bool), validity)

    @staticmethod
    def _py_compare(op: str, l, r) -> bool:
        if op == "=":
            return l == r
        if op == "<>":
            return l != r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        raise InternalException(f"bad comparison {op}")

    def as_bool(self, vec: Vector) -> Vector:
        if vec.type.id == TypeId.BOOLEAN:
            return vec
        if vec.type.id == TypeId.SQLNULL:
            return Vector(BOOLEAN, np.zeros(len(vec), dtype=bool),
                          vec.validity.copy())
        return cast_vector(vec, BOOLEAN)

    def evaluate_conjunction(self, e: a.Conjunction) -> Vector:
        children = [self.as_bool(self.evaluate(c)) for c in e.children]
        data = children[0].data.astype(bool)
        validity = children[0].validity.copy()
        for c in children[1:]:
            cd = c.data.astype(bool)
            cv = c.validity
            if e.op == "AND":
                # Kleene: false wins over NULL
                new_data = data & cd
                new_validity = (validity & cv) | (validity & ~data) | (cv & ~cd)
            else:
                new_data = data | cd
                new_validity = (validity & cv) | (validity & data) | (cv & cd)
            data, validity = new_data, new_validity
        return Vector(BOOLEAN, data, validity)

    def evaluate_in_list(self, e: a.InList) -> Vector:
        target = self.evaluate(e.expr)
        any_eq = np.zeros(self.n, dtype=bool)
        any_null = ~target.validity.copy()
        for v in e.values:
            cmp = self.evaluate_comparison(
                a.Comparison(op="=", left=e.expr, right=v))
            any_eq |= cmp.data.astype(bool) & cmp.validity
            any_null |= ~cmp.validity
        out = any_eq
        validity = any_eq | ~any_null
        if e.negated:
            out = ~out
        return Vector(BOOLEAN, out, validity)

    def evaluate_case(self, e: a.Case) -> Vector:
        n = self.n
        decided = np.zeros(n, dtype=bool)
        results: List[Tuple[np.ndarray, Vector]] = []
        for when, then in e.whens:
            if e.base is not None:
                cond = self.evaluate_comparison(
                    a.Comparison(op="=", left=e.base, right=when))
            else:
                cond = self.as_bool(self.evaluate(when))
            mask = cond.data.astype(bool) & cond.validity & ~decided
            decided |= mask
            results.append((mask, self.evaluate(then)))
        else_vec = self.evaluate(e.else_expr) if e.else_expr is not None else None
        branch_types = [v.type for _, v in results] + \
            ([else_vec.type] if else_vec is not None else [])
        typ = SQLNULL
        for bt in branch_types:
            if bt.id == TypeId.SQLNULL:
                continue
            if typ.id == TypeId.SQLNULL:
                typ = bt
            elif typ != bt and typ.is_numeric and bt.is_numeric:
                # covering numeric type across branches (mixed DECIMAL
                # scales must widen, not truncate to the first branch)
                typ = max_numeric_type(typ, bt)
        out = Vector.constant(None, typ, n)
        for mask, vec in results:
            if mask.any():
                if vec.type.id == TypeId.SQLNULL:
                    # typed-NULL branch (e.g. `-NULL`): object data holds
                    # None — only the validity may be written
                    out.validity[mask] = False
                    continue
                if vec.type != typ:
                    vec = cast_vector(vec, typ)
                out.data[mask] = vec.data[mask]
                out.validity[mask] = vec.validity[mask]
        rest = ~decided
        if else_vec is not None and rest.any():
            if else_vec.type.id == TypeId.SQLNULL:
                out.validity[rest] = False
            else:
                if else_vec.type != typ:
                    else_vec = cast_vector(else_vec, typ)
                out.data[rest] = else_vec.data[rest]
                out.validity[rest] = else_vec.validity[rest]
        return out

    def evaluate_like(self, e: a.Like) -> Vector:
        import re as _re
        s = self.evaluate(e.left)
        pat = self.evaluate(e.pattern)
        n = self.n
        validity = s.validity & pat.validity
        out = np.zeros(n, dtype=bool)
        cache = {}
        flags = _re.IGNORECASE if e.case_insensitive else 0
        esc = None
        if getattr(e, "escape", None) is not None:
            ev_esc = self.evaluate(e.escape)
            esc = str(ev_esc.data[0]) if len(ev_esc) and \
                ev_esc.validity[0] else None
        to_regex = glob_to_regex if e.glob else (
            (lambda p: like_to_regex(p, esc)) if esc else like_to_regex)
        for i in range(n):
            if validity[i]:
                p = str(pat.data[i])
                rx = cache.get(p)
                if rx is None:
                    rx = cache[p] = _re.compile(to_regex(p),
                                                _re.DOTALL | flags)
                out[i] = rx.fullmatch(str(s.data[i])) is not None
        if e.negated:
            out = ~out
        return Vector(BOOLEAN, out, validity)

    def evaluate_struct_extract(self, e: a.StructExtract) -> Vector:
        base = self.evaluate(e.child)
        return self._struct_field(base, e.field_name)

    def evaluate_array_index(self, e: a.ArrayIndex) -> Vector:
        base = self.evaluate(e.child)
        if e.is_slice:
            fn = get_function("list_slice")
            begin = self.evaluate(e.index) if e.index is not None else \
                Vector.constant(1, BIGINT, self.n)
            stop = self.evaluate(e.slice_stop) if e.slice_stop is not None \
                else Vector.constant(-1, BIGINT, self.n)
            args = [base, begin, stop]
            if e.slice_step is not None:
                args.append(self.evaluate(e.slice_step))
            return fn(args)
        idx = self.evaluate(e.index)
        if base.type.id == TypeId.STRUCT:
            if len(idx) == 0:
                from ..types import SQLNULL as _N
                return Vector.empty(_N)
            return self._struct_field(base, str(idx.data[0]))
        if base.type.id == TypeId.MAP:
            # m[k] returns the BARE value, NULL when the key is absent
            # (host DuckDB >= 1.2 breaking change; map_extract keeps the
            # one-element-list form)
            vt = base.type.fields[1][1]
            vals = []
            for i in range(len(base)):
                v = None
                if base.validity[i] and idx.validity[i]:
                    key = idx.value(i)
                    d = base.data[i]
                    v = d.get(key)
                vals.append(v)
            return Vector.from_values(vals, vt)
        fn = get_function("list_element")
        return fn([base, idx])

    def evaluate_struct_expr(self, e: a.StructExpr) -> Vector:
        vecs = [(k, self.evaluate(v)) for k, v in e.fields]
        typ = STRUCT([(k, v.type) for k, v in vecs])
        n = self.n
        data = np.empty(n, dtype=object)
        for i in range(n):
            data[i] = tuple(v.value(i) for _, v in vecs)
        return Vector(typ, data, np.ones(n, dtype=bool))

    # ------------------------------------------------------------ functions
    # scalar functions that understand the scaled-int DECIMAL representation
    # (exact arithmetic/rescale) or are representation-agnostic (value
    # movers: coalesce casts via cast_vector, list/struct builders render
    # through the element type)
    _DECIMAL_AWARE_SCALARS = frozenset({
        "+", "-", "*", "/", "//", "%", "mod", "add", "subtract", "multiply",
        "divide", "abs", "round", "floor", "ceil", "ceiling", "typeof",
        "coalesce", "ifnull", "nullif", "greatest", "least", "list_value",
        "struct_extract", "list_element", "map_extract", "first", "last",
        "constant_or_null", "alias", "count",
        # structure movers: never interpret element payloads, so the raw
        # scaled ints stay exact end-to-end
        "list_pack", "list_extract", "array_extract", "element_at",
        "list_sort", "array_sort", "list_reverse_sort", "list_distinct",
        "list_unique", "list_reverse", "list_slice", "array_slice",
        "array_pop_front", "array_pop_back", "list_concat", "array_concat",
        "flatten", "list_append", "array_append", "array_push_back",
        "list_prepend", "array_prepend", "array_push_front", "list_zip",
        "array_length", "len", "len_list", "cardinality", "list_resize",
        "map_keys", "map_values", "map_entries", "unnest",
    })
    _LAMBDA_FUNCS = {"list_transform": "transform", "list_apply": "transform",
                     "array_transform": "transform", "apply": "transform",
                     "list_filter": "filter", "array_filter": "filter",
                     "filter": "filter"}

    def evaluate_function(self, e: a.FunctionCall) -> Vector:
        name = e.name.lower()
        if name == "alias" and len(e.args) == 1:
            # alias(expr) -> the expression's output name (DuckDB)
            from .executor import Executor
            nm = Executor.derive_name(e.args[0])
            out = np.empty(self.n, dtype=object)
            out[:] = nm
            return Vector(VARCHAR, out, np.ones(self.n, dtype=bool))
        if get_function(name) is None:
            out = self._try_macro_call(e, name)
            if out is not None:
                return out
        if e.kwargs:
            if name == "struct_pack":
                # struct_pack(a := 1, b := 'x') builds a struct from its
                # named arguments (DuckDB)
                return self.evaluate_struct_expr(
                    a.StructExpr(fields=list(e.kwargs)))
            if name == "struct_insert" and len(e.args) == 1:
                # struct_insert(s, b := 2): existing fields + new ones
                base = self.evaluate(e.args[0])
                if base.type.id != TypeId.STRUCT:
                    raise BinderException(
                        "struct_insert requires a STRUCT argument")
                new = self.evaluate_struct_expr(
                    a.StructExpr(fields=list(e.kwargs)))
                names = [f[0] for f in base.type.fields] + \
                    [f[0] for f in new.type.fields]
                vals = []
                for i in range(self.n):
                    if base.validity[i] and new.validity[i]:
                        vals.append(tuple(base.data[i]) +
                                    tuple(new.data[i]))
                    else:
                        vals.append(None)
                child_types = [f[1] for f in base.type.fields] + \
                    [f[1] for f in new.type.fields]
                return Vector.from_values(
                    vals, STRUCT(list(zip(names, child_types))))
            # named arguments parse (select.gram:88-91) but no other
            # scalar builtin declares named parameters — clean binder
            # error, mirroring DuckDB's InvalidNamedParameter path
            raise BinderException(
                f'Invalid named parameter "{e.kwargs[0][0]}" for function '
                f"{name}")
        if any(isinstance(x, a.Lambda) for x in e.args):
            if name in ("list_reduce", "reduce"):
                return self._evaluate_list_reduce(e)
            mode = self._LAMBDA_FUNCS.get(name)
            if mode is None:
                raise BinderException(
                    f"lambda expressions are not supported by "
                    f"function {name}")
            return self._evaluate_list_lambda(e, mode)
        # unnest and star-arg functions unsupported here
        args = [self.evaluate(x) for x in e.args if not isinstance(x, a.Star)]
        if name not in self._DECIMAL_AWARE_SCALARS:
            from ..functions.scalar import _decimal_to_double, \
                _type_has_decimal
            if any(_type_has_decimal(v.type) for v in args):
                # decimal-unaware functions see DOUBLE, including inside
                # LIST/STRUCT/MAP payloads (the scaled int would be off by
                # 10^scale); the aware set keeps exact semantics
                args = [_decimal_to_double(v) for v in args]
        fn = get_function(name)
        if fn is None:
            from ..functions.scalar import function_not_found
            raise function_not_found(name)
        if not args and self.n >= 0:
            # supply row count to zero-arg functions (e.g. random())
            args = [Vector(BIGINT, np.zeros(self.n, dtype=np.int64))]
        return fn(args, self.executor.connection) if fn.needs_ctx else fn(args)

    def _try_macro_call(self, e: a.FunctionCall, name: str):
        """Expand a user macro call (CREATE MACRO): substitute the stored
        body's parameter ColumnRefs with the call's argument ASTs and
        evaluate in place (DuckDB binds macros by AST substitution too)."""
        ex = getattr(self, "executor", None)
        con = getattr(ex, "connection", None) if ex is not None else None
        if con is None:
            return None
        macro = con.resolve_catalog(None).get_macro(name)
        if macro is None or macro.body is None:
            return None
        if len(e.args) != len(macro.params):
            raise BinderException(
                f"Macro function '{macro.name}' requires "
                f"{len(macro.params)} positional arguments, but "
                f"{len(e.args)} were provided")
        mapping = {dn: de for dn, de in macro.defaults}
        for p, arg in zip(macro.params, e.args):
            mapping[p] = arg
        declared = {dn for dn, _ in macro.defaults}
        for kn, ke in e.kwargs:
            if kn.lower() not in declared:
                raise BinderException(
                    f'Invalid named parameter "{kn}" for macro '
                    f"{macro.name}")
            mapping[kn.lower()] = ke
        from ..sql.ast import substitute_refs
        return self.evaluate(substitute_refs(macro.body, mapping))

    def _evaluate_list_reduce(self, e: a.FunctionCall) -> Vector:
        """list_reduce(list, (acc, x) -> expr): left fold, seeded with
        the first element (DuckDB; empty/NULL lists error there — here
        they yield NULL). Evaluated per fold STEP, vectorized over rows:
        step k combines every row's accumulator with its (k+1)-th
        element."""
        from .relation import Binding, Relation
        lam = next(x for x in e.args if isinstance(x, a.Lambda))
        if len(lam.params) != 2:
            raise BinderException(
                "list_reduce expects a two-parameter lambda")
        list_args = [x for x in e.args if not isinstance(x, a.Lambda)]
        lv = self.evaluate(list_args[0])
        n = len(lv)
        rows = [list(lv.data[i]) if lv.validity[i] and
                lv.data[i] is not None else None for i in range(n)]
        max_len = max((len(r) for r in rows if r), default=0)
        acc = [r[0] if r else None for r in rows]
        for k in range(1, max_len):
            active = [r is not None and len(r) > k for r in rows]
            if not any(active):
                break
            acc_vec = Vector.from_values(
                [acc[i] if active[i] else None for i in range(n)],
                _infer_constant_type(next(
                    (acc[i] for i in range(n) if active[i]), None)))
            x_vec = Vector.from_values(
                [rows[i][k] if active[i] else None for i in range(n)],
                _infer_constant_type(next(
                    (rows[i][k] for i in range(n) if active[i]), None)))
            cols = list(self.rel.columns) + [acc_vec, x_vec]
            slots = [len(self.rel.columns), len(self.rel.columns) + 1]
            child = Relation(
                cols, self.rel.bindings + [
                    Binding("", list(lam.params), slots)])
            ev = Evaluator(self.executor, child, self.outer, env=self.env)
            out = ev.evaluate(lam.body)
            for i in range(n):
                if active[i]:
                    acc[i] = out.value(i)
        typ = _infer_constant_type(next(
            (v for v in acc if v is not None), None))
        return Vector.from_values(acc, typ)

    def _evaluate_list_lambda(self, e: a.FunctionCall, mode: str) -> Vector:
        """list_transform / list_filter with a one-parameter lambda:
        flatten every row's elements into one vector, evaluate the body
        ONCE over a child relation (param column + the outer row's columns
        repeated per element, so correlated bodies like `x -> x + a`
        work; the param shadows same-named outer columns), then regroup."""
        from ..types import LIST
        from .relation import Binding, Relation
        lam = next(x for x in e.args if isinstance(x, a.Lambda))
        if len(lam.params) not in (1, 2):
            # two-parameter form: (x, i) with the 1-based element index
            raise BinderException(
                f"{e.name} expects a one- or two-parameter lambda")
        list_args = [x for x in e.args if not isinstance(x, a.Lambda)]
        if len(list_args) != 1:
            raise BinderException(
                f"{e.name} expects (list, lambda) arguments")
        lv = self.evaluate(list_args[0])
        n = len(lv)
        rows = [list(lv.data[i]) if lv.validity[i] and
                lv.data[i] is not None else None for i in range(n)]
        counts = np.array([len(r) if r is not None else 0 for r in rows],
                          dtype=np.int64)
        flat = [el for r in rows if r is not None for el in r]
        child_t = getattr(lv.type, "child", None) or SQLNULL
        pcol = Vector.from_values(flat, child_t)
        rep = np.repeat(np.arange(n), counts)
        base = self.rel.take(rep)
        params = {p.lower() for p in lam.params}
        bindings = []
        for b in base.bindings:
            kept = [(nm, idx, h) for nm, idx, h in
                    zip(b.names, b.indices, b.hidden)
                    if nm.lower() not in params]  # params shadow
            bindings.append(Binding(b.alias, [x[0] for x in kept],
                                    [x[1] for x in kept],
                                    [x[2] for x in kept]))
        cols = list(base.columns) + [pcol]
        bindings.append(Binding(lam.params[0], [lam.params[0]],
                                [len(cols) - 1]))
        if len(lam.params) == 2:
            idx_flat = np.concatenate(
                [np.arange(1, c + 1, dtype=np.int64) for c in counts
                 if c > 0]) if counts.sum() else np.zeros(0, np.int64)
            cols.append(Vector(BIGINT, idx_flat))
            bindings.append(Binding(lam.params[1], [lam.params[1]],
                                    [len(cols) - 1]))
        ev2 = Evaluator(self.executor, Relation(cols, bindings),
                        self.outer, env=self.env)
        body = ev2.evaluate(lam.body)
        out = np.empty(n, dtype=object)
        validity = lv.validity.copy()
        pos = 0
        for i in range(n):
            if rows[i] is None:
                continue
            c = len(rows[i])
            if mode == "transform":
                out[i] = [None if not body.validity[pos + j]
                          else body.value(pos + j) for j in range(c)]
            else:
                out[i] = [rows[i][j] for j in range(c)
                          if body.validity[pos + j] and
                          bool(body.data[pos + j])]
            pos += c
        elem_t = body.type if mode == "transform" else child_t
        return Vector(LIST(elem_t), out, validity)

    # ------------------------------------------------------------ subqueries
    def evaluate_subquery(self, e: a.SubqueryExpr) -> Vector:
        if self.n == 0:
            # uncorrelated subqueries still execute once (DuckDB plans them
            # as independent nodes; the PGQ CSR-build side effects rely on
            # this — e.g. create_csr_vertex under an empty edge CTE)
            try:
                res = self.executor.execute_select(e.subquery,
                                                   outer=self.outer,
                                                   cte_env=self.env)
                typ = res.columns[0].type if res.columns else SQLNULL
            except BinderException:
                typ = SQLNULL
            return Vector.empty(typ if e.kind == "SCALAR" else BOOLEAN)
        probe = OuterScope(self.rel, 0, self.outer)
        result0 = self.executor.execute_select(e.subquery, outer=probe, cte_env=self.env)
        correlated = probe.accessed
        if e.kind == "SCALAR":
            if not correlated:
                value, typ = self._scalar_from_result(result0)
                return Vector.constant(value, typ, self.n)
            values = [self._scalar_from_result(result0)]
            for i in range(1, self.n):
                scope = OuterScope(self.rel, i, self.outer)
                values.append(self._scalar_from_result(
                    self.executor.execute_select(e.subquery, outer=scope,
                                                 cte_env=self.env)))
            typ = next((t for _, t in values if t.id != TypeId.SQLNULL), SQLNULL)
            return Vector.from_values([v for v, _ in values], typ)
        if e.kind in ("EXISTS", "NOT_EXISTS"):
            def exists(res):
                return res.row_count > 0
            if not correlated:
                v = exists(result0)
                v = (not v) if e.kind == "NOT_EXISTS" else v
                return Vector.constant(v, BOOLEAN, self.n)
            out = np.zeros(self.n, dtype=bool)
            out[0] = exists(result0)
            for i in range(1, self.n):
                scope = OuterScope(self.rel, i, self.outer)
                out[i] = exists(self.executor.execute_select(
                    e.subquery, outer=scope, cte_env=self.env))
            if e.kind == "NOT_EXISTS":
                out = ~out
            return Vector(BOOLEAN, out, np.ones(self.n, dtype=bool))
        if e.kind in ("IN", "NOT_IN", "ANY", "ALL"):
            target = self.evaluate(e.child)
            op = e.comparison or "="
            def check(res, i):
                col = res.columns[0]
                found = False
                has_null = not target.validity[i]
                tval = target.value(i)
                results = []
                for j in range(len(col)):
                    v = col.value(j)
                    if v is None or tval is None:
                        results.append(None)
                    else:
                        results.append(self._py_compare(op, tval, v))
                if e.kind in ("IN", "NOT_IN", "ANY"):
                    if any(r is True for r in results):
                        val = True
                    elif any(r is None for r in results):
                        val = None
                    else:
                        val = False
                    if e.kind == "NOT_IN":
                        val = None if val is None else not val
                    return val
                # ALL
                if any(r is False for r in results):
                    return False
                if any(r is None for r in results):
                    return None
                return True
            if not correlated:
                vals = [check(result0, i) for i in range(self.n)]
            else:
                vals = [check(result0, 0)]
                for i in range(1, self.n):
                    scope = OuterScope(self.rel, i, self.outer)
                    res = self.executor.execute_select(
                        e.subquery, outer=scope, cte_env=self.env)
                    vals.append(check(res, i))
            return Vector.from_values(vals, BOOLEAN)
        raise InternalException(f"unknown subquery kind {e.kind}")

    @staticmethod
    def _scalar_from_result(res) -> Tuple[object, LogicalType]:
        if res.row_count == 0:
            return None, res.columns[0].type if res.columns else SQLNULL
        col = res.columns[0]
        return col.value(0), col.type
