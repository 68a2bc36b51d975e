"""Columnar vector storage.

Design: whole-column vectors (not 2048-row chunks like the reference host
engine — on TPU we want maximal batch sizes so kernels see the full column;
cf. SURVEY.md §2.7 "512-lane batching maps to a TPU batch dimension").

Primitive columns are typed numpy arrays + a validity bitmask; VARCHAR and
nested (LIST/STRUCT) columns are object arrays on host (None == NULL).
Numeric columns convert zero-copy to JAX device arrays for the compute path.
"""

from __future__ import annotations

from typing import Any, Iterable, List, Optional, Sequence

import numpy as np

from ..errors import ConversionException, InternalException
from ..types import LogicalType, TypeId, SQLNULL


class Vector:
    """A column of values with a logical type and validity mask."""

    __slots__ = ("type", "data", "validity", "constant_hint")

    def __init__(self, typ: LogicalType, data: np.ndarray,
                 validity: Optional[np.ndarray] = None,
                 constant_hint: bool = False):
        self.type = typ
        self.data = data
        if validity is None:
            validity = np.ones(len(data), dtype=bool)
        self.validity = validity
        # Set ONLY at literal-evaluation sites (Evaluator's a.Constant
        # branch): every row is the same value, so casts may parse once
        # and broadcast (a VARCHAR timestamp literal compared against a
        # 21M-row column was being re-parsed per row — 172 of BI17's
        # 174 s at SF0.3). Vector.constant must NOT set it: several
        # callers use it as a fillable output buffer and mutate data
        # in place (the differential harness caught that).
        self.constant_hint = constant_hint

    # -- constructors -------------------------------------------------------
    @staticmethod
    def from_values(values: Sequence[Any], typ: LogicalType) -> "Vector":
        n = len(values)
        dtype = typ.numpy_dtype()
        if dtype is object:
            data = np.empty(n, dtype=object)
            validity = np.ones(n, dtype=bool)
            for i, v in enumerate(values):
                if v is None:
                    validity[i] = False
                else:
                    data[i] = v
            return Vector(typ, data, validity)
        data = np.zeros(n, dtype=dtype)
        validity = np.ones(n, dtype=bool)
        for i, v in enumerate(values):
            if v is None:
                validity[i] = False
            else:
                try:
                    data[i] = v
                except (ValueError, OverflowError) as e:
                    raise ConversionException(
                        f"Could not convert value {v!r} to {typ}") from e
        return Vector(typ, data, validity)

    @staticmethod
    def constant(value: Any, typ: LogicalType, n: int) -> "Vector":
        dtype = typ.numpy_dtype()
        if value is None:
            if dtype is object:
                data = np.empty(n, dtype=object)
            else:
                data = np.zeros(n, dtype=dtype)
            return Vector(typ, data, np.zeros(n, dtype=bool))
        if dtype is object:
            data = np.empty(n, dtype=object)
            data[:] = [value] * n if isinstance(value, (list, tuple)) else value
            if isinstance(value, (list, tuple)):
                for i in range(n):
                    data[i] = value
        elif getattr(dtype, "fields", None):
            # structured scalar (e.g. INTERVAL triples): fill via assignment
            data = np.zeros(n, dtype=dtype)
            data[:] = tuple(value) if isinstance(value, (tuple, list)) \
                else value
        else:
            data = np.full(n, value, dtype=dtype)
        return Vector(typ, data, np.ones(n, dtype=bool))

    @staticmethod
    def empty(typ: LogicalType) -> "Vector":
        dtype = typ.numpy_dtype()
        if dtype is object:
            return Vector(typ, np.empty(0, dtype=object), np.empty(0, dtype=bool))
        return Vector(typ, np.empty(0, dtype=dtype), np.empty(0, dtype=bool))

    # -- basic ops ----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.data)

    def take(self, idx: np.ndarray) -> "Vector":
        return Vector(self.type, self.data[idx], self.validity[idx])

    def filter(self, mask: np.ndarray) -> "Vector":
        return Vector(self.type, self.data[mask], self.validity[mask])

    def slice(self, start: int, stop: int) -> "Vector":
        return Vector(self.type, self.data[start:stop], self.validity[start:stop])

    def copy(self) -> "Vector":
        return Vector(self.type, self.data.copy(), self.validity.copy())

    def value(self, i: int):
        """Python value at row i (None if NULL)."""
        if not self.validity[i]:
            return None
        v = self.data[i]
        if isinstance(v, np.generic):
            return v.item()
        return v

    def to_list(self) -> List[Any]:
        return [self.value(i) for i in range(len(self))]

    @staticmethod
    def concat(vectors: Sequence["Vector"]) -> "Vector":
        if not vectors:
            raise InternalException("concat of zero vectors")
        typ = next((v.type for v in vectors if v.type.id != TypeId.SQLNULL),
                   vectors[0].type)
        casted = []
        for v in vectors:
            if v.type.id != typ.id and v.type.id == TypeId.SQLNULL:
                casted.append(Vector.constant(None, typ, len(v)))
            else:
                casted.append(v)
        data = np.concatenate([v.data for v in casted]) if casted else None
        if typ.numpy_dtype() is object and data.dtype != object:
            data = data.astype(object)
        validity = np.concatenate([v.validity for v in casted])
        return Vector(typ, data, validity)

    def __repr__(self):
        return f"Vector({self.type}, n={len(self)})"


def _gather(base: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i] = base[idx[i]] — the late-materialization hot path. Large
    fixed-size gathers go through the multithreaded native runtime
    (native/graphrt.cpp gr_gather_bytes: memory-bandwidth bound, threads
    scale it near-linearly); small or object-dtype gathers use numpy."""
    if len(idx) >= (1 << 18) and base.dtype != object:
        from .. import native_rt
        out = native_rt.gather(np.ascontiguousarray(base), idx)
        if out is not None:
            return out
    return base[idx]


class SelChain:
    """Deferred row-selector composition: a chain of index arrays applied in
    sequence. ``resolve()`` flattens the chain to one index array and caches
    it at every node, so chains shared across columns (all columns of a join
    side share the same node) compose exactly once — and columns never read
    never compose at all."""

    __slots__ = ("parent", "idx", "_resolved")

    def __init__(self, idx: np.ndarray, parent: Optional["SelChain"] = None):
        self.parent = parent
        self.idx = idx
        self._resolved: Optional[np.ndarray] = None

    def resolve(self) -> np.ndarray:
        if self._resolved is None:
            if self.parent is None:
                self._resolved = self.idx
            else:
                self._resolved = _gather(self.parent.resolve(), self.idx)
        return self._resolved

    def __len__(self) -> int:
        return len(self.idx)


class LazyVector(Vector):
    """Late-materializing column view: an eager base vector plus a selector
    chain (and an optional forced-NULL mask for outer-join padding). Joins
    and filters produce these, so a query only pays the gather for columns an
    expression actually reads — the columnar late-materialization the
    reference inherits from DuckDB's executor (SURVEY.md §1 L0), done here at
    the column level.

    ``data``/``validity`` materialize on first access and are cached; the
    materialized arrays are fresh copies, so in-place writes behave exactly
    like writes to an eagerly gathered vector."""

    __slots__ = ("_base", "_sel", "_nullmask", "_mat")

    def __init__(self, base: Vector, sel, nullmask: Optional[np.ndarray] = None):
        # base must be eager — Relation keeps chains flat across gathers
        self.type = base.type
        self._base = base
        self._sel = sel if isinstance(sel, SelChain) else SelChain(sel)
        self._nullmask = nullmask
        self._mat = None

    def _materialize(self):
        if self._mat is None:
            sel = self._sel.resolve()
            d = _gather(self._base.data, sel)
            v = _gather(self._base.validity, sel)
            if self._nullmask is not None:
                v = v & ~self._nullmask
            self._mat = (d, v)
        return self._mat

    @property
    def data(self) -> np.ndarray:
        return self._materialize()[0]

    @property
    def validity(self) -> np.ndarray:
        return self._materialize()[1]

    def __len__(self) -> int:
        return len(self._sel)

    def take(self, idx: np.ndarray) -> "Vector":
        nm = self._nullmask[idx] if self._nullmask is not None else None
        return LazyVector(self._base, SelChain(idx, self._sel), nm)

    def filter(self, mask: np.ndarray) -> "Vector":
        return self.take(np.flatnonzero(mask))

    def slice(self, start: int, stop: int) -> "Vector":
        return self.take(np.arange(start, stop, dtype=np.int64))

    def value(self, i: int):
        """Row access without materializing the whole column."""
        if self._mat is not None:
            return super().value(i)
        if self._nullmask is not None and self._nullmask[i]:
            return None
        return self._base.value(int(self._sel.resolve()[i]))

    def __repr__(self):
        return f"LazyVector({self.type}, n={len(self)})"
