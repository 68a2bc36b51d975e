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

    __slots__ = ("type", "data", "validity")

    def __init__(self, typ: LogicalType, data: np.ndarray,
                 validity: Optional[np.ndarray] = None):
        self.type = typ
        self.data = data
        if validity is None:
            validity = np.ones(len(data), dtype=bool)
        self.validity = validity

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
