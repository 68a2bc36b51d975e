"""Intermediate relation: named bindings over whole-column vectors.

The executor is fully vectorized over entire columns (no 2048-row morsels —
the TPU path wants maximal batches; the reference's chunking is a host-engine
artifact, SURVEY.md §2.7). Each FROM-clause alias contributes a Binding; base
tables also expose a hidden dense ``rowid`` pseudo-column (the reference
relies on DuckDB rowids for CSR construction, match.cpp:598-600).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..errors import BinderException
from ..storage.vector import LazyVector, SelChain, Vector
from ..types import BIGINT


class Binding:
    """One table alias visible in a relation: alias plus its column slots."""

    __slots__ = ("alias", "names", "indices", "hidden", "using_hidden")

    def __init__(self, alias: str, names: List[str], indices: List[int],
                 hidden: Optional[List[bool]] = None,
                 using_hidden: Optional[frozenset] = None):
        self.alias = alias
        self.names = names          # column names in binding order
        self.indices = indices      # physical column slots in Relation.columns
        self.hidden = hidden or [False] * len(names)
        # names hidden by USING/NATURAL join dedup: excluded from bare
        # SELECT * but still included by a qualified alias.* and always
        # reachable by qualified reference (unlike rowid-style hidden)
        self.using_hidden = using_hidden or frozenset()

    def visible(self) -> List[Tuple[str, int]]:
        return [(n, i) for n, i, h in zip(self.names, self.indices, self.hidden)
                if not h]

    def find(self, col: str) -> Optional[int]:
        lcol = col.lower()
        for n, i in zip(self.names, self.indices):
            if n.lower() == lcol:
                return i
        return None

    def is_hidden(self, col: str) -> bool:
        lcol = col.lower()
        for n, h in zip(self.names, self.hidden):
            if n.lower() == lcol:
                return h
        return False


class Relation:
    """Columns + bindings; all columns share one row count."""

    def __init__(self, columns: List[Vector], bindings: List[Binding]):
        self.columns = columns
        self.bindings = bindings

    @property
    def row_count(self) -> int:
        return len(self.columns[0]) if self.columns else 0

    # ------------------------------------------------------------- resolution
    def resolve(self, parts: Tuple[str, ...]) -> Optional[int]:
        """Resolve a (possibly qualified) column reference to a physical slot.
        Returns None when not found (caller decides whether to error)."""
        if len(parts) == 1:
            col = parts[0]
            matches = []
            for b in self.bindings:
                idx = b.find(col)
                if idx is not None:
                    matches.append((b.alias, idx, b.is_hidden(col)))
            if not matches:
                return None
            if len(matches) > 1:
                # identical slot via multiple bindings is fine; a hidden
                # duplicate (USING/NATURAL dedup) defers to the visible one
                slots = {m[1] for m in matches}
                if len(slots) > 1:
                    vis = [m for m in matches if not m[2]]
                    if len({m[1] for m in vis}) == 1:
                        return vis[0][1]
                    raise BinderException(
                        f'Ambiguous reference to column name "{col}" '
                        f'(use: "{matches[0][0]}.{col}" or '
                        f'"{matches[1][0]}.{col}")')
            return matches[0][1]
        # qualified: try last-two as (table, column)
        table, col = parts[-2], parts[-1]
        for b in self.bindings:
            if b.alias.lower() == table.lower():
                idx = b.find(col)
                if idx is not None:
                    return idx
        return None

    def find_binding(self, alias: str) -> Optional[Binding]:
        for b in self.bindings:
            if b.alias.lower() == alias.lower():
                return b
        return None

    # -------------------------------------------------------------- row ops
    # take/filter are LAZY: columns become LazyVector views over their eager
    # bases, and selector composition is shared across columns (all columns
    # of a join side share one index array, so the index math happens once
    # per distinct parent selector instead of once per column). Only columns
    # an expression actually reads ever gather their data.

    def _lazy_gather(self, idx: np.ndarray,
                     null_mask: Optional[np.ndarray] = None) -> "Relation":
        memo: Dict[int, object] = {}

        def extend(sel: "SelChain") -> "SelChain":
            key = id(sel)
            out = memo.get(key)
            if out is None:
                out = SelChain(idx, sel)
                memo[key] = out
            return out

        def compose_nm(nm: np.ndarray) -> np.ndarray:
            key = id(nm)
            out = memo.get(key)
            if out is None:
                out = nm[idx]
                memo[key] = out
            return out

        root = SelChain(idx)
        cols: List[Vector] = []
        for c in self.columns:
            if isinstance(c, LazyVector):
                nm = compose_nm(c._nullmask) if c._nullmask is not None \
                    else None
                if null_mask is not None:
                    nm = null_mask if nm is None else (nm | null_mask)
                cols.append(LazyVector(c._base, extend(c._sel), nm))
            else:
                cols.append(LazyVector(c, root, null_mask))
        return Relation(cols, self.bindings)

    def take(self, idx: np.ndarray) -> "Relation":
        return self._lazy_gather(idx)

    def filter(self, mask: np.ndarray) -> "Relation":
        return self._lazy_gather(np.flatnonzero(mask))

    def take_with_nulls(self, idx: np.ndarray, null_mask: np.ndarray
                        ) -> "Relation":
        """Gather rows; rows where null_mask is True become all-NULL (for
        outer-join padding). idx entries for null rows may be arbitrary."""
        if self.row_count == 0:
            cols = [Vector.constant(None, c.type, len(idx))
                    for c in self.columns]
            return Relation(cols, self.bindings)
        safe_idx = np.where(null_mask, 0, idx) if len(idx) else idx
        return self._lazy_gather(safe_idx, null_mask)

    @staticmethod
    def concat_horizontal(left: "Relation", right: "Relation") -> "Relation":
        offset = len(left.columns)
        cols = left.columns + right.columns
        bindings = list(left.bindings)
        existing = {b.alias.lower() for b in bindings}
        for b in right.bindings:
            alias = b.alias
            if alias.lower() in existing and \
                    alias.lower().startswith("unnamed_subquery"):
                # DuckDB numbers duplicate unnamed subqueries: 2, 3, ...
                k = 2
                while f"unnamed_subquery{k}" in existing:
                    k += 1
                alias = f"unnamed_subquery{k}"
            existing.add(alias.lower())
            bindings.append(Binding(alias, list(b.names),
                                    [i + offset for i in b.indices],
                                    list(b.hidden), b.using_hidden))
        return Relation(cols, bindings)

    @staticmethod
    def from_table(table, alias: str) -> "Relation":
        n = table.row_count
        cols = [c for c in table.columns]
        names = list(table.column_names)
        hidden = [False] * len(names)
        # hidden rowid pseudo-column
        rowid = Vector(BIGINT, np.arange(n, dtype=np.int64))
        cols = cols + [rowid]
        names = names + ["rowid"]
        hidden = hidden + [True]
        binding = Binding(alias, names, list(range(len(cols))), hidden)
        return Relation(cols, [binding])

    @staticmethod
    def from_columns(alias: str, names: List[str], cols: List[Vector],
                     with_rowid: bool = False) -> "Relation":
        names = list(names)
        # DuckDB renames duplicate subquery output columns: id, id_1, id_2
        seen = {}
        for i, nm in enumerate(names):
            key = nm.lower()
            if key in seen:
                k = seen[key]
                while f"{nm}_{k}".lower() in seen:
                    k += 1
                seen[key] = k + 1
                names[i] = f"{nm}_{k}"
                seen[names[i].lower()] = 1
            else:
                seen[key] = 1
        cols = list(cols)
        hidden = [False] * len(names)
        if with_rowid:
            n = len(cols[0]) if cols else 0
            cols.append(Vector(BIGINT, np.arange(n, dtype=np.int64)))
            names.append("rowid")
            hidden.append(True)
        return Relation(cols, [Binding(alias, names, list(range(len(cols))),
                                       hidden)])
