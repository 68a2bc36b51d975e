"""CSV read/write with simple type sniffing."""

from __future__ import annotations

import csv as _csv
from typing import List, Tuple

import numpy as np

from ..storage.vector import Vector
from ..types import BIGINT, DOUBLE, VARCHAR, value_to_string


def _sniff_type(values: List[str]):
    non_null = [v for v in values if v not in ("", "NULL")]
    if not non_null:
        return VARCHAR
    def is_int(s):
        try:
            int(s)
            return True
        except ValueError:
            return False
    def is_float(s):
        try:
            float(s)
            return True
        except ValueError:
            return False
    if all(is_int(v) for v in non_null):
        return BIGINT
    if all(is_float(v) for v in non_null):
        return DOUBLE
    return VARCHAR


def _sniff_header(rows) -> bool:
    """DuckDB-style header detection: the first row is a header when it
    does NOT fit the types the remaining rows sniff to (a numeric data
    column under a non-numeric first cell), and is data when it contains
    numeric-looking cells itself. All-text single-row files default to
    header (the old fixed behavior)."""
    def is_num(s):
        try:
            float(s)
            return True
        except ValueError:
            return False
    first = rows[0]
    if len(rows) > 1:
        for j in range(len(first)):
            body = [r[j] for r in rows[1:] if j < len(r)]
            t = _sniff_type(body)
            if t is not VARCHAR and first[j] not in ("", "NULL") and \
                    not is_num(first[j]):
                return True
    if any(is_num(c) for c in first):
        return False
    return True


def read_csv(path: str, delimiter: str = ",",
             header: "bool | None" = None
             ) -> Tuple[List[str], List[Vector]]:
    import os

    from ..errors import IOException
    if not os.path.isfile(path):
        raise IOException(
            f'No files found that match the pattern "{path}"')
    with open(path, newline="") as f:
        sample = f.read(8192)
        f.seek(0)
        if "|" in sample.split("\n", 1)[0] and delimiter == ",":
            delimiter = "|"
        reader = _csv.reader(f, delimiter=delimiter)
        rows = list(reader)
    if not rows:
        return [], []
    if header is None:
        header = _sniff_header(rows)
    if header:
        names = rows[0]
        rows = rows[1:]
    else:
        names = [f"column{i}" for i in range(len(rows[0]))]
    cols = []
    for j, name in enumerate(names):
        values = [r[j] if j < len(r) else "" for r in rows]
        typ = _sniff_type(values)
        pyvals = []
        for v in values:
            if v in ("", "NULL"):
                pyvals.append(None)
            elif typ is BIGINT:
                pyvals.append(int(v))
            elif typ is DOUBLE:
                pyvals.append(float(v))
            else:
                pyvals.append(v)
        cols.append(Vector.from_values(pyvals, typ))
    return names, cols


def write_csv(path: str, names: List[str], columns: List[Vector],
              delimiter: str = ",", header: bool = True):
    with open(path, "w", newline="") as f:
        writer = _csv.writer(f, delimiter=delimiter)
        if header:
            writer.writerow(names)
        n = len(columns[0]) if columns else 0
        for i in range(n):
            row = []
            for c in columns:
                v = c.value(i)
                row.append("" if v is None else value_to_string(v, c.type))
            writer.writerow(row)
