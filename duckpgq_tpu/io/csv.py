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


def read_csv(path: str, delimiter: str = ",", header: bool = True
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
