"""Minimal Parquet reader/writer (no pyarrow in this environment).

Implemented from the Parquet format spec: thrift compact-protocol footer
parsing, PLAIN / RLE-dictionary decoding, snappy decompression — enough to
load the reference's bundled LDBC SNB parquet exports (written by DuckDB).
"""

from __future__ import annotations

from typing import List, Tuple

from ..errors import IOException
from ..storage.vector import Vector


def read_parquet(path: str) -> Tuple[List[str], List[Vector]]:
    import os

    from ..errors import IOException
    if not os.path.isfile(path):
        raise IOException(
            f'No files found that match the pattern "{path}"')
    from . import parquet_impl
    return parquet_impl.read_parquet(path)


def write_parquet(path: str, names, columns):
    from . import parquet_impl
    return parquet_impl.write_parquet(path, names, columns)
