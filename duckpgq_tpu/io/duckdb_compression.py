"""Column-segment decoders for DuckDB storage files.

Covers the physical segment encodings needed to materialize tables out of
``.duckdb`` files (see ``duckdb_file.py``):

- UNCOMPRESSED fixed-width numerics: raw little-endian arrays
- UNCOMPRESSED VARCHAR: 8-byte dictionary header (size, end), per-row
  ``int32`` prefix offsets, string bytes packed backward from ``end``
- UNCOMPRESSED / CONSTANT validity: raw u64 bitmask words / all-valid or
  all-null derived from the segment statistics
- CONSTANT numerics are rejected (the constant lives in stats this reader
  skips); RLE/bitpacking/dictionary/FSST raise ``UnsupportedDuckDBFile``
  with the scheme name so the gap is explicit.
"""

from __future__ import annotations

import struct
from typing import Any, List

from .duckdb_file import (COMPRESSION_NAMES, BlockFile, DataPointer,
                          UnsupportedDuckDBFile, _FIXED_WIDTH)

_STRUCT_FMT = {
    "BOOLEAN": "?", "TINYINT": "b", "SMALLINT": "h", "INTEGER": "i",
    "BIGINT": "q", "UTINYINT": "B", "USMALLINT": "H", "UINTEGER": "I",
    "UBIGINT": "Q", "FLOAT": "f", "DOUBLE": "d", "DATE": "i",
    "TIMESTAMP": "q",
}


def decode_segment(bf: BlockFile, dp: DataPointer,
                   type_name: str) -> List[Any]:
    comp = COMPRESSION_NAMES.get(dp.compression, str(dp.compression))
    if type_name == "VALIDITY":
        return _decode_validity(bf, dp, comp)
    if comp == "UNCOMPRESSED":
        if type_name == "VARCHAR":
            return _decode_string_uncompressed(bf, dp)
        if type_name in _STRUCT_FMT:
            return _decode_fixed_uncompressed(bf, dp, type_name)
    if comp == "EMPTY":
        return [None] * dp.tuple_count
    raise UnsupportedDuckDBFile(
        f"segment compression {comp} for type {type_name} is not supported")


def _decode_validity(bf: BlockFile, dp: DataPointer, comp: str) -> List[bool]:
    n = dp.tuple_count
    if comp == "CONSTANT":
        # the constant mask value lives in the segment statistics
        if dp.has_null and not dp.has_no_null:
            return [False] * n
        return [True] * n
    if comp == "UNCOMPRESSED":
        nwords = (n + 63) // 64
        raw = bf.block_payload(dp.block_id, dp.offset, nwords * 8)
        words = struct.unpack(f"<{nwords}Q", raw)
        return [bool(words[i >> 6] >> (i & 63) & 1) for i in range(n)]
    raise UnsupportedDuckDBFile(f"validity compression {comp}")


def _decode_fixed_uncompressed(bf: BlockFile, dp: DataPointer,
                               type_name: str) -> List[Any]:
    width = _FIXED_WIDTH[type_name]
    raw = bf.block_payload(dp.block_id, dp.offset, width * dp.tuple_count)
    vals = list(struct.unpack(f"<{dp.tuple_count}{_STRUCT_FMT[type_name]}",
                              raw))
    return vals


def _decode_string_uncompressed(bf: BlockFile, dp: DataPointer) -> List[str]:
    n = dp.tuple_count
    header = bf.block_payload(dp.block_id, dp.offset, 8 + 4 * n)
    _dict_size, dict_end = struct.unpack_from("<II", header, 0)
    offsets = struct.unpack_from(f"<{n}i", header, 8)
    seg = bf.block_payload(dp.block_id, dp.offset, dict_end)
    out: List[str] = []
    prev = 0
    for off in offsets:
        if off < 0 or prev < 0:
            raise UnsupportedDuckDBFile(
                "overflow (big) strings in uncompressed segment")
        if off < prev:
            raise UnsupportedDuckDBFile("non-monotone string offsets")
        out.append(seg[dict_end - off: dict_end - prev]
                   .decode("utf-8", errors="replace"))
        prev = off
    return out
