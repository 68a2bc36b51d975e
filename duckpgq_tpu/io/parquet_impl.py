"""Self-contained Parquet reader/writer (pure Python; no pyarrow available).

Scope: what DuckDB writes for the reference's bundled LDBC SNB exports —
format v1/v2 data pages, PLAIN + RLE_DICTIONARY encodings, snappy or
uncompressed, flat schemas of BOOLEAN/INT32/INT64/DOUBLE/FLOAT/BYTE_ARRAY
with optional fields (max def level 1). The writer emits PLAIN uncompressed
v1 pages (readable by DuckDB/pyarrow).

Implements thrift compact protocol structs from the parquet-format spec.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..errors import IOException
from ..storage.vector import Vector
from .. import types as tt


# ---------------------------------------------------------------------------
# snappy (raw format) decompression
# ---------------------------------------------------------------------------

def snappy_decompress(data: bytes) -> bytes:
    i = 0
    # uncompressed length varint
    result_len = 0
    shift = 0
    while True:
        b = data[i]
        i += 1
        result_len |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    out = bytearray()
    n = len(data)
    while i < n:
        tag = data[i]
        i += 1
        elem_type = tag & 0x3
        if elem_type == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                length = int.from_bytes(data[i:i + extra], "little") + 1
                i += extra
            out += data[i:i + length]
            i += length
        else:
            if elem_type == 1:  # copy with 1-byte offset
                length = ((tag >> 2) & 0x7) + 4
                offset = ((tag >> 5) << 8) | data[i]
                i += 1
            elif elem_type == 2:  # copy with 2-byte offset
                length = (tag >> 2) + 1
                offset = int.from_bytes(data[i:i + 2], "little")
                i += 2
            else:  # copy with 4-byte offset
                length = (tag >> 2) + 1
                offset = int.from_bytes(data[i:i + 4], "little")
                i += 4
            start = len(out) - offset
            if offset == 0:
                raise IOException("corrupt snappy stream")
            for _ in range(length):
                out.append(out[start])
                start += 1
    return bytes(out)


def snappy_compress_stored(data: bytes) -> bytes:
    """Minimal valid snappy stream: varint length + literal chunks."""
    out = bytearray()
    length = len(data)
    while True:
        out.append((length & 0x7F) | (0x80 if length > 0x7F else 0))
        length >>= 7
        if not length:
            break
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + 65536]
        clen = len(chunk) - 1
        out.append((62 << 2))            # literal, 3-byte length
        out += clen.to_bytes(3, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


# ---------------------------------------------------------------------------
# thrift compact protocol
# ---------------------------------------------------------------------------

class TReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not (b & 0x80):
                return out
            shift += 7

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def read_bytes(self) -> bytes:
        ln = self.varint()
        out = self.data[self.pos:self.pos + ln]
        self.pos += ln
        return out

    def skip(self, ftype: int):
        if ftype in (1, 2):      # BOOL true/false
            return
        if ftype == 3:           # byte
            self.byte()
        elif ftype in (4, 5, 6):  # i16/i32/i64
            self.zigzag()
        elif ftype == 7:         # double
            self.pos += 8
        elif ftype == 8:         # binary
            self.read_bytes()
        elif ftype in (9, 10):   # list/set
            header = self.byte()
            size = header >> 4
            et = header & 0x0F
            if size == 15:
                size = self.varint()
            for _ in range(size):
                self.skip(et)
        elif ftype == 11:        # map
            size = self.varint()
            if size:
                kv = self.byte()
                for _ in range(size):
                    self.skip(kv >> 4)
                    self.skip(kv & 0x0F)
        elif ftype == 12:        # struct
            self.skip_struct()
        else:
            raise IOException(f"cannot skip thrift type {ftype}")

    def skip_struct(self):
        last_fid = 0
        while True:
            b = self.byte()
            if b == 0:
                return
            delta = b >> 4
            ftype = b & 0x0F
            if delta:
                last_fid += delta
            else:
                last_fid = self.zigzag()
            self.skip(ftype)

    def fields(self):
        """Yield (field_id, type) for a struct; caller must consume values
        via the reader or call .skip(ftype)."""
        last_fid = 0
        while True:
            b = self.byte()
            if b == 0:
                return
            delta = b >> 4
            ftype = b & 0x0F
            if delta:
                last_fid += delta
            else:
                last_fid = self.zigzag()
            yield last_fid, ftype

    def list_header(self) -> Tuple[int, int]:
        header = self.byte()
        size = header >> 4
        et = header & 0x0F
        if size == 15:
            size = self.varint()
        return size, et


# ---------------------------------------------------------------------------
# parquet metadata structs (only the fields we need)
# ---------------------------------------------------------------------------

class SchemaElement:
    def __init__(self):
        self.type: Optional[int] = None
        self.type_length = 0
        self.repetition = 0   # 0 required, 1 optional, 2 repeated
        self.name = ""
        self.num_children = 0
        self.converted_type: Optional[int] = None
        self.logical: Optional[str] = None
        self.logical_unit: Optional[str] = None
        self.scale = 0
        self.precision = 0


def _parse_schema_element(r: TReader) -> SchemaElement:
    el = SchemaElement()
    for fid, ftype in r.fields():
        if fid == 1:
            el.type = r.zigzag()
        elif fid == 2:
            el.type_length = r.zigzag()
        elif fid == 3:
            el.repetition = r.zigzag()
        elif fid == 4:
            el.name = r.read_bytes().decode()
        elif fid == 5:
            el.num_children = r.zigzag()
        elif fid == 6:
            el.converted_type = r.zigzag()
        elif fid == 7:
            el.scale = r.zigzag()
        elif fid == 8:
            el.precision = r.zigzag()
        elif fid == 10 and ftype == 12:
            # LogicalType union
            for lfid, lftype in r.fields():
                name = {1: "STRING", 2: "MAP", 3: "LIST", 4: "ENUM",
                        5: "DECIMAL", 6: "DATE", 7: "TIME", 8: "TIMESTAMP",
                        10: "INTEGER", 11: "NULL", 12: "JSON", 13: "BSON",
                        14: "UUID"}.get(lfid)
                el.logical = name or el.logical
                if lfid == 8 and lftype == 12:  # TimestampType
                    for tfid, tftype in r.fields():
                        if tfid == 2 and tftype == 12:  # TimeUnit union
                            for ufid, uftype in r.fields():
                                el.logical_unit = {1: "MILLIS", 2: "MICROS",
                                                   3: "NANOS"}.get(ufid)
                                r.skip(uftype)
                        else:
                            r.skip(tftype)
                else:
                    r.skip(lftype)
        else:
            r.skip(ftype)
    return el


class ColumnMeta:
    def __init__(self):
        self.type = 0
        self.encodings: List[int] = []
        self.path: List[str] = []
        self.codec = 0
        self.num_values = 0
        self.total_compressed_size = 0
        self.data_page_offset = 0
        self.dictionary_page_offset: Optional[int] = None


def _parse_column_meta(r: TReader) -> ColumnMeta:
    cm = ColumnMeta()
    for fid, ftype in r.fields():
        if fid == 1:
            cm.type = r.zigzag()
        elif fid == 2:
            size, et = r.list_header()
            cm.encodings = [r.zigzag() for _ in range(size)]
        elif fid == 3:
            size, et = r.list_header()
            cm.path = [r.read_bytes().decode() for _ in range(size)]
        elif fid == 4:
            cm.codec = r.zigzag()
        elif fid == 5:
            cm.num_values = r.zigzag()
        elif fid == 7:
            cm.total_compressed_size = r.zigzag()
        elif fid == 9:
            cm.data_page_offset = r.zigzag()
        elif fid == 11:
            cm.dictionary_page_offset = r.zigzag()
        else:
            r.skip(ftype)
    return cm


class ColumnChunk:
    def __init__(self):
        self.file_offset = 0
        self.meta: Optional[ColumnMeta] = None


class RowGroup:
    def __init__(self):
        self.columns: List[ColumnChunk] = []
        self.num_rows = 0


class FileMeta:
    def __init__(self):
        self.schema: List[SchemaElement] = []
        self.row_groups: List[RowGroup] = []
        self.num_rows = 0


def _parse_file_meta(data: bytes) -> FileMeta:
    r = TReader(data)
    fm = FileMeta()
    for fid, ftype in r.fields():
        if fid == 2:     # schema
            size, _ = r.list_header()
            for _ in range(size):
                fm.schema.append(_parse_schema_element(r))
        elif fid == 3:
            fm.num_rows = r.zigzag()
        elif fid == 4:   # row groups
            size, _ = r.list_header()
            for _ in range(size):
                rg = RowGroup()
                for gfid, gftype in r.fields():
                    if gfid == 1:
                        csize, _ = r.list_header()
                        for _ in range(csize):
                            cc = ColumnChunk()
                            for cfid, cftype in r.fields():
                                if cfid == 2:
                                    cc.file_offset = r.zigzag()
                                elif cfid == 3 and cftype == 12:
                                    cc.meta = _parse_column_meta(r)
                                else:
                                    r.skip(cftype)
                            rg.columns.append(cc)
                    elif gfid == 3:
                        rg.num_rows = r.zigzag()
                    else:
                        r.skip(gftype)
                fm.row_groups.append(rg)
        else:
            r.skip(ftype)
    return fm


class PageHeader:
    def __init__(self):
        self.type = 0            # 0 data, 2 dictionary, 3 data v2
        self.uncompressed_size = 0
        self.compressed_size = 0
        # data page v1
        self.num_values = 0
        self.encoding = 0
        self.def_encoding = 0
        self.rep_encoding = 0
        # v2
        self.num_nulls = 0
        self.num_rows = 0
        self.def_len = 0
        self.rep_len = 0
        self.v2_compressed = True


def _parse_page_header(r: TReader) -> PageHeader:
    ph = PageHeader()
    for fid, ftype in r.fields():
        if fid == 1:
            ph.type = r.zigzag()
        elif fid == 2:
            ph.uncompressed_size = r.zigzag()
        elif fid == 3:
            ph.compressed_size = r.zigzag()
        elif fid == 5 and ftype == 12:   # data page header v1
            for dfid, dftype in r.fields():
                if dfid == 1:
                    ph.num_values = r.zigzag()
                elif dfid == 2:
                    ph.encoding = r.zigzag()
                elif dfid == 3:
                    ph.def_encoding = r.zigzag()
                elif dfid == 4:
                    ph.rep_encoding = r.zigzag()
                else:
                    r.skip(dftype)
        elif fid == 7 and ftype == 12:   # dictionary page header
            for dfid, dftype in r.fields():
                if dfid == 1:
                    ph.num_values = r.zigzag()
                elif dfid == 2:
                    ph.encoding = r.zigzag()
                else:
                    r.skip(dftype)
        elif fid == 8 and ftype == 12:   # data page header v2
            ph.type = 3
            for dfid, dftype in r.fields():
                if dfid == 1:
                    ph.num_values = r.zigzag()
                elif dfid == 2:
                    ph.num_nulls = r.zigzag()
                elif dfid == 3:
                    ph.num_rows = r.zigzag()
                elif dfid == 4:
                    ph.encoding = r.zigzag()
                elif dfid == 5:
                    ph.def_len = r.zigzag()
                elif dfid == 6:
                    ph.rep_len = r.zigzag()
                elif dfid == 7:
                    ph.v2_compressed = (ftype == 1) if dftype in (1, 2) \
                        else ph.v2_compressed
                    if dftype not in (1, 2):
                        r.skip(dftype)
                    else:
                        ph.v2_compressed = dftype == 1
                else:
                    r.skip(dftype)
        else:
            r.skip(ftype)
    return ph


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------

def _decode_rle_bitpacked(data: bytes, bit_width: int, count: int,
                          has_length_prefix: bool) -> np.ndarray:
    pos = 0
    if has_length_prefix:
        pos = 4  # length header
    out = np.zeros(count, dtype=np.int64)
    idx = 0
    r = TReader(data, pos)
    if bit_width == 0:
        return out
    byte_width = (bit_width + 7) // 8
    while idx < count and r.pos < len(data):
        header = r.varint()
        if header & 1:
            # bit-packed run: (header>>1) groups of 8
            groups = header >> 1
            nvals = groups * 8
            nbytes = groups * bit_width
            raw = data[r.pos:r.pos + nbytes]
            r.pos += nbytes
            bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8),
                                 bitorder="little")
            vals = bits[:nvals * bit_width].reshape(-1, bit_width)
            weights = (1 << np.arange(bit_width)).astype(np.int64)
            decoded = vals @ weights
            take = min(count - idx, len(decoded))
            out[idx:idx + take] = decoded[:take]
            idx += take
        else:
            run_len = header >> 1
            raw = data[r.pos:r.pos + byte_width]
            r.pos += byte_width
            value = int.from_bytes(raw, "little")
            take = min(count - idx, run_len)
            out[idx:idx + take] = value
            idx += take
    return out


def _decode_plain(data: bytes, ptype: int, count: int, pos: int = 0):
    if ptype == 0:    # BOOLEAN: bit-packed
        bits = np.unpackbits(np.frombuffer(
            data, dtype=np.uint8, offset=pos), bitorder="little")
        return bits[:count].astype(bool), pos + (count + 7) // 8
    if ptype == 1:    # INT32
        out = np.frombuffer(data, dtype="<i4", count=count, offset=pos)
        return out, pos + 4 * count
    if ptype == 2:    # INT64
        out = np.frombuffer(data, dtype="<i8", count=count, offset=pos)
        return out, pos + 8 * count
    if ptype == 4:    # FLOAT
        out = np.frombuffer(data, dtype="<f4", count=count, offset=pos)
        return out, pos + 4 * count
    if ptype == 5:    # DOUBLE
        out = np.frombuffer(data, dtype="<f8", count=count, offset=pos)
        return out, pos + 8 * count
    if ptype == 6:    # BYTE_ARRAY
        out = np.empty(count, dtype=object)
        for i in range(count):
            ln = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            out[i] = data[pos:pos + ln].decode("utf-8", errors="replace")
            pos += ln
        return out, pos
    if ptype == 7:    # FIXED_LEN_BYTE_ARRAY — unsupported payloads kept raw
        raise IOException("FIXED_LEN_BYTE_ARRAY not supported")
    raise IOException(f"unsupported parquet physical type {ptype}")


def _logical_to_engine_type(el: SchemaElement) -> tt.LogicalType:
    pt = el.type
    ct = el.converted_type
    lt = el.logical
    if lt == "STRING" or ct == 0:
        return tt.VARCHAR
    if lt == "DATE" or ct == 6:
        return tt.DATE
    if lt == "TIMESTAMP":
        if el.logical_unit == "MILLIS":
            return tt.TIMESTAMP_MS
        if el.logical_unit == "NANOS":
            return tt.TIMESTAMP_NS
        return tt.TIMESTAMP
    if ct == 9:
        return tt.TIMESTAMP_MS
    if ct == 10:
        return tt.TIMESTAMP
    if pt == 0:
        return tt.BOOLEAN
    if pt == 1:
        return tt.INTEGER
    if pt == 2:
        return tt.BIGINT
    if pt == 4:
        return tt.FLOAT
    if pt == 5:
        return tt.DOUBLE
    if pt == 6:
        return tt.VARCHAR
    raise IOException(f"unsupported parquet type {pt}/{ct}/{lt}")


def read_parquet(path: str) -> Tuple[List[str], List[Vector]]:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise IOException(f"{path} is not a parquet file")
    footer_len = struct.unpack("<I", data[-8:-4])[0]
    fm = _parse_file_meta(data[-8 - footer_len:-8])
    root = fm.schema[0]
    columns = fm.schema[1:1 + root.num_children]
    if any(c.num_children for c in columns):
        raise IOException("nested parquet schemas not supported")
    names = [c.name for c in columns]
    types = [_logical_to_engine_type(c) for c in columns]

    per_col_values: List[List[np.ndarray]] = [[] for _ in columns]
    per_col_validity: List[List[np.ndarray]] = [[] for _ in columns]

    for rg in fm.row_groups:
        for ci, cc in enumerate(rg.columns):
            cm = cc.meta
            el = columns[ci]
            start = cm.dictionary_page_offset \
                if cm.dictionary_page_offset else cm.data_page_offset
            vals, validity = _read_column_chunk(
                data, start, cm, el, rg.num_rows)
            per_col_values[ci].append(vals)
            per_col_validity[ci].append(validity)

    out_cols = []
    for ci, (name, typ) in enumerate(zip(names, types)):
        if per_col_values[ci]:
            merged = np.concatenate(per_col_values[ci])
            validity = np.concatenate(per_col_validity[ci])
        else:
            merged = np.empty(0, dtype=typ.numpy_dtype())
            validity = np.empty(0, dtype=bool)
        dtype = typ.numpy_dtype()
        if dtype is not object and merged.dtype != dtype:
            merged = merged.astype(dtype)
        elif dtype is object and merged.dtype != object:
            merged = merged.astype(object)
        out_cols.append(Vector(typ, merged, validity))
    return names, out_cols


def _read_column_chunk(data: bytes, offset: int, cm: ColumnMeta,
                       el: SchemaElement, num_rows: int):
    pos = offset
    dictionary = None
    values_parts = []
    validity_parts = []
    remaining = cm.num_values
    while remaining > 0:
        r = TReader(data, pos)
        ph = _parse_page_header(r)
        body_start = r.pos
        body = data[body_start:body_start + ph.compressed_size]
        pos = body_start + ph.compressed_size
        if ph.type == 2:   # dictionary page
            if cm.codec == 1:
                body = snappy_decompress(body)
            elif cm.codec not in (0,):
                raise IOException(f"unsupported codec {cm.codec}")
            dictionary, _ = _decode_plain(body, cm.type, ph.num_values)
            continue
        if ph.type == 0:   # data page v1
            if cm.codec == 1:
                body = snappy_decompress(body)
            elif cm.codec not in (0,):
                raise IOException(f"unsupported codec {cm.codec}")
            nv = ph.num_values
            bpos = 0
            if el.repetition == 1:
                # definition levels: RLE with 4-byte length prefix
                dl_len = int.from_bytes(body[0:4], "little")
                def_levels = _decode_rle_bitpacked(
                    body[4:4 + dl_len], 1, nv, has_length_prefix=False)
                bpos = 4 + dl_len
                validity = def_levels.astype(bool)
            else:
                validity = np.ones(nv, dtype=bool)
            n_present = int(validity.sum())
            vals = self_decode(body, bpos, ph.encoding, cm.type, n_present,
                               dictionary)
            values_parts.append(_expand(vals, validity, cm.type))
            validity_parts.append(validity)
            remaining -= nv
            continue
        if ph.type == 3:   # data page v2
            nv = ph.num_values
            dl = body[:ph.def_len]
            rest = body[ph.def_len + ph.rep_len:]
            if cm.codec == 1 and ph.v2_compressed:
                rest = snappy_decompress(rest)
            if el.repetition == 1 and ph.def_len:
                def_levels = _decode_rle_bitpacked(dl, 1, nv,
                                                   has_length_prefix=False)
                validity = def_levels.astype(bool)
            else:
                validity = np.ones(nv, dtype=bool)
            n_present = int(validity.sum())
            vals = self_decode(rest, 0, ph.encoding, cm.type, n_present,
                               dictionary)
            values_parts.append(_expand(vals, validity, cm.type))
            validity_parts.append(validity)
            remaining -= nv
            continue
        raise IOException(f"unsupported parquet page type {ph.type}")
    values = np.concatenate(values_parts) if values_parts else \
        np.empty(0, dtype=object)
    validity = np.concatenate(validity_parts) if validity_parts else \
        np.empty(0, dtype=bool)
    return values, validity


def self_decode(body: bytes, bpos: int, encoding: int, ptype: int,
                n_present: int, dictionary):
    if encoding == 0:   # PLAIN
        vals, _ = _decode_plain(body, ptype, n_present, bpos)
        return vals
    if encoding in (2, 8):   # PLAIN_DICTIONARY / RLE_DICTIONARY
        if dictionary is None:
            raise IOException("dictionary page missing")
        if n_present == 0:
            return dictionary[:0]
        bit_width = body[bpos]
        idx = _decode_rle_bitpacked(body[bpos + 1:], bit_width, n_present,
                                    has_length_prefix=False)
        return dictionary[idx]
    if encoding == 3 and ptype == 0:   # RLE-encoded booleans
        vals = _decode_rle_bitpacked(body, 1, n_present,
                                     has_length_prefix=True)
        return vals.astype(bool)
    raise IOException(f"unsupported parquet encoding {encoding}")


def _expand(vals: np.ndarray, validity: np.ndarray, ptype: int) -> np.ndarray:
    """Scatter present values into a full-length array."""
    n = len(validity)
    if validity.all():
        return vals
    if vals.dtype == object or ptype == 6:
        out = np.empty(n, dtype=object)
    else:
        out = np.zeros(n, dtype=vals.dtype)
    out[validity] = vals
    return out


# ---------------------------------------------------------------------------
# writer (PLAIN, uncompressed, v1 pages)
# ---------------------------------------------------------------------------

class TWriter:
    def __init__(self):
        self.buf = bytearray()

    def byte(self, b: int):
        self.buf.append(b & 0xFF)

    def varint(self, v: int):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.buf.append(b | 0x80)
            else:
                self.buf.append(b)
                return

    def zigzag(self, v: int):
        self.varint((v << 1) ^ (v >> 63) if v < 0 else (v << 1))

    def field(self, last_fid: int, fid: int, ftype: int) -> int:
        delta = fid - last_fid
        if 0 < delta <= 15:
            self.byte((delta << 4) | ftype)
        else:
            self.byte(ftype)
            self.zigzag(fid)
        return fid

    def stop(self):
        self.byte(0)

    def write_bytes(self, data: bytes):
        self.varint(len(data))
        self.buf += data

    def list_header(self, size: int, etype: int):
        if size < 15:
            self.byte((size << 4) | etype)
        else:
            self.byte(0xF0 | etype)
            self.varint(size)


_ENGINE_TO_PHYSICAL = {
    tt.TypeId.BOOLEAN: 0,
    tt.TypeId.TINYINT: 1, tt.TypeId.SMALLINT: 1, tt.TypeId.INTEGER: 1,
    tt.TypeId.BIGINT: 2, tt.TypeId.HUGEINT: 2, tt.TypeId.UBIGINT: 2,
    tt.TypeId.UTINYINT: 1, tt.TypeId.USMALLINT: 1, tt.TypeId.UINTEGER: 2,
    tt.TypeId.FLOAT: 4,
    tt.TypeId.DOUBLE: 5, tt.TypeId.DECIMAL: 5,
    tt.TypeId.VARCHAR: 6, tt.TypeId.BLOB: 6,
    tt.TypeId.DATE: 1,
    tt.TypeId.TIMESTAMP: 2, tt.TypeId.TIMESTAMP_MS: 2,
    tt.TypeId.TIMESTAMP_NS: 2, tt.TypeId.TIMESTAMP_S: 2,
    tt.TypeId.TIME: 2, tt.TypeId.INTERVAL: 2,
}


def _encode_plain(vec: Vector, ptype: int) -> bytes:
    validity = vec.validity
    present = vec.data[validity]
    if ptype == 0:
        return np.packbits(np.asarray(present, dtype=bool),
                           bitorder="little").tobytes()
    if ptype == 1:
        return np.asarray(present, dtype="<i4").tobytes()
    if ptype == 2:
        return np.asarray(present, dtype="<i8").tobytes()
    if ptype == 4:
        return np.asarray(present, dtype="<f4").tobytes()
    if ptype == 5:
        return np.asarray(present, dtype="<f8").tobytes()
    if ptype == 6:
        out = bytearray()
        for v in present:
            enc = str(v).encode()
            out += len(enc).to_bytes(4, "little")
            out += enc
        return bytes(out)
    raise IOException(f"cannot encode physical type {ptype}")


def _encode_def_levels(validity: np.ndarray) -> bytes:
    """RLE/bit-packed hybrid, bit width 1, with 4-byte length prefix."""
    n = len(validity)
    body = bytearray()
    groups = (n + 7) // 8
    header = (groups << 1) | 1
    w = TWriter()
    w.varint(header)
    body += w.buf
    body += np.packbits(validity.astype(np.uint8),
                        bitorder="little").tobytes().ljust(groups, b"\x00")
    return len(body).to_bytes(4, "little") + bytes(body)


def write_parquet(path: str, names: List[str], columns: List[Vector]):
    out = bytearray(b"PAR1")
    num_rows = len(columns[0]) if columns else 0
    chunk_metas = []
    for name, vec in zip(names, columns):
        if vec.type.id == tt.TypeId.DECIMAL:
            # scaled-int representation: unscale to DOUBLE for the plain
            # encoding (this writer's DECIMAL physical type is f8)
            from ..exec.cast import cast_vector
            vec = cast_vector(vec, tt.DOUBLE)
        elif vec.type.id == tt.TypeId.HUGEINT:
            # parquet has no int128 here: int64 when every value fits,
            # DOUBLE otherwise
            from ..exec.cast import cast_vector
            from ..types import INT_BOUNDS, TypeId as _T
            lo, hi = INT_BOUNDS[_T.BIGINT]
            vals = [vec.value(i) for i in range(len(vec))
                    if vec.validity[i]]
            fits = all(lo <= v <= hi for v in vals)
            vec = cast_vector(vec, tt.BIGINT if fits else tt.DOUBLE)
        ptype = _ENGINE_TO_PHYSICAL.get(vec.type.id)
        if ptype is None:
            # render unsupported types as strings
            from ..exec.cast import cast_vector
            vec = cast_vector(vec, tt.VARCHAR)
            ptype = 6
        data_offset = len(out)
        payload = _encode_def_levels(vec.validity) + _encode_plain(vec, ptype)
        # page header (data page v1, PLAIN)
        w = TWriter()
        last = w.field(0, 1, 5)
        w.zigzag(0)                     # type = data page
        last = w.field(last, 2, 5)
        w.zigzag(len(payload))          # uncompressed
        last = w.field(last, 3, 5)
        w.zigzag(len(payload))          # compressed
        last = w.field(last, 5, 12)     # data page header
        w2_last = 0
        w2_last = w.field(0, 1, 5)
        w.zigzag(num_rows)
        w2_last = w.field(w2_last, 2, 5)
        w.zigzag(0)                     # PLAIN
        w2_last = w.field(w2_last, 3, 5)
        w.zigzag(3)                     # def: RLE
        w2_last = w.field(w2_last, 4, 5)
        w.zigzag(3)                     # rep: RLE
        w.stop()
        w.stop()
        out += w.buf
        out += payload
        total_size = len(out) - data_offset
        chunk_metas.append((name, ptype, vec, data_offset, total_size))

    # footer
    w = TWriter()
    last = w.field(0, 1, 5)
    w.zigzag(1)        # version
    last = w.field(last, 2, 9)  # schema list
    w.list_header(len(chunk_metas) + 1, 12)
    # root
    root = TWriter()
    rl = root.field(0, 4, 8)
    root.write_bytes(b"duckpgq_tpu_schema")
    rl = root.field(rl, 5, 5)
    root.zigzag(len(chunk_metas))
    root.stop()
    w.buf += root.buf
    for name, ptype, vec, _, _ in chunk_metas:
        el = TWriter()
        el_last = el.field(0, 1, 5)
        el.zigzag(ptype)
        el_last = el.field(el_last, 3, 5)
        el.zigzag(1)   # optional
        el_last = el.field(el_last, 4, 8)
        el.write_bytes(name.encode())
        if vec.type.id in (tt.TypeId.VARCHAR, tt.TypeId.BLOB):
            el_last = el.field(el_last, 6, 5)
            el.zigzag(0)   # UTF8
        elif vec.type.id == tt.TypeId.DATE:
            el_last = el.field(el_last, 6, 5)
            el.zigzag(6)   # DATE
        elif vec.type.id == tt.TypeId.TIMESTAMP_MS:
            el_last = el.field(el_last, 6, 5)
            el.zigzag(9)   # TIMESTAMP_MILLIS
        elif vec.type.id in (tt.TypeId.TIMESTAMP,):
            el_last = el.field(el_last, 6, 5)
            el.zigzag(10)  # TIMESTAMP_MICROS
        el.stop()
        w.buf += el.buf
    last = w.field(last, 3, 5)
    w.zigzag(num_rows)
    last = w.field(last, 4, 9)   # row groups
    w.list_header(1, 12)
    rg = TWriter()
    rg_last = rg.field(0, 1, 9)  # columns
    rg.list_header(len(chunk_metas), 12)
    total_bytes = 0
    for name, ptype, vec, offset, size in chunk_metas:
        cc = TWriter()
        cc_last = cc.field(0, 2, 5)
        cc.zigzag(offset)
        cc_last = cc.field(cc_last, 3, 12)   # meta
        cm = TWriter()
        cm_last = cm.field(0, 1, 5)
        cm.zigzag(ptype)
        cm_last = cm.field(cm_last, 2, 9)
        cm.list_header(1, 5)
        cm.zigzag(0)    # PLAIN
        cm_last = cm.field(cm_last, 3, 9)
        cm.list_header(1, 8)
        cm.write_bytes(name.encode())
        cm_last = cm.field(cm_last, 4, 5)
        cm.zigzag(0)    # uncompressed
        cm_last = cm.field(cm_last, 5, 5)
        cm.zigzag(num_rows)
        cm_last = cm.field(cm_last, 6, 5)
        cm.zigzag(size)
        cm_last = cm.field(cm_last, 7, 5)
        cm.zigzag(size)
        cm_last = cm.field(cm_last, 9, 5)
        cm.zigzag(offset)
        cm.stop()
        cc.buf += cm.buf
        cc.stop()
        rg.buf += cc.buf
        total_bytes += size
    rg_last = rg.field(rg_last, 2, 5)
    rg.zigzag(total_bytes)
    rg_last = rg.field(rg_last, 3, 5)
    rg.zigzag(num_rows)
    rg.stop()
    w.buf += rg.buf
    w.stop()
    footer = bytes(w.buf)
    out += footer
    out += struct.pack("<I", len(footer))
    out += b"PAR1"
    with open(path, "wb") as f:
        f.write(bytes(out))
