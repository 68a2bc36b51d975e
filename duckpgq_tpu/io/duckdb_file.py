"""Reader for DuckDB's single-file binary storage format (``.duckdb`` files).

The reference ships ``data/bluesky/bluesky.duckdb`` and its test corpus
ATTACHes it (``test/sql/create_pg/attach_pg.test:8``,
``test/sql/create_pg/describe_pg.test:102``); this module lets the engine
materialize tables out of such files without a DuckDB runtime.

Scope: read-only, single-file databases written by DuckDB v1.2+ (storage
version >= 64, the "v1.4" era layout observed in the bundled file):

- main header / dual database headers (4096-byte header segment x3)
- 256 KiB blocks, per-block checksums (not verified), metadata chains of
  64 x 4088-byte chunks with 8-byte next-pointers
- the field-id tagged binary serialization (u16 field ids, varint ints,
  0xFFFF object terminators, presence bytes for nullables)
- catalog stream: schemas + tables (columns, logical types)
- table data: table stats -> row groups -> per-column data pointers ->
  column segments, for the compression schemes implemented in
  ``duckdb_compression.py``

Anything outside that scope raises ``UnsupportedDuckDBFile`` with a precise
reason, so callers can surface a clean SQL error instead of garbage data.

This is an independent implementation from the published format; structure
names follow DuckDB's storage documentation.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

INVALID_PTR = 0xFFFFFFFFFFFFFFFF
HEADER_SEGMENT = 3 * 4096
META_CHUNKS_PER_BLOCK = 64
OBJECT_END = 0xFFFF


class UnsupportedDuckDBFile(Exception):
    """File is valid DuckDB storage but uses features this reader lacks."""


class CorruptDuckDBFile(Exception):
    """File does not parse as DuckDB storage."""


# --------------------------------------------------------------------------
# logical types (enum ids mirror DuckDB's LogicalTypeId)
# --------------------------------------------------------------------------

LOGICAL_TYPE_NAMES = {
    1: "SQLNULL", 10: "BOOLEAN", 11: "TINYINT", 12: "SMALLINT",
    13: "INTEGER", 14: "BIGINT", 15: "DATE", 16: "TIME",
    17: "TIMESTAMP_SEC", 18: "TIMESTAMP_MS", 19: "TIMESTAMP",
    20: "TIMESTAMP_NS", 21: "DECIMAL", 22: "FLOAT", 23: "DOUBLE",
    24: "CHAR", 25: "VARCHAR", 26: "BLOB", 27: "INTERVAL",
    28: "UTINYINT", 29: "USMALLINT", 30: "UINTEGER", 31: "UBIGINT",
    32: "TIMESTAMP_TZ", 34: "TIME_TZ", 35: "BIT", 36: "VARINT",
    49: "UHUGEINT", 50: "HUGEINT", 51: "POINTER", 53: "VALIDITY",
    54: "UUID", 100: "STRUCT", 101: "LIST", 102: "MAP", 103: "TABLE",
    104: "ENUM", 105: "AGGREGATE_STATE", 106: "LAMBDA", 107: "UNION",
    108: "ARRAY",
}

# duckpgq_tpu SQL type names for the subset we can materialize
_SQL_TYPE = {
    "BOOLEAN": "BOOLEAN", "TINYINT": "TINYINT", "SMALLINT": "SMALLINT",
    "INTEGER": "INTEGER", "BIGINT": "BIGINT", "UTINYINT": "UTINYINT",
    "USMALLINT": "USMALLINT", "UINTEGER": "UINTEGER", "UBIGINT": "UBIGINT",
    "FLOAT": "FLOAT", "DOUBLE": "DOUBLE", "VARCHAR": "VARCHAR",
    "DATE": "DATE", "TIMESTAMP": "TIMESTAMP",
}

_FIXED_WIDTH = {
    "BOOLEAN": 1, "TINYINT": 1, "SMALLINT": 2, "INTEGER": 4, "BIGINT": 8,
    "UTINYINT": 1, "USMALLINT": 2, "UINTEGER": 4, "UBIGINT": 8,
    "FLOAT": 4, "DOUBLE": 8, "DATE": 4, "TIMESTAMP": 8,
}


@dataclass
class ColumnDef:
    name: str
    type_name: str          # LogicalTypeId name
    sql_type: Optional[str]  # engine type name, None if unsupported


@dataclass
class TableDef:
    catalog: str
    schema: str
    name: str
    columns: List[ColumnDef]
    total_rows: int
    table_pointer: Tuple[int, int, int]  # block, chunk index, offset


@dataclass
class DataPointer:
    row_start: int
    tuple_count: int
    block_id: int
    offset: int
    compression: int
    has_null: bool = False
    has_no_null: bool = True


COMPRESSION_NAMES = {
    0: "AUTO", 1: "UNCOMPRESSED", 2: "CONSTANT", 3: "RLE", 4: "DICTIONARY",
    5: "PFOR_DELTA", 6: "BITPACKING", 7: "FSST", 8: "CHIMP", 9: "PATAS",
    10: "ALP", 11: "ALPRD", 12: "ZSTD", 13: "ROARING", 14: "EMPTY",
    15: "DICT_FSST",
}


# --------------------------------------------------------------------------
# low-level file access
# --------------------------------------------------------------------------

class BlockFile:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.data = f.read()
        if len(self.data) < HEADER_SEGMENT:
            raise CorruptDuckDBFile(f"{path}: too small for a DuckDB file")
        if self.data[8:12] != b"DUCK":
            raise CorruptDuckDBFile(f"{path}: missing DUCK magic")
        self.storage_version = struct.unpack_from("<Q", self.data, 12)[0]
        if self.storage_version < 64:
            raise UnsupportedDuckDBFile(
                f"storage version {self.storage_version} predates the v1.2+ "
                f"layout this reader supports (need >= 64)")
        h1 = self._dbheader(4096)
        h2 = self._dbheader(8192)
        self.header = h1 if h1["iteration"] >= h2["iteration"] else h2
        if self.header["meta_block"] == INVALID_PTR:
            raise CorruptDuckDBFile("no valid database header")
        self.block_size = self.header["block_alloc_size"]
        self.meta_chunk_size = ((self.block_size - 8)
                                // META_CHUNKS_PER_BLOCK) & ~7

    def _dbheader(self, off: int) -> Dict[str, int]:
        it, meta, free, nblocks, alloc, vecsz, compat = struct.unpack_from(
            "<QQQQQQQ", self.data, off + 8)
        return dict(iteration=it, meta_block=meta, free_list=free,
                    block_count=nblocks, block_alloc_size=alloc,
                    vector_size=vecsz, serialization_compatibility=compat)

    def block_offset(self, block_id: int) -> int:
        off = HEADER_SEGMENT + block_id * self.block_size
        if off + self.block_size > len(self.data):
            raise CorruptDuckDBFile(f"block {block_id} out of range")
        return off

    def block_payload(self, block_id: int, offset: int, length: int) -> bytes:
        """Bytes from a data block; offset is past the 8-byte checksum."""
        base = self.block_offset(block_id) + 8
        return self.data[base + offset: base + offset + length]


class MetaCursor:
    """Byte cursor over a metadata chunk chain.

    A metadata pointer packs (block_id: low 56 bits, chunk index: high 8
    bits); offsets count from the chunk start, whose first 8 bytes point to
    the next chunk in the chain.
    """

    def __init__(self, bf: BlockFile, raw_ptr: int, offset: int = 0):
        self.bf = bf
        self.block_id = raw_ptr & 0x00FFFFFFFFFFFFFF
        self.chunk_idx = raw_ptr >> 56
        self.pos = max(offset, 8)

    def _chunk_base(self) -> int:
        if self.chunk_idx >= META_CHUNKS_PER_BLOCK:
            raise CorruptDuckDBFile(f"metadata chunk index {self.chunk_idx}")
        return (self.bf.block_offset(self.block_id) + 8
                + self.chunk_idx * self.bf.meta_chunk_size)

    def _advance_chunk(self):
        nxt = struct.unpack_from("<Q", self.bf.data, self._chunk_base())[0]
        if nxt == INVALID_PTR:
            raise CorruptDuckDBFile("metadata chain ended mid-read")
        self.block_id = nxt & 0x00FFFFFFFFFFFFFF
        self.chunk_idx = nxt >> 56
        self.pos = 8

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            avail = self.bf.meta_chunk_size - self.pos
            if avail <= 0:
                self._advance_chunk()
                continue
            take = min(avail, n)
            base = self._chunk_base()
            out += self.bf.data[base + self.pos: base + self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def byte(self) -> int:
        return self.read(1)[0]


# --------------------------------------------------------------------------
# field-id binary deserializer
# --------------------------------------------------------------------------

class Deserializer:
    """DuckDB's BinaryDeserializer: u16 field ids, unsigned-LEB128 varints,
    0xFFFF object terminators, 1-byte presence flags for nullable values.
    Field presence is schema-driven (absent fields take defaults), so all
    reads peek the next field id."""

    def __init__(self, cur: MetaCursor):
        self.cur = cur
        self._peeked: Optional[int] = None

    # -- primitives --
    def _u16(self) -> int:
        return struct.unpack("<H", self.cur.read(2))[0]

    def peek_field(self) -> int:
        if self._peeked is None:
            self._peeked = self._u16()
        return self._peeked

    def take_field(self) -> int:
        v = self.peek_field()
        self._peeked = None
        return v

    def varint(self) -> int:
        result = 0
        shift = 0
        while True:
            b = self.cur.byte()
            result |= (b & 0x7F) << shift
            if not (b & 0x80):
                return result
            shift += 7

    def signed(self) -> int:
        v = self.varint()  # zigzag
        return (v >> 1) ^ -(v & 1)

    def blob(self) -> bytes:
        return self.cur.read(self.varint())

    def string(self) -> str:
        return self.blob().decode("utf-8", errors="replace")

    def object_end(self):
        fid = self.take_field()
        if fid != OBJECT_END:
            raise UnsupportedDuckDBFile(
                f"expected object end, found field {fid} — schema drift")

    # -- schema-driven field reads (fields are ordered by id) --
    def has_field(self, fid: int) -> bool:
        return self.peek_field() == fid

    def _expect(self, fid: int):
        got = self.take_field()
        if got != fid:
            raise UnsupportedDuckDBFile(
                f"expected field {fid}, found {got} — schema drift")

    def read_varint(self, fid: int, default: Optional[int] = None) -> int:
        if not self.has_field(fid):
            if default is None:
                self._expect(fid)
            return default
        self.take_field()
        return self.varint()

    def read_bool(self, fid: int, default: Optional[bool] = False) -> bool:
        if not self.has_field(fid):
            return default
        self.take_field()
        return self.cur.byte() != 0

    def read_string(self, fid: int, default: Optional[str] = "") -> str:
        if not self.has_field(fid):
            return default
        self.take_field()
        return self.string()

    def read_blob(self, fid: int, default: bytes = b"") -> bytes:
        if not self.has_field(fid):
            return default
        self.take_field()
        return self.blob()

    def skip_to_object_end(self, known: Dict[int, str]):
        """Bail out with a clear message if unknown fields remain."""
        fid = self.peek_field()
        if fid != OBJECT_END:
            raise UnsupportedDuckDBFile(
                f"unhandled field {fid} (knows: {sorted(known)})")
        self.object_end()


# --------------------------------------------------------------------------
# structure readers
# --------------------------------------------------------------------------

def _read_logical_type(d: Deserializer) -> str:
    """LogicalType object: {100: id, 101?: type info}. Nested type info
    (decimal width, list child, enum...) is unsupported for materialization
    but must still be skipped; we reject tables using it at read time."""
    tid = d.read_varint(100)
    name = LOGICAL_TYPE_NAMES.get(tid, f"TYPE_{tid}")
    if d.has_field(101):
        # extension type info object — variable schema; refuse rather than
        # guess (decimal/enum/list/struct tables are out of scope)
        raise UnsupportedDuckDBFile(
            f"column logical type {name} carries nested type info")
    d.object_end()
    return name


def _read_column_list(d: Deserializer) -> List[ColumnDef]:
    cols: List[ColumnDef] = []
    d._expect(100)
    count = d.varint()
    for _ in range(count):
        # ColumnDefinition object
        name = d.read_string(100)
        d._expect(101)
        tname = _read_logical_type(d)
        if d.has_field(102):  # expression (generated column)
            raise UnsupportedDuckDBFile("generated columns unsupported")
        category = d.read_varint(103, 0)
        d.read_varint(104, 0)  # compression hint
        if d.has_field(105):
            d.take_field()
            d.string()  # comment
        d.skip_to_object_end({100, 101, 103, 104, 105})
        if category not in (0, 1):  # STANDARD / hidden
            raise UnsupportedDuckDBFile(f"column category {category}")
        cols.append(ColumnDef(name, tname, _SQL_TYPE.get(tname)))
    d.object_end()  # ColumnList object
    return cols


def _skip_value_blockptr(d: Deserializer, fid: int):
    """Skip an object of varint-only fields (e.g. MetaBlockPointer-like)."""
    if not d.has_field(fid):
        return
    d.take_field()
    while d.peek_field() != OBJECT_END:
        d.take_field()
        d.varint()
    d.object_end()


def _read_meta_pointer(d: Deserializer) -> Tuple[int, int, int]:
    """MetaBlockPointer object {100: packed pointer, 101: offset}."""
    raw = d.read_varint(100)
    off = d.read_varint(101, 0)
    d.object_end()
    return raw & 0x00FFFFFFFFFFFFFF, raw >> 56, off


def _skip_constraint(d: Deserializer):
    ctype = d.read_varint(100)
    # NOT NULL(1): {200: index}; CHECK(2): {200: expr}; UNIQUE(3):
    # {200: is_primary_key, 201: index, 202: columns}; FOREIGN KEY(4): rich
    if ctype == 1:
        d.read_varint(200, 0)
    elif ctype == 3:
        d.read_bool(200, False)
        if d.has_field(201):
            d.take_field()
            d.varint()
        if d.has_field(202):
            d.take_field()
            n = d.varint()
            for _ in range(n):
                d.string()
    else:
        raise UnsupportedDuckDBFile(f"constraint type {ctype}")
    d.skip_to_object_end({100, 200, 201, 202})


def _skip_index_info(d: Deserializer):
    """IndexStorageInfo: {100: name, 101: root (packed pointer),
    102: [FixedSizeAllocatorInfo...]} — index (ART) payloads live in data
    blocks we never touch, so only the shape matters here."""
    d.read_string(100, "")
    d.read_varint(101, 0)
    if d.has_field(102):
        d.take_field()
        n = d.varint()
        for _ in range(n):
            _skip_allocator_info(d)
    if d.has_field(103):   # options map, e.g. {"storage_version": 64}
        d.take_field()
        for _ in range(d.varint()):
            d.read_string(0)         # pair key
            d._expect(1)             # pair value: Value object
            _skip_value(d)
            d.object_end()           # pair
    d.skip_to_object_end({100, 101, 102, 103})


def _skip_value(d: Deserializer):
    """Value object: {100: LogicalType, 101: is_null, 102: payload}.
    Only varint-width payloads appear in the index options in scope."""
    d._expect(100)
    tid = d.read_varint(100)
    if d.has_field(101):
        raise UnsupportedDuckDBFile(
            f"Value of type {LOGICAL_TYPE_NAMES.get(tid, tid)} with nested "
            f"type info")
    d.object_end()
    is_null = d.read_bool(101, False)
    if d.has_field(102):
        d.take_field()
        if tid == 25:      # VARCHAR
            d.string()
        elif tid in (22, 23):
            d.cur.read(_FIXED_WIDTH["FLOAT" if tid == 22 else "DOUBLE"])
        else:
            d.varint()
    elif not is_null:
        raise UnsupportedDuckDBFile("Value without payload")
    d.object_end()


def _skip_allocator_info(d: Deserializer):
    """FixedSizeAllocatorInfo: {100: segment_size, 101: [buffer ids],
    102: [BlockPointer...], 103: [segment counts], 104: [allocation sizes],
    105: [buffers with free space]}."""
    d.read_varint(100, 0)
    for fid in (101, 103, 104, 105):
        if d.has_field(fid):
            d.take_field()
            for _ in range(d.varint()):
                d.varint()
        if fid == 101 and d.has_field(102):
            d.take_field()
            for _ in range(d.varint()):
                d.read_varint(100, 0)
                d.read_varint(101, 0)
                d.object_end()
    d.skip_to_object_end({100, 101, 102, 103, 104, 105})


@dataclass
class CatalogData:
    schemas: List[str] = field(default_factory=list)
    tables: List[TableDef] = field(default_factory=list)


def read_catalog(bf: BlockFile) -> CatalogData:
    cur = MetaCursor(bf, bf.header["meta_block"], 0)
    d = Deserializer(cur)
    count = d.read_varint(100)
    cat = CatalogData()
    for _ in range(count):
        entry_type = d.read_varint(99)
        d._expect(100)
        present = cur.byte()
        if not present:
            raise CorruptDuckDBFile("catalog entry without CreateInfo")
        info = _read_create_info(d)
        if entry_type == 2:    # schema
            cat.schemas.append(info["schema"])
            d.object_end()
        elif entry_type == 1:  # table
            ptr = None
            total_rows = 0
            if d.has_field(101):
                d.take_field()
                ptr = _read_meta_pointer(d)
            total_rows = d.read_varint(102, 0)
            if d.has_field(103):   # index pointers (legacy list)
                d.take_field()
                n = d.varint()
                for _ in range(n):
                    d.varint()
            if d.has_field(104):   # index storage infos
                d.take_field()
                n = d.varint()
                for _ in range(n):
                    _skip_index_info(d)
            d.skip_to_object_end({101, 102, 103, 104})
            cat.tables.append(TableDef(
                catalog=info.get("catalog", ""), schema=info["schema"],
                name=info["table"], columns=info["columns"],
                total_rows=total_rows, table_pointer=ptr))
        else:
            raise UnsupportedDuckDBFile(
                f"catalog entry type {entry_type} (views/sequences/types "
                f"are not supported)")
    return cat


def _read_create_info(d: Deserializer) -> Dict[str, Any]:
    info: Dict[str, Any] = {}
    info["type"] = d.read_varint(100)
    info["catalog"] = d.read_string(101, "")
    info["schema"] = d.read_string(102, "")
    d.read_bool(103, False)   # temporary
    d.read_bool(104, False)   # internal
    d.read_varint(105, 0)     # on_conflict
    if d.has_field(106):
        d.take_field()
        d.string()            # sql
    if d.has_field(107):      # dependencies / comment value — varies
        raise UnsupportedDuckDBFile("CreateInfo field 107")
    if info["type"] == 2:     # schema
        d.object_end()        # CreateSchemaInfo (record end consumed by caller)
        return info
    if info["type"] != 1:
        raise UnsupportedDuckDBFile(f"CreateInfo type {info['type']}")
    info["table"] = d.read_string(200)
    d._expect(201)
    info["columns"] = _read_column_list(d)
    if d.has_field(202):
        d.take_field()
        n = d.varint()
        for _ in range(n):
            present = d.cur.byte()
            if present:
                _skip_constraint(d)
    d.skip_to_object_end({200, 201, 202})
    return info


# --------------------------------------------------------------------------
# table data
# --------------------------------------------------------------------------

def _skip_base_statistics(d: Deserializer):
    """ColumnStatistics element: {100: base stats {...}, 101?: distinct
    stats}. Observed layout: the HyperLogLog fields (version + data blob)
    inline into the distinct-stats object without a terminator of their
    own."""
    d._expect(100)
    d.read_bool(100, False)       # has_null
    d.read_bool(101, False)       # has_no_null
    d.read_varint(102, 0)         # distinct_count
    if d.has_field(103):          # type-specific stats
        d.take_field()
        _skip_type_stats(d)
    d.object_end()                # base stats
    if d.has_field(101):          # distinct stats (HyperLogLog sketch)
        d.take_field()
        if d.cur.byte():          # nullable presence
            d.read_varint(100, 0)     # sample count
            d.read_varint(101, 0)     # total count
            if d.has_field(102):      # nullable HLL {version, data blob}
                d.take_field()
                if d.cur.byte():
                    d.read_varint(100, 0)
                    d.read_blob(101)
                    d.object_end()
            d.object_end()        # distinct stats
    d.object_end()                # ColumnStatistics element


def _skip_type_stats(d: Deserializer):
    """String stats: {200: min blob, 201: max blob, 202: has_unicode,
    203: has_max_string_length, 204: max_string_length}; numeric stats:
    {200: has_min?, ...} — both are flat; walk fields by observed kind."""
    while d.peek_field() != OBJECT_END:
        fid = d.take_field()
        if fid in (200, 201):
            # string min/max are length-prefixed blobs; numeric min/max are
            # Value objects {100: type {...}, 101: is_null, 102: payload}
            b = d.cur.byte()
            if b & 0x80:
                raise UnsupportedDuckDBFile("unexpected stats varint")
            # distinguish: string stats blob length fits one byte and is
            # followed by raw bytes; numeric Value starts with a nested
            # field id low byte 100/101... Read as blob (length = b).
            d.cur.read(b)
        elif fid in (202, 203):
            d.cur.byte()
        elif fid == 204:
            d.varint()
        else:
            raise UnsupportedDuckDBFile(f"type stats field {fid}")
    d.object_end()


def read_table_data(bf: BlockFile, table: TableDef):
    """Parse the per-table data stream: stats, row-group count, table
    sample, then the row-group pointers inline in the same stream."""
    block, chunk, off = table.table_pointer
    cur = MetaCursor(bf, block | (chunk << 56), off)
    d = Deserializer(cur)
    # table statistics: {100: list of nullable ColumnStatistics}
    d._expect(100)
    n = d.varint()
    for _ in range(n):
        present = cur.byte()
        if present:
            _skip_base_statistics(d)
    row_group_count = d.read_varint(101)
    _skip_table_sample(d)
    # 8-byte raw row-group count precedes the inline row-group pointers;
    # cross-check it against the varint count read above
    raw_count = struct.unpack("<Q", cur.read(8))[0]
    if raw_count != row_group_count:
        raise UnsupportedDuckDBFile(
            f"row-group stream marker {raw_count} != count "
            f"{row_group_count} — layout drift")
    groups = []
    for _ in range(row_group_count):
        row_start = d.read_varint(100, 0)
        tuple_count = d.read_varint(101, 0)
        col_ptrs = []
        if d.has_field(102):
            d.take_field()
            for _ in range(d.varint()):
                col_ptrs.append(_read_meta_pointer(d))
        if d.has_field(103):   # delete pointers
            d.take_field()
            ndel = d.varint()
            if ndel:
                raise UnsupportedDuckDBFile("row group has deletes")
        d.skip_to_object_end({100, 101, 102, 103})
        groups.append((row_start, tuple_count, col_ptrs))
    return groups


def _skip_table_sample(d: Deserializer):
    """Nullable table sample (reservoir). The reservoir-sampling state
    embeds raw (non-field-tagged) bytes, so only the empty-reservoir shape
    written for small tables is recognized."""
    if not d.has_field(100):
        return
    d.take_field()
    if not d.cur.byte():
        return
    d._expect(101)             # base reservoir sampling state (raw double)
    raw = d.cur.read(8)
    if raw != b"\x00" * 8:
        raise UnsupportedDuckDBFile(
            "table sample carries a non-empty reservoir state")
    d.object_end()
    sample_type = d.read_varint(101, 0)
    d.read_varint(200, 0)      # reservoir capacity
    if d.peek_field() != OBJECT_END:
        raise UnsupportedDuckDBFile(
            f"table sample field {d.peek_field()} (non-trivial reservoir)")
    d.object_end()
    d.object_end()
    _ = sample_type


def read_column_data_pointers(bf: BlockFile, ptr,
                              is_standard: bool = True):
    """ColumnData serialization: {100: [DataPointer...]} plus, for standard
    columns, {101: validity ColumnData}."""
    block, chunk, off = ptr
    cur = MetaCursor(bf, block | (chunk << 56), off)
    d = Deserializer(cur)
    main = _read_data_pointer_list(d)
    validity = None
    if is_standard:
        d._expect(101)
        validity = _read_data_pointer_list(d)
        d.object_end()
    return main, validity


def _read_data_pointer_list(d: Deserializer) -> List[DataPointer]:
    d._expect(100)
    n = d.varint()
    out = []
    for _ in range(n):
        row_start = d.read_varint(100, 0)
        tuple_count = d.read_varint(101, 0)
        blk, boff = 0, 0
        if d.has_field(102):  # block pointer {100: block id, 101: offset}
            d.take_field()
            blk = d.read_varint(100, 0)
            boff = d.read_varint(101, 0)
            d.object_end()
        comp = d.read_varint(103, 0)
        has_null, has_no_null = False, True
        if d.has_field(104):
            d.take_field()
            has_null, has_no_null = _skip_datapointer_stats(d)
        if d.has_field(105):
            d.take_field()
            _skip_segment_state(d)
        d.skip_to_object_end({100, 101, 102, 103, 104, 105})
        out.append(DataPointer(row_start, tuple_count,
                               _signed56(blk), boff, comp,
                               has_null, has_no_null))
    return out


def _signed56(v: int) -> int:
    # block ids are serialized as unsigned varints of an int64
    if v >= 1 << 63:
        return v - (1 << 64)
    return v


def _skip_datapointer_stats(d: Deserializer) -> Tuple[bool, bool]:
    has_null = d.read_bool(100, False)
    has_no_null = d.read_bool(101, False)
    d.read_varint(102, 0)
    if d.has_field(103):
        d.take_field()
        _skip_type_stats(d)
    d.object_end()
    return has_null, has_no_null


def _skip_segment_state(d: Deserializer):
    present = d.cur.byte()
    if not present:
        return
    # uncompressed-string overflow block list: {100: [block ids]}
    if d.has_field(100):
        d.take_field()
        n = d.varint()
        for _ in range(n):
            d.varint()
    d.object_end()


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

class DuckDBFile:
    """High-level reader: catalog + table materialization."""

    def __init__(self, path: str):
        self.path = path
        self.bf = BlockFile(path)
        self.catalog = read_catalog(self.bf)

    def table_names(self) -> List[Tuple[str, str]]:
        return [(t.schema, t.name) for t in self.catalog.tables]

    def read_table(self, name: str, schema: str = "main"):
        """Returns (columns: List[ColumnDef], data: List[List[python vals]])
        — one list per column."""
        from .duckdb_compression import decode_segment

        tdef = None
        for t in self.catalog.tables:
            if t.name.lower() == name.lower() and \
                    t.schema.lower() == schema.lower():
                tdef = t
                break
        if tdef is None:
            raise KeyError(f"table {schema}.{name} not in {self.path}")
        for c in tdef.columns:
            if c.sql_type is None:
                raise UnsupportedDuckDBFile(
                    f"{tdef.name}.{c.name}: type {c.type_name} cannot be "
                    f"materialized")
        ncols = len(tdef.columns)
        columns: List[List[Any]] = [[] for _ in range(ncols)]
        if tdef.table_pointer is None or tdef.total_rows == 0:
            return tdef.columns, columns
        groups = read_table_data(self.bf, tdef)
        for row_start, tuple_count, col_ptrs in groups:
            if len(col_ptrs) != ncols:
                raise UnsupportedDuckDBFile(
                    f"row group has {len(col_ptrs)} column pointers for "
                    f"{ncols} columns")
            for ci, cptr in enumerate(col_ptrs):
                main, validity = read_column_data_pointers(self.bf, cptr)
                vals: List[Any] = []
                for dp in main:
                    vals.extend(decode_segment(
                        self.bf, dp, tdef.columns[ci].type_name))
                mask: List[bool] = []
                for dp in (validity or []):
                    mask.extend(decode_segment(self.bf, dp, "VALIDITY"))
                if len(vals) < tuple_count:
                    raise UnsupportedDuckDBFile(
                        f"{tdef.name}.{tdef.columns[ci].name}: segment "
                        f"decoded {len(vals)} of {tuple_count} rows")
                vals = vals[:tuple_count]
                if mask:
                    mask = mask[:tuple_count]
                    vals = [v if m else None for v, m in zip(vals, mask)]
                columns[ci].extend(vals)
        return tdef.columns, columns
