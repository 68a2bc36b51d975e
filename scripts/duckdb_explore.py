"""Exploratory parser for the DuckDB single-file storage format (v1.4 era,
storage version 64). Confirms layout assumptions before the real reader is
written (duckpgq_tpu/io/duckdb_file.py)."""

import struct
import sys

PATH = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/data/bluesky/bluesky.duckdb"

data = open(PATH, "rb").read()
print(f"file size {len(data)}")

# --- main header (offset 0, 4096 bytes) ---
# [checksum u64][magic "DUCK"][version u64][flags u64 x4]
# [version string 32B][source id 32B]
magic = data[8:12]
version = struct.unpack_from("<Q", data, 12)[0]
libver = data[52:84].split(b"\0")[0].decode()
srcid = data[84:116].split(b"\0")[0].decode()
print(f"magic={magic} storage_version={version} lib={libver} src={srcid}")

# --- database headers at 4096 and 8192 ---
def dbheader(off):
    it, meta, free, nblocks, alloc, vecsz, compat = struct.unpack_from(
        "<QQQQQQQ", data, off + 8)
    return dict(iteration=it, meta_block=meta, free_list=free,
                block_count=nblocks, block_alloc_size=alloc,
                vector_size=vecsz, serialization_compatibility=compat)

h1 = dbheader(4096)
h2 = dbheader(8192)
print("h1", h1)
print("h2", h2)
active = h1 if h1["iteration"] >= h2["iteration"] else h2
BLOCK = active["block_alloc_size"]
HEADER_SEGMENT = 4096 * 3

META_CHUNKS = 64
META_CHUNK = ((BLOCK - 8) // META_CHUNKS) & ~7  # AlignValueFloor(.., 8)
print(f"block_alloc={BLOCK} meta_chunk={META_CHUNK}")


def block_offset(block_id):
    return HEADER_SEGMENT + block_id * BLOCK


def meta_ptr(raw):
    # low 56 bits block id, high 8 bits chunk index
    return raw & 0x00FFFFFFFFFFFFFF, raw >> 56


def read_meta_chunk(block_id, idx):
    off = block_offset(block_id) + 8 + idx * META_CHUNK
    nxt = struct.unpack_from("<Q", data, off)[0]
    return nxt, data[off + 8: off + META_CHUNK]


def meta_stream(raw_ptr, offset=0):
    """Follow the metadata chain, concatenating payloads."""
    out = b""
    block_id, idx = meta_ptr(raw_ptr)
    while True:
        nxt, payload = read_meta_chunk(block_id, idx)
        out += payload
        if nxt == 0xFFFFFFFFFFFFFFFF:
            break
        block_id, idx = meta_ptr(nxt)
        if len(out) > 1 << 22:
            break
    return out[offset:]


stream = meta_stream(active["meta_block"])
print("catalog stream head:", stream[:96].hex(" "))

# --- generic field-id dump (heuristic) ---

class R:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def u16(self):
        v = struct.unpack_from("<H", self.buf, self.pos)[0]
        self.pos += 2
        return v

    def byte(self):
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def varint(self):
        result = 0
        shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            shift += 7
            if not (b & 0x80):
                return result

    def data_(self, n):
        v = self.buf[self.pos:self.pos + n]
        self.pos += n
        return v


r = R(stream)
print("field100 =", (r.u16(), r.varint()))
print("field", r.u16(), "count", r.varint())
# first entry, dump next 200 bytes
print(stream[r.pos:r.pos + 200].hex(" "))
