"""Parquet split-block Bloom filter (SBBF) reader + XXH64, from the
public specs — the point-lookup pruning tier.

Why: per-file min/max stats prune RANGE predicates, but a hash-laid-out
or unsorted table gives every file the full key range — a point lookup
(``key = x``) can exclude nothing from stats. Parquet's standard answer
is a split-block Bloom filter per column chunk (parquet-format
BloomFilter.md): ~1 byte/row buys "definitely absent" answers with ~1%
false positives, so planning opens a candidate file's footer + a few KB
of bitset instead of scanning it. At 100 TB that's the difference
between touching 1 file and touching all of them.

Format grounding (all public):
- parquet.thrift ``ColumnMetaData``: field 14 ``bloom_filter_offset``
  (i64), field 15 ``bloom_filter_length`` (i32, optional).
- At the offset, a compact-thrift ``BloomFilterHeader``: 1 ``numBytes``
  (i32), 2 algorithm (union, BLOCK), 3 hash (union, XXHASH),
  4 compression (union, UNCOMPRESSED) — then ``numBytes`` of bitset.
- BloomFilter.md SBBF: the bitset is ``z = numBytes/32`` blocks of eight
  32-bit words. For 64-bit hash ``h``: block = ``((h >> 32) * z) >> 32``
  (fastrange); within the block, word ``i`` must have bit
  ``((x * SALT[i]) & 0xFFFFFFFF) >> 27`` set for all eight salts, where
  ``x = h & 0xFFFFFFFF``. All set → MAYBE present; any clear →
  definitely absent.
- Values hash with XXH64 seed 0 over their PLAIN encoding (int32/int64
  little-endian; float/double IEEE little-endian; byte arrays raw, no
  length prefix).
- XXH64 implemented from the public xxhash_spec.md; verified against the
  reference vectors and differentially against Spark's ``F.xxhash64``
  (same algorithm, seed 42) in tests/test_parquet_bloom.py.

Like plans/parquet_footer.py, the walk never parses SchemaElement, so
files whose logical types defeat pyarrow (VARIANT) still probe fine.
"""

from __future__ import annotations

import struct

from .parquet_footer import _I32, _I64, _LIST, _STRUCT, _Reader, _read_footer

# ------------------------------------------------------------------ XXH64

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 per the public spec (Cyan4973/xxHash xxhash_spec.md)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# ------------------------------------------------------------------ SBBF

_SALT = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)


def _column_chunk_bloom(r: _Reader):
    """(path, physical_type, bloom_offset) from one ColumnChunk struct."""
    out = None
    for fid, ftype in r.fields():
        if fid == 3 and ftype == _STRUCT:  # meta_data: ColumnMetaData
            ptype = path = off = None
            for cfid, cft in r.fields():
                if cfid == 1 and cft == _I32:
                    ptype = r.zigzag()
                elif cfid == 3 and cft == _LIST:
                    size, _etype = r.list_header()
                    path = ".".join(
                        r.binary().decode("utf-8") for _ in range(size)
                    )
                elif cfid == 14 and cft == _I64:
                    off = r.zigzag()
                else:
                    r.skip(cft)
            out = (path, ptype, off)
        else:
            r.skip(ftype)
    return out


def bloom_offsets(path: str) -> dict[str, list[tuple[int, int]]]:
    """{dotted.path: [(physical_type, bloom_filter_offset), ...]} — one
    entry per row group that wrote a bloom for that column."""
    r = _read_footer(path)
    out: dict[str, list[tuple[int, int]]] = {}
    for fid, ftype in r.fields():
        if fid == 4 and ftype == _LIST:  # row_groups
            ngroups, _etype = r.list_header()
            for _ in range(ngroups):
                for gfid, gft in r.fields():  # RowGroup
                    if gfid == 1 and gft == _LIST:  # columns
                        nchunks, _et = r.list_header()
                        for _ in range(nchunks):
                            got = _column_chunk_bloom(r)
                            if got is not None and got[2] is not None:
                                out.setdefault(got[0], []).append(
                                    (got[1], got[2])
                                )
                    else:
                        r.skip(gft)
        else:
            r.skip(ftype)
    return out


def _read_bitset(fh, offset: int) -> bytes:
    """Parse the BloomFilterHeader at ``offset``, return the bitset."""
    fh.seek(offset)
    head = fh.read(64)  # the header is a handful of bytes; 64 is ample
    r = _Reader(head)
    num_bytes = None
    for fid, ftype in r.fields():
        if fid == 1 and ftype == _I32:
            num_bytes = r.zigzag()
        else:
            r.skip(ftype)  # algorithm/hash/compression unions
    if num_bytes is None or num_bytes <= 0 or num_bytes % 32:
        raise ValueError(f"malformed BloomFilterHeader at offset {offset}")
    fh.seek(offset + r.i)
    bits = fh.read(num_bytes)
    if len(bits) != num_bytes:
        raise ValueError("truncated bloom bitset")
    return bits


def plain_encode(ptype: int, value) -> bytes:
    """The PLAIN encoding BloomFilter.md hashes (byte arrays without the
    length prefix)."""
    if ptype == 1:  # INT32
        return struct.pack("<i", value)
    if ptype == 2:  # INT64
        return struct.pack("<q", value)
    if ptype == 4:  # FLOAT
        return struct.pack("<f", value)
    if ptype == 5:  # DOUBLE
        return struct.pack("<d", value)
    if ptype in (6, 7):  # BYTE_ARRAY / FIXED_LEN_BYTE_ARRAY
        # Only genuine byte-array probe values may be hashed: bytes(int_n)
        # would yield n zero bytes — a bogus hash and a false "definitely
        # absent" verdict that silently drops files Spark's implicit-cast
        # row filter could have matched. Mis-typed probes fail loudly here;
        # callers' except clauses then stay conservative (cannot-prune).
        if isinstance(value, str):
            return value.encode("utf-8")
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
        raise TypeError(
            f"bloom probe against BYTE_ARRAY column requires a str/bytes "
            f"value, got {type(value).__name__}"
        )
    raise ValueError(f"no plain encoding for physical type {ptype}")


def bitset_maybe_contains(bitset: bytes, h: int) -> bool:
    """SBBF membership check for 64-bit hash ``h``."""
    z = len(bitset) // 32
    base = (((h >> 32) * z) >> 32) * 32
    x = h & 0xFFFFFFFF
    for i in range(8):
        bit = ((x * _SALT[i]) & 0xFFFFFFFF) >> 27
        (word,) = struct.unpack_from("<I", bitset, base + 4 * i)
        if not word & (1 << bit):
            return False
    return True


def file_maybe_contains(path: str, column: str, value) -> bool:
    """Bloom verdict for ``column = value`` over one parquet file: False
    means DEFINITELY absent (skip the file); True means maybe present (a
    file without a bloom for the column is always True — cannot exclude).
    Cost: one footer walk + one tiny bitset read per row group."""
    offs = bloom_offsets(path).get(column)
    if not offs:
        return True
    with open(path, "rb") as fh:
        for ptype, off in offs:
            if ptype in (4, 5):
                # FLOAT/DOUBLE eq probes are unsound under IEEE-754 signed
                # zero (+0.0 and -0.0 hash differently) — never exclude.
                return True
            bits = _read_bitset(fh, off)
            if bitset_maybe_contains(bits, xxh64(plain_encode(ptype, value))):
                return True
    return False
