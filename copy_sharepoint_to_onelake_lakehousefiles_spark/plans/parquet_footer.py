"""Minimal parquet footer reader: ``footer_num_rows(path)`` and
``footer_stats(path)`` — a schema-free thrift compact-protocol walk.

pyarrow refuses to OPEN a parquet file whose schema carries a logical
type newer than the linked parquet-cpp knows (e.g. Spark 4's VARIANT
annotation → "Thrift LogicalType that is not recognized"), which would
sink every footer-stats consumer for tables with such columns. Neither
the row COUNT nor the per-column-chunk STATISTICS need the schema,
though: parquet's footer is a Thrift compact-protocol ``FileMetaData``
struct, and ``ColumnMetaData`` carries the physical type (field 1), the
dotted column path (field 3) and the row-group statistics (field 12)
directly — public format spec (parquet-format parquet.thrift +
THRIFT-110 compact protocol spec). This module walks the protocol
structurally, with NO SchemaElement interpretation at all, so unknown
logical types cannot fail it.

Field map used (parquet.thrift):
  FileMetaData:   3 num_rows (i64), 4 row_groups (list<RowGroup>)
  RowGroup:       1 columns (list<ColumnChunk>)
  ColumnChunk:    3 meta_data (ColumnMetaData)
  ColumnMetaData: 1 type (i32), 3 path_in_schema (list<string>),
                  12 statistics (Statistics)
  Statistics:     3 null_count (i64), 5 max_value, 6 min_value (binary)
Physical types:   BOOLEAN=0 INT32=1 INT64=2 INT96=3 FLOAT=4 DOUBLE=5
                  BYTE_ARRAY=6 FIXED_LEN_BYTE_ARRAY=7

Used as the fallback tier by ``deltalog._stats_for_file`` and
``iceberg._file_entry``. ``footer_stats`` makes VARIANT-bearing files —
including their SHREDDED typed paths (parquet-format VariantShredding
spec: ``col.typed_value.<field>.typed_value`` leaves carry ordinary
min/max) — prunable again instead of "no stats at all".

Caveat, documented by design: values decode by PHYSICAL type (an int64
timestamp column reports raw epoch units, not ISO strings). Min/max
remain monotonic in the logical value, so range pruning against bounds
expressed in the same raw unit is exact; consumers mixing this tier with
pyarrow-tier ISO-string stats for the SAME column must not compare
across tiers (in practice a table either has a variant column — all its
files take this tier — or none do).
"""

from __future__ import annotations

import struct

# Thrift compact-protocol wire types
_STOP = 0
_BOOL_TRUE = 1
_BOOL_FALSE = 2
_BYTE = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def u8(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def varint(self) -> int:
        out = shift = 0
        while True:
            c = self.u8()
            out |= (c & 0x7F) << shift
            if not c & 0x80:
                return out
            shift += 7

    def zigzag(self) -> int:
        n = self.varint()
        return (n >> 1) ^ -(n & 1)

    def binary(self) -> bytes:
        # NB: two statements — `self.i += self.varint()` loads the old
        # offset BEFORE the varint advances it, silently dropping the
        # length prefix's own bytes
        n = self.varint()
        v = self.b[self.i : self.i + n]
        self.i += n
        return v

    def fields(self):
        """Yield (field_id, wire_type) for one struct's fields; the caller
        must consume or skip each value before pulling the next pair."""
        last = 0
        while True:
            head = self.u8()
            if head == _STOP:
                return
            delta, ftype = head >> 4, head & 0x0F
            last = last + delta if delta else self.zigzag()
            yield last, ftype

    def list_header(self) -> tuple[int, int]:
        head = self.u8()
        size, etype = head >> 4, head & 0x0F
        if size == 15:
            size = self.varint()
        return size, etype

    def skip(self, wtype: int, in_collection: bool = False) -> None:
        if wtype in (_BOOL_TRUE, _BOOL_FALSE):
            # As a struct FIELD the bool value lives in the field header
            # (zero-width here); as a list/set/map ELEMENT the compact
            # protocol writes one byte (0x01/0x02) per value — skipping
            # zero bytes there would desync the whole walk.
            if in_collection:
                self.i += 1
            return
        if wtype == _BYTE:
            self.i += 1
        elif wtype in (_I16, _I32, _I64):
            self.varint()
        elif wtype == _DOUBLE:
            self.i += 8
        elif wtype == _BINARY:
            n = self.varint()
            self.i += n
        elif wtype in (_LIST, _SET):
            size, etype = self.list_header()
            for _ in range(size):
                self.skip(etype, in_collection=True)
        elif wtype == _MAP:
            size = self.varint()
            if size:
                kv = self.u8()
                kt, vt = kv >> 4, kv & 0x0F
                for _ in range(size):
                    self.skip(kt, in_collection=True)
                    self.skip(vt, in_collection=True)
        elif wtype == _STRUCT:
            for _fid, ftype in self.fields():
                self.skip(ftype)
        else:
            raise ValueError(f"unknown thrift compact type {wtype}")


def _read_footer(path: str) -> _Reader:
    with open(path, "rb") as f:
        f.seek(-8, 2)
        tail = f.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"not a parquet file: {path}")
        (flen,) = struct.unpack("<I", tail[:4])
        f.seek(-8 - flen, 2)
        return _Reader(f.read(flen))


def footer_num_rows(path: str) -> int:
    """FileMetaData.num_rows (field 3, i64) straight from the footer —
    no schema parse, so unknown logical types cannot fail it."""
    r = _read_footer(path)
    for fid, ftype in r.fields():
        if fid == 3 and ftype == _I64:
            return r.zigzag()
        r.skip(ftype)
    raise ValueError(f"no num_rows field in parquet footer: {path}")


def _decode_value(ptype: int, raw: bytes):
    """Statistics min_value/max_value decode by PHYSICAL type (plain
    encoding per spec). Returns None for types with no comparable
    Python decode (INT96, unknown)."""
    try:
        if ptype == 0:  # BOOLEAN
            return bool(raw[0]) if raw else None
        if ptype == 1:  # INT32
            return struct.unpack("<i", raw)[0]
        if ptype == 2:  # INT64
            return struct.unpack("<q", raw)[0]
        if ptype == 4:  # FLOAT
            return struct.unpack("<f", raw)[0]
        if ptype == 5:  # DOUBLE
            return struct.unpack("<d", raw)[0]
        if ptype in (6, 7):  # BYTE_ARRAY / FIXED_LEN_BYTE_ARRAY
            # Strict decode: for non-UTF8 binary columns a U+FFFD
            # substitution could misorder the decoded bound vs the true
            # unsigned-byte order and let a stats tier understate max /
            # overstate min, wrongly pruning a matching file. Undecodable
            # bounds become None = the honest "cannot prune".
            return raw.decode("utf-8")
    except (struct.error, UnicodeDecodeError):
        return None
    return None


def _statistics(r: _Reader) -> dict:
    out = {"null_count": None, "min": None, "max": None}
    for fid, ftype in r.fields():
        if fid == 3 and ftype == _I64:
            out["null_count"] = r.zigzag()
        elif fid == 5 and ftype == _BINARY:
            out["max"] = r.binary()
        elif fid == 6 and ftype == _BINARY:
            out["min"] = r.binary()
        else:
            r.skip(ftype)
    return out


def _column_meta(r: _Reader):
    ptype = path = stats = None
    for fid, ftype in r.fields():
        if fid == 1 and ftype == _I32:
            ptype = r.zigzag()
        elif fid == 3 and ftype == _LIST:
            size, _etype = r.list_header()
            path = ".".join(r.binary().decode("utf-8") for _ in range(size))
        elif fid == 12 and ftype == _STRUCT:
            stats = _statistics(r)
        else:
            r.skip(ftype)
    return ptype, path, stats


def footer_stats(path: str) -> tuple[int, dict[str, dict]]:
    """``(num_rows, {dotted.path: {"min", "max", "null_count"}})``
    aggregated across row groups, decoded by physical type. min/max are
    None whenever any row group lacks them or the type has no comparable
    decode — the honest "cannot prune". Never parses SchemaElement, so
    footers pyarrow cannot open (VARIANT logical type) work."""
    r = _read_footer(path)
    num_rows = None
    agg: dict[str, dict] = {}
    for fid, ftype in r.fields():
        if fid == 3 and ftype == _I64:
            num_rows = r.zigzag()
        elif fid == 4 and ftype == _LIST:
            ngroups, _etype = r.list_header()
            for _ in range(ngroups):
                for gfid, gft in r.fields():  # RowGroup
                    if gfid == 1 and gft == _LIST:
                        nchunks, _et = r.list_header()
                        for _ in range(nchunks):
                            meta = None
                            for cfid, cft in r.fields():  # ColumnChunk
                                if cfid == 3 and cft == _STRUCT:
                                    meta = _column_meta(r)
                                else:
                                    r.skip(cft)
                            if meta is None or meta[1] is None:
                                continue
                            ptype, cpath, st = meta
                            ent = agg.setdefault(
                                cpath,
                                {
                                    "min": None,
                                    "max": None,
                                    "null_count": 0,
                                    "_mm_ok": True,
                                    "_nc_ok": True,
                                },
                            )
                            mn = mx = None
                            if st is not None and st["min"] is not None and st["max"] is not None:
                                mn = _decode_value(ptype, st["min"])
                                mx = _decode_value(ptype, st["max"])
                            if mn is None or mx is None:
                                ent["_mm_ok"] = False
                            else:
                                ent["min"] = mn if ent["min"] is None else min(ent["min"], mn)
                                ent["max"] = mx if ent["max"] is None else max(ent["max"], mx)
                            if st is None or st["null_count"] is None:
                                ent["_nc_ok"] = False
                            else:
                                ent["null_count"] += st["null_count"]
                    else:
                        r.skip(gft)
        else:
            r.skip(ftype)
    if num_rows is None:
        raise ValueError(f"no num_rows field in parquet footer: {path}")
    out = {
        cpath: {
            "min": ent["min"] if ent["_mm_ok"] else None,
            "max": ent["max"] if ent["_mm_ok"] else None,
            "null_count": ent["null_count"] if ent["_nc_ok"] else None,
        }
        for cpath, ent in agg.items()
    }
    return num_rows, out
