"""Minimal parquet footer reader: ``footer_num_rows(path)``.

pyarrow refuses to OPEN a parquet file whose schema carries a logical
type newer than the linked parquet-cpp knows (e.g. Spark 4's VARIANT
annotation → "Thrift LogicalType that is not recognized"), which would
sink every footer-stats consumer for tables with such columns. The row
COUNT, though, needs none of the schema: parquet's footer is a Thrift
compact-protocol ``FileMetaData`` struct whose field 3 is ``num_rows``
(i64) — public format spec (parquet-format Thrift definition +
THRIFT-110 compact protocol spec). This module walks the compact
protocol just far enough to return it, skipping every other field
structurally (no schema interpretation at all).

Used as the fallback tier by ``deltalog._stats_for_file``; min/max
column stats are simply absent in that tier, which every consumer
already treats as "cannot prune" — correct, just less selective.
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
            # NB: two statements — `self.i += self.varint()` loads the old
            # offset BEFORE the varint advances it, silently dropping the
            # length prefix's own bytes
            n = self.varint()
            self.i += n
        elif wtype in (_LIST, _SET):
            head = self.u8()
            size, etype = head >> 4, head & 0x0F
            if size == 15:
                size = self.varint()
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
            last = 0
            while True:
                head = self.u8()
                if head == _STOP:
                    return
                delta, ftype = head >> 4, head & 0x0F
                last = last + delta if delta else self.zigzag()
                self.skip(ftype)
        else:
            raise ValueError(f"unknown thrift compact type {wtype}")


def footer_num_rows(path: str) -> int:
    """FileMetaData.num_rows (field 3, i64) straight from the footer —
    no schema parse, so unknown logical types cannot fail it."""
    with open(path, "rb") as f:
        f.seek(-8, 2)
        tail = f.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"not a parquet file: {path}")
        (flen,) = struct.unpack("<I", tail[:4])
        f.seek(-8 - flen, 2)
        r = _Reader(f.read(flen))
    last = 0
    while True:
        head = r.u8()
        if head == _STOP:
            break
        delta, ftype = head >> 4, head & 0x0F
        last = last + delta if delta else r.zigzag()
        if last == 3 and ftype == _I64:
            return r.zigzag()
        r.skip(ftype)
    raise ValueError(f"no num_rows field in parquet footer: {path}")
