"""From-scratch Roaring bitmap serialization for Delta deletion vectors.

Implements, from the PUBLIC specs only (no roaring/delta libraries in the
container):

- The standard 32-bit Roaring bitmap "portable" serialization
  (github.com/RoaringBitmap/RoaringFormatSpec): WRITES the
  no-run-container flavor (cookie 12346) with array / bitmap containers;
  READS both flavors including run containers (cookie 12347), so
  foreign-written bitmaps still load.
- Delta's 64-bit ``RoaringBitmapArray`` "portable" wrapper
  (delta.io PROTOCOL.md, Deletion Vector Format): magic 1681511377 (LE),
  u64 bitmap count, then per bitmap a u32 key (the high 32 bits) followed
  by the standard 32-bit portable serialization, keys ascending.
- The on-disk deletion-vector FILE layout (PROTOCOL.md, Deletion Vector
  File Storage Format): a 1-byte format version (1), then each DV stored
  as [i32 big-endian size][size bytes of magic+bitmap-array data]
  [i32 big-endian CRC-32 of those bytes]; a descriptor's ``offset`` points
  at the size field, ``sizeInBytes`` counts only the data bytes.

All functions are pure bytes<->ints; Spark never sees this module except
through ``deltalog``'s deletion-vector read/write paths. (Reference
analogue: none — the notebook has no delete concept at all; this serves
SURVEY §2.2's transactional-lakehouse tier.)
"""

from __future__ import annotations

import struct
import zlib

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096
RBA_MAGIC = 1681511377


def _run_spans(lows: list[int]) -> list[tuple[int, int]]:
    """Sorted distinct u16 list → [(start, length-1)] consecutive runs."""
    runs = []
    s = p = lows[0]
    for v in lows[1:]:
        if v == p + 1:
            p = v
        else:
            runs.append((s, p - s))
            s = p = v
    runs.append((s, p - s))
    return runs


def serialize_roaring32(values, run_optimize: bool = True) -> bytes:
    """Portable serialization of a set of u32 values: containers keyed by
    the high 16 bits. Each container picks its cheapest encoding — sorted
    u16 array (card <= 4096), 8 KiB bitset, or (``run_optimize``, the
    spec's runOptimize step) a run container when `2 + 4·n_runs` beats
    both. Any run container switches the stream to cookie 12347 with the
    run bitset; otherwise the classic no-run cookie 12346 is emitted —
    exactly the two flavors the reader accepts. Dense DELETE vectors (long
    consecutive ranges) shrink from 8 KiB bitsets to a few bytes per
    container, which is what a compaction-heavy Delta table's DVs look
    like."""
    vals = sorted(set(values))
    if any(v < 0 or v > 0xFFFFFFFF for v in vals):
        raise ValueError("roaring32 values must be u32")
    containers: dict[int, list[int]] = {}
    for v in vals:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    payloads: list[bytes] = []
    is_run: list[bool] = []
    for k in keys:
        lows = containers[k]
        plain_size = 2 * len(lows) if len(lows) <= _ARRAY_MAX else 8192
        runs = _run_spans(lows) if run_optimize else None
        if runs is not None and 2 + 4 * len(runs) < plain_size:
            body = struct.pack("<H", len(runs))
            for start, extent in runs:
                body += struct.pack("<HH", start, extent)
            payloads.append(body)
            is_run.append(True)
        elif len(lows) <= _ARRAY_MAX:
            payloads.append(struct.pack(f"<{len(lows)}H", *lows))
            is_run.append(False)
        else:
            bits = bytearray(8192)
            for low in lows:
                bits[low >> 3] |= 1 << (low & 7)
            payloads.append(bytes(bits))
            is_run.append(False)
    out = bytearray()
    n = len(keys)
    if any(is_run):
        out += struct.pack("<I", SERIAL_COOKIE | ((n - 1) << 16))
        runbits = bytearray((n + 7) // 8)
        for i, r in enumerate(is_run):
            if r:
                runbits[i >> 3] |= 1 << (i & 7)
        out += bytes(runbits)
        with_offsets = n >= NO_OFFSET_THRESHOLD
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)
        with_offsets = True
    for k, p in zip(keys, payloads):
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    if with_offsets:
        pos = len(out) + 4 * n
        for p in payloads:
            out += struct.pack("<I", pos)
            pos += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def deserialize_roaring32(buf: bytes, base: int = 0) -> tuple[list[int], int]:
    """Parse one portable 32-bit roaring bitmap starting at ``base``;
    returns (sorted values, bytes consumed). Handles both cookies,
    including run containers."""
    (cookie32,) = struct.unpack_from("<I", buf, base)
    cookie = cookie32 & 0xFFFF
    if cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (size,) = struct.unpack_from("<I", buf, base + 4)
        pos = base + 8
        has_run = [False] * size
    elif cookie == SERIAL_COOKIE:
        size = (cookie32 >> 16) + 1
        pos = base + 4
        nbytes = (size + 7) // 8
        runbits = buf[pos : pos + nbytes]
        pos += nbytes
        has_run = [bool(runbits[i >> 3] & (1 << (i & 7))) for i in range(size)]
    else:
        raise ValueError(f"not a portable roaring bitmap (cookie {cookie})")
    descs = []
    for _ in range(size):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        descs.append((k, cm1 + 1))
        pos += 4
    if cookie == SERIAL_COOKIE_NO_RUNCONTAINER or size >= NO_OFFSET_THRESHOLD:
        pos += 4 * size  # offsets (recomputable; we read sequentially)
    out: list[int] = []
    for i, (k, card) in enumerate(descs):
        hi = k << 16
        if has_run[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, extra = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(hi | v for v in range(start, start + extra + 1))
        elif card <= _ARRAY_MAX:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(hi | v for v in lows)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            out.extend(
                hi | (byte_i << 3 | bit)
                for byte_i, b in enumerate(bits)
                if b
                for bit in range(8)
                if b & (1 << bit)
            )
    return out, pos - base


def serialize_rba(values) -> bytes:
    """Delta RoaringBitmapArray portable serialization of a set of u64
    values (magic + u64 count + per-bitmap u32 key + 32-bit portable)."""
    vals = sorted(set(values))
    if any(v < 0 for v in vals):
        raise ValueError("positions must be non-negative")
    by_key: dict[int, list[int]] = {}
    for v in vals:
        by_key.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iQ", RBA_MAGIC, len(by_key)))
    for k in sorted(by_key):
        out += struct.pack("<I", k)
        out += serialize_roaring32(by_key[k])
    return bytes(out)


def deserialize_rba(buf: bytes) -> list[int]:
    magic, n = struct.unpack_from("<iQ", buf, 0)
    if magic != RBA_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals, used = deserialize_roaring32(buf, pos)
        pos += used
        out.extend((key << 32) | v for v in vals)
    return out


def write_dv_file(path: str, dv_blobs: list[bytes]) -> list[tuple[int, int]]:
    """Write a deletion-vector file holding ``dv_blobs`` (each a serialized
    RoaringBitmapArray); returns [(offset, sizeInBytes)] per blob for the
    add-action descriptors. Layout per the public Delta protocol: version
    byte 1, then per DV [i32 BE size][data][i32 BE CRC-32]."""
    spans = []
    with open(path, "wb") as f:
        f.write(b"\x01")
        pos = 1
        for blob in dv_blobs:
            spans.append((pos, len(blob)))
            f.write(struct.pack(">i", len(blob)))
            f.write(blob)
            # Full 32-bit CRC: delta-spark writes crc.getValue.toInt, i.e. the
            # raw 4 CRC-32 bytes — masking to 31 bits would reject ~half of all
            # real-engine blobs (and be rejected by them).
            f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
            pos += 4 + len(blob) + 4
    return spans


def read_dv_blob(path: str, offset: int, size_in_bytes: int) -> bytes:
    """Read one DV's data bytes back from a DV file, verifying the size
    prefix and CRC-32 trailer."""
    with open(path, "rb") as f:
        f.seek(offset)
        (n,) = struct.unpack(">i", f.read(4))
        if n != size_in_bytes:
            raise ValueError(f"DV size mismatch at {path}:{offset}: {n} != {size_in_bytes}")
        blob = f.read(n)
        (crc,) = struct.unpack(">I", f.read(4))
    if crc != (zlib.crc32(blob) & 0xFFFFFFFF):
        raise ValueError(f"DV checksum mismatch at {path}:{offset}")
    return blob


# ---------------------------------------------------------------- descriptors
# Deletion-vector DESCRIPTOR resolution (PROTOCOL.md, Deletion Vector
# Descriptor Schema): three storage flavors —
#   "p": pathOrInlineDv is an absolute DV-file path; offset/sizeInBytes span
#        one framed blob inside it.
#   "u": pathOrInlineDv is <randomPrefix?><20-char Base85 UUID> (RFC 1924
#        alphabet — Python's base64.b85* codec); the DV file lives at
#        <tableRoot>/<prefix>/deletion_vector_<canonical uuid>.bin.
#   "i": pathOrInlineDv IS the DV — the Base85-encoded (same RFC 1924
#        alphabet) serialized RoaringBitmapArray, no file, no offset;
#        sizeInBytes counts the DECODED bytes.


def encode_dv_inline(blob: bytes) -> str:
    """Serialized RoaringBitmapArray → the descriptor's inline Base85 text."""
    import base64

    return base64.b85encode(blob).decode("ascii")


def decode_dv_inline(text: str, size_in_bytes: int | None = None) -> bytes:
    """Inline Base85 text → serialized RoaringBitmapArray bytes, verifying
    the descriptor's sizeInBytes against the decoded length when given."""
    import base64

    blob = base64.b85decode(text)
    if size_in_bytes is not None and len(blob) != int(size_in_bytes):
        raise ValueError(
            f"inline DV size mismatch: decoded {len(blob)} bytes, "
            f"descriptor says {size_in_bytes}"
        )
    return blob


def dv_path_from_u(path_or_inline: str, table_root: str) -> str:
    """'u'-flavor pathOrInlineDv → absolute DV file path. The encoded UUID
    is always the LAST 20 characters (16 bytes in Base85); anything before
    it is the optional random prefix directory."""
    import base64
    import os
    import uuid as _uuid

    if len(path_or_inline) < 20:
        raise ValueError(f"'u' DV path too short: {path_or_inline!r}")
    enc, prefix = path_or_inline[-20:], path_or_inline[:-20]
    raw = base64.b85decode(enc)
    if len(raw) != 16:
        raise ValueError(f"'u' DV UUID decodes to {len(raw)} bytes, want 16")
    name = f"deletion_vector_{_uuid.UUID(bytes=raw)}.bin"
    return os.path.join(table_root, prefix, name) if prefix else os.path.join(
        table_root, name
    )


def read_dv_descriptor(d: dict, table_root: str = "") -> bytes:
    """DeletionVectorDescriptor dict → the serialized RoaringBitmapArray
    bytes, dispatching on storageType ('p' absolute file / 'u' relative
    file / 'i' inline). Pure function safe to call executor-side."""
    st = d.get("storageType", "p")
    if st == "i":
        return decode_dv_inline(d["pathOrInlineDv"], d.get("sizeInBytes"))
    if st == "p":
        return read_dv_blob(
            d["pathOrInlineDv"], int(d["offset"]), int(d["sizeInBytes"])
        )
    if st == "u":
        return read_dv_blob(
            dv_path_from_u(d["pathOrInlineDv"], table_root),
            int(d["offset"]),
            int(d["sizeInBytes"]),
        )
    raise NotImplementedError(f"DV storageType {st!r} (know p/u/i)")
