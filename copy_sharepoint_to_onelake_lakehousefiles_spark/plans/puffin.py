"""From-scratch Puffin file format (Iceberg spec §Puffin file format) for
Iceberg v3 deletion vectors.

Layout, from the PUBLIC spec only (no Iceberg libraries in the container):

    Magic Blob₁ Blob₂ ... Blobₙ Footer
    Footer = Magic FooterPayload FooterPayloadSize Flags Magic

- ``Magic`` = the 4 bytes ``PFA1``.
- ``FooterPayload`` = UTF-8 JSON ``{"blobs": [...], "properties": {...}}``;
  each blob entry carries {type, fields, snapshot-id, sequence-number,
  offset, length, compression-codec?, properties?}.
- ``FooterPayloadSize`` = 4-byte little-endian int (STORED payload byte
  length — post-compression when compressed).
- ``Flags`` = 4 bytes; bit 0 of the first byte marks an LZ4-compressed
  footer payload (one LZ4 frame, content size present) — decoded via the
  from-scratch plans/lz4.py (r7); other flag bits refuse loudly.

The v3 ``deletion-vector-v1`` blob data (spec §Deletion vectors):

    [combined length, 4 bytes BE] [magic D1 D3 39 64] [serialized bitmap]
    [CRC-32 of magic+bitmap, 4 bytes BE]

where the serialized bitmap is the "portable" 64-bit Roaring format —
u64 LE bitmap count, then per bitmap a u32 key + standard 32-bit portable
serialization. The 4 magic bytes D1 D3 39 64 are EXACTLY the little-endian
encoding of Delta's RoaringBitmapArray magic (0x6439D3D1 = 1681511377), so
"magic + serialized bitmap" is byte-identical to ``roaring.serialize_rba``
output — the two specs share the same on-disk bitmap algebra, which is why
this module is ~100 lines instead of a second Roaring implementation.

All functions are pure bytes<->values; Spark never sees this module except
through ``iceberg.py``'s v3 deletion-vector read path.
"""

from __future__ import annotations

import json
import struct
import zlib

from .roaring import deserialize_rba, serialize_rba

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"


def dv_blob_data(values) -> bytes:
    """Sorted u64 positions → the deletion-vector-v1 blob's data bytes."""
    rba = serialize_rba(values)  # = magic D1D33964 + portable 64-bit bitmap
    return (
        struct.pack(">i", len(rba)) + rba + struct.pack(">I", zlib.crc32(rba) & 0xFFFFFFFF)
    )


def parse_dv_blob_data(data: bytes) -> list[int]:
    """deletion-vector-v1 blob data → deleted positions, verifying the
    combined length, the D1D33964 magic (via the shared RBA deserializer),
    and the big-endian CRC-32 trailer."""
    if len(data) < 12:
        raise ValueError(f"Puffin DV blob too short ({len(data)} bytes)")
    (n,) = struct.unpack_from(">i", data, 0)
    if 4 + n + 4 != len(data):
        raise ValueError(
            f"Puffin DV blob length mismatch: header says {n}, "
            f"payload holds {len(data) - 8}"
        )
    rba = data[4 : 4 + n]
    (crc,) = struct.unpack_from(">I", data, 4 + n)
    if crc != (zlib.crc32(rba) & 0xFFFFFFFF):
        raise ValueError("Puffin DV blob CRC mismatch")
    return deserialize_rba(rba)  # validates the D1D33964 magic word


def write_puffin(
    path: str,
    blobs: list[dict],
    properties: dict | None = None,
    compress_footer: bool = False,
) -> list[dict]:
    """Write a Puffin file. Each blob dict: {"type", "data": bytes, and
    optional "fields", "snapshot-id", "sequence-number", "properties"}.
    Returns the footer's blob metadata entries (with offset/length), which
    a caller records in its manifest (content-offset / content-size).
    ``compress_footer`` LZ4-frames the footer payload and sets flag bit 0
    (spec §FooterPayloadCompressed) — off by default, matching the
    reference writers, but round-trippable for foreign files."""
    metas: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        pos = 4
        for b in blobs:
            data = b["data"]
            metas.append(
                {
                    "type": b["type"],
                    "fields": list(b.get("fields") or []),
                    "snapshot-id": b.get("snapshot-id", -1),
                    "sequence-number": b.get("sequence-number", -1),
                    "offset": pos,
                    "length": len(data),
                    **({"properties": b["properties"]} if b.get("properties") else {}),
                }
            )
            f.write(data)
            pos += len(data)
        payload = json.dumps(
            {"blobs": metas, "properties": dict(properties or {})}
        ).encode("utf-8")
        flags = b"\x00\x00\x00\x00"
        if compress_footer:
            from .lz4 import lz4_frame_compress

            payload = lz4_frame_compress(payload)
            flags = b"\x01\x00\x00\x00"  # bit 0: footer payload compressed
        f.write(MAGIC)
        f.write(payload)
        # FooterPayloadSize is the STORED (post-compression) byte length
        f.write(struct.pack("<i", len(payload)))
        f.write(flags)
        f.write(MAGIC)
    return metas


def read_puffin_footer(path: str) -> dict:
    """Parse a Puffin file's footer payload JSON, verifying all three magic
    words. Flag bit 0 (FooterPayloadCompressed) routes the payload through
    the from-scratch LZ4 frame decoder (plans/lz4.py — r7, was a loud
    refusal); unknown flag bits still refuse loudly."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC or raw[-4:] != MAGIC:
        raise ValueError("not a Puffin file (bad magic)")
    flags = raw[-8:-4]
    if flags[0] & ~0x01 or flags[1] or flags[2] or flags[3]:
        raise NotImplementedError(
            f"unknown Puffin footer flags {flags.hex()} (know only bit 0: "
            "LZ4-compressed payload)"
        )
    (size,) = struct.unpack_from("<i", raw, len(raw) - 12)
    payload = raw[len(raw) - 12 - size : len(raw) - 12]
    if raw[len(raw) - 12 - size - 4 : len(raw) - 12 - size] != MAGIC:
        raise ValueError("Puffin footer start magic missing")
    if flags[0] & 0x01:
        from .lz4 import lz4_frame_decompress

        payload = lz4_frame_decompress(payload)
    return json.loads(payload.decode("utf-8"))


def read_puffin_blob(path: str, offset: int, length: int) -> bytes:
    """Read one blob's data bytes by the manifest-recorded span."""
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if len(data) != length:
        raise ValueError(
            f"Puffin blob truncated at {path}:{offset} "
            f"(wanted {length}, got {len(data)})"
        )
    return data


def read_dv_positions(path: str, offset: int, length: int) -> list[int]:
    """Convenience: manifest span → deleted positions."""
    return parse_dv_blob_data(read_puffin_blob(path, offset, length))
