"""Minimal generic Avro Object Container File (OCF) reader/writer, from the
public Avro 1.11 spec — no Avro library in this container, and Iceberg's
manifests are Avro, so interop needs exactly this much of the format:

- binary encoding: zigzag-varint longs/ints, IEEE little-endian
  float/double, length-prefixed bytes/strings, arrays/maps as counted
  blocks (0-terminated), unions as branch-index + value, records as field
  concatenation, enums as int index, fixed as raw bytes;
- the container: magic ``Obj\\x01``, a file-metadata map carrying
  ``avro.schema`` (writer schema JSON) + ``avro.codec``, a 16-byte sync
  marker, then data blocks of (record count, byte size, payload, sync).
  Codecs: ``null`` and ``deflate`` (raw zlib stream, RFC 1951).

The READER is driven entirely by the writer schema embedded in the file —
the property that makes foreign-written Iceberg manifests readable without
schema negotiation. The WRITER emits the canonical encoding of a given
schema. Schemas are plain parsed-JSON (dicts/lists/strings), resolved
against a name registry for named-type references.

Scope (enough for Iceberg manifests + general tabular data): all primitives,
records, arrays, maps, unions, enums, fixed; logical types pass through as
their underlying primitives (Iceberg reads them by field-id, not by logical
annotation). Not implemented: recursive schemas' cyclic writes, aliases,
schema resolution between differing reader/writer schemas.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ----------------------------------------------------------------- encoding


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("unexpected end of Avro data")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf) -> bytes:
    n = read_long(buf)
    out = buf.read(n)
    if len(out) != n:
        raise EOFError("short read in Avro bytes")
    return out


# ------------------------------------------------------------------ schemas


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


class _Names:
    """Registry of named types (record/enum/fixed) for by-name references."""

    def __init__(self):
        self.defs: dict[str, dict] = {}

    def register(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            full = f"{ns}.{name}" if ns and "." not in name else name
            self.defs[full] = schema
            self.defs[name.split(".")[-1]] = schema

    def resolve(self, schema):
        if isinstance(schema, str) and schema in self.defs:
            return self.defs[schema]
        return schema


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _collect_names(schema, names: _Names) -> None:
    schema = names.resolve(schema)
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
        return
    if isinstance(schema, str):
        return
    t = schema["type"]
    if t in ("record", "error"):
        names.register(schema)
        for f in schema["fields"]:
            _collect_names(f["type"], names)
    elif t in ("enum", "fixed"):
        names.register(schema)
    elif t == "array":
        _collect_names(schema["items"], names)
    elif t == "map":
        _collect_names(schema["values"], names)


def _union_branch_index(schema_list: list, value, names: _Names) -> int:
    """Pick the union branch for a python value (sufficient for the shapes
    Iceberg uses: [null, X] optionals plus primitive unions)."""
    for i, s in enumerate(schema_list):
        t = _type_name(names.resolve(s))
        if value is None and t == "null":
            return i
    for i, s in enumerate(schema_list):
        rs = names.resolve(s)
        t = _type_name(rs)
        if value is None:
            continue
        if t == "boolean" and isinstance(value, bool):
            return i
        if t in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            return i
        if t in ("float", "double") and isinstance(value, float):
            return i
        if t in ("bytes", "fixed") and isinstance(value, (bytes, bytearray)):
            return i
        if t in ("string", "enum") and isinstance(value, str):
            return i
        if t == "record" and isinstance(value, dict):
            return i
        if t == "array" and isinstance(value, (list, tuple)):
            return i
        if t == "map" and isinstance(value, dict):
            return i
    raise ValueError(f"no union branch in {schema_list} for {value!r}")


def encode(buf: io.BytesIO, schema, value, names: _Names) -> None:
    schema = names.resolve(schema)
    if isinstance(schema, list):
        idx = _union_branch_index(schema, value, names)
        write_long(buf, idx)
        encode(buf, schema[idx], value, names)
        return
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_bytes(buf, bytes(value))
    elif t == "string":
        write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(value)} != {schema['size']}")
        buf.write(bytes(value))
    elif t == "enum":
        write_long(buf, schema["symbols"].index(value))
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for v in value:
                encode(buf, schema["items"], v, names)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, k.encode("utf-8"))
                encode(buf, schema["values"], v, names)
        write_long(buf, 0)
    elif t in ("record", "error"):
        for f in schema["fields"]:
            if f["name"] in value:
                fv = value[f["name"]]
            elif "default" in f:
                fv = f["default"]
            else:
                raise ValueError(f"missing field {f['name']} (no default)")
            encode(buf, f["type"], fv, names)
    else:
        raise NotImplementedError(f"Avro type {t}")


def decode(buf, schema, names: _Names):
    schema = names.resolve(schema)
    if isinstance(schema, list):
        idx = read_long(buf)
        return decode(buf, schema[idx], names)
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with explicit byte size
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode(buf, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = decode(buf, schema["values"], names)
    if t in ("record", "error"):
        return {f["name"]: decode(buf, f["type"], names) for f in schema["fields"]}
    raise NotImplementedError(f"Avro type {t}")


# ---------------------------------------------------------------- container


def write_ocf(
    path: str,
    schema,
    records: list,
    codec: str = "null",
    metadata: dict | None = None,
    sync: bytes = b"\x00" * 16,
) -> None:
    """Write records as a single-block Avro OCF (Iceberg manifests are small;
    block-per-file keeps the writer simple and spec-valid)."""
    names = _Names()
    _collect_names(schema, names)
    payload = io.BytesIO()
    for r in records:
        encode(payload, schema, r, names)
    raw = payload.getvalue()
    if codec == "deflate":
        # spec: raw DEFLATE stream, no zlib header/checksum
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        raw = comp.compress(raw) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(f"codec {codec}")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    buf = io.BytesIO()
    buf.write(MAGIC)
    write_long(buf, len(meta))
    for k, v in meta.items():
        write_bytes(buf, k.encode())
        write_bytes(buf, v)
    write_long(buf, 0)
    buf.write(sync)
    if records:
        write_long(buf, len(records))
        write_long(buf, len(raw))
        buf.write(raw)
        buf.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def read_ocf(path: str) -> tuple[dict, list]:
    """Read an Avro OCF → (file metadata dict incl. parsed writer schema,
    decoded records). Decoding is driven by the EMBEDDED writer schema."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    names = _Names()
    _collect_names(schema, names)
    records = []
    while buf.tell() < len(data):
        n_records = read_long(buf)
        n_bytes = read_long(buf)
        block = buf.read(n_bytes)
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec}")
        bbuf = io.BytesIO(block)
        for _ in range(n_records):
            records.append(decode(bbuf, schema, names))
    out_meta = {k: v for k, v in meta.items()}
    out_meta["avro.schema"] = schema
    return out_meta, records
