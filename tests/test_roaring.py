"""Roaring bitmap / RoaringBitmapArray / DV-file byte-level tests
(plans/roaring.py): spec byte vectors, container-type boundaries,
run-container reads, hypothesis round-trips, and DV-file integrity."""

import os
import struct

import pytest
from hypothesis import given, settings, strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.roaring import (
    RBA_MAGIC,
    SERIAL_COOKIE,
    SERIAL_COOKIE_NO_RUNCONTAINER,
    deserialize_rba,
    deserialize_roaring32,
    read_dv_blob,
    serialize_rba,
    serialize_roaring32,
    write_dv_file,
)


def _rt32(vals):
    buf = serialize_roaring32(vals)
    got, used = deserialize_roaring32(buf)
    assert used == len(buf)
    return got


def test_roaring32_header_bytes():
    # {1, 2, 100000}: two containers (keys 0 and 1), both arrays
    buf = serialize_roaring32([1, 2, 100000])
    cookie, size = struct.unpack_from("<II", buf, 0)
    assert cookie == SERIAL_COOKIE_NO_RUNCONTAINER
    assert size == 2
    k0, c0 = struct.unpack_from("<HH", buf, 8)
    k1, c1 = struct.unpack_from("<HH", buf, 12)
    assert (k0, c0 + 1) == (0, 2)
    assert (k1, c1 + 1) == (1, 1)  # 100000 = 1<<16 | 34464
    off0, off1 = struct.unpack_from("<II", buf, 16)
    assert off0 == 24  # 8 header + 2*4 descs + 2*4 offsets
    assert off1 == 24 + 2 * 2
    assert struct.unpack_from("<HH", buf, off0) == (1, 2)
    assert struct.unpack_from("<H", buf, off1) == (100000 & 0xFFFF,)


def test_roaring32_array_bitmap_boundary():
    # 4096 values stay an array container; 4097 flip to an 8 KiB bitmap
    # (run_optimize off — every-other-value has no run savings anyway, and
    # a full range would otherwise become a run container)
    arr = list(range(0, 8192, 2))[:4096]
    assert _rt32(arr) == arr
    big = list(range(4097))
    buf = serialize_roaring32(big, run_optimize=False)
    # one container, bitmap payload: 8 + 4 + 4 + 8192 bytes
    assert len(buf) == 8 + 4 + 4 + 8192
    assert _rt32(big) == big


def test_roaring32_writes_run_containers_for_dense_ranges():
    """runOptimize (r5): a dense consecutive range serializes as a RUN
    container under cookie 12347 — bytes shrink from an 8 KiB bitset to a
    handful, the shape of a compaction-heavy table's deletion vectors —
    and the reader (which always handled foreign runs) round-trips it."""
    big = list(range(4097))
    buf = serialize_roaring32(big)
    (cookie32,) = struct.unpack_from("<I", buf, 0)
    assert cookie32 & 0xFFFF == SERIAL_COOKIE
    assert len(buf) < 64  # 1 run vs 8 KiB bitset
    vals, used = deserialize_roaring32(buf)
    assert used == len(buf) and vals == big
    # mixed stream: one run container + one sparse array container
    mixed = list(range(1000)) + [(5 << 16) | 3, (5 << 16) | 900]
    buf2 = serialize_roaring32(mixed)
    (c2,) = struct.unpack_from("<I", buf2, 0)
    assert c2 & 0xFFFF == SERIAL_COOKIE
    v2, u2 = deserialize_roaring32(buf2)
    assert u2 == len(buf2) and v2 == sorted(mixed)
    # offsets section appears from NO_OFFSET_THRESHOLD containers up
    wide = [k << 16 for k in range(6)]  # 6 containers, all 1-value arrays
    v3, u3 = deserialize_roaring32(serialize_roaring32(wide))
    assert v3 == wide


def test_roaring32_reads_run_containers():
    # hand-build a SERIAL_COOKIE (12347) stream with one run container
    # covering 5..9 plus one array container in key 2: readers must accept
    # foreign-written run flavors even though we never write them
    size = 2
    buf = bytearray()
    buf += struct.pack("<I", SERIAL_COOKIE | ((size - 1) << 16))
    buf += bytes([0b01])  # container 0 is a run, container 1 is not
    buf += struct.pack("<HH", 0, 5 - 1)  # key 0, card 5
    buf += struct.pack("<HH", 2, 2 - 1)  # key 2, card 2
    # size < NO_OFFSET_THRESHOLD → no offsets section
    buf += struct.pack("<H", 1)  # one run
    buf += struct.pack("<HH", 5, 4)  # 5..9
    buf += struct.pack("<HH", 7, 9)  # array payload for key 2
    vals, used = deserialize_roaring32(bytes(buf))
    assert used == len(buf)
    assert vals == [5, 6, 7, 8, 9, (2 << 16) | 7, (2 << 16) | 9]


def test_rba_magic_and_keys():
    vals = [3, (1 << 32) | 7, (1 << 32) | 9, (5 << 32)]
    buf = serialize_rba(vals)
    magic, n = struct.unpack_from("<iQ", buf, 0)
    assert magic == RBA_MAGIC
    assert n == 3  # keys 0, 1, 5
    assert deserialize_rba(buf) == sorted(vals)


def test_rba_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        deserialize_rba(struct.pack("<iQ", 123, 0))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40)), min_size=0, max_size=300
    )
)
def test_rba_roundtrip_property(vals):
    assert deserialize_rba(serialize_rba(vals)) == sorted(set(vals))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=0xFFFFFFFF), min_size=0, max_size=200
    )
)
def test_roaring32_roundtrip_property(vals):
    assert _rt32(vals) == sorted(set(vals))


def test_dv_file_layout_and_integrity(tmp_path):
    p = os.path.join(str(tmp_path), "x.dv.bin")
    b1 = serialize_rba([1, 2, 3])
    b2 = serialize_rba([10**12])
    spans = write_dv_file(p, [b1, b2])
    raw = open(p, "rb").read()
    assert raw[0:1] == b"\x01"  # format version byte
    (o1, s1), (o2, s2) = spans
    assert o1 == 1 and s1 == len(b1)
    assert struct.unpack_from(">i", raw, o1)[0] == s1  # big-endian size
    assert read_dv_blob(p, o1, s1) == b1
    assert read_dv_blob(p, o2, s2) == b2
    assert deserialize_rba(read_dv_blob(p, o2, s2)) == [10**12]
    # corruption is detected by the CRC trailer
    mut = bytearray(raw)
    mut[o1 + 4] ^= 0xFF
    open(p, "wb").write(bytes(mut))
    with pytest.raises(ValueError, match="checksum"):
        read_dv_blob(p, o1, s1)


def test_dv_crc_trailer_is_full_32_bits(tmp_path):
    """The CRC trailer must be the raw 4-byte CRC-32 (delta-spark writes
    crc.getValue.toInt) — masking to 31 bits would reject ~half of all
    real-engine blobs. Find a blob whose CRC has the top bit set and assert
    its trailer round-trips bit-exactly."""
    import zlib

    blob = None
    for i in range(512):
        cand = serialize_rba([i, i + 7, (i + 1) * 1000])
        if zlib.crc32(cand) & 0x80000000:
            blob = cand
            break
    assert blob is not None, "no high-bit CRC among candidates (unexpected)"
    p = os.path.join(str(tmp_path), "hi.dv.bin")
    ((off, size),) = write_dv_file(p, [blob])
    raw = open(p, "rb").read()
    stored = struct.unpack_from(">I", raw, off + 4 + size)[0]
    assert stored == zlib.crc32(blob) & 0xFFFFFFFF
    assert stored & 0x80000000  # genuinely exercises the top bit
    assert read_dv_blob(p, off, size) == blob


def test_dv_descriptor_flavors_pure(tmp_path):
    """Descriptor-level resolution (r6): the three storage flavors resolve
    to the same bitmap bytes — "i" decodes Base85 (RFC 1924, Python b85)
    and verifies sizeInBytes; "u" reconstructs
    <root>/<prefix>/deletion_vector_<uuid>.bin from the trailing 20-char
    Base85 UUID; "p" reads the framed span. Unknown flavors refuse loudly."""
    import base64
    import uuid as _uuid

    import pytest as _pytest

    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.roaring import (
        decode_dv_inline,
        dv_path_from_u,
        encode_dv_inline,
        read_dv_descriptor,
        serialize_rba,
        write_dv_file,
    )

    blob = serialize_rba([2, 3, 5, 70000])
    # inline
    text = encode_dv_inline(blob)
    assert decode_dv_inline(text, len(blob)) == blob
    d_i = {"storageType": "i", "pathOrInlineDv": text, "sizeInBytes": len(blob)}
    assert read_dv_descriptor(d_i) == blob
    with _pytest.raises(ValueError, match="size mismatch"):
        read_dv_descriptor({**d_i, "sizeInBytes": len(blob) + 1})
    # u (with and without prefix)
    u = _uuid.uuid4()
    enc = base64.b85encode(u.bytes).decode("ascii")
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "pfx"), exist_ok=True)
    for prefix in ("", "pfx/"):
        p = dv_path_from_u(prefix + enc, root)
        assert p.endswith(f"deletion_vector_{u}.bin")
        ((off, size),) = write_dv_file(p, [blob])
        d_u = {
            "storageType": "u",
            "pathOrInlineDv": prefix + enc,
            "offset": off,
            "sizeInBytes": size,
        }
        assert read_dv_descriptor(d_u, root) == blob
    # p
    pp = os.path.join(root, "abs.bin")
    ((off, size),) = write_dv_file(pp, [blob])
    d_p = {"storageType": "p", "pathOrInlineDv": pp, "offset": off, "sizeInBytes": size}
    assert read_dv_descriptor(d_p) == blob
    # unknown flavor refuses
    with _pytest.raises(NotImplementedError, match="storageType"):
        read_dv_descriptor({"storageType": "x", "pathOrInlineDv": "?", "sizeInBytes": 0})
    # malformed u paths refuse
    with _pytest.raises(ValueError):
        dv_path_from_u("short", root)
