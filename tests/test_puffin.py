"""Puffin file format + Iceberg v3 deletion-vector blobs (plans/puffin.py):
pure-bytes round-trips, spec framing checks, and corruption refusals."""

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.puffin import (
    DV_BLOB_TYPE,
    MAGIC,
    dv_blob_data,
    parse_dv_blob_data,
    read_dv_positions,
    read_puffin_blob,
    read_puffin_footer,
    write_puffin,
)


def test_dv_blob_roundtrip_and_magic_identity():
    """The blob's 4 magic bytes D1 D3 39 64 must equal Delta's RBA magic
    little-endian — the identity that lets both formats share one Roaring
    implementation."""
    import struct

    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.roaring import (
        RBA_MAGIC,
    )

    vals = [0, 1, 65535, 65536, (7 << 32) + 3]
    data = dv_blob_data(vals)
    assert data[4:8] == struct.pack("<i", RBA_MAGIC) == bytes.fromhex("d1d33964")
    assert parse_dv_blob_data(data) == sorted(vals)


def test_dv_blob_corruption_refusals():
    data = bytearray(dv_blob_data([1, 2, 3]))
    flipped = bytearray(data)
    flipped[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_dv_blob_data(bytes(flipped))
    with pytest.raises(ValueError, match="length"):
        parse_dv_blob_data(bytes(data) + b"x")
    with pytest.raises(ValueError, match="short"):
        parse_dv_blob_data(b"\x00\x00")


def test_puffin_file_roundtrip_and_framing(tmp_path):
    p = os.path.join(str(tmp_path), "f.puffin")
    b1 = dv_blob_data([1, 4])
    b2 = dv_blob_data([0, 9, 100])
    metas = write_puffin(
        p,
        [
            {"type": DV_BLOB_TYPE, "data": b1,
             "properties": {"referenced-data-file": "/d/a.parquet"}},
            {"type": DV_BLOB_TYPE, "data": b2, "snapshot-id": 5,
             "sequence-number": 2},
        ],
        properties={"created-by": "spark-graft"},
    )
    assert metas[0]["offset"] == 4 and metas[1]["offset"] == 4 + len(b1)
    ft = read_puffin_footer(p)
    assert ft["properties"]["created-by"] == "spark-graft"
    assert [b["type"] for b in ft["blobs"]] == [DV_BLOB_TYPE] * 2
    assert read_dv_positions(p, metas[0]["offset"], metas[0]["length"]) == [1, 4]
    assert read_dv_positions(p, metas[1]["offset"], metas[1]["length"]) == [0, 9, 100]
    raw = open(p, "rb").read()
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    assert raw.count(MAGIC) >= 3  # leading + footer-start + trailing


def test_puffin_refusals(tmp_path):
    p = os.path.join(str(tmp_path), "bad.puffin")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 20)
    with pytest.raises(ValueError, match="magic"):
        read_puffin_footer(p)
    # r7: the LZ4 footer flag is IMPLEMENTED — a flag bit set without the
    # payload actually being a frame must fail loudly as a bad frame...
    good = os.path.join(str(tmp_path), "good.puffin")
    write_puffin(good, [{"type": DV_BLOB_TYPE, "data": dv_blob_data([1])}])
    raw = bytearray(open(good, "rb").read())
    raw[-8] |= 0x01  # claim footer compression over a JSON payload
    lz = os.path.join(str(tmp_path), "lz.puffin")
    open(lz, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="LZ4 frame"):
        read_puffin_footer(lz)
    # ...and UNKNOWN flag bits still refuse loudly
    raw2 = bytearray(open(good, "rb").read())
    raw2[-8] |= 0x02
    unk = os.path.join(str(tmp_path), "unk.puffin")
    open(unk, "wb").write(bytes(raw2))
    with pytest.raises(NotImplementedError, match="flags"):
        read_puffin_footer(unk)
    # truncated blob span
    with pytest.raises(ValueError, match="truncated"):
        read_puffin_blob(good, 4, 10_000)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, (1 << 40)), min_size=0, max_size=200))
def test_dv_blob_roundtrip_property(vals):
    assert parse_dv_blob_data(dv_blob_data(vals)) == sorted(set(vals))
