"""From-scratch LZ4 + xxHash32 (plans/lz4.py): published test vectors,
hypothesis round-trips, HAND-CRAFTED foreign streams (so the decoder is
exercised independently of our own compressor), and the Puffin
LZ4-compressed-footer round-trip that motivated the module (r7 — was a
loud refusal)."""

import os
import struct

import pytest
from hypothesis import given, settings, strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.lz4 import (
    LZ4F_MAGIC,
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)


def test_xxh32_published_vectors():
    # vectors from the xxHash repository's test suite
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"", seed=1) == 0x0B2CB792


def test_block_handcrafted_foreign_stream():
    """Decode a block we built BY HAND from the spec (never touched our
    compressor): one literal 'A', then an offset-1 match of length 99
    (overlap run-length fill), then a literals-only tail."""
    # token: lit=1, match token 15 (so extended); literals 'A';
    # offset 0x0001; match extension byte 80 (15+80+4 = 99)
    seq1 = bytes([0x1F]) + b"A" + struct.pack("<H", 1) + bytes([80])
    tail = b"END_TAIL"  # last sequence: literals only
    seq2 = bytes([len(tail) << 4]) + tail
    assert lz4_block_decompress(seq1 + seq2) == b"A" * 100 + tail


def test_block_malformed_inputs_fail_loudly():
    with pytest.raises(ValueError, match="offset 0"):
        lz4_block_decompress(bytes([0x10]) + b"A" + struct.pack("<H", 0))
    with pytest.raises(ValueError, match="before block start"):
        lz4_block_decompress(bytes([0x10]) + b"A" + struct.pack("<H", 9))
    with pytest.raises(ValueError, match="truncated"):
        lz4_block_decompress(bytes([0xF0, 255]))


@settings(max_examples=60, deadline=None)
@given(
    data=st.one_of(
        st.binary(max_size=400),
        # highly repetitive inputs exercise deep matches + overlaps
        st.builds(
            lambda chunk, reps, tail: chunk * reps + tail,
            st.binary(min_size=1, max_size=8),
            st.integers(1, 64),
            st.binary(max_size=8),
        ),
    )
)
def test_block_roundtrip(data):
    assert lz4_block_decompress(lz4_block_compress(data)) == data


@settings(max_examples=40, deadline=None)
@given(data=st.binary(max_size=600))
def test_frame_roundtrip(data):
    assert lz4_frame_decompress(lz4_frame_compress(data)) == data


def test_frame_handcrafted_with_all_checksums():
    """A foreign frame using features our writer never emits: block
    checksums AND a content checksum (FLG 0x7C) — the decoder must verify
    all of them, and catch corruption in each."""
    payload = b"spark-graft " * 20
    block = lz4_block_compress(payload)
    desc = bytes([0x7C, 0x40]) + struct.pack("<Q", len(payload))
    frame = (
        struct.pack("<I", LZ4F_MAGIC)
        + desc
        + bytes([(xxh32(desc) >> 8) & 0xFF])
        + struct.pack("<I", len(block))
        + block
        + struct.pack("<I", xxh32(block))
        + struct.pack("<I", 0)
        + struct.pack("<I", xxh32(payload))
    )
    assert lz4_frame_decompress(frame) == payload
    bad = bytearray(frame)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="content checksum"):
        lz4_frame_decompress(bytes(bad))
    bad2 = bytearray(frame)
    bad2[20] ^= 0xFF  # inside the block → block checksum catches it
    with pytest.raises(ValueError, match="checksum"):
        lz4_frame_decompress(bytes(bad2))


def test_frame_header_checksum_and_magic():
    frame = bytearray(lz4_frame_compress(b"hello world, hello world"))
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"XXXX" + bytes(frame[4:]))
    frame[5] ^= 0x01  # corrupt BD byte → header checksum mismatch
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(frame))


def test_puffin_lz4_footer_roundtrip(tmp_path):
    """The motivating case: a Puffin file whose footer payload is an LZ4
    frame (flag bit 0) reads back identically to an uncompressed one —
    blob metadata, properties, and DV positions all intact."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.puffin import (
        DV_BLOB_TYPE,
        dv_blob_data,
        read_dv_positions,
        read_puffin_footer,
        write_puffin,
    )

    positions = [0, 5, 6, 7, 100_000, 2**33]
    blobs = [
        {
            "type": DV_BLOB_TYPE,
            "data": dv_blob_data(positions),
            "fields": [2147483546],
            "snapshot-id": 42,
            "sequence-number": 7,
            "properties": {"referenced-data-file": "data/f1.parquet"},
        }
    ]
    plain = os.path.join(str(tmp_path), "plain.puffin")
    lz = os.path.join(str(tmp_path), "lz.puffin")
    m_plain = write_puffin(plain, blobs, properties={"created-by": "t"})
    m_lz = write_puffin(lz, blobs, properties={"created-by": "t"}, compress_footer=True)
    assert m_plain == m_lz  # blob spans identical (same body bytes)
    ft_plain, ft_lz = read_puffin_footer(plain), read_puffin_footer(lz)
    assert ft_plain == ft_lz
    b = ft_lz["blobs"][0]
    assert read_dv_positions(lz, b["offset"], b["length"]) == sorted(positions)
    # the compressed file is recognizably flagged
    raw = open(lz, "rb").read()
    assert raw[-8] & 0x01
