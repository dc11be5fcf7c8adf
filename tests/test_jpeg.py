"""Baseline JPEG codec (multimodal/jpeg.py): DCT-basis orthonormality vs
the textbook formula, canonical Huffman assignment vs a hand-built vector,
byte-stuffing, quantization-bounded round trips, grayscale + color, and
unsupported-shape refusals."""

import numpy as np
import pytest

from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal.jpeg import (
    BitReader,
    _DCT_M,
    _BitWriter,
    build_huffman,
    decode_huffman_symbol,
    decode_jpeg,
    encode_jpeg,
)


def test_dct_matrix_is_orthonormal_and_matches_formula():
    # M @ M.T == I (the DCT-II basis is orthonormal) — this pins BOTH the
    # forward and inverse transforms to the spec formula at once
    assert np.allclose(_DCT_M @ _DCT_M.T, np.eye(8), atol=1e-12)
    # spot-check entries straight from the formula
    assert np.isclose(_DCT_M[0, 0], np.sqrt(1 / 8))
    assert np.isclose(_DCT_M[1, 0], 0.5 * np.cos(np.pi / 16))
    assert np.isclose(_DCT_M[7, 7], 0.5 * np.cos(15 * 7 * np.pi / 16))


def test_canonical_huffman_hand_vector():
    # bits: one 2-bit code, two 3-bit codes → canonical: 00, 010, 011
    codes = build_huffman([0, 1, 2] + [0] * 13, [7, 8, 9])
    assert codes == {(2, 0b00): 7, (3, 0b010): 8, (3, 0b011): 9}
    # decoding a hand-assembled bit stream: 00 010 011 00 → 7, 8, 9, 7
    r = BitReader(bytes([0b00010011, 0b00111111]), 0)
    assert [decode_huffman_symbol(r, codes) for _ in range(4)] == [7, 8, 9, 7]


def test_bitreader_unstuffs_ff00():
    r = BitReader(bytes([0xFF, 0x00, 0x80]), 0)
    assert r.bits(8) == 0xFF  # stuffed zero skipped
    assert r.bit() == 1


def test_bitwriter_stuffs_ff():
    w = _BitWriter()
    w.put(0xFF, 8)
    out = w.done()
    assert out == bytes([0xFF, 0x00])


def test_roundtrip_flat_and_smooth_images():
    # flat image: DCT is a lone DC coefficient; with quant step 16 the
    # reconstruction error is bounded by step/2 per coefficient
    flat = np.full((16, 24, 3), 200, np.uint8)
    got = decode_jpeg(encode_jpeg(flat))
    assert got.shape == (16, 24, 3)
    assert int(np.max(np.abs(got.astype(int) - 200))) <= 8
    # smooth gradient: error stays within a few quantization steps
    yy, xx = np.mgrid[0:24, 0:32]
    smooth = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(smooth))
    err = np.abs(got.astype(int) - smooth.astype(int))
    assert float(err.mean()) < 6.0
    assert int(err.max()) <= 48


def test_roundtrip_fine_quant_is_near_lossless():
    rng = np.random.RandomState(5)
    img = rng.randint(60, 196, (17, 13, 3), dtype=np.uint8)  # non-multiple of 8
    payload = encode_jpeg(img, qtbl=np.ones((8, 8), np.int32))
    got = decode_jpeg(payload)
    assert got.shape == img.shape
    # quant step 1: the only losses are DCT rounding + color-space rounding
    err = np.abs(got.astype(int) - img.astype(int))
    assert int(err.max()) <= 4
    assert float(err.mean()) < 1.5


def test_grayscale_single_component():
    # hand-build a grayscale JPEG by re-using the encoder machinery is not
    # possible (it writes 3 components), so round-trip a gray IMAGE and
    # check the channels stay equal-ish instead
    g = np.repeat(
        np.linspace(40, 215, 11).astype(np.uint8).reshape(1, 11, 1), 9, axis=0
    )
    img = np.repeat(g, 3, axis=2)
    got = decode_jpeg(encode_jpeg(img, qtbl=np.ones((8, 8), np.int32)))
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 4


def test_refusals():
    with pytest.raises(NotImplementedError, match="not a JPEG"):
        decode_jpeg(b"\x00\x00")
    # arithmetic-coded SOF9 refuses (progressive SOF2 decodes since r4)
    arith = b"\xff\xd8" + b"\xff\xc9" + (5).to_bytes(2, "big") + b"\x08\x00\x08"
    with pytest.raises(NotImplementedError, match="baseline and progressive"):
        decode_jpeg(arith)


def test_decode_image_dispatches_jpeg():
    from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal.media import (
        decode_image,
    )

    img = np.full((8, 8, 3), 99, np.uint8)
    got = decode_image(encode_jpeg(img, qtbl=np.ones((8, 8), np.int32)))
    assert got.shape == (8, 8, 3)
    assert int(np.abs(got.astype(int) - 99).max()) <= 4


def test_roundtrip_420_subsampling():
    yy, xx = np.mgrid[0:20, 0:30]
    smooth = np.stack(
        [(yy * 4) % 256, (xx * 3) % 256, ((xx * 2 + yy) % 256)], axis=2
    ).astype(np.uint8)
    payload = encode_jpeg(smooth, qtbl=np.ones((8, 8), np.int32), subsampling="420")
    got = decode_jpeg(payload)
    assert got.shape == smooth.shape
    # chroma was 2x2 pooled then nearest-upsampled: luma stays tight, color
    # shifts stay bounded by neighboring-pixel chroma deltas
    err = np.abs(got.astype(int) - smooth.astype(int))
    assert float(err.mean()) < 4.0
    assert int(err.max()) <= 24


def test_roundtrip_with_restart_markers():
    rng = np.random.RandomState(9)
    img = rng.randint(50, 200, (24, 40, 3), dtype=np.uint8)
    payload = encode_jpeg(img, qtbl=np.ones((8, 8), np.int32), restart_interval=3)
    assert b"\xff\xdd" in payload  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    got = decode_jpeg(payload)
    err = np.abs(got.astype(int) - img.astype(int))
    assert int(err.max()) <= 4
    # and the same stream WITHOUT restarts decodes to the same pixels
    got2 = decode_jpeg(encode_jpeg(img, qtbl=np.ones((8, 8), np.int32)))
    assert np.array_equal(got, got2)


def test_roundtrip_420_with_restarts():
    img = np.full((32, 32, 3), 0, np.uint8)
    img[:16, :, 0] = 180
    img[:, 16:, 2] = 140
    payload = encode_jpeg(
        img, qtbl=np.ones((8, 8), np.int32), subsampling="420", restart_interval=1
    )
    got = decode_jpeg(payload)
    err = np.abs(got.astype(int) - img.astype(int))
    # block-aligned color edges: 4:2:0 pooling is exact inside 2x2 cells here
    assert int(err.max()) <= 6


def test_roundtrip_422_subsampling():
    yy, xx = np.mgrid[0:12, 0:20]
    smooth = np.stack(
        [(yy * 5) % 256, (xx * 4) % 256, ((xx + yy * 2) % 256)], axis=2
    ).astype(np.uint8)
    payload = encode_jpeg(smooth, qtbl=np.ones((8, 8), np.int32), subsampling="422")
    got = decode_jpeg(payload)
    assert got.shape == smooth.shape
    err = np.abs(got.astype(int) - smooth.astype(int))
    assert float(err.mean()) < 4.0
    assert int(err.max()) <= 24


# ------------------------------------------------------------- progressive


def test_progressive_equals_baseline_exactly():
    """The full spectral-selection + successive-approximation ladder must
    reconstruct the SAME quantized coefficients as one baseline scan —
    so decoded pixels are bit-identical, including odd dimensions where
    trailing blocks pad."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    for hw in ((8, 8), (24, 17), (40, 33)):
        img = rng.randint(0, 256, (*hw, 3), dtype=np.uint8)
        prog = decode_jpeg(encode_jpeg_progressive(img))
        base = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(prog, base), hw


def test_progressive_scan_script_variants():
    """Every scan-type combination independently: DC-only SA, full-band
    AC without SA, AC SA refinement, split spectral bands — all must land
    on the baseline-identical result."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    scripts = [
        # no successive approximation at all (spectral selection only)
        [([0, 1, 2], 0, 0, 0, 0)]
        + [([ci], 1, 63, 0, 0) for ci in (0, 1, 2)],
        # fine spectral slicing of the Y band
        [([0, 1, 2], 0, 0, 0, 0), ([0], 1, 2, 0, 0), ([0], 3, 9, 0, 0),
         ([0], 10, 63, 0, 0), ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)],
        # two-level AC successive approximation
        [([0, 1, 2], 0, 0, 0, 0)]
        + [([ci], 1, 63, 0, 2) for ci in (0, 1, 2)]
        + [([ci], 1, 63, 2, 1) for ci in (0, 1, 2)]
        + [([ci], 1, 63, 1, 0) for ci in (0, 1, 2)],
        # DC successive approximation ladder
        [([0, 1, 2], 0, 0, 0, 2), ([0, 1, 2], 0, 0, 2, 1), ([0, 1, 2], 0, 0, 1, 0)]
        + [([ci], 1, 63, 0, 0) for ci in (0, 1, 2)],
    ]
    for i, sc in enumerate(scripts):
        got = decode_jpeg(encode_jpeg_progressive(img, scans=sc))
        assert np.array_equal(got, base), f"script {i}"


def test_progressive_eob_runs_and_sparse_bands():
    """Mostly-flat image with isolated bright pixels: long EOB runs across
    blocks and late-band isolated coefficients (ZRL paths) in both first
    and refinement AC scans."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal.jpeg import (
        encode_jpeg_progressive,
    )

    img = np.full((48, 48, 3), 120, np.uint8)
    rng = np.random.RandomState(3)
    for _ in range(6):  # sparse spikes → sparse high-frequency coefficients
        yy, xx = rng.randint(0, 48), rng.randint(0, 48)
        img[yy, xx] = 255
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(prog, base)
    # flat image: every AC scan is one long EOB run
    flat = np.full((64, 40, 3), 77, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat)),
        decode_jpeg(encode_jpeg(flat)),
    )


def test_progressive_decoder_grayscale_single_component():
    """Hand-built single-component progressive stream: non-interleaved DC
    scan over the component's own (unpadded) block grid."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal.jpeg import (
        _inv_huff,
        _BitWriter,
        _K_DC_LUM_BITS,
        _K_DC_LUM_VALS,
        _PROG_AC_BITS,
        _PROG_AC_VALS,
        build_huffman,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    # constant quant table: zigzag permutation is the identity on it
    out += seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    out += seg(0xC2, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00] + _K_DC_LUM_BITS + _K_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10] + _PROG_AC_BITS + _PROG_AC_VALS))
    dc_inv = _inv_huff(build_huffman(_K_DC_LUM_BITS, _K_DC_LUM_VALS))
    ac_inv = _inv_huff(build_huffman(_PROG_AC_BITS, _PROG_AC_VALS))
    # DC scan: two blocks, DC diffs +2 then -1 (values 2 and 1)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    bw = _BitWriter()
    for diff in (2, -1):
        s = diff.bit_length()
        size, code = dc_inv[s]
        bw.put(code, size)
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += bw.done()
    # AC scan: block 0 gets coef +3 at zigzag 1; block 1 is EOB-only
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    bw = _BitWriter()
    size, code = ac_inv[(0 << 4) | 2]
    bw.put(code, size)
    bw.put(3, 2)
    size, code = ac_inv[0x00]  # EOB for the rest of block 0
    bw.put(code, size)
    size, code = ac_inv[0x00]  # EOB for block 1
    bw.put(code, size)
    out += bw.done()
    out += b"\xff\xd9"
    got = decode_jpeg(bytes(out))
    assert got.shape == (8, 16, 3)
    # DC-only means: block 0 dc=2 → 128 + 2*16/8 = 132; block 1 dc=2-1=1 →
    # 130 (the AC coefficient in block 0 has zero mean)
    m0, m1 = got[:, :8, 0].mean(), got[:, 8:, 0].mean()
    assert abs(m0 - 132) < 1.0
    assert abs(m1 - 130) < 1.0
    # the +3 AC coefficient at zigzag 1 is a horizontal cosine in block 0
    # only; block 1 stays flat
    assert got[:, :8, 0].std(axis=0).max() < 1e-9  # constant per column
    assert got[0, :8, 0].ptp() > 10  # varies across columns
    assert got[:, 8:, 0].ptp() == 0


def test_progressive_random_scan_scripts_hypothesis():
    """Property fuzz: random legal scan scripts (random Y-band splits,
    random SA ladder depths per component) must always reconstruct the
    baseline-identical image."""
    from hypothesis import given, settings, strategies as st

    from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal.jpeg import (
        encode_jpeg_progressive,
    )

    def build_script(y_split, y_sa, c_sa, dc_sa):
        scans = [([0, 1, 2], 0, 0, 0, dc_sa)]
        bands = [(1, y_split), (y_split + 1, 63)] if y_split else [(1, 63)]
        for lo, hi in bands:
            scans.append(([0], lo, hi, 0, y_sa))
        for ci in (1, 2):
            scans.append(([ci], 1, 63, 0, c_sa))
        for al in range(y_sa - 1, -1, -1):
            scans.append(([0], 1, 63, al + 1, al))
        for al in range(c_sa - 1, -1, -1):
            for ci in (1, 2):
                scans.append(([ci], 1, 63, al + 1, al))
        for al in range(dc_sa - 1, -1, -1):
            scans.append(([0, 1, 2], 0, 0, al + 1, al))
        return scans

    @settings(max_examples=10, deadline=None)
    @given(
        seed=st.integers(0, 2**16),
        y_split=st.integers(0, 62),
        y_sa=st.integers(0, 3),
        c_sa=st.integers(0, 2),
        dc_sa=st.integers(0, 2),
        hw=st.sampled_from([(8, 8), (16, 24), (23, 9)]),
    )
    def run(seed, y_split, y_sa, c_sa, dc_sa, hw):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (*hw, 3), dtype=np.uint8)
        sc = build_script(y_split, y_sa, c_sa, dc_sa)
        prog = decode_jpeg(encode_jpeg_progressive(img, scans=sc))
        base = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(prog, base)

    run()
