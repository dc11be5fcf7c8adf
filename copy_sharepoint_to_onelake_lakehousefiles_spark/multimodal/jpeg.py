"""JPEG codec from the PUBLIC ITU-T T.81 spec — no codec libs.

Decoder scope: baseline sequential DCT (SOF0/1) and PROGRESSIVE DCT
(SOF2, Annex G: spectral selection + successive approximation, DC and AC
first/refinement scans, EOB runs), 8-bit, grayscale or YCbCr with 4:4:4 /
4:2:2 / 4:2:0 sampling, restart markers (baseline), byte stuffing.
Arithmetic coding raises NotImplementedError (callers fall back to the
deterministic stub in ``media.py``).

Encoder scope (the decoder's test partner and a real writer): baseline
4:4:4/4:2:2/4:2:0 with the spec's Annex-K example Huffman tables, plus a
progressive encoder (``encode_jpeg_progressive``) with an arbitrary scan
script, defaulting to libjpeg's spectral+SA ladder.

Correctness anchors (tests/test_jpeg.py): the DCT basis matrix is checked
orthonormal against the textbook formula; Huffman decoding is checked
against a hand-assembled bit vector; byte-stuffing and restart handling
have explicit vectors; encode→decode round-trips bound the per-pixel error
by the quantization step. (Reference analogue: opaque blob handling,
NB:293-300; this serves SURVEY §2.2's multimodal row.)
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_matrix() -> np.ndarray:
    """The 8x8 DCT-II basis (T.81 A.3.3): M[u, x] = c(u)/2 *
    cos((2x+1)u*pi/16); forward DCT = M @ f @ M.T, inverse = M.T @ F @ M."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()

# Annex K.3 example Huffman tables (the public spec's own tables)
_K_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_LUM_VALS = list(range(12))
_K_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_K_DC_CHR_VALS = list(range(12))
_K_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_K_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_K_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman code table per T.81 C.2: (bit-length, code) →
    symbol."""
    codes: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            codes[(size, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return codes


class BitReader:
    """MSB-first entropy-coded-segment reader with 0xFF00 unstuffing; stops
    cleanly at markers (0xFF followed by non-zero)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                raise NotImplementedError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_restart(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (T.81 restart interval)."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            got = self.data[self.pos + 1] - 0xD0
            if got != n % 8:
                raise NotImplementedError(f"restart marker out of order: {got}")
            self.pos += 2
        else:
            raise NotImplementedError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


def decode_huffman_symbol(r: BitReader, codes: dict[tuple[int, int], int]) -> int:
    code = 0
    for size in range(1, 17):
        code = (code << 1) | r.bit()
        if (size, code) in codes:
            return codes[(size, code)]
    raise NotImplementedError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """JPEG → (H, W, 3) uint8 RGB (grayscale replicates). Baseline
    sequential (SOF0/1) decodes scan-fused; progressive (SOF2) accumulates
    quantized coefficients across spectral-selection / successive-
    approximation scans (T.81 Annex G) and runs one IDCT at EOI."""
    if content[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] | None = None  # progressive coefficient state
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(content[pos : pos + 2], "big")
        seg = content[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = build_huffman(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            # T.81's ARITHMETIC coding option (SOF9-11/13-15) stays a
            # deliberate refusal: its QM-coder needs Table D.3's 113-row
            # Qe/NMPS/NLPS/SWITCH state machine VERBATIM — the constants
            # are spec data, not derivable, and no copy of them (library
            # or document) exists in this offline container to implement
            # from or verify against. A from-memory table would decode
            # silently wrong; loud refusal beats that.
            raise NotImplementedError(
                "arithmetic-coded JPEG (SOF9-15): T.81 Table D.3 state"
                " machine unavailable offline — Huffman baseline and"
                " progressive are fully supported"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("only baseline and progressive DCT supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise NotImplementedError("SOS before SOF")
            ns = seg[0]
            if not frame["progressive"]:
                sel = {}
                for i in range(ns):
                    cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                    sel[cs] = (tdta >> 4, tdta & 0x0F)
                return _decode_scan(
                    content, pos + ln, frame, sel, qt, huff_dc, huff_ac, restart_interval
                )
            if restart_interval:
                raise NotImplementedError("restart markers in progressive scans")
            if coefs is None:
                coefs = _alloc_prog_coefs(frame)
            scomps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(
                    j for j, c in enumerate(frame["comps"]) if c["id"] == cs
                )
                scomps.append((ci, tdta >> 4, tdta & 0x0F))
            ss_, se_ = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                content, pos + ln, frame, scomps, ss_, se_,
                ahal >> 4, ahal & 0x0F, huff_dc, huff_ac, coefs,
            )
            continue
        pos += ln
    if coefs is not None:
        return _finalize_progressive(frame, coefs, qt)
    raise NotImplementedError("JPEG has no scan")


def _decode_scan(data, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), np.float64))
    r = BitReader(data, pos)
    dc_pred = [0] * len(comps)
    n_restarts = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_and_expect_restart(n_restarts)
                n_restarts += 1
                dc_pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(
                            r, huff_dc[dct], huff_ac[act], qt[c["tq"]], dc_pred, ci
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    return _planes_to_rgb(comps, planes, w, h, hmax, vmax)


def _planes_to_rgb(comps, planes, w, h, hmax, vmax):
    """Shared tail of both decode paths: chroma upsampling, level shift,
    YCbCr→RGB (or grayscale replication)."""
    out_planes = []
    for c, p in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(out_planes[0] + 128, 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = (p + 128 for p in out_planes)
    cb, cr = cb - 128, cr - 128
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(r, dc_codes, ac_codes, qtbl, dc_pred, ci):
    coef = np.zeros(64, np.float64)
    t = decode_huffman_symbol(r, dc_codes)
    diff = _extend(r.bits(t), t) if t else 0
    dc_pred[ci] += diff
    coef[0] = dc_pred[ci]
    k = 1
    while k < 64:
        rs = decode_huffman_symbol(r, ac_codes)
        rr, ss = rs >> 4, rs & 0x0F
        if ss == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise NotImplementedError("AC run past block end")
        coef[k] = _extend(r.bits(ss), ss)
        k += 1
    block = np.zeros(64, np.float64)
    block[ZIGZAG] = coef * qtbl.reshape(64)[ZIGZAG]
    return _DCT_M.T @ block.reshape(8, 8) @ _DCT_M


# ---------------------------------------------------- progressive decoding


def _frame_geom(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, w, h, mcux, mcuy


def _alloc_prog_coefs(frame) -> list[np.ndarray]:
    """Per-component quantized-coefficient store, (block_y, block_x, 64)
    int32 in ZIGZAG order, padded to MCU multiples (interleaved DC scans
    address the padded grid; single-component scans stay inside the
    component's own ceil-grid)."""
    hmax, vmax, _w, _h, mcux, mcuy = _frame_geom(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        for c in frame["comps"]
    ]


def _comp_block_grid(frame, c) -> tuple[int, int]:
    """Non-interleaved block grid: ceil over the component's OWN scaled
    dimensions (T.81 A.2.2 — no MCU padding for Ns=1 scans)."""
    hmax, vmax, w, h, _mx, _my = _frame_geom(frame)
    cw = (w * c["h"] + hmax - 1) // hmax
    ch = (h * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_prog_scan(
    data, pos, frame, scomps, ss_, se_, ah, al, huff_dc, huff_ac, coefs
) -> int:
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    not), AC first/refine (single component, with EOB runs). Mutates
    ``coefs`` in place; returns the offset of the next marker."""
    comps = frame["comps"]
    r = BitReader(data, pos)
    if ss_ == 0:  # DC scan — Se must be 0
        if se_ != 0:
            raise NotImplementedError("DC scan with Se != 0")
        dc_pred = {ci: 0 for ci, _td, _ta in scomps}
        if len(scomps) > 1:
            _h, _v, _w, _hh, mcux, mcuy = _frame_geom(frame)
            order = [
                (ci, td, by_, bx_)
                for ci, td, _ta in scomps
                for by_ in range(comps[ci]["v"])
                for bx_ in range(comps[ci]["h"])
            ]
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, td, by_, bx_ in order:
                        c = comps[ci]
                        blk = coefs[ci][my * c["v"] + by_, mx * c["h"] + bx_]
                        _dc_step(r, huff_dc, td, blk, dc_pred, ci, ah, al)
        else:
            ci, td, _ta = scomps[0]
            by_n, bx_n = _comp_block_grid(frame, comps[ci])
            for byi in range(by_n):
                for bxi in range(bx_n):
                    _dc_step(r, huff_dc, td, coefs[ci][byi, bxi], dc_pred, ci, ah, al)
    else:  # AC scan — single component only (spec G.2 restriction)
        if len(scomps) != 1:
            raise NotImplementedError("interleaved AC scan in progressive JPEG")
        ci, _td, ta = scomps[0]
        codes = huff_ac[ta]
        by_n, bx_n = _comp_block_grid(frame, comps[ci])
        eobrun = 0
        for byi in range(by_n):
            for bxi in range(bx_n):
                blk = coefs[ci][byi, bxi]
                if ah == 0:
                    eobrun = _ac_first_block(r, codes, blk, ss_, se_, al, eobrun)
                else:
                    eobrun = _ac_refine_block(r, codes, blk, ss_, se_, al, eobrun)
    # skip to the next true marker (stuffed 0xFF00 bytes are entropy data)
    p = r.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p


def _dc_step(r, huff_dc, td, blk, dc_pred, ci, ah, al):
    if ah == 0:  # first DC scan: diff-coded magnitude, shifted up by Al
        t = decode_huffman_symbol(r, huff_dc[td])
        diff = _extend(r.bits(t), t) if t else 0
        dc_pred[ci] += diff
        blk[0] = dc_pred[ci] << al
    else:  # refinement: one raw bit appends to the two's-complement value
        if r.bit():
            blk[0] |= 1 << al
    return blk


def _ac_first_block(r, codes, blk, ss_, se_, al, eobrun):
    """AC first scan for one block (G.2.2): runs + EXTEND values shifted
    by Al, EOBn codes carrying a band-skip run across blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss_
    while k <= se_:
        rs = decode_huffman_symbol(r, codes)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << rr) - 1
            if rr:
                eobrun += r.bits(rr)
            break
        k += rr
        if k > se_:
            raise NotImplementedError("AC run past band end")
        blk[k] = _extend(r.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(r, codes, blk, ss_, se_, al, eobrun):
    """AC refinement scan for one block (G.2.3, the successive-
    approximation correction pass): newly-nonzero coefficients arrive as
    ±1<<Al after a run of zero-HISTORY positions; every nonzero-history
    position traversed emits one correction bit (append 1<<Al if set and
    not already present). Blocks inside an EOB run still emit correction
    bits for their whole band."""
    p1 = 1 << al
    k = ss_
    if eobrun == 0:
        while k <= se_:
            rs = decode_huffman_symbol(r, codes)
            rr, s = rs >> 4, rs & 0x0F
            if s == 0:
                if rr != 15:
                    eobrun = (1 << rr)
                    if rr:
                        eobrun += r.bits(rr)
                    break
                val = 0  # ZRL: 16 zero-history positions
            else:
                if s != 1:
                    raise NotImplementedError("refine scan with |coef| > 1")
                val = p1 if r.bit() else -p1
            while k <= se_:
                c = int(blk[k])
                if c != 0:
                    if r.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else -p1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se_:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se_:
            c = int(blk[k])
            if c != 0 and r.bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _finalize_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + de-zigzag + batched IDCT per component, then the shared
    upsample/color tail."""
    comps = frame["comps"]
    hmax, vmax, w, h, _mx, _my = _frame_geom(frame)
    qz = {tq: tbl.reshape(64)[ZIGZAG] for tq, tbl in qt.items()}
    planes = []
    for c, cz in zip(comps, coefs):
        by_n, bx_n, _ = cz.shape
        natural = np.zeros((by_n, bx_n, 64), np.float64)
        natural[:, :, ZIGZAG] = cz * qz[c["tq"]]
        blocks = natural.reshape(by_n, bx_n, 8, 8)
        idct = np.einsum("ru,ybrc,cv->ybuv", _DCT_M, blocks, _DCT_M)
        planes.append(idct.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8))
    return _planes_to_rgb(comps, planes, w, h, hmax, vmax)


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, size: int) -> None:
        for i in range(size - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 restart padding)."""
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (caller must be byte-aligned)."""
        self.out += b

    def done(self) -> bytes:
        self.align()
        return bytes(self.out)


def _inv_huff(codes: dict[tuple[int, int], int]) -> dict[int, tuple[int, int]]:
    return {sym: (size, code) for (size, code), sym in codes.items()}


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(w: _BitWriter, block, qtbl, dc_pred, ci, dc_inv, ac_inv):
    coefs = _DCT_M @ block @ _DCT_M.T
    q = np.round(coefs / qtbl).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - dc_pred[ci]
    dc_pred[ci] = int(zz[0])
    t = _mag_cat(diff)
    size, code = dc_inv[t]
    w.put(code, size)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            size, code = ac_inv[0xF0]  # ZRL
            w.put(code, size)
            run -= 16
        s = _mag_cat(v)
        size, code = ac_inv[(run << 4) | s]
        w.put(code, size)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        size, code = ac_inv[0x00]  # EOB
        w.put(code, size)


def encode_jpeg(
    img: np.ndarray,
    qtbl: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 → baseline JFIF bytes: YCbCr at 4:4:4 or 4:2:0
    (2x2-average chroma downsample), Annex-K Huffman tables, one quant
    table for all components (default: all-16s — mild, keeps round-trip
    error bounded by the step), optional DRI restart markers."""
    if subsampling not in ("444", "422", "420"):
        raise NotImplementedError(f"subsampling {subsampling}")
    if qtbl is None:
        qtbl = np.full((8, 8), 16, np.int32)
    qtbl = np.asarray(qtbl, np.int32)
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    r_, g_, b_ = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_ - 128
    cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
    dc_lum = _inv_huff(build_huffman(_K_DC_LUM_BITS, _K_DC_LUM_VALS))
    ac_lum = _inv_huff(build_huffman(_K_AC_LUM_BITS, _K_AC_LUM_VALS))
    dc_chr = _inv_huff(build_huffman(_K_DC_CHR_BITS, _K_DC_CHR_VALS))
    ac_chr = _inv_huff(build_huffman(_K_AC_CHR_BITS, _K_AC_CHR_VALS))
    bw = _BitWriter()
    dc_pred = [0, 0, 0]
    n_restarts = 0
    mcu_count = 0

    def _maybe_restart() -> None:
        nonlocal n_restarts, dc_pred
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            bw.align()
            bw.raw(bytes([0xFF, 0xD0 + (n_restarts % 8)]))
            n_restarts += 1
            dc_pred[:] = [0, 0, 0]

    if subsampling == "444":
        samp = [0x11, 0x11, 0x11]
        ph, pw = (h + 7) & ~7, (w + 7) & ~7
        planes = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in (y, cb, cr)
        ]
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                _maybe_restart()
                for ci, p in enumerate(planes):
                    _encode_block(
                        bw,
                        p[by : by + 8, bx : bx + 8],
                        qtbl,
                        dc_pred,
                        ci,
                        dc_lum if ci == 0 else dc_chr,
                        ac_lum if ci == 0 else ac_chr,
                    )
                mcu_count += 1
    elif subsampling == "422":
        samp = [0x21, 0x11, 0x11]
        ph, pw = (h + 7) & ~7, (w + 15) & ~15
        yp = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
        cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        # horizontal 2x mean-pool chroma
        cbd = cbp.reshape(ph, pw // 2, 2).mean(axis=2)
        crd = crp.reshape(ph, pw // 2, 2).mean(axis=2)
        for my in range(0, ph, 8):
            for mx in range(0, pw, 16):
                _maybe_restart()
                for bx in (0, 8):
                    _encode_block(
                        bw,
                        yp[my : my + 8, mx + bx : mx + bx + 8],
                        qtbl,
                        dc_pred,
                        0,
                        dc_lum,
                        ac_lum,
                    )
                cx = mx // 2
                _encode_block(
                    bw, cbd[my : my + 8, cx : cx + 8], qtbl, dc_pred, 1, dc_chr, ac_chr
                )
                _encode_block(
                    bw, crd[my : my + 8, cx : cx + 8], qtbl, dc_pred, 2, dc_chr, ac_chr
                )
                mcu_count += 1
    else:  # 4:2:0
        samp = [0x22, 0x11, 0x11]
        ph, pw = (h + 15) & ~15, (w + 15) & ~15
        yp = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
        cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        # 2x2 mean-pool chroma
        cbd = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crd = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                _maybe_restart()
                for by in (0, 8):
                    for bx in (0, 8):
                        _encode_block(
                            bw,
                            yp[my + by : my + by + 8, mx + bx : mx + bx + 8],
                            qtbl,
                            dc_pred,
                            0,
                            dc_lum,
                            ac_lum,
                        )
                cy, cx = my // 2, mx // 2
                _encode_block(
                    bw, cbd[cy : cy + 8, cx : cx + 8], qtbl, dc_pred, 1, dc_chr, ac_chr
                )
                _encode_block(
                    bw, crd[cy : cy + 8, cx : cx + 8], qtbl, dc_pred, 2, dc_chr, ac_chr
                )
                mcu_count += 1
    scan = bw.done()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = np.zeros(64, np.uint8)
    zz_q[:] = qtbl.reshape(64)[ZIGZAG]
    dqt = seg(0xDB, bytes([0x00]) + bytes(zz_q))
    sof = seg(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3, 1, samp[0], 0, 2, samp[1], 0, 3, samp[2], 0]),
    )

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    dri = seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + dqt
        + sof
        + dht(0, 0, _K_DC_LUM_BITS, _K_DC_LUM_VALS)
        + dht(1, 0, _K_AC_LUM_BITS, _K_AC_LUM_VALS)
        + dht(0, 1, _K_DC_CHR_BITS, _K_DC_CHR_VALS)
        + dht(1, 1, _K_AC_CHR_BITS, _K_AC_CHR_VALS)
        + dri
        + sos
        + scan
        + b"\xff\xd9"
    )


# ------------------------------------------------------ progressive encoder

# A deliberately "fat" AC Huffman table covering EVERY (run, size) symbol —
# including the EOBn run-length codes progressive scans need that Annex K's
# sequential tables lack: 255 symbols at 8 bits + symbol 0xFF at 9 bits
# (the all-ones 8-bit code stays a prefix, as T.81 C.2 requires).
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = list(range(256))

# libjpeg's default progressive scan script shape: DC first w/ SA, Y AC in
# two spectral bands, chroma full-band, then successive-approximation
# refinements down to full precision.
_DEFAULT_PROG_SCANS = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
]


def _point_ac(v: int, al: int) -> int:
    """G.1.2.2 AC point transform: divide by 2^Al TOWARD ZERO (the DC
    transform is an arithmetic shift; AC is not — sign-magnitude)."""
    return -((-v) >> al) if v < 0 else v >> al


def _enc_ac_first(bwr, inv, blocks, ss_, se_, al):
    """AC first scan: zero runs + EXTEND magnitudes of the point-
    transformed band, EOBn run accumulation across blocks."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            rr = eobrun.bit_length() - 1
            size, code = inv[rr << 4]
            bwr.put(code, size)
            if rr:
                bwr.put(eobrun - (1 << rr), rr)
            eobrun = 0

    for blk in blocks:
        tv = [_point_ac(int(blk[k]), al) for k in range(ss_, se_ + 1)]
        nz = [i for i, v in enumerate(tv) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for i in range(nz[-1] + 1):
            v = tv[i]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                size, code = inv[0xF0]
                bwr.put(code, size)
                run -= 16
            s = _mag_cat(v)
            size, code = inv[(run << 4) | s]
            bwr.put(code, size)
            bwr.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if nz[-1] < se_ - ss_:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(bwr, inv, blocks, ss_, se_, al):
    """AC refinement scan — the bit-exact mirror of _ac_refine_block's
    traversal: newly-nonzero coefficients as (zero-HISTORY run, ±1) with
    correction bits for nonzero-history positions interleaved in
    positional order; EOB runs buffer the covered blocks' correction
    bits and flush them right after the EOBn code."""
    eobrun = 0
    eob_bits: list[int] = []

    def flush():
        nonlocal eobrun, eob_bits
        if eobrun:
            rr = eobrun.bit_length() - 1
            size, code = inv[rr << 4]
            bwr.put(code, size)
            if rr:
                bwr.put(eobrun - (1 << rr), rr)
            for b in eob_bits:
                bwr.put(b, 1)
            eobrun = 0
            eob_bits = []

    for blk in blocks:
        n = se_ - ss_ + 1
        tv_new = [_point_ac(int(blk[k]), al) for k in range(ss_, se_ + 1)]
        tv_old = [_point_ac(int(blk[k]), al + 1) for k in range(ss_, se_ + 1)]
        newly = [i for i in range(n) if tv_old[i] == 0 and tv_new[i] != 0]
        k = 0
        if newly:
            flush()
            for j in newly:
                run = sum(1 for p in range(k, j) if tv_old[p] == 0)
                while run >= 16:
                    size, code = inv[0xF0]
                    bwr.put(code, size)
                    cnt = 0
                    while cnt < 16:  # decoder consumes 16 zero-history slots
                        if tv_old[k] != 0:
                            bwr.put(tv_new[k] & 1, 1)
                        else:
                            cnt += 1
                        k += 1
                    run -= 16
                size, code = inv[(run << 4) | 1]
                bwr.put(code, size)
                bwr.put(1 if tv_new[j] > 0 else 0, 1)
                while k < j:
                    if tv_old[k] != 0:
                        bwr.put(tv_new[k] & 1, 1)
                    k += 1
                k = j + 1
        if k <= n - 1:
            # band not exhausted → the decoder will read an EOB for this
            # block; a placement landing exactly on Se ends the block with
            # NO code, so emitting one would desync the stream
            eob_bits.extend(
                tv_new[p] & 1 for p in range(k, n) if tv_old[p] != 0
            )
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(
    img: np.ndarray,
    qtbl: np.ndarray | None = None,
    scans: list[tuple] | None = None,
) -> bytes:
    """(H, W, 3) uint8 → progressive (SOF2) JFIF bytes at 4:4:4. ``scans``
    is a list of (component indices, Ss, Se, Ah, Al); the default script
    mirrors libjpeg's spectral-selection + successive-approximation
    ladder. Both the decoder's test partner and a real writer any viewer
    opens."""
    if qtbl is None:
        qtbl = np.full((8, 8), 16, np.int32)
    qtbl = np.asarray(qtbl, np.int32)
    scans = _DEFAULT_PROG_SCANS if scans is None else scans
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    r_, g_, b_ = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_ - 128
    cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    by_n, bx_n = ph // 8, pw // 8
    zz = []
    for p in (y, cb, cr):
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = pp.reshape(by_n, 8, bx_n, 8).transpose(0, 2, 1, 3)
        fq = np.einsum("ur,ybrc,vc->ybuv", _DCT_M, blocks, _DCT_M)
        q = np.round(fq / qtbl).astype(np.int32).reshape(by_n, bx_n, 64)
        zz.append(q[:, :, ZIGZAG])
    dc_inv = _inv_huff(build_huffman(_K_DC_LUM_BITS, _K_DC_LUM_VALS))
    ac_inv = _inv_huff(build_huffman(_PROG_AC_BITS, _PROG_AC_VALS))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    zq = np.zeros(64, np.uint8)
    zq[:] = qtbl.reshape(64)[ZIGZAG]
    out += seg(0xDB, bytes([0x00]) + bytes(zq))
    out += seg(
        0xC2,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00] + _K_DC_LUM_BITS + _K_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10] + _PROG_AC_BITS + _PROG_AC_VALS))
    for comps_in, ss_, se_, ah, al in scans:
        body = bytes([len(comps_in)])
        for ci in comps_in:
            body += bytes([ci + 1, 0x00])  # Td=0, Ta=0
        body += bytes([ss_, se_, (ah << 4) | al])
        out += seg(0xDA, body)
        bwr = _BitWriter()
        if ss_ == 0:  # DC scan over MCUs (4:4:4 → one block per comp)
            if ah == 0:
                pred = {ci: 0 for ci in comps_in}
                for byi in range(by_n):
                    for bxi in range(bx_n):
                        for ci in comps_in:
                            v = int(zz[ci][byi, bxi, 0]) >> al
                            diff = v - pred[ci]
                            pred[ci] = v
                            s = _mag_cat(diff)
                            size, code = dc_inv[s]
                            bwr.put(code, size)
                            if s:
                                bwr.put(
                                    diff if diff >= 0 else diff + (1 << s) - 1, s
                                )
            else:
                for byi in range(by_n):
                    for bxi in range(bx_n):
                        for ci in comps_in:
                            bwr.put((int(zz[ci][byi, bxi, 0]) >> al) & 1, 1)
        else:
            ci = comps_in[0]
            blocks = [
                zz[ci][byi, bxi] for byi in range(by_n) for bxi in range(bx_n)
            ]
            if ah == 0:
                _enc_ac_first(bwr, ac_inv, blocks, ss_, se_, al)
            else:
                _enc_ac_refine(bwr, ac_inv, blocks, ss_, se_, al)
        out += bwr.done()
    out += b"\xff\xd9"
    return bytes(out)
