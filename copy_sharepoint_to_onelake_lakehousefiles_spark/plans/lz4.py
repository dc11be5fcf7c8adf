"""From-scratch LZ4 (block + frame) and xxHash32, from the PUBLIC specs
only (no lz4/xxhash packages in the container):

- LZ4 block format (lz4/doc/lz4_Block_format.md): a sequence stream of
  [token][literal length*][literals][offset u16 LE][match length*], where
  each token nibble saturates at 15 and extends with 255-bytes; matches
  are >= 4 bytes and may OVERLAP their own output (offset < match length
  repeats a period). End-of-block rules: the last sequence is
  literals-only, the last 5 bytes are always literals, and the last match
  must start >= 12 bytes before the end (mflimit) — the compressor here
  honors all three, and inputs < 13 bytes are emitted as pure literals.
- LZ4 frame format (lz4/doc/lz4_Frame_format.md): magic 0x184D2204, FLG /
  BD descriptor bytes, optional content size, header checksum byte
  ((xxh32(descriptor) >> 8) & 0xFF), data blocks sized by a u32 whose high
  bit marks an UNCOMPRESSED block, 0x00000000 end mark, optional content
  checksum. This is the framing Puffin's spec names for its footer
  compression ("lz4" = a single frame with content size present —
  plans/puffin.py).
- xxHash32 (Cyan4973/xxHash/doc/xxhash_spec.md): the 32-bit lanes variant,
  needed for the frame's header/block/content checksums.

Pure bytes<->bytes; used by plans/puffin.py for LZ4-compressed Puffin
footers (VERDICT r6 #7 — was a loud refusal) and available to any other
format layer that meets an LZ4 stream. Throughput is Python-grade, which
is fine for the metadata-sized payloads (KB footers) it serves — data
pages never route through here.
"""

from __future__ import annotations

import struct

_M32 = 0xFFFFFFFF
_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)

LZ4F_MAGIC = 0x184D2204


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 of ``data`` (spec: xxhash_spec.md, XXH32)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            w1, w2, w3, w4 = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl32((v1 + w1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + w2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + w3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + w4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        (w,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + w * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def lz4_block_decompress(src: bytes) -> bytes:
    """Decode one LZ4 BLOCK (raw sequences, no framing)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("LZ4 block truncated in literal length")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("LZ4 block truncated in literals")
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # last sequence is literals-only (spec end-of-block)
        if i + 2 > n:
            raise ValueError("LZ4 block truncated in offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("LZ4 invalid offset 0")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                if i >= n:
                    raise ValueError("LZ4 block truncated in match length")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        if start < 0:
            raise ValueError("LZ4 match reaches before block start")
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping match: the copy reads its OWN output (period
            # repetition — offset 1 is a run-length fill), so byte-wise
            for _ in range(mlen):
                out.append(out[start])
                start += 1
    return bytes(out)


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy single-pass LZ4 BLOCK compressor (4-byte hash table, 64 KiB
    window). Spec-conformant end rules: inputs < 13 bytes and every
    block's tail are pure literals; matches never start after mflimit
    (n-12) nor extend into the last 5 bytes."""
    n = len(src)
    out = bytearray()

    def write_seq(lit_start: int, lit_len: int, offset: int, mlen: int) -> None:
        t_l = 15 if lit_len >= 15 else lit_len
        t_m = 0 if mlen == 0 else (15 if mlen - 4 >= 15 else mlen - 4)
        out.append((t_l << 4) | t_m)
        if t_l == 15:
            rem = lit_len - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[lit_start : lit_start + lit_len])
        if mlen:
            out.extend(offset.to_bytes(2, "little"))
            if t_m == 15:
                rem = mlen - 4 - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    if n < 13:
        write_seq(0, n, 0, 0)
        return bytes(out)
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    mflimit = n - 12
    matchlimit = n - 5
    while i < mflimit:
        key = src[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and src[j : j + 4] == key:
            mlen = 4
            while i + mlen < matchlimit and src[j + mlen] == src[i + mlen]:
                mlen += 1
            write_seq(anchor, i - anchor, i - j, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    write_seq(anchor, n - anchor, 0, 0)
    return bytes(out)


def lz4_frame_compress(data: bytes) -> bytes:
    """One LZ4 FRAME holding ``data`` as a single block (Puffin's footer
    codec shape: content size present, block-independent). The block is
    stored UNCOMPRESSED (high-bit size) when compression doesn't win —
    both forms are spec-legal and every conforming reader handles both."""
    # FLG: version=01, block-independence=1, content-size=1; BD: 4 MiB max
    desc = bytes([0x68, 0x70]) + struct.pack("<Q", len(data))
    header = struct.pack("<I", LZ4F_MAGIC) + desc + bytes(
        [(xxh32(desc) >> 8) & 0xFF]
    )
    comp = lz4_block_compress(data)
    if len(comp) < len(data):
        body = struct.pack("<I", len(comp)) + comp
    else:
        body = struct.pack("<I", 0x80000000 | len(data)) + data
    return header + body + struct.pack("<I", 0)  # end mark


def lz4_frame_decompress(buf: bytes) -> bytes:
    """Decode one LZ4 FRAME, verifying the header checksum and any
    block/content checksums present."""
    if len(buf) < 7 or struct.unpack_from("<I", buf, 0)[0] != LZ4F_MAGIC:
        raise ValueError("not an LZ4 frame (bad magic)")
    flg = buf[4]
    if (flg >> 6) != 0b01:
        raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
    b_checksum = (flg >> 4) & 1
    has_size = (flg >> 3) & 1
    c_checksum = (flg >> 2) & 1
    has_dict = flg & 1
    pos = 6
    content_size = None
    if has_size:
        (content_size,) = struct.unpack_from("<Q", buf, pos)
        pos += 8
    if has_dict:
        pos += 4
    hc = buf[pos]
    pos += 1
    if ((xxh32(buf[4 : pos - 1]) >> 8) & 0xFF) != hc:
        raise ValueError("LZ4 frame header checksum mismatch")
    out = bytearray()
    while True:
        (bsz,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if bsz == 0:
            break
        raw = bool(bsz & 0x80000000)
        bsz &= 0x7FFFFFFF
        block = buf[pos : pos + bsz]
        if len(block) != bsz:
            raise ValueError("LZ4 frame truncated in block")
        pos += bsz
        if b_checksum:
            (chk,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if xxh32(block) != chk:
                raise ValueError("LZ4 block checksum mismatch")
        out += block if raw else lz4_block_decompress(block)
    if c_checksum:
        (chk,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if xxh32(bytes(out)) != chk:
            raise ValueError("LZ4 content checksum mismatch")
    if content_size is not None and len(out) != content_size:
        raise ValueError(
            f"LZ4 content size mismatch (header {content_size}, got {len(out)})"
        )
    return bytes(out)
