"""q60/q61 precomputed-fixture oracles (r7 — VERDICT r6 #5, promoting the
media queries from rows-only to the hash tier).

The checked-in ``tests/fixtures/q60_media_oracle.jsonl`` /
``q61_media_oracle.jsonl`` are what DuckDB reads as the gate oracle. These
tests REGENERATE both files' content WITHOUT Spark — walking the same
deterministic blob tree with the pure codec functions, and re-deriving
q61's vector ids with a from-spec Murmur3_x86_32 (Spark's ``F.hash``) —
and assert the regeneration matches the checked-in bytes. So the gate
pins Spark pipeline == pure-Python recomputation == committed artifact;
drift in any of the three fails loudly.

Regenerate after an intentional codec/fixture change with:
    python -m tests.test_media_oracle_fixture
"""

import hashlib
import json
import math
import os
import shutil
import struct
import tempfile
import uuid
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal.media import (
    DECODE_ERRORS,
    _build_media_fixture_tree,
    _build_video_fixture_tree,
    _image_features,
    _real_or_stub_features,
    _stub_decode,
    decode_gif_frames,
    probe_metadata,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
Q60_PATH = os.path.join(FIXDIR, "q60_media_oracle.jsonl")
Q61_PATH = os.path.join(FIXDIR, "q61_media_oracle.jsonl")
Q157_PATH = os.path.join(FIXDIR, "q157_video_oracle.jsonl")

_M32 = 0xFFFFFFFF


def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_x86_32(data: bytes, seed: int = 42) -> int:
    """Canonical Murmur3 x86_32 over 4-byte-aligned input — matches
    Spark's ``F.hash`` for strings whose UTF-8 length % 4 == 0 (Spark's
    tail handling diverges from canonical murmur3, but q61 hashes 64-char
    hex digests, so there is no tail). Returns SIGNED int32 like Spark."""
    assert len(data) % 4 == 0, "aligned input only (no tail)"
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed
    for i in range(0, len(data), 4):
        (k1,) = struct.unpack_from("<I", data, i)
        k1 = (k1 * c1) & _M32
        k1 = _rotl(k1, 15)
        k1 = (k1 * c2) & _M32
        h1 ^= k1
        h1 = _rotl(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _M32
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _round_half_up(x: float, scale: int = 0) -> float:
    """Spark's ROUND (BigDecimal HALF_UP on the double's shortest repr —
    BigDecimal.valueOf goes through Double.toString)."""
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def expected_q60_rows() -> list[dict]:
    root = os.path.join(tempfile.gettempdir(), f"media_oracle_gen_{uuid.uuid4().hex[:8]}")
    _build_media_fixture_tree(root)
    try:
        per_mime: dict[str, dict] = {}
        for dirpath, _dn, names in os.walk(root):
            for n in sorted(names):
                content = open(os.path.join(dirpath, n), "rb").read()
                mime, width, _h, dur = probe_metadata(content)
                feats, _status = _real_or_stub_features("image", content, 8)
                f0 = float(np.float32(feats[0]))  # Spark FloatType round-trip
                g = per_mime.setdefault(
                    mime,
                    {
                        "n_media": 0,
                        "total_bytes": 0,
                        "digests": set(),
                        "n_with_dims": 0,
                        "n_with_duration": 0,
                        "f0_fx": 0,
                    },
                )
                g["n_media"] += 1
                g["total_bytes"] += len(content)
                g["digests"].add(hashlib.sha256(content).hexdigest())
                g["n_with_dims"] += int(width is not None)
                g["n_with_duration"] += int(dur is not None)
                g["f0_fx"] += int(_round_half_up(f0 * 10000))
        return [
            {
                "mime": mime,
                "n_media": g["n_media"],
                "total_bytes": g["total_bytes"],
                "n_distinct": len(g["digests"]),
                "n_with_dims": g["n_with_dims"],
                "n_with_duration": g["n_with_duration"],
                "f0_fx": g["f0_fx"],
            }
            for mime, g in sorted(per_mime.items())
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def expected_q61_rows() -> list[dict]:
    # the same 8 payloads q61 writes; ids/features are CONTENT-derived so
    # the /tmp paths never matter
    vecs = []
    for i in range(8):
        payload = bytes([i // 2]) * 256 + bytes([i]) * 32
        digest = hashlib.sha256(payload).hexdigest()
        vid = abs(murmur3_x86_32(digest.encode()))
        raw = hashlib.sha256(payload).digest()
        emb = [float(np.float32(raw[j] / 255.0)) for j in range(16)]
        vecs.append((vid, emb))

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):  # left fold, matching F.aggregate
            acc += x * y
        return acc

    rows = []
    for qid, qe in vecs:
        best = None
        for nid, ne in vecs:
            if nid == qid:
                continue
            cos = fold_dot(qe, ne) / (
                math.sqrt(fold_dot(qe, qe)) * math.sqrt(fold_dot(ne, ne))
            )
            cos6 = _round_half_up(cos, 6)
            # top-1: highest cosine, ties broken by ascending n_id
            key = (-cos6, nid)
            if best is None or key < best[0]:
                best = (key, nid, cos6)
        rows.append(
            {
                "q_id": qid,
                "n_id": best[1],
                "score_fx": int(_round_half_up(best[2] * 1e6)),
                "rk": 1,
            }
        )
    return sorted(rows, key=lambda r: r["q_id"])


def expected_q157_rows() -> list[dict]:
    """q157's per-clip frame aggregates, recomputed WITHOUT Spark: walk
    the same deterministic clip tree, decode GIF frames (or take the
    stub path for the foreign container — replicating
    ``sample_video_frames``'s selection and fallback EXACTLY), and fold
    each selected frame's feature[2] into the fixed-point sum the query
    emits."""
    root = os.path.join(tempfile.gettempdir(), f"video_oracle_gen_{uuid.uuid4().hex[:8]}")
    _build_video_fixture_tree(root)
    nq = 4
    try:
        rows = []
        for dirpath, _dn, names in os.walk(root):
            for nfile in sorted(names):
                content = open(os.path.join(dirpath, nfile), "rb").read()
                mime, _w, _h, probed = probe_metadata(content)
                try:
                    frames, delays = decode_gif_frames(content)
                    total, dur, decoded = len(frames), sum(delays) * 10, 1
                    if nq >= total:
                        sel = list(range(total))
                    elif nq == 1:
                        sel = [0]
                    else:
                        sel = [round(i * (total - 1) / (nq - 1)) for i in range(nq)]
                    sel = sorted(set(sel))
                    f3s = [_image_features(frames[i], 8)[2] for i in sel]
                except DECODE_ERRORS:
                    total, dur, decoded = nq, None, 0
                    sel = list(range(nq))
                    f3s = [_stub_decode(content + bytes([i]), 8)[2] for i in sel]
                rows.append(
                    {
                        "clip": nfile,
                        "mime": mime,
                        "n_sampled": len(sel),
                        "n_frames": total,
                        "duration_ms": dur,
                        "probed_ms": probed,
                        "decoded": decoded,
                        "feat3_fx": sum(
                            int(_round_half_up(v * 10000)) for v in f3s
                        ),
                    }
                )
        return sorted(rows, key=lambda r: r["clip"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _render(rows: list[dict]) -> str:
    return "".join(json.dumps(r, sort_keys=False) + "\n" for r in rows)


def test_q60_fixture_matches_regeneration():
    assert os.path.exists(Q60_PATH), "run: python -m tests.test_media_oracle_fixture"
    assert open(Q60_PATH).read() == _render(expected_q60_rows())


def test_q61_fixture_matches_regeneration():
    assert os.path.exists(Q61_PATH), "run: python -m tests.test_media_oracle_fixture"
    assert open(Q61_PATH).read() == _render(expected_q61_rows())


def test_q157_fixture_matches_regeneration():
    assert os.path.exists(Q157_PATH), "run: python -m tests.test_media_oracle_fixture"
    assert open(Q157_PATH).read() == _render(expected_q157_rows())


def test_murmur3_matches_spark_hash_reference():
    """Pin the from-spec murmur3 against values Spark produced once (so a
    regression in the regenerator itself is caught without a session).
    Reference: spark.sql("SELECT hash('<s>')") on the gate session."""
    # 64-char aligned strings, like the sha-256 hex digests q61 hashes
    assert murmur3_x86_32(b"a" * 64) == -1746853250
    assert murmur3_x86_32(b"0123456789abcdef" * 4) == -2015787690


if __name__ == "__main__":
    os.makedirs(FIXDIR, exist_ok=True)
    open(Q60_PATH, "w").write(_render(expected_q60_rows()))
    open(Q61_PATH, "w").write(_render(expected_q61_rows()))
    open(Q157_PATH, "w").write(_render(expected_q157_rows()))
    print(f"wrote {Q60_PATH}, {Q61_PATH} and {Q157_PATH}")
