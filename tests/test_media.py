"""Multimodal plumbing: binaryFile ingestion, Arrow-batched stub decode,
1→N frame expansion."""

import hashlib

from copy_sharepoint_to_onelake_lakehousefiles_spark.multimodal import media as M


def _mk_blobs(tmp_path, n=4):
    root = tmp_path / "blobs"
    (root / "nested").mkdir(parents=True)
    paths = []
    for i in range(n):
        p = (root / "nested" if i % 2 else root) / f"b{i}.bin"
        p.write_bytes(bytes([i]) * (64 * (i + 1)))
        paths.append(p)
    return str(root), paths


def test_extract_features_digest_matches_driver(spark, tmp_path):
    root, paths = _mk_blobs(tmp_path)
    feats = {r["digest"]: r for r in M.extract_features(M.read_media_dir(spark, root)).collect()}
    for p in paths:
        want = hashlib.sha256(p.read_bytes()).hexdigest()
        assert want in feats
        assert feats[want]["n_bytes"] == len(p.read_bytes())
        assert len(feats[want]["features"]) == 8
        assert all(0.0 <= f <= 1.0 for f in feats[want]["features"])


def test_stub_decode_deterministic():
    assert M._stub_decode(b"abc") == M._stub_decode(b"abc")
    assert M._stub_decode(b"abc") != M._stub_decode(b"abd")


def test_frame_sampling_expands_rows(spark, tmp_path):
    root, paths = _mk_blobs(tmp_path)
    media = M.read_media_dir(spark, root, kind="video")
    frames = M.sample_frames(media, every_ms=500).collect()
    assert len(frames) > len(paths)  # 1 → N expansion happened
    for f in frames:
        assert f["frame_ts_ms"] % 500 == 0
        assert len(f["frame_features"]) == 4


def test_resize_passthrough_updates_meta(spark, tmp_path):
    root, _ = _mk_blobs(tmp_path)
    out = M.resize_images(M.read_media_dir(spark, root), 32, 32).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)


def test_arrow_extractor_matches_pandas_extractor(spark, tmp_path):
    root, _ = _mk_blobs(tmp_path)
    media = M.read_media_dir(spark, root)
    via_pandas = {r["digest"]: r for r in M.extract_features(media).collect()}
    via_arrow = {r["digest"]: r for r in M.extract_features_arrow(media).collect()}
    assert set(via_pandas) == set(via_arrow)
    for k in via_pandas:
        assert via_pandas[k]["n_bytes"] == via_arrow[k]["n_bytes"]
        assert via_pandas[k]["features"] == via_arrow[k]["features"]
