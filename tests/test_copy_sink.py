"""binary_copy custom write source: two-phase copy with staging → publish,
content fidelity, null-url skip, and no partial output on task failure."""

import os

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.copy_sink import (
    BinaryCopyDataSource,
)


def _register(spark):
    try:
        spark.dataSource.register(BinaryCopyDataSource)
    except Exception:
        pass


def _sources(tmp_path):
    src = tmp_path / "src"
    os.makedirs(src / "sub")
    (src / "a.bin").write_bytes(b"\x00\x01" * 50)
    (src / "sub" / "b.txt").write_text("hello world")
    return src


def test_copy_sink_round_trip(spark, tmp_path):
    src = _sources(tmp_path)
    dest = str(tmp_path / "dest")
    _register(spark)
    manifest = spark.createDataFrame(
        [
            ("a.bin", str(src / "a.bin")),
            ("sub/b.txt", str(src / "sub" / "b.txt")),
            ("skipped.bin", None),  # null download_url → skipped, not an error
        ],
        "rel_path string, download_url string",
    )
    manifest.write.format("binary_copy").mode("append").save(dest)
    assert (tmp_path / "dest" / "a.bin").read_bytes() == b"\x00\x01" * 50
    assert (tmp_path / "dest" / "sub" / "b.txt").read_text() == "hello world"
    assert not (tmp_path / "dest" / "skipped.bin").exists()
    assert not (tmp_path / "dest" / "__staging__").exists()  # staging cleaned


def test_failed_job_publishes_nothing(spark, tmp_path):
    """A task that raises must leave the destination EMPTY — the two-phase
    commit property the reference's sequential loop lacks."""
    src = _sources(tmp_path)
    dest = str(tmp_path / "dest2")
    _register(spark)
    manifest = spark.createDataFrame(
        [
            ("a.bin", str(src / "a.bin")),
            ("missing.bin", str(src / "nope.bin")),  # executor open() raises
        ],
        "rel_path string, download_url string",
    ).coalesce(1)
    with pytest.raises(Exception):
        manifest.write.format("binary_copy").mode("append").save(dest)
    published = [
        f
        for root, _, files in os.walk(dest)
        for f in files
        if "__staging__" not in root
    ] if os.path.isdir(dest) else []
    assert published == []  # nothing escaped staging


def test_staged_rel_paths_do_not_collide(spark, tmp_path):
    """'a/b' and 'a__b' must land as distinct files: the old staging scheme
    flattened '/' to '__', so the second write silently clobbered the first
    staged file and commit() then failed on the missing path."""
    src = tmp_path / "src"
    os.makedirs(src / "a")
    (src / "a" / "b").write_bytes(b"nested")
    (src / "a__b").write_bytes(b"flat")
    dest = str(tmp_path / "dest")
    _register(spark)
    manifest = spark.createDataFrame(
        [("a/b", str(src / "a" / "b")), ("a__b", str(src / "a__b"))],
        "rel_path string, download_url string",
    ).coalesce(1)  # same task → same staging dir, the collision case
    manifest.write.format("binary_copy").mode("append").save(dest)
    assert (tmp_path / "dest" / "a" / "b").read_bytes() == b"nested"
    assert (tmp_path / "dest" / "a__b").read_bytes() == b"flat"
