"""Schema-free parquet footer walk (plans/parquet_footer.py): num_rows
must agree with pyarrow on every fixture file, and must keep working on
footers pyarrow cannot open (VARIANT logical type)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.parquet_footer import (
    footer_num_rows,
)


def _files(sf_dir):
    out = []
    for t in os.listdir(sf_dir):
        p = os.path.join(sf_dir, t)
        if p.endswith(".parquet") and os.path.isfile(p):
            out.append(p)
        elif os.path.isdir(p):
            out.extend(glob.glob(os.path.join(p, "*.parquet")))
    return out


def test_differential_vs_pyarrow_all_fixture_files(sf_dir):
    import pyarrow.parquet as pq

    files = _files(sf_dir)
    assert files
    for p in files:
        assert footer_num_rows(p) == pq.ParquetFile(p).metadata.num_rows, p


def test_variant_footer_pyarrow_cannot_open(spark, tmp_path):
    import pyarrow.parquet as pq

    out = str(tmp_path / "var")
    spark.range(123).select(
        F.parse_json(F.concat(F.lit('{"a": '), F.col("id").cast("string"), F.lit("}"))).alias("pv")
    ).coalesce(1).write.parquet(out)
    (p,) = glob.glob(os.path.join(out, "*.parquet"))
    with pytest.raises(OSError):
        pq.ParquetFile(p)
    assert footer_num_rows(p) == 123


def test_not_parquet_refused(tmp_path):
    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a parquet file"):
        footer_num_rows(p)


def _compact_footer_file(tmp_path, body: bytes) -> str:
    """Wrap a raw thrift compact-protocol FileMetaData struct body as a
    minimal parquet tail (body + little-endian length + PAR1)."""
    import struct as _struct

    p = str(tmp_path / "synth.parquet")
    with open(p, "wb") as f:
        f.write(b"PAR1" + body + _struct.pack("<I", len(body)) + b"PAR1")
    return p


def test_bool_collection_elements_consume_one_byte(tmp_path):
    """ADVICE r8: thrift compact-protocol bool ELEMENTS inside list/set/map
    occupy one byte each (0x01/0x02) — only struct-FIELD bools are
    zero-width. A footer field holding a bool collection before num_rows
    must not desync the walk."""
    body = bytes(
        [
            0x19,  # field 1, type LIST of BOOL
            0x31, 0x01, 0x02, 0x01,
            0x1B,  # field 2, type MAP of bool→bool
            0x02, 0x11, 0x01, 0x02, 0x02, 0x01,
            0x16,  # field 3, type I64
        ]
    ) + bytes([0xF6, 0x01])  # zigzag varint of 123
    body += bytes([0x00])  # STOP
    p = _compact_footer_file(tmp_path, body)
    assert footer_num_rows(p) == 123


def test_struct_field_bools_stay_zero_width(tmp_path):
    # struct FIELD bools carry their value in the field header — the walk
    # must NOT consume an extra byte for them
    body = bytes(
        [
            0x11,  # field 1, type BOOL_TRUE (value in header)
            0x12,  # field 2, type BOOL_FALSE
            0x16,  # field 3, type I64
        ]
    ) + bytes([0x54]) + bytes([0x00])  # zigzag(42)=84=0x54; STOP
    p = _compact_footer_file(tmp_path, body)
    assert footer_num_rows(p) == 42


def test_non_utf8_binary_bounds_become_cannot_prune(tmp_path):
    """ADVICE r9: errors='replace' could misorder a decoded bound vs the
    true unsigned-byte order; non-UTF8 BYTE_ARRAY min/max must decode to
    None (cannot prune), while genuine strings keep their bounds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.parquet_footer import (
        footer_stats,
    )

    p = str(tmp_path / "bin.parquet")
    tbl = pa.table(
        {
            "b": pa.array([b"\xff\xfe\x01", b"\x00\x02"], type=pa.binary()),
            "s": pa.array(["apple", "zebra"], type=pa.string()),
        }
    )
    pq.write_table(tbl, p)
    n, st = footer_stats(p)
    assert n == 2
    assert st["b"]["min"] is None and st["b"]["max"] is None
    assert st["s"]["min"] == "apple" and st["s"]["max"] == "zebra"
