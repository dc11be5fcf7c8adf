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
