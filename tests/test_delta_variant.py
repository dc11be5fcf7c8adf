"""Delta VARIANT columns (plans/deltalog.py — spec §Variant Data Type,
table feature ``variantType``): a VariantType column persists in the
schemaString, gates the protocol on the reader+writer feature, and
survives append / delete / time travel through the variant parquet
encoding."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import DeltaTable


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"dlvar_test_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.concat(F.lit('{"a": '), F.col("id").cast("string"), F.lit("}"))
        ).alias("pv"),
    )


def test_variant_column_roundtrip_and_protocol(spark, root):
    t = DeltaTable.create(spark, root, _df(spark, 0, 10))
    st = t.schema()
    assert isinstance(st["pv"].dataType, T.VariantType)
    proto = t.protocol()
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    got = sorted(
        tuple(r)
        for r in t.read()
        .select("k", F.variant_get("pv", "$.a", "long").alias("a"))
        .collect()
    )
    assert got == [(i, i) for i in range(10)]


def test_variant_through_uniform_both_directions(spark, root):
    """UniForm metadata generation over variant-bearing files, both ways:
    the other format's reader must see the same extracted values (one data
    copy, two formats — now including the variant column)."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import (
        IcebergTable,
        delta_to_iceberg_uniform,
        iceberg_to_delta_uniform,
    )

    t = DeltaTable.create(spark, root, _df(spark, 0, 6))
    ice = delta_to_iceberg_uniform(t)
    got = sorted(
        r[0]
        for r in ice.read().select(F.variant_get("pv", "$.a", "long")).collect()
    )
    assert got == list(range(6))

    iroot = root + "_ice"
    it = IcebergTable.create(spark, iroot, _df(spark, 10, 14))
    dl = iceberg_to_delta_uniform(it)
    got = sorted(
        r[0]
        for r in dl.read().select(F.variant_get("pv", "$.a", "long")).collect()
    )
    assert got == [10, 11, 12, 13]


def test_variant_survives_append_delete_time_travel(spark, root):
    t = DeltaTable.create(spark, root, _df(spark, 0, 5))
    t.append(_df(spark, 5, 8))
    t.delete("k >= 6")
    vals = sorted(
        r[0]
        for r in t.read().select(F.variant_get("pv", "$.a", "long")).collect()
    )
    assert vals == [0, 1, 2, 3, 4, 5]
    # time travel re-reads the pre-delete variant files
    assert t.read(1).count() == 8


def test_stats_fallback_catches_arrow_invalid(spark, root, monkeypatch):
    """ADVICE r8: pyarrow versions that surface the unrecognized-
    LogicalType failure as ArrowInvalid (a ValueError subclass, not
    OSError) must still reach the schema-free footer fallback in BOTH
    stats paths rather than crash every variant write."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans import (
        deltalog as dl_mod,
    )
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans import (
        iceberg as ice_mod,
    )

    def _boom(*a, **kw):
        raise pa.lib.ArrowInvalid("Thrift LogicalType that is not recognized")

    monkeypatch.setattr(pq, "ParquetFile", _boom)
    out = str(os.path.join(root, "plain"))
    spark.range(7).select(F.col("id").alias("k")).coalesce(1).write.parquet(out)
    import glob

    (p,) = glob.glob(os.path.join(out, "*.parquet"))
    st = dl_mod._stats_for_file(p, ["k"])
    # r9: the fallback tier now recovers full stats from the schema-free
    # walk — plain columns keep their bounds even in files pyarrow refuses
    assert st["numRecords"] == 7
    assert st["minValues"]["k"] == 0 and st["maxValues"]["k"] == 6
    assert st["nullCount"]["k"] == 0
    fe = ice_mod._file_entry(p, {}, {"k": 1}, {"k": "long"})
    assert fe["record_count"] == 7
