"""Iceberg v3 composition pins beyond q201's gate flags (r9 — variant ×
column defaults × branch writes × WAP): provided values beat the
write-default on a branch append, time travel reads under the snapshot's
own schema, and the WAP discipline refusal (no evolution ON a branch
append) still holds with the composed features."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import IcebergTable


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"icevdw_test_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _base(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _varcol(df):
    return df.withColumn(
        "pv",
        F.parse_json(F.concat(F.lit('{"a": '), F.col("k").cast("string"), F.lit("}"))),
    )


def _evolved(spark, root):
    t = IcebergTable.create(spark, root, _base(spark, 0, 5))
    t.add_column("pv", "variant")
    t.add_column("tier", "string", default="bronze")
    return t


def test_provided_value_beats_write_default_on_branch(spark, root):
    t = _evolved(spark, root)
    t.append(
        _varcol(_base(spark, 5, 8)).withColumn("tier", F.lit("gold")),
        branch="audit",
    )
    br = {r["k"]: r["tier"] for r in t.read(ref="audit").collect()}
    assert [br[k] for k in range(8)] == ["bronze"] * 5 + ["gold"] * 3
    t.fast_forward("audit")
    assert {r["tier"] for r in t.read().where("k >= 5").collect()} == {"gold"}


def test_time_travel_reads_pre_add_schema(spark, root):
    t = IcebergTable.create(spark, root, _base(spark, 0, 5))
    first = t.current_snapshot_id()
    t.add_column("pv", "variant")
    t.add_column("tier", "string", default="bronze")
    t.append(_varcol(_base(spark, 5, 8)), branch="audit")
    t.fast_forward("audit")
    # the pre-add snapshot's schema has neither column
    old = t.read(snapshot_id=first)
    assert set(old.columns) == {"k"}
    # the published head reads both, variant typed, default filled
    cur = t.read()
    assert isinstance(cur.schema["pv"].dataType, T.VariantType)
    assert cur.where(F.col("tier") != "bronze").count() == 0
    staged_k = (
        cur.where("k >= 5")
        .select(F.variant_get("pv", "$.a", "bigint").alias("a"))
        .agg(F.sum("a"))
        .first()[0]
    )
    assert staged_k == 5 + 6 + 7


def test_branch_append_still_refuses_evolution(spark, root):
    t = _evolved(spark, root)
    extra = _varcol(_base(spark, 5, 6)).withColumn("brand_new", F.lit(1))
    with pytest.raises(ValueError, match="evolve on the table head"):
        t.append(extra, branch="audit", allow_evolution=True)
    with pytest.raises(ValueError, match="new columns"):
        t.append(extra, branch="audit")
