"""delta_lite pluggable batch source (sources/delta_datasource.py): read
parity with DeltaTable.read, time travel via option, partition/stats
pruning at planning time, schema-evolution nulls, SQL-front-door usage."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import DeltaTable
from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.delta_datasource import (
    DeltaLiteDataSource,
    DeltaLitePushdownReader,
)


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"dlsrc_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _register(spark):
    try:
        spark.dataSource.register(DeltaLiteDataSource)
    except Exception:
        pass


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_read_parity_and_time_travel(spark, root):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "k int, part string, v int"
    )
    t = DeltaTable.create(spark, root, df, partition_by=["part"])
    t.overwrite(df.where(F.col("k") < 3))
    _register(spark)
    got = spark.read.format("delta_lite").load(root)
    assert _rows(got.select("k", "part", "v")) == _rows(t.read().select("k", "part", "v"))
    v0 = spark.read.format("delta_lite").option("version", "0").load(root)
    assert v0.count() == 3 and got.count() == 2


def test_partition_filter_prunes_planned_files(spark, root):
    df = spark.createDataFrame([(i, f"p{i % 4}") for i in range(40)], "k int, part string")
    t = DeltaTable.create(spark, root, df.coalesce(1), partition_by=["part"])
    assert len(t.files()) == 4
    # plan directly through the reader: partition EqualTo accepted → 1 file
    from pyspark.sql.datasource import EqualTo

    r = DeltaLitePushdownReader({"path": root})
    residual = list(r.pushFilters([EqualTo(("part",), "p2")]))
    assert residual == []  # exact at file level: fully consumed
    assert len(r.partitions()) == 1
    # end-to-end through SQL with the session conf on
    _register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("delta_lite")
            .option("pushdown", "true")
            .load(root)
            .where(F.col("part") == "p2")
        )
        assert got.count() == 10
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_stats_bounds_prune_but_are_reapplied(spark, root):
    df = spark.range(400).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    DeltaTable.create(spark, root, df.repartitionByRange(4, "k"))
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    r = DeltaLitePushdownReader({"path": root})
    fs = [GreaterThanOrEqual(("k",), 150), LessThanOrEqual(("k",), 160)]
    residual = list(r.pushFilters(fs))
    assert residual == fs  # file-level pruning only: rows re-checked by Spark
    assert len(r.partitions()) == 1
    _register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("delta_lite")
            .option("pushdown", "true")
            .load(root)
            .where(F.col("k").between(150, 160))
        )
        assert got.count() == 11
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_schema_evolution_reads_nulls(spark, root):
    t = DeltaTable.create(spark, root, spark.range(3).select(F.col("id").alias("k")))
    t.append(
        spark.range(3, 5).select(F.col("id").alias("k"), F.lit(7).alias("extra")),
        allow_evolution=True,
    )
    _register(spark)
    got = spark.read.format("delta_lite").load(root)
    assert got.where(F.col("extra").isNull()).count() == 3
    assert got.where(F.col("extra") == 7).count() == 2


def test_sql_front_door(spark, root):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], "k int, tag string")
    DeltaTable.create(spark, root, df)
    _register(spark)
    view = f"dl_{uuid.uuid4().hex[:6]}"
    spark.read.format("delta_lite").load(root).createOrReplaceTempView(view)
    got = {
        (r["tag"], r["n"])
        for r in spark.sql(f"SELECT tag, count(*) AS n FROM {view} GROUP BY tag").collect()
    }
    assert got == {("x", 2), ("y", 1)}
