"""Python Data Source for the tree listing: partition-per-directory planning,
row parity with the driver-walk manifest, and filter pushdown semantics."""

import os

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.graph_datasource import (
    GraphManifestDataSource,
    GraphManifestPushdownReader,
    GraphManifestReader,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.manifest import (
    manifest_from_local_dir,
)


def _build_tree(root):
    os.makedirs(os.path.join(root, "sub1", "sub2"))
    os.makedirs(os.path.join(root, "empty_dir"))
    with open(os.path.join(root, "a.csv"), "w") as f:
        f.write("x,y\n1,2\n")
    with open(os.path.join(root, "sub1", "b.bin"), "wb") as f:
        f.write(b"\x01\x02" * 100)
    with open(os.path.join(root, "sub1", "sub2", "c.txt"), "w") as f:
        f.write("hello\n")


def _register(spark):
    try:
        spark.dataSource.register(GraphManifestDataSource)
    except Exception:
        pass  # already registered in this session


def test_source_matches_driver_walk_manifest(spark, tmp_path):
    root = str(tmp_path / "tree")
    os.makedirs(root)
    _build_tree(root)
    _register(spark)
    via_source = {
        (r["rel_path"], r["size"])
        for r in spark.read.format("graph_manifest").load(root).collect()
    }
    via_walk = {
        (r["rel_path"], r["size"]) for r in manifest_from_local_dir(spark, root).collect()
    }
    assert via_source == via_walk
    assert ("sub1/sub2/c.txt", 6) in via_source


def test_partition_per_directory(tmp_path):
    root = str(tmp_path / "tree")
    os.makedirs(root)
    _build_tree(root)
    reader = GraphManifestReader({"path": root})
    parts = reader.partitions()
    rels = sorted(p.rel_base for p in parts)
    assert rels == ["", "empty_dir", "sub1", "sub1/sub2"]


def test_filter_pushdown_applies_in_reader(spark, tmp_path):
    root = str(tmp_path / "tree")
    os.makedirs(root)
    _build_tree(root)
    _register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("graph_manifest")
        .option("pushdown", "true")
        .load(root)
        .where((F.col("size") > 10) & F.col("name").startswith("b"))
    )
    rows = df.collect()
    assert [(r["rel_path"], r["size"]) for r in rows] == [("sub1/b.bin", 200)]
    # the same predicates compiled through the reader drop rows at the source
    reader = GraphManifestPushdownReader({"path": root})
    from pyspark.sql.datasource import GreaterThan, StringStartsWith

    leftover = list(reader.pushFilters([GreaterThan(("size",), 10), StringStartsWith(("name",), "b")]))
    assert leftover == []  # both supported → nothing re-applied by Spark
    got = [
        row
        for p in reader.partitions()
        for row in reader.read(p)
    ]
    assert [(r[2], r[4]) for r in got] == [("sub1/b.bin", 200)]


def test_unsupported_filters_are_returned(tmp_path):
    root = str(tmp_path / "tree")
    os.makedirs(root)
    _build_tree(root)
    from pyspark.sql.datasource import EqualTo, StringEndsWith

    reader = GraphManifestPushdownReader({"path": root})
    unsupported = StringEndsWith(("name",), ".csv")
    leftover = list(reader.pushFilters([EqualTo(("size",), 8), unsupported]))
    assert leftover == [unsupported]
    rows = [row for p in reader.partitions() for row in reader.read(p)]
    assert [(r[2], r[4]) for r in rows] == [("a.csv", 8)]  # size=8 applied
