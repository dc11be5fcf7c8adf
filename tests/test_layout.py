"""Morton/Z-order clustering: interleave correctness + the actual payoff —
narrow per-file min/max footprints on BOTH key columns (what parquet
row-group pruning skips on)."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.functions.layout import (
    cluster_by_morton,
    morton_code,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def _interleave(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_code_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (12345, 54321), (65535, 65535)],
        "x bigint, y bigint",
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", morton_code("x", "y").alias("z")).collect()}
    for (x, y), z in got.items():
        assert z == _interleave(x, y)


def _file_footprints(path, cols):
    """Per-file (min, max) spans from parquet footers, per column."""
    import glob
    import os

    spans = {c: [] for c in cols}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        for c in cols:
            if lo[c] is not None:
                spans[c].append(hi[c] - lo[c])
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_zorder_narrows_both_columns_footprints(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    base = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    # plain layout: arbitrary row order, same file count
    li.repartition(8).write.parquet(base)
    cluster_by_morton(li, "l_partkey", "l_suppkey", n_files=8).write.parquet(zord)

    plain = _file_footprints(base, ["l_partkey", "l_suppkey"])
    z = _file_footprints(zord, ["l_partkey", "l_suppkey"])
    # Both columns' average per-file spans must shrink materially — this is
    # exactly the stat pruning reads. (A single-column sort would shrink one
    # span and leave the other full-range.)
    assert z["l_partkey"] < plain["l_partkey"] * 0.6
    assert z["l_suppkey"] < plain["l_suppkey"] * 0.6

    # and the data survives the rewrite
    a = spark.read.parquet(zord).agg(F.sum("l_quantity")).first()[0]
    b = li.agg(F.sum("l_quantity")).first()[0]
    assert abs(a - b) < 1e-6
