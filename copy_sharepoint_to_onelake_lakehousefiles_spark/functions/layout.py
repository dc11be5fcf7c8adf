"""Data-layout optimization: Morton (Z-order) clustering for multi-column
data skipping.

Parquet row-group pruning works off per-file/per-row-group min/max stats; a
table sorted by ONE column skips well on that column only. Interleaving the
bits of two key columns (Morton code) and range-partitioning + sorting by
the code keeps BOTH columns' value ranges narrow in every file, so
selective filters on either column (or both) prune most files — the
standard lakehouse Z-ORDER primitive, built here from public Spark APIs
(bit-interleave expression + repartitionByRange + sortWithinPartitions).

Scale: the clustering write is one range shuffle (sampled range
boundaries); reads then skip via footer stats with no index structure to
maintain.

See also plans/txtable.TxTable.cluster_by — the table-format flavor of the
same primitive (n numeric columns, equi-depth quantile bucketing, skipping
via commit-log manifest stats instead of parquet footers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MORTON_BITS = 16  # per column → 32-bit code


def morton_code(x: str, y: str, bits: int = MORTON_BITS) -> Column:
    """Interleave the low `bits` bits of int columns x (even positions) and
    y (odd positions) into a single bigint. One compact fold, not 2·bits
    unrolled terms (small generated code — see the q28 JIT lesson)."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
        f"(acc, i) -> acc"
        f" + shiftleft(({x} div shiftleft(cast(1 as bigint), i)) % 2, 2 * i)"
        f" + shiftleft(({y} div shiftleft(cast(1 as bigint), i)) % 2, 2 * i + 1))"
    )


def cluster_by_morton(df: DataFrame, x: str, y: str, n_files: int = 8) -> DataFrame:
    """Order `df` for writing so each output file covers a compact (x, y)
    rectangle: normalize both columns to the full bit range, interleave,
    range-partition on the code, sort within partitions. Write the result
    with .parquet(path) — each partition becomes one file whose x/y min-max
    footprint is small.

    The normalization matters: raw interleaving of a wide column with a
    narrow one (say 13-bit orderkey vs 4-bit suppkey) puts every split bit
    in the wide column and the narrow column never clusters. Min-max scaling
    each column to `bits` bits (integer arithmetic, exact) gives both equal
    weight — the same normalization production Z-ORDER implementations
    apply. At 100 TB the min/max come from table stats instead of an agg."""
    top = (1 << MORTON_BITS) - 1
    mm = df.agg(
        F.min(x).cast("bigint").alias("__xmn"),
        F.max(x).cast("bigint").alias("__xmx"),
        F.min(y).cast("bigint").alias("__ymn"),
        F.max(y).cast("bigint").alias("__ymx"),
    )
    scaled_x = F.expr(f"(({x} - __xmn) * {top}) div greatest(__xmx - __xmn, 1)")
    scaled_y = F.expr(f"(({y} - __ymn) * {top}) div greatest(__ymx - __ymn, 1)")
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__sx", scaled_x)
        .withColumn("__sy", scaled_y)
        .withColumn("__z", morton_code("__sx", "__sy"))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__xmn", "__xmx", "__ymn", "__ymx", "__sx", "__sy", "__z")
    )
