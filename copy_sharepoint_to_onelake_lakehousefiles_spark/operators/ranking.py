"""Scale-safe global ranking: two-pass partition-offset row numbering.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY executes as a
single-partition sort (Spark logs ``WindowExec: No Partition Defined``) —
fine on 60k rows, a hard bottleneck on a 1000-executor cluster where the
ranked set no longer fits one task. This module provides the standard
distributed equivalent:

1. ``repartitionByRange`` on the (unique) order key — partitions become
   globally ordered; boundaries come from Spark's deterministic reservoir
   sample of the key distribution.
2. Per-partition row counts — a tiny aggregation (≤ #partitions rows).
3. Cumulative offsets via a triangular self-join on that tiny table.
   (A bounded global window would also work, but the self-join keeps the
   plan free of single-partition WindowExec nodes entirely, so the plan
   audit can assert their absence.)
4. Broadcast the offsets back and rank locally inside each range
   partition (window PARTITION BY partition-id — a keyed, balanced
   shuffle: every pid has ~|rows|/nparts rows by construction).

Cost: two full-data shuffles (range + pid hash), both balanced, plus one
broadcast of ≤ #partitions offset rows. No stage ever sees more than one
partition's worth of data.

The order key MUST be unique (append a tiebreaker column if needed):
range boundaries may split equal keys across partitions, so only a total
order makes the global rank well-defined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    *,
    rank_name: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append 1-based ``rank_name`` (bigint) = row_number over the global
    total order given by ``order_cols`` (which must be a unique key; pass
    ``F.col(c).desc()`` style Columns for descending components)."""
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(nparts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    pc = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    a, b = pc.alias("a"), pc.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__cnt"), F.lit(0)).alias("__off"))
    )
    local = W.partitionBy("__pid").orderBy(*cols)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_name,
            (F.row_number().over(local).cast("bigint") + F.col("__off")),
        )
        .drop("__pid", "__off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    *,
    sum_name: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``sum_name`` (bigint) = INCLUSIVE prefix sum of ``value_col``
    over the global total order given by ``order_cols`` (a unique key).

    Same two-pass shape as global_row_number, with per-partition SUMS as
    the broadcast offsets instead of counts — the distributed scan
    primitive behind sequence packing, cumulative quotas, and offset
    assignment. No single-partition WindowExec anywhere."""
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(nparts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    pc = ranged.groupBy("__pid").agg(F.sum(value_col).cast("bigint").alias("__psum"))
    a, b = pc.alias("a"), pc.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__psum"), F.lit(0)).cast("bigint").alias("__off"))
    )
    local = W.partitionBy("__pid").orderBy(*cols).rowsBetween(W.unboundedPreceding, 0)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            sum_name,
            F.sum(value_col).over(local).cast("bigint") + F.col("__off"),
        )
        .drop("__pid", "__off")
    )
