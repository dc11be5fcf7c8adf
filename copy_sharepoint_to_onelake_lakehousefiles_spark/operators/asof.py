"""As-of (nearest-predecessor) join.

Vanilla Spark has no ASOF JOIN operator (SURVEY.md §7 hard-list #3). The
classic scalable composition is the *union-merge*: tag both sides, union,
sort within each key partition by (ts, tag), and carry the last right-side
payload forward with ``last(..., ignorenulls=True)``. This costs exactly ONE
shuffle on the join key — no row explosion, no conditional-join + dedup — so
it survives 100 TB (contrast a naive ``l.ts >= r.ts`` conditional join whose
intermediate is O(|L|·|R|) per key).

Tag ordering encodes strictness at equal timestamps:
- strict (right.ts <  left.ts): left sorts BEFORE right at equal ts, so an
  equal-ts right row is not yet visible.
- non-strict (right.ts <= left.ts): right sorts before left.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_ts] < left[left_ts]`` (strict) or ``<=`` (non-strict),
    matching on key ``on``. Right payload columns come back suffixed.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    lrow = F.struct(*[F.col(c) for c in left.columns])
    rrow = F.struct(*[F.col(c) for c in [right_ts, *right_cols]])
    lrow_type = left.select(lrow.alias("s")).schema["s"].dataType
    rrow_type = right.select(rrow.alias("s")).schema["s"].dataType

    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(l_tag).alias("_tag"),
        lrow.alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        rrow.alias("_rrow"),
    )

    merged = lhs.unionByName(rhs)
    # _rrow as the final sort key makes the survivor among equal right
    # timestamps deterministic (max payload struct); left rows all carry
    # null _rrow and never tie against right rows (tags differ).
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_tag", "_rrow")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))

    out = carried.where(F.col("_lrow").isNotNull()).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{right_ts}").alias(f"{right_ts}{suffix}")],
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


@query(
    "q14_purchase_prior_event",
    oracle="""
SELECT p.event_id,
       p.user_id,
       e.event_type                            AS prev_type,
       epoch_us(p.ts) - epoch_us(e.ts)         AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN events e
  ON p.user_id = e.user_id AND e.ts < p.ts
""",
)
def q14_purchase_prior_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the immediately preceding event of the same
    user (backward as-of join, strict). Oracle uses DuckDB's native ASOF JOIN;
    DuckDB's ASOF is an inner join, so unmatched purchases are filtered here
    too."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    joined = asof_join(
        purchases,
        e,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_type"],
        strict=True,
    )
    return joined.where(F.col("ts_right").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("event_type_right").alias("prev_type"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_right").cast("timestamp"))
        ).alias("gap_us"),
    )
