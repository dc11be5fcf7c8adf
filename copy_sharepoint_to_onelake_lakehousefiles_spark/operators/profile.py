"""Column-level data profiling: null counts, distinct counts, min/max per
column in ONE pass — the data-quality screen a training pipeline runs before
ingesting a new source (generalizes the reference's run-log counters into a
queryable profile table).

Scale: a single wide aggregation computes every column's stats in one scan
(countDistinct columns expand the scan internally via Catalyst's Expand —
still one file read, no per-column jobs); the result is |columns| rows. For
100 TB swap the exact countDistinct for approx_count_distinct — same plan
shape, sketch-sized state (q38 demonstrates the HLL variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# (column, is_numeric) — the events table's profile spec; ts is excluded
# (timestamp formatting is engine-specific; see q12/q37 for time handling).
_EVENT_COLS = [
    ("event_id", True),
    ("user_id", True),
    ("value", True),
    ("event_type", False),
    ("props", False),
]


def _duck_profile_sql() -> str:
    branches = []
    for c, numeric in _EVENT_COLS:
        mn = f"round(CAST(min({c}) AS DOUBLE), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"round(CAST(max({c}) AS DOUBLE), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        ms = "CAST(NULL AS VARCHAR)" if numeric else f"min({c})"
        xs = "CAST(NULL AS VARCHAR)" if numeric else f"max({c})"
        branches.append(
            f"SELECT '{c}' AS col_name, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, {ms} AS min_str, {xs} AS max_str "
            f"FROM events"
        )
    return "\nUNION ALL ".join(branches)


@query("q97_column_profile", oracle=_duck_profile_sql())
def q97_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile every (non-timestamp) events column: one wide agg, then an
    unpivot to the long (col_name, stats...) layout. The oracle recomputes
    each column's stats as a UNION ALL — N scans there, ONE here."""
    e = load(spark, sf_dir, "events")
    aggs = []
    for c, numeric in _EVENT_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"nd_{c}"))
        if numeric:
            aggs.append(F.round(F.min(c).cast("double"), 4).alias(f"mn_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), 4).alias(f"mx_{c}"))
        else:
            aggs.append(F.min(c).alias(f"ms_{c}"))
            aggs.append(F.max(c).alias(f"xs_{c}"))
    wide = e.agg(*aggs)
    rows = []
    for c, numeric in _EVENT_COLS:
        # Every arg is wrapped in a cast: stack() requires IDENTICAL struct
        # field names across rows, and bare column refs leak their names.
        mn = f"cast(mn_{c} as double)" if numeric else "cast(null as double)"
        mx = f"cast(mx_{c} as double)" if numeric else "cast(null as double)"
        ms = "cast(null as string)" if numeric else f"cast(ms_{c} as string)"
        xs = "cast(null as string)" if numeric else f"cast(xs_{c} as string)"
        rows.append(
            f"'{c}', cast(nn_{c} as bigint), cast(nd_{c} as bigint), {mn}, {mx}, {ms}, {xs}"
        )
    stack = (
        f"stack({len(_EVENT_COLS)}, {', '.join(rows)}) AS "
        "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return wide.selectExpr(stack)
