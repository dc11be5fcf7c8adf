"""Vector math as built-in higher-order functions (no UDFs, no Arrow hop).

zip_with/aggregate run inside whole-stage codegen; accumulation is in array
order and in DOUBLE, which keeps results bit-identical to the DuckDB oracle's
list_dot_product over DOUBLE[] casts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(F.expr(f"aggregate({a}, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)"))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pandas_udf():
    """Vectorized (Arrow-batched) cosine as a @pandas_udf — the fallback for
    vector math that outgrows SQL higher-order functions (e.g. >>64 dims,
    where per-element codegen loses to numpy BLAS). Returns a UDF of
    (array<float>, array<float>) -> double."""
    from pyspark.sql.functions import pandas_udf

    # Type-hint style (the PandasUDFType enum is deprecated). Postponed
    # annotations stringify the hints, so pd must be a module-level import
    # for pandas_udf's get_type_hints resolution to see it.
    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.to_numpy())
        bm = np.stack(b.to_numpy())
        num = (am * bm).sum(axis=1)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(num / den)

    return _cos


def weighted_mean_udaf():
    """True UDAF shape: a GROUPED_AGG @pandas_udf — the whole group's column
    pair arrives as pandas Series, one scalar returns per group. Used by q98
    (grouped weighted mean); Spark runs it as a real aggregate (partial
    batches per group via Arrow), unlike applyInPandas which materializes the
    group as a DataFrame.

    Scale: GROUPED_AGG state is the group's data in memory per task — fine
    for bounded groups (event types); for unbounded groups prefer the
    algebraic decomposition (sum(w*x)/sum(w) in builtins, see the q98 oracle
    — which is also the plan to choose at 100 TB; q98 exists to cover the
    UDAF API surface with a verified twin)."""
    from pyspark.sql.functions import pandas_udf

    # Type-hint style: Series, Series -> scalar float marks a grouped-agg
    # pandas UDF (the PandasUDFType enum is deprecated).
    @pandas_udf("double")
    def _wmean(x: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((x * w).sum() / denom) if denom else float("nan")

    return _wmean
