"""Vector math as built-in higher-order functions (no UDFs, no Arrow hop).

zip_with/aggregate run inside whole-stage codegen; accumulation is in array
order and in DOUBLE, which keeps results bit-identical to the DuckDB oracle's
list_dot_product over DOUBLE[] casts.
"""

from __future__ import annotations

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
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses postponed annotations,
    # which turn the type hints into strings that pandas_udf cannot infer.
    @pandas_udf("double", PandasUDFType.SCALAR)
    def _cos(a, b):
        am = np.stack(a.to_numpy())
        bm = np.stack(b.to_numpy())
        num = (am * bm).sum(axis=1)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(num / den)

    return _cos
