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
