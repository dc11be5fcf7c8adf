"""Path scalar functions (lakehouse_dest_path NB:254-263, '//' normalization
NB:242/263/290) as built-in column expressions — no UDF."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_slashes(col: Column | str) -> Column:
    return F.regexp_replace(col, "/{2,}", "/")


def join_path(*parts: Column) -> Column:
    return normalize_slashes(F.concat_ws("/", *parts))
