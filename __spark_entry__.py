"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``copy_sharepoint_to_onelake_lakehousefiles_spark/``;
this module just re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:  # driver may import this module from another cwd
    sys.path.insert(0, _HERE)

import copy_sharepoint_to_onelake_lakehousefiles_spark as engine

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.relational import (
        q01_pricing_summary,
    )

    return q01_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return engine.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; non-SQL ops
    (copy subsystem, LSH/SimHash approximations, media plumbing, language-ID)
    are intentionally absent → rows-only check."""
    return engine.all_oracles()
