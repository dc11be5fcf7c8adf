"""Query registry.

Each operator registers a named query builder ``(spark, sf_dir) -> DataFrame``
and, when the semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string.
The driver harness compares the two (row count + schema + order-insensitive
value hash), so builders must alias every computed column to the same name the
oracle uses.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder; ``oracle`` is the equivalent DuckDB SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        fn.query_name = name
        return fn

    return deco
