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

# DataFrames persisted inside query builders (self-join inputs read twice
# within one returned plan). They cannot be unpersisted before the CALLER's
# terminal action, so builders register them via track_persist() and the
# next query invocation releases them — cache residency is bounded to one
# query instead of accumulating across a 115-query gate/bench session.
_TRACKED_CACHES: list[Any] = []


def track_persist(df):
    """persist() a DataFrame and schedule it for release when the NEXT
    registered query starts (or on an explicit release_caches())."""
    df.persist()
    _TRACKED_CACHES.append(df)
    return df


def release_caches() -> None:
    while _TRACKED_CACHES:
        try:
            _TRACKED_CACHES.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def query(name: str, oracle: str | None = None):
    """Register a query builder; ``oracle`` is the equivalent DuckDB SQL."""

    def deco(fn):
        def wrapped(spark, sf_dir):
            release_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.query_name = name
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        fn.query_name = name
        return fn

    return deco
