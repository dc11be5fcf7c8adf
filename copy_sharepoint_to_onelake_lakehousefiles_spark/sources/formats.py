"""Format sources: CSV / JSON-lines readers with DECLARED schemas.

The reference consumes dynamic JSON with `.get()` defaults everywhere
(NB:210, NB:223); the engine's rule (SURVEY §1.3) is schema-on-read with an
explicit StructType — no sampling-based inference job (which at 100 TB is a
full extra pass), no silent type drift. `columnNameOfCorruptRecord` keeps
bad rows visible instead of dropped."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
