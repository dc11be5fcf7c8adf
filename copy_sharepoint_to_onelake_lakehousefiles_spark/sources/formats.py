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


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default; columnar + predicate-pushdown-capable, the
    Hive-ecosystem twin of parquet)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — schema comes from the file footer (self-describing, unlike
    CSV/JSON); filter/column pushdown works exactly as for parquet."""
    return spark.read.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """spark-avro is an external module (org.apache.spark:spark-avro); absent
    in this container. Probe cheaply via the DataSource registry."""
    try:
        jvm = spark._jvm
        jvm.org.apache.spark.sql.avro.AvroFileFormat  # noqa: B018
        return True
    except Exception:
        return False
