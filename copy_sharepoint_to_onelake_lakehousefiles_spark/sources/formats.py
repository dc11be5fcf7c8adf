"""Format sources: CSV / JSON-lines readers with DECLARED schemas.

The reference consumes dynamic JSON with `.get()` defaults everywhere
(NB:210, NB:223); the engine's rule (SURVEY §1.3) is schema-on-read with an
explicit StructType — no sampling-based inference job (which at 100 TB is a
full extra pass), no silent type drift. `columnNameOfCorruptRecord` keeps
bad rows visible instead of dropped."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..registry import materialize, query


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


@query(
    "q125_format_roundtrip",
    oracle="""
SELECT r_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       round(sum(s_acctbal), 2) AS total_bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def q125_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-format federation round-trip: supplier is rewritten as ORC,
    nation as headered CSV, region as JSON-lines; the three are read back
    through the declared-schema readers and joined into a per-region
    supplier profile. The oracle computes the same join from the original
    parquet, so the gate proves every format preserves values exactly
    (CSV doubles survive because Spark writes shortest-round-trip decimals).

    Scale: format choice changes the scan layer only — the join/agg plan
    (broadcast dims, partial aggregation) is identical to the parquet path;
    CSV/JSON pay schema-on-read parsing but never an inference pass."""
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from ..tables import load

    root = os.path.join(tempfile.gettempdir(), f"fmt_rt_{uuid.uuid4().hex[:8]}")
    sup, nat, reg = (load(spark, sf_dir, t) for t in ("supplier", "nation", "region"))
    write_orc(sup, f"{root}/supplier_orc")
    nat.write.option("header", "true").csv(f"{root}/nation_csv")
    reg.write.json(f"{root}/region_jsonl")

    sup2 = read_orc(spark, f"{root}/supplier_orc")
    nat2 = read_csv(
        spark, f"{root}/nation_csv",
        "n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    reg2 = read_jsonl(spark, f"{root}/region_jsonl", "r_regionkey INT, r_name STRING")

    out = (
        sup2.join(F.broadcast(nat2), sup2.s_nationkey == nat2.n_nationkey)
        .join(F.broadcast(reg2), nat2.n_regionkey == reg2.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
    )
    result = materialize(out)  # executor-side re-write; no driver collect
    shutil.rmtree(root, ignore_errors=True)
    return result
