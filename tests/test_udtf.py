"""Python UDTF demo: lateral-join expansion matches posexplode."""

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.functions.udtf_demo import (
    STOPWORDS,
    TokenizeUDTF,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_udtf_matches_posexplode(spark, sf_dir):
    d = load(spark, sf_dir, "documents").limit(20).select("doc_id", "text")
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    got = spark.sql(
        "SELECT doc_id, token, pos FROM _udtf_docs, LATERAL tokenize_udtf(text)"
    )
    want = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", "token", "pos")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_udtf_stopword_flag(spark, sf_dir):
    d = load(spark, sf_dir, "documents").limit(5).select("text")
    d.createOrReplaceTempView("_udtf_docs2")
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    rows = spark.sql(
        "SELECT token, is_stopword FROM _udtf_docs2, LATERAL tokenize_udtf(text)"
    ).collect()
    for r in rows:
        assert r["is_stopword"] == (r["token"] in STOPWORDS)
