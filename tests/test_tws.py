"""transformWithStateInPandas operator: gated on protobuf availability (the
state-server protocol dependency); the processor class shape is always
testable, the end-to-end drain only where protobuf exists."""

import pytest

from copy_sharepoint_to_onelake_lakehousefiles_spark.streaming import tws


def test_registration_matches_environment():
    from copy_sharepoint_to_onelake_lakehousefiles_spark import all_queries

    assert ("q81_stream_tws_profile" in all_queries()) == tws.TWS_AVAILABLE


def test_processor_class_builds():
    cls = tws.build_user_profile_processor()
    proc = cls()
    assert hasattr(proc, "init") and hasattr(proc, "handleInputRows")


@pytest.mark.skipif(not tws.TWS_AVAILABLE, reason="google.protobuf not installed")
def test_tws_profile_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load

    got = {r["user_id"]: r for r in tws.user_profile_tws(spark, sf_dir).collect()}
    exp = {
        r["user_id"]: r
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for uid, r in got.items():
        assert r["n_events"] == exp[uid]["n_events"]
        assert r["n_types"] == exp[uid]["n_types"]
