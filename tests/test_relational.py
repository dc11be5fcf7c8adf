"""Relational operator semantics + physical-plan assertions (the 100 TB
posture is checked here: pushdown reaches the scan, dims broadcast, no
cartesian products sneak in)."""

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import relational as R
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_semi_anti_partition_customers(spark, sf_dir):
    """Semi ∪ anti = all customers; semi ∩ anti = ∅ (same predicate)."""
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
    anti = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.select("c_custkey").intersect(anti.select("c_custkey")).count() == 0


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    plan = R.q01_pricing_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q03_broadcasts_dims(spark, sf_dir):
    plan = R.q03_regional_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_q01_column_pruning(spark, sf_dir):
    """The scan must read only the columns the query touches, not all 11."""
    plan = R.q01_pricing_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "l_orderkey" not in scan and "l_partkey" not in scan


def test_topk_per_group_matches_pandas(spark, sf_dir):
    got = (
        R.q06_top3_orders_per_customer(spark, sf_dir)
        .orderBy("o_custkey", "rn")
        .toPandas()
    )
    orders = load(spark, sf_dir, "orders").toPandas()
    orders = orders.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    )
    expect = orders.groupby("o_custkey").head(3)
    assert len(got) == len(expect)
    assert set(got["o_orderkey"]) == set(expect["o_orderkey"])


def test_rollup_grand_total(spark, sf_dir):
    df = R.q08_rollup_region_nation(spark, sf_dir).toPandas()
    grand = df[df["r_name"].isna() & df["n_name"].isna()]
    assert len(grand) == 1
    assert int(grand["n_customers"].iloc[0]) == load(spark, sf_dir, "customer").count()


def test_approx_distinct_within_5pct(spark, sf_dir):
    for r in R.q38_approx_distinct(spark, sf_dir).collect():
        assert r["parts_within_5pct"] == 1
        assert r["orders_within_5pct"] == 1
        assert r["exact_parts"] > 0 and r["exact_orders"] > 0


def test_cube_has_all_grouping_levels(spark, sf_dir):
    df = R.q33_cube_priority_status(spark, sf_dir).toPandas()
    total = load(spark, sf_dir, "orders").count()
    # grand total row
    grand = df[df["o_orderpriority"].isna() & df["o_orderstatus"].isna()]
    assert int(grand["n_orders"].iloc[0]) == total
    # every level sums back to the total
    lvl1 = df[df["o_orderpriority"].notna() & df["o_orderstatus"].isna()]
    lvl2 = df[df["o_orderpriority"].isna() & df["o_orderstatus"].notna()]
    both = df[df["o_orderpriority"].notna() & df["o_orderstatus"].notna()]
    assert int(lvl1["n_orders"].sum()) == total
    assert int(lvl2["n_orders"].sum()) == total
    assert int(both["n_orders"].sum()) == total


def test_approx_percentile_close_to_exact(spark, sf_dir):
    for r in R.q63_approx_percentiles(spark, sf_dir).collect():
        assert r["median_within_1pct"] == 1
        assert r["p95_within_1pct"] == 1
        assert 0 < r["exact_median"] <= r["exact_p95"]
