"""Analytics module tests: accuracy bounds for the sketch/approximate
scale paths (which have no DuckDB oracle) and physical-plan properties
for the exact ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from gridded_etl_tools_spark.plans import analytics
from gridded_etl_tools_spark.plans.tables import load

from tests.test_plans import count_nodes, formatted_plan

SF_DIR = "/root/testdata/sf0.001"


def test_hll_daily_estimate_within_3pct(spark):
    exact = {
        r["day"]: r["n_users"]
        for r in analytics.distinct_users_daily(spark, SF_DIR).collect()
    }
    approx = {
        r["day"]: r["approx_users"]
        for r in analytics.approx_distinct_users_daily(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(3, 0.03 * n)


def test_hll_weekly_rollup_matches_exact_weekly(spark):
    ev = load(spark, SF_DIR, "events").withColumn(
        "week", F.date_trunc("week", "ts")
    )
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy("week")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["week"]: r["approx_users"]
        for r in analytics.sketch_rollup_weekly(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for week, n in exact.items():
        assert abs(approx[week] - n) <= max(3, 0.03 * n)


def test_approx_percentiles_close_to_exact(spark):
    exact = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"], r["p90"])
        for r in analytics.value_percentiles(spark, SF_DIR).collect()
    }
    approx = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"], r["p90"])
        for r in analytics.approx_value_percentiles(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for et, ps in exact.items():
        spread = max(ps) - min(ps) or 1.0
        for e, a in zip(ps, approx[et]):
            assert abs(a - e) <= 0.05 * spread


def test_climatology_broadcasts_back_onto_facts(spark):
    """The climatology table must broadcast; the fact scan must not be
    shuffled for the join."""
    plan = formatted_plan(spark, "climatology_anomaly_topk")
    assert count_nodes(plan, "BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_climatology_topk_is_take_ordered(spark):
    plan = formatted_plan(spark, "climatology_anomaly_topk")
    assert "TakeOrderedAndProject" in plan


def test_dispersion_single_hash_aggregate(spark):
    """Moment statistics are one partial+final hash aggregate — no join,
    no window, one exchange."""
    plan = formatted_plan(spark, "dispersion_stats")
    assert count_nodes(plan, "HashAggregate") == 2
    assert "Join" not in plan
    assert "Window" not in plan


def test_histogram_is_map_side_binning(spark):
    plan = formatted_plan(spark, "value_histogram")
    assert count_nodes(plan, "HashAggregate") == 2
    assert "Join" not in plan
