"""Bucketed-table co-located join: the pay-the-shuffle-once layout.

Pins the whole point of the module: a join between two tables bucketed
identically on the join key plans with ZERO Exchange nodes — the shuffle
happened at write time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridded_etl_tools_spark.sinks import bucketed


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    bucketed.register_database(spark, "bucketdb", str(loc))
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    facts = spark.range(0, 10000).select(
        (F.col("id") % 500).alias("user_id"), F.col("id").alias("event_id")
    )
    profiles = spark.range(0, 500).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("score")
    )
    bucketed.write_bucketed(facts, f"{bucket_db}.facts", 8, ["user_id"])
    bucketed.write_bucketed(profiles, f"{bucket_db}.profiles", 8, ["user_id"])

    # force the join strategy that would normally shuffle: no broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.bucketed_join(
            spark, f"{bucket_db}.facts", f"{bucket_db}.profiles", on=["user_id"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it's still correct
        assert joined.count() == 10000
        row = joined.filter(F.col("event_id") == 7).first()
        assert row["score"] == row["user_id"] * 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correctness_matches_plain_join(spark, bucket_db):
    facts = spark.table(f"{bucket_db}.facts")
    profiles = spark.table(f"{bucket_db}.profiles")
    bucketed_sum = (
        bucketed.bucketed_join(
            spark, f"{bucket_db}.facts", f"{bucket_db}.profiles", on=["user_id"]
        )
        .agg(F.sum("score"))
        .first()[0]
    )
    plain_sum = facts.join(profiles, on="user_id").agg(F.sum("score")).first()[0]
    assert bucketed_sum == plain_sum
