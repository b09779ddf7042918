#!/usr/bin/env python3
"""Reproducible scale A/B harness (BASELINE.md "Measured (round 5)").

Builds a 10M-row events set (100 shifted copies of sf0.1) plus a
SKEWED variant (one user owns ~30% of rows), then times the plain
single-task / unsalted forms against the engine's two-level / salted
operators with the noop sink.  Wall-clock on one box understates the
cluster gap — the interesting number is the RUNNING TASK COUNT, which
bounds what a 1000-executor cluster could use.

Usage: python scripts/ab_scale.py [copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.operators.aggregations import (  # noqa: E402
    bucketed_locf,
    bucketed_sliding_rows_window,
    global_ntile,
    grouped_ntile,
    grouped_rank_stats,
)
from gridded_etl_tools_spark.operators.skew import (  # noqa: E402
    salted_join,
    two_phase_agg,
)
from gridded_etl_tools_spark.session import get_session  # noqa: E402

BIG = "/tmp/spark_graft_bigevents"
SKEWED = "/tmp/spark_graft_bigevents_skewed"


def build(spark, copies: int) -> None:
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    df = ev.crossJoin(
        spark.range(copies).select(F.col("id").alias("__c"))
    ).select(
        (F.col("event_id") + F.col("__c") * 10_000_000).alias("event_id"),
        (F.col("user_id") + F.col("__c") * 1000).alias("user_id"),
        F.col("event_type"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + ((F.col("event_id") * F.col("__c")) % 86_400_000_000)
            - 43_200_000_000
        ).alias("ts"),
        (F.col("value") + (F.col("__c") % 7) * 0.01).alias("value"),
    )
    df.write.mode("overwrite").parquet(BIG)
    # skewed variant: ~30% of rows collapse onto user 0
    spark.read.parquet(BIG).withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 3, F.lit(0)).otherwise(
            F.col("user_id")
        ),
    ).write.mode("overwrite").parquet(SKEWED)


def timeit(tag: str, df) -> None:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"AB {tag}: {time.time() - t0:.1f}s", flush=True)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_session("ab_scale")
    if not (
        os.path.exists(os.path.join(BIG, "_SUCCESS"))
        and os.path.exists(os.path.join(SKEWED, "_SUCCESS"))
    ):
        build(spark, copies)
    ev = spark.read.parquet(BIG)
    ev.count()  # warm

    # -- window classes ------------------------------------------------
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    timeit("ntile_single_task",
           ev.withColumn("d", F.ntile(10).over(w)).groupBy("event_type", "d").count())
    timeit("ntile_grouped", grouped_ntile(
        ev.withColumn("__bkt", F.floor(F.col("value") / 5.0)), 10,
        order_by=[F.col("value").asc(), F.col("event_id").asc()],
        bucket_col="__bkt", partition_cols=["event_type"], tile_col="d",
    ).groupBy("event_type", "d").count())

    wg = Window.partitionBy(F.lit(0)).orderBy("value", "event_id")
    timeit("global_ntile_single_task",
           ev.withColumn("d", F.ntile(100).over(wg)).groupBy("d").count())
    timeit("global_ntile_two_level", global_ntile(
        ev.withColumn("__bkt", F.floor(F.col("value") / 2.0)), 100,
        order_by=[F.col("value").asc(), F.col("event_id").asc()],
        bucket_col="__bkt", tile_col="d",
    ).groupBy("d").count())

    wr = Window.partitionBy("event_type").orderBy("value")
    timeit("ranks_single_task", ev.select(
        "event_id", F.rank().over(wr).alias("r"),
        F.percent_rank().over(wr).alias("pr"),
        F.cume_dist().over(wr).alias("cd")))
    timeit("ranks_grouped", grouped_rank_stats(
        ev.withColumn("__bkt", F.floor(F.col("value") / 5.0)),
        partition_cols=["event_type"], value_col="value",
        bucket_col="__bkt", order_tiebreak=[F.col("event_id").asc()],
    ).select("event_id", "rank", "percent_rank", "cume_dist"))

    punched = ev.withColumn(
        "v", F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value"))
    )
    wl = (Window.partitionBy("event_type").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0))
    timeit("locf_single_task", punched.select(
        "event_id", F.last("v", ignorenulls=True).over(wl).alias("f")))
    timeit("locf_bucketed", bucketed_locf(
        punched.withColumn(
            "__bkt",
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000),
        ),
        keys=["event_type"], order_by=[F.col("ts"), F.col("event_id")],
        value_col="v", bucket_col="__bkt").select("event_id", "filled"))

    wf = (Window.partitionBy("event_type").orderBy("ts", "event_id")
          .rowsBetween(-6, 0))
    timeit("rows_stddev_single_task", ev.select(
        "event_id", F.stddev_samp("value").over(wf).alias("s")))
    timeit("rows_stddev_blocked", bucketed_sliding_rows_window(
        ev.withColumn(
            "__bkt",
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000),
        ),
        keys=["event_type"], order_by=[F.asc("ts"), F.asc("event_id")],
        n_preceding=6, bucket_col="__bkt",
        frame_aggs={"s": F.stddev_samp("value")}).select("event_id", "s"))

    # -- skew ----------------------------------------------------------
    sk = spark.read.parquet(SKEWED)
    sk.count()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timeit("skew_agg_plain", sk.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")))
    timeit("skew_agg_two_phase", two_phase_agg(
        sk, ["user_id"], {"value": ["count", "sum"]}, salt_buckets=32))
    users = sk.select("user_id").distinct().withColumn(
        "segment", F.col("user_id") % 7
    ).localCheckpoint(eager=True)
    big_join = sk.join(users.hint("shuffle_hash"), "user_id")
    timeit("skew_join_plain_noaqe", big_join.groupBy("segment").count())
    timeit("skew_join_salted", salted_join(
        sk, users, on=["user_id"], salt_buckets=32,
        salt_source_cols=["event_id"],
    ).groupBy("segment").count())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timeit("skew_join_plain_aqe", big_join.groupBy("segment").count())


if __name__ == "__main__":
    main()
