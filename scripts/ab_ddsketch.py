#!/usr/bin/env python3
"""Scale A/B for the DDSketch quantile path (BASELINE.md "Measured
(round 6)"): mergeable log-gamma histograms vs Spark's exact
``percentile`` at tens of millions of rows.

The exact form materializes a per-group sorted buffer (memory and time
grow with group size — at 100 TB a single hot group OOMs its task);
the sketch form reduces facts ONCE to ≤~550 (key, bin) counts per key
and answers any quantile from arithmetic on that dim-sized table.  The
same sketch also answers every ROLLUP grain (day → week → all-time) by
count addition, where the exact form must re-scan the facts per grain.

Usage: python scripts/ab_ddsketch.py [copies]   (copies x 100k events)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gridded_etl_tools_spark.operators.sketches import (  # noqa: E402
    dd_histogram,
    dd_merge,
    dd_quantiles,
)
from gridded_etl_tools_spark.session import get_session  # noqa: E402


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    src = (
        ev.crossJoin(spark.range(copies).select(F.col("id").alias("__c")))
        .select(
            "event_type",
            F.timestamp_add(
                "DAY", (F.col("__c") % 365).cast("int"),
                F.col("ts").cast("timestamp"),
            ).alias("ts"),
            # vary values across copies so quantiles aren't degenerate
            (F.col("value") * (1.0 + (F.col("__c") % 97) / 97.0)).alias(
                "value"
            ),
        )
        .localCheckpoint(eager=True)
    )
    n = src.count()
    print(f"rows={n:,}")

    t0 = time.time()
    exact = (
        src.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("p"))
        .collect()
    )
    t_exact = time.time() - t0
    print(f"A  exact percentile (per-group sorted buffer): {t_exact:.1f}s")

    t0 = time.time()
    daily = dd_histogram(
        src.withColumn("day", F.date_trunc("day", "ts")),
        ["day", "event_type"],
        "value",
    ).localCheckpoint(eager=True)  # the reusable mergeable state
    t_sketch = time.time() - t0
    bins = daily.count()
    t0 = time.time()
    got = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in dd_quantiles(
            dd_merge(daily, ["event_type"]), ["event_type"], [0.5, 0.9, 0.99]
        ).collect()
    }
    t_q = time.time() - t0
    print(
        f"B  dd_histogram (one fact agg -> {bins:,} (day,type,bin) rows): "
        f"{t_sketch:.1f}s; all-time p50/p90/p99 from the merged bins: "
        f"{t_q:.1f}s"
    )
    # weekly grain answered from the SAME state — no fact re-scan
    t0 = time.time()
    weekly = dd_quantiles(
        dd_merge(
            daily.withColumn("week", F.date_trunc("week", "day")),
            ["week", "event_type"],
        ),
        ["week", "event_type"],
        [0.5, 0.9],
    ).count()
    t_week = time.time() - t0
    print(f"   weekly grain ({weekly} groups) from the same bins: {t_week:.1f}s")

    worst = 0.0
    for r in exact:
        es = got[r["event_type"]]
        for i in range(3):
            worst = max(worst, abs(es[i] - r["p"][i]) / r["p"][i])
    print(
        f"   max relative error vs exact: {worst:.4%} "
        f"(published bound ~0.99% at gamma=1.02)"
    )
    print(f"   speedup {t_exact / (t_sketch + t_q):.1f}x for the first "
          f"quantile set; every further grain/quantile is bin arithmetic")


if __name__ == "__main__":
    main()
