#!/usr/bin/env python3
"""Time individual catalog queries with the noop sink (1 warm-up pass +
N timed reps, median) — the per-query drill-down companion to bench.py.

Usage: SPARK_GRAFT_CPUS=32 python scripts/time_queries.py q1 q2 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gridded_etl_tools_spark.plans.catalog import QUERIES  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    names = sys.argv[1:]
    spark = get_session("time_queries")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        spark.sparkContext.setJobDescription(f"time: {name}")
        run(name)  # warm-up
        samples = [run(name) for _ in range(reps)]
        print(
            f"{name}: median={statistics.median(samples):.3f}s "
            f"samples={[round(s, 3) for s in samples]}"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
