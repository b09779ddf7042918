#!/usr/bin/env python3
"""Reproduce the in-suite scale-row degradation: run several
checkpoint-heavy catalog rows for N passes (piling localCheckpoint +
broadcast blocks the way a full bench pass does), then time the scale
rows.  With PERIODIC_GC=1 the session sets
``spark.cleaner.periodicGC.interval`` low so the ContextCleaner can
actually release the blocks (the default is 30 min — i.e. never within
a bench run, because cleanup waits on a driver JVM GC to enqueue the
weak references).

Usage: [PERIODIC_GC=1] python scripts/ab_gc_pressure.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gridded_etl_tools_spark.plans.catalog import QUERIES  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PRESSURE = [
    "kmeans_centroids", "kmeans_auto_centroids", "semantic_dedup_flags",
    "quantile_map_correction", "rolling_hour_stats_bucketed",
    "tfidf_top_terms", "minhash_lsh_candidates", "pq_ann_topk",
    "ivf_ann_topk", "rfm_segments",
]
SCALE = ["scale_hash_rollup_32x", "scale_rank_shuffle_16x"]


def main() -> None:
    extra = (
        {"spark.cleaner.periodicGC.interval": "45s"}
        if os.environ.get("PERIODIC_GC")
        else {}
    )
    spark = get_session("ab_gc_pressure", extra_conf=extra)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite").save()
        return time.perf_counter() - t0

    for name in SCALE:
        run(name)  # warm
    print("fresh-session scale rows:",
          {n: round(run(n), 3) for n in SCALE}, flush=True)
    for p in range(4):
        t0 = time.perf_counter()
        for name in PRESSURE:
            run(name)
        print(f"pressure pass {p}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    for n in SCALE:
        samples = [run(n) for _ in range(5)]
        print(f"post-pressure {n}: median={statistics.median(samples):.3f} "
              f"samples={[round(s, 3) for s in samples]}", flush=True)


if __name__ == "__main__":
    main()
