#!/usr/bin/env python3
"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is measured with the noop sink (full plan runs, no driver
collect), after a single untimed session warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gridded_etl_tools_spark.plans.catalog import QUERIES  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402

#: headline set: the flagship aggregation + the operators whose plans are
#: nontrivial at scale (window asof, LSH dedup, ANN, gaps-and-islands,
#: grouped reduce, jaccard verify)
HEADLINE = [
    "q1_pricing_summary",
    "daily_reduce",
    "rolling_mean",
    "update_split_insert",
    "asof_enrich",
    "tolerance_nearest",
    "gaps_islands",
    "reindex_dense_time",
    "minhash_signatures",
    "ngram_jaccard",
    "cosine_topk",
    "dedup_keep_first",
    "token_stats",
    "quality_scores",
    "q6_revenue_filter",
    "rollup_revenue",
    "session_stats",
    "windowed_event_counts",
    "ivf_ann_topk",
    "minhash_lsh_candidates",
    "simhash",
    "zorder_index",
    "concurrent_high_value_orders",
    "climatology_anomaly_topk",
    "sketch_rollup_weekly",
    "tfidf_top_terms",
    "q9_product_profit",
    "q17_small_quantity_revenue",
    "dispersion_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")

    # warm-up: JVM + parquet footer caches, untimed
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
