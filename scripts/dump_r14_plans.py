#!/usr/bin/env python3
"""Dump ``explain('formatted')`` for the round-14 optimization targets.

Usage: python scripts/dump_r14_plans.py <suffix> [query ...]

Writes ``plans/r14/<query>_<suffix>.txt`` (suffix = ``before`` at the
pre-optimization tree, ``after`` at the optimized tree) plus a one-line
Exchange census at the top of each file so plan-shape deltas are
greppable without reading the whole dump.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gridded_etl_tools_spark.plans.catalog import QUERIES  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402

DEFAULT_TARGETS = [
    "rolling_hour_stats_bucketed",
    "quantile_map_correction",
    "event_value_rank_enrich",
    "value_cume_dist_tail",
    "pq_ann_topk",
    "hybrid_rrf_search",
    "hybrid_rrf_search_batch",
    "kmeans_centroids",
    "kmeans_auto_centroids",
    "ivf_ann_topk",
    "ivf_topk_auto",
    "rfm_segments",
    "semantic_dedup_flags",
    "cosine_topk",
    "interpolate_gaps",
    "locf_event_fill_bucketed",
    "event_value_deciles",
    "user_activity_deciles",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    targets = sys.argv[2:] or DEFAULT_TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("dump_r14_plans")
    for name in targets:
        if name not in QUERIES:
            print(f"skip {name}: not in catalog")
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - best-effort dump
            plan = f"ERROR: {type(e).__name__}: {e}"
        import re

        ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.MULTILINE)
        n_hash = len(re.findall(r"Arguments: hashpartitioning", plan))
        n_single = len(re.findall(r"Arguments: SinglePartition", plan))
        census = (
            f"# Exchange hashpartitioning: {n_hash}  "
            f"SinglePartition: {n_single}  "
            f"BroadcastExchange: {ops.count('BroadcastExchange')}  "
            f"SortMergeJoin: {ops.count('SortMergeJoin')}  "
            f"BroadcastHashJoin: {ops.count('BroadcastHashJoin')}  "
            f"ShuffledHashJoin: {ops.count('ShuffledHashJoin')}  "
            f"Window: {ops.count('Window')}  "
            f"Sort: {ops.count('Sort')}  "
            f"LocalTableScan/Checkpoint barriers: "
            f"{ops.count('Scan') + plan.count('ExistingRDD')}\n"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(census + plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
