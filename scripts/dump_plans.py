#!/usr/bin/env python3
"""Regenerate PLANS.md: formatted executed plans for the headline
queries, with the scale-relevant properties called out.  Run after any
plan-shape change:

    python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gridded_etl_tools_spark.plans.catalog import QUERIES  # noqa: E402
from gridded_etl_tools_spark.session import get_session  # noqa: E402

#: (query, what to look for in the plan — the property the shape exists
#: to deliver)
SHOWCASE = [
    ("q1_pricing_summary", "one partial+final hash agg; filter and 7-column "
     "projection pushed into the parquet scan (PushedFilters / ReadSchema)"),
    ("q6_revenue_filter", "pure scan-side query: every predicate in "
     "PushedFilters, aggregate without any exchange beyond the final gather"),
    ("q9_product_profit", "LIKE-pruned part dim BROADCAST into the lineitem "
     "scan; the only wide exchange is the final (nation, year) agg"),
    ("session_stats", "single Exchange on the entity key; both the lag "
     "window and the session rollup reuse it"),
    ("minhash_lsh_candidates", "band table checkpointed ONCE (r14) so the "
     "shingle+md5 signature pipeline never runs per join side; the join "
     "carries (band, hash, id) only"),
    ("ivf_ann_topk", "centroid book broadcast (1-row pack), cell equi-join, "
     "per-probe top-k window — corpus vectors never cross-joined"),
    ("bloom_two_phase_dedup", "bit_or-folded filter words broadcast back; "
     "the corpus is never a shuffled join side"),
    ("hll_distinct_users_daily", "facts reduce to (day, bucket) registers "
     "in one agg; estimate arithmetic runs on the register table"),
    ("conversion_funnel", "one entity-keyed window chain; final rollup is "
     "a SinglePartition exchange carrying three longs"),
    ("tfidf_top_terms", "explode -> two hash aggs -> df table broadcast "
     "back; TakeOrdered for the top-k"),
    # round-5 scale reworks
    ("join_key_skew_report", "top-10 keys plan as TakeOrderedAndProject "
     "(per-partition partial top-k), never a row_number window over the "
     "whole key axis"),
    ("event_value_deciles", "grouped_ntile: per-(type, value-bucket) "
     "prefix counts — 5 keyed exchanges, zero single-partition stages, "
     "no fact-sized per-type window task"),
    ("rolling_hour_stats_bucketed", "trailing 1-hour RANGE window per "
     "(type, hour-bucket) with ghost-row overlap replication — bounded "
     "tasks; frame sum is exact decimal so it equals the sequential "
     "window bit-for-bit"),
    ("pareto_part_classes", "cumulative revenue share via two-level "
     "bucketed decimal prefix sum; the single-partition stages run on "
     "the bucket-totals axis only"),
    ("rolling_volatility", "ROWS -6..0 stddev frame per (type, 512-row "
     "block) with block-boundary ghost replication — one keyed exchange "
     "behind the positions barrier, identical frame content to the "
     "single-sequence window"),
    ("quantile_map_correction", "quantile mapping as grouped_rank_stats "
     "x2 + rank-axis bucketed LOCF — no fact-sized window partition; "
     "the rank-as-of union sits behind one localCheckpoint barrier"),
    ("event_value_rank_enrich", "exact ANSI rank/percent_rank/cume_dist "
     "from two-level positions + (type, value) tie-collapse — six keyed "
     "exchanges, zero single-partition stages"),
    # round-6 additions
    ("training_mix_end_to_end", "resample rates are a dim-sized "
     "broadcast + map-side hash filter (the corpus never shuffles to "
     "decide keeps); the one corpus exchange keys on the hash-uniform "
     "epoch shard"),
    ("hybrid_rrf_search", "each leg's top-20 plans as "
     "TakeOrderedAndProject; the fusion join and final re-rank run on "
     "<=20-row frames — the corpus is touched once per leg"),
    ("ivf_topk_auto", "the auto-vectorized data plane: ArrowEvalPython "
     "stages are batched matmuls, probed-cell semi filter keeps "
     "unprobed cells out of the scoring shuffle"),
    ("ddsketch_value_quantiles", "facts reduce once to (day, type, bin) "
     "counts; the merge agg and the cumulative quantile window run on "
     "the bounded bin axis (~550 rows per key), never the facts"),
    # round-7 additions
    ("hybrid_rrf_search_batch", "N queries, ONE corpus pass: posting-list "
     "aggs cover the term UNION, per-query fan-out is a broadcast "
     "(query_id, term) join; fusion windows PARTITION BY query_id on "
     "<=40-row frames"),
    ("kerchunkified_hdf5_decode", "HDF5 refs production end-to-end: the "
     "decode plan is a map-only manifest scan (no Exchange) — the "
     "kerchunkify fan-out and concat merge never enter the data plane"),
    ("ivfpq_index_query_readback", "IVF+PQ: the cells scan carries "
     "PartitionFilters on centroid_id AND reads only m-byte code arrays "
     "(62.5x fewer bytes than raw vectors); probe ADC tables broadcast, "
     "scoring is per-code table lookups"),
    # round-12 additions
    ("kerchunkified_parquet_refs_readback", "the distributed refs-merge "
     "readback: the measured plan is a map-only slab-manifest scan (no "
     "Exchange) — the write pipeline's validation, offset window, and "
     "per-slab tasks are their own jobs that never touch the data "
     "plane, and the driver parses ONE refs doc"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("plans_dump")
    out = [
        "# PLANS — executed physical plans of the headline queries",
        "",
        f"Auto-generated by `scripts/dump_plans.py` at {sf_dir} "
        "(plan SHAPE is scale-invariant; AQE numbers are local).",
        "Each section names the property the plan exists to deliver — "
        "the thing `tests/test_plans.py` pins in CI.",
        "",
    ]
    for name, why in SHOWCASE:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # strip volatile ids so regeneration diffs cleanly
        plan = re.sub(r"#\d+L?", "#x", plan)
        plan = re.sub(r"\[plan_id=\d+\]", "[plan_id=x]", plan)
        plan = re.sub(r"file:[^\s,\]]+", "file:<path>", plan)
        out += [f"## {name}", "", f"**Why this shape:** {why}", "",
                "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
