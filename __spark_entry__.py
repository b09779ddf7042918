"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator catalog (one entry per
implemented operator from SURVEY.md §2 plus the north-star dedup /
similarity / text operators) — see
``gridded_etl_tools_spark/plans/catalog.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gridded_etl_tools_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# Queries already verified green by the round-1 driver sweep
# (CORRECTNESS_r01.json).  The driver caps its per-round check at ~50
# queries in registration order, so we rotate: queries with no
# correctness row yet come first, previously-green ones after.
_R1_CHECKED = frozenset({
    "q1_pricing_summary", "daily_reduce", "rolling_mean", "point_select",
    "range_select", "membership_semi", "update_split_insert",
    "update_split_append", "combine_first", "gaps_islands",
    "tolerance_nearest", "asof_enrich", "reindex_dense_time",
    "missing_combinations", "extent_bbox", "temporal_extent",
    "sentinel_normalize", "lon_standardize", "filename_coords",
    "cadence_check", "nan_frequency", "value_violations",
    "written_value_audit", "dedup_keep_first", "duplicate_groups",
    "minhash_signatures", "ngram_jaccard", "cosine_topk", "token_stats",
    "language_id", "quality_scores", "q3_shipping_priority",
    "q5_regional_revenue", "top_revenue_customers", "pivot_event_matrix",
    "simhash", "minhash_lsh_candidates", "duplicate_clusters",
    "embedding_near_duplicates", "lsh_ann_topk", "q6_revenue_filter",
    "order_priority_exists", "inactive_customers", "promo_revenue_ratio",
    "large_volume_orders", "customer_retention", "rollup_revenue",
    "windowed_event_counts", "doc_polynomial_fingerprint",
    # NOT listed: session_stats (hash-fail in r1 — oracle cast fixed this
    # round, keep it in the checked window to confirm green).
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, rotated so
    queries without a CORRECTNESS row yet are checked first."""
    unchecked = {k: v for k, v in catalog.QUERIES.items() if k not in _R1_CHECKED}
    checked = {k: v for k, v in catalog.QUERIES.items() if k in _R1_CHECKED}
    return {**unchecked, **checked}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query; keys absent
    here (non-SQL-expressible ops) get the driver's rows-only check."""
    return dict(catalog.ORACLES)
