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


# The driver caps its per-round check at ~50 queries in registration
# order, so we rotate by urgency, computed from the recorded CORRECTNESS
# rounds themselves: (1) queries fixed/changed this round that must
# re-confirm green — a prior round recorded these as ERR/MISMATCH, so
# proving the fix outranks first-checks of brand-new queries, (2) queries
# with no correctness row in ANY round, (3) stalest-checked first
# (round-robin re-confirmation of old greens), with the most-recently-green
# queries last.
# Round 5: the r4 gate showed 8 hash mismatches — ALL had DuckDB
# HUGEINT (integer-sum) or DECIMAL/DATE output columns, whose pandas
# conversion is DuckDB-build-dependent; no green query had any.  Every
# oracle now CASTs to the conversion-safe canon (BIGINT/DOUBLE/
# TIMESTAMP...) at the output boundary, enforced by
# tests/test_plans.py::test_oracle_output_type_canon and verified by
# scripts/verify_strict.py (type-sensitive, both fetch paths).  The 8
# re-confirms + the canary take the first window slots.
_FIXED_THIS_ROUND = (
    "ivm_rollup_maintenance",     # r4 hash: DECIMAL + DATE output
    "climate_dry_spells",         # r4 hash: HUGEINT n_event_days
    "sequence_packing",           # r4 hash: HUGEINT bin_tokens
    "event_mix_drift_chi2",       # r4 hash: HUGEINT n0/n1
    "term_shift_jsd",             # r4 hash: HUGEINT p_cnt/q_cnt
    "corpus_prep_end_to_end",     # r4 hash: HUGEINT token/char sums
    "survival_signup_to_purchase",  # r4 hash: HUGEINT at-risk counts
    "unigram_perplexity_scores",  # r4 hash: HUGEINT n_tokens
    "engine_canary",              # NEW: primitive-divergence probe row
    "doc_chunks",                 # r4 green; NULL-text guard hardened
)

# Never-checked / just-changed queries, ordered by round-5 urgency:
# (a) previously-GREEN queries whose plans were reworked this round
# (scalable-window rewrites + signed-zero fixes) — they must
# re-confirm; (b) the new round-5 surface; (c) the r4 flagship
# format/sink rows still awaiting their first driver row; (d) the
# never-checked queries whose output types were hardened this round
# (they would have failed the old way).  The tail of (d) may fall off
# the ~50-query window edge; round 6 picks it up via seen==0.
_FAMILY_REPRESENTATIVES = (
    # (a) reworked greens: re-confirm
    "quantile_map_correction",    # rank stats + rank-axis LOCF rework
    "quantile_delta_map_trend",   # same toolkit, two curve lookups
    "value_cume_dist_tail",       # grouped_rank_stats cume_dist
    "rolling_volatility",         # block-ghost ROWS-frame rework
    "forecast_skill_by_lead",     # signed-zero canon (pos_zero)
    "join_key_skew_report",       # VERDICT item 2: TakeOrdered rework
    # (b) new round-5 surface
    "rolling_hour_stats_bucketed",  # overlap-replicated sliding window
    "bpe_pair_counts",            # BPE-training pair counts
    "streaming_rollup_readback",  # streaming IVM merge under the oracle
    "streaming_stateful_extremes_readback",  # custom state machine
    "event_value_rank_enrich",    # distributed ANSI rank/percent/cume
    "cms_heavy_hitters",          # sketch-prefiltered exact heavy keys
    "locf_event_fill_bucketed",   # two-level LOCF over fact-sized axis
    "table_time_travel_readback",  # VERSION AS OF under the oracle
    "table_change_feed_readback",  # change data feed under the oracle
    "table_restore_readback",     # RESTORE-as-new-commit under the oracle
    "multimodal_real_decode",     # real PNG decode on executors
    "cf_gridmapping_reproject",   # generic CF projection registry
    "approx_distinct_bound_check",    # sketch error-bound certificates
    "sketch_rollup_bound_check",
    "approx_percentiles_bound_check",
    # (c) r4 flagship formats/sinks, never checked
    "geotiff_decode",
    "kerchunk_decode",
    "zarr3_decode",
    "zarr_publish_readback",
    "bloom_two_phase_dedup",
    # (d) type-canon hardened, never driver-checked
    "token_budget_subset",
    "streaming_window_readback",
    "parametric_payouts",
    "climate_heat_spells",
    "q18_large_volume_customers",
    "last_touch_attribution",
    "cube_event_revenue",
    "revenue_share_by_type",
    "orders_above_global_avg",
    "largest_purchase_per_user",
    "rfm_segments",               # + scalable global_ntile rework
    "pareto_part_classes",        # + bucketed prefix-sum rework
    "user_activity_deciles",      # + scalable global_ntile rework
    "event_value_deciles",        # + scalable grouped_ntile rework
    "table_profile_events",
    "session_conversion_daily",
    "sequence_packing_sharded",
    "cusum_changepoints",
    "seasonal_decomposition",
    "climate_degree_days",
)


def _last_checked() -> dict[str, int]:
    """query -> most recent round with a correctness row (0 = never)."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
            for k in json.load(open(path)):
                seen[k] = max(seen.get(k, 0), rnd)
        except Exception:  # noqa: BLE001 - rotation is best-effort
            continue
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, rotated so
    never-checked and just-fixed queries land inside the driver's
    ~50-query correctness window."""
    seen = _last_checked()
    priority = _FIXED_THIS_ROUND + _FAMILY_REPRESENTATIVES
    rank = {k: i for i, k in enumerate(priority)}
    names = sorted(
        catalog.QUERIES,
        key=lambda k: (
            rank.get(k, len(rank)),           # fixes + family reps first
            seen.get(k, 0),                   # then never-checked (0), then stalest
        ),
    )
    return {k: catalog.QUERIES[k] for k in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query; keys absent
    here (non-SQL-expressible ops) get the driver's rows-only check."""
    return dict(catalog.ORACLES)
