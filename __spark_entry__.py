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
_FIXED_THIS_ROUND = (
    "session_stats",            # r3 ERR: unix_micros on TIMESTAMP_NTZ
    "time_bucket_resample",     # r3 ERR: same
    "interval_window_shipments",  # r2/r3 hash mismatch: DECIMAL output
    "lsh_ann_topk",             # r4: gained a full oracle (was rows-only)
    "q2_min_cost_supplier",     # r4: half-way rounding fix (sf0.1 sweep)
    "customer_retention",       # r4: single-pass rewrite
    "ngram_overlap_pairs",      # r4: boilerplate cap added
)

# With more never-checked queries than the driver's ~50-query window can
# hold, make sure every OPERATOR FAMILY gets at least one representative
# row this round (the rest of each family follows in later rounds'
# stalest-first rotation).
_FAMILY_REPRESENTATIVES = (
    "grib_decode",                # format decodes: the reference's real
    "grib2_decode",               #   ingest substrate (VERDICT r3 item 1)
    "netcdf4_decode",             #   — pin them ahead of the window edge
    "zarr_decode",
    "mixed_format_scan",
    "published_table_readback",   # table commit protocol end-to-end
    "multimodal_features",        # mapInPandas binary plumbing
    "ivm_rollup_maintenance",     # incremental view maintenance
    "streaming_session_readback",  # session_window state
    "streaming_join_readback",    # stream-stream interval join
    "climate_dry_spells",         # climate indices family
    "sequence_packing",           # training-data assembly
    "decontamination_flags",      # eval-overlap scrub
    "pii_scrub",                  # PII redaction
    "dataset_split_counts",       # deterministic splits
    "value_percentiles_exact",    # exact-vs-sketch ground truth
    "hll_distinct_users_daily",   # sketch with hash-checked estimate
    "cms_user_frequencies",       # sketch with hash-checked estimate
    "ols_trend_by_type",          # grouped OLS
    "event_mix_drift_chi2",       # categorical drift QC
    "doc_chunks",                 # context-window chunking
    "term_shift_jsd",             # corpus-snapshot divergence
    "conversion_funnel",          # ordered-step funnel
    "bm25_search_scores",         # lexical retrieval
    "corpus_prep_end_to_end",     # whole prep pipeline, one plan
    "cohort_retention_weekly",    # retention triangle
    "survival_signup_to_purchase",  # Kaplan-Meier curve
    "ewma_daily_values",          # exponential smoothing
    "unigram_perplexity_scores",  # LM-quality filter
    "skew_two_phase_agg",         # skew hardening
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
