"""Gaps-and-islands: contiguous-run detection over an ordered key.

Reference parity: ``calculate_update_time_ranges``
(``utils/publish.py:555-620``) finds contiguous runs in the insert times by
comparing shifted diffs against the expected delta, emitting
(datetime-range, index-range) pairs so each run becomes one Zarr region
write.  Also the substrate of the contiguity QC check
(``publish.py:780-822``).

Spark form is the classic pattern: ``lag`` the ordered key, flag rows whose
gap to the predecessor exceeds the expected delta, running-sum the flags to
get a run id, then aggregate per run.  One shuffle (the window's
``orderBy``); the subsequent groupBy reuses it via AQE.

Scale note: a global ``orderBy`` window over *distinct times* is fine — the
time dimension is thousands-to-millions of rows even when the fact table is
100 TB.  Never run this over the full fact table; pass the distinct key
list.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguous_regions(
    keys: DataFrame,
    key_col: str = "time",
    expected_delta: dt.timedelta | float | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Group distinct ordered keys into contiguous runs.

    ``expected_delta``: gap defining contiguity (timedelta for timestamps,
    number for numerics).  With ``bounds=(lo, hi)`` instead, any gap within
    the bounds continues a run (irregular cadences, reference
    ``attributes.py:250-257``).

    Returns one row per run: ``run_id, range_start, range_end, n_keys``.
    """
    if (expected_delta is None) == (bounds is None):
        raise ValueError("pass exactly one of expected_delta / bounds")

    distinct = keys.select(key_col).distinct()
    # Distinct-key axis, not facts: single-partition lag is the inherent
    # shape (one ordered sequence); constant partition key documents the
    # bound and avoids the unpartitioned-window warning.
    w = Window.partitionBy(F.lit(0)).orderBy(key_col)
    gap = F.col(key_col).cast("double") - F.lag(F.col(key_col).cast("double")).over(w)

    if expected_delta is not None:
        if isinstance(expected_delta, dt.timedelta):
            expected = expected_delta.total_seconds()
        else:
            expected = float(expected_delta)
        is_break = gap != F.lit(expected)
    else:
        lo, hi = bounds
        is_break = ~gap.between(F.lit(float(lo)), F.lit(float(hi)))

    flagged = distinct.withColumn(
        "__break", F.when(is_break, 1).otherwise(0)
    )
    run = F.sum("__break").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        flagged.withColumn("run_id", run)
        .groupBy("run_id")
        .agg(
            F.min(key_col).alias("range_start"),
            F.max(key_col).alias("range_end"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .orderBy("run_id")
    )


def sessionize(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap: dt.timedelta = dt.timedelta(minutes=30),
) -> DataFrame:
    """Partitioned gaps-and-islands over an event stream: rows of the same
    entity separated by more than ``gap`` start a new session.

    Returns one row per (entity, session): ``session_id`` (1-based per
    entity), ``session_start``, ``session_end``, ``n_events``,
    ``duration_us``.

    Scale: the window partitions by entity, so the single shuffle is on the
    entity key and sessions never cross partitions — the batch analog of
    Structured Streaming ``session_window`` state (which
    streaming.ingest exposes for the live path).
    """
    gap_us = int(gap.total_seconds() * 1_000_000)
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    # TIMESTAMP_NTZ is not accepted by unix_micros; session tz is pinned UTC
    # (session.py) so the cast is value-preserving for both timestamp types.
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    new_sess = F.when(prev.isNull() | ((ts_us - prev) > gap_us), 1).otherwise(0)
    sess = F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.withColumn("__new", new_sess)
        .withColumn("session_id", sess)
        .groupBy(entity_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            ).alias("duration_us"),
        )
    )
