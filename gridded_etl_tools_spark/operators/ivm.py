"""Incremental view maintenance (IVM) over the GriddedTable change feed.

The reference recomputes derived products (climatologies, per-period
rollups) from scratch after every publish; at 100 TB a daily rollup
must instead be *maintained* from the changed rows only.  The
ingredients already exist: data files are immutable and
``GriddedTable.diff(v_from, v_to)`` emits an exact row-level change
feed (insert/delete) proportional to the churned file set — this module
turns that feed into signed aggregate deltas and applies them to a
materialized rollup.

Supported aggregates are the self-maintainable ones (count, sum — and
mean as sum/count downstream); min/max are NOT self-maintainable under
deletes (a retracted minimum needs a rescan of its group) and are
deliberately not offered.

Scale shape: one narrow shuffle on the rollup keys over the *delta*
(not the table), then a key-equi-join against the existing rollup —
broadcastable whenever the touched-key set is small, which is the
normal case for time-bucketed updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_TYPE_COL = "_change_type"


def rollup_delta(
    change_feed: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Signed per-key aggregate delta from an insert/delete change feed:
    inserts contribute +1/+value, deletes -1/-value.  An in-place update
    (delete + insert of the same key) nets to its value difference."""
    sign = F.when(F.col(CHANGE_TYPE_COL) == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    return change_feed.groupBy(*keys).agg(
        F.sum(sign).alias("__d_count"),
        *[
            F.sum(F.col(c) * sign).alias(f"__d_sum_{c}")
            for c in sum_cols
        ],
    )


def apply_rollup_delta(
    rollup: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Merge a signed delta into a materialized rollup: new keys appear,
    emptied keys (count reaches 0) drop, everything else adjusts.
    ``rollup`` columns: keys + ``count_col`` + ``sum_{c}`` per sum col."""
    merged = rollup.join(F.broadcast(delta), on=keys, how="full_outer")
    out = merged.select(
        *keys,
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("__d_count"), F.lit(0))
        ).alias(count_col),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_sum_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return out.filter(F.col(count_col) > 0)


def full_rollup(
    df: DataFrame, keys: list[str], sum_cols: list[str], count_col: str = "n"
) -> DataFrame:
    """The from-scratch rollup the incremental path must always equal
    (the IVM correctness invariant; tests pin it)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
