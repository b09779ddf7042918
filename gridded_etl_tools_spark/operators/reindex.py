"""Reindex-to-complete-grid and dense-completeness checks.

Reference parity:

* ``reindexing.py:5-28`` — ``pd.date_range(min, max, freq)`` then
  ``dataset.reindex(time=...)`` inserting all-NaN timesteps.
* ``util_funcs/flat_to_nd.py:75-185`` (``nest_files``) — densify a
  file×dims table into a complete hypercube, erroring on holes.

Spark form: generate the dense axis with ``sequence() + explode`` (JVM-side,
no driver loop), cross-join the (small) dim tables, left-join the facts.
The dense axis per dimension is tiny; the cross product is what explodes —
at 100 TB the facts stay put and the dense key set is built per partition
window of interest, never materialized globally.  Missing-combination
checks are a left-anti join against the dense set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_time_axis(df: DataFrame, time_col: str, interval_sql: str) -> DataFrame:
    """All timestamps from min to max at the given cadence, one column
    named ``time_col``.  ``interval_sql`` e.g. ``"1 day"``."""
    return (
        df.select(F.min(time_col).alias("lo"), F.max(time_col).alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {interval_sql}"))
            ).alias(time_col)
        )
    )


def reindex_time(
    facts: DataFrame,
    time_col: str,
    interval_sql: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Left-join facts onto the dense (time × groups) frame; absent cells
    come back NULL — exactly ``reindex`` filling NaN.

    ``group_cols``: the identity dims to complete against (e.g. the grid
    cells, or an entity column).  They must be low-cardinality *dim*
    columns; the dense frame is |time| × |groups| rows.
    """
    axis = dense_time_axis(facts, time_col, interval_sql)
    if group_cols:
        dims = facts.select(*group_cols).distinct()
        dense = axis.crossJoin(F.broadcast(dims))
        keys = [time_col, *group_cols]
    else:
        dense = axis
        keys = [time_col]
    return dense.join(facts, on=keys, how="left")


def interpolate_na(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Linear interpolation of NULL values along the time axis within each
    group — the ``ds.interpolate_na(dim="time")`` analog (xarray linear
    method) for the long-form grid.  Interior NULLs become the linear
    blend of the nearest non-NULL neighbors weighted by time distance;
    leading/trailing NULLs (no neighbor on one side) stay NULL, matching
    xarray's default (no extrapolation).

    Scale shape: two frame windows over the same ``(group, time)``
    partitioning — one backward last-non-null scan, one forward
    first-non-null scan — so the whole operator is ONE shuffle on the
    group key and two in-partition passes.  Partitions are per-group
    series, so skew follows the series length, not the corpus.

    r14 (guide §2.4, closing the r13 lead): the forward scan runs as a
    DESCENDING-order RUNNING frame (``last(ignorenulls) over
    [unboundedPreceding, current]``) instead of a
    ``[current, unboundedFollowing]`` frame.  The two frames see the
    same row set — "at-or-after current in ascending order" IS
    "at-or-before current in descending order" (tiebreaks reversed
    with the time axis, so peer sets are identical) — but Spark
    evaluates an unbounded-following frame by rescanning current→end
    per row, O(series²) per group, while the running frame is one O(n)
    pass after a second in-partition sort.  Same single exchange; the
    plan trades the quadratic tail scans for one extra Sort node.

    The equivalence needs ``(time_col, *tiebreak_cols)`` to be a total
    order within each group.  That was already this operator's
    determinism contract (see the tiebreak note below) — but the
    failure mode sharpens: with untie-broken duplicate keys the old
    code was merely arbitrary among tie orders, while the asc and desc
    sorts here are INDEPENDENTLY arbitrary, so the backward and
    forward scans may not even agree on one ordering.  Pass
    ``tiebreak_cols`` whenever timestamps can repeat.

    ``time_col`` may be TIMESTAMP or TIMESTAMP_NTZ (cast-normalized
    before the micros math)."""
    out_col = out_col or value_col
    parts = [F.col(c) for c in (group_cols or [])]
    # tiebreak_cols pin the ROWS-frame order when timestamps repeat —
    # without them equal-ts peers would interpolate nondeterministically
    order = [time_col, *(tiebreak_cols or [])]
    w_back = (
        Window.partitionBy(*parts)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the forward neighbor scan, expressed as a running frame over the
    # exact REVERSE total order (every key flipped to desc)
    w_fwd = (
        Window.partitionBy(*parts)
        .orderBy(*[F.desc(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    v = F.col(value_col)
    t_of_v = F.when(v.isNotNull(), t_us)
    # r13: materialize the four neighbor scans as named columns FIRST —
    # Catalyst does not common-subexpression window expressions, so
    # composing them straight into ``interp`` expanded every reference
    # into its own window aggregate (10 frame processors in the plan,
    # five of them the per-row-recomputed [current, unboundedFollowing]
    # kind, where only these 4 are distinct)
    reserved = {"__pv", "__pt", "__nv", "__nt"}
    taken = set(df.columns) & reserved
    if taken or out_col in reserved:
        # withColumns REPLACES same-named inputs and the temps are
        # dropped below — refuse loudly instead of silently eating a
        # caller's column (or the output itself, if out_col names a
        # staging temp)
        raise ValueError(
            "interpolate_na: reserved staging column name(s) in use "
            f"({sorted(taken | ({out_col} & reserved))}); rename them "
            "first"
        )
    scans = df.withColumns(
        {
            "__pv": F.last(v, ignorenulls=True).over(w_back),
            "__pt": F.last(t_of_v, ignorenulls=True).over(w_back),
            "__nv": F.last(v, ignorenulls=True).over(w_fwd),
            "__nt": F.last(t_of_v, ignorenulls=True).over(w_fwd),
        }
    )
    prev_v, prev_t = F.col("__pv"), F.col("__pt")
    next_v, next_t = F.col("__nv"), F.col("__nt")
    # degenerate zero-width bracket (both neighbors at the same ts, only
    # possible with duplicate timestamps): fall back to the previous value
    frac = F.when(
        next_t != prev_t,
        (t_us - prev_t).cast("double") / (next_t - prev_t).cast("double"),
    ).otherwise(F.lit(0.0))
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
    )
    return scans.withColumn(out_col, interp).drop(
        "__pv", "__pt", "__nv", "__nt"
    )


def missing_combinations(
    facts: DataFrame, dim_cols: list[str]
) -> DataFrame:
    """Dense cross-product of each dim's distinct values, anti-joined
    against the facts: rows are the holes.  Empty result == complete
    hypercube (the ``nest_files`` hole check, flat_to_nd.py:151-185)."""
    dense = None
    for c in dim_cols:
        vals = facts.select(c).distinct()
        dense = vals if dense is None else dense.crossJoin(vals)
    return dense.join(facts.select(*dim_cols).distinct(), on=dim_cols, how="left_anti")
