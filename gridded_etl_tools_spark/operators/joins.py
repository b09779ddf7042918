"""Join-shaped operators.

The reference never calls a relational join, but four of its core moves are
joins in disguise (SURVEY §2.5); this module makes them explicit:

* :func:`split_update_times` — insert/append split via set intersection /
  difference of time coordinates (reference ``utils/publish.py:377-404``).
* :func:`combine_first`      — ``update.combine_first(existing)`` used to
  widen insert slices (``publish.py:1341-1385``, esp. ``:1380``).
* :func:`tolerance_join`     — ``sel(method="nearest", tolerance=tol)``
  (``publish.py:1049-1055``) as a bucketed range join.
* :func:`asof_join`          — ordered nearest-previous match (the 1-D time
  case of nearest-select; also the classic streaming enrichment join).

Scale notes: the split is semi/anti over a *distinct key list* that is tiny
relative to the facts (thousands of timestamps vs billions of cells) —
always broadcast.  ``tolerance_join`` avoids the naive cross join by
bucketing both sides to ``ceil(value / tolerance)`` and joining each probe
to its own and neighboring buckets: the candidate set per probe is O(rows
within ±tol), not O(n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _axis(df: DataFrame, col: str):
    """Numeric expression for an ordered axis column: timestamps (with or
    without timezone — TIMESTAMP_NTZ cannot cast to double directly)
    become epoch seconds; numerics cast to double."""
    dtype = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        c = c.cast("timestamp")
    return c.cast("double")


def split_update_times(
    update: DataFrame, existing: DataFrame, time_col: str = "time"
) -> tuple[DataFrame, DataFrame]:
    """Return ``(insert_times, append_times)`` — distinct update times that
    do / don't already exist in the published table, each sorted.

    Mirrors reference ``prepare_update_times`` (utils/publish.py:377-404)
    which uses Python ``set`` intersection/difference; here it is a
    broadcast left-semi / left-anti join so it never leaves the executors.
    """
    upd = update.select(time_col).distinct()
    ex = existing.select(time_col).distinct()
    inserts = upd.join(F.broadcast(ex), on=time_col, how="left_semi").orderBy(time_col)
    appends = upd.join(F.broadcast(ex), on=time_col, how="left_anti").orderBy(time_col)
    return inserts, appends


def combine_first(
    update: DataFrame, existing: DataFrame, keys: list[str], value_cols: list[str] | None = None
) -> DataFrame:
    """``update.combine_first(existing)``: full-outer join on the key dims,
    update's value wins where present (reference ``publish.py:1380``).

    Used to widen a partial-partition insert to whole partitions by
    back-filling untouched cells from the existing table, so a partition
    overwrite never drops rows (SURVEY §7.4 'insert semantics at scale').
    """
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(value_cols, str):  # a bare "value" must not iterate chars
        value_cols = [value_cols]
    value_cols = value_cols or [c for c in update.columns if c not in keys]
    u = update.alias("u")
    e = existing.alias("e")
    joined = u.join(e, on=keys, how="full_outer")
    out_cols = [F.col(k) for k in keys]
    for c in value_cols:
        # A value column may exist on only one side (e.g. the existing
        # table carries columns the update doesn't touch): pass it through
        # rather than failing the resolve.
        in_u, in_e = c in update.columns, c in existing.columns
        if in_u and in_e:
            expr = F.coalesce(F.col(f"u.{c}"), F.col(f"e.{c}"))
        elif in_u:
            expr = F.col(f"u.{c}")
        elif in_e:
            expr = F.col(f"e.{c}")
        else:
            raise ValueError(f"combine_first: column {c!r} on neither side")
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)


def tolerance_join(
    probes: DataFrame,
    targets: DataFrame,
    on: str,
    tolerance: float,
    probe_keys: list[str] | None = None,
) -> DataFrame:
    """Nearest-neighbor join along one numeric/temporal column with a hard
    tolerance: for each probe row, attach the target row minimizing
    ``abs(probe.on - target.on)`` subject to ``abs(...) <= tolerance``.
    Probes with no target within tolerance are dropped (the reference's
    ``sel(method='nearest', tolerance=...)`` raises/skips those).

    Plan: bucket both sides by ``floor(on / tolerance)``; a probe's nearest
    in-tolerance target must sit in its own or an adjacent bucket, so we
    explode probes to 3 buckets and equi-join on the bucket id — a shuffle
    hash/sort-merge join with bounded fan-out, never a cross join.  Ties
    (equal distance either side) break toward the smaller target value,
    then smaller target rowid, to stay deterministic.

    Target columns come back prefixed ``nearest_``.
    """
    probe_keys = probe_keys or probes.columns

    # Route axis math through _axis so TIMESTAMP_NTZ works (NTZ cannot
    # cast to double directly; _axis goes via timestamp → epoch seconds).
    p_axis = _axis(probes, on)
    t_axis = _axis(targets, on)

    p = probes.withColumn("__pv", p_axis).withColumn(
        "__bucket0", F.floor(F.col("__pv") / F.lit(float(tolerance)))
    )
    p = p.withColumn("__b", F.explode(F.array(F.col("__bucket0") - 1, F.col("__bucket0"), F.col("__bucket0") + 1)))
    t = targets.select(
        F.floor(t_axis / F.lit(float(tolerance))).alias("__b"),
        t_axis.alias("__tv"),
        *[F.col(c).alias(f"nearest_{c}") for c in targets.columns],
    )
    joined = p.join(t, on="__b", how="inner")
    dist = F.abs(F.col("__pv") - F.col("__tv"))
    joined = joined.filter(dist <= F.lit(float(tolerance))).withColumn("__dist", dist)
    # Deterministic pick: nearest distance, then smaller target on-value,
    # then the full target column tuple ascending (breaks ties between
    # duplicate targets sharing the same axis value without depending on
    # partition layout, unlike monotonically_increasing_id).
    tie_cols = [
        F.col(f"nearest_{c}").asc() for c in targets.columns if c != on
    ]
    w = Window.partitionBy(*probe_keys).orderBy(
        F.col("__dist").asc(), F.col("__tv").asc(), *tie_cols
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__b", "__bucket0", "__dist", "__rn", "__pv", "__tv")
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join: every (point row, interval row) pair with
    ``start <= point <= end``.  Spark has no range-join optimization, and
    the naive formulation is a cross join with a post-filter — quadratic.

    Plan: quantize the axis into buckets of ``bucket_width`` (for
    timestamps: seconds).  Each interval explodes to the buckets it
    covers (``sequence(floor(s/w), floor(e/w))``; keep ``bucket_width``
    within ~an interval length so the fan-out is O(1)); each point sits
    in exactly one bucket, so the equi-join on bucket id is duplicate-
    free by construction and candidate sets are bounded by bucket
    occupancy, not table size.  Interval columns come back prefixed
    ``iv_``.

    Columns are cast to double for bucketing (timestamps become epoch
    seconds), so the same operator serves time, latitude bands, or any
    ordered numeric axis.
    """
    w = float(bucket_width)
    s, e = _axis(intervals, start_col), _axis(intervals, end_col)
    iv = intervals.select(
        *[F.col(c).alias(f"iv_{c}") for c in intervals.columns],
        s.alias("__s"), e.alias("__e"),
        F.explode(
            F.sequence(F.floor(s / F.lit(w)), F.floor(e / F.lit(w)))
        ).alias("__b"),
    )
    pt = _axis(points, point_col)
    p = points.withColumn("__p", pt).withColumn("__b", F.floor(pt / F.lit(w)))
    return (
        p.join(iv, on="__b", how="inner")
        .filter((F.col("__p") >= F.col("__s")) & (F.col("__p") <= F.col("__e")))
        .drop("__b", "__p", "__s", "__e")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose
    ``[start, end]`` ranges intersect.  Same bucketing scheme as
    :func:`interval_join`, with a dedup-free trick: an overlapping pair
    shares every bucket from ``floor(max(s_l, s_r)/w)`` onward, so we
    emit the pair only in that *first shared bucket* — each pair matches
    exactly once and no ``dropDuplicates`` shuffle is needed.  Right
    columns come back prefixed ``r_``.
    """
    w = float(bucket_width)

    def exploded(df: DataFrame, prefix: str, smark: str, emark: str) -> DataFrame:
        s, e = _axis(df, start_col), _axis(df, end_col)
        return df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns],
            s.alias(smark), e.alias(emark),
            F.explode(
                F.sequence(F.floor(s / F.lit(w)), F.floor(e / F.lit(w)))
            ).alias("__b"),
        )

    l = exploded(left, "", "__ls", "__le")
    r = exploded(right, "r_", "__rs", "__re")
    overlap_start = F.greatest(F.col("__ls"), F.col("__rs"))
    return (
        l.join(r, on="__b", how="inner")
        .filter(
            (F.col("__ls") <= F.col("__re"))
            & (F.col("__rs") <= F.col("__le"))
            & (F.col("__b") == F.floor(overlap_start / F.lit(w)))
        )
        .drop("__b", "__ls", "__le", "__rs", "__re")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (direction='backward'; 'forward' symmetric),
    optionally within ``by`` equi-groups.

    Plan (union trick — single sort, no range explosion): tag both sides,
    union on (by, on), window ``last(right_value, ignorenulls)`` ordered by
    (on, side) per group, then keep left rows.  One shuffle on ``by`` —
    the same partitioning a subsequent per-group agg would reuse.
    """
    by = by or []
    lcols = [c for c in left.columns if c != on and c not in by]
    rcols = [c for c in right.columns if c != on and c not in by]
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    l_tagged = left.select(
        *by, F.col(on), F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"asof_{c}") for c in rcols],
    )
    r_tagged = right.select(
        *by, F.col(on), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"asof_{c}") for c in rcols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    asc = direction == "backward"
    order = [F.col(on).asc() if asc else F.col(on).desc(), F.col("__side").asc()]
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        *by, F.col(on), F.col("__side"),
        *[F.col(c) for c in lcols],
        *[F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in rcols],
        F.last(F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True).over(w).alias(f"asof_{on}"),
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
