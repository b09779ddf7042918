"""Extent / bbox aggregates and the grouped & rolling aggregations the
reference leaves to "upstream possibilities".

Reference parity:

* bbox            — min/max lon/lat rounded to ``bbox_rounding_value``
  (``utils/convenience.py:435-455``).
* temporal extent — min/max time (``utils/metadata.py:391-398,632-637``;
  ``publish.py:951-966``).
* date-range of a dataset — ``convenience.py:269-294``.
* grouped/rolling aggs — absent in the reference (SURVEY §2.4 A12);
  docstrings name "mean/max of a dimension" as upstream needs
  (``publish.py:485-487``) — natural one-liners here.

All are single-shuffle hash aggregates with map-side partials; bbox/extent
are full-table reductions Catalyst executes as partial+final agg over the
parquet scan with only the needed columns read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bbox(df: DataFrame, lon_col: str, lat_col: str, rounding: int = 2) -> DataFrame:
    """One row: ``min_lon, min_lat, max_lon, max_lat`` rounded."""
    return df.agg(
        F.round(F.min(lon_col).cast("double"), rounding).alias("min_lon"),
        F.round(F.min(lat_col).cast("double"), rounding).alias("min_lat"),
        F.round(F.max(lon_col).cast("double"), rounding).alias("max_lon"),
        F.round(F.max(lat_col).cast("double"), rounding).alias("max_lat"),
    )


def temporal_extent(df: DataFrame, time_col: str = "time") -> DataFrame:
    """One row: ``start, end``."""
    return df.agg(F.min(time_col).alias("start"), F.max(time_col).alias("end"))


def dimension_reduce(
    df: DataFrame, group_cols: list[str], value_col: str, aggs: list[str]
) -> DataFrame:
    """Reduce the value over all dims not in ``group_cols`` — the Spark
    form of ``ds.mean(dim=...)`` etc.  ``aggs`` ⊆ {mean,sum,min,max,count,
    stddev}.  Aliases ``{agg}_{value_col}``."""
    fns = {
        "mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
        "count": F.count, "stddev": F.stddev_samp,
    }
    exprs = [fns[a](value_col).alias(f"{a}_{value_col}") for a in aggs]
    return df.groupBy(*group_cols).agg(*exprs)


def dispersion_stats(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-group second/third/fourth-moment statistics: sample stddev and
    variance plus population skewness and excess kurtosis (the definitions
    Spark's builtins use: ``g1 = m3/m2^1.5``, ``g2 = m4/m2^2 - 3`` over
    central moments).  One partial+final hash aggregate — the moment
    accumulators are all map-side combinable, so the shuffle carries one
    row per group regardless of table size."""
    return df.groupBy(*group_cols).agg(
        F.count(value_col).alias("n"),
        F.stddev_samp(value_col).alias("stddev"),
        F.var_samp(value_col).alias("variance"),
        F.skewness(value_col).alias("skewness"),
        F.kurtosis(value_col).alias("kurtosis"),
    )


def grouped_mode(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Most frequent value per group with a deterministic tie-break
    (highest count, then smallest value) — engines' builtin ``mode()``
    resolves ties arbitrarily, so it is re-expressed as count + ranking
    window to be reproducible.  Two shuffles: the count aggregate and the
    per-group window; both key on the group columns so AQE coalesces them
    onto the same exchange."""
    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(*group_cols).orderBy(F.desc("n"), F.asc(value_col))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(*group_cols, F.col(value_col).alias("mode_value"), F.col("n").alias("mode_count"))
    )


def fixed_width_histogram(
    df: DataFrame, group_cols: list[str], value_col: str, bin_width: float
) -> DataFrame:
    """Fixed-width histogram: ``bin = floor(value / bin_width)`` then a
    count per (group, bin).  Purely map-side binning + one hash aggregate;
    the natural distributed histogram (no driver collect, no sorted
    quantile pass)."""
    return (
        df.withColumn("bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("bin_count"))
    )


def climatology_anomaly(
    df: DataFrame,
    cycle_cols: list[str],
    group_cols: list[str],
    value_col: str,
    rounding: int = 6,
) -> DataFrame:
    """Anomaly vs. climatology — the standard climate-science reduction
    (observed minus the long-run mean for the same point in the seasonal/
    diurnal cycle).  ``cycle_cols`` define the climatological key (e.g.
    day-of-year, hour-of-day); ``group_cols`` additional identity keys
    (e.g. grid cell, event type).

    Physical shape: one hash aggregate builds the climatology table
    (|cycle| × |group| rows — tiny), which then **broadcasts** back onto
    the fact scan; the facts are never shuffled.  The climatological mean
    is rounded before subtraction so the anomaly is reproducible across
    engines/summation orders."""
    keys = group_cols + cycle_cols
    clim = df.groupBy(*keys).agg(
        F.round(F.avg(value_col), rounding).alias("clim_mean")
    )
    return (
        df.join(F.broadcast(clim), keys)
        .withColumn(
            "anomaly", F.round(F.col(value_col) - F.col("clim_mean"), rounding)
        )
    )


def rolling_aggregate(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    value_col: str,
    window_rows: int,
    agg: str = "mean",
) -> DataFrame:
    """Trailing rolling aggregate over the previous ``window_rows`` rows
    (inclusive of current) per partition — rolling climatology per grid
    cell.  Partitioning on the cell keys means the shuffle matches the
    table's natural clustering; at scale, sort within partitions on
    ``order_col`` at write time makes this a near-no-op."""
    fns = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max}
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(f"rolling_{agg}_{value_col}", fns[agg](value_col).over(w))


def verification_metrics(
    df: DataFrame,
    forecast_col: str,
    observed_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Forecast verification (the hindcast category's downstream math —
    what the reference's forecast/ensemble datasets exist to feed): per
    group (typically lead time and/or region), the standard point-skill
    scores: bias (mean error), MAE, RMSE, and the forecast-observation
    Pearson correlation.

    One hash aggregation over the joined forecast-observation pairs; all
    four metrics are algebraic (sum-shaped), so map-side partial
    aggregation carries seven running sums per group regardless of pair
    count — nothing here gets harder at 100 TB."""
    err = F.col(forecast_col) - F.col(observed_col)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.avg(err).alias("bias"),
        F.avg(F.abs(err)).alias("mae"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.corr(forecast_col, observed_col).alias("corr_fo"),
    )


def crps_ensemble(members_col, obs_col):
    """Per-row CRPS of an empirical ensemble (column expression): the
    standard probabilistic skill score for the reference's ensemble /
    hindcast category,

        CRPS = mean_i |x_i - y| - 0.5 * mean_{i,j} |x_i - x_j|

    (Hersbach 2000 fair-score form over the member array).  Both terms
    are whole-stage-codegen higher-order folds over the member array —
    map-side, no shuffle, no UDF; ensembles are small (tens of members),
    so the m^2 pairwise term is constant per row."""
    m = F.size(members_col)
    term1 = F.aggregate(
        members_col,
        F.lit(0.0),
        lambda acc, x: acc + F.abs(x - obs_col),
    ) / m
    term2 = F.aggregate(
        members_col,
        F.lit(0.0),
        lambda acc, x: acc
        + F.aggregate(members_col, F.lit(0.0), lambda a2, y: a2 + F.abs(x - y)),
    ) / (m * m)
    return term1 - F.lit(0.5) * term2


def quantile_map(
    forecast: DataFrame,
    observed: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Empirical quantile-mapping bias correction (the standard
    statistical downscaling post-processor for the reference's forecast
    datasets): each forecast value is replaced by the observed value at
    the same quantile of its group, so the corrected forecast inherits
    the observed distribution exactly — systematic scale/offset biases
    vanish by construction.

    Physical shape (round-5 rework — each group's rank axis is
    FACT-sized, so neither stage may funnel a group through one task):
    percent_rank via :func:`grouped_rank_stats` (two-level positions +
    tie-collapse — exact ANSI percent_rank), and the rank-as-of lookup
    as a two-level LOCF over the rank axis via :func:`bucketed_locf`
    (obs quantile curve union'd under the forecast ranks, bucket =
    floor(rank*64), seed carry-in across buckets).  Every stage keys on
    (group, bucket); values are identical to the single-sequence
    windows because ranks are exact rationals and the fill is a pick.

    r13: when forecast and observed share the value dtype, both sides
    rank in ONE :func:`grouped_rank_stats` chain partitioned by
    (group, ``__side``) — per-partition computation is untouched, so
    every rank is bit-identical to the two-chain form, but the
    totals/offsets/window/counts stages run once over the tagged union
    instead of twice (one fact-sized window exchange, not two), and
    the ranked union IS the row set the LOCF wants, so the lookup's
    re-union disappears.  MIXED value dtypes take the two-chain path:
    the fused union would coerce both sides to a common type, which
    can truncate corrected values (double obs → int forecast) or
    perturb tie structure (long beyond 2^53 vs double) — each side
    must rank and emit in its own native dtype.

    Returns the forecast rows + ``corrected``."""
    reserved = {
        "__v", "__side", "__qb", "__r", "__av", "__rb", "__obs_v",
        "rank", "percent_rank", "cume_dist",
    }
    taken = (set(forecast.columns) | set(observed.columns)) & reserved
    if taken:
        # the staging temps below would silently replace (or duplicate
        # and break) same-named caller columns — refuse loudly
        raise ValueError(
            "quantile_map: input already carries reserved staging "
            f"column(s) {sorted(taken)}; rename them first"
        )
    if (
        forecast.schema[value_col].dataType
        != observed.schema[value_col].dataType
    ):
        fcr = _percent_ranked(forecast, group_cols, value_col)
        obsr = _percent_ranked(
            observed.select(*group_cols, F.col(value_col).alias("__obs_v")),
            group_cols,
            "__obs_v",
        ).select(*group_cols, "__r", "__obs_v")
        return rank_curve_lookup(
            fcr, obsr, group_cols, "__obs_v", "corrected"
        )
    payload = [
        c for c in forecast.columns if c not in (*group_cols, value_col)
    ]
    f_tag = forecast.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.lit(1).alias("__side"),
        *payload,
    )
    o_tag = observed.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(forecast.schema[c].dataType).alias(c)
            for c in payload
        ],
    )
    ranked = grouped_rank_stats(
        f_tag.unionByName(o_tag).withColumn(
            "__qb", F.floor(F.col("__v") / 5.0)
        ),
        partition_cols=[*group_cols, "__side"],
        value_col="__v",
        bucket_col="__qb",
    ).withColumnRenamed("percent_rank", "__r")
    unioned = ranked.select(
        *group_cols,
        "__r",
        "__side",
        F.when(F.col("__side") == 0, F.col("__v")).alias("__av"),
        F.when(F.col("__side") == 1, F.col("__v")).alias(value_col),
        *payload,
    )
    return _rank_axis_locf(unioned, group_cols, "corrected")


def _percent_ranked(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """One side's exact percent_rank via :func:`grouped_rank_stats`
    with the shared /5.0 value-bucket coarsening; returns the input
    columns + ``__r``.  The single home of the bucket width and
    drop-list invariants for :func:`quantile_map` (mixed-dtype path)
    and :func:`quantile_delta_map`."""
    return grouped_rank_stats(
        df.withColumn("__qb", F.floor(F.col(value_col) / 5.0)),
        partition_cols=group_cols,
        value_col=value_col,
        bucket_col="__qb",
    ).withColumnRenamed("percent_rank", "__r").drop(
        "rank", "cume_dist", "__qb"
    )


def _rank_axis_locf(
    unioned: DataFrame, group_cols: list[str], out_col: str
) -> DataFrame:
    """Shared tail of the rank-as-of lookup: bucket the tagged
    rank-axis union (``__r`` rank, ``__side`` 0=curve/1=rows, ``__av``
    curve values), checkpoint it (the LOCF references it three times),
    LOCF the curve values under the rows (curve sorts before rows at
    equal rank — inclusive pick), and return the row side.  Both
    :func:`quantile_map` (pre-tagged fused chain) and
    :func:`rank_curve_lookup` (two-input form) funnel through here so
    the pick/tiebreak invariants live in one place."""
    unioned = unioned.withColumn(
        "__rb", F.floor(F.col("__r") * 64)
    ).localCheckpoint(eager=True)
    filled = bucketed_locf(
        unioned,
        keys=group_cols,
        order_by=[F.col("__r"), F.col("__side")],
        value_col="__av",
        bucket_col="__rb",
        filled_col=out_col,
    )
    return filled.filter(F.col("__side") == 1).drop(
        "__side", "__av", "__rb"
    )


def rank_curve_lookup(
    left: DataFrame,
    curve: DataFrame,
    group_cols: list[str],
    curve_val_col: str,
    out_col: str,
) -> DataFrame:
    """Rank-as-of lookup at scale: for each ``left`` row (carrying a
    ``__r`` rank column), the ``curve`` value at the greatest curve
    ``__r`` <= the row's ``__r`` (inclusive), per group — i.e. read an
    empirical quantile curve at each row's own quantile.

    The per-group rank axis is fact-sized, so the lookup runs as a
    two-level LOCF (:func:`bucketed_locf`, bucket = floor(rank*64))
    over the union of rows and curve points — never a single
    group-partition window.  The union is localCheckpointed because the
    LOCF references it three times.  Returns the left rows +
    ``out_col``."""
    payload = [c for c in left.columns if c not in (*group_cols, "__r")]
    l_tag = left.select(
        *group_cols, "__r", F.lit(1).alias("__side"),
        F.lit(None).cast(curve.schema[curve_val_col].dataType).alias("__av"),
        *[F.col(c) for c in payload],
    )
    c_tag = curve.select(
        *group_cols, "__r", F.lit(0).alias("__side"),
        F.col(curve_val_col).alias("__av"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in payload
        ],
    )
    return _rank_axis_locf(l_tag.unionByName(c_tag), group_cols, out_col)


def quantile_delta_map(
    future_fc: DataFrame,
    hist_fc: DataFrame,
    hist_obs: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Additive quantile DELTA mapping (QDM, Cannon et al. 2015): plain
    quantile mapping forces the corrected series into the HISTORICAL
    observed distribution, erasing any real trend in the new forecasts;
    QDM instead applies the historical bias AT THE VALUE'S OWN QUANTILE,

        corrected(x) = x + [obs_Q(tau) - hist_fc_Q(tau)],  tau = ECDF_fut(x)

    so distribution shifts the model genuinely predicts survive while
    the per-quantile historical bias is removed.

    Physical shape (round-5 rework): exact percent_rank per series via
    :func:`grouped_rank_stats` and two :func:`rank_curve_lookup` passes
    against the historical observed and forecast quantile curves — the
    per-group rank axis never funnels through one window task."""
    def ranked(df: DataFrame, col_alias: str) -> DataFrame:
        src = df.select(*group_cols, F.col(value_col).alias(col_alias))
        return _percent_ranked(src, group_cols, col_alias).select(
            *group_cols, "__r", col_alias
        )

    fut = _percent_ranked(future_fc, group_cols, value_col)
    obs_q = ranked(hist_obs, "__obs_v")
    fc_q = ranked(hist_fc, "__hfc_v")
    step1 = rank_curve_lookup(
        fut, obs_q, group_cols, "__obs_v", "__obs_at_r"
    )
    step2 = rank_curve_lookup(
        step1, fc_q, group_cols, "__hfc_v", "__hfc_at_r"
    )
    return step2.withColumn(
        "corrected",
        F.col(value_col) + F.col("__obs_at_r") - F.col("__hfc_at_r"),
    )


def bucketed_prefix_sum(
    df: DataFrame,
    bucket_col: str,
    order_by: list,
    value_col: str,
    cum_col: str = "cum",
    bucket_desc: bool = False,
) -> DataFrame:
    """Global running sum WITHOUT a global single-partition window — the
    two-level prefix-sum pattern: per-bucket totals (a dimension-sized
    frame) get exclusive offsets from a tiny ordered scan, broadcast back,
    and each bucket's interior cumsum runs under a window partitioned on
    the bucket.  Equivalent to ``sum(value) OVER (ORDER BY ...)`` but the
    fact table only ever shuffles on the bucket key.

    ``bucket_col`` must be a monotone coarsening of the primary sort key
    (e.g. ``floor(score * 20)`` when ordering by score) with
    ``bucket_desc`` matching the sort direction; the caller's
    ``order_by`` columns provide the exact within-bucket order (include a
    unique tie-break).
    """
    totals = df.groupBy(bucket_col).agg(F.sum(value_col).alias("__btot"))
    bucket_order = (
        F.col(bucket_col).desc() if bucket_desc else F.col(bucket_col).asc()
    )
    # single-partition scan over BUCKET TOTALS only (bounded by the
    # bucket count, not the data)
    wb = (
        Window.partitionBy(F.lit(0))
        .orderBy(bucket_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__btot").over(wb), F.lit(0))
    ).select(bucket_col, "__off")
    ww = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.join(F.broadcast(offsets), bucket_col)
        .withColumn(cum_col, F.col("__off") + F.sum(value_col).over(ww))
        .drop("__off")
    )


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_by: list,
    bucket_col: str,
    tile_col: str = "tile",
    bucket_desc: bool = False,
    barrier: bool = True,
) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY ...)`` WITHOUT the global
    single-partition window — the scale path for quantile bucketing over
    an unbounded axis (users, parts).

    ntile is positional: with n rows, the first ``n % k`` tiles get
    ``n // k + 1`` rows, the rest ``n // k`` (identical in Spark and
    DuckDB/ANSI).  So the tile of a row is a closed-form function of its
    GLOBAL POSITION, and the global position is a two-level bucketed
    prefix count (:func:`bucketed_prefix_sum` of ones): per-bucket
    counts + broadcast offsets + a bucket-partitioned interior
    row_number.  The axis only ever shuffles on ``bucket_col`` — a
    monotone coarsening of the primary sort key (same contract as
    ``bucketed_prefix_sum``), with ``bucket_desc`` matching the sort
    direction.  Equality with the positional ntile is exact, so oracle
    parity holds with no window over ``lit(0)``.

    The input is localCheckpointed first (``barrier=True``, the
    default): the axis frame is referenced three times (bucket totals,
    position join, row count) and chained ntile passes would otherwise
    re-embed the whole upstream plan per reference (Catalyst does not
    dedup common subtrees) — the barrier keeps each pass at two
    bucket-keyed exchanges over the already-materialized axis.  Pass
    ``barrier=False`` when the caller has ALREADY materialized ``df``
    (r13: ``rfm_segments`` checkpoints the RFM frame once and runs
    three independent slim passes against it — a second barrier per
    pass only re-copies the same rows).
    """
    if barrier:
        df = df.localCheckpoint(eager=True)
    pos = bucketed_prefix_sum(
        df.withColumn("__one", F.lit(1)),
        bucket_col=bucket_col,
        order_by=order_by,
        value_col="__one",
        cum_col="__pos",
        bucket_desc=bucket_desc,
    )
    n_total = F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
    base = F.floor(F.col("__n") / n_tiles)          # rows in a small tile
    rem = F.col("__n") % n_tiles                    # number of big tiles
    cut = rem * (base + 1)                          # rows in big tiles
    i = F.col("__pos")
    tile = F.when(
        i <= cut, F.floor((i - 1) / (base + 1)) + 1
    ).otherwise(rem + F.floor((i - cut - 1) / base) + 1)
    return (
        pos.crossJoin(n_total)
        .withColumn(tile_col, tile.cast("int"))
        .drop("__one", "__pos", "__n")
    )


def grouped_ntile(
    df: DataFrame,
    n_tiles: int,
    order_by: list,
    bucket_col: str,
    partition_cols: list[str],
    tile_col: str = "tile",
    bucket_desc: bool = False,
    barrier: bool = False,
) -> DataFrame:
    """Exact ``ntile(k) OVER (PARTITION BY keys ORDER BY ...)`` where
    each key's partition is FACT-SIZED (e.g. all events of a type) — the
    keyed analog of :func:`global_ntile`, and the scale fix for windows
    that funnel a whole key through one task.

    Positions come from a per-key two-level prefix count: (keys, bucket)
    occupancy totals, per-key exclusive offsets via a window over the
    bucket AXIS (bounded by bucket cardinality, keyed by ``keys`` — no
    single-partition stage anywhere), then a (keys, bucket)-partitioned
    interior row_number.  Tile assignment is the closed-form positional
    formula with the per-key row count, identical to ANSI ntile.

    ``barrier=True`` localCheckpoints the input before the three
    references to it (totals, position join, per-key counts) — use it
    when the input is an expensive derived frame (chained passes); for
    a plain scan, three pruned scans are cheaper than materializing the
    fact table, so the default leaves the plan uncut."""
    if barrier:
        df = df.localCheckpoint(eager=True)
    totals = df.groupBy(*partition_cols, bucket_col).agg(
        F.count(F.lit(1)).alias("__btot")
    )
    bucket_order = (
        F.col(bucket_col).desc() if bucket_desc else F.col(bucket_col).asc()
    )
    wb = (
        Window.partitionBy(*partition_cols)
        .orderBy(bucket_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__btot").over(wb), F.lit(0))
    ).select(*partition_cols, bucket_col, "__off")
    ww = (
        Window.partitionBy(*partition_cols, bucket_col)
        .orderBy(*order_by)
    )
    counts = df.groupBy(*partition_cols).agg(F.count(F.lit(1)).alias("__n"))
    # offsets/counts cardinality scales with the key axis: join strategy
    # left to AQE (broadcasts when small) rather than forced (r5 advice)
    pos = (
        df.join(offsets, [*partition_cols, bucket_col])
        .withColumn("__pos", F.col("__off") + F.row_number().over(ww))
        .join(counts, partition_cols)
    )
    base = F.floor(F.col("__n") / n_tiles)
    rem = F.col("__n") % n_tiles
    cut = rem * (base + 1)
    i = F.col("__pos")
    tile = F.when(
        i <= cut, F.floor((i - 1) / (base + 1)) + 1
    ).otherwise(rem + F.floor((i - cut - 1) / base) + 1)
    return (
        pos.withColumn(tile_col, tile.cast("int"))
        .drop("__off", "__pos", "__n")
    )


def bucketed_locf(
    df: DataFrame,
    keys: list[str],
    order_by: list,
    value_col: str,
    bucket_col: str,
    filled_col: str = "filled",
) -> DataFrame:
    """Last-observation-carried-forward over FACT-SIZED key partitions
    without a per-key window task — the two-level form of
    ``last(value, ignorenulls) OVER (PARTITION BY keys ORDER BY ...)``.

    Three keyed stages: (1) per-(keys, bucket) last non-null value (a
    hash agg via ``max_by`` over non-null rows); (2) a SEED per bucket =
    the latest per-bucket-last among STRICTLY EARLIER buckets, via an
    ignorenulls window over the densified (keys × bucket) AXIS — bounded
    by bucket cardinality, keyed by ``keys``; (3) the interior LOCF
    within each (keys, bucket) partition, coalesced with the seed.
    ``bucket_col`` must be a monotone coarsening of the primary order
    column.  Results are picks, not accumulations — exactly equal to
    the single-sequence window on any engine."""
    nonnull = df.filter(F.col(value_col).isNotNull())
    ord_struct = F.struct(*order_by)
    bucket_last = nonnull.groupBy(*keys, bucket_col).agg(
        F.max_by(F.col(value_col), ord_struct).alias("__blast")
    )
    axis = df.select(*keys, bucket_col).distinct()
    wseed = (
        Window.partitionBy(*keys)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        axis.join(bucket_last, [*keys, bucket_col], "left")
        .withColumn("__seed", F.last("__blast", ignorenulls=True).over(wseed))
        .select(*keys, bucket_col, "__seed")
    )
    win = (
        Window.partitionBy(*keys, bucket_col)
        .orderBy(*[c for c in order_by])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # seeds cardinality = distinct keys × bucket axis; for callers like
    # trailing_time_window_prefix the bucket axis grows with the data's
    # time range, so the join strategy is left to AQE (broadcast when
    # small, shuffle when not) instead of a forced broadcast that could
    # exceed driver limits at unbounded scale (round-5 advice).
    return (
        df.join(seeds, [*keys, bucket_col])
        .withColumn(
            filled_col,
            F.coalesce(
                F.last(value_col, ignorenulls=True).over(win),
                F.col("__seed"),
            ),
        )
        .drop("__blast", "__seed")
    )


def grouped_rank_stats(
    df: DataFrame,
    partition_cols: list[str],
    value_col: str,
    bucket_col: str,
    order_tiebreak: list | None = None,
) -> DataFrame:
    """ANSI ``rank()`` / ``percent_rank()`` / ``cume_dist()`` over
    fact-sized key partitions WITHOUT a per-key window task.

    Positions come from the same two-level (keys, value-bucket) prefix
    counts as :func:`grouped_ntile`; tie semantics are recovered
    INSIDE the per-bucket window (r13 optimization — formerly a
    (keys, value) tie-collapse aggregation joined back twice): because
    ``bucket_col`` is a monotone coarsening of ``value_col``, every
    tie group lives inside one (keys, bucket) partition, so ``rank`` =
    offset + ANSI ``rank()`` within the bucket (position of the first
    peer) and ``cume_dist``'s numerator = offset + the default RANGE
    frame's running count (position of the last peer) — two window
    expressions over the ONE exchange the position join already
    establishes.  ``percent_rank`` = (rank-1)/(n-1).  The divisions are
    single exact-integer-operand IEEE ops, so results are bit-identical
    to the window-function oracle.

    NULL handling (round-5 advice): all internal joins are
    null-safe (``<=>``), so rows with a NULL ``value_col`` (or a NULL
    derived bucket) are RANKED rather than dropped; they sort first
    (Spark's ``asc`` null ordering), matching ``ORDER BY value ASC
    NULLS FIRST`` window semantics — within the window form, null
    values are ordering peers of each other, exactly the old
    null-safe-groupBy tie group.  The keys×bucket ``offsets`` /
    per-key ``counts`` frames are small by construction (distinct keys
    × bounded bucket axis); the join strategy is left to AQE rather
    than force-broadcast so an unbounded key axis degrades to a shuffle
    join instead of a driver OOM.

    .. deprecated:: r14
        ``order_tiebreak`` is ignored and warns when passed (ADVICE
        r13): rank/percent_rank/cume_dist are tie-invariant, so the
        deterministic intra-tie order it used to impose on the internal
        row numbering never reached the output.  It will be removed
        once external callers have migrated."""
    from functools import reduce as _reduce

    if order_tiebreak is not None:
        import warnings

        # FutureWarning, not DeprecationWarning: the default filters
        # hide DeprecationWarning outside __main__, so library callers
        # would never see it — defeating the point of warning at all
        warnings.warn(
            "grouped_rank_stats(order_tiebreak=...) is ignored: "
            "rank/percent_rank/cume_dist are tie-invariant (see "
            "docstring); the parameter will be removed",
            FutureWarning,
            stacklevel=2,
        )
    del order_tiebreak

    def _nsjoin(left, right, cols, keep):
        l, r = left.alias("__l"), right.alias("__r")
        cond = _reduce(
            lambda a, b: a & b,
            [
                F.col(f"__l.{c}").eqNullSafe(F.col(f"__r.{c}"))
                for c in cols
            ],
        )
        return l.join(r, cond).select(
            "__l.*", *[F.col(f"__r.{c}") for c in keep]
        )

    totals = df.groupBy(*partition_cols, bucket_col).agg(
        F.count(F.lit(1)).alias("__btot")
    )
    wb = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__btot").over(wb), F.lit(0))
    ).select(*partition_cols, bucket_col, "__off")
    # both tie statistics come from ONE per-(keys, bucket) sorted pass:
    # rank() = 1 + rows strictly before the first peer; the default
    # RANGE frame (unbounded preceding .. current row, peers included)
    # counts through the LAST peer.  Equal values share a bucket by the
    # monotone-coarsening contract, so bucket-local + offset is global.
    wv = Window.partitionBy(*partition_cols, bucket_col).orderBy(
        F.col(value_col).asc()
    )
    counts = df.groupBy(*partition_cols).agg(F.count(F.lit(1)).alias("__n"))
    pos = (
        _nsjoin(df, offsets, [*partition_cols, bucket_col], ["__off"])
        .withColumn("__rank", F.col("__off") + F.rank().over(wv))
        .withColumn(
            "__peer_cum", F.col("__off") + F.count(F.lit(1)).over(wv)
        )
    )
    out = _nsjoin(pos, counts, partition_cols, ["__n"])
    return (
        out.withColumn("rank", F.col("__rank"))
        .withColumn(
            "percent_rank",
            F.when(F.col("__n") > 1,
                   (F.col("__rank") - 1).cast("double")
                   / (F.col("__n") - 1).cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "cume_dist",
            F.col("__peer_cum").cast("double") / F.col("__n").cast("double"),
        )
        .drop("__pos", "__rank", "__peer_cum", "__n", "__off")
    )


def grouped_positions(
    df: DataFrame,
    partition_cols: list[str],
    order_by: list,
    bucket_col: str,
    pos_col: str = "__pos",
) -> DataFrame:
    """Exact global row position per key group (``row_number() OVER
    (PARTITION BY keys ORDER BY ...)``) via two-level prefix counts —
    the shared primitive behind :func:`grouped_ntile`,
    :func:`grouped_rank_stats`, and
    :func:`bucketed_sliding_rows_window`.  ``bucket_col`` must be a
    monotone ascending coarsening of the primary order column."""
    totals = df.groupBy(*partition_cols, bucket_col).agg(
        F.count(F.lit(1)).alias("__btot")
    )
    wb = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__btot").over(wb), F.lit(0))
    ).select(*partition_cols, bucket_col, "__off")
    ww = Window.partitionBy(*partition_cols, bucket_col).orderBy(*order_by)
    # keys×bucket cardinality: AQE picks the join strategy (r5 advice)
    return (
        df.join(offsets, [*partition_cols, bucket_col])
        .withColumn(pos_col, F.col("__off") + F.row_number().over(ww))
        .drop("__off")
    )


def bucketed_sliding_rows_window(
    df: DataFrame,
    keys: list[str],
    order_by: list,
    n_preceding: int,
    bucket_col: str,
    frame_aggs: dict,
    block_rows: int = 512,
) -> DataFrame:
    """ROWS-frame sliding window (``ROWS BETWEEN n PRECEDING AND
    CURRENT ROW``) over FACT-SIZED key partitions without a per-key
    window task — the row-count analog of
    :func:`bucketed_sliding_time_window`.

    Each row gets its exact global position (:func:`grouped_positions`)
    and lands in a fixed ``block_rows``-row block; the last
    ``n_preceding`` rows of every block are ghost-replicated into the
    next block (blocks are exactly full except the last, so the frame
    can never reach back past one block), and the window runs per
    (keys, block) — bounded tasks at any scale, frame CONTENT identical
    to the single-sequence window.  ``frame_aggs`` maps output names to
    aggregate Columns (e.g. ``{"vol": F.stddev_samp("value")}``);
    requires ``block_rows > n_preceding``."""
    if block_rows <= n_preceding:
        raise ValueError("block_rows must exceed n_preceding")
    pos = grouped_positions(df, keys, order_by, bucket_col)
    # barrier: the own/ghost union references the position frame twice —
    # without the cut the whole position chain (agg + offsets join) is
    # re-embedded per branch
    blocked = pos.withColumn(
        "__blk", F.floor((F.col("__pos") - 1) / block_rows)
    ).localCheckpoint(eager=True)
    own = blocked.withColumn("__p", F.col("__blk"))
    ghost = blocked.filter(
        ((F.col("__pos") - 1) % block_rows) >= block_rows - n_preceding
    ).withColumn("__p", F.col("__blk") + 1)
    both = own.unionByName(ghost)
    w = (
        Window.partitionBy(*keys, "__p")
        .orderBy(F.col("__pos").asc())
        .rowsBetween(-n_preceding, 0)
    )
    out = both.select(
        "*", *[agg.over(w).alias(name) for name, agg in frame_aggs.items()]
    )
    return out.filter(F.col("__p") == F.col("__blk")).drop(
        "__pos", "__blk", "__p"
    )


def trailing_time_window_prefix(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """Trailing time-range count + EXACT decimal sum in O(n) — the
    WIDE-FRAME scale path for ``RANGE BETWEEN W PRECEDING AND CURRENT
    ROW``.

    Spark evaluates sliding frames by re-aggregating each frame
    (O(rows × frame width)); at 10M rows with ~3k-row frames that is
    minutes (measured: scripts/ab_scale.py class) for BOTH the plain
    window and the ghost-replicated form.  This operator instead uses
    prefix algebra: ``trailing(t) = cum(t) - cum_before(t - W)`` where
    ``cum`` is a per-key two-level prefix (count, decimal sum) and
    ``cum_before`` is a strictly-before as-of lookup of that cumulative
    curve at ``t - W`` (bucketed LOCF union, probe sorts BEFORE the
    curve point on ties so ``ts == t-W`` stays inside the frame).
    Integer/decimal arithmetic throughout — results equal the RANGE
    window bit-for-bit.  Adds ``trailing_n`` and ``trailing_sum``."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    window_us = window_seconds * 1_000_000
    base = df.withColumn("__us", us).withColumn(
        "__bkt", F.floor(F.col("__us") / window_us)
    )
    # per-key two-level cumulative (count, sum) over (__us, tiebreak)
    totals = base.groupBy(*keys, "__bkt").agg(
        F.count(F.lit(1)).alias("__bn"),
        F.sum(F.col(value_col).cast(decimal_type)).alias("__bs"),
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *keys, "__bkt",
        F.coalesce(F.sum("__bn").over(wb), F.lit(0)).alias("__offn"),
        F.coalesce(
            F.sum("__bs").over(wb), F.lit(0).cast(decimal_type)
        ).alias("__offs"),
    )
    # RANGE (not ROWS) interior frame: timestamp TIES must all share one
    # cumulative — the oracle's RANGE frame includes every peer at t, so
    # cum(t) has to be tie-invariant; growing range frames stay O(n)
    ww = (
        Window.partitionBy(*keys, "__bkt")
        .orderBy(F.col("__us").asc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        base.join(offsets, [*keys, "__bkt"])  # keys×bucket: AQE decides
        .withColumn("__cn", F.col("__offn") + F.count(F.lit(1)).over(ww))
        .withColumn(
            "__cs",
            F.col("__offs")
            + F.sum(F.col(value_col).cast(decimal_type)).over(ww),
        )
        .drop("__offn", "__offs")
        # probe + curve branches both read the materialized cumulative:
        # without the barrier the agg+offsets+join+window chain runs
        # once per branch (measured: the barrier-free form gave back
        # the whole LOCF-fusion win)
        .localCheckpoint(eager=True)
    )
    # strictly-before as-of: probe at (t - W); probe sorts BEFORE a
    # curve point at the same instant, so that point is excluded from
    # cum_before and stays inside the trailing frame.
    #
    # r13 optimization (guide §2.3/§2.4): the curve's (count, sum) pair
    # rides ONE nullable struct column, so a SINGLE bucketed_locf pass
    # fills both components (formerly two passes = double the LOCF
    # exchanges), and the probe rows carry their own payload + cum
    # columns through the union, so the final fact-sized __rowid
    # join-back — and the monotonically_increasing_id bookkeeping it
    # required — are gone entirely.
    cs_type = cum.schema["__cs"].dataType
    payload = [c for c in df.columns if c not in keys] + ["__cn", "__cs"]
    pk_struct = F.struct(
        F.col("__cn").alias("n"), F.col("__cs").alias("s")
    )
    curve = cum.select(
        *keys,
        F.col("__us").alias("__t"),
        F.lit(1).alias("__side"),
        pk_struct.alias("__pk"),
        *[
            F.lit(None).cast(cum.schema[c].dataType).alias(c)
            for c in payload
        ],
    )
    probe_rows = cum.select(
        *keys,
        (F.col("__us") - window_us).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(f"struct<n:long,s:{cs_type.simpleString()}>")
        .alias("__pk"),
        *payload,
    )
    unioned = probe_rows.unionByName(curve).withColumn(
        "__pb", F.floor(F.col("__t") / window_us)
    )
    filled = bucketed_locf(
        unioned,
        keys=keys,
        order_by=[F.col("__t"), F.col("__side")],
        value_col="__pk",
        bucket_col="__pb",
        filled_col="__before",
    ).filter(F.col("__side") == 0)
    out = filled.select(
        *[c for c in df.columns],
        (
            F.col("__cn") - F.coalesce(F.col("__before.n"), F.lit(0))
        ).alias("trailing_n"),
        (
            F.col("__cs")
            - F.coalesce(F.col("__before.s"), F.lit(0).cast(cs_type))
        ).alias("trailing_sum"),
    )
    return out


def bucketed_sliding_time_window(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """Trailing time-range window aggregate (count + EXACT decimal sum)
    without fact-sized window partitions — the scale form of
    ``PARTITION BY key ORDER BY ts RANGE BETWEEN W PRECEDING AND
    CURRENT ROW`` when a key's history is fact-sized.

    Overlap replication: rows land in time buckets of width
    ``window_seconds``; each row is ALSO replicated as a ghost into the
    next bucket (a trailing window of width W can only reach back into
    the immediately previous bucket when buckets are >= W wide).  The
    window then runs partitioned by (keys, bucket) — bounded work per
    task at any scale — and ghost rows are dropped after providing
    frame context.  2x row replication buys unbounded parallelism.

    The frame sum is an exact DECIMAL accumulation, so Spark's
    incremental add/remove sliding-frame evaluation and an oracle's
    recompute-per-row evaluation agree bit-for-bit; cast the returned
    ``trailing_sum`` to double at the output boundary.  Adds
    ``trailing_n`` (BIGINT) and ``trailing_sum`` (decimal) columns."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    window_us = window_seconds * 1_000_000
    with_b = df.withColumn("__us", us).withColumn(
        "__bkt", F.floor(F.col("__us") / window_us)
    )
    own = with_b.withColumn("__p", F.col("__bkt"))
    ghost = with_b.withColumn("__p", F.col("__bkt") + 1)
    both = own.unionByName(ghost)
    w = (
        Window.partitionBy(*keys, "__p")
        .orderBy("__us")
        .rangeBetween(-window_us, 0)
    )
    out = both.select(
        "*",
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        F.sum(F.col(value_col).cast(decimal_type)).over(w).alias(
            "trailing_sum"
        ),
    )
    return out.filter(F.col("__p") == F.col("__bkt")).drop(
        "__us", "__bkt", "__p"
    )


def seasonal_decompose(
    daily: DataFrame,
    keys: list[str],
    day_col: str = "day",
    value_col: str = "day_mean",
    ma_window: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of a daily series per
    key group: trend = centered ``ma_window``-day moving average (full
    windows only), seasonal = centered mean weekday departure from
    trend, residual = value - trend - seasonal.

    Every mean is computed as an EXACT DECIMAL(18,6) sum divided once,
    and every stage output is rounded to 6dp, so the decomposition is
    bit-stable across engines and partitionings: float summation order
    differs between engines (and between runs at different
    parallelisms), but decimal sums are associative and the single
    IEEE division of identical operands is deterministic.

    Shape: two key-partitioned windows over the DAILY rollup (thousands
    of rows per key, never facts) + one (key, weekday) hash agg
    broadcast back.  Returns the daily frame + ``trend, seasonal,
    residual`` for days with a full trend window.
    """
    half = ma_window // 2
    w = (
        Window.partitionBy(*keys)
        .orderBy(day_col)
        .rowsBetween(-half, half)
    )
    v = F.round(F.col(value_col), 6)

    def _exact_mean(col: str, n):  # decimal sum, one double division
        return F.round(
            F.sum(F.col(col).cast("decimal(18,6)")).cast("double") / n, 6
        )

    def _exact_mean_over(col: str, win, n):
        return F.round(
            F.sum(F.col(col).cast("decimal(18,6)")).over(win).cast("double")
            / n,
            6,
        )

    with_trend = (
        daily.withColumn("__v6", v)
        .withColumn("__n_win", F.count(F.lit(1)).over(w))
        .withColumn("__trend", _exact_mean_over("__v6", w, F.col("__n_win")))
        .filter(F.col("__n_win") == ma_window)
    )
    detrended = with_trend.withColumn(
        "__dt", F.round(F.col("__v6") - F.col("__trend"), 6)
    ).withColumn("__wd", F.weekday(F.col(day_col)))
    wk = detrended.groupBy(*keys, "__wd").agg(
        _exact_mean("__dt", F.count(F.lit(1))).alias("__raw_seasonal")
    )
    center = wk.groupBy(*keys).agg(
        _exact_mean("__raw_seasonal", F.count(F.lit(1))).alias("__center")
    )
    seasonal = (
        wk.join(center, on=list(keys))
        .select(
            *keys, "__wd",
            F.round(F.col("__raw_seasonal") - F.col("__center"), 6).alias(
                "__seasonal"
            ),
        )
    )
    out = detrended.join(F.broadcast(seasonal), on=[*keys, "__wd"])
    return out.select(
        *keys,
        F.col(day_col),
        F.col("__v6").alias("value"),
        F.col("__trend").alias("trend"),
        F.col("__seasonal").alias("seasonal"),
        F.round(
            F.col("__v6") - F.col("__trend") - F.col("__seasonal"), 6
        ).alias("residual"),
    )


def cusum_changepoints(
    daily: DataFrame,
    keys: list[str],
    day_col: str = "day",
    value_col: str = "day_mean",
    threshold_sigmas: float = 3.0,
) -> DataFrame:
    """CUSUM drift monitor per key group: running sum of (rounded)
    departures from the group mean, flagged where |cusum| exceeds
    ``threshold_sigmas`` group standard deviations — the sequential
    level-shift detector QC dashboards run on station series.

    Group mean/std come from one hash agg broadcast back; the running
    sum is a key-partitioned window over the daily rollup.  Departures
    are rounded to 6dp before accumulation so the running sum is
    engine-exact.  Returns one row per (key, day) with ``cusum`` and
    ``flagged``.
    """
    stats = daily.groupBy(*keys).agg(
        F.round(F.avg(F.round(F.col(value_col), 6)), 6).alias("__mu"),
        F.round(F.stddev_samp(F.round(F.col(value_col), 6)), 6).alias("__sd"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = F.round(F.round(F.col(value_col), 6) - F.col("__mu"), 6)
    out = (
        daily.join(F.broadcast(stats), on=list(keys))
        .withColumn("__dev", dev)
        .withColumn("cusum", F.round(F.sum("__dev").over(w), 6))
        .withColumn(
            "flagged",
            F.abs(F.col("cusum"))
            > F.lit(threshold_sigmas) * F.col("__sd"),
        )
    )
    return out.select(
        *keys, day_col,
        F.round(F.col(value_col), 6).alias("value"),
        "cusum", "flagged",
    )


def mann_kendall_trend(
    daily: DataFrame,
    keys: list[str],
    day_col: str = "day",
    value_col: str = "day_mean",
) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope per key group — THE
    nonparametric trend statistics climate monitoring reports: S =
    sum of sign(x_j - x_i) over ordered pairs, the no-ties normal
    approximation variance n(n-1)(2n+5)/18, the continuity-corrected Z,
    and the median pairwise slope.

    Shape: a pairwise self-join ON THE DAILY AXIS per key — O(n^2) in
    series length, bounded because n is days-per-key (365-ish), never
    facts; one hash agg finishes.  Values are rounded to 6dp before
    differencing so sign() can never flip on an engine ulp.
    """
    v6 = F.round(F.col(value_col), 6)
    d = daily.select(
        *keys, F.col(day_col).alias("__d"), v6.alias("__v")
    )
    a = d.alias("a")
    b = d.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
    pairs = a.join(b, cond).filter(F.col("a.__d") < F.col("b.__d")).select(
        *[F.col(f"a.{k}").alias(k) for k in keys],
        F.signum(F.col("b.__v") - F.col("a.__v")).alias("__sgn"),
        (
            (F.col("b.__v") - F.col("a.__v"))
            / F.datediff(F.col("b.__d"), F.col("a.__d"))
        ).alias("__slope"),
    )
    n_expr = F.count(F.lit(1))
    out = pairs.groupBy(*keys).agg(
        F.sum("__sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(__slope, 0.5)"), 6).alias("sen_slope"),
    )
    # recover n from the pair count: n_pairs = n(n-1)/2
    n = F.round((F.lit(1.0) + F.sqrt(1.0 + 8.0 * F.col("n_pairs"))) / 2.0, 0)
    var = n * (n - 1) * (2 * n + 5) / F.lit(18.0)
    z = F.when(
        F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var)
    ).when(
        F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return out.select(
        *keys, "s_stat", "n_pairs", "sen_slope",
        F.round(z, 6).alias("z_stat"),
    )


def grouped_ols(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y`` on ``x``:
    ``slope, intercept, r2, n`` — the parametric complement of
    :func:`mann_kendall_trend` (which is rank-based and outlier-robust;
    OLS gives the magnitude and fit quality the MK test doesn't).

    Engine-exactness: ``x`` must be integer-valued (a day/step index —
    cast to long, exact); ``y`` is rounded to ``decimals`` and cast to
    DECIMAL(18,6).  The five sufficient statistics (Σx, Σy, Σxy, Σx²,
    Σy²) are then EXACT sums — int×int and decimal×int are exact, and
    (18,6)×(18,6) products keep full 12-digit scale in both Spark and
    DuckDB decimal arithmetic — so decimal-sum associativity makes them
    independent of partitioning/shuffle order.  Each is cast once to
    double and the closed-form slope/intercept/r² arithmetic on those
    identical doubles is deterministic IEEE — no avg(), no float
    accumulation anywhere.  One hash agg; map-side partials do the
    heavy lifting at 100 TB.

    Degenerate groups (var(x)=0 or var(y)=0) return NULL slope/r2.
    """
    xl = F.col(x_col).cast("long")
    yd = F.round(F.col(y_col).cast("double"), decimals).cast("decimal(18,6)")
    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(xl).cast("double").alias("__sx"),
        F.sum(yd).cast("double").alias("__sy"),
        F.sum(yd * xl).cast("double").alias("__sxy"),
        F.sum(xl * xl).cast("double").alias("__sxx"),
        F.sum(yd * yd).cast("double").alias("__syy"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    sxy, sxx, syy = F.col("__sxy"), F.col("__sxx"), F.col("__syy")
    cov_n = n * sxy - sx * sy  # n^2 * covariance
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = F.when(varx_n != 0.0, cov_n / varx_n)
    intercept = F.when(varx_n != 0.0, (sy - (cov_n / varx_n) * sx) / n)
    r2 = F.when(
        (varx_n != 0.0) & (vary_n != 0.0),
        (cov_n * cov_n) / (varx_n * vary_n),
    )
    return stats.select(
        *keys,
        F.col("__n").cast("long").alias("n"),
        F.round(slope, decimals).alias("slope"),
        F.round(intercept, decimals).alias("intercept"),
        F.round(r2, decimals).alias("r2"),
    )


def categorical_drift_chi2(
    df: DataFrame,
    category_col: str,
    period_col,
    keys: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between a categorical
    column and a (boolean/binary) period split — the drift check QC
    dashboards run between ingest snapshots ("did the event-type mix
    shift?").  ``period_col`` is a Column evaluating to a 0/1 period id.

    Returns one row per category: observed counts per period, the
    category's chi² contribution, and the same grand total + dof on
    every row (window over the category axis, never the facts).
    Contributions are computed from EXACT integer counts with
    deterministic double arithmetic, rounded, then decimal-summed — so
    the statistic is engine- and partitioning-exact.  One hash agg over
    the facts; everything after runs on the category-sized rollup.
    """
    keys = keys or []
    cells = df.groupBy(*keys, category_col).agg(
        F.sum(F.when(period_col == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(period_col == 1, 1).otherwise(0)).alias("n1"),
    )
    wk = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(0))
    t0 = F.sum("n0").over(wk).cast("double")
    t1 = F.sum("n1").over(wk).cast("double")
    grand = t0 + t1
    row_t = (F.col("n0") + F.col("n1")).cast("double")
    e0 = row_t * t0 / grand
    e1 = row_t * t1 / grand
    part = F.round(
        (F.col("n0").cast("double") - e0) * (F.col("n0").cast("double") - e0) / e0
        + (F.col("n1").cast("double") - e1) * (F.col("n1").cast("double") - e1) / e1,
        decimals,
    )
    with_part = cells.withColumn("chi2_part", part)
    total = F.round(
        F.sum(F.col("chi2_part").cast("decimal(28,6)")).over(wk).cast("double"),
        decimals,
    )
    dof = F.count(F.lit(1)).over(wk) - 1
    return with_part.select(
        *keys, category_col, "n0", "n1", "chi2_part",
        total.alias("chi2_total"), dof.cast("long").alias("dof"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: how many entities performed step 1,
    then step 2 strictly after their FIRST step-1 event, then step 3
    strictly after that step-2 event, and so on (the standard
    first-touch funnel).  Returns one row per step: ``step_idx, step,
    n_entities``.

    Shape: ONE shuffle on the entity key, then ``len(steps)`` stacked
    window passes over the same partitioning (each computes the
    min-timestamp of the next step conditional on the previous
    anchor — Catalyst reuses the single sort).  The final rollup
    reduces per-entity anchors to ``len(steps)`` counters — map-side
    combinable, so the funnel of a 100 TB event table leaves the
    executors as a handful of longs.
    """
    w = Window.partitionBy(entity_col)
    ts = F.col(ts_col).cast("timestamp").cast("double")
    cur = events.select(
        F.col(entity_col), F.col(type_col).alias("__t"), ts.alias("__ts")
    )
    prev_anchor = None
    for i, step in enumerate(steps):
        cond = F.col("__t") == step
        if prev_anchor is not None:
            cond = cond & (F.col("__ts") > F.col(prev_anchor))
        anchor = f"__a{i}"
        cur = cur.withColumn(
            anchor, F.min(F.when(cond, F.col("__ts"))).over(w)
        )
        prev_anchor = anchor
    per_entity = cur.groupBy(entity_col).agg(
        *[F.max(f"__a{i}").alias(f"__a{i}") for i in range(len(steps))]
    )
    counters = per_entity.agg(
        *[
            F.count(F.col(f"__a{i}")).alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"__n{i}").alias("n_entities"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counters.select(F.explode(rows).alias("r")).select(
        "r.step_idx", "r.step", "r.n_entities"
    )


def kaplan_meier(
    subjects: DataFrame,
    time_col: str = "t",
    event_col: str = "is_event",
    decimals: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival estimator from one row per subject
    (``time_col`` = event-or-censor time, ``event_col`` = 1 event /
    0 censored): for each time with >= 1 event, the at-risk count,
    event count, and ``S(t) = Π_{s<=t} (1 - d_s/n_s)``.

    Exactness: d/n are exact integers from one hash agg; the product is
    ``exp`` of a CUMULATIVE DECIMAL SUM of per-time rounded ln factors,
    so no float product order exists.  A time where the whole remaining
    risk set fails (n == d — necessarily the last event time) emits
    ``survival = 0`` directly instead of folding ln 0 into the sum.

    Shape: subjects reduce to the distinct-time axis in one hash agg;
    the cumulative windows run on that axis (days/weeks — thousands of
    rows at most, the same bounded-axis pattern as gaps-and-islands),
    never on subjects."""
    per_t = subjects.groupBy(F.col(time_col).alias("t")).agg(
        F.sum(F.when(F.col(event_col) == 1, 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col(event_col) == 1, 0).otherwise(1)).alias("c"),
    )
    w = Window.partitionBy(F.lit(0)).orderBy("t")
    before = (
        F.sum(F.col("d") + F.col("c"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    total = F.sum(F.col("d") + F.col("c")).over(
        Window.partitionBy(F.lit(0))
    )
    axis = per_t.select(
        "t", "d", "c",
        (total - F.coalesce(before, F.lit(0))).alias("n_at_risk"),
    )
    lnf = F.when(
        (F.col("d") > 0) & (F.col("n_at_risk") > F.col("d")),
        F.round(
            F.log(
                1.0
                - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
            ),
            decimals,
        ),
    ).otherwise(F.lit(0.0))
    flagged = axis.withColumn("__lnf", lnf)
    cum = F.sum(F.col("__lnf").cast("decimal(28,6)")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    surv = F.when(
        F.col("n_at_risk") == F.col("d"), F.lit(0.0)
    ).otherwise(F.round(F.exp(cum.cast("double")), decimals))
    return (
        flagged.withColumn("survival", surv)
        .filter(F.col("d") > 0)
        .select("t", "n_at_risk", F.col("d").alias("d_events"), "survival")
    )
