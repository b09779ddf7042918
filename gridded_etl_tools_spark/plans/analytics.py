"""Statistical / distribution analytics over the synthetic tables:
dispersion moments, correlation, exact + approximate percentiles,
distribution windows (ntile / cume_dist), climatology anomalies (the
climate-science reduction the reference's docstrings gesture at —
``publish.py:485-487`` "mean/max of a dimension" upstream needs),
deterministic per-group mode, fixed-width histograms, distinct-count
rollups with mergeable HLL sketches, and rolling volatility.

Scale notes: every aggregate here is map-side combinable (moments,
counts, HLL sketch buffers), so shuffles carry one row per group.  The
climatology join broadcasts the small cycle table back onto the fact
scan.  Sketch queries demonstrate the 100 TB pattern — pre-aggregate a
mergeable summary per partition grain (day), then roll up without ever
re-touching the facts.

Same registration + reproducibility conventions as ``plans/catalog.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gridded_etl_tools_spark.functions.normalize import pos_zero
from gridded_etl_tools_spark.operators import aggregations as agg_ops
from gridded_etl_tools_spark.plans.catalog import query
from gridded_etl_tools_spark.plans.tables import load


@query(
    "dispersion_stats",
    """
    WITH mu AS (
      SELECT event_type, avg(value) AS mean_value FROM events GROUP BY 1
    ),
    cm AS (
      SELECT e.event_type,
             count(*)                        AS n,
             stddev_samp(value)              AS sd,
             var_samp(value)                 AS vr,
             avg(pow(value - mean_value, 2)) AS m2,
             avg(pow(value - mean_value, 3)) AS m3,
             avg(pow(value - mean_value, 4)) AS m4
      FROM events e JOIN mu USING (event_type)
      GROUP BY 1
    )
    SELECT event_type, n,
           round(sd, 6)                    AS stddev,
           round(vr, 5)                    AS variance,
           round(m3 / pow(m2, 1.5), 6)     AS skewness,
           round(m4 / pow(m2, 2) - 3, 6)   AS kurtosis
    FROM cm
    """,
)
def dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type moment statistics via Spark's one-pass builtin
    accumulators (stddev_samp / var_samp / skewness / kurtosis — Spark
    defines skew/kurt as population g1/g2, which the oracle reproduces
    two-pass from central moments).  Single partial+final hash agg; the
    shuffle carries one row per event_type."""
    ev = load(spark, sf_dir, "events")
    out = agg_ops.dispersion_stats(ev, ["event_type"], "value")
    return out.select(
        "event_type", "n",
        F.round("stddev", 6).alias("stddev"),
        F.round("variance", 5).alias("variance"),
        F.round("skewness", 6).alias("skewness"),
        F.round("kurtosis", 6).alias("kurtosis"),
    )


@query(
    "correlation_stats",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 3) AS qty_price_covar,
           -- + 0.0 rewrites -0.0 to +0.0 (same normalization as the
           -- Spark side; the gate's stringify distinguishes the two)
           round(covar_pop(l_discount, l_tax), 6) + 0.0      AS disc_tax_covar_pop
    FROM lineitem GROUP BY 1
    """,
)
def correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + covariance per return flag — bivariate
    map-combinable accumulators, one row per group after shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias("qty_price_covar"),
        # signed-zero canon (functions/normalize.pos_zero, mirrored by
        # `+ 0.0` in the oracle SQL): DuckDB's covar_pop can yield -0.0
        # where Spark yields 0.0.
        pos_zero(F.round(F.covar_pop("l_discount", "l_tax"), 6)).alias(
            "disc_tax_covar_pop"
        ),
    )


@query(
    "value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.90), 6) AS p90
    FROM events GROUP BY 1
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``).  Exact quantiles need the full value
    multiset per group — fine at dashboard cardinalities; the 100 TB
    path is ``approx_value_percentiles`` below."""
    ev = load(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit([0.25, 0.50, 0.75, 0.90])).alias("p")
    )
    return pct.select(
        "event_type",
        F.round(F.col("p")[0], 6).alias("p25"),
        F.round(F.col("p")[1], 6).alias("p50"),
        F.round(F.col("p")[2], 6).alias("p75"),
        F.round(F.col("p")[3], 6).alias("p90"),
    )


@query(
    "user_activity_deciles",
    """
    WITH per_user AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY 1
    ),
    tiled AS (
      SELECT user_id, n_events,
             ntile(10) OVER (ORDER BY n_events, user_id) AS decile
      FROM per_user
    )
    SELECT decile, count(*) AS n_users,
           min(n_events) AS min_events, max(n_events) AS max_events
    FROM tiled GROUP BY 1
    """,
)
def user_activity_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile buckets over per-user activity.  ntile is ordered on
    (count, user_id) so tie placement is engine-independent.  The user
    axis grows with the data, so NO global single-partition window runs:
    ``operators/aggregations.global_ntile`` computes each user's exact
    global position with a two-level bucketed prefix count (bucket =
    the activity count itself — the monotone coarsening of the primary
    sort key) and derives the identical positional ntile in closed
    form.  The oracle's native ntile must agree exactly."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    tiled = agg_ops.global_ntile(
        per_user.withColumn("__bkt", F.col("n_events")),
        10,
        order_by=[F.asc("n_events"), F.asc("user_id")],
        bucket_col="__bkt",
        tile_col="decile",
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("n_events").alias("min_events"),
        F.max("n_events").alias("max_events"),
    )


@query(
    "value_cume_dist_tail",
    """
    WITH ranked AS (
      SELECT event_id, event_type, value,
             cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
      FROM events
    )
    SELECT event_id, event_type, round(value, 6) AS value, round(cd, 6) AS cd
    FROM ranked WHERE cd >= 0.995
    """,
)
def value_cume_dist_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-CDF tail: events in the top half-percent of their
    type's value distribution.  cume_dist is tie-stable (counts rows
    with value <= current), so no artificial tie-break is needed.
    Round-5 scale form: ``operators/aggregations.grouped_rank_stats``
    computes the identical cume_dist from two-level (type, value-
    bucket) prefix counts — each type's fact-sized axis never funnels
    through one window task."""
    ev = load(spark, sf_dir, "events")
    stats = agg_ops.grouped_rank_stats(
        ev.withColumn("__bkt", F.floor(F.col("value") / 5.0)),
        partition_cols=["event_type"],
        value_col="value",
        bucket_col="__bkt",
    )
    return (
        stats.filter(F.col("cume_dist") >= 0.995)
        .select(
            "event_id", "event_type",
            F.round("value", 6).alias("value"),
            F.round("cume_dist", 6).alias("cd"),
        )
    )


@query(
    "climatology_anomaly_topk",
    """
    WITH clim AS (
      SELECT event_type, extract(hour FROM ts) AS hr,
             round(avg(value), 6) AS clim_mean
      FROM events GROUP BY 1, 2
    ),
    anom AS (
      SELECT e.event_id, e.event_type, extract(hour FROM e.ts) AS hr,
             round(e.value - c.clim_mean, 6) AS anomaly
      FROM events e
      JOIN clim c ON c.event_type = e.event_type
                 AND c.hr = extract(hour FROM e.ts)
    )
    SELECT event_id, event_type, CAST(hr AS INT) AS hr, anomaly,
           CAST(row_number() OVER (ORDER BY abs(anomaly) DESC, event_id) AS INT) AS rank
    FROM anom QUALIFY rank <= 50
    """,
)
def climatology_anomaly_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly vs. diurnal climatology (climate-science A12 extension):
    the 50 most anomalous events relative to their (type, hour-of-day)
    long-run mean.  Physical shape: tiny climatology aggregate →
    broadcast back onto the fact scan (facts never shuffle) → global
    top-k as TakeOrderedAndProject.  The climatological mean is rounded
    before subtraction so ranking is reproducible across engines."""
    ev = load(spark, sf_dir, "events").withColumn(
        "hr", F.hour("ts").cast("int")
    )
    anom = agg_ops.climatology_anomaly(
        ev, cycle_cols=["hr"], group_cols=["event_type"], value_col="value"
    )
    # Global top-k as sort+limit: Catalyst plans TakeOrderedAndProject
    # (per-partition heap of 50, merged on the driver) — no global window,
    # no single-partition shuffle of the fact-sized anomaly table.  The
    # rank window then runs over only the 50 survivors.
    topk = anom.orderBy(F.abs(F.col("anomaly")).desc(), F.asc("event_id")).limit(50)
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.abs(F.col("anomaly")).desc(), F.asc("event_id")
    )
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("event_id", "event_type", "hr", "anomaly", "rank")
    )


@query(
    "daily_mode_event_type",
    """
    WITH counts AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type AS mode_value, n AS mode_count
    FROM counts
    QUALIFY row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) = 1
    """,
)
def daily_mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent event type per day with deterministic tie-break —
    builtin ``mode()`` resolves ties arbitrarily, so it is re-expressed
    as count + ranking window (operators/aggregations.grouped_mode)."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    return agg_ops.grouped_mode(ev, ["day"], "event_type")


@query(
    "value_histogram",
    """
    SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
           count(*) AS bin_count
    FROM events GROUP BY 1, 2
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width distributed histogram: map-side binning + one hash
    aggregate; no driver collect, no sort."""
    ev = load(spark, sf_dir, "events")
    return agg_ops.fixed_width_histogram(ev, ["event_type"], "value", 10.0)


@query(
    "distinct_users_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily distinct users — the expand + two-level aggregate
    Catalyst plans for COUNT(DISTINCT).  Scale path: the HLL sketch
    rollup below replaces the second shuffle with mergeable buffers."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    return ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("n_users")
    )


# --------------------------------------------------------------------------
# Sketch / approximate scale paths (⊘ rows-only driver check; accuracy is
# asserted against the exact answers in tests/test_analytics.py)
# --------------------------------------------------------------------------


@query("approx_distinct_users_daily")
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users via Apache DataSketches HLL
    (``hll_sketch_agg``).  One shuffle of fixed-size sketch buffers —
    at 100 TB this is the only viable distinct-count plan (the exact
    COUNT(DISTINCT) expand doubles the shuffle volume).  ⊘: estimates
    are engine-specific; accuracy vs exact is pytest-asserted."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    return (
        ev.groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
        .select(
            "day",
            F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
        )
    )


@query("sketch_rollup_weekly")
def sketch_rollup_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches union-merged to
    weekly distinct-user estimates WITHOUT re-touching the fact table —
    the hypertable/continuous-aggregate pattern.  At 100 TB the daily
    sketch table is millions of times smaller than the facts, and any
    calendar rollup (week/month/year) derives from it by
    ``hll_union_agg`` alone."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    return (
        daily.withColumn("week", F.date_trunc("week", "day"))
        .groupBy("week")
        .agg(F.hll_union_agg("sk").alias("wsk"))
        .select(
            "week",
            F.hll_sketch_estimate("wsk").cast("long").alias("approx_users"),
        )
    )


@query("approx_value_percentiles")
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (accuracy 10000 ≈ 0.01%
    rank error) — the bounded-memory quantile path; each task keeps an
    ε-summary, merged map-side.  ⊘: GK summaries are engine-specific;
    closeness to the exact quantiles is pytest-asserted."""
    ev = load(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.approx_percentile(
            "value", F.lit([0.25, 0.50, 0.75, 0.90]), F.lit(10000)
        ).alias("p")
    )
    return pct.select(
        "event_type",
        F.round(F.col("p")[0], 6).alias("p25"),
        F.round(F.col("p")[1], 6).alias("p50"),
        F.round(F.col("p")[2], 6).alias("p75"),
        F.round(F.col("p")[3], 6).alias("p90"),
    )


# Bound-check companions: the estimate queries above are ⊘ rows-only
# (sketch buffers are engine-specific), but the CLAIM a sketch makes —
# "the estimate lands within ε of the truth" — is a boolean BOTH engines
# can agree on.  Spark computes exact + estimate + |est-exact|/exact<=ε;
# the oracle computes the same exact value and asserts the bound as a
# literal TRUE.  A sketch regression (wrong merge, wrong parameters)
# flips the boolean and fails the hash — so the 3 sketch families are
# now driver-checkable end-to-end, not just pytest-asserted.


@query(
    "approx_distinct_bound_check",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY 1
    """,
)
def approx_distinct_bound_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound certificate for ``approx_distinct_users_daily``:
    the DataSketches HLL (lgK=14, relative error ~0.8%) daily estimate
    must land within 5% of the exact distinct count.  The exact side
    exists only to certify the sketch at test scale — at 100 TB you run
    the sketch alone and trust exactly this certified bound."""
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    per_day = ev.groupBy("day").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
    )
    est = F.hll_sketch_estimate("sk")
    return per_day.select(
        "day",
        "exact_users",
        (
            F.abs(est - F.col("exact_users"))
            / F.col("exact_users").cast("double")
            <= 0.05
        ).alias("within_bound"),
    )


@query(
    "sketch_rollup_bound_check",
    """
    SELECT CAST(date_trunc('week', date_trunc('day', ts)) AS TIMESTAMP)
             AS week,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY 1
    """,
)
def sketch_rollup_bound_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound certificate for ``sketch_rollup_weekly``: daily HLL
    sketches union-merged to weekly estimates (facts touched once) must
    land within 5% of the exact weekly distinct count — certifying that
    the MERGE path, not just the base sketch, preserves the bound."""
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    weekly_est = (
        daily.withColumn("week", F.date_trunc("week", "day"))
        .groupBy("week")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    weekly_exact = (
        ev.withColumn("week", F.date_trunc("week", "day"))
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return weekly_exact.join(weekly_est, "week").select(
        "week",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            / F.col("exact_users").cast("double")
            <= 0.05
        ).alias("within_bound"),
    )


@query(
    "approx_percentiles_bound_check",
    """
    SELECT event_type, count(*) AS n,
           TRUE AS p50_within_bound, TRUE AS p90_within_bound
    FROM events GROUP BY event_type
    """,
)
def approx_percentiles_bound_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Error-bound certificate for ``approx_value_percentiles``: the
    Greenwald-Khanna p50/p90 (accuracy 10000) must land within 5%
    relative of the exact interpolated percentiles per event type."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, array(0.50, 0.90))").alias("ex"),
        F.approx_percentile(
            "value", F.lit([0.50, 0.90]), F.lit(10000)
        ).alias("ap"),
    )
    def within(i: int):
        return (
            F.abs(F.col("ap")[i] - F.col("ex")[i]) / F.abs(F.col("ex")[i])
            <= 0.05
        )
    return agg.select(
        "event_type", "n",
        within(0).alias("p50_within_bound"),
        within(1).alias("p90_within_bound"),
    )


@query(
    "rolling_volatility",
    """
    SELECT event_id, event_type,
           round(stddev_samp(value) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 5) AS vol7
    FROM events
    """,
)
def rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row stddev per event type (rolling volatility / local
    variability of a sensor series).  Frame ordering includes event_id
    so the ROWS frame is identical across engines under timestamp ties.
    Round-5 scale form (``operators/aggregations.
    bucketed_sliding_rows_window``): exact global positions land rows
    in 512-row blocks, the last 6 rows of each block ghost-replicate
    into the next, and the ROWS frame runs per (type, block) — frame
    CONTENT is identical to the single-sequence window, so values are
    unchanged while no event type ever funnels through one task."""
    ev = load(spark, sf_dir, "events")
    prepared = ev.select(
        "event_id", "event_type", "value",
        F.col("ts").cast("timestamp").alias("ts"),
    ).withColumn("__bkt", F.floor(F.unix_micros("ts") / 3_600_000_000))
    out = agg_ops.bucketed_sliding_rows_window(
        prepared,
        keys=["event_type"],
        order_by=[F.asc("ts"), F.asc("event_id")],
        n_preceding=6,
        bucket_col="__bkt",
        frame_aggs={"__vol": F.stddev_samp("value")},
    )
    return out.select(
        "event_id", "event_type",
        F.round(F.col("__vol"), 5).alias("vol7"),
    )


@query(
    "day_over_day_change",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             round(sum(value), 4) AS total
      FROM events GROUP BY 1
    )
    SELECT day, total,
           round(total - lag(total) OVER (ORDER BY day), 4) AS delta,
           round((total - lag(total) OVER (ORDER BY day))
                 / lag(total) OVER (ORDER BY day), 6) AS pct_change
    FROM daily
    """,
)
def day_over_day_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day deltas on the daily rollup — lag window over the
    (tiny) aggregate, never over the facts.  The rollup total is rounded
    before differencing for cross-engine stability."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    daily = ev.groupBy("day").agg(F.round(F.sum("value"), 4).alias("total"))
    # Window input is the daily rollup (|calendar days| rows) — bounded;
    # constant partition key documents the single-sequence shape.
    w = Window.partitionBy(F.lit(0)).orderBy("day")
    prev = F.lag("total").over(w)
    return daily.select(
        "day", "total",
        F.round(F.col("total") - prev, 4).alias("delta"),
        F.round((F.col("total") - prev) / prev, 6).alias("pct_change"),
    )


@query(
    "skew_salted_join",
    """
    WITH dim AS (
      SELECT event_type, CAST(round(avg(value), 6) AS DOUBLE) AS type_avg
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*)                                          AS n,
           CAST(round(sum(CAST(abs(e.value - d.type_avg)
                 AS DECIMAL(18,6))), 2) AS DOUBLE)           AS total_abs_dev
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted hot-key join (100 TB hardening, operators/skew.py): events
    keyed by a handful of event types — exactly the degenerate-key shape
    that collapses a shuffled join into one straggler task — joined to a
    small per-type dim through ``salted_join``, which scatters each hot
    key across salt buckets and replicates the dim per bucket.  The
    oracle is the UNSALTED join, so the salting is value-checked as a
    pure plan transform (decimal sum keeps the re-ordered addition
    exact)."""
    from gridded_etl_tools_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).cast("double").alias("type_avg")
    )
    joined = salted_join(
        ev.select("event_type", "value"), dim, on=["event_type"], salt_buckets=8
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.abs(F.col("value") - F.col("type_avg")).cast("decimal(18,6)")),
            2,
        )
        .cast("double")
        .alias("total_abs_dev"),
    )


@query(
    "skew_two_phase_agg",
    """
    SELECT event_type,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
           count(value)     AS count_value,
           min(value)       AS min_value,
           max(value)       AS max_value
    FROM events GROUP BY event_type
    """,
)
def skew_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted partial → final) aggregation over a hot key
    (operators/skew.py): the explicit form of map-side combine for the
    case where one group dwarfs the shuffle.  Value-checked against the
    plain single-phase oracle; the sum runs in decimal so the salted
    re-association is exact."""
    from gridded_etl_tools_spark.operators.skew import two_phase_agg

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(18,6)").alias("value")
    )
    out = two_phase_agg(
        ev, keys=["event_type"],
        agg_exprs={"value": ["sum", "count", "min", "max"]}, salt_buckets=8,
    )
    return out.select(
        "event_type",
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
        "count_value",
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


@query(
    "seasonal_climatology",
    """
    WITH seasoned AS (
      SELECT CASE WHEN month(ts) IN (12, 1, 2) THEN 'DJF'
                  WHEN month(ts) IN (3, 4, 5)  THEN 'MAM'
                  WHEN month(ts) IN (6, 7, 8)  THEN 'JJA'
                  ELSE 'SON' END AS season,
             event_type, value
      FROM events
    )
    SELECT season, event_type,
           count(*)                   AS n,
           round(avg(value), 6)       AS mean_value,
           round(stddev_samp(value), 6) AS sd_value
    FROM seasoned GROUP BY season, event_type
    """,
)
def seasonal_climatology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-season rollup (the reference's SEASON TimeUnit,
    ``time.py`` cadence algebra — DJF/MAM/JJA/SON is the climate-science
    grouping its datasets publish at): a CASE-on-month key, then one
    map-combinable agg; the shuffle carries one row per
    (season, event_type)."""
    ev = load(spark, sf_dir, "events")
    season = (
        F.when(F.month("ts").isin(12, 1, 2), "DJF")
        .when(F.month("ts").isin(3, 4, 5), "MAM")
        .when(F.month("ts").isin(6, 7, 8), "JJA")
        .otherwise("SON")
    )
    return (
        ev.select(season.alias("season"), "event_type", "value")
        .groupBy("season", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        )
    )


@query(
    "ddsketch_value_quantiles",
    """
    WITH b AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             CAST(ceil(round(ln(value) / ln(1.02), 6)) AS BIGINT) AS bin,
             count(*) AS c
      FROM events WHERE value > 0 GROUP BY 1, 2, 3),
    m AS (SELECT event_type, bin, sum(c) AS c FROM b GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM m)
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      min(CASE WHEN cum >= ceil(0.50 * n)
               THEN round(2 * power(1.02, bin) / 2.02, 6) END) AS p50,
      min(CASE WHEN cum >= ceil(0.90 * n)
               THEN round(2 * power(1.02, bin) / 2.02, 6) END) AS p90,
      min(CASE WHEN cum >= ceil(0.99 * n)
               THEN round(2 * power(1.02, bin) / 2.02, 6) END) AS p99
    FROM cum GROUP BY event_type
    """,
)
def ddsketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch quantiles (Masson, Lee & Rice, VLDB 2019) — the
    MERGEABLE quantile sketch completing the deterministic sketch trio
    (HLL distinct / CMS frequency / DD quantile,
    ``operators/sketches.py``): per-(day, type) log-gamma bin
    histograms are merged across days by plain count addition, then
    p50/p90/p99 reconstruct from the merged bin table.  Every step is
    arithmetic both engines compute bit-for-bit, so the APPROXIMATE
    ESTIMATES THEMSELVES hash-match DuckDB's replay of the same
    sketch — not just a rows-only check.  Built-in approx_percentile
    (GK) can't do this (engine-private buffers) and GK is famously
    non-mergeable without accuracy loss; DD merges losslessly.
    Scale shape: facts touched once by one hash agg; everything after
    runs on ≤~550 bins per key (gamma geometry), and the cumulative
    window rides the bounded bin axis."""
    from gridded_etl_tools_spark.operators import sketches

    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts").cast("timestamp"))
    )
    daily = sketches.dd_histogram(ev, ["day", "event_type"], "value")
    merged = sketches.dd_merge(daily, ["event_type"])
    return sketches.dd_quantiles(merged, ["event_type"], [0.50, 0.90, 0.99])


@query(
    "ddsketch_bound_check",
    """
    SELECT event_type, count(*) AS n,
           TRUE AS p50_within_bound, TRUE AS p90_within_bound
    FROM events WHERE value > 0 GROUP BY event_type
    """,
)
def ddsketch_bound_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound certificate for ``ddsketch_value_quantiles``: the
    published guarantee is relative error alpha = (gamma-1)/(gamma+1)
    (≈0.99% at gamma=1.02) against the true item quantile; checked here
    at 2.5% against the exact interpolated percentile (the slack covers
    interpolated-vs-item quantile discretization).  Certifies the MERGE
    path end-to-end, same pattern as the HLL/GK certificates."""
    from gridded_etl_tools_spark.operators import sketches

    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    sk = sketches.dd_quantiles(
        sketches.dd_histogram(ev, ["event_type"], "value"),
        ["event_type"],
        [0.50, 0.90],
    )
    ex = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.50, 0.90))").alias("ex")
    )

    def within(est, i: int):
        return F.abs(est - F.col("ex")[i]) / F.abs(F.col("ex")[i]) <= 0.025

    return sk.join(ex, "event_type").select(
        "event_type",
        "n",
        within(F.col("p50"), 0).alias("p50_within_bound"),
        within(F.col("p90"), 1).alias("p90_within_bound"),
    )
