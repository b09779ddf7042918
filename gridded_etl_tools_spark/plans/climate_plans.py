"""Climate-index catalog queries: the parametric-weather analytics layer.

The reference repo's whole purpose is to publish gridded weather data for
parametric products (its example managers are CHIRPS rainfall and ERA5
temperature); these queries are the downstream indices those products
settle on, expressed as Spark plans over the events table
(station := user_id, daily index := value).

All five are fully SQL-expressible and hash-checked against DuckDB.
Threshold classifications go through exact DECIMAL day sums (see
``operators/climate.py``) so no spell boundary can flip on double
summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridded_etl_tools_spark.operators import climate as climate_ops
from gridded_etl_tools_spark.plans.catalog import query
from gridded_etl_tools_spark.plans.tables import load

# Shared CTE: exact per-(station, day) accumulation.  DECIMAL sum makes
# the dry/hot predicates engine-exact; the double mean is derived from it.
_DAILY_SQL = """
  SELECT user_id AS station,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n_obs,
         sum(CAST(value AS DECIMAL(18,2))) AS day_sum,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           AS day_mean
  FROM events GROUP BY 1, 2
"""


@query(
    "climate_degree_days",
    f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT station,
           count(*) AS n_days,
           round(sum(greatest(0.0, 50.0 - day_mean)), 6) AS hdd,
           round(sum(greatest(0.0, day_mean - 50.0)), 6) AS cdd
    FROM daily GROUP BY station
    """,
)
def climate_degree_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heating/cooling degree days per station (base 50): two
    map-side-combinable hash aggs — facts -> station-day -> station.
    The only full-data shuffle carries one row per station-day."""
    daily = climate_ops.daily_index(load(spark, sf_dir, "events"))
    return climate_ops.degree_days(daily, base=50.0)


@query(
    "climate_dry_spells",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    dry AS (
      SELECT station, day,
             day - CAST(row_number() OVER (
               PARTITION BY station ORDER BY day) AS INT) AS anchor
      FROM daily WHERE day_sum < 30 * n_obs
    ),
    runs AS (
      SELECT station, count(*) AS spell_days
      FROM dry GROUP BY station, anchor
    )
    SELECT station,
           CAST(sum(spell_days) AS BIGINT) AS n_event_days,
           max(spell_days) AS max_run
    FROM runs GROUP BY station
    """,
)
def climate_dry_spells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETCCDI consecutive-dry-days: per-station longest run of
    consecutive calendar days whose exact daily sum settles below
    30/obs.  Station-partitioned gaps-and-islands over daily rows."""
    daily = climate_ops.daily_index(load(spark, sf_dir, "events"))
    dry = F.col("day_sum") < F.lit(30) * F.col("n_obs")
    spells = climate_ops.threshold_spells(daily, dry)
    return climate_ops.longest_spell(spells)


@query(
    "climate_heat_spells",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    hot AS (
      SELECT station, day,
             day - CAST(row_number() OVER (
               PARTITION BY station ORDER BY day) AS INT) AS anchor
      FROM daily WHERE day_sum > 70 * n_obs
    )
    SELECT station,
           CAST(min(day) AS TIMESTAMP) AS spell_start,
           CAST(max(day) AS TIMESTAMP) AS spell_end,
           count(*) AS spell_days
    FROM hot GROUP BY station, anchor
    HAVING count(*) >= 2
    """,
)
def climate_heat_spells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heat-wave spells: runs of >=2 consecutive days settling above
    70/obs, one row per spell with its start/end/length."""
    daily = climate_ops.daily_index(load(spark, sf_dir, "events"))
    hot = F.col("day_sum") > F.lit(70) * F.col("n_obs")
    spells = climate_ops.threshold_spells(daily, hot, min_length=2)
    # DATE never crosses the gate (output-type canon): TIMESTAMP out
    return spells.select(
        "station",
        F.col("spell_start").cast("timestamp").alias("spell_start"),
        F.col("spell_end").cast("timestamp").alias("spell_end"),
        "spell_days",
    )


@query(
    "climate_return_levels",
    """
    WITH blocks AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             max(value) AS block_max
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           count(*) AS n_blocks,
           round(avg(block_max)
                 - 0.5772156649015329
                   * (stddev_samp(block_max) * 0.7796968012336293), 6)
             AS gumbel_mu,
           round(stddev_samp(block_max) * 0.7796968012336293, 6)
             AS gumbel_beta,
           round(avg(block_max)
                 - 0.5772156649015329
                   * (stddev_samp(block_max) * 0.7796968012336293)
                 + (stddev_samp(block_max) * 0.7796968012336293)
                   * 2.2503673273124454, 6)
             AS rl_10,
           round(avg(block_max)
                 - 0.5772156649015329
                   * (stddev_samp(block_max) * 0.7796968012336293)
                 + (stddev_samp(block_max) * 0.7796968012336293)
                   * 4.600149226776579, 6)
             AS rl_100
    FROM blocks GROUP BY event_type
    """,
)
def climate_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-10 / 1-in-100 Gumbel return levels per event type from daily
    block maxima (method of moments).  max() blocks are exact, the
    moment algebra is deterministic; pure hash aggs, no window.

    Oracle constants: sqrt(6)/pi = 0.7796968012336293,
    -ln(-ln(1-1/10)) = 2.2503673273124454,
    -ln(-ln(1-1/100)) = 4.600149226776579."""
    ev = load(spark, sf_dir, "events")
    blocks = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.max("value").alias("block_max"))
    return climate_ops.gumbel_return_levels(
        blocks, keys=["event_type"], periods=(10, 100)
    )


@query(
    "parametric_payouts",
    """
    WITH settled AS (
      SELECT user_id AS station,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS season_total
      FROM events GROUP BY 1
    )
    SELECT station,
           season_total,
           round(least(5000.0,
                       greatest(0.0,
                                (1400.0 - CAST(season_total AS DOUBLE))
                                  * 2.0)), 2) AS payout
    FROM settled
    """,
)
def parametric_payouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drought-style linear payout per station: $2 per unit the exact
    seasonal accumulation settles below the 1400 strike, capped at
    $5000.  The settlement index is a DECIMAL sum — one hash agg —
    so payouts are reproducible to the cent on any partitioning."""
    ev = load(spark, sf_dir, "events")
    # exact decimal accumulation; DOUBLE at the output boundary
    settled = ev.groupBy(F.col("user_id").alias("station")).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("season_total")
    )
    return climate_ops.parametric_payout(
        settled, "season_total", strike=1400.0, tick=2.0, limit=5000.0,
        direction="below",
    )
