"""Climate-index operators: degree days, threshold spells, return levels,
and parametric payouts.

Reference parity: the reference's consumers are parametric weather
products — its ETLs (``examples/managers/chirps.py``, ``era5.py``) exist
to feed exactly these downstream indices (rainfall accumulation,
temperature exceedance).  The reference computes none of them itself, so
this module is the "beyond the reference" analytics layer the SURVEY §2
plan calls for: the standard ETCCDI-style station indices re-expressed as
Spark aggregation plans.

Scale design (100 TB of raw observations):

* Every index starts from :func:`daily_index` — ONE map-side-combinable
  hash aggregation that collapses the fact table to (station, day) rows.
  At 100 TB of raw events that is the only full-data shuffle, and it
  carries one row per station-day (~stations x 365), not facts.
* Run/spell detection windows partition BY STATION over the daily rows —
  a few hundred rows per partition key, never an unpartitioned window,
  never a window over raw facts.
* The daily sums are kept as exact DECIMAL so threshold predicates
  (dry / hot day classification) are bit-identical across engines and
  partition orders — double summation order must never flip a day's
  classification and thereby a whole spell.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Euler-Mascheroni constant (Gumbel method-of-moments location shift).
EULER_GAMMA = 0.5772156649015329


def daily_index(
    events: DataFrame,
    station_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Collapse raw observations to one row per (station, day).

    Returns ``station, day, n_obs, day_sum (DECIMAL, exact), day_mean
    (double)``.  The DECIMAL sum is the load-bearing part: downstream
    threshold predicates compare ``day_sum`` against ``threshold * n_obs``
    in exact arithmetic, so a station-day's dry/hot classification can
    never depend on double summation order (which differs between engines
    and between partitionings of the same data).
    """
    return (
        events.groupBy(
            F.col(station_col).alias("station"),
            F.to_date(ts_col).alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("day_sum"),
        )
        .withColumn(
            "day_mean", F.col("day_sum").cast("double") / F.col("n_obs")
        )
    )


def degree_days(
    daily: DataFrame, base: float = 50.0
) -> DataFrame:
    """Heating / cooling degree days per station against ``base``.

    HDD accrues when the daily mean is below base, CDD when above —
    the canonical energy-market / parametric-insurance temperature
    indices.  One further hash agg over the (already tiny) daily frame.
    """
    hdd = F.greatest(F.lit(0.0), F.lit(base) - F.col("day_mean"))
    cdd = F.greatest(F.lit(0.0), F.col("day_mean") - F.lit(base))
    return (
        daily.groupBy("station")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.sum(hdd), 6).alias("hdd"),
            F.round(F.sum(cdd), 6).alias("cdd"),
        )
    )


def threshold_spells(
    daily: DataFrame,
    is_event,
    min_length: int = 1,
) -> DataFrame:
    """Consecutive-calendar-day runs where ``is_event`` (a boolean Column
    over the daily frame) holds, per station.

    Classic gaps-and-islands on the DATE axis: ``day - row_number`` is
    constant within a run of consecutive days, so grouping by that anchor
    splits runs wherever a calendar day is missing OR fails the
    predicate.  Returns ``station, spell_start, spell_end, spell_days``
    for runs of at least ``min_length`` days.

    The window partitions by station over daily rows — bounded work per
    key regardless of fact-table size.
    """
    w = Window.partitionBy("station").orderBy("day")
    flagged = daily.where(is_event)
    anchored = flagged.withColumn(
        "__anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        anchored.groupBy("station", "__anchor")
        .agg(
            F.min("day").alias("spell_start"),
            F.max("day").alias("spell_end"),
            F.count(F.lit(1)).alias("spell_days"),
        )
        .where(F.col("spell_days") >= min_length)
        .drop("__anchor")
    )


def longest_spell(spells: DataFrame) -> DataFrame:
    """Per-station summary of a spell frame: number of qualifying days
    and the longest single run (ETCCDI CDD/CWD shape)."""
    return spells.groupBy("station").agg(
        F.sum("spell_days").alias("n_event_days"),
        F.max("spell_days").alias("max_run"),
    )


def gumbel_return_levels(
    block_maxima: DataFrame,
    keys: list[str],
    value_col: str = "block_max",
    periods: tuple[int, ...] = (10, 100),
) -> DataFrame:
    """Gumbel (EV1) return levels by method of moments over block maxima.

    beta = sd * sqrt(6) / pi, mu = mean - gamma * beta, and the T-year
    level is ``mu - beta * ln(-ln(1 - 1/T))`` — the standard first-cut
    extreme-value estimate for "1-in-N-year" parametric triggers.  Pure
    algebraic aggregates: one map-side-combined hash agg per key group,
    no window, no sort.
    """
    mean, sd = F.avg(value_col), F.stddev_samp(value_col)
    beta = sd * F.lit(math.sqrt(6.0) / math.pi)
    mu = mean - F.lit(EULER_GAMMA) * beta
    aggs = [
        F.count(F.lit(1)).alias("n_blocks"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(beta, 6).alias("gumbel_beta"),
    ]
    for t in periods:
        y = -math.log(-math.log(1.0 - 1.0 / t))
        aggs.append(F.round(mu + beta * F.lit(y), 6).alias(f"rl_{t}"))
    return block_maxima.groupBy(*keys).agg(*aggs)


def parametric_payout(
    totals: DataFrame,
    index_col: str,
    strike: float,
    tick: float,
    limit: float,
    direction: str = "below",
) -> DataFrame:
    """Linear parametric payout: tick dollars per unit the index settles
    beyond the strike, capped at the limit.

    ``direction='below'`` pays on shortfall (drought-style cover on a
    rainfall index); ``'above'`` pays on excess (heat / flood cover).
    The index column should be an exact DECIMAL accumulation so the
    settlement is engine- and partitioning-independent; the payout itself
    is then deterministic double arithmetic.
    """
    idx = F.col(index_col).cast("double")
    if direction == "below":
        shortfall = F.lit(strike) - idx
    elif direction == "above":
        shortfall = idx - F.lit(strike)
    else:
        raise ValueError("direction must be 'below' or 'above'")
    payout = F.least(
        F.lit(limit), F.greatest(F.lit(0.0), shortfall * F.lit(tick))
    )
    return totals.withColumn("payout", F.round(payout, 2))
