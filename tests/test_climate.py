"""Climate-index operator tests: exact expectations on synthetic frames.

The spell tests specifically pin the calendar-gap semantics (a missing
station-day splits a run even when both neighbors qualify) and the
degree-day tests pin the base crossover, because those are the behaviors
a hash-match against DuckDB can't isolate when they fail together.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from gridded_etl_tools_spark.operators.climate import (
    EULER_GAMMA,
    daily_index,
    degree_days,
    gumbel_return_levels,
    longest_spell,
    parametric_payout,
    threshold_spells,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=s, ts=dt.datetime(2024, 1, d, h), value=float(v))
         for (s, d, h, v) in rows]
    )


def test_daily_index_exact_decimal_sum(spark):
    ev = _events(spark, [(1, 5, 0, 0.1), (1, 5, 6, 0.2), (1, 6, 0, 7.0)])
    out = {(r.station, r.day.day): r for r in daily_index(ev).collect()}
    # 0.1 + 0.2 is exactly 0.30 in DECIMAL(18,2) (not 0.30000000000000004)
    assert str(out[(1, 5)].day_sum) == "0.30"
    assert out[(1, 5)].n_obs == 2
    assert out[(1, 6)].day_mean == 7.0


def test_degree_days_base_crossover(spark):
    # day means: 40 (10 HDD), 60 (10 CDD), 50 (neither)
    ev = _events(
        spark,
        [(1, 1, 0, 30.0), (1, 1, 6, 50.0),   # mean 40
         (1, 2, 0, 60.0),                     # mean 60
         (1, 3, 0, 50.0)],                    # mean 50
    )
    out = degree_days(daily_index(ev), base=50.0).collect()[0]
    assert out.n_days == 3
    assert out.hdd == 10.0
    assert out.cdd == 10.0


def test_threshold_spells_split_on_missing_day(spark):
    # station 1: dry days 1,2,3 then 5,6 — the missing day 4 must split
    # the run even though both sides qualify.
    ev = _events(
        spark,
        [(1, d, 0, 1.0) for d in (1, 2, 3, 5, 6)] + [(2, 1, 0, 1.0)],
    )
    daily = daily_index(ev)
    spells = threshold_spells(daily, F.col("day_mean") < 2.0).collect()
    runs = sorted(
        (r.station, r.spell_start.day, r.spell_end.day, r.spell_days)
        for r in spells
    )
    assert runs == [(1, 1, 3, 3), (1, 5, 6, 2), (2, 1, 1, 1)]
    summary = {r.station: r for r in longest_spell(
        threshold_spells(daily, F.col("day_mean") < 2.0)).collect()}
    assert summary[1].n_event_days == 5 and summary[1].max_run == 3
    assert summary[2].max_run == 1


def test_threshold_spells_min_length_filter(spark):
    ev = _events(spark, [(1, 1, 0, 1.0), (1, 3, 0, 1.0), (1, 4, 0, 1.0)])
    spells = threshold_spells(
        daily_index(ev), F.col("day_mean") < 2.0, min_length=2
    ).collect()
    assert len(spells) == 1 and spells[0].spell_days == 2


def test_gumbel_return_levels_known_values(spark):
    # blocks 10, 20, 30: mean=20, sd=10 -> beta=10*sqrt(6)/pi,
    # mu=20-gamma*beta; rl_T = mu + beta*(-ln(-ln(1-1/T)))
    blocks = spark.createDataFrame(
        [Row(k="a", block_max=10.0), Row(k="a", block_max=20.0),
         Row(k="a", block_max=30.0)]
    )
    out = gumbel_return_levels(blocks, ["k"], periods=(10,)).collect()[0]
    beta = 10.0 * math.sqrt(6.0) / math.pi
    mu = 20.0 - EULER_GAMMA * beta
    rl10 = mu + beta * (-math.log(-math.log(0.9)))
    assert out.n_blocks == 3
    assert abs(out.gumbel_beta - round(beta, 6)) < 1e-9
    assert abs(out.gumbel_mu - round(mu, 6)) < 1e-9
    assert abs(out.rl_10 - rl10) < 1e-5


def test_parametric_payout_cap_floor_and_tick(spark):
    totals = spark.createDataFrame(
        [Row(station=1, idx=100.0),   # shortfall 900 * 2 = 1800
         Row(station=2, idx=2000.0),  # above strike -> 0
         Row(station=3, idx=-5000.0)] # capped at limit
    )
    out = {r.station: r.payout for r in parametric_payout(
        totals, "idx", strike=1000.0, tick=2.0, limit=3000.0,
        direction="below").collect()}
    assert out == {1: 1800.0, 2: 0.0, 3: 3000.0}
    above = {r.station: r.payout for r in parametric_payout(
        totals, "idx", strike=1000.0, tick=1.5, limit=1000.0,
        direction="above").collect()}
    assert above == {1: 0.0, 2: 1000.0, 3: 0.0}
