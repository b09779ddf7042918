"""CF calendar decode/encode: known dates and round-trips per calendar."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridded_etl_tools_spark.functions import cftime


def _decode(spark, days, calendar):
    df = spark.range(1).select(
        cftime.decode_cf_days(F.lit(days), calendar).alias("d")
    )
    return df.select("d.iso").collect()[0][0]


@pytest.mark.parametrize(
    "days,calendar,iso",
    [
        (0, "standard", "1990-01-01"),
        (59, "standard", "1990-03-01"),       # 1990 not a leap year
        (789, "standard", "1992-02-29"),      # real Gregorian leap day
        (0, "noleap", "1990-01-01"),
        (59, "noleap", "1990-03-01"),         # noleap never has Feb 29
        (365, "noleap", "1991-01-01"),
        (365 * 2 + 58, "noleap", "1992-02-28"),
        (365 * 2 + 59, "noleap", "1992-03-01"),  # skips Feb 29 even in 1992
        (59, "all_leap", "1990-02-29"),       # every year has Feb 29
        (366, "all_leap", "1991-01-01"),
        (59, "360_day", "1990-02-30"),        # Feb 30 exists
        (360, "360_day", "1991-01-01"),
        (719, "360_day", "1991-12-30"),
    ],
)
def test_decode_known_dates(spark, days, calendar, iso):
    assert _decode(spark, days, calendar) == iso


@pytest.mark.parametrize("calendar", ["standard", "noleap", "all_leap", "360_day"])
def test_encode_decode_round_trip(spark, calendar):
    df = spark.range(0, 2000, 13).select(F.col("id").alias("days"))
    dec = df.select(
        "days", cftime.decode_cf_days(F.col("days"), calendar).alias("d")
    )
    back = dec.select(
        "days",
        cftime.encode_cf_days(
            F.col("d.year"), F.col("d.month"), F.col("d.day"), calendar
        ).alias("rt"),
    )
    assert back.filter("days <> rt").count() == 0


def test_decode_rejects_unknown_calendar(spark):
    with pytest.raises(ValueError, match="calendar"):
        cftime.decode_cf_days(F.lit(0), "julian")


def test_fixed_calendar_requires_jan1_epoch(spark):
    with pytest.raises(ValueError, match="Jan 1"):
        cftime.decode_cf_days(F.lit(0), "noleap", epoch="1990-06-15")
    # standard calendar takes any epoch
    df = spark.range(1).select(
        cftime.decode_cf_days(F.lit(10), "standard", epoch="1990-06-15").alias("d")
    )
    assert df.select("d.iso").collect()[0][0] == "1990-06-25"
