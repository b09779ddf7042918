"""TimeSpan/TimeUnit value-object tests (reference utils/time.py parity)."""

from __future__ import annotations

import datetime as dt

import pytest

from gridded_etl_tools_spark.timeutil import TimeSpan, TimeUnit


def test_from_string_aliases():
    assert TimeSpan.from_string("daily") == TimeSpan(1, TimeUnit.DAY)
    assert TimeSpan.from_string("hourly") == TimeSpan(1, TimeUnit.HOUR)
    assert TimeSpan.from_string("15minutes") == TimeSpan(15, TimeUnit.MINUTE)
    assert TimeSpan.from_string("3 days") == TimeSpan(3, TimeUnit.DAY)
    assert TimeSpan.from_string("half-hourly") == TimeSpan(30, TimeUnit.MINUTE)
    assert TimeSpan.from_string("seasonal") == TimeSpan(1, TimeUnit.SEASON)


def test_from_string_rejects_garbage():
    with pytest.raises(ValueError):
        TimeSpan.from_string("sometimes")


def test_ordering():
    assert TimeSpan.from_string("hourly") < TimeSpan.from_string("daily")
    assert TimeSpan.from_string("weekly") < TimeSpan.from_string("monthly")
    assert TimeSpan.from_string("monthly") < TimeSpan.from_string("yearly")


def test_to_timedelta_fixed_units():
    assert TimeSpan(2, TimeUnit.DAY).to_timedelta() == dt.timedelta(days=2)
    assert TimeSpan(90, TimeUnit.MINUTE).to_timedelta() == dt.timedelta(minutes=90)


def test_to_timedelta_refuses_calendar_units():
    """Reference refusal: months/years have no fixed minute length."""
    for s in ("monthly", "seasonal", "yearly"):
        with pytest.raises(ValueError):
            TimeSpan.from_string(s).to_timedelta()


def test_interval_sql():
    assert TimeSpan(1, TimeUnit.DAY).to_interval_sql() == "1 day"
    assert TimeSpan(2, TimeUnit.SEASON).to_interval_sql() == "6 month"
    assert TimeSpan(5, TimeUnit.MINUTE).to_interval_sql() == "5 minute"
