"""Time-resolution algebra: TimeUnit / TimeSpan value objects.

Parity with the reference's ``gridded_etl_tools/utils/time.py:10-209``
(``TimeUnit`` enum, ``TimeSpan`` with ``from_string`` parsing, comparison,
``to_timedelta`` refusing month/year conversion).  Implemented from
scratch; used driver-side and to produce Spark ``INTERVAL`` strings for
``sequence()`` / ``window()`` expressions.
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass
from enum import Enum
from functools import total_ordering


class TimeUnit(Enum):
    """Calendar units.  ``minutes_per`` is None for units whose length is
    calendar-dependent (months, seasons, years) — converting those to a
    fixed timedelta is an error, as in the reference."""

    MINUTE = ("minutes", 1)
    HOUR = ("hours", 60)
    DAY = ("days", 1440)
    WEEK = ("weeks", 10080)
    MONTH = ("months", None)
    SEASON = ("seasons", None)
    YEAR = ("years", None)

    def __init__(self, label: str, minutes_per: int | None):
        self.label = label
        self.minutes_per = minutes_per

    @classmethod
    def from_string(cls, s: str) -> "TimeUnit":
        s = s.strip().lower().rstrip("s")
        for unit in cls:
            if unit.label.rstrip("s") == s:
                return unit
        raise ValueError(f"unknown time unit: {s!r}")


_SPAN_RE = re.compile(r"^\s*(\d+)?\s*([a-zA-Z]+)\s*$")

#: common aliases accepted by from_string, as the reference accepts
#: e.g. "daily", "hourly", "15minutes"
_ALIASES = {
    "half-hourly": (30, TimeUnit.MINUTE),
    "halfhourly": (30, TimeUnit.MINUTE),
    "hourly": (1, TimeUnit.HOUR),
    "daily": (1, TimeUnit.DAY),
    "weekly": (1, TimeUnit.WEEK),
    "monthly": (1, TimeUnit.MONTH),
    "seasonal": (1, TimeUnit.SEASON),
    "yearly": (1, TimeUnit.YEAR),
    "annual": (1, TimeUnit.YEAR),
}


@total_ordering
@dataclass(frozen=True)
class TimeSpan:
    amount: int
    unit: TimeUnit

    @classmethod
    def from_string(cls, s: str) -> "TimeSpan":
        key = s.strip().lower()
        if key in _ALIASES:
            amount, unit = _ALIASES[key]
            return cls(amount, unit)
        m = _SPAN_RE.match(key)
        if not m:
            raise ValueError(f"cannot parse time span: {s!r}")
        amount = int(m.group(1) or 1)
        return cls(amount, TimeUnit.from_string(m.group(2)))

    def _comparable_minutes(self) -> float:
        """Approximate minutes for ordering only (months ≈ 30.4 days,
        seasons ≈ 3 months, years ≈ 365.25 days)."""
        approx = {
            TimeUnit.MONTH: 43800.0,
            TimeUnit.SEASON: 131400.0,
            TimeUnit.YEAR: 525960.0,
        }
        per = self.unit.minutes_per or approx[self.unit]
        return self.amount * per

    def __lt__(self, other: "TimeSpan") -> bool:
        return self._comparable_minutes() < other._comparable_minutes()

    def to_timedelta(self) -> dt.timedelta:
        """Exact timedelta; refuses calendar-dependent units, matching the
        reference's refusal to convert months/years to minutes."""
        if self.unit.minutes_per is None:
            raise ValueError(
                f"{self.unit.label} have no fixed length; cannot convert to timedelta"
            )
        return dt.timedelta(minutes=self.amount * self.unit.minutes_per)

    def to_interval_sql(self) -> str:
        """Spark/ANSI INTERVAL literal body, e.g. ``"1 day"``; calendar
        units are fine here because SQL intervals are calendar-aware."""
        singular = self.unit.label.rstrip("s")
        if self.unit is TimeUnit.SEASON:
            return f"{self.amount * 3} month"
        return f"{self.amount} {singular}"
