"""CF calendar-aware time decoding: noleap / all_leap / 360_day model
calendars as pure column arithmetic.

Reference parity: the reference leans on xarray+cftime to interpret
``days since <epoch>`` axes for climate-model output
(``utils/time.py`` cadence handling; its datasets' CF attrs), including
the non-Gregorian calendars CMIP-class models run on.  Spark timestamps
cannot represent ``0360-02-30``, so the decoded form is an explicit
(year, month, day) struct + ISO string — the honest representation —
while the standard calendar round-trips through real DATEs.

All three decoders are integer floor/mod arithmetic plus a literal
month-boundary array probed with higher-order functions: JVM-side,
codegen-friendly, zero UDFs, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: cumulative day-of-year starts per month (0-based), fixed per calendar
MONTH_STARTS = {
    "noleap": [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334],
    "all_leap": [0, 31, 60, 91, 121, 152, 182, 213, 244, 274, 305, 335],
}
YEAR_LENGTH = {"noleap": 365, "all_leap": 366, "360_day": 360}

_ALIASES = {
    "365_day": "noleap", "noleap": "noleap",
    "366_day": "all_leap", "all_leap": "all_leap",
    "360_day": "360_day",
    "standard": "standard", "gregorian": "standard",
    "proleptic_gregorian": "standard",
}


def decode_cf_days(
    days: Column,
    calendar: str = "standard",
    epoch: str = "1990-01-01",
) -> Column:
    """``days since <epoch>`` (integer day offsets) → struct(year, month,
    day, iso) under the given CF calendar.

    Fixed-length calendars require the epoch to be a January 1st (the
    overwhelmingly common convention for model output); the standard
    calendar takes any epoch date.
    """
    cal = _ALIASES.get(calendar)
    if cal is None:
        raise ValueError(f"unsupported CF calendar {calendar!r}")
    d = days.cast("long")
    if cal == "standard":
        date = F.date_add(F.lit(epoch).cast("date"), d.cast("int"))
        return F.struct(
            F.year(date).alias("year"),
            F.month(date).alias("month"),
            F.dayofmonth(date).alias("day"),
            F.date_format(date, "yyyy-MM-dd").alias("iso"),
        )
    epoch_year = int(epoch[:4])
    if epoch[5:10] != "01-01":
        raise ValueError(
            f"fixed-length calendar epochs must be a Jan 1 (got {epoch})"
        )
    ylen = YEAR_LENGTH[cal]
    year = (F.lit(epoch_year) + F.floor(d / ylen)).cast("int")
    rem = F.pmod(d, F.lit(ylen)).cast("int")
    if cal == "360_day":
        month = (F.floor(rem / 30) + 1).cast("int")
        day = (rem % 30 + 1).cast("int")
    else:
        starts = F.array(*[F.lit(s) for s in MONTH_STARTS[cal]])
        month = F.size(F.filter(starts, lambda b: b <= rem))
        day = (rem - F.element_at(starts, month) + 1).cast("int")
    iso = F.format_string("%04d-%02d-%02d", year, month, day)
    return F.struct(
        year.alias("year"), month.alias("month"), day.alias("day"),
        iso.alias("iso"),
    )


def encode_cf_days(
    year: Column,
    month: Column,
    day: Column,
    calendar: str = "standard",
    epoch: str = "1990-01-01",
) -> Column:
    """Inverse of :func:`decode_cf_days`: calendar date → integer day
    offset since the epoch."""
    cal = _ALIASES.get(calendar)
    if cal is None:
        raise ValueError(f"unsupported CF calendar {calendar!r}")
    if cal == "standard":
        date = F.make_date(year, month, day)
        return F.datediff(date, F.lit(epoch).cast("date")).cast("long")
    epoch_year = int(epoch[:4])
    if epoch[5:10] != "01-01":
        raise ValueError(
            f"fixed-length calendar epochs must be a Jan 1 (got {epoch})"
        )
    ylen = YEAR_LENGTH[cal]
    if cal == "360_day":
        doy = (month - 1) * 30 + (day - 1)
    else:
        starts = F.array(*[F.lit(s) for s in MONTH_STARTS[cal]])
        doy = F.element_at(starts, month) + (day - 1)
    return ((year - F.lit(epoch_year)).cast("long") * ylen + doy).cast("long")
