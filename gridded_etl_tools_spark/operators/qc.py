"""Statistical quality-control gates (SURVEY §2.4 A1-A8).

Reference parity (all in ``gridded_etl_tools/utils/publish.py``):

* A1 ``pre_parse_quality_check``  (624-664) — composed gate.
* A2 ``are_times_in_expected_order`` (780-822) — cadence contiguity.
* A3 ``check_random_values``      (666-700) — sampled value/NaN checks
  against ``EXTREME_VALUES_BY_UNIT`` (attributes.py:328-331).
* A4 ``check_nan_frequency``      (702-728, 1178-1243) — per-timestep
  binomial CI on the NaN proportion.
* A5 dtype gate                   (652-657).
* A6 ``update_quality_check``     (730-778) — update-position gates.
* A7/A8 ``post_parse_quality_check`` / ``check_written_value``
  (824-895, 1011-1095) — written-vs-source audit with tolerance and
  inf/NaN/sentinel equivalences.

Design: each check returns a small *violations DataFrame* (empty == pass);
``assert_empty`` raises :class:`QualityCheckError` with a sample.  Checks
are full-population where the reference samples — at Spark scale an exact
aggregate over all rows is cheaper than the reference's 100-point sample
was on one machine, and deterministic (the driver's DuckDB oracle can
reproduce it; random sampling could not be hash-matched).

The binomial CI itself is evaluated driver-side on the tiny per-timestep
count table with a normal approximation — same shape as the reference's
statsmodels call, but dependency-free.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class QualityCheckError(RuntimeError):
    """A QC gate failed; carries a sample of violating rows."""


def assert_empty(violations: DataFrame, what: str, sample: int = 5) -> None:
    rows = violations.limit(sample).collect()
    if rows:
        raise QualityCheckError(f"{what}: e.g. {[r.asDict() for r in rows]}")


# --- A2: cadence contiguity -------------------------------------------------

def cadence_violations(
    df: DataFrame,
    time_col: str = "time",
    expected_delta: dt.timedelta | None = None,
    bounds: tuple[dt.timedelta, dt.timedelta] | None = None,
) -> DataFrame:
    """Successive distinct times whose gap breaks the declared cadence.
    Exactly one of ``expected_delta`` (regular sets) / ``bounds``
    (irregular, reference ``attributes.py:250-257``) must be given.
    Returns (time, prev_time, gap_seconds) rows for each violation."""
    if (expected_delta is None) == (bounds is None):
        raise ValueError("pass exactly one of expected_delta / bounds")
    # Input is the DISTINCT time axis (thousands-to-millions of rows, not
    # fact-scale), and lag over one ordered sequence is inherently
    # single-partition: the constant partition key states that bound
    # explicitly instead of tripping Spark's unpartitioned-window warning.
    w = Window.partitionBy(F.lit(0)).orderBy(time_col)
    d = (
        df.select(time_col).distinct()
        .withColumn("prev_time", F.lag(time_col).over(w))
        .withColumn(
            "gap_seconds",
            F.col(time_col).cast("double") - F.col("prev_time").cast("double"),
        )
        .filter(F.col("prev_time").isNotNull())
    )
    if expected_delta is not None:
        pred = F.col("gap_seconds") != F.lit(expected_delta.total_seconds())
    else:
        lo, hi = bounds
        pred = ~F.col("gap_seconds").between(
            F.lit(lo.total_seconds()), F.lit(hi.total_seconds())
        )
    return d.filter(pred)


# --- A3: value-range / unexpected-NaN checks --------------------------------

def value_violations(
    df: DataFrame,
    value_col: str,
    bounds: tuple[float, float] | None,
    allow_null: bool = True,
) -> DataFrame:
    """Rows whose value is outside the physical bounds for the dataset's
    unit, or NULL where nulls are not expected.  Full-population version of
    the reference's 100-random-point check."""
    c = F.col(value_col)
    pred = F.lit(False)
    if bounds is not None:
        lo, hi = bounds
        pred = pred | (c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)))
    if not allow_null:
        pred = pred | c.isNull()
    return df.filter(pred)


# --- A4: NaN-frequency binomial check ---------------------------------------

def nan_frequency_by_time(
    df: DataFrame, time_col: str, value_col: str
) -> DataFrame:
    """Per-timestep NULL proportion over the full population:
    (time, n_cells, n_null, null_fraction)."""
    return (
        df.groupBy(time_col)
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.col(value_col).isNull().cast("long")).alias("n_null"),
        )
        .withColumn(
            "null_fraction", F.col("n_null") / F.col("n_cells")
        )
    )


def nan_frequency_violations(
    df: DataFrame,
    time_col: str,
    value_col: str,
    expected_frequency: float,
    alpha: float = 1e-5,
    one_sided: bool = False,
) -> list[dict]:
    """Timesteps whose NULL proportion is implausible under the declared
    ``expected_nan_frequency`` — a per-timestep binomial test (reference
    ``publish.py:1178-1243``: 5000-point sample + statsmodels CI; here the
    full population + normal-approx CI on the driver, since the grouped
    counts are tiny).  Returns a list of violating row dicts."""
    stats = nan_frequency_by_time(df, time_col, value_col).collect()
    # two-sided z for alpha (one_sided: all mass on the high tail)
    z = _z_quantile(1 - (alpha if one_sided else alpha / 2))
    out = []
    for r in stats:
        n, p_hat = r["n_cells"], r["null_fraction"]
        se = math.sqrt(max(expected_frequency * (1 - expected_frequency), 1e-12) / n)
        hi = expected_frequency + z * se
        lo = 0.0 if one_sided else expected_frequency - z * se
        if not (lo <= p_hat <= hi):
            out.append(r.asDict())
    return out


def _z_quantile(q: float) -> float:
    """Inverse standard-normal CDF (Acklam's rational approximation —
    public-domain constants; adequate for QC thresholds)."""
    if not 0 < q < 1:
        raise ValueError(q)
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if q < plow:
        ql = math.sqrt(-2 * math.log(q))
        return (((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]) / \
               ((((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1)
    if q > phigh:
        ql = math.sqrt(-2 * math.log(1 - q))
        return -(((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]) / \
               ((((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1)
    ql = q - 0.5
    r = ql * ql
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * ql / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


# --- A5: dtype gate ----------------------------------------------------------

def check_dtype(df: DataFrame, value_col: str, expected: T.DataType) -> None:
    actual = df.schema[value_col].dataType
    if actual != expected:
        raise QualityCheckError(
            f"dtype gate: {value_col} is {actual.simpleString()}, "
            f"declared {expected.simpleString()}"
        )


# --- A6: update-position gates ----------------------------------------------

def update_position_violations(
    update: DataFrame,
    existing: DataFrame,
    time_col: str = "time",
    expected_delta: dt.timedelta | None = None,
) -> list[str]:
    """Driver-side gate list for an update (reference
    ``update_quality_check``, publish.py:730-778): update must be
    non-empty; no update time may precede the dataset start; an append must
    be contiguous with the existing end (bridge check).  Returns message
    list (empty == pass)."""
    msgs: list[str] = []
    u = update.agg(
        F.min(time_col).alias("lo"), F.max(time_col).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if u["n"] == 0:
        return ["empty update"]
    e = existing.agg(
        F.min(time_col).alias("lo"), F.max(time_col).alias("hi")
    ).collect()[0]
    if e["lo"] is not None and u["lo"] < e["lo"]:
        msgs.append(
            f"update begins {u['lo']} before dataset start {e['lo']}"
        )
    if (
        expected_delta is not None
        and e["hi"] is not None
        and u["hi"] > e["hi"]  # has an append component
    ):
        first_append = (
            update.filter(F.col(time_col) > F.lit(e["hi"]))
            .agg(F.min(time_col).alias("t")).collect()[0]["t"]
        )
        if (first_append - e["hi"]) != expected_delta:
            msgs.append(
                f"append not contiguous: existing end {e['hi']}, "
                f"first append {first_append}"
            )
    return msgs


# --- A7/A8: written-value audit ---------------------------------------------

def written_value_mismatches(
    written: DataFrame,
    source: DataFrame,
    keys: list[str],
    value_col: str,
    threshold: float = 10e-5,
    inf_cutoff: float = 1e100,
) -> DataFrame:
    """Join written output back to source rows on the key dims and flag
    pairs differing beyond ``threshold``, with the reference's equivalence
    classes (``check_written_value``, publish.py:1011-1095): NULL==NULL,
    both-infinite-ish (|v| > cutoff) equal, otherwise |Δ| <= threshold.
    Returns mismatching rows with both values."""
    wv = F.col(f"written_{value_col}")
    sv = F.col(f"source_{value_col}")
    both_null = wv.isNull() & sv.isNull()
    both_inf = (F.abs(wv) > F.lit(inf_cutoff)) & (F.abs(sv) > F.lit(inf_cutoff))
    close = F.abs(wv - sv) <= F.lit(threshold)
    ok = both_null | both_inf | close
    j = (
        written.select(*keys, F.col(value_col).alias(f"written_{value_col}"))
        .join(
            source.select(*keys, F.col(value_col).alias(f"source_{value_col}")),
            on=keys, how="inner",
        )
    )
    return j.filter(~ok)


# --- A1: composed pre-parse gate --------------------------------------------

def pre_parse_quality_check(
    df: DataFrame,
    value_col: str,
    expected_dtype: T.DataType | None = None,
    expected_delta: dt.timedelta | None = None,
    cadence_bounds: tuple[dt.timedelta, dt.timedelta] | None = None,
    value_bounds: tuple[float, float] | None = None,
    time_col: str = "time",
) -> None:
    """Gate before any write (reference ``publish.py:624-664``): dtype,
    cadence contiguity, value plausibility.  Raises QualityCheckError."""
    if expected_dtype is not None:
        check_dtype(df, value_col, expected_dtype)
    if expected_delta is not None or cadence_bounds is not None:
        assert_empty(
            cadence_violations(df, time_col, expected_delta, cadence_bounds),
            "time cadence violation",
        )
    if value_bounds is not None:
        assert_empty(
            value_violations(df, value_col, value_bounds),
            "value outside physical bounds",
        )
