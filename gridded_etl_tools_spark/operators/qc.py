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
count table by exact inversion of the two-sided binomial test — the same
statistic as the reference's statsmodels
``proportion_confint(method="binom_test")`` call, but dependency-free
(see the exact-binomial machinery at the bottom of this module).
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
    ``expected_nan_frequency`` — a per-timestep exact binomial test
    (reference ``publish.py:1178-1243``: statsmodels
    ``proportion_confint(method="binom_test")``).  Counts are computed in
    Spark over the full population; the CI — the inversion of the
    two-sided (minlike) binomial test around the *observed* count — is
    evaluated in pure Python, and a timestep violates when
    ``expected_frequency`` falls outside it.  ``one_sided`` doubles the
    CI alpha and rejects only when the expected frequency sits below the
    lower bound (NaN excess), mirroring the reference exactly.  Returns a
    list of violating row dicts.

    Scale bound (r5 verdict item 7): the CI inversion runs on
    EXECUTORS via ``mapInPandas`` over the per-timestep count table
    (time-axis-sized — ~640k rows for 70y hourly — embarrassingly
    parallel, O(log n) Lentz continued fractions per row), so the
    driver collects only the VIOLATING timesteps.  A healthy dataset
    collects ~0 rows; the worst case (every timestep violating) equals
    the old full collect, which is the case where the caller needs
    every row anyway."""
    import pandas as _pd

    stats = nan_frequency_by_time(df, time_col, value_col)
    ci_alpha = alpha * 2 if one_sided else alpha
    ef = float(expected_frequency)
    one = bool(one_sided)

    def _violating(batches):
        for pdf in batches:
            keep = []
            for n, k in zip(pdf["n_cells"], pdf["n_null"]):
                lo, hi = binom_test_confint(int(k), int(n), ci_alpha)
                keep.append(ef < lo if one else not (lo <= ef <= hi))
            yield pdf[_pd.Series(keep, index=pdf.index, dtype=bool)]

    bad = stats.mapInPandas(_violating, schema=stats.schema)
    return [r.asDict() for r in bad.collect()]


# --- exact binomial machinery (pure Python, no scipy/statsmodels) -----------
#
# The reference relies on statsmodels' inversion of scipy's two-sided
# "minlike" binomial test; at alpha=1e-5 the normal approximation diverges
# in exactly the tails this check exists for, so the exact distribution is
# computed here from first principles.  CDF goes through the regularized
# incomplete beta function (Lentz continued fraction — standard public
# numerics), keeping every evaluation O(log n) rather than O(n), so the
# check stays cheap even when a timestep has millions of cells.


def binom_pmf(k: int, n: int, p: float) -> float:
    """Exact binomial pmf via log-gamma (stable for large n)."""
    if k < 0 or k > n:
        return 0.0
    if p <= 0.0:
        return 1.0 if k == 0 else 0.0
    if p >= 1.0:
        return 1.0 if k == n else 0.0
    logc = math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)
    return math.exp(logc + k * math.log(p) + (n - k) * math.log1p(-p))


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h


def _betai(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def binom_cdf(k: int, n: int, p: float) -> float:
    """Exact P(X <= k) for X ~ Binomial(n, p): I_{1-p}(n-k, k+1)."""
    if k < 0:
        return 0.0
    if k >= n:
        return 1.0
    if p <= 0.0:
        return 1.0
    if p >= 1.0:
        return 0.0
    return _betai(n - k, k + 1, 1.0 - p)


def binom_test_pvalue(k: int, n: int, p: float) -> float:
    """Two-sided exact binomial p-value, "minlike" definition (the one
    scipy's binomtest uses and statsmodels inverts): the total probability
    of all outcomes no more likely than the observed one, with the
    standard 1+1e-7 relative tolerance on the pmf comparison.  The
    in-tolerance outcome set is the complement of a contiguous interval
    around the mode, so its edges are found by binary search on the
    unimodal pmf — O(log n) pmf evaluations."""
    if not 0 <= k <= n:
        raise ValueError((k, n))
    if p <= 0.0:
        return 1.0 if k == 0 else 0.0
    if p >= 1.0:
        return 1.0 if k == n else 0.0
    d = binom_pmf(k, n, p) * (1 + 1e-7)
    mode = int(math.floor((n + 1) * p))
    mode = min(max(mode, 0), n)
    if binom_pmf(k, n, p) >= binom_pmf(mode, n, p) / (1 + 1e-7):
        return 1.0
    if k < mode:
        # left tail is cdf(k); right contribution: outcomes j > mode with
        # pmf(j) <= d (pmf decreasing right of mode — binary search for
        # the first such j).
        lo, hi = mode, n + 1
        while lo < hi:
            mid = (lo + hi) // 2
            if binom_pmf(mid, n, p) <= d:
                hi = mid
            else:
                lo = mid + 1
        return min(1.0, binom_cdf(k, n, p) + (1.0 - binom_cdf(lo - 1, n, p)))
    # k > mode: right tail is sf(k-1); left contribution: outcomes j < mode
    # with pmf(j) <= d (pmf increasing left of mode — binary search for the
    # last such j).
    lo, hi = -1, mode
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if binom_pmf(mid, n, p) <= d:
            lo = mid
        else:
            hi = mid - 1
    return min(1.0, binom_cdf(lo, n, p) + (1.0 - binom_cdf(k - 1, n, p)))


def binom_test_confint(count: int, nobs: int, alpha: float) -> tuple[float, float]:
    """Invert the two-sided exact binomial test: the interval of null
    proportions p0 whose test of ``count``/``nobs`` is NOT rejected at
    ``alpha`` (statsmodels ``proportion_confint(method="binom_test")``
    semantics: brentq root-find of pvalue(p0) - alpha on each side of the
    observed proportion; here plain bisection, 100 halvings ≈ 1e-30
    resolution)."""
    if not 0 <= count <= nobs:
        raise ValueError((count, nobs))
    q = count / nobs

    def pval(p0: float) -> float:
        return binom_test_pvalue(count, nobs, p0)

    if count == 0:
        lo = 0.0
    else:
        a, b = 1e-300, q
        for _ in range(100):
            mid = (a + b) / 2
            if pval(mid) - alpha > 0:
                b = mid
            else:
                a = mid
        lo = b
    if count == nobs:
        hi = 1.0
    else:
        a, b = q, 1.0 - 1e-16
        for _ in range(100):
            mid = (a + b) / 2
            if pval(mid) - alpha > 0:
                a = mid
            else:
                b = mid
        hi = a
    return lo, hi


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


def spatial_outliers(
    df: DataFrame,
    value_col: str = "value",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    time_col: str | None = "time",
    resolution: float = 1.0,
    threshold: float = 3.0,
) -> DataFrame:
    """Spatial-coherence QC (extends the reference's per-value/per-time
    checks with the gridded check they lack): flag cells whose value
    deviates from their 3x3 neighborhood mean by more than ``threshold``
    neighborhood standard deviations — the classic sensor-glitch /
    decode-corruption detector for physical fields, which per-cell range
    checks cannot see.

    Scale shape: the neighborhood is assembled by a constant-fan-out
    equi-join — every cell is exploded to the 8 neighbor keys it
    CONTRIBUTES to (dx, dy offsets at the declared grid ``resolution``)
    and aggregated per neighbor key, so the plan is one 9x map-side
    expansion + one hash aggregation + one equi-join back to the cells,
    never a windowed sort over the grid and never all-pairs.  Keys are
    quantized to integer steps (``round(coord / resolution)``) so float
    coordinates join exactly.

    Returns flagged cells: (time?, lat, lon, value, neigh_mean,
    neigh_std, n_neighbors, deviation).
    """
    tkeys = [time_col] if time_col else []
    qlat = F.round(F.col(lat_col) / resolution).cast("long")
    qlon = F.round(F.col(lon_col) / resolution).cast("long")
    cells = df.select(
        *tkeys, lat_col, lon_col, value_col,
        qlat.alias("__qlat"), qlon.alias("__qlon"),
    )
    off = F.expr("array(-1, 0, 1)")
    contrib = (
        cells.select(
            *tkeys, F.col(value_col).alias("__v"), "__qlat", "__qlon",
            F.explode(off).alias("__dy"),
        )
        .withColumn("__dx", F.explode(off))
        .filter((F.col("__dx") != 0) | (F.col("__dy") != 0))
        .select(
            *tkeys,
            (F.col("__qlat") + F.col("__dy")).alias("__qlat"),
            (F.col("__qlon") + F.col("__dx")).alias("__qlon"),
            "__v",
        )
    )
    neigh = contrib.groupBy(*tkeys, "__qlat", "__qlon").agg(
        F.avg("__v").alias("neigh_mean"),
        F.stddev_samp("__v").alias("neigh_std"),
        F.count(F.lit(1)).alias("n_neighbors"),
    )
    joined = cells.join(neigh, on=[*tkeys, "__qlat", "__qlon"])
    dev = (F.col(value_col) - F.col("neigh_mean")) / F.col("neigh_std")
    return (
        joined.filter(
            F.col("neigh_std").isNotNull()
            & (F.col("neigh_std") > 0)
            & (F.abs(dev) > F.lit(threshold))
        )
        .select(
            *tkeys, lat_col, lon_col, value_col,
            "neigh_mean", "neigh_std", "n_neighbors",
            dev.alias("deviation"),
        )
    )


def persistence_runs(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "value",
    tiebreak_col: str = "event_id",
    min_run: int = 3,
) -> DataFrame:
    """Stuck-sensor / repeated-state detection (the WMO persistence QC
    check the reference's quality layer stops short of — its
    ``attributes.py`` bounds only cadence and value extremes): per
    entity, runs of >= ``min_run`` consecutive observations reporting the
    IDENTICAL state.

    Returns one row per flagged run: entity, state, ``run_start``,
    ``run_end``, ``n_obs``.

    Shape: gaps-and-islands over the observation order — a change flag
    (``state != lag(state)``), a running sum for the run id, one group
    agg.  Both windows and the agg key on the entity, so the single
    shuffle is the entity hash; no fact-wide window.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(state_col)).over(w)
    change = F.when(
        prev.isNull() | (F.col(state_col) != prev), 1
    ).otherwise(0)
    runs = (
        df.withColumn("__chg", change)
        .withColumn(
            "__run",
            F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(entity_col, "__run", state_col)
        .agg(
            F.min(ts_col).alias("run_start"),
            F.max(ts_col).alias("run_end"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    return runs.filter(F.col("n_obs") >= min_run).drop("__run")
