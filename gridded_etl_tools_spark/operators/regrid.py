"""Regridding operators: spatial coarsening, bilinear interpolation, and
arbitrary-interval temporal resampling.

Reference parity: the reference's xarray data plane exposes ``coarsen``-
and ``interp``-style regridding to its users (the lazy xr.Dataset returned
by ``transform.py:545-610`` supports the full xarray API), and its docs
frame chunk layout around resampled query patterns
(``docs/etl_developers_manual.md:135-160``).  The reference itself never
re-implements them — xarray does — so these are the long-form relational
equivalents, built for the 100 TB case:

* ``coarsen`` — block aggregation to a coarser grid.  Pure map-side key
  quantization followed by one hash aggregate: the quantized cell key is
  computed per row (no join, no sort), so the only shuffle is the final
  partial→final agg, and AQE coalesces the post-agg partitions.  At
  1000 executors this is the cheapest possible shape — identical to how
  a ``GROUP BY floor(x)`` rollup scales.
* ``bilinear_regrid`` — value interpolation at arbitrary target points
  from the 4 surrounding nodes of a regular source grid.  Long-form has
  no array neighborhoods, so the neighborhood is *constructed*: each
  target row explodes into its 4 corner keys with analytic weights, then
  one equi-join against the source grid and one sum.  Target side is
  usually tiny (probe points) → broadcast of the exploded corners keeps
  the big grid un-shuffled; the grid scan stays pruned to the bbox of
  the targets because corner keys are plain column predicates.
* ``time_bucket`` — TimescaleDB-style arbitrary-interval bucketing via
  integer epoch arithmetic (``date_trunc`` only reaches calendar units).
  Stays in whole-stage codegen: two integer ops per row, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decimal places used to canonicalize floating grid keys before an
#: equi-join; matches the ingest-time coordinate rounding decision in
#: SURVEY §7.4 (float32 coords are canonicalized, tolerance joins are
#: reserved for QC).
GRID_KEY_DECIMALS = 6


def _cell_floor(col: Column, origin: float, width: float) -> Column:
    """Lower edge of the grid cell containing ``col``, rounded so the
    result is a stable equi-join key across engines."""
    return F.round(
        F.floor((col - F.lit(origin)) / F.lit(width)) * F.lit(width) + F.lit(origin),
        GRID_KEY_DECIMALS,
    )


def coarsen(
    df: DataFrame,
    coords: dict[str, tuple[float, float]],
    value_col: str = "value",
    aggs: tuple[str, ...] = ("mean",),
) -> DataFrame:
    """Block-aggregate ``value_col`` onto a coarser grid.

    ``coords`` maps each coordinate column to ``(origin, cell_width)``;
    every row is assigned to the cell whose lower edge it falls in, and
    the requested aggregates are computed per cell.  Output columns:
    the quantized coordinate columns (same names) plus one
    ``<agg>_<value_col>`` per aggregate.

    xarray analog: ``ds.coarsen(lat=f, lon=f).mean()`` — but expressed
    as a single map-side quantize + hash aggregate, which is the shape
    that survives 100 TB (no window, no join, partial aggregation
    pushes to the scan side of the exchange).
    """
    keyed = df
    for c, (origin, width) in coords.items():
        keyed = keyed.withColumn(c, _cell_floor(F.col(c), origin, width))
    fns = {
        "mean": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(F.col(c)),
    }
    exprs = [fns[a](value_col).alias(f"{a}_{value_col}") for a in aggs]
    return keyed.groupBy(*coords.keys()).agg(*exprs)


def conservative_regrid(
    df: DataFrame,
    coords: dict[str, tuple[float, float, float]],
    value_col: str = "value",
) -> DataFrame:
    """Area-weighted (first-order conservative) regrid — the third
    standard method next to :func:`coarsen` (block) and
    :func:`bilinear_regrid` (point), and the one climate pipelines use
    when the target grid is NOT an integer multiple of the source
    (xESMF ``conservative``): each source cell's value contributes to
    every target cell it overlaps, weighted by overlap area, so the
    regrid preserves area integrals.

    ``coords`` maps each coordinate column (cell CENTER) to
    ``(source_cell_width, target_origin, target_cell_width)``.  Output:
    target cell centers (same column names), ``mean_<value>``
    (area-weighted), ``weight`` (total overlap area — partial edge
    cells show < full target area).

    Scale shape: pure map-side — each source row explodes to the ≤
    ceil(sw/tw)+1 target cells per axis its span touches with analytic
    weights (no join against a target table), then ONE hash aggregate
    on the target key.  Same single-shuffle contract as ``coarsen``.
    """
    out = df
    w_cols = []
    for c, (sw, t0, tw) in coords.items():
        lo = F.col(c) - F.lit(sw / 2.0)
        hi = F.col(c) + F.lit(sw / 2.0)
        first = F.floor((lo - F.lit(t0)) / F.lit(tw)).cast("long")
        last = F.floor(
            (hi - F.lit(t0)) / F.lit(tw) - F.lit(1e-12)
        ).cast("long")
        out = out.withColumn(f"__i_{c}", F.explode(F.sequence(first, last)))
        t_lo = F.lit(t0) + F.col(f"__i_{c}") * F.lit(tw)
        # materialize the per-axis overlap BEFORE replacing c / dropping
        # the index column — column expressions are lazy
        out = out.withColumn(
            f"__w_{c}", F.least(hi, t_lo + F.lit(tw)) - F.greatest(lo, t_lo)
        )
        out = out.withColumn(
            c, F.round(t_lo + F.lit(tw / 2.0), GRID_KEY_DECIMALS)
        ).drop(f"__i_{c}")
        w_cols.append(f"__w_{c}")
    weight = F.lit(1.0)
    for wc in w_cols:
        weight = weight * F.col(wc)
    out = out.withColumn("__w", weight).drop(*w_cols)
    return (
        out.groupBy(*coords.keys())
        .agg(
            (F.sum(F.col(value_col) * F.col("__w")) / F.sum("__w")).alias(
                f"mean_{value_col}"
            ),
            F.sum("__w").alias("weight"),
        )
    )


def bilinear_regrid(
    grid: DataFrame,
    targets: DataFrame,
    lat_origin: float,
    lat_step: float,
    lon_origin: float,
    lon_step: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str = "value",
    broadcast_targets: bool = True,
) -> DataFrame:
    """Bilinear interpolation of a regular source grid at arbitrary
    target points.

    ``grid`` rows sit exactly on ``origin + i*step`` nodes; ``targets``
    carries arbitrary ``(lat_col, lon_col)`` points plus any id columns.
    Each target explodes into its 4 surrounding corner keys with the
    analytic weights ``(1-fy|fy)*(1-fx|fx)``, equi-joins the grid on the
    rounded corner coordinates, and sums ``weight*value``.  Returns the
    target id columns + ``interp_<value_col>`` + ``n_corners`` (targets
    with fewer than 4 grid hits — grid edge or holes — keep their
    partial count so callers can filter; the interpolated value is
    weight-renormalized over found corners).

    Physical shape at scale: the target side (probe points) is exploded
    4x and broadcast, so the N-billion-row grid never shuffles; corner
    equality predicates prune grid partitions when the table is
    clustered on (lat, lon) (Z-order, `operators/zorder.py`).
    """
    id_cols = [c for c in targets.columns if c not in (lat_col, lon_col)]

    gy = (F.col(lat_col) - F.lit(lat_origin)) / F.lit(lat_step)
    gx = (F.col(lon_col) - F.lit(lon_origin)) / F.lit(lon_step)
    t = targets.withColumn("_gy", gy).withColumn("_gx", gx)
    t = (
        t.withColumn("_iy", F.floor("_gy"))
        .withColumn("_ix", F.floor("_gx"))
        .withColumn("_fy", F.col("_gy") - F.col("_iy"))
        .withColumn("_fx", F.col("_gx") - F.col("_ix"))
    )
    corner = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dy).alias("dy"),
                    F.lit(dx).alias("dx"),
                    (
                        (F.col("_fy") if dy else (F.lit(1.0) - F.col("_fy")))
                        * (F.col("_fx") if dx else (F.lit(1.0) - F.col("_fx")))
                    ).alias("w"),
                )
                for dy in (0, 1)
                for dx in (0, 1)
            ]
        )
    ).alias("c")
    corners = t.select(
        *id_cols,
        F.col(lat_col).alias("_tlat"),
        F.col(lon_col).alias("_tlon"),
        "_iy",
        "_ix",
        corner,
    ).select(
        *id_cols,
        "_tlat",
        "_tlon",
        F.round(
            F.lit(lat_origin) + (F.col("_iy") + F.col("c.dy")) * F.lit(lat_step),
            GRID_KEY_DECIMALS,
        ).alias("_clat"),
        F.round(
            F.lit(lon_origin) + (F.col("_ix") + F.col("c.dx")) * F.lit(lon_step),
            GRID_KEY_DECIMALS,
        ).alias("_clon"),
        F.col("c.w").alias("_w"),
    )
    if broadcast_targets:
        corners = F.broadcast(corners)

    g = grid.select(
        F.round(F.col(lat_col), GRID_KEY_DECIMALS).alias("_clat"),
        F.round(F.col(lon_col), GRID_KEY_DECIMALS).alias("_clon"),
        F.col(value_col).alias("_v"),
    )
    joined = corners.join(g, ["_clat", "_clon"], "inner")
    return (
        joined.groupBy(*id_cols, "_tlat", "_tlon")
        .agg(
            F.round(
                F.sum(F.col("_w") * F.col("_v")) / F.sum("_w"), GRID_KEY_DECIMALS
            ).alias(f"interp_{value_col}"),
            F.count(F.lit(1)).cast("int").alias("n_corners"),
        )
        .withColumnRenamed("_tlat", lat_col)
        .withColumnRenamed("_tlon", lon_col)
    )


def time_bucket(
    df: DataFrame,
    ts_col: str,
    width: str,
    origin_us: int = 0,
) -> DataFrame:
    """Add a ``bucket`` timestamp column: the start of the ``width``-wide
    interval containing ``ts_col``, with intervals aligned to the epoch
    microsecond ``origin_us`` (an integer, NOT a timestamp string, so the
    result is independent of ``spark.sql.session.timeZone``).

    Unlike ``date_trunc`` this handles arbitrary widths ("10 days",
    "90 minutes"); unlike ``window()`` it emits a plain column usable as
    a grouping/partitioning key and is engine-portable (pure integer
    arithmetic on epoch microseconds — DuckDB oracle:
    ``make_timestamp((epoch_us(ts) // w) * w)``).
    """
    m = re.fullmatch(r"(\d+)\s+(second|minute|hour|day)s?", width.strip())
    if not m:
        raise ValueError(f"unsupported bucket width: {width!r}")
    n, unit = int(m.group(1)), m.group(2)
    us = n * {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit] * 1_000_000

    # TIMESTAMP_NTZ is not accepted by unix_micros; session tz is pinned UTC
    # (session.py) so the cast is value-preserving for both timestamp types.
    off = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.lit(origin_us)
    # pmod (not %) so pre-origin timestamps still bucket toward -inf
    bucket_us = F.lit(origin_us) + (off - F.pmod(off, F.lit(us)))
    return df.withColumn("bucket", F.timestamp_micros(bucket_us))
