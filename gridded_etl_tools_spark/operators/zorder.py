"""Z-order (Morton) spatial clustering (SURVEY §4 "custom needs" (d):
grid-aware clustering for (lat, lon) locality — a maintenance-job
concern, not a Catalyst rule).

Sorting files by ``z_index`` instead of (lat, lon) keeps 2-D neighbors
in the same parquet row groups, so a bbox query prunes ~O(perimeter)
row groups instead of O(rows) — the relational analog of the
reference's 2-D zarr chunk tiling (``examples/managers/chirps.py:27``:
``{"latitude": 25, "longitude": 50}`` tiles).

Pure JVM bit arithmetic (shiftleft / bitwiseAND / OR) — stays in
whole-stage codegen; 16 bits per axis (≈ 0.003° resolution on a global
grid, finer than any reference dataset's 0.05°).

Usage with the table layer::

    df2 = with_zorder(df)                       # adds z_index
    table.write_initial(df2, sort_cols=["z_index"])
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic-number bit spreading masks (16 -> 32 bit interleave preparation)
_MASKS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(col: Column) -> Column:
    """Insert a zero bit between each of the low 16 bits of ``col``."""
    out = col.cast("long")
    for shift, mask in _MASKS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def _quantize(
    col: Column, lo: float, hi: float, resolution: float | None, bits: int = 16
) -> Column:
    """Map ``col`` to [0, 2^bits - 1].  With ``resolution`` (a regular
    grid's cell size) the cell *index* is used directly — adjacent grid
    cells get adjacent codes, which is what makes the Morton curve walk
    neighbor-to-neighbor.  Without it, the full [lo, hi] range is
    uniformly quantized (arbitrary/irregular coordinates)."""
    steps = (1 << bits) - 1
    if resolution is not None:
        scaled = F.round((col.cast("double") - F.lit(lo)) / F.lit(resolution))
    else:
        scaled = F.round((col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * steps)
    return F.greatest(F.lit(0), F.least(F.lit(steps), scaled.cast("long")))


def z_index(
    lat_col: Column | str,
    lon_col: Column | str,
    lat_range: tuple[float, float] = (-90.0, 90.0),
    lon_range: tuple[float, float] = (-180.0, 180.0),
    resolution: float | None = None,
) -> Column:
    """32-bit Morton code interleaving 16 quantized bits of each axis.
    Pass the grid's ``resolution`` (GridSpec.spatial_resolution) so cell
    indices, not range fractions, are interleaved — 16 bits covers grids
    up to 65k cells per axis (0.0055° global, finer than any reference
    dataset)."""
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    yi = _spread_bits(_quantize(lat, *lat_range, resolution))
    xi = _spread_bits(_quantize(lon, *lon_range, resolution))
    return xi.bitwiseOR(F.shiftleft(yi, 1))


def z_index_n(
    cols: list,
    ranges: list[tuple[float, float]],
    resolution: float | None = None,
    bits: int | None = None,
) -> Column:
    """Generic k-axis Morton interleave (the 3+-column ``OPTIMIZE
    ZORDER BY`` shape — e.g. (time-bucket, lat, lon) or
    (user, value, event)): bit ``i`` of axis ``a`` lands at position
    ``i*k + a``, so all k axes share locality in the code prefix.

    ``bits`` defaults to ``min(16, 62 // k)`` per axis (the whole code
    must fit a signed long).  Two axes should prefer :func:`z_index`
    (the magic-mask spread is a shorter expression tree); this form is
    a loop of shift/and/or column ops — still pure JVM whole-stage
    codegen, ~``bits`` ops per axis."""
    k = len(cols)
    if k < 2:
        raise ValueError("z_index_n interleaves 2+ columns")
    if len(ranges) != k:
        raise ValueError("one (lo, hi) range per column")
    if bits is None:
        bits = min(16, 62 // k)
    if bits * k > 62:
        raise ValueError(f"{bits} bits x {k} axes overflows a long")
    out = F.lit(0).cast("long")
    for axis, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        lo, hi = ranges[axis]
        q = _quantize(col, lo, hi, resolution, bits)
        for i in range(bits):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * k + axis))
    return out


def with_zorder(
    df: DataFrame,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    out_col: str = "z_index",
    lat_range: tuple[float, float] = (-90.0, 90.0),
    lon_range: tuple[float, float] = (-180.0, 180.0),
    resolution: float | None = None,
) -> DataFrame:
    """Attach the Morton code column for write-time clustering."""
    return df.withColumn(
        out_col, z_index(lat_col, lon_col, lat_range, lon_range, resolution)
    )
