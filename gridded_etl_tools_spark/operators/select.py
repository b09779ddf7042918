"""Selection operators: the xarray ``sel`` family as DataFrame filters.

Reference parity:

* point/label select   — ``xr.Dataset.sel(lat=v, lon=v, time=t)`` used all
  over QC and region writes (reference ``utils/publish.py:427,503``).
* range select         — ``sel(time=slice(a, b))`` (``publish.py:1004-1009``).
* membership filter    — ``where(ds.time.isin(other), drop=True)``
  (``publish.py:867``).
* nearest w/ tolerance — ``sel(method="nearest", tolerance=1e-4)``
  (``publish.py:1049-1055``; tolerance ``attributes.py:333-338``).

All are plain Catalyst filters/joins, so partition pruning and parquet
row-group skipping do the indexing work that Zarr chunk addressing does in
the reference.  ``nearest_select`` is the one genuinely new plan: an
abs-difference range join resolved with a row_number window — see
:func:`gridded_etl_tools_spark.operators.joins.tolerance_join`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_select(df: DataFrame, **labels) -> DataFrame:
    """Exact-label selection: ``point_select(df, latitude=36.125, time=t)``."""
    cond: Column | None = None
    for name, value in labels.items():
        c = F.col(name) == F.lit(value)
        cond = c if cond is None else (cond & c)
    if cond is None:
        return df
    return df.filter(cond)


def range_select(df: DataFrame, column: str, lo, hi) -> DataFrame:
    """Inclusive range selection (``sel(time=slice(lo, hi))``)."""
    return df.filter(F.col(column).between(F.lit(lo), F.lit(hi)))


def membership_filter(df: DataFrame, other: DataFrame, on: str | list[str]) -> DataFrame:
    """Keep rows of ``df`` whose key appears in ``other`` — a left-semi
    join.  The membership side is typically a small distinct key list, so
    we broadcast it (identical-dimensions-read-once, SURVEY §4)."""
    on = [on] if isinstance(on, str) else list(on)
    return df.join(F.broadcast(other.select(*on).distinct()), on=on, how="left_semi")


def anti_membership_filter(df: DataFrame, other: DataFrame, on: str | list[str]) -> DataFrame:
    """Rows of ``df`` whose key does NOT appear in ``other`` (left-anti)."""
    on = [on] if isinstance(on, str) else list(on)
    return df.join(F.broadcast(other.select(*on).distinct()), on=on, how="left_anti")
