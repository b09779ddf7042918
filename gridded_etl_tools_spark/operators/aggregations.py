"""Extent / bbox aggregates and the grouped & rolling aggregations the
reference leaves to "upstream possibilities".

Reference parity:

* bbox            — min/max lon/lat rounded to ``bbox_rounding_value``
  (``utils/convenience.py:435-455``).
* temporal extent — min/max time (``utils/metadata.py:391-398,632-637``;
  ``publish.py:951-966``).
* date-range of a dataset — ``convenience.py:269-294``.
* grouped/rolling aggs — absent in the reference (SURVEY §2.4 A12);
  docstrings name "mean/max of a dimension" as upstream needs
  (``publish.py:485-487``) — natural one-liners here.

All are single-shuffle hash aggregates with map-side partials; bbox/extent
are full-table reductions Catalyst executes as partial+final agg over the
parquet scan with only the needed columns read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bbox(df: DataFrame, lon_col: str, lat_col: str, rounding: int = 2) -> DataFrame:
    """One row: ``min_lon, min_lat, max_lon, max_lat`` rounded."""
    return df.agg(
        F.round(F.min(lon_col).cast("double"), rounding).alias("min_lon"),
        F.round(F.min(lat_col).cast("double"), rounding).alias("min_lat"),
        F.round(F.max(lon_col).cast("double"), rounding).alias("max_lon"),
        F.round(F.max(lat_col).cast("double"), rounding).alias("max_lat"),
    )


def temporal_extent(df: DataFrame, time_col: str = "time") -> DataFrame:
    """One row: ``start, end``."""
    return df.agg(F.min(time_col).alias("start"), F.max(time_col).alias("end"))


def dimension_reduce(
    df: DataFrame, group_cols: list[str], value_col: str, aggs: list[str]
) -> DataFrame:
    """Reduce the value over all dims not in ``group_cols`` — the Spark
    form of ``ds.mean(dim=...)`` etc.  ``aggs`` ⊆ {mean,sum,min,max,count,
    stddev}.  Aliases ``{agg}_{value_col}``."""
    fns = {
        "mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
        "count": F.count, "stddev": F.stddev_samp,
    }
    exprs = [fns[a](value_col).alias(f"{a}_{value_col}") for a in aggs]
    return df.groupBy(*group_cols).agg(*exprs)


def rolling_aggregate(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    value_col: str,
    window_rows: int,
    agg: str = "mean",
) -> DataFrame:
    """Trailing rolling aggregate over the previous ``window_rows`` rows
    (inclusive of current) per partition — rolling climatology per grid
    cell.  Partitioning on the cell keys means the shuffle matches the
    table's natural clustering; at scale, sort within partitions on
    ``order_col`` at write time makes this a near-no-op."""
    fns = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max}
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(f"rolling_{agg}_{value_col}", fns[agg](value_col).over(w))
