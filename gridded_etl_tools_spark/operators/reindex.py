"""Reindex-to-complete-grid and dense-completeness checks.

Reference parity:

* ``reindexing.py:5-28`` — ``pd.date_range(min, max, freq)`` then
  ``dataset.reindex(time=...)`` inserting all-NaN timesteps.
* ``util_funcs/flat_to_nd.py:75-185`` (``nest_files``) — densify a
  file×dims table into a complete hypercube, erroring on holes.

Spark form: generate the dense axis with ``sequence() + explode`` (JVM-side,
no driver loop), cross-join the (small) dim tables, left-join the facts.
The dense axis per dimension is tiny; the cross product is what explodes —
at 100 TB the facts stay put and the dense key set is built per partition
window of interest, never materialized globally.  Missing-combination
checks are a left-anti join against the dense set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_time_axis(df: DataFrame, time_col: str, interval_sql: str) -> DataFrame:
    """All timestamps from min to max at the given cadence, one column
    named ``time_col``.  ``interval_sql`` e.g. ``"1 day"``."""
    return (
        df.select(F.min(time_col).alias("lo"), F.max(time_col).alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {interval_sql}"))
            ).alias(time_col)
        )
    )


def reindex_time(
    facts: DataFrame,
    time_col: str,
    interval_sql: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Left-join facts onto the dense (time × groups) frame; absent cells
    come back NULL — exactly ``reindex`` filling NaN.

    ``group_cols``: the identity dims to complete against (e.g. the grid
    cells, or an entity column).  They must be low-cardinality *dim*
    columns; the dense frame is |time| × |groups| rows.
    """
    axis = dense_time_axis(facts, time_col, interval_sql)
    if group_cols:
        dims = facts.select(*group_cols).distinct()
        dense = axis.crossJoin(F.broadcast(dims))
        keys = [time_col, *group_cols]
    else:
        dense = axis
        keys = [time_col]
    return dense.join(facts, on=keys, how="left")


def missing_combinations(
    facts: DataFrame, dim_cols: list[str]
) -> DataFrame:
    """Dense cross-product of each dim's distinct values, anti-joined
    against the facts: rows are the holes.  Empty result == complete
    hypercube (the ``nest_files`` hole check, flat_to_nd.py:151-185)."""
    dense = None
    for c in dim_cols:
        vals = facts.select(c).distinct()
        dense = vals if dense is None else dense.crossJoin(vals)
    return dense.join(facts.select(*dim_cols).distinct(), on=dim_cols, how="left_anti")
