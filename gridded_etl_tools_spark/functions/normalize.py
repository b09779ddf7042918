"""Ingest normalization: sentinel→NULL, longitude standardization,
coordinate canonicalization, filename→coordinate parsing.

Reference parity:

* sentinel→NULL       — provider ``missing_value`` (e.g. -9999) rewritten to
  NaN in every chunk (``utils/transform.py:347-375`` preprocess_kerchunk,
  ``attributes.py:203-206``).  Relational form: NULL.
* longitude standardization — ``((lon + 180) % 360) - 180`` then sort
  (``utils/convenience.py:506-524``).
* coordinate rounding — ``spatial_precision`` canonicalization so float
  coordinates are exact join keys (``attributes.py:183-186``; SURVEY §7.4).
* filename parse      — regex-extract time/step/ensemble from file names
  (``util_funcs/flat_to_nd.py:7-72``).

Everything is a built-in-function composition, so it stays inside
whole-stage codegen and pushes through to the scan where possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pos_zero(col: Column) -> Column:
    """Canonicalize IEEE signed zero: ``x + 0.0`` maps ``-0.0`` to
    ``+0.0`` and changes nothing else.

    THE cross-engine convention for any output column that can hit an
    exact zero from a signed direction (rounded near-zero means,
    covariances, correlations): DuckDB's round()/covar can emit ``-0.0``
    where Spark emits ``0.0``, and the gate's stringify distinguishes
    them.  Apply this to the Spark column AND append ``+ 0.0`` to the
    same column in the oracle SQL — both sides, always together."""
    return col + F.lit(0.0)


def sentinel_to_null(df: DataFrame, value_col: str, sentinel: float) -> DataFrame:
    """Rewrite the provider's missing-value sentinel (and non-finite
    stand-ins) to NULL."""
    c = F.col(value_col)
    return df.withColumn(
        value_col,
        F.when((c == F.lit(sentinel)) | F.isnan(c), F.lit(None)).otherwise(c),
    )


def standardize_longitude(col: Column | str) -> Column:
    """Map any longitude convention onto [-180, 180).  ``pmod`` keeps the
    result non-negative before the shift (Python-% semantics, matching the
    reference's numpy expression)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(c + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)


def canonicalize_coords(
    df: DataFrame, coord_cols: list[str], precision: int
) -> DataFrame:
    """Round coordinate key columns to ``precision`` decimals so that
    float coordinates compare exactly in equi-joins."""
    for c in coord_cols:
        df = df.withColumn(c, F.round(F.col(c), precision))
    return df


def filename_coords(
    df: DataFrame,
    filename_col: str,
    patterns: dict[str, str],
    time_format: str | None = None,
    time_col: str | None = None,
) -> DataFrame:
    """Regex-extract coordinate columns from a filename column.

    ``patterns``: output column → regex with one capture group.  If
    ``time_col`` names one of them, it is additionally parsed with
    ``time_format`` (e.g. ``yyyyMMdd``) into a timestamp.
    """
    for out, pat in patterns.items():
        df = df.withColumn(out, F.regexp_extract(F.col(filename_col), pat, 1))
    if time_col and time_format:
        df = df.withColumn(time_col, F.to_timestamp(F.col(time_col), time_format))
    return df
