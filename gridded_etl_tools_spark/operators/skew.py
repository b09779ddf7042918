"""Skew-aware join helpers (100 TB hardening, SURVEY §7 phase 7).

AQE's skew-join handling splits oversized *sort-merge* partitions at
runtime, but two cases still need explicit salting on a big cluster:

* a shuffled join where one hot key (a mega-popular document bucket, a
  degenerate LSH band, the null/default cell) dwarfs every other
  partition, and
* aggregations keyed by a hot key (two-phase: salted partial, then
  final).

``salted_join`` replicates the *small* side R times and scatters the big
side's hot keys across R salt buckets: shuffle parallelism on the hot
key goes from 1 task to R tasks at the cost of R× the small side (which
is bounded — salt only when the small side fits comfortably).

Determinism: the salt is ``pmod(hash(cols…), R)`` — content-defined, so
results are reproducible and the salt never leaks into output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
    salt_source_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted into
    ``salt_buckets`` sub-keys and the small side replicated per bucket.

    ``salt_source_cols``: big-side columns whose hash scatters rows of
    the same hot join key (default: all non-join columns' hash via
    ``monotonically_increasing_id``-free ``hash(*)`` of the full row —
    we use ``F.hash`` over all columns, stable across retries).
    """
    src = salt_source_cols or [c for c in big.columns]
    big_salted = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in src]), F.lit(salt_buckets))
    )
    small_replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = big_salted.join(small_replicated, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    agg_exprs: dict[str, str | list[str]],
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof aggregation: partial aggregate on (keys ⊕ salt), then
    final aggregate on keys.  Supports the decomposable aggs
    (sum/count/min/max); mean = sum/count downstream.

    WHEN TO USE (measured — scripts/ab_scale.py, BASELINE round-5 A/B):
    for these map-side-COMBINABLE aggregates Spark's own partial
    aggregation already crushes the hot key before the shuffle, so on a
    skewed 10M-row set the plain groupBy beat this by 5x — salting a
    combinable agg is pure overhead.  Reach for the salt only when the
    per-key state does NOT combine (exact count-distinct buffers,
    collect_list/percentile buffers) or when the explicit (key, salt)
    partial feeds further per-salt processing; for skewed JOINS prefer
    AQE's skew-join split first and :func:`salted_join` when the skew
    is known ahead of plan time.

    ``agg_exprs``: {column: fn or [fn, ...]} with fn one of
    sum|count|min|max.  Output columns are ``{fn}_{col}``.
    """
    _partials = {
        "sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
    }
    _finals = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    pairs: list[tuple[str, str]] = []
    for col, fns in agg_exprs.items():
        for fn in [fns] if isinstance(fns, str) else list(fns):
            if fn not in _partials:
                raise ValueError(f"unsupported agg {fn!r}")
            pairs.append((col, fn))

    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_partials[fn](col).alias(f"{fn}_{col}") for col, fn in pairs]
    )
    return partial.groupBy(*keys).agg(
        *[_finals[fn](f"{fn}_{col}").alias(f"{fn}_{col}") for col, fn in pairs]
    )
