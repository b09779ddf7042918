"""Deterministic, ORACLE-CHECKABLE approximate sketches.

The catalog's ``approx_distinct_users_daily`` / ``approx_value_percentiles``
rows use Spark's built-in sketches (HLL++ / GK), whose register layouts are
engine-private — so those rows can only ever get a rows-only check.  This
module implements the two classic mergeable sketches from their published
definitions (Flajolet et al. 2007 HyperLogLog; Cormode & Muthukrishnan 2005
Count-Min) on md5-derived hashes that BOTH engines can compute bit-for-bit,
so the approximate *estimates themselves* hash-match a DuckDB replay:
every step is integer arithmetic (bucket = top hash bits, register = max
leading-zero rank folded as ``min bit_length``, counters = exact integer
sums) and the final estimate is one deterministic double expression.

Scale shape — the whole reason these sketches exist:

* HLL: one hash agg to (keys, bucket) registers — 2^b tiny rows per key
  group regardless of input size, map-side combinable (min), mergeable
  across shards/days by the same ``min``.  The estimate runs on the
  register table, never the facts.
* CMS: one hash agg to (row, col) counters — d*w cells total, map-side
  combinable (sum), mergeable by ``+``.  Point queries broadcast the
  counter table.

Reference parity: the reference has no sketches (its QC samples instead,
``utils/publish.py:666``); these are the 100 TB replacements for exact
distinct/frequency scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 60-bit md5-prefix hash of a column's string form — computable in
#: DuckDB as ('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT
def _h60(col) -> "F.Column":
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def hll_registers(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    bucket_bits: int = 8,
) -> DataFrame:
    """HyperLogLog register table per key group: ``(keys..., bucket,
    min_bitlen)`` where ``bucket`` is the top ``bucket_bits`` of the
    60-bit item hash and ``min_bitlen`` the minimum bit-length of the
    remaining 52-bit suffix (equivalently the MAX leading-zero rank:
    rank = 53 - bitlen, so min bitlen ↔ max rank).  One map-side
    combinable hash agg; at most ``2^bucket_bits`` rows per key group.
    Registers from different shards/periods merge with a further
    ``min`` — the sketch property that makes pre-aggregation safe."""
    if not 1 <= bucket_bits <= 16:
        raise ValueError("bucket_bits must be in [1, 16]")
    suffix_bits = 60 - bucket_bits
    h = _h60(F.col(item_col))
    bucket = F.shiftrightunsigned(h, suffix_bits)
    w = h % F.lit(1 << suffix_bits).cast("long")
    # minimal binary string length == bit_length; bin() never pads, in
    # either engine.  w == 0 -> bitlen 0 (the all-zero suffix, max rank).
    bitlen = F.when(w > 0, F.length(F.bin(w))).otherwise(F.lit(0))
    return (
        df.select(*keys, bucket.alias("bucket"), bitlen.alias("__bl"))
        .groupBy(*keys, "bucket")
        .agg(F.min("__bl").alias("min_bitlen"))
    )


def hll_estimate(
    registers: DataFrame,
    keys: list[str],
    bucket_bits: int = 8,
) -> DataFrame:
    """Distinct-count estimate from an HLL register table: the raw
    harmonic-mean estimate with the standard small-range linear-counting
    correction (Flajolet et al. 2007 §4).

    Exactness trick: the harmonic sum Σ 2^-rank is kept as the INTEGER
    Σ 2^(bitlen) (= 2^53 · Σ 2^-rank for a 52-bit suffix) plus
    2^53 per empty bucket, so the only floating-point steps are the
    final divisions — deterministic IEEE on identical exact operands in
    both engines."""
    suffix_bits = 60 - bucket_bits
    m = 1 << bucket_bits
    scale = 1 << (suffix_bits + 1)  # 2^53: term for an empty bucket
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*keys).agg(
        # PySpark's shiftleft() only takes a literal bit count — the
        # SQL form accepts a column expression
        F.sum(
            F.expr("shiftleft(cast(1 as bigint), min_bitlen)")
        ).alias("__s_nonempty"),
        F.count(F.lit(1)).alias("__n_buckets"),
    )
    v = F.lit(m) - F.col("__n_buckets")  # empty buckets
    s_int = F.col("__s_nonempty") + v * F.lit(scale).cast("long")
    e_raw = (
        F.lit(alpha * m * m * float(scale)) / s_int.cast("double")
    )
    small = (e_raw <= 2.5 * m) & (v > 0)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    return agg.select(
        *keys,
        F.round(F.when(small, linear).otherwise(e_raw), 4).alias(
            "hll_estimate"
        ),
    )


def cms_counters(
    df: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Count-Min counter table ``(row, col, cnt)``: each item increments
    one cell per hash row (row-salted md5 column hash).  d*w cells
    total; one map-side combinable hash agg; two CMS tables merge by
    cell-wise ``+``."""
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(depth - 1))
    ).alias("row")
    e = df.select(F.col(item_col).alias("__it")).select("__it", rows)
    col = _cms_col(F.col("__it"), F.col("row"), width)
    return (
        e.select("row", col.alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cms_col(item, row, width: int) -> "F.Column":
    """Column index for (item, hash-row): the row index salts the md5
    input, the first 8 hex chars mod width pick the column — the same
    expression DuckDB replays as
    ``('0x' || substr(md5(row || chr(1) || item), 1, 8))::BIGINT % width``."""
    salted = F.concat_ws("\x01", row.cast("string"), item.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
        % F.lit(width).cast("long")
    )


def cms_point_estimates(
    counters: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """CMS point query per probe item: min over hash rows of that item's
    cell — an overestimate by construction (collisions only add).  The
    counter table broadcasts (d*w rows); probes never shuffle."""
    p = probes.select(F.col(item_col)).distinct()
    e = p.select(
        item_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    keyed = e.withColumn("col", _cms_col(F.col(item_col), F.col("row"), width))
    joined = keyed.join(F.broadcast(counters), on=["row", "col"], how="left")
    return (
        joined.groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# DDSketch — deterministic mergeable quantile sketch
# ---------------------------------------------------------------------------

def dd_bin(value_col, gamma: float = 1.02):
    """DDSketch bin index (Masson, Lee & Rice, VLDB 2019 §2.1):
    ``ceil(log_gamma(v))`` for v > 0 — every value in bin i lies in
    ``(gamma^(i-1), gamma^i]``, so the bin MIDPOINT estimates any member
    within relative error alpha = (gamma-1)/(gamma+1).

    The log ratio is rounded to 6 dp BEFORE the ceil so both engines
    (Java ``Math.log`` / DuckDB ``ln``) bin identically — a 1-ulp log
    divergence only flips a bin when a value sits within 1e-6 of a bin
    edge, which the oracle rows verify never happens on the fixture
    data at any SF."""
    import math

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.ceil(F.round(F.log(v) / F.lit(math.log(gamma)), 6)).cast("long")


def dd_histogram(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    gamma: float = 1.02,
) -> DataFrame:
    """Per-key DDSketch: one hash agg to (keys, bin) counts.  Values
    must be POSITIVE (non-positive rows are excluded, mirroring the
    published sketch's positive store; add a mirrored store keyed on
    sign if a dataset needs it).

    Scale shape — the reason this exists next to HLL and CMS: the
    sketch is ~log(max/min)/log(gamma) rows per key group (≈550 bins
    for a 0.01..500 range at gamma=1.02) REGARDLESS of input size,
    map-side combinable (sum), and mergeable across shards/days/weeks
    by the same sum — so quantiles over any rollup of 100 TB reduce to
    arithmetic on a dim-sized bin table, facts touched once."""
    return (
        df.filter(F.col(value_col) > 0)
        .groupBy(*keys, dd_bin(value_col, gamma).alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dd_merge(hist: DataFrame, keys: list[str]) -> DataFrame:
    """Merge sketches onto coarser keys (day -> week, shard -> corpus):
    bin counts just add.  ``hist`` may be a union of many sketches."""
    return hist.groupBy(*keys, "bin").agg(F.sum("c").alias("c"))


def dd_quantiles(
    hist: DataFrame,
    keys: list[str],
    quantiles: list[float],
    gamma: float = 1.02,
    out_decimals: int = 6,
) -> DataFrame:
    """Quantile reconstruction from a (keys, bin, c) sketch: the q-th
    quantile is the midpoint ``2*gamma^bin/(gamma+1)`` of the first bin
    whose cumulative count reaches ``ceil(q*n)``.  The cumulative
    window runs on the BIN axis — bounded at ~550 rows per key by the
    gamma geometry, never fact-sized.  Output column per quantile:
    ``p50``, ``p90``, ... (rounded so a 1-ulp pow divergence cannot
    leak into cross-engine comparisons)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("bin")
    wk = Window.partitionBy(*keys)
    cum = (
        hist.withColumn("__cum", F.sum("c").over(w))
        .withColumn("__n", F.sum("c").over(wk))
    )
    est = F.round(
        F.lit(2.0) * F.pow(F.lit(gamma), F.col("bin")) / F.lit(gamma + 1.0),
        out_decimals,
    )
    aggs = [
        F.min(
            F.when(F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")), est)
        ).alias(f"p{int(round(q * 100))}")
        for q in quantiles
    ]
    return cum.groupBy(*keys).agg(F.max("__n").alias("n"), *aggs)
