"""Scale-tier bench rows (round 14): queries whose compute is large
enough at sf0.1 that the 8-core/32-core wall-clock ratio measures REAL
parallel scaling instead of job/stage-scheduling overhead.

Why these exist (r13 verdict item 1): every other bench row at sf0.1 is
dominated by fixed per-job cost — the 8-core suite ran FASTER than the
32-core suite — so "scales with cores" claims rested entirely on plan
shape.  These rows amplify the parquet facts deterministically
(CROSS JOIN a 0..k-1 index, recomputed from the input every invocation
— nothing is cached or staged) to tens of millions of rows of exact
integer work, giving the driver's low-core rerun a measurable ratio:

* ``scale_hash_rollup_32x`` — embarrassingly parallel map compute
  (19.2M md5 hashes at sf0.1) + one 256-group aggregate.  Measured
  8c/32c ≈ 2.4 on the dev box.
* ``scale_rank_shuffle_16x`` — a 9.6M-row shuffle into 8192 uniform
  window partitions + per-group sort/rank (shuffle + sort scaling).
  Measured 8c/32c ≈ 3.0.

Both are exact integer algebra end to end (md5 hex → 60-bit ints,
modular arithmetic) so the DuckDB oracle matches bit-for-bit at every
SF; no floats, no engine-ordering sensitivity.

Scale notes: the ``repartition(defaultParallelism)`` spreads the
single sub-128MB parquet file across the session's cores BEFORE the
k-fold amplification — scale-adaptive (derived from the session, never
a local constant); on a production cluster the scan itself already
yields one task per input split and the same repartition simply
re-spreads a dimension-sized input, costing one narrow pass.  A third
candidate (16x-amplified SMJ join) measured 8c/32c ≈ 1.3 locally —
local-mode shuffle joins are memory-bandwidth-bound, not CPU-bound —
and was dropped (see OPTIMIZATION_r14.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gridded_etl_tools_spark.plans.catalog import query
from gridded_etl_tools_spark.plans.tables import load

#: amplification factors — fixed constants shared by plan and oracle
AMP_HASH = 32
AMP_RANK = 16


@query(
    "scale_hash_rollup_32x",
    f"""
    WITH amp AS (
      SELECT l_orderkey, l_linenumber, r.i
      FROM lineitem CROSS JOIN (SELECT unnest(range(0, {AMP_HASH})) AS i) r
    ), h AS (
      SELECT CAST(concat('0x',
               substr(md5(concat_ws(':', l_orderkey, l_linenumber, i)), 1, 15))
             AS UBIGINT) AS hv
      FROM amp
    )
    SELECT CAST(hv % 256 AS BIGINT) AS g, count(*) AS n_rows,
           CAST(sum(hv % 1000003) AS BIGINT) AS hsum
    FROM h GROUP BY g
    """,
)
def scale_hash_rollup_32x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPU-scaling attestation row: every (lineitem row, copy index)
    pair is md5-hashed to a 60-bit integer and rolled up into 256
    groups.  The map stage is 32x the corpus and embarrassingly
    parallel; the aggregate is combiner-friendly (map-side partial agg,
    256 final groups).  Wall-clock at a fixed SF should scale ~linearly
    with cores — THE row the driver's low-core rerun can read a real
    ratio from."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    n = spark.sparkContext.defaultParallelism
    amp = li.repartition(n).select(
        "l_orderkey",
        "l_linenumber",
        F.explode(F.sequence(F.lit(0), F.lit(AMP_HASH - 1))).alias("i"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.col("i").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        amp.select((h % 256).alias("g"), (h % 1000003).alias("hm"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("hm").alias("hsum"))
    )


@query(
    "scale_rank_shuffle_16x",
    f"""
    WITH amp AS (
      SELECT (l_orderkey * 64 + l_linenumber) * {AMP_RANK} + r.i AS u
      FROM lineitem CROSS JOIN (SELECT unnest(range(0, {AMP_RANK})) AS i) r
    ), hh AS (
      SELECT u, (u * 48271) % 2147483647 AS h FROM amp
    )
    SELECT h % 8192 AS g, u, h,
           CAST(row_number() OVER (PARTITION BY h % 8192
                                   ORDER BY h ASC, u ASC) AS INT) AS rank
    FROM hh QUALIFY rank <= 2
    """,
)
def scale_rank_shuffle_16x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle/sort-scaling attestation row: 16x-amplified lineitem
    keys hash to 8192 uniform window partitions (Lehmer-style modular
    multiply — exact integer math in both engines), shuffle once, and
    each group sorts + ranks, keeping the top 2.  The shuffle carries
    ~10M narrow rows and the per-group sorts parallelize across the
    8192 uniform keys, so cores show up in wall-clock.  Skew-free by
    construction (multiplicative hash spreads keys uniformly)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    n = spark.sparkContext.defaultParallelism
    amp = li.repartition(n).select(
        "l_orderkey",
        "l_linenumber",
        F.explode(F.sequence(F.lit(0), F.lit(AMP_RANK - 1))).alias("i"),
    )
    u = (F.col("l_orderkey") * 64 + F.col("l_linenumber")) * AMP_RANK + F.col(
        "i"
    )
    hashed = amp.select(
        u.alias("u"), ((u * 48271) % 2147483647).alias("h")
    )
    w = Window.partitionBy("g").orderBy(F.col("h").asc(), F.col("u").asc())
    return (
        hashed.select((F.col("h") % 8192).alias("g"), "u", "h")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 2)
    )
