"""Extended relational query shapes (TPC-H q2/q7-q22 analogs, adapted to
the driver's star schema — there is no partsupp table, so supply-cost
shapes derive per-(part, supplier) facts from lineitem).

Registered into the same catalog as ``plans/catalog.py`` via the shared
``@query`` decorator; conventions are identical (aliases match the
oracle, money sums accumulate in DECIMAL(18,6) before rounding so the
value-hash is engine-reproducible, ratios round to 6).

Physical-plan intent per query is noted in each docstring: which sides
broadcast, where the one necessary shuffle lands, and why the shape
survives a 100 TB fact table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gridded_etl_tools_spark.operators import joins as join_ops
from gridded_etl_tools_spark.plans.catalog import query
from gridded_etl_tools_spark.plans.tables import load

_DEC = "decimal(18,6)"


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)


@query(
    "q7_volume_shipping",
    """
    WITH v AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM v GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bidirectional nation-pair trade volume by ship
    year.  supplier/customer/nation broadcast; the only real shuffle is
    lineitem⋈orders on orderkey (co-partitionable / bucketable at scale).
    The nation-pair predicate is applied after the dim joins so Catalyst
    can push the two n_name IN filters into the broadcast sides."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1996, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1998, 1, 1))
    )
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    """
    WITH v AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = n1.n_regionkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM v GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of regional revenue per order
    year — conditional-sum ratio over an 8-table join.  All dims
    broadcast; lineitem⋈orders is the lone shuffle.  DECIMAL numerator
    and denominator make the ratio bit-reproducible across engines."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= dt.datetime(1996, 1, 1))
        & (F.col("o_orderdate") < dt.datetime(1998, 1, 1))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero))
                .cast("double")
                / F.sum(_rev()).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    """
    WITH v AS (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,6)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%widget%'
    )
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM v GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: product-line profit by supplier nation and year
    (supply cost proxied as half retail price — no partsupp table).  The
    LIKE filter prunes part before it broadcasts, shrinking the fact join
    ~8x before the orderkey shuffle."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


@query(
    "q10_returned_items",
    """
    WITH rev AS (
      SELECT c_custkey, c_name, n_name AS nation,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS revenue
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      GROUP BY c_custkey, c_name, n_name
    )
    SELECT c_custkey, c_name, nation, CAST(round(revenue, 2) AS DOUBLE) AS revenue
    FROM rev ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: top-20 customers by returned-lineitem revenue in a
    quarter.  Plans as TakeOrderedAndProject over the grouped aggregate —
    no global sort materializes.  Ordering ties break on c_custkey, and
    the sort key is the exact DECIMAL sum, so the top-20 cut is identical
    across engines."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= dt.datetime(1997, 1, 1))
        & (F.col("o_orderdate") < dt.datetime(1997, 4, 1))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(_rev()).alias("__rev"))
        .orderBy(F.col("__rev").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey", "c_name", "nation",
            F.round("__rev", 2).cast("double").alias("revenue"),
        )
    )


@query(
    "q11_important_suppliers",
    """
    WITH sv AS (
      SELECT l_suppkey AS s_suppkey,
             sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS value
      FROM lineitem GROUP BY l_suppkey
    ),
    t AS (SELECT CAST(sum(value) AS DOUBLE) / count(*) * 1.05 AS thresh FROM sv)
    SELECT s_suppkey, CAST(round(value, 2) AS DOUBLE) AS total_value
    FROM sv, t WHERE CAST(value AS DOUBLE) > thresh
    """,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: suppliers holding above-average inventory value
    (1.05× the mean supplier, scale-invariant) — scalar-aggregate
    subquery feeding a HAVING-style filter.  Spark form: the per-supplier
    aggregate cross-joins the 1-row global stats (broadcast nested loop).
    The threshold is exact-DECIMAL sum → one double division/multiply, so
    the cut is bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    val = (F.col("l_extendedprice") * F.col("l_quantity")).cast(_DEC)
    sv = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(val).alias("value")
    )
    thresh = sv.agg(
        (F.sum("value").cast("double") / F.count(F.lit(1)) * F.lit(1.05)).alias(
            "__thresh"
        )
    )
    return (
        sv.join(F.broadcast(thresh))
        .filter(F.col("value").cast("double") > F.col("__thresh"))
        .select("s_suppkey", F.round("value", 2).cast("double").alias("total_value"))
    )


@query(
    "q12_priority_shipping",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape (return flag stands in for ship mode): conditional
    counts of high- vs low-priority orders per class.  Integer CASE sums
    — exact everywhere; the shipdate filter pushes to the lineitem scan
    before the orderkey shuffle."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1998, 1, 1))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q13_order_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: customer order-count histogram via LEFT OUTER
    join with an extra join-side predicate (zero-order customers must
    survive, so the priority filter lives in the join condition, not a
    WHERE).  count(col) counts non-nulls — the outer-join nulls fall out
    of the histogram's 0-bucket naturally."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (orders.o_custkey == cust.c_custkey)
        & (orders.o_orderpriority != "4-NOT SPECIFIED"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q15_top_supplier",
    """
    WITH srev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN srev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM srev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: the supplier(s) with maximum quarterly revenue —
    a scalar MAX subquery over a derived aggregate (the reference's
    "view").  The per-supplier aggregate is computed once and reused for
    both the max and the equality filter; DECIMAL equality is exact, so
    ties surface every argmax row deterministically."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1997, 4, 1))
    )
    supp = load(spark, sf_dir, "supplier")
    srev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_revenue"))
    mx = srev.agg(F.max("total_revenue").alias("__mx"))
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
    )


@query(
    "q16_supplier_variety",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1, 5, 10, 15, 20)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: distinct-supplier counts per excluded-brand part
    group (lineitem stands in for partsupp).  Spark plans the DISTINCT
    as a two-level aggregate — partial distinct map-side, exact count
    after one shuffle on the group key."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH t AS (
      SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2)
           AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN t    ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL' AND l_quantity < qty_thresh
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: revenue from below-average-quantity orders — the
    correlated AVG decorrelates to a self-join of lineitem against its
    per-part average.  Quantities are integral so the double AVG is exact
    (integer sums < 2^53), making the 0.2×avg threshold engine-stable.
    At scale: the fact table is scanned twice, but partial (map-side)
    aggregation shrinks the threshold shuffle to ~|part|×partitions rows,
    and the resulting per-part table broadcasts back onto the facts."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    thresh = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(thresh), li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
           AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR-of-ANDs across both join sides.  Catalyst
    extracts the common single-side conjuncts (l_quantity ∈ [1,30],
    p_size ≥ 1 ∧ p_brand IN (...)) and pushes them below the join as scan
    filters, evaluating the residual disjunction post-join — check
    PushedFilters in explain."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    def arm(brand: str, smax: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arm("Brand#1", 15, 1, 11) | arm("Brand#2", 25, 10, 20) | arm("Brand#3", 35, 20, 30))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


@query(
    "q20_excess_suppliers",
    """
    WITH q AS (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey HAVING sum(l_quantity) > 100
    )
    SELECT s_name, n_name AS nation
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM q)
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: suppliers who moved >100 units of red parts in a
    year — nested aggregate feeding an IN (→ left-semi join).  The HAVING
    list is tiny, so the semi join broadcasts it into the supplier scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1998, 1, 1))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    q = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(q), supp.s_suppkey == q.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
    )


@query(
    "q21_sole_fault_supplier",
    """
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
    r_pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT s_name, count(*) AS numwait
    FROM l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM pairs p WHERE p.l_orderkey = l1.l_orderkey
                  AND p.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM r_pairs r WHERE r.l_orderkey = l1.l_orderkey
                      AND r.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q21_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: on finished multi-supplier orders, the supplier
    who is the *only* one with returned lineitems — a correlated EXISTS
    plus NOT EXISTS, decorrelated to a left-semi then left-anti join with
    an extra non-equi conjunct (suppkey inequality) on the orderkey."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    other = pairs.select(
        F.col("l_orderkey").alias("p_ok"), F.col("l_suppkey").alias("p_sk")
    )
    other_r = l1.select(
        F.col("l_orderkey").alias("r_ok"), F.col("l_suppkey").alias("r_sk")
    )
    return (
        l1.join(
            other,
            (l1.l_orderkey == other.p_ok) & (l1.l_suppkey != other.p_sk),
            "left_semi",
        )
        .join(
            other_r,
            (l1.l_orderkey == other_r.r_ok) & (l1.l_suppkey != other_r.r_sk),
            "left_anti",
        )
        .join(orders, l1.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_idle_balances",
    """
    WITH ab AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
    FROM customer, ab
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: above-average balances with no recent orders —
    scalar-average subquery plus NOT EXISTS anti join.  The average is
    computed as exact-DECIMAL sum / count, then one double division, so
    the comparison threshold is bit-identical across engines (a plain
    double AVG would differ in summation order at the last ulp)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= dt.datetime(1999, 1, 1)
    )
    bal_dec = F.col("c_acctbal").cast(_DEC)
    ab = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(bal_dec).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(bal_dec), 2).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
      SELECT p_partkey, p_name, l_suppkey, unit_cost,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY unit_cost ASC, l_suppkey ASC) AS rn
      FROM part JOIN cost ON l_partkey = p_partkey
      WHERE p_size < 10 AND p_type = 'LARGE'
    )
    SELECT p_partkey, p_name, s_name,
           CAST(round(CAST(unit_cost AS DECIMAL(18,6)), 4) AS DOUBLE) AS unit_cost
    FROM ranked JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: cheapest supplier per small LARGE-type part, with
    per-(part, supplier) unit cost derived from lineitem (no partsupp).
    The correlated MIN becomes a ranking window partitioned by part;
    unit_cost is a single double division (identical in both engines) and
    ties break on suppkey, so argmin is deterministic."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "LARGE")
    )
    supp = load(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("unit_cost").asc(), F.col("l_suppkey").asc()
    )
    return (
        cost.join(F.broadcast(part), cost.l_partkey == part.p_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "p_partkey", "p_name", "s_name",
            # round through decimal: direct round(double, 4) is engine-
            # divergent on half-way values (found at sf0.1: 470.91725
            # rounded .9172 vs .9173); dec(18,6) pins the half-way case
            # and HALF_UP agrees across engines
            F.round(F.col("unit_cost").cast("decimal(18,6)"), 4)
            .cast("double")
            .alias("unit_cost"),
        )
    )


@query(
    "interval_window_shipments",
    """
    WITH big AS (
      SELECT o_orderkey, o_orderdate,
             o_orderdate + INTERVAL 7 DAY AS window_end
      FROM orders WHERE o_totalprice > 475000
    )
    SELECT b.o_orderkey, b.o_orderdate,
           count(*)                                                AS n_shipments,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,6))), 2) AS DOUBLE)       AS window_revenue
    FROM big b JOIN lineitem l
      ON l.l_shipdate >= b.o_orderdate AND l.l_shipdate <= b.window_end
    GROUP BY 1, 2
    """,
)
def interval_window_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (an operator Spark lacks natively):
    for each high-value order's 7-day fulfillment window, the count and
    revenue of ALL shipments in that window — a genuine non-equi join,
    not an orderkey lookup.

    Physical shape: ``operators/joins.interval_join`` buckets the time
    axis at window width, explodes each interval to the ≤2 buckets it
    covers, and equi-joins on bucket id — candidate pairs are bounded by
    bucket occupancy instead of |orders|×|lineitem|.  The oracle's
    IEJoin (DuckDB plans range joins natively) cross-checks exactness.
    At 100 TB both sides partition by time bucket, so the join
    co-locates with the table's natural layout."""
    week_s = 7 * 86400.0
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = orders.filter(F.col("o_totalprice") > 475000).select(
        "o_orderkey", "o_orderdate",
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("window_end"),
    )
    joined = join_ops.interval_join(
        li.select("l_shipdate", "l_extendedprice", "l_discount"),
        big, point_col="l_shipdate",
        start_col="o_orderdate", end_col="window_end", bucket_width=week_s,
    )
    return joined.groupBy(
        F.col("iv_o_orderkey").alias("o_orderkey"),
        F.col("iv_o_orderdate").alias("o_orderdate"),
    ).agg(
        F.count(F.lit(1)).alias("n_shipments"),
        # Sum exactly in decimal, round in decimal (HALF_UP matches DuckDB),
        # then hand the driver a DOUBLE: every other revenue query does the
        # same, and DECIMAL outputs stringify differently across the gate's
        # two fetch paths (Decimal obj vs float64) — r2/r3 hash mismatches.
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)), 2
        )
        .cast("double")
        .alias("window_revenue"),
    )


@query(
    "concurrent_high_value_orders",
    """
    WITH big AS (
      SELECT o_orderkey, o_orderdate,
             o_orderdate + INTERVAL 7 DAY AS window_end
      FROM orders WHERE o_totalprice > 475000
    )
    SELECT a.o_orderkey, count(b.o_orderkey) AS n_concurrent
    FROM big a JOIN big b
      ON a.o_orderdate <= b.window_end AND b.o_orderdate <= a.window_end
     AND a.o_orderkey <> b.o_orderkey
    GROUP BY 1
    """,
)
def concurrent_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: for each high-value order, how many
    other high-value orders' 7-day windows overlap its own.

    Physical shape: ``operators/joins.interval_overlap_join`` — both
    sides explode to covered buckets and each overlapping pair is
    emitted only in the overlap's *first* shared bucket, so the join is
    exact with NO dropDuplicates shuffle.  The quadratic blowup of a
    naive cross join becomes O(pairs actually overlapping)."""
    week_s = 7 * 86400.0
    orders = load(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 475000).select(
        "o_orderkey", "o_orderdate",
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("window_end"),
    )
    pairs = join_ops.interval_overlap_join(
        big, big, start_col="o_orderdate", end_col="window_end",
        bucket_width=week_s,
    ).filter(F.col("o_orderkey") != F.col("r_o_orderkey"))
    return pairs.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_concurrent")
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape (late-lineitem EXISTS; the schema has no
    commit/receipt dates, so "late" = shipped more than 60 days after
    the order date): order counts per priority for one quarter.  The
    EXISTS is a LEFT SEMI join — Spark keeps it a semi so each order
    pays at most one probe hit; the quarter filter pushes to the orders
    scan before the orderkey shuffle."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= dt.datetime(1997, 7, 1))
        & (F.col("o_orderdate") < dt.datetime(1997, 10, 1))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: promotion revenue share for one month.  The part
    dimension BROADCASTS into the month-pruned lineitem scan (no fact
    shuffle at all — the aggregate is global), both revenue sums
    accumulate in DECIMAL, and the share is one double division."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 9, 1))
        & (F.col("l_shipdate") < dt.datetime(1997, 10, 1))
    )
    part = load(spark, sf_dir, "part")
    rev = _rev()
    zero = F.lit(0).cast(_DEC)
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    return j.agg(
        F.round(
            100.0
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
            ).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey,
           o_orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: orders whose total quantity exceeds 300, with
    their customers.  The HAVING subquery is ONE hash agg over lineitem
    whose surviving keyset is tiny — it BROADCASTS as a semi join back
    onto lineitem before the re-aggregation, and orders/customer join
    the reduced set; exact DECIMAL quantity sums both places (double at
    the output boundary per the output-type canon)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    li_big = li.join(F.broadcast(big), on="l_orderkey", how="left_semi")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    j = (
        li_big.join(orders, orders.o_orderkey == li_big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
    )
    return j.groupBy(
        "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(F.sum(qty).cast("double").alias("total_qty"))
