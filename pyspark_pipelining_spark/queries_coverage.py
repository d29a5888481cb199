"""Round-5 coverage additions, part 1: the TPC-H analogue shapes the
registry did not yet exercise — argmin-per-group supplier selection
(Q2), the single-scalar forecast aggregate (Q6), the multi-dim profit
rollup (Q9), the global-fraction important-parts cut (Q11), bucketed
lateness counts (Q12), count-distinct with NOT-IN exclusion (Q16),
nested-aggregate dominant-supplier share (Q20), and the only-late-
supplier-on-a-multi-supplier-order credit (Q21).

The fixture (TESTDATA.md) has no partsupp/commitdate/shipmode, so each
query keeps the reference query's *plan shape* with the columns that
exist: ``s_acctbal`` stands in for supply cost, ship-after-order for
lateness, ``o_orderpriority`` for ship mode.

Conventions follow queries_relational.py: money through decimal (exact)
cast to double only at the boundary, every computed column aliased
identically in both dialects, deterministic ORDER BY (metric + key
tiebreak).  Broadcast hints on every dim side so the fact table never
shuffles for a dim join at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipelining_spark.sources.registry import load_table

D2 = "decimal(18,2)"
DISC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


# --- TPC-H Q2 analogue: cheapest supplier per part (argmin-per-group) ----


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every small STANDARD part, the supplier that has actually
    shipped it with the lowest account balance (stand-in for supply
    cost) — TPC-H Q2's correlated-min shape as a window argmin with a
    deterministic suppkey tiebreak.

    Scale shape: the only wide operation is one distinct over
    ``(l_partkey, l_suppkey)`` (a single hash shuffle of two ids);
    part and supplier are broadcast dims.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("p_partkey")
    )


SQL_MIN_COST_SUPPLIER = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ranked AS (
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
           row_number() OVER (PARTITION BY p_partkey
                              ORDER BY s_acctbal ASC, s_suppkey ASC) AS _rn
    FROM pairs
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size < 10 AND p_type = 'STANDARD'
)
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
FROM ranked WHERE _rn = 1
ORDER BY p_partkey
"""


# --- TPC-H Q6 analogue: forecast revenue change (single-scalar scan) -----


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would be recovered by dropping mid-band discounts
    on small-quantity 1996 lines (TPC-H Q6): a pure scan-aggregate —
    every predicate must push to the parquet scan, no join, one row
    out.  price×discount has exactly 4 decimal places → decimal(18,4)
    is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1996)
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.expr("CAST(l_extendedprice * l_discount AS DECIMAL(18,4))"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_FORECAST_REVENUE = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE year(l_shipdate) = 1996
  AND l_discount >= 0.04 AND l_discount <= 0.06
  AND l_quantity < 24
"""


# --- TPC-H Q9 analogue: product profit by nation and year ----------------


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on widget parts per (supplier nation, order year) — TPC-H
    Q9's five-way join with a derived profit measure.  With no
    partsupp, unit cost is the part's retail price at a 10:1 quantity
    margin: profit = disc_price − retail·qty/10, all decimal-exact.

    Scale shape: part/supplier/nation broadcast; the single big join
    is lineitem ⋈ orders on the order key (co-partitionable)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # ×10-scaled profit keeps everything decimal-exact in BOTH engines:
    # DuckDB's decimal division returns DOUBLE (per-row rounding), so
    # the /10 happens exactly once, on the final sum, as one IEEE op.
    profit10 = F.expr(
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) * 10"
        " - CAST(p_retailprice AS DECIMAL(18,2))"
        "   * CAST(l_quantity AS DECIMAL(4,0))"
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit10).cast("double") / 10.0).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


SQL_PRODUCT_PROFIT = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) * 10
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) / 10.0
           AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --- TPC-H Q11 analogue: important parts by global value fraction --------


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from low-key nations exceeds 0.1% of
    that group's total shipped value (TPC-H Q11): the
    HAVING-fraction-of-global-scalar shape, with the scalar kept lazy
    as a 1-row broadcast (never collected on the driver)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    val = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "leftsemi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(D2)).alias("_v"))
    )
    tot = val.agg(F.sum("_v").alias("_t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("_v") > F.col("_t") * 0.001)
        .select("l_partkey", F.col("_v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


SQL_IMPORTANT_PARTS = """
WITH val AS (
    SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS _v
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(_v AS DOUBLE) AS part_value
FROM val
WHERE _v > (SELECT sum(_v) FROM val) * 0.001
ORDER BY part_value DESC, l_partkey
"""


# --- TPC-H Q12 analogue: priority mix per ship-delay bucket --------------


def q_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical- vs low-priority line counts per ship-delay bucket
    (TPC-H Q12 with delay buckets standing in for ship modes): the
    conditional-count pivot over a derived bucketing."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "0-30d")
        .when(delay <= 60, "31-60d")
        .otherwise("61d+")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(bucket.alias("delay_bucket"), crit.alias("_crit"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("_crit"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("_crit"), 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


SQL_SHIP_DELAY_PRIORITY = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 30 THEN '0-30d'
            WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 60 THEN '31-60d'
            ELSE '61d+' END AS delay_bucket,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY delay_bucket
"""


# --- TPC-H Q16 analogue: supplier counts with NOT-IN exclusion -----------


def q_brand_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) for selected
    sizes, excluding one brand and any supplier in debt (TPC-H Q16's
    NOT-IN subquery as a broadcast anti-join feeding a
    count-distinct)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30)
    )
    debtors = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(debtors), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_BRAND_SUPPLIER_CNT = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#5'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- TPC-H Q20 analogue: dominant suppliers by part share ----------------


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than 30% of some part's total 1996
    quantity (TPC-H Q20's nested-aggregate shape): per-(part, supplier)
    quantity vs per-part total, then a semi-join back to supplier names.

    Quantities are small integers stored in doubles, so their sums are
    exact IEEE; the 30% comparison multiplies instead of divides to
    stay exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1996)
    s = load_table(spark, sf_dir, "supplier")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("_q")
    )
    tot = per.groupBy(F.col("l_partkey").alias("t_pk")).agg(
        F.sum("_q").alias("_tq")
    )
    dominant = (
        per.join(tot, F.col("l_partkey") == F.col("t_pk"))
        .filter(F.col("_q") * 10 > F.col("_tq") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


SQL_DOMINANT_SUPPLIERS = """
WITH per AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS _q
    FROM lineitem WHERE year(l_shipdate) = 1996
    GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey AS t_pk, sum(_q) AS _tq FROM per GROUP BY l_partkey)
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
    SELECT DISTINCT l_suppkey FROM per JOIN tot ON l_partkey = t_pk
    WHERE _q * 10 > _tq * 3
)
ORDER BY s_suppkey
"""


# --- TPC-H Q21 analogue: only-late supplier on multi-supplier orders -----


def q_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top suppliers that were the *only* late shipper on an order that
    involved at least two suppliers (TPC-H Q21's EXISTS / NOT-EXISTS
    pair, restated as one per-order aggregate): late = shipped more
    than 30 days after the order date.

    Scale shape: one lineitem ⋈ orders join on the order key, one
    per-order aggregate, one explode of the single late supplier —
    no self-joins of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    per_order = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("_n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("_n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("_late_supp"),
        )
    )
    credited = per_order.filter(
        (F.col("_n_supp") >= 2) & (F.col("_n_late") == 1)
    )
    return (
        credited.groupBy("_late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("_late_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(20)
    )


SQL_WAITING_ORDERS = """
WITH per_order AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS _n_supp,
           count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                               THEN l_suppkey END) AS _n_late,
           max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                    THEN l_suppkey END) AS _late_supp
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, numwait
FROM (
    SELECT _late_supp, count(*) AS numwait
    FROM per_order WHERE _n_supp >= 2 AND _n_late = 1
    GROUP BY _late_supp
)
JOIN supplier ON _late_supp = s_suppkey
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


QUERIES_COVERAGE = {
    "min_cost_supplier": q_min_cost_supplier,
    "forecast_revenue": q_forecast_revenue,
    "product_profit": q_product_profit,
    "important_parts": q_important_parts,
    "ship_delay_priority": q_ship_delay_priority,
    "brand_supplier_cnt": q_brand_supplier_cnt,
    "dominant_suppliers": q_dominant_suppliers,
    "waiting_orders": q_waiting_orders,
}

ORACLES_COVERAGE = {
    "min_cost_supplier": SQL_MIN_COST_SUPPLIER,
    "forecast_revenue": SQL_FORECAST_REVENUE,
    "product_profit": SQL_PRODUCT_PROFIT,
    "important_parts": SQL_IMPORTANT_PARTS,
    "ship_delay_priority": SQL_SHIP_DELAY_PRIORITY,
    "brand_supplier_cnt": SQL_BRAND_SUPPLIER_CNT,
    "dominant_suppliers": SQL_DOMINANT_SUPPLIERS,
    "waiting_orders": SQL_WAITING_ORDERS,
}
