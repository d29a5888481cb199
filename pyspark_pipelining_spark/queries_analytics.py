"""Round-5 coverage additions: TPC-H-analogue relational queries the
registry did not yet exercise (EXISTS semi-joins, nation-pair
multi-hop joins, left-join count distributions, conditional promo
ratios, correlated-average filters, OR-of-ANDs scan predicates,
NOT-EXISTS anti aggregation, argmax-by-window supplier, ntile decile
cuts) plus the behavioral-analytics and corpus operators from
``operators/analytics.py`` / ``text.ngram_novelty`` /
``graph.node_jaccard``.

Conventions follow queries.py: money through decimal (exact) cast to
double only at the boundary, every computed column aliased identically
in both dialects, ORDER BY deterministic (metric + key tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipelining_spark.operators import analytics, dedup, graph
from pyspark_pipelining_spark.operators import text as text_ops
from pyspark_pipelining_spark.queries_llm import SQL_WORDS, _minhash_fragments
from pyspark_pipelining_spark.sources.registry import load_table

D2 = "decimal(18,2)"
D4 = "decimal(18,4)"
DISC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


# --- TPC-H Q4 analogue: priority counts of late-shipping orders ---------


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in 1995Q3 with at least one lineitem shipped after the
    order date, counted by priority — the EXISTS/semi-join aggregate
    (TPC-H Q4 shape; the fixture has no commitdate, so ship-after-order
    is the lateness predicate)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1995-07-01"))
        & (F.to_date("o_orderdate") < F.lit("1995-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_ORDER_PRIORITY_COUNTS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1995-07-01'
  AND CAST(o_orderdate AS DATE) < DATE '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- TPC-H Q7 analogue: nation-pair shipping volume by year -------------


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """International shipping revenue per (supplier nation, customer
    nation, year) — TPC-H Q7's multi-hop join shape: the supplier side
    and the customer side each hop through their nation dim (all
    broadcast); the only big join is lineitem ⋈ orders on the order
    key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = s.join(F.broadcast(sn), s["s_nationkey"] == sn["s_nk"]).select(
        "s_suppkey", "supp_nation"
    )
    cust = c.join(F.broadcast(cn), c["c_nationkey"] == cn["c_nk"]).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(F.sum(F.expr(DISC)).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_VOLUME_SHIPPING = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({DISC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE sn.n_name != cn.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --- TPC-H Q10 analogue: returned-item revenue per customer, top 20 -----


def q_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in 1995Q4 (TPC-H
    Q10): fact joins, decimal-exact revenue ranking with a key
    tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1995-10-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(F.expr(DISC)).alias("_rev"))
    )
    return (
        rev.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


SQL_RETURNED_REVENUE_TOPK = f"""
WITH rev AS (
    SELECT o_custkey, sum({DISC}) AS _rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1995-10-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
    GROUP BY o_custkey
)
SELECT c_custkey, c_name, CAST(_rev AS DOUBLE) AS revenue, c_acctbal, n_name
FROM rev
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY _rev DESC, c_custkey
LIMIT 20
"""


# --- TPC-H Q13 analogue: customer order-count distribution --------------


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed k orders, including k = 0 (TPC-H Q13):
    the left-outer-join count followed by a count-of-counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- TPC-H Q14 analogue: promo revenue share by month --------------------


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of 1995 revenue from PROMO-type parts, by ship month
    (TPC-H Q14): conditional decimal aggregation with one IEEE ratio at
    the boundary."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1995
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    disc = F.expr(DISC)
    agg = (
        j.groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc)).alias("_promo"),
            F.sum(disc).alias("_total"),
        )
    )
    return agg.select(
        "ship_month",
        F.coalesce(F.col("_promo"), F.lit(0)).cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        F.round(
            F.lit(100.0)
            * F.coalesce(F.col("_promo"), F.lit(0)).cast("double")
            / F.col("_total").cast("double"),
            6,
        ).alias("promo_pct"),
    ).orderBy("ship_month")


SQL_PROMO_REVENUE = f"""
WITH agg AS (
    SELECT month(l_shipdate) AS ship_month,
           sum(CASE WHEN p_type = 'PROMO' THEN {DISC} END) AS _promo,
           sum({DISC}) AS _total
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1995
    GROUP BY 1
)
SELECT CAST(ship_month AS BIGINT) AS ship_month,
       CAST(COALESCE(_promo, 0) AS DOUBLE) AS promo_revenue,
       CAST(_total AS DOUBLE) AS total_revenue,
       round(100.0 * CAST(COALESCE(_promo, 0) AS DOUBLE)
             / CAST(_total AS DOUBLE), 6) AS promo_pct
FROM agg
ORDER BY ship_month
"""


# --- TPC-H Q17 analogue: small-quantity revenue for one brand ------------

Q17_BRAND = "Brand#1"


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20%
    of the part's average quantity) of one brand moved in bulk (TPC-H
    Q17): the correlated per-part average as a self-aggregation join.
    Quantities are small integers in doubles, so their sums and the
    avg division are exact/deterministic IEEE."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    brand_li = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    thresh = brand_li.groupBy(F.col("l_partkey").alias("t_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("t")
    )
    small = brand_li.join(
        F.broadcast(thresh), F.col("l_partkey") == F.col("t_pk")
    ).filter(F.col("l_quantity") < F.col("t"))
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(D2)).cast("double") / 7.0, 6
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_SMALL_QTY_REVENUE = f"""
WITH brand_li AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = '{Q17_BRAND}'
),
thresh AS (
    SELECT l_partkey AS t_pk, 0.2 * avg(l_quantity) AS t
    FROM brand_li GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
           AS avg_yearly,
       count(*) AS n_rows
FROM brand_li JOIN thresh ON l_partkey = t_pk
WHERE l_quantity < t
"""


# --- TPC-H Q19 analogue: OR-of-ANDs discounted revenue -------------------


def q_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three brand/size/quantity bands (TPC-H Q19): the
    disjunctive predicate that exercises Catalyst's join-condition
    pushdown — each disjunct pairs part attributes with lineitem
    attributes."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 35)
        )
    )
    return j.filter(band & F.col("l_discount").between(0.02, 0.08)).agg(
        F.sum(F.expr(DISC)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_DISCOUNTED_REVENUE = f"""
SELECT CAST(sum({DISC}) AS DOUBLE) AS revenue, count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE ((p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 15)
    OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 25)
    OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 35))
  AND l_discount BETWEEN 0.02 AND 0.08
"""


# --- TPC-H Q22 analogue: wealthy customers with no orders ----------------


IDLE_CUTOFF = "2000-01-01"


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: customers whose balance beats the positive-balance
    average but who have placed no order since 2000 (TPC-H Q22 shape):
    scalar-subquery broadcast + NOT EXISTS anti-join + aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit(IDLE_CUTOFF)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(D2)).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(D2)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


SQL_IDLE_CUSTOMERS = f"""
WITH avg_bal AS (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(o_orderdate AS DATE) >= DATE '{IDLE_CUTOFF}')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --- TPC-H Q15 analogue: top supplier(s) by quarter revenue --------------


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum 1995Q1 revenue (TPC-H Q15): the
    argmax-against-global-max shape as a 1-row broadcast, comparing
    EXACT decimals (ties all surface)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1995-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1995-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(F.expr(DISC)).alias("_r"))
    mx = rev.agg(F.max("_r").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("_r") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("_r").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


SQL_TOP_SUPPLIER = f"""
WITH rev AS (
    SELECT l_suppkey, sum({DISC}) AS _r
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1995-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(_r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE _r = (SELECT max(_r) FROM rev)
ORDER BY s_suppkey
"""


# --- ntile decile cut over customer value --------------------------------


def q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles with a fully deterministic
    ordering (exact cents, key tiebreak) — the decile table every
    growth dashboard starts from.

    Scale shape (r15 verdict item 2): the decile comes from the
    two-phase exact distributed rank (``operators/rankcut``) — integer
    value histogram, bucket-prefix offsets, broadcast cut join — never
    a single-task global ``ntile`` window; ``ntile_expr`` reconstructs
    the identical bucket arithmetic from the exact row number, so the
    unchanged ntile oracle stays bit-green."""
    from pyspark_pipelining_spark.operators import rankcut

    o = load_table(spark, sf_dir, "orders")
    cents = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias("v")
    )
    # the per-customer aggregate feeds three branches (bounds, counts,
    # rank) — checkpoint once so the orders scan runs once (CLAUDE.md
    # multi-branch rule; measured 2x at sf0.1)
    cents = cents.localCheckpoint(eager=True)
    ranked = rankcut.histogram_ranks(cents, "v", "o_custkey", ascending=False)
    return (
        ranked.select(
            "o_custkey",
            "v",
            rankcut.ntile_expr(F.col("rn"), F.col("n"), 10).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("v").alias("total_cents"),
            F.min("v").alias("min_cents"),
            F.max("v").alias("max_cents"),
        )
        .orderBy("decile")
    )


SQL_CUSTOMER_VALUE_DECILES = """
WITH cents AS (
    SELECT o_custkey, sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS v
    FROM orders GROUP BY o_custkey
),
t AS (
    SELECT o_custkey, v, ntile(10) OVER (ORDER BY v DESC, o_custkey) AS decile
    FROM cents
)
SELECT decile, count(*) AS n_customers,
       CAST(sum(v) AS BIGINT) AS total_cents,
       CAST(min(v) AS BIGINT) AS min_cents, CAST(max(v) AS BIGINT) AS max_cents
FROM t GROUP BY decile ORDER BY decile
"""


# --- behavioral analytics (operators/analytics.py) -----------------------


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the event stream
    (operators/analytics.retention_cohorts)."""
    return analytics.retention_cohorts(load_table(spark, sf_dir, "events"))


SQL_RETENTION_COHORTS = """
WITH wk AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
    FROM events
),
ch AS (SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY user_id)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, wk) // 7 AS INTEGER) AS week_offset,
       count(DISTINCT user_id) AS users
FROM wk JOIN ch USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation of customers
    (operators/analytics.rfm_segments)."""
    return analytics.rfm_segments(load_table(spark, sf_dir, "orders"))


SQL_RFM_SEGMENTS = """
WITH per AS (
    SELECT o_custkey,
           max(CAST(o_orderdate AS DATE)) AS last_order,
           count(*) AS freq,
           sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS monetary
    FROM orders GROUP BY o_custkey
),
d0 AS (SELECT max(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
seg AS (
    SELECT o_custkey, monetary,
           ntile(4) OVER (ORDER BY date_diff('day', last_order, d0) ASC, o_custkey) AS r,
           ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
           ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
    FROM per, d0
)
SELECT CAST(r AS VARCHAR) || '-' || CAST(f AS VARCHAR) || '-' || CAST(m AS VARCHAR)
           AS segment,
       count(*) AS n_customers,
       CAST(sum(monetary) AS BIGINT) AS monetary_cents
FROM seg
GROUP BY 1
ORDER BY 1
"""


def q_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-weekday seasonality per event type
    (operators/analytics.seasonal_dow_index)."""
    return analytics.seasonal_dow_index(load_table(spark, sf_dir, "events"))


SQL_SEASONAL_DOW_INDEX = """
WITH per AS (
    SELECT event_type, CAST(isodow(ts) AS INTEGER) AS dow,
           count(*) AS n_events,
           sum(CAST(floor(value * 100) AS BIGINT)) AS s
    FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, sum(n_events) AS tn, sum(s) AS ts_ FROM per GROUP BY 1)
SELECT event_type, dow, CAST(n_events AS BIGINT) AS n_events,
       round(CAST(s AS DOUBLE) / n_events, 6) AS avg_cents,
       round((CAST(s AS DOUBLE) / n_events) / (CAST(ts_ AS DOUBLE) / tn), 6)
           AS seasonal_index
FROM per JOIN tot USING (event_type)
ORDER BY event_type, dow
"""


def q_cross_corr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged view→purchase daily co-movement
    (operators/analytics.cross_corr_lag)."""
    return analytics.cross_corr_lag(load_table(spark, sf_dir, "events")).filter(
        F.col("n_days") > 0
    )


SQL_CROSS_CORR_LAG = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           sum(CAST(floor(value * 100) AS BIGINT)) AS v
    FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2
),
x AS (SELECT day, v AS x FROM daily WHERE event_type = 'view'),
y AS (SELECT day AS yday, v AS y FROM daily WHERE event_type = 'purchase'),
lags AS (SELECT CAST(i AS INTEGER) AS lag FROM range(-3, 4) t(i)),
j AS (
    SELECT lag, count(*) AS n_days, sum(x * y) AS sxy, sum(x) AS sx, sum(y) AS sy
    FROM lags JOIN x ON TRUE JOIN y ON yday = day + lag
    GROUP BY lag
)
SELECT lag, n_days, CAST(n_days * sxy - sx * sy AS BIGINT) AS cov_num
FROM j
WHERE n_days > 0
ORDER BY lag
"""


# --- corpus: n-gram novelty + filter funnel -------------------------------


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of corpus-unique trigrams
    (operators/text.ngram_novelty)."""
    return text_ops.ngram_novelty(load_table(spark, sf_dir, "documents"))


SQL_NGRAM_NOVELTY = f"""
WITH {SQL_WORDS},
grams AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
               AS g
    FROM words
),
toks AS (SELECT doc_id, unnest(g) AS gram FROM grams),
gdf AS (SELECT gram, count(*) AS df FROM toks GROUP BY gram),
per AS (
    SELECT doc_id, count(*) AS n_ngrams,
           sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_unique
    FROM toks JOIN gdf USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(COALESCE(n_unique, 0) AS BIGINT) AS n_unique,
       CASE WHEN COALESCE(n_ngrams, 0) > 0
            THEN round(CAST(n_unique AS DOUBLE) / n_ngrams, 6)
            ELSE 0.0 END AS novelty
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter survivorship funnel
    (operators/analytics.filter_funnel)."""
    return analytics.filter_funnel(load_table(spark, sf_dir, "documents"))


SQL_FILTER_FUNNEL = """
WITH f AS (
    SELECT n_chars >= 200 AS c1,
           len(string_split_regex(lower(text), ' +')) >= 30 AS c2,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / length(text) >= 0.6 AS c3
    FROM documents
),
agg AS (
    SELECT count(*) AS s0,
           sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS s1,
           sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS s2,
           sum(CASE WHEN c1 AND c2 AND c3 THEN 1 ELSE 0 END) AS s3
    FROM f
)
SELECT stage_idx, stage, CAST(n_rows AS BIGINT) AS n_rows,
       round(CAST(n_rows AS DOUBLE) / s0, 6) AS pct
FROM (
    SELECT 0 AS stage_idx, 'all_docs' AS stage, s0 AS n_rows, s0 FROM agg
    UNION ALL SELECT 1, 'min_chars_200', s1, s0 FROM agg
    UNION ALL SELECT 2, 'min_words_30', s2, s0 FROM agg
    UNION ALL SELECT 3, 'alpha_ratio_60', s3, s0 FROM agg
)
ORDER BY stage_idx
"""


# --- graph: neighbor-set Jaccard over LSH candidate pairs ----------------


def q_node_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard for every LSH near-dup candidate pair
    (operators/graph.node_jaccard over the dedup_clusters edge set)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    return graph.node_jaccard(pairs)


def _sql_node_jaccard(threshold: float = 0.5, num_hashes: int = 16, bands: int = 8) -> str:
    ctes, band_match, agree = _minhash_fragments(num_hashes, bands)
    return f"""
WITH {ctes},
p AS (
    SELECT a.doc_id AS doc_1, b.doc_id AS doc_2
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_match})
    WHERE ({agree}) / {num_hashes}.0 >= {threshold}
),
edges AS (
    SELECT doc_1, doc_2 FROM p
    UNION ALL
    SELECT doc_2, doc_1 FROM p
),
deg AS (SELECT doc_1, count(*) AS deg FROM edges GROUP BY doc_1),
common AS (
    SELECT p.doc_1, p.doc_2, count(*) AS common
    FROM p
    JOIN edges ea ON ea.doc_1 = p.doc_1
    JOIN edges eb ON eb.doc_1 = p.doc_2 AND eb.doc_2 = ea.doc_2
    GROUP BY p.doc_1, p.doc_2
)
SELECT p.doc_1, p.doc_2, d1.deg AS deg_1, d2.deg AS deg_2,
       CAST(COALESCE(c.common, 0) AS BIGINT) AS common,
       round(CAST(COALESCE(c.common, 0) AS DOUBLE)
             / (d1.deg + d2.deg - COALESCE(c.common, 0)), 6) AS jaccard
FROM p
LEFT JOIN common c ON c.doc_1 = p.doc_1 AND c.doc_2 = p.doc_2
JOIN deg d1 ON d1.doc_1 = p.doc_1
JOIN deg d2 ON d2.doc_1 = p.doc_2
ORDER BY p.doc_1, p.doc_2
"""


SQL_NODE_JACCARD = _sql_node_jaccard()


# --- exact mergeable-bitmap distinct (roaring-lite) ----------------------


def q_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via mergeable 64-bit-word
    bitmaps (operators/sketch.bitmap_distinct) — the exact counterpart
    to the HLL queries: per-(type, word) OR with map-side partials,
    popcount sum at the end, intermediate state mergeable across
    partitions/days like warehouse incremental distinct-count state."""
    from pyspark_pipelining_spark.operators.sketch import bitmap_distinct

    ev = load_table(spark, sf_dir, "events")
    return bitmap_distinct(ev, "event_type", "user_id")


SQL_BITMAP_DISTINCT_USERS = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- Markov transition matrix over per-user event sequences --------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts and row-normalized
    probabilities — the sequence-mining primitive behind session
    modeling.  One lag window keyed on user (shuffle on user_id,
    deterministic (ts, event_id) tiebreak), then a 25-cell aggregate;
    the probability divides per-row, no float summation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wt = Window.partitionBy("prev_type")
    return (
        trans.withColumn("row_total", F.sum("n_transitions").over(wt))
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("row_total"), 6).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
),
trans AS (
    SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / sum(n_transitions) OVER (PARTITION BY prev_type), 6) AS prob
FROM trans
ORDER BY prev_type, next_type
"""


# --- binned two-sample Kolmogorov-Smirnov drift --------------------------

KS_BINS = 256
KS_TYPE_A = "purchase"
KS_TYPE_B = "click"


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between the value distributions of two
    event types over a fixed 256-bin grid: the ECDF gap |F1-F2| is
    exact for the binned distributions, and binning makes the shape
    scale-proof — raw events fold map-side into ≤ 256 (bin, type)
    cells, so the window that builds the cumulative ECDFs runs over a
    BOUNDED table no matter the input size (the unbinned exact KS
    would need a global sort of all distinct values).  Bin bounds are
    a lazy 1-row min/max broadcast — no driver scalar."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin([KS_TYPE_A, KS_TYPE_B])
    )
    rng = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.col("event_type"),
        F.least(
            F.floor((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * KS_BINS),
            F.lit(KS_BINS - 1),
        ).cast("long").alias("bin"),
    )
    hist = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("event_type") == KS_TYPE_A, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == KS_TYPE_B, 1).otherwise(0)).alias("c2"),
    )
    # the running-sum windows are single-partition by construction, but
    # over the BOUNDED 256-row histogram — fine at any input scale.
    # Totals are the final running sums (full-frame max), so hist has
    # exactly ONE consumer and the raw events scan runs twice total
    # (bounds + binning), not once per branch.
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ecdf = hist.select(
        "bin",
        F.sum("c1").over(w).alias("r1"),
        F.sum("c2").over(w).alias("r2"),
    ).select(
        "r1",
        "r2",
        F.max("r1").over(full).alias("n1"),
        F.max("r2").over(full).alias("n2"),
    )
    return ecdf.agg(
        F.round(F.max(F.abs(F.col("r1") / F.col("n1") - F.col("r2") / F.col("n2"))), 6).alias(
            "ks_d"
        ),
        F.max("n1").alias("n_a"),
        F.max("n2").alias("n_b"),
    )


SQL_KS_DRIFT = f"""
WITH ev AS (
    SELECT event_type, value FROM events
    WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
),
rng AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
binned AS (
    SELECT event_type,
           least(CAST(floor((value - lo) / (hi - lo) * {KS_BINS}) AS BIGINT),
                 {KS_BINS - 1}) AS bin
    FROM ev, rng
),
hist AS (
    SELECT bin,
           sum(CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END) AS c1,
           sum(CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END) AS c2
    FROM binned GROUP BY bin
),
totals AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM hist),
ecdf AS (
    SELECT sum(c1) OVER (ORDER BY bin) AS r1,
           sum(c2) OVER (ORDER BY bin) AS r2
    FROM hist
)
SELECT round(max(abs(CAST(r1 AS DOUBLE) / n1 - CAST(r2 AS DOUBLE) / n2)), 6) AS ks_d,
       CAST(max(n1) AS BIGINT) AS n_a,
       CAST(max(n2) AS BIGINT) AS n_b
FROM ecdf, totals
"""


# --- mutual information between two categoricals -------------------------


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between order priority and order
    status: one pass folds orders to the ≤ 15-cell joint table
    (map-side partials), marginals come from windows over that bounded
    table, and each cell's float term is quantized to int64 (×1e9)
    before summing so the result is independent of float summation
    order — the repo's PSI convention."""
    o = load_table(spark, sf_dir, "orders")
    joint = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("nxy")
    )
    wx = Window.partitionBy("o_orderpriority")
    wy = Window.partitionBy("o_orderstatus")
    wall = Window.partitionBy()
    cells = joint.select(
        "nxy",
        F.sum("nxy").over(wx).alias("nx"),
        F.sum("nxy").over(wy).alias("ny"),
        F.sum("nxy").over(wall).alias("n"),
    )
    term = (F.col("nxy") / F.col("n")) * F.log(
        F.col("nxy").cast("double") * F.col("n") / (F.col("nx") * F.col("ny"))
    )
    return cells.select(
        F.round(term * 1e9).cast("long").alias("tq"), "n"
    ).agg(
        (F.sum("tq").cast("double") / 1e9).alias("mi_nats"),
        F.max("n").cast("long").alias("n_orders"),
    )


SQL_MUTUAL_INFORMATION = """
WITH joint AS (
    SELECT o_orderpriority, o_orderstatus, count(*) AS nxy
    FROM orders GROUP BY o_orderpriority, o_orderstatus
),
cells AS (
    SELECT nxy,
           sum(nxy) OVER (PARTITION BY o_orderpriority) AS nx,
           sum(nxy) OVER (PARTITION BY o_orderstatus) AS ny,
           sum(nxy) OVER () AS n
    FROM joint
),
terms AS (
    SELECT CAST(round((CAST(nxy AS DOUBLE) / n)
                      * ln(CAST(nxy AS DOUBLE) * n / (CAST(nx AS DOUBLE) * ny))
                      * 1000000000) AS BIGINT) AS tq,
           n
    FROM cells
)
SELECT CAST(sum(tq) AS DOUBLE) / 1000000000.0 AS mi_nats,
       CAST(max(n) AS BIGINT) AS n_orders
FROM terms
"""


# --- market-basket pair lift ---------------------------------------------

BASKET_TOPK = 50


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part pairs by co-purchase lift: the market-basket primitive.
    The self-join keys on the ORDER (baskets are small — TPC-H orders
    hold ≤ 7 items — so per-order pair expansion is bounded), pair
    support aggregates with map-side partials, and the lift ratio uses
    integer cross-multiplication with ONE double division at the end.
    Top-k via orderBy().limit() = TakeOrdered, never a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    items = items.localCheckpoint(eager=True)  # both join sides + part counts
    tot = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    part_n = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = items.alias("a")
    b = items.select("l_orderkey", F.col("l_partkey").alias("p2")).alias("b")
    pairs = (
        a.join(b, on=[F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                      F.col("a.l_partkey") < F.col("p2")])
        .groupBy(F.col("a.l_partkey").alias("part_1"), F.col("p2").alias("part_2"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    n1 = part_n.select(F.col("l_partkey").alias("part_1"), F.col("n").alias("n1"))
    n2 = part_n.select(F.col("l_partkey").alias("part_2"), F.col("n").alias("n2"))
    return (
        pairs.join(n1, "part_1")
        .join(n2, "part_2")
        .crossJoin(F.broadcast(tot))  # lazy 1-row global scalar, no collect
        .select(
            "part_1",
            "part_2",
            "support",
            F.round(
                (F.col("support") * F.col("n_orders")).cast("double")
                / (F.col("n1") * F.col("n2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), F.desc("lift"), F.asc("part_1"), F.asc("part_2"))
        .limit(BASKET_TOPK)
    )


SQL_BASKET_PAIRS = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
part_n AS (SELECT l_partkey, count(*) AS n FROM items GROUP BY l_partkey),
pairs AS (
    SELECT a.l_partkey AS part_1, b.l_partkey AS part_2, count(*) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
SELECT part_1, part_2, CAST(support AS BIGINT) AS support,
       round(CAST(support * n_orders AS DOUBLE) / (n1.n * n2.n), 6) AS lift
FROM pairs
JOIN part_n n1 ON part_1 = n1.l_partkey
JOIN part_n n2 ON part_2 = n2.l_partkey
CROSS JOIN tot
ORDER BY support DESC, lift DESC, part_1 ASC, part_2 ASC
LIMIT {BASKET_TOPK}
"""


# --- cumulative distinct users (first-seen-day trick) --------------------


def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running unique-user counts by day — EXACTLY, without any
    distinct-over-expanding-window state: cumulative distinct at day D
    is the number of users whose FIRST day ≤ D, so one user-keyed
    min-day aggregate plus a cumulative sum over the bounded day table
    replaces the quadratic rescan (the standard warehouse rewrite).
    Only days that appear in the data are emitted."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.select(F.to_date("ts").alias("day"), "user_id").groupBy(
        "user_id"
    ).agg(F.min("day").alias("d0"))
    new_by_day = firsts.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(new_by_day, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


SQL_CUMULATIVE_DISTINCT_USERS = """
WITH firsts AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
new_by_day AS (SELECT d0 AS day, count(*) AS new_users FROM firsts GROUP BY d0),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT d.day,
       CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM days d LEFT JOIN new_by_day n ON d.day = n.day
ORDER BY d.day
"""


QUERIES_ANALYTICS = {
    "order_priority_counts": q_order_priority_counts,
    "volume_shipping": q_volume_shipping,
    "returned_revenue_topk": q_returned_revenue_topk,
    "customer_distribution": q_customer_distribution,
    "promo_revenue": q_promo_revenue,
    "small_qty_revenue": q_small_qty_revenue,
    "discounted_revenue": q_discounted_revenue,
    "idle_customers": q_idle_customers,
    "top_supplier": q_top_supplier,
    "customer_value_deciles": q_customer_value_deciles,
    "retention_cohorts": q_retention_cohorts,
    "rfm_segments": q_rfm_segments,
    "seasonal_dow_index": q_seasonal_dow_index,
    "cross_corr_lag": q_cross_corr_lag,
    "ngram_novelty": q_ngram_novelty,
    "filter_funnel": q_filter_funnel,
    "node_jaccard": q_node_jaccard,
    "bitmap_distinct_users": q_bitmap_distinct_users,
    "event_transitions": q_event_transitions,
    "ks_drift": q_ks_drift,
    "mutual_information": q_mutual_information,
    "basket_pairs": q_basket_pairs,
    "cumulative_distinct_users": q_cumulative_distinct_users,
}

ORACLES_ANALYTICS = {
    "order_priority_counts": SQL_ORDER_PRIORITY_COUNTS,
    "volume_shipping": SQL_VOLUME_SHIPPING,
    "returned_revenue_topk": SQL_RETURNED_REVENUE_TOPK,
    "customer_distribution": SQL_CUSTOMER_DISTRIBUTION,
    "promo_revenue": SQL_PROMO_REVENUE,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "discounted_revenue": SQL_DISCOUNTED_REVENUE,
    "idle_customers": SQL_IDLE_CUSTOMERS,
    "top_supplier": SQL_TOP_SUPPLIER,
    "customer_value_deciles": SQL_CUSTOMER_VALUE_DECILES,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "seasonal_dow_index": SQL_SEASONAL_DOW_INDEX,
    "cross_corr_lag": SQL_CROSS_CORR_LAG,
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "filter_funnel": SQL_FILTER_FUNNEL,
    "node_jaccard": SQL_NODE_JACCARD,
    "bitmap_distinct_users": SQL_BITMAP_DISTINCT_USERS,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "ks_drift": SQL_KS_DRIFT,
    "mutual_information": SQL_MUTUAL_INFORMATION,
    "basket_pairs": SQL_BASKET_PAIRS,
    "cumulative_distinct_users": SQL_CUMULATIVE_DISTINCT_USERS,
}


# ---------------------------------------------------------------------------
# Round-8 registrations (formerly queries_staged.py): strict-order
# funnel, retention matrix, conversion-lag quantiles
# ---------------------------------------------------------------------------


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: users whose first view precedes a click
    that precedes a purchase.  Each step is one filtered scan (type
    predicate pushed to parquet) folded to a per-user min timestamp,
    then a user-keyed join with a strict ``ts >`` range predicate —
    the chain never materializes event sequences, so step cost is
    O(step events), not O(user history), at any scale.  Step
    comparisons are pure timestamp predicates (no tiebreak needed:
    both engines evaluate the identical strict inequality)."""
    from pyspark_pipelining_spark import cache

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    # v feeds both the count branch and the next step's join (and c
    # likewise): persist each step's per-user min table so every
    # filtered events scan runs ONCE (CLAUDE.md: multi-branch inputs
    # checkpoint once); the persisted tables are one row per user
    v = cache.keep(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = cache.keep(
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    nfull = p.agg(F.count(F.lit(1)).alias("n_full_funnel"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nfull))
        .select(
            "n_view",
            "n_view_click",
            "n_full_funnel",
            F.when(
                F.col("n_view") > 0,
                F.round(F.col("n_view_click") / F.col("n_view"), 6),
            ).alias("click_rate"),
            F.when(
                F.col("n_view_click") > 0,
                F.round(F.col("n_full_funnel") / F.col("n_view_click"), 6),
            ).alias("purchase_rate"),
        )
    )


SQL_FUNNEL_CONVERSION = """
WITH v AS (
    SELECT user_id, min(ts) AS vt FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS ct
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vt
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS pt
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ct
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
agg AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel
)
SELECT n_view, n_view_click, n_full_funnel,
       CASE WHEN n_view > 0
            THEN round(n_view_click / n_view, 6) END AS click_rate,
       CASE WHEN n_view_click > 0
            THEN round(n_full_funnel / n_view_click, 6) END AS purchase_rate
FROM agg
"""


def q_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic day-N retention: users cohort by first active DAY; each
    (cohort, offset 0..7) cell counts users active that day.  The
    input folds immediately to the distinct (user, day) grid — all
    later joins and counts run on that bounded activity table, and
    since the grid is distinct, a plain count IS the distinct-user
    count (no countDistinct state).  Cohort sizes broadcast back."""
    from pyspark_pipelining_spark import cache

    ev = load_table(spark, sf_dir, "events")
    # the grid feeds cells AND (via first) the cohort sizing — persist
    # so the events scan + distinct fold runs once, not per branch
    days = cache.keep(
        ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    )
    first = cache.keep(days.groupBy("user_id").agg(F.min("day").alias("day0")))
    sized = first.groupBy("day0").agg(F.count(F.lit(1)).alias("cohort_users"))
    cells = (
        days.join(first, "user_id")
        .select("day0", F.datediff("day", F.col("day0")).alias("day_offset"))
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        .groupBy("day0", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sized), "day0")
        .select(
            F.col("day0").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "cohort_users",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_users"), 6).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


SQL_RETENTION_MATRIX = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
),
firstd AS (SELECT user_id, min(day) AS day0 FROM days GROUP BY user_id),
sized AS (
    SELECT day0, CAST(count(*) AS BIGINT) AS cohort_users
    FROM firstd GROUP BY day0
),
cells AS (
    SELECT f.day0, date_diff('day', f.day0, d.day) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM days d JOIN firstd f ON d.user_id = f.user_id
    WHERE date_diff('day', f.day0, d.day) BETWEEN 0 AND 7
    GROUP BY 1, 2
)
SELECT day0 AS cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
       cohort_users, n_active,
       round(n_active / cohort_users, 6) AS retention
FROM cells JOIN sized USING (day0)
ORDER BY cohort_day, day_offset
"""


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds from first view to the first LATER purchase, per
    converting user, summarized as exact median and p90 via the
    integer order-statistic machinery (exact_median_value generalized
    to arbitrary ranks): lags quantize to whole seconds, fold to
    (lag_s, count) cells, and the quantile windows run over that
    bounded cell table — never a global sort of users.  Timestamps
    compare as unix micros (lossless: the feed is µs-exact)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("vt"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("pt"))
        .join(v, "user_id")
        .filter(F.col("pt") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("pt").alias("pt"), F.max("vt").alias("vt"))
    )
    cells = (
        conv.select(F.expr("(pt - vt) div 1000000").alias("lag_s"))
        .groupBy("lag_s")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    w = Window.orderBy("lag_s").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    ranked = cells.select(
        "lag_s",
        F.sum("ni").over(w).alias("cum"),
        F.sum("ni").over(wt).alias("n"),
    )
    agg = ranked.agg(
        # empty conversion set: 0 converted (not NULL); the quantiles
        # stay NULL (undefined), identically in the oracle
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("n_converted"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("lag_s"))).alias("c1"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 2) div 2"), F.col("lag_s"))).alias("c2"),
        F.min(F.when(F.col("cum") >= F.expr("(9 * n + 9) div 10"), F.col("lag_s"))).alias("c90"),
    )
    return agg.select(
        "n_converted",
        F.round((F.col("c1") + F.col("c2")) / F.lit(2.0), 6).alias("median_lag_s"),
        F.col("c90").cast("double").alias("p90_lag_s"),
    )


SQL_CONVERSION_LAG = """
WITH v AS (
    SELECT user_id, min(epoch_us(ts)) AS vt FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
conv AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS pt, max(v.vt) AS vt
    FROM events e JOIN v ON e.user_id = v.user_id AND epoch_us(e.ts) > v.vt
    WHERE e.event_type = 'purchase'
    GROUP BY e.user_id
),
cells AS (
    SELECT (pt - vt) // 1000000 AS lag_s, count(*) AS ni
    FROM conv GROUP BY 1
),
ranked AS (
    SELECT lag_s,
           sum(ni) OVER (ORDER BY lag_s ROWS UNBOUNDED PRECEDING) AS cum,
           sum(ni) OVER () AS n
    FROM cells
),
agg AS (
    SELECT CAST(coalesce(max(n), 0) AS BIGINT) AS n_converted,
           min(CASE WHEN cum >= (n + 1) // 2 THEN lag_s END) AS c1,
           min(CASE WHEN cum >= (n + 2) // 2 THEN lag_s END) AS c2,
           min(CASE WHEN cum >= (9 * n + 9) // 10 THEN lag_s END) AS c90
    FROM ranked
)
SELECT n_converted,
       round((c1 + c2) / 2.0, 6) AS median_lag_s,
       CAST(c90 AS DOUBLE) AS p90_lag_s
FROM agg
"""

QUERIES_ANALYTICS["funnel_conversion"] = q_funnel_conversion
ORACLES_ANALYTICS["funnel_conversion"] = SQL_FUNNEL_CONVERSION
QUERIES_ANALYTICS["retention_matrix"] = q_retention_matrix
ORACLES_ANALYTICS["retention_matrix"] = SQL_RETENTION_MATRIX
QUERIES_ANALYTICS["conversion_lag"] = q_conversion_lag
ORACLES_ANALYTICS["conversion_lag"] = SQL_CONVERSION_LAG


# ---------------------------------------------------------------------------
# Round-9 registration (formerly queries_staged.py): per-segment monthly
# revenue trend (grouped OLS slope)
# ---------------------------------------------------------------------------


def q_trend_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope of monthly order revenue per market segment — the
    grouped-regression pattern: fold to (segment, month) revenue
    cells, then one more fold to per-segment EXACT integer sufficient
    statistics (n, Σx, Σy, Σxy, Σx²; month index ``x = 12·year +
    month`` keeps x² in easy int64 range, the x·y cross products
    widen to DECIMAL(38,0) per the gini/stats.py convention), and the
    closed-form slope is one double expression both engines evaluate
    identically over identical exact inputs.

    The monthly revenue fold itself also widens to DECIMAL(38,0)
    (round-8 ADVICE): a raw BIGINT sum would silently wrap at extreme
    scale while DuckDB's sum(BIGINT) promotes to exact HUGEINT — the
    same divergence class runs_test fixed.

    Scale shape: two-level aggregate — the month fold combines
    map-side on (segment, month), the regression fold runs over ≤
    months-per-segment rows; the customer dim broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_mktsegment",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT) AS DECIMAL(38,0))"
                )
            ).alias("rev")
        )
    )
    agg = monthly.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("m").alias("sx"),
        F.sum("rev").alias("sy"),
        # m fits decimal(6,0); (6,0)×(38,0) stays scale-0 exact under
        # Spark's precision cap, matching DuckDB's exact product
        F.sum(F.expr("CAST(m AS DECIMAL(6,0)) * rev")).alias("sxy"),
        F.sum(F.expr("CAST(m AS BIGINT) * m")).alias("sxx"),
    )
    num = F.col("n_months").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    den = F.col("n_months").cast("double") * F.col("sxx").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sx").cast("double")
    return agg.select(
        "c_mktsegment",
        F.col("n_months").cast("long").alias("n_months"),
        # a single-month segment has den = 0 (no slope defined): NULL,
        # not a 0/0 NaN — both engines guard identically
        F.when(den != 0, F.round(num / den / F.lit(100.0), 6)).alias(
            "slope_dollars_per_month"
        ),
    ).orderBy("c_mktsegment")


SQL_TREND_BY_SEGMENT = """
WITH monthly AS (
    SELECT c_mktsegment,
           12 * year(o_orderdate) + month(o_orderdate) AS m,
           sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
),
agg AS (
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_months,
           CAST(sum(m) AS BIGINT) AS sx,
           sum(CAST(rev AS DECIMAL(38,0))) AS sy,
           sum(CAST(m AS DECIMAL(38,0)) * rev) AS sxy,
           CAST(sum(CAST(m AS BIGINT) * m) AS BIGINT) AS sxx
    FROM monthly GROUP BY 1
)
SELECT c_mktsegment, n_months,
       CASE WHEN (CAST(n_months AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) != 0
            THEN round((CAST(n_months AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n_months AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / 100.0, 6) END AS slope_dollars_per_month
FROM agg
ORDER BY c_mktsegment
"""

QUERIES_ANALYTICS["trend_by_segment"] = q_trend_by_segment
ORACLES_ANALYTICS["trend_by_segment"] = SQL_TREND_BY_SEGMENT


# ---------------------------------------------------------------------------
# Round-10: native session windows + Theil–Sen robust trend
# (staged+pytest-gated in round 9, registered here per the r09 verdict)
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap sessions via Spark's NATIVE ``session_window``
    operator — the streaming-compatible twin of the registry's manual
    gaps-and-islands ``sessionize``: one groupBy, no lag window, and
    the identical plan runs under Structured Streaming with a
    watermark (stream≡batch pinned in tests/test_streaming.py).

    Boundary semantics (pinned empirically, encoded in the oracle):
    events merge while the gap is ≤ 30 min — a new session starts only
    when the inter-event gap EXCEEDS the gap parameter — and
    ``session_window.end`` is the last event time + gap.  Timestamps
    compare in unix MICROS on both engines (µs-exact feed).

    Scale shape: one shuffle on user_id and the session merge happens
    inside the aggregation operator (no per-user sort window, no lag
    self-reference); value totals fold through decimal(18,2) cast to
    double only at the boundary."""
    return session_windows_plan(load_table(spark, sf_dir, "events")).orderBy(
        "user_id", "start_us"
    )


def session_windows_plan(events: DataFrame) -> DataFrame:
    """The registered session-window plan as a pure function of the
    events DataFrame — shared verbatim between the batch surface
    (``q_session_window_stats`` above, which only adds the output
    sort) and the streaming surface: the SAME function applied to a
    ``readStream`` input is a valid Structured Streaming query
    (sort-free; session_window aggregation is streaming-native), and
    ``tests/test_streaming.py`` executes it through foreachBatch and
    asserts row identity with the registered callable — the r09
    verdict's one-plan closure."""
    s = events.groupBy(
        "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).alias("_v"),
    )
    return s.select(
        "user_id",
        F.expr("unix_micros(session_window.start)").alias("start_us"),
        F.expr("unix_micros(session_window.end)").alias("end_us"),
        "n_events",
        F.col("_v").cast("double").alias("total_value"),
    )


SQL_SESSION_WINDOW_STATS = f"""
WITH lagd AS (
    SELECT user_id, ts, event_id, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
),
flag AS (
    SELECT *, CASE WHEN prev IS NULL
                     OR ts - prev > INTERVAL {SESSION_GAP_MIN} MINUTES
                   THEN 1 ELSE 0 END AS new_s
    FROM lagd
),
sess AS (
    SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_no
    FROM flag
)
SELECT user_id,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) + {SESSION_GAP_MIN * 60 * 1_000_000} AS end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, session_no
ORDER BY user_id, start_us
"""


def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the monthly-revenue trend per market
    segment — the ROBUST twin of the registered OLS ``trend_by_segment``
    (median of all pairwise slopes instead of the least-squares fit;
    up to ~29% contaminated months cannot move it).

    Exactness: the monthly fold is the same DECIMAL(38,0) cent sum as
    the OLS query; each pairwise slope is one IEEE division of two
    exactly-represented operands (Δcents fits well inside 2⁵³ at any
    tested sf; Δmonth is a small int), so both engines compute the
    bit-identical double.  The median is taken EXPLICITLY as order
    statistics — rows ranked by (slope, month tiebreaks), ranks
    ⌈n/2⌉ and ⌊n/2⌋+1 averaged with the same sum/count/100 expression
    chain on both sides — no engine-specific quantile interpolation.

    PAIR-COUNT BOUND (do not generalize): the self-join is quadratic
    in DISTINCT x per group, and it is safe here ONLY because x is the
    calendar month — the TPC-H-ish orderdate span is ~7 years, so per
    segment the pair table tops out at C(84,2) = 3,486 rows (~17k
    across 5 segments) AT ANY ROW-COUNT SCALE; sf only fattens the
    month fold, never the join.  The same pattern over an unbounded x
    (per-user event times, say) would be |x|²/2 per group — use the
    OLS moment form (``trend_by_segment``: one pass, no join) or
    bucket x to a bounded grid first, exactly as the cosine join caps
    fanout with df_cap².

    Scale shape: the one data-sized shuffle is the month fold, which
    combines map-side and is persisted once (``cache.keep``) so the
    self-join's two branches don't each rescan orders; the broadcast
    self-join and rank window run over the bounded monthly table."""
    from pyspark_pipelining_spark import cache

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_mktsegment",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT) AS DECIMAL(38,0))"
                )
            ).alias("rev")
        )
    )
    monthly = cache.keep(monthly)
    a = monthly.alias("a")
    b = monthly.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
        & (F.col("a.m") < F.col("b.m")),
    ).select(
        F.col("a.c_mktsegment").alias("seg"),
        F.col("a.m").alias("am"),
        F.col("b.m").alias("bm"),
        (
            (F.col("b.rev") - F.col("a.rev")).cast("double")
            / (F.col("b.m") - F.col("a.m")).cast("double")
        ).alias("slope"),
    )
    wseg = Window.partitionBy("seg")
    ranked = pairs.select(
        "seg",
        "slope",
        F.row_number()
        .over(Window.partitionBy("seg").orderBy("slope", "am", "bm"))
        .alias("rn"),
        F.count(F.lit(1)).over(wseg).alias("n"),
    )
    mids = ranked.filter(
        (F.col("rn") == F.expr("(n + 1) div 2"))
        | (F.col("rn") == F.expr("(n + 2) div 2"))
    )
    return (
        mids.groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.max("n").cast("long").alias("n_pairs"),
            F.round(
                F.sum("slope") / F.count(F.lit(1)) / F.lit(100.0), 6
            ).alias("theilsen_dollars_per_month"),
        )
        .orderBy("c_mktsegment")
    )


SQL_THEILSEN_TREND = """
WITH monthly AS (
    SELECT c_mktsegment AS seg,
           year(o_orderdate) * 12 + month(o_orderdate) AS m,
           sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS DECIMAL(38,0))) AS rev
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
),
pairs AS (
    SELECT a.seg, a.m AS am, b.m AS bm,
           CAST(b.rev - a.rev AS DOUBLE) / CAST(b.m - a.m AS DOUBLE) AS slope
    FROM monthly a JOIN monthly b ON a.seg = b.seg AND a.m < b.m
),
ranked AS (
    SELECT seg, slope,
           row_number() OVER (PARTITION BY seg ORDER BY slope, am, bm) AS rn,
           count(*) OVER (PARTITION BY seg) AS n
    FROM pairs
)
SELECT seg AS c_mktsegment,
       CAST(max(n) AS BIGINT) AS n_pairs,
       round(sum(slope) / count(*) / 100.0, 6) AS theilsen_dollars_per_month
FROM ranked
WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
GROUP BY seg
ORDER BY seg
"""

QUERIES_ANALYTICS["session_window_stats"] = q_session_window_stats
ORACLES_ANALYTICS["session_window_stats"] = SQL_SESSION_WINDOW_STATS
QUERIES_ANALYTICS["theilsen_trend"] = q_theilsen_trend
ORACLES_ANALYTICS["theilsen_trend"] = SQL_THEILSEN_TREND
