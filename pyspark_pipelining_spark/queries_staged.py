"""Round-9 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the r08 snapshot window is already
committed (7 never-validated + the oldest greens), and late
registrations would evict pending slots (CLAUDE.md: registry freeze).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into their family
modules (sparse cosine → queries_llm, quantile sketch →
queries_mining, trend → queries_analytics), delete this file, and
regenerate VALIDATION.md.  The local gates exercise everything here
every pytest run (oracle compare at sf0.001, the pandas-dtype gate,
and the plan-invariant gate), so these are pytest-green now and
driver-validated next round.

The three queries add genuinely new capability classes:

- ``sparse_cosine_pairs`` — TF-IDF-weighted cosine similarity
  self-join over 4-gram shingles (WEIGHTED set similarity, vs the
  unweighted Jaccard / containment joins already registered).
- ``price_quantile_sketch`` — a mergeable fixed-width histogram
  quantile sketch calibrated side-by-side against exact order
  statistics (the sketch family had HLL/KMV/CMS/Bloom/bitmap but no
  quantile sketch).
- ``trend_by_segment`` — grouped OLS slope from exact integer
  sufficient statistics (per-group regression; zipf_slope regresses
  once globally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipelining_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# 1. Sparse TF-IDF cosine similarity self-join over 4-gram shingles
# ---------------------------------------------------------------------------

COS_NGRAM = 4
COS_DF_CAP = 200
COS_THRESHOLD = 0.5

_SQL_GRAM_TF = """
words AS (
    SELECT doc_id, string_split_regex(lower(text), ' +') AS w
    FROM documents
),
occs AS (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(w) - 3, 0) + 1),
                  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
                       || ' ' || w[i + 3])) AS gram
    FROM words
),
tf AS (
    SELECT doc_id, gram, count(*) AS tf FROM occs GROUP BY doc_id, gram
)"""


def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All doc pairs with TF-IDF cosine ≥ ``COS_THRESHOLD`` over
    4-gram shingles with doc_freq ≤ ``COS_DF_CAP`` — the WEIGHTED
    set-similarity join: where jaccard_prefix_pairs treats every
    shared shingle equally, here rare shingles dominate the score, so
    boilerplate-diluted near-dups that share distinctive content
    phrases still surface (and ubiquitous boilerplate contributes
    ~nothing even below the cap).

    Determinism: IDF is the ONE transcendental — ln(n_docs/df)
    int64-quantized at 1e6 (the lm_score convention), so term weights
    ``wq = tf·idf_q`` are exact integers, norms and dot products are
    exact DECIMAL(38,0) sums, and the final cosine is one
    exactly-rounded double expression both engines evaluate
    identically (÷, ×, sqrt are IEEE exactly-rounded; only ln needs
    the quantization).

    Scale shape, quantization discipline, and the df-cap candidate
    bound are documented on the operator
    (``operators/dedup.tfidf_cosine_pairs``)."""
    from pyspark_pipelining_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.tfidf_cosine_pairs(
        docs, threshold=COS_THRESHOLD, n=COS_NGRAM, df_cap=COS_DF_CAP
    ).orderBy("doc_a", "doc_b")


SQL_SPARSE_COSINE_PAIRS = f"""
WITH {_SQL_GRAM_TF},
nd AS (SELECT count(*) AS n_docs FROM documents),
vocab AS (
    SELECT gram,
           CAST(round(ln(CAST(n_docs AS DOUBLE) / doc_freq) * 1000000)
                AS BIGINT) AS idf_q
    FROM (SELECT gram, count(*) AS doc_freq FROM tf GROUP BY gram) d
    CROSS JOIN nd
    WHERE doc_freq <= {COS_DF_CAP}
),
post AS (
    SELECT doc_id, tf.gram, tf * idf_q AS wq
    FROM tf JOIN vocab ON tf.gram = vocab.gram
),
norms AS (
    SELECT doc_id, sum(CAST(wq AS DECIMAL(38,0)) * wq) AS n2
    FROM post GROUP BY doc_id
),
dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           sum(CAST(a.wq AS DECIMAL(38,0)) * b.wq) AS dot
    FROM post a JOIN post b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
cos AS (
    SELECT doc_a, doc_b,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS c
    FROM dots
    JOIN norms na ON dots.doc_a = na.doc_id
    JOIN norms nb ON dots.doc_b = nb.doc_id
    WHERE na.n2 > 0 AND nb.n2 > 0
)
SELECT doc_a, doc_b, round(c, 6) AS cosine
FROM cos WHERE c >= {COS_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# 2. Histogram quantile sketch, calibrated against exact order statistics
# ---------------------------------------------------------------------------

QSKETCH_BIN_CENTS = 10_000  # $100 bins


def q_price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of ``l_extendedprice`` per return flag, twice: the
    EXACT order statistic (conditional mins over cumulative counts on
    the distinct-cents cell table — the exact_median_value machinery)
    and a fixed-width HISTOGRAM SKETCH estimate (bin midpoint of the
    first bin whose cumulative count reaches the rank) — the
    calibration row a pipeline uses to decide whether the
    constant-size mergeable histogram is accurate enough to replace
    the exact path at scale.

    All rank arithmetic is integer (``k_p = (p·n + 99) div 100`` is
    ceil in exact int64); the only doubles are the final /100
    cent→dollar casts, identical in both engines.

    Scale shape: the sketch side is a BOUNDED aggregate — bins =
    price_domain / $100 regardless of row count, mergeable map-side —
    while the exact side's cell table is bounded by the distinct price
    domain (not the row count).  One scan feeds both via the persisted
    cell table."""
    from pyspark_pipelining_spark import cache

    li = load_table(spark, sf_dir, "lineitem")
    cells = cache.keep(
        li.groupBy(
            "l_returnflag",
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        ).agg(F.count(F.lit(1)).alias("ni"))
    )

    def ranked(df: DataFrame, val: str) -> DataFrame:
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wt = Window.partitionBy("l_returnflag")
        return df.select(
            "l_returnflag",
            val,
            F.sum("ni").over(w).alias("cum"),
            F.sum("ni").over(wt).alias("n"),
        )

    def pick(df: DataFrame, val: str, prefix: str) -> DataFrame:
        aggs = [F.max("n").alias("n")] + [
            F.min(
                F.when(F.col("cum") >= F.expr(f"({p} * n + 99) div 100"), F.col(val))
            ).alias(f"{prefix}{p}")
            for p in (50, 90, 99)
        ]
        return df.groupBy("l_returnflag").agg(*aggs)

    exact = pick(ranked(cells, "cents"), "cents", "ec")
    bins = cells.groupBy(
        "l_returnflag", F.expr(f"cents div {QSKETCH_BIN_CENTS}").alias("bin")
    ).agg(F.sum("ni").alias("ni"))
    est = pick(ranked(bins, "bin"), "bin", "eb").drop("n")
    half = QSKETCH_BIN_CENTS // 2
    out = exact.join(F.broadcast(est), "l_returnflag")
    cols = [F.col("l_returnflag"), F.col("n").cast("long").alias("n")]
    for p in (50, 90, 99):
        cols.append(F.round(F.col(f"ec{p}") / F.lit(100.0), 6).alias(f"p{p}_exact"))
        cols.append(
            F.round(
                (F.col(f"eb{p}") * QSKETCH_BIN_CENTS + half) / F.lit(100.0), 6
            ).alias(f"p{p}_est")
        )
    return out.select(*cols).orderBy("l_returnflag")


SQL_PRICE_QUANTILE_SKETCH = f"""
WITH cells AS (
    SELECT l_returnflag,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           count(*) AS ni
    FROM lineitem GROUP BY 1, 2
),
rankedc AS (
    SELECT l_returnflag, cents,
           CAST(sum(ni) OVER (PARTITION BY l_returnflag ORDER BY cents
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           CAST(sum(ni) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
    FROM cells
),
exact AS (
    SELECT l_returnflag, max(n) AS n,
           min(CASE WHEN cum >= (50 * n + 99) // 100 THEN cents END) AS ec50,
           min(CASE WHEN cum >= (90 * n + 99) // 100 THEN cents END) AS ec90,
           min(CASE WHEN cum >= (99 * n + 99) // 100 THEN cents END) AS ec99
    FROM rankedc GROUP BY l_returnflag
),
bins AS (
    SELECT l_returnflag, cents // {QSKETCH_BIN_CENTS} AS bin, sum(ni) AS ni
    FROM cells GROUP BY 1, 2
),
rankedb AS (
    SELECT l_returnflag, bin,
           CAST(sum(ni) OVER (PARTITION BY l_returnflag ORDER BY bin
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           CAST(sum(ni) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
    FROM bins
),
est AS (
    SELECT l_returnflag,
           min(CASE WHEN cum >= (50 * n + 99) // 100 THEN bin END) AS eb50,
           min(CASE WHEN cum >= (90 * n + 99) // 100 THEN bin END) AS eb90,
           min(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END) AS eb99
    FROM rankedb GROUP BY l_returnflag
)
SELECT exact.l_returnflag, CAST(n AS BIGINT) AS n,
       round(ec50 / 100.0, 6) AS p50_exact,
       round((eb50 * {QSKETCH_BIN_CENTS} + {QSKETCH_BIN_CENTS // 2}) / 100.0, 6)
           AS p50_est,
       round(ec90 / 100.0, 6) AS p90_exact,
       round((eb90 * {QSKETCH_BIN_CENTS} + {QSKETCH_BIN_CENTS // 2}) / 100.0, 6)
           AS p90_est,
       round(ec99 / 100.0, 6) AS p99_exact,
       round((eb99 * {QSKETCH_BIN_CENTS} + {QSKETCH_BIN_CENTS // 2}) / 100.0, 6)
           AS p99_est
FROM exact JOIN est ON exact.l_returnflag = est.l_returnflag
ORDER BY exact.l_returnflag
"""


# ---------------------------------------------------------------------------
# 3. Per-segment monthly revenue trend (grouped OLS slope)
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
                F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            ).alias("rev")
        )
    )
    agg = monthly.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("m").alias("sx"),
        F.sum(F.expr("CAST(rev AS DECIMAL(38,0))")).alias("sy"),
        F.sum(F.expr("CAST(m AS DECIMAL(38,0)) * rev")).alias("sxy"),
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


QUERIES_STAGED = {
    "sparse_cosine_pairs": q_sparse_cosine_pairs,
    "price_quantile_sketch": q_price_quantile_sketch,
    "trend_by_segment": q_trend_by_segment,
}

ORACLES_STAGED = {
    "sparse_cosine_pairs": SQL_SPARSE_COSINE_PAIRS,
    "price_quantile_sketch": SQL_PRICE_QUANTILE_SKETCH,
    "trend_by_segment": SQL_TREND_BY_SEGMENT,
}
