"""Round-8 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the r07 snapshot window already carries
15 never-validated queries (the mining family), and late registrations
would evict pending slots (CLAUDE.md: registry freeze).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into their family
modules (funnel/retention → queries_analytics, containment →
queries_llm, or a module of their own), delete this file, and
regenerate VALIDATION.md.  The local gates exercise everything here
every pytest run (oracle compare at sf0.001, the pandas-dtype gate,
and the plan-invariant gate), so these are pytest-green now and
driver-validated next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipelining_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# 1. Ordered funnel conversion (view → click → purchase)
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


# ---------------------------------------------------------------------------
# 2. Cohort retention matrix (day-0..7 return rate)
# ---------------------------------------------------------------------------


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


# ---------------------------------------------------------------------------
# 3. Exact shingle-set containment join (subset-duplicate detection)
# ---------------------------------------------------------------------------


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL ordered doc pairs with 4-gram-set containment
    ``|A ∩ B| / |A| ≥ 0.8`` (operators/dedup.prefix_containment_join)
    — the subset-duplication screen Jaccard misses when a short doc is
    quoted inside a much longer one.  Asymmetric prefix filter: only
    the contained side prunes to its rarest-first prefix; candidates
    come from prefix ⋈ postings on rare shingles, verification is
    exact and candidate-only.  The oracle is the brute-force
    all-ordered-pairs intersection — the filter must lose NOTHING."""
    from pyspark_pipelining_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_containment_join(docs, threshold=0.8, n=4).orderBy(
        "doc_inner", "doc_outer"
    )


def _sql_containment() -> str:
    from pyspark_pipelining_spark.queries_llm import SQL_FOURGRAMS

    return f"""
WITH {SQL_FOURGRAMS},
gset AS (SELECT DISTINCT doc_id, unnest(ngrams) AS g FROM grams),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM gset GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_inner, b.doc_id AS doc_outer, count(*) AS i
    FROM gset a JOIN gset b ON a.g = b.g AND a.doc_id != b.doc_id
    GROUP BY 1, 2
)
SELECT doc_inner, doc_outer, round(i / s.n_grams, 6) AS containment
FROM inter JOIN sizes s ON inter.doc_inner = s.doc_id
WHERE i / s.n_grams >= 0.8
ORDER BY doc_inner, doc_outer
"""


SQL_CONTAINMENT_PAIRS = _sql_containment()


# ---------------------------------------------------------------------------
# 4. Time-to-convert distribution (exact median / p90 lag, integer rank)
# ---------------------------------------------------------------------------


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds from first view to the first LATER purchase, per
    converting user, summarized as exact median and p90 via the
    integer order-statistic machinery (exact_median_value generalized
    to arbitrary ranks): lags quantize to whole seconds, fold to
    (lag_s, count) cells, and the quantile windows run over that
    bounded cell table — never a global sort of users.  Timestamps
    compare as unix micros (lossless: the feed is µs-exact)."""
    from pyspark.sql import Window

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


# ---------------------------------------------------------------------------
# 5. Zipf slope of the token frequency distribution
# ---------------------------------------------------------------------------

ZIPF_TOPN = 200


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of log-frequency vs log-rank over the top
    ZIPF_TOPN tokens — the Zipf exponent a corpus-health dashboard
    tracks (natural text ≈ −1; template/boilerplate-heavy corpora
    deviate).  Scale shape: the token count folds map-side, the top-N
    comes from TakeOrdered (freq desc, token asc — deterministic), and
    the regression runs over the bounded N-row table with every log
    term int64-QUANTIZED (×1e9) before summing, so both engines
    produce the identical double regardless of summation order; the
    quantized cross-products widen to decimal (they exceed int64)."""
    from pyspark.sql import Window

    from pyspark_pipelining_spark.operators.text import with_words

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        with_words(docs)
        .select(F.explode("words").alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(ZIPF_TOPN)
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    q = freq.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * 1e9)
        .cast("long")
        .alias("xq"),
        F.round(F.log(F.col("n").cast("double")) * 1e9).cast("long").alias("yq"),
    )
    agg = q.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.expr("CAST(xq AS DECIMAL(38,0)) * yq")).alias("sxy"),
        F.sum(F.expr("CAST(xq AS DECIMAL(38,0)) * xq")).alias("sxx"),
    )
    num = F.col("k") * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.col("k") * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    return agg.select(
        F.col("k").cast("long").alias("n_tokens"),
        F.round(num / den, 6).alias("zipf_slope"),
    )


def _sql_zipf() -> str:
    from pyspark_pipelining_spark.queries_llm import SQL_WORDS

    return f"""
WITH {SQL_WORDS},
tok AS (SELECT unnest(w) AS token FROM words),
freq AS (
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM tok WHERE length(token) > 0
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT {ZIPF_TOPN}
),
q AS (
    SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY n DESC, token ASC)
                              AS DOUBLE)) * 1000000000) AS BIGINT) AS xq,
           CAST(round(ln(CAST(n AS DOUBLE)) * 1000000000) AS BIGINT) AS yq
    FROM freq
),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(xq) AS BIGINT) AS sx,
           CAST(sum(yq) AS BIGINT) AS sy,
           sum(CAST(xq AS HUGEINT) * yq) AS sxy,
           sum(CAST(xq AS HUGEINT) * xq) AS sxx
    FROM q
)
SELECT k AS n_tokens,
       round((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
           AS zipf_slope
FROM agg
"""


SQL_ZIPF_SLOPE = _sql_zipf()


# ---------------------------------------------------------------------------
# 6. Dedup impact report (docs/chars removable per source)
# ---------------------------------------------------------------------------


def q_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the near-dup dedup would actually DELETE, per source: docs
    cluster by LSH → connected components (dedup_clusters), a doc is
    removed iff it is not its cluster's min-id representative
    (drop_duplicate_docs policy), and the report rolls up removed
    docs/chars and the removal fraction — the go/no-go artifact a
    corpus owner reads before a 100 TB dedup pass.  One broadcast-able
    rollup over the cluster labels; all heavy lifting is the already
    scale-shaped clustering."""
    from pyspark_pipelining_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    clusters = dedup.dedup_clusters(docs, pairs)
    labeled = docs.select("doc_id", "source", "n_chars").join(clusters, "doc_id")
    removed = (F.col("doc_id") != F.col("cluster_id")).cast("long")
    agg = labeled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(removed).cast("long").alias("n_removed"),
        F.sum(F.col("n_chars") * removed).cast("long").alias("chars_removed"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_removed",
        "chars_removed",
        F.round(F.col("n_removed") / F.col("n_docs"), 6).alias("removed_frac"),
    ).orderBy("source")


def _sql_dedup_impact(threshold: float = 0.5, num_hashes: int = 16, bands: int = 8) -> str:
    from pyspark_pipelining_spark.queries_llm import _minhash_fragments

    ctes, band_match, agree = _minhash_fragments(num_hashes, bands)
    return f"""
WITH RECURSIVE {ctes},
pairs AS (
    SELECT a.doc_id AS doc_1, b.doc_id AS doc_2
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_match})
    WHERE ({agree}) / {num_hashes}.0 >= {threshold}
),
edges AS (
    SELECT doc_1 AS src, doc_2 AS dst FROM pairs
    UNION ALL
    SELECT doc_2, doc_1 FROM pairs
),
walk(doc_id, lbl) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, w.lbl FROM edges e JOIN walk w ON e.dst = w.doc_id
),
comp AS (SELECT doc_id, min(lbl) AS cluster_id FROM walk GROUP BY doc_id),
labeled AS (
    SELECT d.source, d.n_chars,
           CASE WHEN d.doc_id != coalesce(c.cluster_id, d.doc_id)
                THEN 1 ELSE 0 END AS removed
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(removed) AS BIGINT) AS n_removed,
       CAST(sum(n_chars * removed) AS BIGINT) AS chars_removed,
       round(sum(removed) / count(*), 6) AS removed_frac
FROM labeled
GROUP BY source
ORDER BY source
"""


SQL_DEDUP_IMPACT = _sql_dedup_impact()


QUERIES_STAGED = {
    "funnel_conversion": q_funnel_conversion,
    "retention_matrix": q_retention_matrix,
    "containment_pairs": q_containment_pairs,
    "conversion_lag": q_conversion_lag,
    "zipf_slope": q_zipf_slope,
    "dedup_impact": q_dedup_impact,
}

ORACLES_STAGED = {
    "funnel_conversion": SQL_FUNNEL_CONVERSION,
    "retention_matrix": SQL_RETENTION_MATRIX,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "conversion_lag": SQL_CONVERSION_LAG,
    "zipf_slope": SQL_ZIPF_SLOPE,
    "dedup_impact": SQL_DEDUP_IMPACT,
}
