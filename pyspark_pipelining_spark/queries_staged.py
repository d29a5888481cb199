"""Round-10 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-9 snapshot window already
carries this round's registrations (the former round-9 staged trio
plus ``wav_pcm_windows``), and late additions would defer pending
revalidations (CLAUDE.md: registry freeze).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into their family
modules (sketch merge → queries_mining), delete this file, and
regenerate VALIDATION.md.  The local gates exercise everything here
every pytest run (oracle compare at sf0.001, the pandas-dtype gate,
and the plan-invariant gate), so these are pytest-green now and
driver-validated next round.

- ``doclen_sketch_merge`` — the MERGEABLE form of the histogram
  quantile sketch (round-8's ``price_quantile_sketch`` calibrated the
  sketch globally; this one proves COMPOSITION): per-source partial
  bin maps fold first, a second in-plan aggregate merges the partials,
  and the merged quantile estimates are emitted side-by-side with the
  single-level global fold — bit-identical by associativity of the
  bin counts, which is exactly the property that lets 1000 executors
  (or a streaming fold, see tests/test_streaming.py) each keep a
  constant-size histogram and merge at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipelining_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# 1. Mergeable histogram quantile sketch: per-source partials → global
# ---------------------------------------------------------------------------

DOCLEN_BIN = 200  # 200-char bins


def q_doclen_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of document length (``n_chars``) from a fixed-width
    histogram sketch, twice IN ONE PLAN: (a) per-source PARTIAL bin
    maps merged by a second aggregate (the 1000-executor /
    per-partition-sketch shape), and (b) the single-level global fold.
    The two estimate sets must be bit-identical — bin counts are
    integers and integer addition is associative, which is the
    mergeability guarantee that makes the sketch a distributed/
    streaming replacement for exact quantiles.

    All rank arithmetic is integer (ceil-rank ``(p·n + 99) div 100``);
    the only double is the final bin-midpoint estimate, the same
    expression in both engines.

    Scale shape: the partial fold combines map-side on (source, bin)
    and its output is bounded by |sources| × |bins| regardless of row
    count; the merge fold runs over that bounded table.  No row-count-
    sized shuffle ever happens after the first fold."""
    docs = load_table(spark, sf_dir, "documents")
    partials = docs.groupBy(
        "source", F.expr(f"CAST(n_chars AS BIGINT) div {DOCLEN_BIN}").alias("bin")
    ).agg(F.count(F.lit(1)).alias("ni"))
    merged = partials.groupBy("bin").agg(F.sum("ni").alias("ni"))
    direct = docs.groupBy(
        F.expr(f"CAST(n_chars AS BIGINT) div {DOCLEN_BIN}").alias("bin")
    ).agg(F.count(F.lit(1)).alias("ni"))

    def estimates(bins: DataFrame, suffix: str) -> DataFrame:
        # both windows run over the BOUNDED bin table (|bins| rows, not
        # |docs|), so the single-partition global frame is benign
        w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ranked = bins.select(
            "bin",
            F.sum("ni").over(w).alias("cum"),
            F.sum("ni").over(Window.partitionBy()).alias("n"),
        )
        aggs = [F.max("n").cast("long").alias(f"n_{suffix}")] + [
            F.round(
                (
                    F.min(
                        F.when(
                            F.col("cum") >= F.expr(f"({p} * n + 99) div 100"),
                            F.col("bin"),
                        )
                    )
                    * DOCLEN_BIN
                    + DOCLEN_BIN // 2
                ).cast("double"),
                1,
            ).alias(f"p{p}_{suffix}")
            for p in (50, 90, 99)
        ]
        return ranked.agg(*aggs)

    # 1-row lazy broadcast crossJoin stitch (repo scalar convention)
    return estimates(merged, "merged").crossJoin(
        F.broadcast(estimates(direct, "direct"))
    )


SQL_DOCLEN_SKETCH_MERGE = f"""
WITH partials AS (
    SELECT source, CAST(n_chars AS BIGINT) // {DOCLEN_BIN} AS bin,
           count(*) AS ni
    FROM documents GROUP BY 1, 2
),
merged AS (SELECT bin, sum(ni) AS ni FROM partials GROUP BY bin),
direct AS (
    SELECT CAST(n_chars AS BIGINT) // {DOCLEN_BIN} AS bin, count(*) AS ni
    FROM documents GROUP BY 1
),
rm AS (
    SELECT bin,
           CAST(sum(ni) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum,
           CAST(sum(ni) OVER () AS BIGINT) AS n
    FROM merged
),
rd AS (
    SELECT bin,
           CAST(sum(ni) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum,
           CAST(sum(ni) OVER () AS BIGINT) AS n
    FROM direct
),
em AS (
    SELECT max(n) AS n_merged,
           round(CAST(min(CASE WHEN cum >= (50 * n + 99) // 100 THEN bin END)
                 * {DOCLEN_BIN} + {DOCLEN_BIN // 2} AS DOUBLE), 1) AS p50_merged,
           round(CAST(min(CASE WHEN cum >= (90 * n + 99) // 100 THEN bin END)
                 * {DOCLEN_BIN} + {DOCLEN_BIN // 2} AS DOUBLE), 1) AS p90_merged,
           round(CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END)
                 * {DOCLEN_BIN} + {DOCLEN_BIN // 2} AS DOUBLE), 1) AS p99_merged
    FROM rm
),
ed AS (
    SELECT max(n) AS n_direct,
           round(CAST(min(CASE WHEN cum >= (50 * n + 99) // 100 THEN bin END)
                 * {DOCLEN_BIN} + {DOCLEN_BIN // 2} AS DOUBLE), 1) AS p50_direct,
           round(CAST(min(CASE WHEN cum >= (90 * n + 99) // 100 THEN bin END)
                 * {DOCLEN_BIN} + {DOCLEN_BIN // 2} AS DOUBLE), 1) AS p90_direct,
           round(CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END)
                 * {DOCLEN_BIN} + {DOCLEN_BIN // 2} AS DOUBLE), 1) AS p99_direct
    FROM rd
)
SELECT CAST(n_merged AS BIGINT) AS n_merged, p50_merged, p90_merged, p99_merged,
       CAST(n_direct AS BIGINT) AS n_direct, p50_direct, p90_direct, p99_direct
FROM em CROSS JOIN ed
"""


# ---------------------------------------------------------------------------
# 2. Native session windows (F.session_window) — gap sessionization via
#    Spark's built-in streaming-compatible operator
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
    e = load_table(spark, sf_dir, "events")
    s = e.groupBy(
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
    ).orderBy("user_id", "start_us")


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


QUERIES_STAGED = {
    "doclen_sketch_merge": q_doclen_sketch_merge,
    "session_window_stats": q_session_window_stats,
}

ORACLES_STAGED = {
    "doclen_sketch_merge": SQL_DOCLEN_SKETCH_MERGE,
    "session_window_stats": SQL_SESSION_WINDOW_STATS,
}
