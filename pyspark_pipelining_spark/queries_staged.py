"""Round-10 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-9 snapshot window already
carries this round's registrations (the former round-9 staged trio
plus ``wav_pcm_windows``), and late additions would defer pending
revalidations (CLAUDE.md: registry freeze).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into their family
modules (sketch merge → queries_mining, session windows →
queries_analytics or queries_mining, png chunks → queries_ann_media,
theilsen → queries_analytics), delete this file, and regenerate
VALIDATION.md.  The local gates exercise everything here every pytest
run (oracle compare at sf0.001, the pandas-dtype gate, and the
plan-invariant gate), so these are pytest-green now and
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
- ``png_chunks`` — the second codec-free multimodal compute under the
  hard signal: a VARIABLE-OFFSET chunk walk over real PNG bytes
  (``wav_pcm_windows`` parsed a fixed-layout header; a PNG's chunk
  table only exists by iterating offset += 12 + length), Spark side a
  bounded ``aggregate`` HOF state machine, DuckDB side a recursive
  CTE — independent formulations of the same walk.
- ``theilsen_trend`` — the ROBUST twin of the registered
  ``trend_by_segment`` OLS slope: Theil–Sen median-of-pairwise-slopes
  per market segment, the quadratic pair join confined to the
  calendar-bounded monthly table.
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


# ---------------------------------------------------------------------------
# 3. PNG chunk walk — variable-offset multimodal compute (codec-free)
# ---------------------------------------------------------------------------

#: Committed deterministic PNG fixtures (tools/gen_png_fixtures.py) —
#: path derived via the shared sources.registry.fixtures_dir helper
#: (same convention as queries_ann_media.WAV_FIXTURE_DIR) so the
#: oracle SQL below carries the right absolute path wherever the repo
#: sits.
from pyspark_pipelining_spark.sources.registry import fixtures_dir as _fixtures_dir

PNG_FIXTURE_DIR = _fixtures_dir("images")

PNG_MAX_CHUNKS = 64


def q_png_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk inventory (type, length, offset, stored CRC) of REAL
    PNG files read as raw bytes through the binaryFile source — the
    second multimodal query doing byte-level COMPUTE under the hard
    signal, and the first whose parse is a variable-offset walk: chunk
    N's position is a function of every prior chunk's length, so the
    Spark plan is a bounded ``aggregate`` HOF state machine
    (``operators/multimodal.png_chunk_walk``) and the DuckDB oracle is
    a recursive CTE — two independent formulations of the same walk
    over identical committed bytes (``tools/gen_png_fixtures.py``,
    hand-built stored-deflate, no compressor involved).

    Both sides enforce the same clean-termination contract (signature,
    in-bounds chunks, letters-only types, IEND within the chunk cap,
    final offset exactly at EOF) so strays FILTER identically."""
    from pyspark_pipelining_spark.operators.multimodal import png_chunk_walk
    from pyspark_pipelining_spark.sources.registry import load_binary_files

    files = load_binary_files(spark, PNG_FIXTURE_DIR, glob="*.png")
    return png_chunk_walk(files, max_chunks=PNG_MAX_CHUNKS).orderBy(
        "file_name", "idx"
    )


def _sql_png_chunks(mc: int = PNG_MAX_CHUNKS) -> str:
    t = "chr(b0) || chr(b1) || chr(b2) || chr(b3)"
    return f"""
WITH RECURSIVE png AS (
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
           octet_length(content) AS n_bytes,
           hex(content) AS h
    FROM read_blob('{PNG_FIXTURE_DIR}/*.png')
    WHERE substring(hex(content), 1, 16) = '89504E470D0A1A0A'
),
walk AS (
    SELECT file_name, n_bytes, h,
           CAST(8 AS BIGINT) AS nxt, CAST(-1 AS BIGINT) AS idx,
           CAST(NULL AS BIGINT) AS coff, CAST(NULL AS BIGINT) AS clen,
           CAST(NULL AS VARCHAR) AS ctype, CAST(NULL AS BIGINT) AS crc,
           FALSE AS done
    FROM png
    UNION ALL
    SELECT file_name, n_bytes, h,
           nxt + 12 + len, idx + 1,
           nxt, len,
           {t},
           CAST('0x' || substring(h, CAST(2 * (nxt + 8 + len) + 1 AS BIGINT), 8)
                AS BIGINT),
           {t} = 'IEND'
    FROM (
        SELECT *,
               CAST('0x' || substring(h, CAST(2 * nxt + 1 AS BIGINT), 8)
                    AS BIGINT) AS len,
               CAST('0x' || substring(h, CAST(2 * nxt + 9 AS BIGINT), 2)
                    AS INT) AS b0,
               CAST('0x' || substring(h, CAST(2 * nxt + 11 AS BIGINT), 2)
                    AS INT) AS b1,
               CAST('0x' || substring(h, CAST(2 * nxt + 13 AS BIGINT), 2)
                    AS INT) AS b2,
               CAST('0x' || substring(h, CAST(2 * nxt + 15 AS BIGINT), 2)
                    AS INT) AS b3
        FROM walk
        -- idx cap mirrors Spark's {mc}-step fold: the {mc}-th chunk
        -- (idx {mc - 1}) may still be appended, never one more
        WHERE NOT done AND nxt + 8 <= n_bytes AND idx <= {mc - 2}
    ) s
    WHERE ((b0 BETWEEN 65 AND 90) OR (b0 BETWEEN 97 AND 122))
      AND ((b1 BETWEEN 65 AND 90) OR (b1 BETWEEN 97 AND 122))
      AND ((b2 BETWEEN 65 AND 90) OR (b2 BETWEEN 97 AND 122))
      AND ((b3 BETWEEN 65 AND 90) OR (b3 BETWEEN 97 AND 122))
      AND nxt + 12 + len <= n_bytes
),
valid AS (
    SELECT file_name FROM walk WHERE done AND nxt = n_bytes
)
SELECT w.file_name, w.idx, w.coff AS off, w.ctype, w.clen, w.crc
FROM walk w JOIN valid v USING (file_name)
WHERE w.idx >= 0
ORDER BY file_name, idx
"""


SQL_PNG_CHUNKS = _sql_png_chunks()


# ---------------------------------------------------------------------------
# 4. Theil–Sen robust trend — median of pairwise slopes per segment
# ---------------------------------------------------------------------------


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

    Scale shape: the pair join is quadratic ONLY in the calendar —
    monthly is |segments|×|months| regardless of row count, so the
    self-join (broadcast, m-ordered predicate) and the rank window run
    over a few-thousand-row bounded table; the one data-sized shuffle
    is the month fold, which combines map-side and is persisted once
    (``cache.keep``) so the self-join's two branches don't each rescan
    orders."""
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


QUERIES_STAGED = {
    "doclen_sketch_merge": q_doclen_sketch_merge,
    "session_window_stats": q_session_window_stats,
    "png_chunks": q_png_chunks,
    "theilsen_trend": q_theilsen_trend,
}

ORACLES_STAGED = {
    "doclen_sketch_merge": SQL_DOCLEN_SKETCH_MERGE,
    "session_window_stats": SQL_SESSION_WINDOW_STATS,
    "png_chunks": SQL_PNG_CHUNKS,
    "theilsen_trend": SQL_THEILSEN_TREND,
}
