"""Round-11 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-10 snapshot window already
carries this round's registrations (the former round-10 staged
quartet), and late additions would defer pending revalidations
(CLAUDE.md: registry freeze).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into their family
modules (partition pruning → queries_coverage, hll merge →
queries_corpus), reset this file, and regenerate VALIDATION.md.  The
local gates exercise everything here every pytest run (oracle compare
at sf0.001, the pandas-dtype gate, and the plan-invariant gate), so
staged queries are pytest-green now and driver-validated next round.

- ``partition_pruned_revenue`` — the end-to-end partition-layout story
  under the hard signal (r09 verdict item 3): a date-partitioned fact
  is MATERIALIZED through the Pipeline DAG (``Stage.partition_by``,
  new this round) and read back with a predicate on the partition
  column; the scan's PartitionFilters prune directories before file
  listing (plan-asserted in tests/test_plans.py), and the oracle
  recomputes the same rows from the raw table.
- ``hll_register_merge`` — mergeable-sketch closure for HLL (r09
  verdict item 4, mirroring ``doclen_sketch_merge``'s histogram
  proof): per-source partial register tables max-merged by a second
  aggregate give the BIT-IDENTICAL cardinality estimate as the
  single-level global fold, side-by-side in one plan — max is
  associative/commutative/idempotent, which is exactly what lets 1000
  executors (or per-day streams) keep local registers and merge at
  the end.  Merge-associativity property test vs a plain-Python HLL
  model: tests/test_properties.py.
- ``png_pixel_stats`` — the first PIXEL-level image computation under
  the hard signal, completing the multimodal ladder container-sniff →
  chunk-walk → full decode: chunk walk, IDAT concatenation, zlib
  STORED-block inflation, filter-0 scanline validation, and
  per-channel byte folds (palette indices resolved through PLTE to
  true RGB) as ONE let-bound JVM expression per file,
  vs a DuckDB double-recursive-CTE decoder — matched bit-for-bit and
  cross-checked against stdlib ``zlib.decompress``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipelining_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# 1. Partition pruning end-to-end: DAG-materialized date-partitioned fact
# ---------------------------------------------------------------------------

PRUNE_YEAR = 1995


def _dag_cache_root() -> str:
    """Materialization root for DAG-produced tables (``.dag_cache`` at
    the repo root, gitignored) — derived from the package location the
    same way ``sources.registry.fixtures_dir`` is."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".dag_cache"
    )


def _input_tag(sf_dir: str) -> str:
    """Deterministic run tag for one sf input: directory basename plus
    the orders file's (mtime_ns, size) — so a regenerated testdata set
    invalidates the materialization instead of silently serving stale
    partitions (the _SUCCESS skip is existence-based)."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    try:
        st = os.stat(os.path.join(sf_dir, "orders.parquet"))
        return f"{tag}_{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        return tag


def _prune_stale_runs(output_path: str, run_id: str) -> None:
    """Best-effort removal of SUPERSEDED materializations: run dirs for
    the same sf tag whose input key no longer matches (a regenerated
    testdata set re-keys the run id, and without this the old
    partitioned copies would accumulate on disk forever).  Never
    raises — a cache janitor must not fail the query."""
    import shutil

    tag = run_id.split("_", 1)[0] + "_"
    try:
        for d in os.listdir(output_path):
            if d != run_id and d.startswith(tag):
                shutil.rmtree(os.path.join(output_path, d), ignore_errors=True)
    except OSError:
        pass


def q_partition_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order count + revenue for one year, read from a
    DATE-PARTITIONED copy of ``orders`` materialized through the
    Pipeline DAG — the first query whose driver row exercises the
    write-side partition layout AND the read-side directory pruning
    end-to-end (r09 verdict item 3; SURVEY §4 "partition facts by
    date").

    The DAG stage (``Stage.partition_by=('o_year',)``) writes
    Hive-style ``o_year=N`` directories once per input state
    (idempotent ``_SUCCESS`` skip, input-keyed run id); the read-back
    filters on the partition column, so Catalyst resolves the
    predicate at the DIRECTORY level — MEASURED at sf0.1: the layout
    produces 7 ``o_year=N`` dirs (one file each) and the pruned scan's
    executed plan carries ``PartitionFilters: [isnotnull(o_year),
    (o_year = 1995)]`` with empty DataFilters — 1 of 7 files listed
    and read, zero row-level filtering work.  The wall-clock delta at
    this scale is small (0.198 vs 0.227 s median-of-5 against the
    same aggregate over ``year(o_orderdate)`` on the raw table, which
    cannot prune because the function call defeats stats pushdown)
    because the whole table is 7 small files; the structural win is
    the file-count ratio, which at 100 TB with daily partitions is
    the difference between a year query costing one year and costing
    the whole table.

    The oracle recomputes the identical rows from the raw ``orders``
    view — same decimal(18,2) cent discipline, month cast to BIGINT on
    both sides (driver dtype gate)."""
    from pyspark_pipelining_spark.plans.dag import Pipeline, PipelineConfig

    cfg = PipelineConfig(
        sf_dir=sf_dir,
        output_path=os.path.join(_dag_cache_root(), "partitioned"),
        run_id=_input_tag(sf_dir),
    )
    _prune_stale_runs(cfg.output_path, cfg.run_id)
    pipe = Pipeline(spark, cfg)

    @pipe.stage("orders_by_year", materialize=True, partition_by=("o_year",))
    def _orders_by_year(spark, config, upstream):
        o = load_table(spark, config.sf_dir, "orders")
        return o.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderdate",
            F.year("o_orderdate").alias("o_year"),
        )

    part = pipe.run("orders_by_year")
    return (
        part.filter(F.col("o_year") == PRUNE_YEAR)
        .groupBy(F.month("o_orderdate").cast("long").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))"))
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("month")
    )


SQL_PARTITION_PRUNED_REVENUE = f"""
SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders
WHERE year(o_orderdate) = {PRUNE_YEAR}
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 2. HLL register merge parity: per-source partials vs global fold
# ---------------------------------------------------------------------------


def _global_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_pipelining_spark.operators.text import with_words

    docs = load_table(spark, sf_dir, "documents")
    return (
        with_words(docs)
        .select("source", F.explode("words").alias("token"))
        .filter(F.length("token") > 0)
        .withColumn("g", F.lit("all"))
    )


def q_hll_register_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distinct-token cardinality from HyperLogLog registers,
    twice IN ONE PLAN: (a) per-source PARTIAL register tables
    max-merged by a second aggregate (the per-partition /
    per-day-stream shape), and (b) the single-level global fold.  The
    register estimate sets must be bit-identical — ``r = max(rho)`` is
    associative, commutative, and idempotent, so any grouping of the
    input folds to the same register table; this is the merge
    guarantee that makes HLL the distinct-count workhorse at 100 TB
    (each executor keeps m=256 integer registers, the merge is one
    bounded max-groupBy) and the HLL counterpart to
    ``doclen_sketch_merge``'s histogram-bin proof (r09 verdict item 4).

    Scale shape: the partial fold combines map-side on (source,
    bucket) and its output is bounded by |sources| × m regardless of
    token count; the merge fold runs over that bounded table.  The
    direct branch is an independent single fold over the same hashed
    tokens (bounded at m rows out).  Estimates share the exact
    integer-register arithmetic of ``hll_distinct_tokens`` — the only
    floats are the final shared-numerator division (and ln in the
    small-range regime), identical in both engines."""
    from pyspark_pipelining_spark.operators.sketch import hll_estimate, hll_registers

    toks = _global_tokens(spark, sf_dir)
    partial = hll_registers(toks, "source", "token")
    merged_regs = (
        partial.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .withColumn("g", F.lit("all"))
    )
    # estimate + register count come from ONE aggregate per branch
    # (include_registers) — a separate count() branch duplicated the
    # whole token fold: measured 4 documents scans → 2 after the fix;
    # wall clock at sf0.1 is parity (the local[32] parallel slack
    # absorbed the duplicates: 1.37 → 1.31 s median-of-5) but the
    # scan/CPU work halves, which is what survives a 100× scale-up
    est_m = hll_estimate(merged_regs, "g", include_registers=True).select(
        F.col("n_regs").alias("n_regs_merged"),
        F.col("est_distinct").alias("est_merged"),
    )
    direct_regs = hll_registers(toks, "g", "token")
    est_d = hll_estimate(direct_regs, "g", include_registers=True).select(
        F.col("n_regs").alias("n_regs_direct"),
        F.col("est_distinct").alias("est_direct"),
    )
    # 1-row lazy broadcast crossJoin stitch (repo scalar convention)
    return est_m.crossJoin(F.broadcast(est_d))


def _sql_hll_register_merge() -> str:
    from pyspark_pipelining_spark.operators.sketch import HLL_M, HLL_NUM, HLL_W
    from pyspark_pipelining_spark.queries_llm import SQL_WORDS

    top = HLL_W + 1
    rho = (
        f"CASE WHEN h // {HLL_M} = 0 THEN {top} "
        f"ELSE {top} - length(bin(h // {HLL_M})) END"
    )

    def est(agg: str) -> str:
        raw = (
            f"{HLL_NUM!r} / CAST(s_present + ({HLL_M} - n_present) "
            f"* (CAST(1 AS BIGINT) << {top}) AS DOUBLE)"
        )
        return (
            f"(SELECT round(CASE WHEN {raw} <= {2.5 * HLL_M!r} AND n_present < {HLL_M} "
            f"THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST({HLL_M} - n_present AS DOUBLE)) "
            f"ELSE {raw} END, 6) FROM {agg})"
        )

    return f"""
WITH {SQL_WORDS},
toks AS (SELECT source, unnest(w) AS token FROM words),
hashed AS (
    SELECT source, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
    FROM toks WHERE length(token) > 0
),
pr AS (
    SELECT source, h % {HLL_M} AS bucket, max({rho}) AS r
    FROM hashed GROUP BY source, bucket
),
merged AS (SELECT bucket, max(r) AS r FROM pr GROUP BY bucket),
direct AS (
    SELECT h % {HLL_M} AS bucket, max({rho}) AS r
    FROM hashed GROUP BY bucket
),
am AS (
    SELECT sum(CAST(1 AS BIGINT) << ({top} - r)) AS s_present,
           count(*) AS n_present
    FROM merged
),
ad AS (
    SELECT sum(CAST(1 AS BIGINT) << ({top} - r)) AS s_present,
           count(*) AS n_present
    FROM direct
)
SELECT CAST((SELECT n_present FROM am) AS BIGINT) AS n_regs_merged,
       {est('am')} AS est_merged,
       CAST((SELECT n_present FROM ad) AS BIGINT) AS n_regs_direct,
       {est('ad')} AS est_direct
"""


SQL_HLL_REGISTER_MERGE = _sql_hll_register_merge()


# ---------------------------------------------------------------------------
# 3. PNG pixel statistics — full codec-free decode to per-channel stats
# ---------------------------------------------------------------------------

from pyspark_pipelining_spark.queries_ann_media import PNG_FIXTURE_DIR, PNG_MAX_CHUNKS
from pyspark_pipelining_spark.sources.registry import sql_str_literal


def q_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel pixel statistics (sum/min/max/mean) of REAL PNG
    files — the first PIXEL-level image computation under the hard
    signal, completing the multimodal ladder container-sniff →
    chunk-walk → full decode: the Spark side runs the whole chain
    (chunk walk → IDAT concat → zlib stored-block inflation →
    filter-0 scanline validation → per-channel byte folds) as ONE
    JVM expression per file (``operators/multimodal.png_pixel_stats``;
    see its docstring for the structural gates and the let-binding
    discipline), and the DuckDB oracle re-derives the identical
    numbers through recursive CTEs (chunk walk, stored-block walk)
    plus ``range`` unnests over the raw scanline hex — two independent
    decoders over identical committed bytes, matched bit-for-bit and
    cross-checked against stdlib ``zlib.decompress`` in unit tests."""
    from pyspark_pipelining_spark.operators.multimodal import png_pixel_stats
    from pyspark_pipelining_spark.sources.registry import load_binary_files

    files = load_binary_files(spark, PNG_FIXTURE_DIR, glob="*.png")
    return png_pixel_stats(files, max_chunks=PNG_MAX_CHUNKS).orderBy(
        "file_name", "channel"
    )


def _sql_png_pixel_stats(
    mc: int = PNG_MAX_CHUNKS,
    fixture_dir: str = PNG_FIXTURE_DIR,
    max_px: int | None = None,
    max_blocks: int | None = None,
    max_rows: int | None = None,
) -> str:
    from pyspark_pipelining_spark.operators.multimodal import (
        PNG_MAX_ROWS,
        PNG_PIXEL_MAX,
        PNG_ZLIB_MAX_BLOCKS,
    )

    mpx = PNG_PIXEL_MAX if max_px is None else int(max_px)
    mb = PNG_ZLIB_MAX_BLOCKS if max_blocks is None else int(max_blocks)
    mrows = PNG_MAX_ROWS if max_rows is None else int(max_rows)
    t = "chr(b0) || chr(b1) || chr(b2) || chr(b3)"
    return f"""
WITH RECURSIVE png AS (
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
           octet_length(content) AS n_bytes,
           hex(content) AS hx
    FROM read_blob('{sql_str_literal(fixture_dir)}/*.png')
    WHERE substring(hex(content), 1, 16) = '89504E470D0A1A0A'
),
walk AS (
    SELECT file_name, n_bytes, hx,
           CAST(8 AS BIGINT) AS nxt, CAST(-1 AS BIGINT) AS idx,
           CAST(NULL AS BIGINT) AS coff, CAST(NULL AS BIGINT) AS clen,
           CAST(NULL AS VARCHAR) AS ctype, FALSE AS done
    FROM png
    UNION ALL
    SELECT file_name, n_bytes, hx,
           nxt + 12 + len, idx + 1, nxt, len, {t}, {t} = 'IEND'
    FROM (
        SELECT *,
               CAST('0x' || substring(hx, CAST(2 * nxt + 1 AS BIGINT), 8)
                    AS BIGINT) AS len,
               CAST('0x' || substring(hx, CAST(2 * nxt + 9 AS BIGINT), 2)
                    AS INT) AS b0,
               CAST('0x' || substring(hx, CAST(2 * nxt + 11 AS BIGINT), 2)
                    AS INT) AS b1,
               CAST('0x' || substring(hx, CAST(2 * nxt + 13 AS BIGINT), 2)
                    AS INT) AS b2,
               CAST('0x' || substring(hx, CAST(2 * nxt + 15 AS BIGINT), 2)
                    AS INT) AS b3
        FROM walk
        WHERE NOT done AND nxt + 8 <= n_bytes AND idx <= {mc - 2}
    ) s
    WHERE ((b0 BETWEEN 65 AND 90) OR (b0 BETWEEN 97 AND 122))
      AND ((b1 BETWEEN 65 AND 90) OR (b1 BETWEEN 97 AND 122))
      AND ((b2 BETWEEN 65 AND 90) OR (b2 BETWEEN 97 AND 122))
      AND ((b3 BETWEEN 65 AND 90) OR (b3 BETWEEN 97 AND 122))
      AND nxt + 12 + len <= n_bytes
),
valid AS (SELECT file_name FROM walk WHERE done AND nxt = n_bytes),
chunks AS (
    SELECT w.file_name, w.idx, w.coff, w.clen, w.ctype, w.hx
    FROM walk w JOIN valid v USING (file_name) WHERE w.idx >= 0
),
ihdr AS (
    SELECT file_name,
           CAST('0x' || substring(hx, CAST(2 * (coff + 8) + 1 AS BIGINT), 8)
                AS BIGINT) AS w,
           CAST('0x' || substring(hx, CAST(2 * (coff + 12) + 1 AS BIGINT), 8)
                AS BIGINT) AS h,
           CAST('0x' || substring(hx, CAST(2 * (coff + 16) + 1 AS BIGINT), 2)
                AS INT) AS bd,
           CAST('0x' || substring(hx, CAST(2 * (coff + 17) + 1 AS BIGINT), 2)
                AS INT) AS ct,
           CAST('0x' || substring(hx, CAST(2 * (coff + 18) + 1 AS BIGINT), 2)
                AS INT) AS cm,
           CAST('0x' || substring(hx, CAST(2 * (coff + 19) + 1 AS BIGINT), 2)
                AS INT) AS fm,
           CAST('0x' || substring(hx, CAST(2 * (coff + 20) + 1 AS BIGINT), 2)
                AS INT) AS il
    FROM chunks WHERE idx = 0 AND ctype = 'IHDR' AND clen = 13
),
idat AS (
    SELECT file_name,
           string_agg(substring(hx, CAST(2 * (coff + 8) + 1 AS BIGINT),
                                CAST(2 * clen AS BIGINT)), ''
                      ORDER BY idx) AS zh
    FROM chunks WHERE ctype = 'IDAT' GROUP BY file_name
),
plte AS (
    SELECT file_name, count(*) AS n_plte, min(clen) AS plen,
           min(substring(hx, CAST(2 * (coff + 8) + 1 AS BIGINT),
                         CAST(2 * clen AS BIGINT))) AS phex
    FROM chunks WHERE ctype = 'PLTE' GROUP BY file_name
),
meta AS (
    SELECT i.file_name, i.w, i.h, i.ct,
           -- bpp = RAW bytes/pixel (palette rows carry 1 index byte);
           -- ch = OUTPUT channels (palette resolves through PLTE)
           CASE WHEN i.ct = 2 THEN 3 ELSE 1 END AS bpp,
           CASE WHEN i.ct = 0 THEN 1 ELSE 3 END AS ch,
           COALESCE(p.phex, '') AS phex, d.zh,
           length(d.zh) // 2 AS lz
    FROM ihdr i JOIN idat d USING (file_name)
    LEFT JOIN plte p USING (file_name)
    WHERE i.bd = 8 AND i.ct IN (0, 2, 3) AND i.cm = 0 AND i.fm = 0
      -- per-dimension caps BEFORE the product (progressive AND
      -- filtering): w = h = 0xFFFFFFFF from a malicious IHDR would
      -- overflow BIGINT in w*h and error instead of filtering
      AND i.w BETWEEN 1 AND {mpx} AND i.h BETWEEN 1 AND {mrows}
      AND i.w * i.h <= {mpx}
      -- palette images need exactly one well-formed PLTE to resolve
      AND (i.ct != 3 OR (p.n_plte = 1 AND p.plen % 3 = 0
                         AND p.plen BETWEEN 3 AND 768))
      AND length(d.zh) >= 22
      -- stream ceiling mirrors Spark's int32-position envelope: any
      -- longer stream cannot decode to an in-scope raw size anyway
      AND length(d.zh) <= {2 * (3 * mpx + mrows + 5 * mb + 64)}
      AND CAST('0x' || substring(d.zh, 1, 2) AS INT) % 16 = 8
      AND (CAST('0x' || substring(d.zh, 3, 2) AS INT) // 32) % 2 = 0
),
zwalk AS (
    SELECT file_name, w, h, ct, bpp, ch, phex, zh, lz,
           CAST(2 AS BIGINT) AS zoff, CAST('' AS VARCHAR) AS outh,
           CAST(0 AS BIGINT) AS zi, FALSE AS done
    FROM meta
    UNION ALL
    SELECT file_name, w, h, ct, bpp, ch, phex, zh, lz,
           zoff + 5 + blen,
           outh || substring(zh, CAST(2 * (zoff + 5) + 1 AS BIGINT),
                             CAST(2 * blen AS BIGINT)),
           zi + 1, bf = 1
    FROM (
        SELECT *,
               CAST('0x' || substring(zh, CAST(2 * zoff + 1 AS BIGINT), 2)
                    AS INT) AS bf,
               CAST('0x' || substring(zh, CAST(2 * zoff + 3 AS BIGINT), 2)
                    AS BIGINT)
               + 256 * CAST('0x' || substring(zh, CAST(2 * zoff + 5 AS BIGINT), 2)
                    AS BIGINT) AS blen,
               CAST('0x' || substring(zh, CAST(2 * zoff + 7 AS BIGINT), 2)
                    AS BIGINT)
               + 256 * CAST('0x' || substring(zh, CAST(2 * zoff + 9 AS BIGINT), 2)
                    AS BIGINT) AS nlen
        FROM zwalk
        -- zi cap mirrors Spark's {mb}-step fold
        WHERE NOT done AND zi < {mb}
    ) s
    WHERE bf IN (0, 1) AND nlen = 65535 - blen AND zoff + 5 + blen + 4 <= lz
),
rawimg AS (
    SELECT file_name, w, h, ct, bpp, ch, phex, outh
    FROM zwalk
    WHERE done AND zoff + 4 = lz AND length(outh) = 2 * h * (1 + w * bpp)
),
badfilter AS (
    SELECT DISTINCT file_name FROM (
        SELECT file_name, outh, w, bpp, unnest(range(h)) AS rr FROM rawimg
    )
    WHERE substring(outh, CAST(2 * rr * (1 + w * bpp) + 1 AS BIGINT), 2) <> '00'
),
good AS (
    SELECT * FROM rawimg
    WHERE file_name NOT IN (SELECT file_name FROM badfilter)
),
chx AS (
    SELECT file_name, w, h, ct, bpp, ch, phex, outh,
           unnest(range(ch)) AS channel
    FROM good
),
pxraw AS (
    -- the RAW sample byte per (pixel, output channel): gray/RGB read
    -- it directly; palette reads the 1-byte index (channel-invariant)
    SELECT file_name, w, h, ct, phex, channel,
           CAST('0x' || substring(outh,
                CAST(2 * ((i // w) * (1 + w * bpp) + 1 + (i % w) * bpp
                          + CASE WHEN ct = 2 THEN channel ELSE 0 END)
                     + 1 AS BIGINT), 2)
                AS BIGINT) AS rawv
    FROM (SELECT *, unnest(range(w * h)) AS i FROM chx)
),
badidx AS (
    -- an index past the palette end is a stray: the whole file drops
    SELECT DISTINCT file_name FROM pxraw
    WHERE ct = 3 AND 6 * rawv >= length(phex)
),
px AS (
    SELECT file_name, w, h, channel,
           CASE WHEN ct = 3 THEN
                TRY_CAST('0x' || substring(phex,
                     CAST(6 * rawv + 2 * channel + 1 AS BIGINT), 2)
                     AS BIGINT)
                ELSE rawv END AS v
    FROM pxraw
    WHERE file_name NOT IN (SELECT file_name FROM badidx)
)
SELECT file_name, CAST(channel AS BIGINT) AS channel,
       CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(sum(v) AS BIGINT) AS sum_val,
       CAST(min(v) AS BIGINT) AS min_val,
       CAST(max(v) AS BIGINT) AS max_val,
       round(CAST(sum(v) AS DOUBLE) / CAST(w * h AS DOUBLE), 6) AS mean_val
FROM px GROUP BY file_name, channel, w, h
ORDER BY file_name, channel
"""


SQL_PNG_PIXEL_STATS = _sql_png_pixel_stats()


QUERIES_STAGED: dict[str, QueryFn] = {
    "partition_pruned_revenue": q_partition_pruned_revenue,
    "hll_register_merge": q_hll_register_merge,
    "png_pixel_stats": q_png_pixel_stats,
}

ORACLES_STAGED: dict[str, str] = {
    "partition_pruned_revenue": SQL_PARTITION_PRUNED_REVENUE,
    "hll_register_merge": SQL_HLL_REGISTER_MERGE,
    "png_pixel_stats": SQL_PNG_PIXEL_STATS,
}
