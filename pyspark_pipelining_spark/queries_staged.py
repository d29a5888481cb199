"""Round-13 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-12 snapshot window already
carries this round's registrations (the former round-12 staged
quartet: ``cms_merge_parity`` → queries_corpus,
``dpp_top_year_revenue`` → queries_coverage,
``png_filter_pixel_stats`` and ``wav_window_features`` →
queries_ann_media), and late additions would defer pending
revalidations (CLAUDE.md: registry freeze).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into their family
modules (``kmv_merge_parity`` → queries_corpus beside its three
merge-law siblings ``hll_register_merge`` / ``cms_merge_parity`` /
the KMV queries; ``wav_stereo_features`` and ``sim_sq8_rerank`` →
queries_ann_media beside ``wav_window_features`` and the BQ pair),
reset this file, repoint the moved queries' tests (the streaming
one-plan test imports ``_kmv_source_hashes`` from here — move it with
its query; the stereo/SQ8 tests import fixture dirs and constants),
regenerate VALIDATION.md, and re-verify the plan lock (``python
tools/plan_lock.py`` — keys are query names, so a pure module move
leaves it green; regenerate with ``--write`` only if a plan actually
changed).  The local gates exercise everything
here every pytest run (oracle compare at sf0.001, the pandas-dtype
gate, and the plan-invariant gate), so staged queries are
pytest-green now and driver-validated next round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipelining_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# 1. KMV merge parity: union-then-retain-k-smallest vs the global k-min set
# ---------------------------------------------------------------------------

KMVP_K = 16


def _kmv_source_hashes(docs: DataFrame) -> DataFrame:
    """Pure plan: distinct ``(source, h)`` token hashes from a
    documents frame — the md5-derived 60-bit hash shared with
    ``operators/sketch.kmv_distinct`` and, verbatim, with the
    streaming one-plan test (``tests/test_streaming.py``), which
    drives it per micro-batch: registered surface ≡ per-batch
    surface."""
    from pyspark_pipelining_spark.operators.text import with_words

    toks = (
        with_words(docs)
        .select("source", F.explode("words").alias("token"))
        .filter(F.length("token") > 0)
    )
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("long")
    return toks.select("source", h.alias("h")).distinct()


def _kmv_rank_topk(hashes: DataFrame, k: int) -> DataFrame:
    """k smallest distinct hashes with their rank: ``orderBy().limit()``
    compiles to TakeOrderedAndProject (per-partition top-k, driver
    merge of k candidates per partition — never a global sort), and
    the rank window runs AFTER the limit, over ≤ k rows (benign
    single-partition window, repo convention)."""
    from pyspark.sql import Window

    topk = hashes.select("h").distinct().orderBy("h").limit(k)
    w = Window.orderBy("h")
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def q_kmv_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV merge-parity proof, completing the mergeable-sketch merge-law
    QUARTET (histogram bins ADD r10, HLL registers MAX r11, CMS
    counters ADD r12 — r11 verdict item 4): per-source PARTIAL k-min
    sets, merged by union-then-retain-k-smallest, must equal the
    single-level global k-min set BIT-IDENTICALLY — hash by hash, rank
    by rank, and through the density estimate both sets imply.

    KMV's merge law is different from all three siblings: an
    ORDER-STATISTICS TRUNCATION, not a pointwise fold.  It is
    idempotent like HLL's max (re-merging the same partial is a no-op
    — re-delivery safe), but NOT pointwise: a hash present in one
    partial and absent from another is normal (each source truncates
    its own view), and mid-stream partial merges can disagree with
    each other — the guarantee is only that the k smallest of the
    UNION equal the global k smallest, because every global survivor
    is among the k smallest of whichever source saw it, so no
    truncation step can ever discard it.

    In one plan: (a) the set-level proof — merged and direct ranked
    sets full-outer-joined on rank, emitting ``h_merged`` /
    ``h_direct`` per rank plus the mismatch count
    (``n_set_mismatch``, must be 0); (b) the consumer-level proof —
    ``est_merged`` = ``est_direct`` (the shared (k−1)·2⁶⁰/h₍ₖ₎
    estimator, 6dp), next to the exact distinct count
    (``n_distinct_exact``) the estimate approximates.

    Scale shape: ONE ``documents`` scan — the distinct (source, h)
    table is ``localCheckpoint``-ed and every branch (per-source
    partials, global k-min, exact count) folds it; the per-source
    rank window is bounded by per-source vocabulary (the registered
    ``kmv_distinct_tokens`` shape); both k-min extractions are
    TakeOrderedAndProject (never a single-partition sort of the
    vocabulary); the merge input is ≤ k·|sources| candidate rows.
    Hashes are exact int64 end-to-end; the only float is the final
    estimate division, identical in both engines."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    hashed = _kmv_source_hashes(docs).localCheckpoint(eager=True)
    # per-source partial k-min sets (bounded per-source windows)
    w_src = Window.partitionBy("source").orderBy("h")
    partials = (
        hashed.withColumn("_rn", F.row_number().over(w_src))
        .filter(F.col("_rn") <= KMVP_K)
        .select("h")
    )
    merged = _kmv_rank_topk(partials, KMVP_K)
    direct = _kmv_rank_topk(hashed, KMVP_K)

    def est(ranked: DataFrame, name: str) -> DataFrame:
        n = F.count(F.lit(1))
        kth = F.max(F.when(F.col("rank") == KMVP_K, F.col("h")))
        e = F.when(n < KMVP_K, n.cast("double")).otherwise(
            F.lit(float((KMVP_K - 1) * (1 << 60))) / kth.cast("double")
        )
        return ranked.agg(F.round(e, 6).alias(name))

    nd = hashed.select("h").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_exact")
    )
    joined = merged.withColumnRenamed("h", "h_merged").join(
        direct.withColumnRenamed("h", "h_direct"), on="rank", how="full_outer"
    )
    mism = joined.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.coalesce("h_merged", F.lit(-1))
                    != F.coalesce("h_direct", F.lit(-1)),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_set_mismatch")
    )
    return (
        joined
        # 1-row lazy broadcast crossJoin stitches (repo scalar convention)
        .crossJoin(F.broadcast(mism))
        .crossJoin(F.broadcast(est(merged, "est_merged")))
        .crossJoin(F.broadcast(est(direct, "est_direct")))
        .crossJoin(F.broadcast(nd))
        .select(
            "rank",
            "h_merged",
            "h_direct",
            "n_set_mismatch",
            "est_merged",
            "est_direct",
            "n_distinct_exact",
        )
        .orderBy("rank")
    )


def _sql_kmv_merge_parity() -> str:
    from pyspark_pipelining_spark.queries_llm import SQL_WORDS

    k = KMVP_K
    num = f"{float(k - 1)!r} * {1 << 60}"
    return f"""
WITH {SQL_WORDS},
tok AS (SELECT source, unnest(w) AS token FROM words),
hashed AS (
    SELECT DISTINCT source,
           ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
    FROM tok WHERE length(token) > 0
),
partials AS (
    SELECT source, h FROM hashed
    QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= {k}
),
mtop AS (SELECT DISTINCT h FROM partials ORDER BY h LIMIT {k}),
mr AS (SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rank FROM mtop),
duniq AS (SELECT DISTINCT h FROM hashed),
dtop AS (SELECT h FROM duniq ORDER BY h LIMIT {k}),
dr AS (SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rank FROM dtop),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct_exact FROM duniq),
joined AS (
    SELECT COALESCE(m.rank, d.rank) AS rank, m.h AS h_merged, d.h AS h_direct
    FROM mr m FULL OUTER JOIN dr d ON m.rank = d.rank
),
mism AS (
    SELECT CAST(coalesce(sum(CASE WHEN COALESCE(h_merged, -1)
                                       <> COALESCE(h_direct, -1)
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_set_mismatch
    FROM joined
),
em AS (
    SELECT CASE WHEN count(*) < {k} THEN round(CAST(count(*) AS DOUBLE), 6)
                ELSE round({num} / max(CASE WHEN rank = {k} THEN h END), 6)
           END AS est_merged
    FROM mr
),
ed AS (
    SELECT CASE WHEN count(*) < {k} THEN round(CAST(count(*) AS DOUBLE), 6)
                ELSE round({num} / max(CASE WHEN rank = {k} THEN h END), 6)
           END AS est_direct
    FROM dr
)
SELECT j.rank, j.h_merged, j.h_direct, mism.n_set_mismatch,
       em.est_merged, ed.est_direct, nd.n_distinct_exact
FROM joined j
CROSS JOIN mism CROSS JOIN em CROSS JOIN ed CROSS JOIN nd
ORDER BY rank
"""


SQL_KMV_MERGE_PARITY = _sql_kmv_merge_parity()


# ---------------------------------------------------------------------------
# 2. Stereo WAV window features: per-channel ZCR/ac1 from interleaved frames
# ---------------------------------------------------------------------------

from pyspark_pipelining_spark.sources.registry import (  # noqa: E402
    fixtures_dir as _fixtures_dir,
)
from pyspark_pipelining_spark.sources.registry import sql_str_literal  # noqa: E402

WAV_STEREO_FIXTURE_DIR = _fixtures_dir("audio_stereo")
WAV_STEREO_WINDOW = 256


def q_wav_stereo_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``wav_window_features`` for interleaved STEREO PCM16 (r11
    verdict item 8, stretch — real media lakes are mostly stereo):
    one decode front half (``_wav_window_chunks(n_channels=2)``, a
    window's chunk carries its interleaved bytes once), a
    per-(window, channel) fold reading samples at stride 2, and
    ``channel`` as an output column — over its OWN committed fixture
    lake (``fixtures/audio_stereo/``: L-triangle/R-noise,
    ramp/negated-ramp, a mono stray the channels==2 gate must FILTER,
    and a trailing-partial-frame file both engines truncate
    identically).

    All feature semantics and exactness contracts are the mono twin's,
    per channel (exact int64 sums, ONE double division per feature,
    NULL-seeded ``prev`` so pairs never span a window — nor a channel:
    each fold sees only its own channel's samples).  The DuckDB oracle
    is fully independent: hex-pair stride-2 decode + ``lag() OVER
    (PARTITION BY file_name, win, channel ORDER BY j)`` + GROUP BY."""
    from pyspark_pipelining_spark.operators.multimodal import wav_stereo_features
    from pyspark_pipelining_spark.sources.registry import load_binary_files

    files = load_binary_files(spark, WAV_STEREO_FIXTURE_DIR, glob="*.wav")
    return wav_stereo_features(files, window_samples=WAV_STEREO_WINDOW).orderBy(
        "file_name", "win", "channel"
    )


def _sql_wav_stereo_features() -> str:
    from pyspark_pipelining_spark.operators.multimodal import (
        WAV_HEX_SAFE_FILE_BYTES,
        WAV_INT32_SAFE_DATA_BYTES,
    )

    ws = WAV_STEREO_WINDOW
    cap = min(WAV_INT32_SAFE_DATA_BYTES + 44, WAV_HEX_SAFE_FILE_BYTES)
    u = (
        "CAST('0x' || substring(chunk, 8 * j + 4 * channel + 3, 2)"
        " || substring(chunk, 8 * j + 4 * channel + 1, 2) AS BIGINT)"
    )
    # header/window CTEs mirror SQL_WAV_WINDOW_FEATURES with the
    # channels=2 gate and FRAME accounting (data_bytes // 4; a
    # trailing partial frame truncates); the per-channel fanout is an
    # unnest over [0, 1] and the feature pairs come from lag() OVER
    # the per-(window, channel) sample order, so pairs never span a
    # window NOR a channel — matching the Spark fold's scope.
    return f"""
WITH wav AS (
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
           octet_length(content) AS n_bytes,
           hex(content) AS h
    FROM read_blob('{sql_str_literal(WAV_STEREO_FIXTURE_DIR)}/*.wav')
    WHERE octet_length(content) <= {cap}
),
hdr AS (
    SELECT file_name, n_bytes, h,
           CAST('0x' || substring(h, 43, 2) || substring(h, 41, 2) AS INT)
               AS audio_fmt,
           CAST('0x' || substring(h, 47, 2) || substring(h, 45, 2) AS INT)
               AS channels,
           CAST('0x' || substring(h, 55, 2) || substring(h, 53, 2)
                || substring(h, 51, 2) || substring(h, 49, 2) AS INT)
               AS sample_rate,
           CAST('0x' || substring(h, 71, 2) || substring(h, 69, 2) AS INT)
               AS bits,
           CAST('0x' || substring(h, 87, 2) || substring(h, 85, 2)
                || substring(h, 83, 2) || substring(h, 81, 2) AS BIGINT)
               AS data_bytes
    FROM wav
    WHERE substring(h, 1, 8) = '52494646'
      AND substring(h, 17, 8) = '57415645'
      AND substring(h, 25, 8) = '666D7420'
      AND substring(h, 73, 8) = '64617461'
),
wins AS (
    SELECT file_name, sample_rate, data_bytes // 4 AS n_total, h,
           unnest(range(0, (data_bytes // 4 - 1) // {ws} + 1)) AS win
    FROM hdr
    WHERE audio_fmt = 1 AND channels = 2 AND bits = 16
      AND data_bytes >= 4 AND data_bytes <= n_bytes - 44
),
chunks AS (
    SELECT file_name, sample_rate, win,
           least({ws}, n_total - win * {ws}) AS n_samples,
           substring(h, CAST(89 + win * {8 * ws} AS BIGINT),
                     CAST(8 * least({ws}, n_total - win * {ws}) AS BIGINT))
               AS chunk
    FROM wins
),
chans AS (
    SELECT file_name, sample_rate, win, n_samples, chunk,
           unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS channel
    FROM chunks
),
samp AS (
    SELECT file_name, sample_rate, win, channel, n_samples, chunk,
           unnest(range(0, n_samples)) AS j
    FROM chans
),
vals AS (
    SELECT file_name, sample_rate, win, channel, n_samples, j,
           {u} - CASE WHEN {u} >= 32768 THEN 65536 ELSE 0 END AS v
    FROM samp
),
pairs AS (
    SELECT file_name, sample_rate, win, channel, n_samples, v,
           lag(v) OVER (PARTITION BY file_name, win, channel ORDER BY j) AS vp
    FROM vals
)
SELECT file_name, CAST(win AS BIGINT) AS win,
       CAST(channel AS BIGINT) AS channel,
       CAST(sample_rate AS INT) AS sample_rate,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       round(sqrt(CAST(sum(v * v) AS DOUBLE) / n_samples), 6) AS rms,
       CAST(sum(CASE WHEN vp * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zc,
       round(CAST(sum(CASE WHEN vp * v < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / greatest(n_samples - 1, 1), 6) AS zcr,
       round(CASE WHEN sum(v * v) > 0
                  THEN CAST(sum(coalesce(vp, 0) * v) AS DOUBLE)
                       / CAST(sum(v * v) AS DOUBLE)
                  ELSE 0.0 END, 6) AS ac1
FROM pairs
GROUP BY file_name, win, channel, sample_rate, n_samples
ORDER BY file_name, win, channel
"""


SQL_WAV_STEREO_FEATURES = _sql_wav_stereo_features()


# ---------------------------------------------------------------------------
# 3. SQ8 ANN: scalar-quantized integer-dot shortlist + exact cosine rerank
# ---------------------------------------------------------------------------

SQ8_N_QUERIES = 3
SQ8_TOPK = 5
SQ8_SHORTLIST = 50
SQ8_DIM = 64


def q_sim_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization ANN (the FAISS ``SQ8`` / vector-store
    "scalar quantization" mode) — the missing precision rung in the
    ANN ladder between binary quantization (1 bit/dim,
    ``sim_bq_rerank``) and product quantization (trained codebooks,
    ``sim_pq_topk``): per-dim affine int8 codes against a
    corpus-calibrated min/max, a SYMMETRIC centered integer-dot
    shortlist, exact cosine re-scoring of the survivors
    (:func:`operators.similarity.sq8_rerank_topk`).  Complements the
    registered ``embedding_sq8`` audit (r09), which quantizes each
    vector against its OWN min/max to report code health — search
    needs the CORPUS-calibrated per-dimension bounds here, or two
    vectors' codes are not comparable.

    Cross-engine exactness: codes use ``floor``, not ``round`` (IEEE
    floor is bit-deterministic; half-way round ties break differently
    across engines), and the shortlist score ``Σ (c−128)(q−128)`` is
    exact int64 — so shortlist AND final ranking are bit-identical in
    DuckDB, no tolerance anywhere.  Scale shape: calibration is one
    dim-keyed map-side aggregate broadcast as a 1-row frame; the
    shortlist scan carries dim-byte codes, never float vectors;
    re-rank touches full floats for |q|·shortlist rows only."""
    from pyspark_pipelining_spark.operators.similarity import sq8_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < SQ8_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sq8_rerank_topk(
        emb, qv, k=SQ8_TOPK, shortlist=SQ8_SHORTLIST, dim=SQ8_DIM
    )


def _sql_sim_sq8_rerank() -> str:
    d = SQ8_DIM

    def code(vec: str) -> str:
        return (
            f"list_transform(range({d}), i -> CASE"
            f" WHEN s.mxs[i + 1] > s.mins[i + 1] THEN"
            f" least(255, CAST(floor((CAST({vec}[i + 1] AS DOUBLE) - s.mins[i + 1])"
            f" * 256.0 / (s.mxs[i + 1] - s.mins[i + 1])) AS BIGINT))"
            f" ELSE 0 END)"
        )

    dot = (
        "list_dot_product(CAST(e.embedding AS DOUBLE[]),"
        " CAST(q.query_vec AS DOUBLE[]))"
    )
    ne = (
        "sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),"
        " CAST(e.embedding AS DOUBLE[])))"
    )
    nq = (
        "sqrt(list_dot_product(CAST(q.query_vec AS DOUBLE[]),"
        " CAST(q.query_vec AS DOUBLE[])))"
    )
    return f"""
WITH dims AS (
    SELECT t.i,
           min(CAST(embedding[t.i + 1] AS DOUBLE)) AS mn,
           max(CAST(embedding[t.i + 1] AS DOUBLE)) AS mx
    FROM embeddings, range({d}) t(i)
    GROUP BY t.i
),
stats AS (SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS mxs FROM dims),
corpus AS (
    SELECT vec_id, {code('embedding')} AS sq
    FROM embeddings CROSS JOIN stats s
),
qc AS (
    SELECT vec_id AS query_id, {code('embedding')} AS qsq
    FROM embeddings CROSS JOIN stats s
    WHERE vec_id < {SQ8_N_QUERIES}
),
short AS (
    SELECT qc.query_id, c.vec_id
    FROM corpus c, qc WHERE c.vec_id != qc.query_id
    QUALIFY row_number() OVER (
        PARTITION BY qc.query_id
        ORDER BY list_sum(list_transform(range({d}),
                          i -> (c.sq[i + 1] - 128) * (qc.qsq[i + 1] - 128))) DESC,
                 c.vec_id ASC) <= {SQ8_SHORTLIST}
),
q AS (
    SELECT vec_id AS query_id, embedding AS query_vec
    FROM embeddings WHERE vec_id < {SQ8_N_QUERIES}
),
rer AS (
    SELECT s.query_id, s.vec_id, round({dot} / ({ne} * {nq}), 6) AS cosine
    FROM short s
    JOIN embeddings e ON s.vec_id = e.vec_id
    JOIN q ON s.query_id = q.query_id
)
SELECT query_id, vec_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
FROM rer
QUALIFY rank <= {SQ8_TOPK}
ORDER BY query_id, rank
"""


SQL_SIM_SQ8_RERANK = _sql_sim_sq8_rerank()


QUERIES_STAGED: dict[str, QueryFn] = {
    "kmv_merge_parity": q_kmv_merge_parity,
    "wav_stereo_features": q_wav_stereo_features,
    "sim_sq8_rerank": q_sim_sq8_rerank,
}

ORACLES_STAGED: dict[str, str] = {
    "kmv_merge_parity": SQL_KMV_MERGE_PARITY,
    "wav_stereo_features": SQL_WAV_STEREO_FEATURES,
    "sim_sq8_rerank": SQL_SIM_SQ8_RERANK,
}


# ---------------------------------------------------------------------------
# Round-13 staging QUEUE — two queries over the exact-substring span
# operator (cross-doc + self-repeat), ready and fully gated (oracle
# compare at three sfs, plan shape in both join regimes, hypothesis
# model, hostile layout — tests/test_substring_spans.py, 16 tests) but
# kept OUT of QUERIES_STAGED until the current trio registers,
# honoring the <=3-staged cadence (r11 verdict item 7).  At round-13
# start: move the trio to family modules, promote this pair into the
# dicts, and add them to tools/sf01_oracle_spotcheck.py's SENSITIVE
# list (their sf0.1 oracle parity is already verified, recorded in
# README).
# ---------------------------------------------------------------------------

SPAN_GRAM_LEN = 16
SPAN_MIN = 32
SPAN_MAX_OCC = 1024


def q_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup (Lee et al. 2022 semantics) as
    diagonal islands over positional md5 grams —
    ``operators/dedup.exact_substring_spans``.  Complements the
    doc-level MinHash/SimHash families: it finds verbatim repeated
    PASSAGES inside otherwise-distinct documents."""
    from pyspark_pipelining_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_substring_spans(
        docs,
        gram_len=SPAN_GRAM_LEN,
        min_span=SPAN_MIN,
        max_gram_occurrences=SPAN_MAX_OCC,
        # one small parquet file = one scan partition; spread the gram
        # stage across the session (operator docstring: leave None on
        # a real multi-file lake)
        spread=spark.sparkContext.defaultParallelism,
    ).orderBy("doc_a", "doc_b", "start_a", "start_b")


def _sql_exact_substring_spans() -> str:
    # generate_series spine bounded at 1024 (committed corpus max doc
    # length is 577; the WHERE keeps positions in-document), the
    # chunk_overlap oracle pattern.  Island key: pa minus its rank
    # within the (pair, diagonal) group — identical window on both
    # engines; every output column BIGINT.
    return f"""
WITH grams AS (
  SELECT doc_id AS doc, CAST(g.i AS BIGINT) AS pos,
         ('0x' || substr(md5(substring(text, CAST(g.i AS INT), {SPAN_GRAM_LEN})), 1, 15))::BIGINT AS h
  FROM documents, generate_series(1, 1024) AS g(i)
  WHERE g.i <= length(text) - {SPAN_GRAM_LEN} + 1
),
kept AS (
  SELECT * FROM grams
  WHERE h NOT IN (SELECT h FROM grams GROUP BY h HAVING count(*) > {SPAN_MAX_OCC})
),
pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, a.pos AS pa, b.pos AS pb
  FROM kept a JOIN kept b USING (h)
  WHERE a.doc < b.doc
),
isl AS (
  SELECT doc_a, doc_b, pa - pb AS diag, pa, pb,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS k
  FROM pairs
)
SELECT doc_a, doc_b,
       CAST(min(pa) AS BIGINT) AS start_a,
       CAST(min(pb) AS BIGINT) AS start_b,
       CAST(count(*) + {SPAN_GRAM_LEN} - 1 AS BIGINT) AS span_len
FROM isl
GROUP BY doc_a, doc_b, diag, k
HAVING count(*) + {SPAN_GRAM_LEN} - 1 >= {SPAN_MIN}
ORDER BY doc_a, doc_b, start_a, start_b
"""


SQL_EXACT_SUBSTRING_SPANS = _sql_exact_substring_spans()


SELF_GRAM_LEN = 12
SELF_MIN = 16


def q_self_repeat_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRA-document exact repeat spans (``scope="self"``): the "same
    passage pasted twice" quality signal that
    ``corpus.collapse_repeats`` (adjacent lines only) cannot see.  The
    self scope joins on ``(doc, h)`` — a 100 TB self scan never pairs
    documents at all, so fanout is bounded by within-document gram
    repetition and the join parallelizes per document.  Smaller gram
    (12) and threshold (16) than the cross-doc query: intra-doc
    repeats in this corpus are short template phrases (max 24
    chars)."""
    from pyspark_pipelining_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.exact_substring_spans(
            docs,
            gram_len=SELF_GRAM_LEN,
            min_span=SELF_MIN,
            max_gram_occurrences=SPAN_MAX_OCC,
            spread=spark.sparkContext.defaultParallelism,
            scope="self",
        )
        .select(
            F.col("doc_a").alias("doc_id"), "start_a", "start_b", "span_len"
        )
        .orderBy("doc_id", "start_a", "start_b")
    )


def _sql_self_repeat_spans() -> str:
    return f"""
WITH grams AS (
  SELECT doc_id AS doc, CAST(g.i AS BIGINT) AS pos,
         ('0x' || substr(md5(substring(text, CAST(g.i AS INT), {SELF_GRAM_LEN})), 1, 15))::BIGINT AS h
  FROM documents, generate_series(1, 1024) AS g(i)
  WHERE g.i <= length(text) - {SELF_GRAM_LEN} + 1
),
kept AS (
  SELECT * FROM grams
  WHERE h NOT IN (SELECT h FROM grams GROUP BY h HAVING count(*) > {SPAN_MAX_OCC})
),
pairs AS (
  SELECT a.doc, a.pos AS pa, b.pos AS pb
  FROM kept a JOIN kept b USING (doc, h)
  WHERE a.pos > b.pos
),
isl AS (
  SELECT doc, pa - pb AS diag, pa,
         pa - row_number() OVER (PARTITION BY doc, pa - pb ORDER BY pa) AS k
  FROM pairs
)
SELECT doc AS doc_id,
       CAST(min(pa) AS BIGINT) AS start_a,
       CAST(min(pa) - diag AS BIGINT) AS start_b,
       CAST(count(*) + {SELF_GRAM_LEN} - 1 AS BIGINT) AS span_len
FROM isl
GROUP BY doc, diag, k
HAVING count(*) + {SELF_GRAM_LEN} - 1 >= {SELF_MIN}
ORDER BY doc_id, start_a, start_b
"""


SQL_SELF_REPEAT_SPANS = _sql_self_repeat_spans()
