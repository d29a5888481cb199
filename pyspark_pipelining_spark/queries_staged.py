"""Round-17 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-16 snapshot window already
carries this round's registrations (the former round-16 staged trio:
``decontamination_report`` + ``unimax_allocation`` → queries_corpus
beside ``decontamination_spans`` / ``mixture_sample``;
``gopher_repetition`` → queries_llm beside the text-quality family),
and late additions would defer pending revalidations (CLAUDE.md:
registry freeze).

This round's staged trio (promoted from the round-16 queue):
``ccnet_ppl_buckets`` (Wenzek et al. 2020 CCNet-style
perplexity-bucket filtering over the quantized ``lm_score``
machinery; gates in ``tests/test_ccnet.py``), ``quality_battery``
(Penedo et al. 2024 FineWeb-style heuristic battery composing the
document-level Gopher rules with the repetition composite; gates in
``tests/test_fineweb.py``), and ``sim_ivf_learned_topk`` (IVF against
the committed integer-lattice trained quantizer
``fixtures/ann/centroids.parquet``; gates in
``tests/test_ivf_learned.py``).

The formal QUEUE (``QUERIES_QUEUED`` / ``ORACLES_QUEUED`` at the
bottom) holds the round-18 candidates, built this round.

Next round: merge QUERIES_STAGED / ORACLES_STAGED into family modules
(``ccnet_ppl_buckets`` → ``queries_corpus.py`` beside ``lm_score``'s
consumers; ``quality_battery`` → ``queries_llm.py`` beside
``gopher_repetition``; ``sim_ivf_learned_topk`` →
``queries_ann_media.py`` beside the ANN ladder), move the QUEUED
dicts' entries into QUERIES_STAGED/ORACLES_STAGED (a two-line dict
move per query), reset this file, repoint the affected tests' imports,
regenerate VALIDATION.md, re-verify the plan lock (``python
tools/plan_lock.py`` — keys are query names, so a pure module move
leaves it green; regenerate with ``--write`` only if a plan actually
changed), and extend ``tools/sf01_oracle_spotcheck.py``'s SENSITIVE
list as needed.  The local gates exercise everything here — staged
AND queued — every pytest run (oracle compare at sf0.001, the
pandas-dtype gate, the plan-invariant gate, the plan-shape lock), so
queued queries are pytest-green and plan-pinned rounds before their
first driver row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipelining_spark.queries_llm import SQL_GOPHER_REPETITION
from pyspark_pipelining_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# 1. CCNet perplexity-bucket filtering (Wenzek et al. 2020; the
#    published LM-quality rung above the raw lm_score — r14 verdict
#    item 3; promoted from the round-16 queue).  Gates in
#    tests/test_ccnet.py.
# ---------------------------------------------------------------------------

CCNET_BIN_W = 2_000
CCNET_OFFSET = 10_000_000


def q_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity buckets over ``documents``
    (``operators/corpus.ccnet_ppl_buckets``): per-source thirds of the
    char-bigram LM score distribution via integer histogram cuts —
    the paper's per-language percentile filter with ``source`` as the
    language analog; ``kept`` = head+middle.  Every arithmetic step
    after the one re-quantizing division is exact integer, so the
    oracle replays bucket boundaries bit-identically."""
    from pyspark_pipelining_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents")
    return corpus.ccnet_ppl_buckets(
        docs, bin_w=CCNET_BIN_W, offset=CCNET_OFFSET
    ).orderBy("doc_id")


def _sql_ccnet_ppl_buckets() -> str:
    w, off = CCNET_BIN_W, CCNET_OFFSET
    return f"""
WITH base AS (SELECT doc_id, lower(text) AS t FROM documents),
idx AS (
    SELECT doc_id, t, unnest(generate_series(1, length(t) - 1)) AS i
    FROM base WHERE length(t) >= 2
),
toks AS (SELECT doc_id, substring(t, i, 2) AS bg FROM idx),
c2 AS (SELECT bg, count(*) AS c2 FROM toks GROUP BY bg),
c1 AS (SELECT substring(bg, 1, 1) AS ch, sum(c2) AS c1 FROM c2 GROUP BY 1),
model AS (
    SELECT bg, CAST(round((ln(c2) - ln(c1)) * 1000000) AS BIGINT) AS logp_q6
    FROM c2 JOIN c1 ON substring(bg, 1, 1) = c1.ch
),
per AS (
    SELECT doc_id, count(*) AS n_bigrams, sum(logp_q6) AS total_q6
    FROM toks JOIN model USING (bg) GROUP BY doc_id
),
scored AS (
    SELECT p.doc_id, d.source,
           CAST(round(p.total_q6 / CAST(p.n_bigrams AS DOUBLE)) AS BIGINT)
             AS score_q6
    FROM per p JOIN documents d USING (doc_id)
),
binned AS (
    SELECT doc_id, source, score_q6, (score_q6 + {off}) // {w} AS bin
    FROM scored
),
hist AS (SELECT source, bin, count(*) AS c FROM binned GROUP BY source, bin),
cum AS (
    SELECT source, bin, c,
           sum(c) OVER (PARTITION BY source ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM hist
),
tot AS (SELECT source, sum(c) AS n FROM hist GROUP BY source),
cuts AS (
    SELECT cum.source,
           min(CASE WHEN 3 * cum >= n THEN bin END) AS t1,
           min(CASE WHEN 3 * cum >= 2 * n THEN bin END) AS t2
    FROM cum JOIN tot ON cum.source = tot.source
    GROUP BY cum.source
)
SELECT b.doc_id, b.source, b.score_q6, CAST(b.bin AS BIGINT) AS bin,
       CASE WHEN b.bin <= c.t1 THEN 'tail'
            WHEN b.bin <= c.t2 THEN 'middle'
            ELSE 'head' END AS bucket,
       CAST(CASE WHEN b.bin <= c.t1 THEN 0 ELSE 1 END AS BIGINT) AS kept
FROM binned b JOIN cuts c ON b.source = c.source
ORDER BY b.doc_id
"""


SQL_CCNET_PPL_BUCKETS = _sql_ccnet_ppl_buckets()


QUERIES_STAGED: dict[str, QueryFn] = {
    "ccnet_ppl_buckets": q_ccnet_ppl_buckets,
}

ORACLES_STAGED: dict[str, str] = {
    "ccnet_ppl_buckets": SQL_CCNET_PPL_BUCKETS,
}


# ---------------------------------------------------------------------------
# 2. FineWeb-style composed heuristic battery (Penedo et al. 2024
#    composes the C4 + Gopher rule sets into per-rule flags and one
#    keep decision; this corpus is single-line so the battery composes
#    the applicable DOCUMENT-level Gopher rules with the repetition
#    composite — thresholds corpus-adapted and documented in
#    operators/text.py; promoted from the round-16 queue).
#    Oracle-paired, gates in tests/test_fineweb.py.
# ---------------------------------------------------------------------------


def q_quality_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed per-document quality battery over ``documents``
    (``operators/text.quality_battery``): exact-integer word-count /
    mean-word-length / stopword rules plus the gopher_repetition
    composite, each as its own flag, with ``kept`` = all pass —
    joined to ``source`` so per-source filter pressure reads
    directly."""
    from pyspark_pipelining_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    bat = text_ops.quality_battery(docs)
    return (
        bat.join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_words",
            "sum_word_len",
            "n_stopwords",
            "flag_word_count",
            "flag_word_len",
            "flag_stopword",
            "flag_repetition",
            "kept",
        )
        .orderBy("doc_id")
    )


def _sql_quality_battery() -> str:
    from pyspark_pipelining_spark.operators.text import (
        BATTERY_MAX_WORDS,
        BATTERY_MIN_STOPWORDS,
        BATTERY_MIN_WORDS,
        BATTERY_STOPWORDS,
        BATTERY_WORDLEN,
    )

    lo, hi = BATTERY_WORDLEN
    stop_list = ", ".join(f"'{s}'" for s in BATTERY_STOPWORDS)
    # reuse the registered gopher oracle verbatim as a subquery (minus
    # its display ORDER BY — the battery join re-sorts)
    rep = SQL_GOPHER_REPETITION.strip()
    rep = rep[: rep.rindex("ORDER BY")]
    return f"""
WITH qw AS (
    SELECT doc_id, source, string_split_regex(lower(text), ' +') AS w
    FROM documents
),
base AS (
    SELECT doc_id, source,
           CAST(len(w) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
             AS sum_word_len,
           CAST(len(list_filter(w, x -> x IN ({stop_list}))) AS BIGINT)
             AS n_stopwords
    FROM qw
),
rep AS (SELECT doc_id, flagged_repetition FROM ({rep})),
flags AS (
    SELECT b.doc_id, b.source, b.n_words, b.sum_word_len, b.n_stopwords,
           CAST(CASE WHEN b.n_words < {BATTERY_MIN_WORDS}
                       OR b.n_words > {BATTERY_MAX_WORDS}
                THEN 1 ELSE 0 END AS BIGINT) AS flag_word_count,
           CAST(CASE WHEN b.sum_word_len < {lo} * b.n_words
                       OR b.sum_word_len > {hi} * b.n_words
                THEN 1 ELSE 0 END AS BIGINT) AS flag_word_len,
           CAST(CASE WHEN b.n_stopwords < {BATTERY_MIN_STOPWORDS}
                THEN 1 ELSE 0 END AS BIGINT) AS flag_stopword,
           CAST(r.flagged_repetition AS BIGINT) AS flag_repetition
    FROM base b JOIN rep r ON b.doc_id = r.doc_id
)
SELECT *,
       CAST(CASE WHEN flag_word_count = 0 AND flag_word_len = 0
                  AND flag_stopword = 0 AND flag_repetition = 0
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM flags
ORDER BY doc_id
"""


SQL_QUALITY_BATTERY = _sql_quality_battery()

QUERIES_STAGED["quality_battery"] = q_quality_battery
ORACLES_STAGED["quality_battery"] = SQL_QUALITY_BATTERY


# ---------------------------------------------------------------------------
# 3. Learned-centroid IVF ANN (r14 verdict stretch item 7; promoted
#    from the round-16 queue): the iterative k-means trainer is not
#    SQL-expressible, so it ran ONCE (tools/gen_ann_fixtures.py) and
#    the committed integer-lattice centroid table fixtures/ann/
#    centroids.parquet is the query's input — assignment and probe
#    selection are exact int64 L2², the semantic_dedup lattice
#    convention, so the whole search pipeline carries a DuckDB oracle.
#    Gates in tests/test_ivf_learned.py.
# ---------------------------------------------------------------------------

#: must match tools/gen_ann_fixtures.py CENT_GRID (the committed
#: lattice); asserted equal in tests/test_ivf_learned.py
CENT_GRID = 1 << 20
IVF_LEARNED_NPROBE = 2


def _centroid_fixture_path() -> str:
    import os

    from pyspark_pipelining_spark.sources.registry import fixtures_dir

    return os.path.join(fixtures_dir("ann"), "centroids.parquet")


def q_sim_ivf_learned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN against the committed TRAINED coarse quantizer
    (``operators/similarity.ivf_topk_learned_q``): the scale story a
    100 TB ANN deployment actually uses — k-means centroids trained
    once on a sample, frozen, broadcast; every corpus vector assigned
    by exact int64 lattice L2²; each query probes its nprobe nearest
    cells and exact-cosine re-ranks only those vectors."""
    from pyspark_pipelining_spark.operators import similarity
    from pyspark_pipelining_spark.queries_llm import TOPK, _query_vecs

    emb = load_table(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(_centroid_fixture_path())
    return similarity.ivf_topk_learned_q(
        emb,
        _query_vecs(spark, sf_dir),
        cents,
        grid=CENT_GRID,
        k=TOPK,
        nprobe=IVF_LEARNED_NPROBE,
    )


def _sql_sim_ivf_learned_topk() -> str:
    from pyspark_pipelining_spark.queries_llm import _DOT, _NE, _NQ, N_QUERIES, TOPK
    from pyspark_pipelining_spark.sources.registry import sql_str_literal

    g = CENT_GRID
    path = sql_str_literal(_centroid_fixture_path())
    d2 = (
        "list_sum(list_transform(range(1, 65),"
        " i -> (xq[CAST(i AS INT)] - c.centroid_q[CAST(i AS INT)])"
        " * (xq[CAST(i AS INT)] - c.centroid_q[CAST(i AS INT)])))"
    )
    return f"""
WITH cents AS (SELECT cell, centroid_q FROM '{path}'),
embq AS (
    SELECT vec_id, embedding,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {g}) AS BIGINT)) AS xq
    FROM embeddings
),
corpus_d AS (
    SELECT e.vec_id, e.embedding, c.cell, {d2} AS d
    FROM embq e CROSS JOIN cents c
),
corpus AS (
    SELECT vec_id, embedding, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM corpus_d
    ) WHERE rn = 1
),
qs AS (
    SELECT vec_id AS query_id, embedding AS query_vec, xq
    FROM embq WHERE vec_id < {N_QUERIES}
),
probes_d AS (
    SELECT qs.query_id, qs.query_vec, c.cell, {d2} AS d
    FROM qs CROSS JOIN cents c
),
probes AS (
    SELECT query_id, query_vec, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d, cell) AS pr
        FROM probes_d
    ) WHERE pr <= {IVF_LEARNED_NPROBE}
),
pairs AS (
    SELECT q.query_id, e.vec_id,
           round({_DOT} / ({_NE} * {_NQ}), 6) AS cosine
    FROM corpus e JOIN probes q ON e.cell = q.cell AND e.vec_id != q.query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
    FROM pairs
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {TOPK}
"""


SQL_SIM_IVF_LEARNED_TOPK = _sql_sim_ivf_learned_topk()

QUERIES_STAGED["sim_ivf_learned_topk"] = q_sim_ivf_learned_topk
ORACLES_STAGED["sim_ivf_learned_topk"] = SQL_SIM_IVF_LEARNED_TOPK


# ---------------------------------------------------------------------------
# Round-17 staging QUEUE (1) — paragraph-granularity MinHash dedup
# (Penedo et al. 2023 RefinedWeb / Soldaini et al. 2024 Dolma run
# fuzzy dedup BELOW the document grain; repeated boilerplate
# paragraphs inside otherwise-distinct documents are invisible to the
# registered doc-level dedup_minhash).  The corpus is single-line, so
# the paragraph grain is fixed 12-word chunks (the unit swap is an
# index-source change if real newline paragraphs exist —
# operators/dedup.paragraph_chunks).  Oracle-paired; gates in
# tests/test_paragraph_dedup.py.
# ---------------------------------------------------------------------------

PARA_W = 12
#: minimum signature agreement (out of PARA_HASHES) for a candidate
#: chunk pair to count as a near-dup — 12/16 = est_jaccard 0.75
PARA_MIN_AGREE = 12
PARA_HASHES, PARA_BANDS = 16, 8
#: flag a doc when >= 3/10 of its paragraphs are near-duplicated
PARA_FLAG_NUM, PARA_FLAG_DEN = 3, 10


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document paragraph-level near-duplication pressure over
    ``documents`` (``operators/dedup.paragraph_dup_stats``): chunk
    every doc into 12-word pseudo-paragraphs, MinHash-LSH the CHUNKS
    (the registered signature/banding machinery keyed on the composite
    ``doc_id·PARA_KEY + idx`` pid), keep cross-document pairs at
    signature agreement ≥ 12/16, and roll duplicated-paragraph counts
    back to every document (clean docs appear with zeros) — joined to
    ``source`` so per-source boilerplate pressure reads directly."""
    from pyspark_pipelining_spark.operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    stats = dedup_ops.paragraph_dup_stats(
        docs,
        words_per_para=PARA_W,
        min_est_num=PARA_MIN_AGREE,
        num_hashes=PARA_HASHES,
        bands=PARA_BANDS,
        flag_num=PARA_FLAG_NUM,
        flag_den=PARA_FLAG_DEN,
    )
    return (
        stats.join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_paras",
            "n_dup_paras",
            "dup_frac",
            "flagged",
        )
        .orderBy("doc_id")
    )


def _sql_paragraph_dedup() -> str:
    from pyspark_pipelining_spark.operators.dedup import (
        MERSENNE,
        PARA_KEY,
        minhash_coeffs,
    )

    w_, key = PARA_W, PARA_KEY
    nh, bands = PARA_HASHES, PARA_BANDS
    rows = nh // bands
    coeffs = minhash_coeffs(nh)
    mins = ",\n           ".join(
        f"min((sid * {a} + {b}) % {MERSENNE}) AS h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_match = " OR ".join(
        "("
        + " AND ".join(f"a.h{j} = b.h{j}" for j in range(bd * rows, (bd + 1) * rows))
        + ")"
        for bd in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(nh)
    )
    return f"""
WITH wrds AS (
    SELECT doc_id, source, string_split_regex(lower(text), ' +') AS w
    FROM documents
),
paras AS (
    SELECT doc_id, i AS para_idx, doc_id * {key} + i AS pid,
           list_slice(w, CAST(i * {w_} + 1 AS BIGINT),
                      least(len(w), CAST(i * {w_} + {w_} AS BIGINT))) AS pw
    FROM (SELECT doc_id, w,
                 unnest(range(0, (len(w) + {w_} - 1) // {w_})) AS i
          FROM wrds)
),
pgrams AS (
    SELECT pid,
           list_transform(range(1, greatest(len(pw) - 1, 0) + 1),
                          i -> pw[CAST(i AS INT)] || ' ' || pw[CAST(i AS INT) + 1])
             AS ngrams
    FROM paras
),
shing AS (SELECT DISTINCT pid, unnest(ngrams) AS shingle FROM pgrams),
ds AS (
    SELECT pid,
           ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MERSENNE} AS sid
    FROM shing
),
sig AS (
    SELECT pid,
           {mins}
    FROM ds GROUP BY pid
),
dup_pairs AS (
    SELECT a.pid AS p1, b.pid AS p2
    FROM sig a JOIN sig b
      ON a.pid < b.pid AND a.pid // {key} != b.pid // {key}
     AND ({band_match})
    WHERE ({agree}) >= {PARA_MIN_AGREE}
),
dups AS (
    SELECT pid // {key} AS doc_id, count(*) AS n_dup_paras
    FROM (SELECT p1 AS pid FROM dup_pairs
          UNION SELECT p2 FROM dup_pairs)
    GROUP BY 1
),
tot AS (SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY doc_id)
SELECT d.doc_id, d.source,
       CAST(coalesce(t.n_paras, 0) AS BIGINT) AS n_paras,
       CAST(coalesce(u.n_dup_paras, 0) AS BIGINT) AS n_dup_paras,
       CASE WHEN coalesce(t.n_paras, 0) > 0
            THEN round(coalesce(u.n_dup_paras, 0) / CAST(t.n_paras AS DOUBLE), 6)
            ELSE 0.0 END AS dup_frac,
       CAST(CASE WHEN coalesce(t.n_paras, 0) > 0
                  AND coalesce(u.n_dup_paras, 0) * {PARA_FLAG_DEN}
                      >= {PARA_FLAG_NUM} * coalesce(t.n_paras, 0)
            THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM documents d
LEFT JOIN tot t ON d.doc_id = t.doc_id
LEFT JOIN dups u ON d.doc_id = u.doc_id
ORDER BY d.doc_id
"""


SQL_PARAGRAPH_DEDUP = _sql_paragraph_dedup()


# ---------------------------------------------------------------------------
# Round-17 staging QUEUE (2) — DCLM / fastText-style model-based
# quality filter (Li et al. 2024 "DataComp-LM" filters with a fastText
# classifier; Joulin et al. 2016 fastText is LINEAR over hashed
# n-gram bags, so the FROZEN model — trained once offline by
# tools/gen_fasttext_fixture.py, int64-quantized, committed as
# fixtures/fasttext/weights.parquet — replays bit-identically in SQL,
# the sim_ivf_learned_topk trainer/scorer split).  Oracle-paired;
# gates in tests/test_fasttext.py.
# ---------------------------------------------------------------------------


def _fasttext_fixture_path() -> str:
    import os

    from pyspark_pipelining_spark.sources.registry import fixtures_dir

    return os.path.join(fixtures_dir("fasttext"), "weights.parquet")


def q_fasttext_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scores over ``documents``
    (``operators/text.linear_quality_score``): every doc scored by the
    committed frozen linear hashed-bigram classifier — exact int64
    weight sums, ``kept`` = sign of the mean score as an integer
    comparison, ``score_q6`` the one correctly-rounded division —
    joined to ``source``/``lang`` so keep-rate by slice reads
    directly."""
    from pyspark_pipelining_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    weights = spark.read.parquet(_fasttext_fixture_path())
    scored = text_ops.linear_quality_score(docs, weights)
    return (
        scored.join(docs.select("doc_id", "source", "lang"), "doc_id")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_grams",
            "sum_q6",
            "score_q6",
            "kept",
        )
        .orderBy("doc_id")
    )


def _sql_fasttext_quality() -> str:
    from pyspark_pipelining_spark.operators.text import FASTTEXT_BUCKETS
    from pyspark_pipelining_spark.sources.registry import sql_str_literal

    b = FASTTEXT_BUCKETS
    path = sql_str_literal(_fasttext_fixture_path())
    return f"""
WITH wt AS (SELECT bucket, w_q6 FROM '{path}'),
bias AS (SELECT w_q6 AS bias_q6 FROM wt WHERE bucket = -1),
wrds AS (
    SELECT doc_id, string_split_regex(lower(text), ' +') AS w
    FROM documents
),
grams AS (
    SELECT doc_id,
           ('0x' || substr(md5(g), 1, 15))::BIGINT % {b} AS bucket
    FROM (
        SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS g
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
              FROM wrds WHERE len(w) >= 2)
    )
),
per AS (
    SELECT doc_id, count(*) AS n_grams, sum(w_q6) AS sum_q6
    FROM grams JOIN wt USING (bucket)
    GROUP BY doc_id
)
SELECT d.doc_id, d.source, d.lang,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.sum_q6, 0) AS BIGINT) AS sum_q6,
       CAST(CASE WHEN coalesce(p.n_grams, 0) > 0
            THEN CAST(round((coalesce(p.sum_q6, 0)
                             + bias.bias_q6 * p.n_grams)
                            / CAST(p.n_grams AS DOUBLE)) AS BIGINT)
            ELSE 0 END AS BIGINT) AS score_q6,
       CAST(CASE WHEN coalesce(p.n_grams, 0) > 0
                  AND coalesce(p.sum_q6, 0) + bias.bias_q6 * p.n_grams > 0
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM documents d
LEFT JOIN per p ON d.doc_id = p.doc_id
CROSS JOIN bias
ORDER BY d.doc_id
"""


SQL_FASTTEXT_QUALITY = _sql_fasttext_quality()


# ---------------------------------------------------------------------------
# The QUEUE, formalized: built + oracle-paired + gate-covered queries
# that are NOT driver-exposed yet (they enter QUERIES_STAGED at the
# next reset, then register a round later).  Every local gate treats
# these exactly like staged queries — sf0.001 oracle compare, the
# pandas-dtype gate, the plan invariants, AND the plan-shape lock —
# so a queued query's plan is pinned rounds before its first driver
# row, and promotion is a two-line dict move.  Refilled this round
# with the round-18 candidates.
# ---------------------------------------------------------------------------

QUERIES_QUEUED: dict[str, QueryFn] = {
    "paragraph_dedup": q_paragraph_dedup,
    "fasttext_quality": q_fasttext_quality,
}

ORACLES_QUEUED: dict[str, str] = {
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "fasttext_quality": SQL_FASTTEXT_QUALITY,
}

assert not set(QUERIES_QUEUED) & set(QUERIES_STAGED)
