"""Round-14 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-13 snapshot window already
carries this round's registrations (the former round-13 staged trio:
``kmv_merge_parity`` → queries_corpus beside its three merge-law
siblings, ``wav_stereo_features`` and ``sim_sq8_rerank`` →
queries_ann_media), and late additions would defer pending
revalidations (CLAUDE.md: registry freeze).

This round's staged trio: the exact-substring SPAN pair, promoted from
the round-12 queue (cross-document verbatim passages and intra-document
self-repeats over ``operators/dedup.exact_substring_spans`` — Lee et
al. 2022 semantics as diagonal gram islands; gates in
``tests/test_substring_spans.py``), plus ``semantic_dedup`` (SemDeDup
cluster-bounded cosine collapse over the embedding space — r12 verdict
item 4; gates in ``tests/test_semantic_dedup.py``).  One further query
is QUEUED below the dicts: ``decontamination_spans`` (r12 verdict
item 5; gates in ``tests/test_decontamination.py``), held out to honor
the ≤3-staged cadence.

Next round: merge QUERIES_STAGED / ORACLES_STAGED into family modules
(the span pair and ``semantic_dedup`` → ``queries_llm.py`` beside the
dedup ladder), promote ``decontamination_spans`` into the dicts
(→ eventually ``queries_corpus.py`` beside ``contamination``), reset
this file, repoint the span/semantic/decon tests' imports, regenerate
VALIDATION.md, re-verify the plan lock (``python tools/plan_lock.py``
— keys are query names, so a pure module move leaves it green;
regenerate with ``--write`` only if a plan actually changed), and add
``decontamination_spans`` to ``tools/sf01_oracle_spotcheck.py``'s
SENSITIVE list.  The local gates exercise everything here every pytest
run (oracle compare at sf0.001, the pandas-dtype gate, and the
plan-invariant gate), so staged queries are pytest-green now and
driver-validated next round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipelining_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# 1. Cross-document exact-substring spans (Lee et al. 2022 dedup semantics)
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


def _sql_span_grams(gram_len: int) -> str:
    """Shared oracle CTE pair: per-document position spine derived from
    each document's OWN length (``unnest(range(...))`` — never a
    hard-coded bound, so corpus growth can't silently truncate the
    oracle; r12 ADVICE), then the positional 60-bit md5 gram hash, the
    same portable hash the Spark operator uses."""
    return f"""grams AS (
  SELECT doc, CAST(i AS BIGINT) AS pos,
         ('0x' || substr(md5(substring(text, CAST(i AS INT), {gram_len})), 1, 15))::BIGINT AS h
  FROM (
    SELECT doc_id AS doc, text,
           unnest(range(1, length(text) - {gram_len} + 2)) AS i
    FROM documents
  )
)"""


def _sql_exact_substring_spans() -> str:
    # Island key: pa minus its rank within the (pair, diagonal) group —
    # identical window on both engines; every output column BIGINT.
    return f"""
WITH {_sql_span_grams(SPAN_GRAM_LEN)},
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


# ---------------------------------------------------------------------------
# 2. Intra-document self-repeat spans (scope="self")
# ---------------------------------------------------------------------------

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
WITH {_sql_span_grams(SELF_GRAM_LEN)},
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


# ---------------------------------------------------------------------------
# 3. SemDeDup-style semantic dedup: cluster-bounded cosine collapse
# ---------------------------------------------------------------------------

SEMD_K = 64
SEMD_ITERS = 2
SEMD_TAU = (3, 10)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication over the embedding space (r12 verdict
    item 4) — :func:`operators.dedup.semantic_dedup`: integer-lattice
    k-means buckets the corpus, members rank by exact distance to
    their centroid, and a member is dropped iff some earlier-ranked
    CLUSTER-MATE sits at cosine >= 3/10 — the pair join is bucketed BY
    CLUSTER, never all-pairs (the 100 TB shape; ``k`` is the published
    cluster-size knob).  Joined to ``documents`` for the source
    dimension, so a consumer reads per-source semantic-dup pressure
    directly.

    The threshold sits in this corpus's observed cosine regime
    (synthetic embeddings are near-orthogonal — measured max pairwise
    cosine 0.48 at sf0.001, so a production 0.95 would drop nothing
    and the decision column would be constant); the collapse laws
    themselves (exact twins always drop, orthogonal members never do)
    are pinned on constructed vectors in
    ``tests/test_properties.py``.  Every comparison is exact integer
    arithmetic (decimal(38,0) vs HUGEINT squaring — r09 discipline),
    so the DuckDB oracle replays the full pipeline bit-identically,
    kmeans included (the unrolled-Lloyd SQL builder shared with
    ``kmeans_cells``)."""
    from pyspark_pipelining_spark.operators import dedup

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    res = dedup.semantic_dedup(emb, k=SEMD_K, iters=SEMD_ITERS, tau=SEMD_TAU)
    return (
        res.join(docs, res.vec_id == docs.doc_id)
        .select("vec_id", "cell", "rank", "keeper_id", "dropped", "source")
        .orderBy("vec_id")
    )


def _sql_semantic_dedup() -> str:
    from pyspark_pipelining_spark.operators.cluster import GRID
    from pyspark_pipelining_spark.queries_llm import _sql_kmeans

    p, q = SEMD_TAU
    kmeans = _sql_kmeans(k=SEMD_K, iters=SEMD_ITERS, dim=64, grid=GRID)
    return f"""
WITH snap AS (
    SELECT vec_id, g.i AS pos,
           CAST(round(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * {GRID})
                AS BIGINT) AS s
    FROM embeddings, generate_series(1, 64) AS g(i)
),
assign AS (SELECT * FROM ({kmeans}) kk),
norms AS (SELECT vec_id, sum(s * s) AS n2 FROM snap GROUP BY vec_id),
ranked AS (
    SELECT vec_id, cell, d,
           CAST(row_number() OVER (PARTITION BY cell ORDER BY d, vec_id)
                AS BIGINT) AS rank
    FROM assign
),
keepers AS (SELECT cell, vec_id AS keeper_id FROM ranked WHERE rank = 1),
pairs AS (
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM ranked a JOIN ranked b ON a.cell = b.cell AND b.rank < a.rank
),
dots AS (
    SELECT p.va, p.vb, sum(sa.s * sb.s) AS dot
    FROM pairs p
    JOIN snap sa ON sa.vec_id = p.va
    JOIN snap sb ON sb.vec_id = p.vb AND sb.pos = sa.pos
    GROUP BY p.va, p.vb
),
hits AS (
    SELECT d.va AS vec_id,
           max(CASE WHEN d.dot > 0
                     AND CAST(d.dot AS HUGEINT) * d.dot * {q * q}
                         >= CAST(na.n2 AS HUGEINT) * nb.n2 * {p * p}
               THEN 1 ELSE 0 END) AS dropped
    FROM dots d
    JOIN norms na ON na.vec_id = d.va
    JOIN norms nb ON nb.vec_id = d.vb
    GROUP BY d.va
)
SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell, r.rank, k.keeper_id,
       CAST(COALESCE(h.dropped, 0) AS BIGINT) AS dropped, doc.source
FROM ranked r
JOIN keepers k USING (cell)
LEFT JOIN hits h ON h.vec_id = r.vec_id
JOIN documents doc ON doc.doc_id = r.vec_id
ORDER BY r.vec_id
"""


SQL_SEMANTIC_DEDUP = _sql_semantic_dedup()


QUERIES_STAGED: dict[str, QueryFn] = {
    "exact_substring_spans": q_exact_substring_spans,
    "self_repeat_spans": q_self_repeat_spans,
    "semantic_dedup": q_semantic_dedup,
}

ORACLES_STAGED: dict[str, str] = {
    "exact_substring_spans": SQL_EXACT_SUBSTRING_SPANS,
    "self_repeat_spans": SQL_SELF_REPEAT_SPANS,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
}


# ---------------------------------------------------------------------------
# Round-14 staging QUEUE — span-based decontamination (r12 verdict
# item 5), ready and oracle-paired but kept OUT of QUERIES_STAGED to
# honor the <=3-staged cadence: the three entries above register at
# round-14 start, then this query moves into the dicts.  The local
# gates below (tests/test_decontamination.py) run it against the
# DuckDB oracle every suite run regardless.
# ---------------------------------------------------------------------------

DECON_GRAM_LEN = 16
DECON_MIN = 24


def q_decontamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination — the Lee et al. 2022
    decontamination shape, reusing the island machinery UNCHANGED
    (``operators/dedup.exact_substring_spans``, scope="cross"): find
    every verbatim span >= 24 chars shared between an EVAL document
    (``source = 'src19'``, the corpus's stand-in benchmark set — the
    registered ``contamination`` query's convention) and a TRAIN
    document (every other source), then orient each pair eval-side
    first.  Strictly stronger than the registered ``contamination``
    query, which scores documents by 8-gram overlap fraction: this
    reports the exact overlapping PASSAGES with positions, the
    actionable artifact (mask the span / drop the train doc / flag the
    benchmark).

    The eval XOR train filter runs AFTER the symmetric span scan, so
    the operator stays untouched; on a real 100 TB lake the one-line
    refinement is a side predicate inside the operator's pair join
    (eval ids are a tiny broadcast set), which prunes the train×train
    pair space — documented rather than implemented because the staged
    contract is machinery-reuse, and train×train spans are the
    ALREADY-STAGED ``exact_substring_spans`` output this query's scan
    shares (one corpus scan can serve both).

    Output: ``eval_doc, eval_start, train_doc, train_start,
    train_source, span_len`` — BIGINTs plus the source string,
    deterministic order."""
    from pyspark_pipelining_spark.operators import dedup
    from pyspark_pipelining_spark.queries_corpus import EVAL_SOURCE

    docs = load_table(spark, sf_dir, "documents")
    spans = dedup.exact_substring_spans(
        docs,
        gram_len=DECON_GRAM_LEN,
        min_span=DECON_MIN,
        max_gram_occurrences=SPAN_MAX_OCC,
        spread=spark.sparkContext.defaultParallelism,
    )
    meta = docs.select("doc_id", "source")
    tagged = (
        spans.join(
            meta.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a")
            ),
            "doc_a",
        )
        .join(
            meta.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b")
            ),
            "doc_b",
        )
        .filter(
            (F.col("source_a") == EVAL_SOURCE) != (F.col("source_b") == EVAL_SOURCE)
        )
    )
    a_is_eval = F.col("source_a") == EVAL_SOURCE
    return tagged.select(
        F.when(a_is_eval, F.col("doc_a")).otherwise(F.col("doc_b")).alias("eval_doc"),
        F.when(a_is_eval, F.col("start_a"))
        .otherwise(F.col("start_b"))
        .alias("eval_start"),
        F.when(a_is_eval, F.col("doc_b")).otherwise(F.col("doc_a")).alias("train_doc"),
        F.when(a_is_eval, F.col("start_b"))
        .otherwise(F.col("start_a"))
        .alias("train_start"),
        F.when(a_is_eval, F.col("source_b"))
        .otherwise(F.col("source_a"))
        .alias("train_source"),
        "span_len",
    ).orderBy("eval_doc", "eval_start", "train_doc", "train_start")


def _sql_decontamination_spans() -> str:
    from pyspark_pipelining_spark.queries_corpus import EVAL_SOURCE

    return f"""
WITH {_sql_span_grams(DECON_GRAM_LEN)},
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
),
spans AS (
  SELECT doc_a, doc_b,
         CAST(min(pa) AS BIGINT) AS start_a,
         CAST(min(pb) AS BIGINT) AS start_b,
         CAST(count(*) + {DECON_GRAM_LEN} - 1 AS BIGINT) AS span_len
  FROM isl
  GROUP BY doc_a, doc_b, diag, k
  HAVING count(*) + {DECON_GRAM_LEN} - 1 >= {DECON_MIN}
),
tagged AS (
  SELECT s.*, da.source AS source_a, db.source AS source_b
  FROM spans s
  JOIN documents da ON da.doc_id = s.doc_a
  JOIN documents db ON db.doc_id = s.doc_b
  WHERE (da.source = '{EVAL_SOURCE}') <> (db.source = '{EVAL_SOURCE}')
)
SELECT CASE WHEN source_a = '{EVAL_SOURCE}' THEN doc_a ELSE doc_b END AS eval_doc,
       CASE WHEN source_a = '{EVAL_SOURCE}' THEN start_a ELSE start_b END AS eval_start,
       CASE WHEN source_a = '{EVAL_SOURCE}' THEN doc_b ELSE doc_a END AS train_doc,
       CASE WHEN source_a = '{EVAL_SOURCE}' THEN start_b ELSE start_a END AS train_start,
       CASE WHEN source_a = '{EVAL_SOURCE}' THEN source_b ELSE source_a END AS train_source,
       span_len
FROM tagged
ORDER BY eval_doc, eval_start, train_doc, train_start
"""


SQL_DECONTAMINATION_SPANS = _sql_decontamination_spans()
