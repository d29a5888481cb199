"""Round-14 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-13 snapshot window already
carries this round's registrations (the former round-13 staged trio:
``kmv_merge_parity`` → queries_corpus beside its three merge-law
siblings, ``wav_stereo_features`` and ``sim_sq8_rerank`` →
queries_ann_media), and late additions would defer pending
revalidations (CLAUDE.md: registry freeze).

This round's staged pair is the exact-substring SPAN family, promoted
from the round-12 queue (the documented two-entry move): cross-document
verbatim passages and intra-document self-repeats, both over
``operators/dedup.exact_substring_spans`` (Lee et al. 2022 semantics as
diagonal gram islands).  Fully gated locally: DuckDB oracle compare at
sf0.001/0.01/0.1, plan shape in both join regimes, a hypothesis model
proof, and hostile-layout invariance (``tests/test_substring_spans.py``).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into a family module
(``queries_llm.py`` beside the dedup ladder), reset this file, repoint
the span tests' imports, regenerate VALIDATION.md, and re-verify the
plan lock (``python tools/plan_lock.py`` — keys are query names, so a
pure module move leaves it green; regenerate with ``--write`` only if a
plan actually changed).  The local gates exercise everything here every
pytest run (oracle compare at sf0.001, the pandas-dtype gate, and the
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


QUERIES_STAGED: dict[str, QueryFn] = {
    "exact_substring_spans": q_exact_substring_spans,
    "self_repeat_spans": q_self_repeat_spans,
}

ORACLES_STAGED: dict[str, str] = {
    "exact_substring_spans": SQL_EXACT_SUBSTRING_SPANS,
    "self_repeat_spans": SQL_SELF_REPEAT_SPANS,
}
