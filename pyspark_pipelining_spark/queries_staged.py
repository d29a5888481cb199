"""Round-16 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-15 snapshot window already
carries this round's registrations (the former round-15 staged trio:
``decontamination_spans`` + ``dsir_weights`` + ``dsir_sample_topk``
→ queries_corpus beside ``contamination`` and the sampling family),
and late additions would defer pending revalidations (CLAUDE.md:
registry freeze).

This round's staged trio (promoted from the round-15 queue):
``decontamination_report`` (per-eval-doc interval-union contamination
rate — r13 verdict item 5; gates in ``tests/test_decontamination.py``),
``gopher_repetition`` (Rae et al. 2021 repetition filters; gates in
``tests/test_gopher.py``), and ``unimax_allocation`` (Chung et al.
2023 budget waterfill; gates in ``tests/test_unimax.py``).

The formal QUEUE (``QUERIES_QUEUED`` / ``ORACLES_QUEUED`` at the
bottom) holds the round-17 candidates: ``ccnet_ppl_buckets``
(Wenzek et al. 2020 CCNet-style perplexity-bucket filtering over the
quantized ``lm_score`` machinery; gates in ``tests/test_ccnet.py``),
``quality_battery`` (Penedo et al. 2024 FineWeb-style heuristic
battery composing the document-level Gopher rules with the repetition
composite; gates in ``tests/test_fineweb.py``), and
``sim_ivf_learned_topk`` (IVF against the committed integer-lattice
trained quantizer ``fixtures/ann/centroids.parquet``; gates in
``tests/test_ivf_learned.py``).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into family modules
(``decontamination_report`` → ``queries_corpus.py`` beside
``decontamination_spans``; ``gopher_repetition`` → ``queries_llm.py``
beside the text-quality family; ``unimax_allocation`` →
``queries_corpus.py`` beside ``mixture_sample``), move the QUEUED
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

from pyspark_pipelining_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# 1. Per-eval-doc decontamination report (r13 verdict item 5, promoted
#    from the round-15 queue)
# ---------------------------------------------------------------------------

#: flag an eval doc when >= 1/20 (5%) of its characters are covered by
#: verbatim train overlaps — integer-compared (20·overlap >= n_chars)
#: so the verdict never touches a float
DECON_RATE_NUM, DECON_RATE_DEN = 1, 20


def q_decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-eval-document contamination RATE over the span output — the
    artifact a corpus owner actually consumes (r13 verdict item 5):
    for EVERY eval doc, the union of its train-overlapped character
    intervals (overlapping spans must not double-count), the span and
    distinct-train-doc counts, the rate against the doc's length, the
    integer-exact flag at ``DECON_RATE_NUM/DECON_RATE_DEN``, and the
    doc's ``dataset_split`` assignment (same fractions/salt as the
    registered query) — so train/val assignment is auditable
    end-to-end against contamination pressure.

    Interval union is one window pass per eval doc: a span starts a
    new covered island iff its start lies strictly past the running
    max end of every earlier span (sorted by start; ties broken by
    end/train ids for full determinism); union length is then the sum
    of per-island extents.  Adjacent-but-not-overlapping islands sum
    to the same char count merged or not, so the strict comparison is
    exact.  Clean eval docs appear with zeros (an auditor must see the
    whole benchmark, not only the dirty part).

    Scale shape: the spans frame is the (already bounded) island-join
    output keyed by eval_doc — the window and the final aggregate
    reuse that one partitioning; the eval-doc dimension join is a
    broadcast (the benchmark set is small by construction)."""
    from pyspark_pipelining_spark.operators import corpus
    from pyspark_pipelining_spark.queries_corpus import (
        EVAL_SOURCE,
        SPLIT_FRACTIONS,
        SPLIT_GRID,
        SPLIT_SALT,
        q_decontamination_spans,
    )
    from pyspark.sql import Window

    spans = q_decontamination_spans(spark, sf_dir).select(
        "eval_doc",
        "eval_start",
        (F.col("eval_start") + F.col("span_len") - 1).alias("eval_end"),
        "train_doc",
    )
    w = Window.partitionBy("eval_doc").orderBy(
        "eval_start", "eval_end", "train_doc"
    )
    prev_max = F.max("eval_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = spans.withColumn(
        "isl",
        F.sum(
            F.when(prev_max.isNull() | (F.col("eval_start") > prev_max), 1).otherwise(
                0
            )
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_doc = (
        islands.groupBy("eval_doc", "isl")
        .agg(
            (F.max("eval_end") - F.min("eval_start") + 1).alias("ext"),
            F.count(F.lit(1)).alias("n"),
            F.collect_set("train_doc").alias("tset"),
        )
        .groupBy("eval_doc")
        .agg(
            F.sum("ext").cast("long").alias("overlap_chars"),
            F.sum("n").cast("long").alias("n_spans"),
            F.size(F.array_distinct(F.flatten(F.collect_list("tset"))))
            .cast("long")
            .alias("n_train_docs"),
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = corpus.split_assign(
        docs.filter(F.col("source") == EVAL_SOURCE),
        SPLIT_FRACTIONS,
        salt=SPLIT_SALT,
        grid=SPLIT_GRID,
    ).select("doc_id", "split", "n_chars")
    out = eval_docs.join(
        per_doc, eval_docs.doc_id == per_doc.eval_doc, "left"
    ).select(
        F.col("doc_id").alias("eval_doc"),
        "split",
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_train_docs", F.lit(0)).cast("long").alias("n_train_docs"),
        F.coalesce("overlap_chars", F.lit(0)).cast("long").alias("overlap_chars"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.coalesce("overlap_chars", F.lit(0)) / F.col("n_chars"), 6).alias(
            "contamination_rate"
        ),
        F.when(
            F.coalesce("overlap_chars", F.lit(0)) * DECON_RATE_DEN
            >= F.col("n_chars") * DECON_RATE_NUM,
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("flagged"),
    )
    return out.orderBy("eval_doc")


def _sql_decontamination_report() -> str:
    from pyspark_pipelining_spark.queries_corpus import (
        EVAL_SOURCE,
        SPLIT_FRACTIONS,
        SPLIT_GRID,
        SPLIT_SALT,
        SQL_DECONTAMINATION_SPANS,
    )

    lo = 0
    cases = []
    for name, frac in SPLIT_FRACTIONS.items():
        hi = lo + int(frac * SPLIT_GRID)
        cases.append(f"WHEN b >= {lo} AND b < {hi} THEN '{name}'")
        lo = hi
    decon = SQL_DECONTAMINATION_SPANS.strip().rstrip()
    # reuse the registered spans oracle verbatim as a subquery (minus
    # its display ORDER BY — the aggregate re-sorts)
    decon = decon[: decon.rindex("ORDER BY")]
    return f"""
WITH spanrows AS (
    SELECT eval_doc, eval_start,
           eval_start + span_len - 1 AS eval_end, train_doc
    FROM ({decon})
),
flagged_isl AS (
    SELECT eval_doc, eval_start, eval_end, train_doc,
           CASE WHEN max(eval_end) OVER (
                    PARTITION BY eval_doc
                    ORDER BY eval_start, eval_end, train_doc
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                 OR eval_start > max(eval_end) OVER (
                    PARTITION BY eval_doc
                    ORDER BY eval_start, eval_end, train_doc
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) THEN 1 ELSE 0 END AS new_isl
    FROM spanrows
),
isl AS (
    SELECT *, sum(new_isl) OVER (
               PARTITION BY eval_doc
               ORDER BY eval_start, eval_end, train_doc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS isl
    FROM flagged_isl
),
per_isl AS (
    SELECT eval_doc, isl,
           max(eval_end) - min(eval_start) + 1 AS ext,
           count(*) AS n,
           list(DISTINCT train_doc) AS tset
    FROM isl GROUP BY eval_doc, isl
),
per_doc AS (
    SELECT eval_doc,
           sum(ext) AS overlap_chars,
           sum(n) AS n_spans,
           len(list_distinct(flatten(list(tset)))) AS n_train_docs
    FROM per_isl GROUP BY eval_doc
),
eval_docs AS (
    SELECT doc_id, n_chars,
           CASE {" ".join(cases)} ELSE '__rest' END AS split
    FROM (
        SELECT doc_id, n_chars,
               ('0x' || substr(md5('{SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % {SPLIT_GRID} AS b
        FROM documents WHERE source = '{EVAL_SOURCE}'
    )
)
SELECT e.doc_id AS eval_doc, e.split,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.n_train_docs, 0) AS BIGINT) AS n_train_docs,
       CAST(coalesce(p.overlap_chars, 0) AS BIGINT) AS overlap_chars,
       CAST(e.n_chars AS BIGINT) AS n_chars,
       round(coalesce(p.overlap_chars, 0) / CAST(e.n_chars AS DOUBLE), 6)
         AS contamination_rate,
       CAST(CASE WHEN coalesce(p.overlap_chars, 0) * {DECON_RATE_DEN}
                      >= e.n_chars * {DECON_RATE_NUM}
            THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM eval_docs e LEFT JOIN per_doc p ON e.doc_id = p.eval_doc
ORDER BY e.doc_id
"""


SQL_DECONTAMINATION_REPORT = _sql_decontamination_report()


QUERIES_STAGED: dict[str, QueryFn] = {
    "decontamination_report": q_decontamination_report,
}

ORACLES_STAGED: dict[str, str] = {
    "decontamination_report": SQL_DECONTAMINATION_REPORT,
}


# ---------------------------------------------------------------------------
# 2. Gopher repetition filters (Rae et al. 2021 Table A1; the published
#    repetition-quality rung beside lm_score and the dedup ladder;
#    promoted from the round-15 queue).  Gates in tests/test_gopher.py.
# ---------------------------------------------------------------------------


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher repetition signals over ``documents``
    (``operators/text.gopher_repetition``): most-frequent-2/3-gram
    char coverage, duplicated-3-gram word-interval coverage, and the
    integer-exact composite flag at the paper's thresholds — joined to
    ``source`` so per-source repetition pressure reads directly."""
    from pyspark_pipelining_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    rep = text_ops.gopher_repetition(docs)
    return (
        rep.join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_words",
            "n_chars",
            "top2_cov",
            "top3_cov",
            "dup3_cov_words",
            "top2_char_frac",
            "top3_char_frac",
            "dup3_word_frac",
            "flagged_repetition",
        )
        .orderBy("doc_id")
    )


def _sql_gopher_repetition() -> str:
    from pyspark_pipelining_spark.operators.text import (
        _GOPHER_KEY,
        GOPHER_DUP3,
        GOPHER_TOP2,
        GOPHER_TOP3,
    )

    p2, q2 = GOPHER_TOP2
    p3, q3 = GOPHER_TOP3
    pd_, qd = GOPHER_DUP3
    g3_parts = " || ' ' || ".join(f"w[CAST(i AS INT) + {j}]" for j in range(3))
    return f"""
WITH gw AS (
    SELECT doc_id, source, length(text) AS n_chars,
           string_split_regex(lower(text), ' +') AS w
    FROM documents
),
base AS (SELECT doc_id, source, n_chars, len(w) AS n_words FROM gw),
g2 AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS g
    FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
          FROM gw WHERE len(w) >= 2)
),
g3 AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, {g3_parts} AS g
    FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
          FROM gw WHERE len(w) >= 3)
),
t2 AS (
    SELECT doc_id, CAST(max(k) % {_GOPHER_KEY} AS BIGINT) AS top2_cov
    FROM (SELECT doc_id,
                 count(*) * {_GOPHER_KEY} + count(*) * length(g) AS k
          FROM g2 GROUP BY doc_id, g)
    GROUP BY doc_id
),
t3 AS (
    SELECT doc_id, CAST(max(k) % {_GOPHER_KEY} AS BIGINT) AS top3_cov
    FROM (SELECT doc_id,
                 count(*) * {_GOPHER_KEY} + count(*) * length(g) AS k
          FROM g3 GROUP BY doc_id, g)
    GROUP BY doc_id
),
dup AS (
    SELECT doc_id, pos AS s, pos + 2 AS e
    FROM (SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY doc_id, g) AS c
          FROM g3)
    WHERE c > 1
),
isl AS (
    SELECT doc_id, s, e,
           sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS isl
    FROM (
        SELECT doc_id, s, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS pm
        FROM dup
    )
),
d3 AS (
    SELECT doc_id, CAST(sum(ext) AS BIGINT) AS dup3_cov_words
    FROM (SELECT doc_id, isl, max(e) - min(s) + 1 AS ext
          FROM isl GROUP BY doc_id, isl)
    GROUP BY doc_id
)
SELECT b.doc_id, b.source,
       CAST(b.n_words AS BIGINT) AS n_words,
       CAST(b.n_chars AS BIGINT) AS n_chars,
       CAST(coalesce(t2.top2_cov, 0) AS BIGINT) AS top2_cov,
       CAST(coalesce(t3.top3_cov, 0) AS BIGINT) AS top3_cov,
       CAST(coalesce(d3.dup3_cov_words, 0) AS BIGINT) AS dup3_cov_words,
       round(coalesce(t2.top2_cov, 0) / CAST(b.n_chars AS DOUBLE), 6) AS top2_char_frac,
       round(coalesce(t3.top3_cov, 0) / CAST(b.n_chars AS DOUBLE), 6) AS top3_char_frac,
       round(coalesce(d3.dup3_cov_words, 0) / CAST(b.n_words AS DOUBLE), 6) AS dup3_word_frac,
       CAST(CASE WHEN coalesce(t2.top2_cov, 0) * {q2} > b.n_chars * {p2}
                   OR coalesce(t3.top3_cov, 0) * {q3} > b.n_chars * {p3}
                   OR coalesce(d3.dup3_cov_words, 0) * {qd} > b.n_words * {pd_}
            THEN 1 ELSE 0 END AS BIGINT) AS flagged_repetition
FROM base b
LEFT JOIN t2 ON b.doc_id = t2.doc_id
LEFT JOIN t3 ON b.doc_id = t3.doc_id
LEFT JOIN d3 ON b.doc_id = d3.doc_id
ORDER BY b.doc_id
"""


SQL_GOPHER_REPETITION = _sql_gopher_repetition()

QUERIES_STAGED["gopher_repetition"] = q_gopher_repetition
ORACLES_STAGED["gopher_repetition"] = SQL_GOPHER_REPETITION


# ---------------------------------------------------------------------------
# 3. UniMax budget allocation (Chung et al. 2023; the published
#    language/source-sampling policy above mixture_sample's fixed
#    fractions; promoted from the round-15 queue).  Gates in
#    tests/test_unimax.py.
# ---------------------------------------------------------------------------

UNIMAX_EPOCHS = 1
UNIMAX_FRAC = (19, 20)


def q_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax waterfill over per-source character budgets
    (``operators/corpus.unimax_allocation``): allocate 19/20 of the
    corpus's total characters uniformly across sources with a
    1-epoch per-source cap — small sources cap out at their full
    data, the freed budget redistributes over the rest, and
    ``Σ alloc`` equals the budget EXACTLY (integer waterfill; the
    division remainder goes to the first uncapped sources in sort
    order).  The 19/20 fraction sits inside this corpus's ±20%
    source-size spread deliberately, so BOTH branches (capped and
    level-allocated) are populated at every committed scale — a
    budget under the smallest cap would leave ``is_capped``
    constant-zero and the oracle value-blind to the prefix logic."""
    from pyspark_pipelining_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.sum("n_chars").alias("n_chars"))
    return corpus.unimax_allocation(
        src, max_epochs=UNIMAX_EPOCHS, budget_frac=UNIMAX_FRAC
    ).orderBy("source")


def _sql_unimax_allocation() -> str:
    e = UNIMAX_EPOCHS
    p, q = UNIMAX_FRAC
    return f"""
WITH src AS (
    SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_avail
    FROM documents GROUP BY source
),
tot AS (SELECT count(*) AS m, sum(n_avail) AS ntot FROM src),
ranked AS (
    SELECT source, n_avail, n_avail * {e} AS cap,
           CAST(row_number() OVER (ORDER BY n_avail * {e}, source) AS BIGINT) AS idx,
           coalesce(sum(n_avail * {e}) OVER (
               ORDER BY n_avail * {e}, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx,
           m, (ntot * {p}) // {q} AS B
    FROM src CROSS JOIN tot
),
flagged AS (
    SELECT *, B - pfx AS rem, m - idx + 1 AS denom,
           CASE WHEN cap * (m - idx + 1) >= B - pfx THEN 1 ELSE 0 END AS ok
    FROM ranked
),
solved AS (
    SELECT *,
           max(CASE WHEN ok = 1 THEN rem END) OVER () AS rem_k,
           max(CASE WHEN ok = 1 THEN denom END) OVER () AS denom_k,
           max(idx) OVER () AS mx
    FROM flagged
),
alloc AS (
    SELECT source, n_avail, cap, denom_k,
           CASE WHEN denom_k IS NULL OR idx < mx - denom_k + 1 THEN 1 ELSE 0 END AS is_capped,
           CASE WHEN denom_k IS NULL THEN cap
                WHEN idx < mx - denom_k + 1 THEN cap
                ELSE rem_k // denom_k
                     + CASE WHEN idx - (mx - denom_k + 1) < rem_k % denom_k
                            THEN 1 ELSE 0 END
           END AS alloc
    FROM solved
)
SELECT source, n_avail, CAST(cap AS BIGINT) AS cap,
       CAST(alloc AS BIGINT) AS alloc,
       CASE WHEN n_avail > 0 THEN round(alloc / CAST(n_avail AS DOUBLE), 6)
            ELSE 0.0 END AS epochs,
       CAST(is_capped AS BIGINT) AS is_capped
FROM alloc
ORDER BY source
"""


SQL_UNIMAX_ALLOCATION = _sql_unimax_allocation()

QUERIES_STAGED["unimax_allocation"] = q_unimax_allocation
ORACLES_STAGED["unimax_allocation"] = SQL_UNIMAX_ALLOCATION


# ---------------------------------------------------------------------------
# Round-16 staging QUEUE (1) — CCNet perplexity-bucket filtering
# (Wenzek et al. 2020; the published LM-quality rung above the raw
# lm_score — r14 verdict item 3).  Oracle-paired, gates in
# tests/test_ccnet.py; queued behind the staged trio.
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


# ---------------------------------------------------------------------------
# Round-16 staging QUEUE (2) — FineWeb-style composed heuristic battery
# (Penedo et al. 2024 composes the C4 + Gopher rule sets into per-rule
# flags and one keep decision; this corpus is single-line so the
# battery composes the applicable DOCUMENT-level Gopher rules with the
# repetition composite — thresholds corpus-adapted and documented in
# operators/text.py).  Oracle-paired, gates in tests/test_fineweb.py.
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
    # reuse the staged gopher oracle verbatim as a subquery (minus its
    # display ORDER BY — the battery join re-sorts)
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


# ---------------------------------------------------------------------------
# Round-16 staging QUEUE (3) — learned-centroid IVF ANN (r14 verdict
# stretch item 7): the iterative k-means trainer is not
# SQL-expressible, so it ran ONCE (tools/gen_ann_fixtures.py) and the
# committed integer-lattice centroid table fixtures/ann/
# centroids.parquet is the query's input — assignment and probe
# selection are exact int64 L2², the semantic_dedup lattice
# convention, so the whole search pipeline carries a DuckDB oracle.
# Gates in tests/test_ivf_learned.py.
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


# ---------------------------------------------------------------------------
# The QUEUE, formalized: built + oracle-paired + gate-covered queries
# that are NOT driver-exposed yet (they enter QUERIES_STAGED at the
# next reset, then register a round later).  Every local gate treats
# these exactly like staged queries — sf0.001 oracle compare, the
# pandas-dtype gate, the plan invariants, AND the plan-shape lock —
# so a queued query's plan is pinned rounds before its first driver
# row, and promotion is a two-line dict move.
# ---------------------------------------------------------------------------

QUERIES_QUEUED: dict[str, QueryFn] = {
    "ccnet_ppl_buckets": q_ccnet_ppl_buckets,
    "quality_battery": q_quality_battery,
    "sim_ivf_learned_topk": q_sim_ivf_learned_topk,
}

ORACLES_QUEUED: dict[str, str] = {
    "ccnet_ppl_buckets": SQL_CCNET_PPL_BUCKETS,
    "quality_battery": SQL_QUALITY_BATTERY,
    "sim_ivf_learned_topk": SQL_SIM_IVF_LEARNED_TOPK,
}

assert not set(QUERIES_QUEUED) & set(QUERIES_STAGED)
