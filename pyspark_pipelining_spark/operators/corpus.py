"""Corpus-preparation operators for LLM training-data pipelines
(beyond-reference scope — extends the SURVEY §7.2 step-12 family with
the remaining ops a 100 TB corpus owner runs between raw crawl and
tokenizer: PII scrubbing, benchmark decontamination, sampling,
vocabulary statistics, and sequence packing).

Design stance (same as operators/text.py): everything except sequence
packing is JVM-side built-ins — regex, higher-order array functions,
one aggregation shuffle — so the hot path stays in whole-stage codegen.
Sequence packing is inherently sequential per group (a running-fill
state machine), so it is the module's one deliberate Arrow-batched
``applyInPandas`` operator: per-group state, zero driver involvement,
the standard shape for custom stateful batch ops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_pipelining_spark import cache
from pyspark_pipelining_spark.operators.dedup import (
    MERSENNE,
    portable_hash_id,
    word_ngrams,
)
from pyspark_pipelining_spark.operators.text import with_words
from pyspark_pipelining_spark.sources.registry import spread

#: Redaction patterns applied in order (URL first so an embedded e-mail
#: inside a URL is consumed by the URL rule, not split across two).
#: RE2-compatible (no backrefs/lookarounds) so the DuckDB oracle can run
#: the identical patterns.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^ ]+", "<URL>"),
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact URLs, e-mail addresses, and phone numbers; count each.

    Output: doc_id, n_url, n_email, n_phone, clean (redacted text).
    Pure per-row regex — map-side only, no shuffle at any scale.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    out = df.select("doc_id", *counts, F.col(text_col).alias("clean"))
    for _, pat, repl in PII_RULES:
        out = out.withColumn("clean", F.regexp_replace("clean", pat, repl))
    return out


def contamination(
    corpus_df: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-decontamination scan: for every corpus document, the
    share of its distinct word n-grams that also occur anywhere in the
    evaluation set.

    Output: doc_id, n_grams, n_contaminated, contamination (exact
    ratio of two ints — engine-portable).  Documents shorter than ``n``
    words have no n-grams and are absent from the output (nothing to
    test).

    Scale shape: the eval side (benchmarks — MBs, not TBs) collapses to
    a DISTINCT gram-id set and is broadcast, so the corpus side is one
    map-side hash-probe plus a single doc_id aggregation; the corpus is
    never shuffled on gram.  Gram ids are md5-derived
    (:func:`~pyspark_pipelining_spark.operators.dedup.portable_hash_id`)
    — fixed-width keys instead of raw n-gram strings, and bit-identical
    in the DuckDB oracle.  Hash collisions replicate identically in
    both engines, so the comparison stays exact.
    """
    c_grams = (
        word_ngrams(corpus_df, n)
        .select(id_col, F.array_distinct("ngrams").alias("gs"))
        .select(id_col, F.explode("gs").alias("g"))
        .select(id_col, portable_hash_id(F.col("g"), MERSENNE).alias("gid"))
    )
    e_ids = (
        word_ngrams(eval_df, n)
        .select(F.explode(F.array_distinct("ngrams")).alias("g"))
        .select(portable_hash_id(F.col("g"), MERSENNE).alias("gid"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        c_grams.join(F.broadcast(e_ids), "gid", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_contaminated"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated") / F.col("n_grams")).alias("contamination"),
    )


def vocab_topk(df: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Top-k vocabulary by corpus frequency (ties break on token text).

    One map-side-combined groupBy; the final top-k is an
    ``orderBy().limit()`` which Spark executes as TakeOrdered (per-
    partition heaps + driver merge of k rows), not a global sort — the
    pattern survives any corpus size for k ≪ vocabulary.
    """
    tokens = with_words(df, text_col).select(F.explode("words").alias("token")).filter(
        F.length("token") > 0
    )
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(k)


def stratified_topk_sample(
    df: DataFrame, k: int = 2, strata_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic exact-k-per-stratum sample: rank rows inside each
    stratum by ``md5(id)`` (a fixed pseudo-random order both engines
    reproduce) and keep the first k.

    One shuffle on the stratum key.  A stratum far larger than memory
    makes the per-stratum window the bottleneck — for that regime use
    :func:`hash_fraction_sample` (map-side, no shuffle) or pre-filter
    with it before the exact window.
    """
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(strata_col).orderBy(*order)
    return (
        df.select(id_col, strata_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, strata_col)
    )


def hash_fraction_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", grid: int = 1_000_000
) -> DataFrame:
    """Deterministic ~``fraction`` sample with zero shuffle: keep rows
    whose md5-derived id hash lands under ``fraction`` of the hash grid.
    Reproducible across runs/engines (unlike ``df.sample``, whose seed
    is partition-layout-dependent), composable (a 0.5 sample of a 0.5
    sample is the same rows as a 0.25 sample), and purely map-side.
    """
    bucket = portable_hash_id(F.col(id_col).cast("string"), grid)
    return df.filter(bucket < int(fraction * grid))


def pack_greedy(
    df: DataFrame,
    budget: int = 2000,
    cost_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequential sequence packing: within each group, walk
    documents in id order and assign pack ids such that each pack's
    total cost stays ≤ ``budget`` (a document larger than the budget
    gets a pack of its own; packs never span groups).

    Output: doc_id, <group_col>, pack_id (0-based per group).

    This is the module's one Python-worker operator, on purpose: the
    running-fill state machine is order-dependent within a group, which
    no built-in aggregate expresses.  ``applyInPandas`` gives it the
    right execution shape — one shuffle on the group key, Arrow batch
    per group, state local to the worker, nothing on the driver.  At
    100 TB the group key is a shard id sized so a group's (id, cost)
    pairs fit a worker comfortably; payload bytes are never moved, only
    ids and costs.
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        pack_ids = []
        pid, fill, first = 0, 0, True
        for cost in pdf[cost_col]:
            if not first and fill + cost > budget:
                pid += 1
                fill = 0
            fill += cost
            first = False
            pack_ids.append(pid)
        pdf["pack_id"] = pack_ids
        return pdf[[id_col, group_col, "pack_id"]]

    narrow = spread(df).select(id_col, group_col, cost_col)
    return narrow.groupBy(group_col).applyInPandas(
        pack, schema=f"{id_col} long, {group_col} string, pack_id long"
    )


def collapse_repeats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse runs of consecutively repeated tokens ("table table
    table" → "table") — the cheapest form of intra-document repetition
    trimming (the C4/Gopher cleanup family; full line-dedup needs
    line-structured text, which the synthetic corpus lacks).

    Output: doc_id, n_words, n_kept, clean.  Map-side higher-order
    functions only — the keep-mask is an index lambda over the word
    array, so the whole operator rides whole-stage codegen with no
    shuffle at any scale.
    """
    words = with_words(df, text_col)
    idx = F.sequence(F.lit(1), F.size("words"))
    # the i-1 probe is clamped to 1 (not short-circuited away): ANSI mode
    # raises on element_at(.., 0), and boolean OR evaluates both operands;
    # at i=1 the clamped compare is w[1] != w[1] = false and the i == 1
    # branch keeps the word
    prev = lambda i: F.element_at("words", F.greatest(i - 1, F.lit(1)).cast("int"))  # noqa: E731
    keep = F.filter(
        idx,
        lambda i: (i == 1) | (F.element_at("words", i.cast("int")) != prev(i)),
    )
    kept_words = F.transform(keep, lambda i: F.element_at("words", i.cast("int")))
    return words.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.size(keep).alias("n_kept"),
        F.array_join(kept_words, " ").alias("clean"),
    )


#: Sentence-ish line splitter shared verbatim by Spark (Java regex) and
#: the DuckDB oracle (RE2): both treat the character class + greedy \s+
#: identically, and neither needs lookarounds.  Real line-structured
#: corpora would split on '\n' instead — the rule is a parameter.
LINE_SPLIT_RE = r"[.!?]\s+"


def dedup_lines(
    df: DataFrame, text_col: str = "text", split_re: str = LINE_SPLIT_RE
) -> DataFrame:
    """Corpus-global exact line dedup with per-document reassembly — the
    C4-style cleanup: every distinct (trimmed) line survives exactly
    once, in its first occurrence ``(doc_id, position)``; later
    occurrences anywhere in the corpus are dropped and each document is
    rebuilt from its surviving lines in order.

    Output: doc_id, n_lines, n_kept, clean (surviving lines joined by a
    single space).  Documents whose every line is a duplicate still
    appear, with ``n_kept = 0`` and ``clean = ''``.

    Scale shape: the winner per line is ``min(struct(doc_id, pos))``
    from ONE groupBy on the line fingerprint — partial aggregation
    combines map-side, so a boilerplate line repeated a billion times
    reduces to one candidate per map task *before* the shuffle (a
    window ``row_number() = 1`` over the fingerprint would funnel every
    occurrence of the hot line through one reducer — the exact skew
    this avoids).  Survivors then rejoin the lines on the fingerprint
    (AQE handles residual read-side skew) and reassemble with one
    groupBy on doc_id.  The fingerprint is full md5 (128-bit) — at
    corpus scale the shuffle moves 32-byte keys, not raw text, and
    collision odds stay negligible at any realistic line count.
    """
    lines = (
        df.select("doc_id", F.posexplode(F.split(F.col(text_col), split_re)).alias("pos", "raw"))
        .withColumn("line", F.trim("raw"))
        .filter(F.length("line") > 0)
        .select("doc_id", "pos", "line", F.md5(F.col("line")).alias("h"))
    )
    n_lines = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    winners = lines.groupBy("h").agg(F.min(F.struct("doc_id", "pos")).alias("w"))
    surv = lines.join(winners, on="h").filter(
        (F.col("doc_id") == F.col("w.doc_id")) & (F.col("pos") == F.col("w.pos"))
    )
    rebuilt = surv.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
            " ",
        ).alias("clean"),
    )
    return (
        n_lines.join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean", F.lit("")).alias("clean"),
        )
    )


def training_shuffle(
    df: DataFrame, num_shards: int, id_col: str = "doc_id", salt: str = "epoch0"
) -> DataFrame:
    """Deterministic global shuffle for training-data export: documents
    land in ``num_shards`` pseudo-random shards, pseudo-randomly ordered
    within each shard, keyed by ``md5(salt || id)`` — so the epoch's
    order is reproducible from (salt, ids) alone, independent of input
    partitioning or cluster size, and a different ``salt`` yields an
    independent permutation for the next epoch.

    Output: the input rows plus ``shard`` — repartitioned by shard and
    sorted within each shard (``sortWithinPartitions``, a per-shard
    local sort; there is NO global range sort anywhere).  Writing the
    result partitioned by ``shard`` gives the downstream trainer its
    usual sharded-and-shuffled file layout.
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = portable_hash_id(F.concat(F.lit(salt), F.col(id_col).cast("string")), num_shards)
    return (
        df.withColumn("shard", shard)
        .repartition(num_shards, "shard")
        .sortWithinPartitions(key)
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    bucket_width: int,
    quantiles: tuple[int, ...] = (25, 50, 75, 90),
) -> DataFrame:
    """Per-group quantile estimates from a fixed-width bucket histogram
    — the scale path for percentiles: one map-side-combined groupBy
    builds the histogram (bounded at groups × buckets rows), a
    dimension-sized cumulative window walks it, and the q-th quantile
    reports the lower bound of the first bucket whose cumulative count
    covers q% of the group.

    Output: <group_col>, q (int), lo (long — bucket lower bound).

    All arithmetic is integer (``cum·100 ≥ q·n`` instead of a float
    ceil), so the answer is deterministic and engine-portable.  Bucket
    width trades precision for state, never correctness — the exact
    analogue of t-digest/KLL accuracy knobs but with a bit-exact
    cross-engine oracle.
    """
    hist = (
        df.select(F.col(group_col), F.expr(f"CAST({value_col} div {bucket_width} AS BIGINT)").alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("n_docs").over(w))
    tot = hist.groupBy(group_col).agg(F.sum("n_docs").alias("n"))
    joined = cum.join(tot, on=group_col)
    qdf = joined.withColumn("q", F.explode(F.array(*[F.lit(q) for q in quantiles])))
    return (
        qdf.filter(F.col("cum") * 100 >= F.col("q") * F.col("n"))
        .groupBy(group_col, "q")
        .agg((F.min("bucket") * bucket_width).alias("lo"))
    )


def mixture_sample(
    df: DataFrame,
    targets: dict[str, int],
    group_col: str = "source",
    cost_col: str = "n_chars",
    id_col: str = "doc_id",
    grid: int = 1_000_000,
) -> DataFrame:
    """Corpus mixture sampling: down-sample each group toward a target
    cost budget (tokens/chars), the data-mixing step every multi-source
    training corpus runs ("2 parts web, 1 part code, cap wiki at N
    tokens").

    Per group, the keep fraction is ``min(1, target / Σcost)`` snapped
    to the hash grid (``floor(frac·grid)/grid`` — a deterministic
    rational both engines reproduce), applied with the zero-shuffle
    md5-hash rule of :func:`hash_fraction_sample`.  Groups without a
    target are dropped (explicit mixture only).

    Output: the sampled rows (id, group, cost).  Scale shape: ONE
    map-side-combined groupBy for the per-group totals (group-count
    rows, broadcast back), then a pure map-side filter — the corpus is
    never shuffled.  Deterministic and composable: re-running with a
    smaller target keeps a subset of the larger sample.
    """
    totals = df.groupBy(group_col).agg(F.sum(cost_col).alias("_total"))
    t_rows = [(g, int(t)) for g, t in sorted(targets.items())]
    t_df = df.sparkSession.createDataFrame(t_rows, f"{group_col} string, _target long")
    # target·grid in decimal(38,0) (HUGEINT in the oracle): int64 would
    # overflow once the target passes ~9e12 units at grid 1e6 — i.e. at
    # exactly the 100 TB-characters scale this operator exists for
    frac = F.least(
        F.lit(grid).cast("long"),
        F.expr(f"CAST(CAST(_target AS DECIMAL(38,0)) * {grid} div _total AS BIGINT)"),
    )
    cutoffs = totals.join(t_df, on=group_col).select(
        group_col, frac.alias("_cut")
    )
    keyed = df.select(id_col, group_col, cost_col).join(
        F.broadcast(cutoffs), on=group_col
    )
    bucket = portable_hash_id(F.col(id_col).cast("string"), grid)
    return keyed.filter(bucket < F.col("_cut")).select(id_col, group_col, cost_col)


def chunk_documents(
    df: DataFrame,
    size: int = 200,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-window character chunking with overlap — the RAG /
    context-window prep step that turns documents into retrievable
    passages.  Chunk ``i`` covers ``[i*stride, i*stride + size)`` with
    ``stride = size - overlap``; starts are generated while
    ``i*stride < length`` (integer arithmetic: ``(len + stride - 1)
    div stride`` starts, exact in both engines — no float ceil).

    Pure map-side (sequence → posexplode → substring): zero shuffle at
    any corpus size; chunk counts derive from ``length(text)`` itself,
    not a metadata column that could drift from the payload.  Empty
    documents produce no chunks.
    """
    stride = size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than size")
    n = F.expr(f"(length({text_col}) + {stride - 1}) div {stride}")
    return (
        df.filter(F.length(text_col) > 0)
        .select(
            id_col,
            F.posexplode(F.sequence(F.lit(0), n - 1)).alias("chunk_id", "_i"),
            F.col(text_col),
        )
        .select(
            id_col,
            "chunk_id",
            F.expr(f"substring({text_col}, chunk_id * {stride} + 1, {size})").alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


def weighted_sample(
    df: DataFrame,
    k: int = 5,
    weight_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement, k per group
    (sequential Poisson sampling, Ohlsson 1998): each row gets priority
    ``hash(id) / weight`` and the k smallest priorities win, so
    inclusion probability is ≈ proportional to weight — the standard
    upweight-quality-sources primitive for corpus mixtures when exact
    per-source budgets (see :func:`mixture_sample`) are too coarse.

    Engine-portable by construction: the 60-bit md5 hash → double
    conversion and one IEEE division are both correctly-rounded single
    operations, bit-identical in Spark and DuckDB; ties (impossible
    unless hashes collide) break on id.  One shuffle on the group key;
    at huge-group scale pre-thin with a per-group priority threshold
    filter (map-side) before the exact window, the same escape hatch
    as :func:`stratified_topk_sample`.
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    prio = h.cast("double") / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(F.col("_prio"), F.col(id_col))
    return (
        df.select(id_col, group_col, weight_col, prio.alias("_prio"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col, group_col, weight_col)
    )


def merge_pair_counts(df: DataFrame, k: int = 40, text_col: str = "text") -> DataFrame:
    """Top-k adjacent word pairs by corpus frequency — the candidate
    scoring step of a BPE/WordPiece merge round (at word granularity:
    which pairs co-occur often enough to fuse).

    Map-side pair construction (a higher-order ``transform`` over the
    token array — zero Python), one map-side-combined groupBy on the
    pair, and a TakeOrdered top-k so no global sort materializes the
    full pair vocabulary.  Ties break lexicographically so the cut is
    deterministic.  Output: ``w1, w2, n_pairs``.
    """
    # guard size >= 2 BEFORE sequence(1, size-1): Spark's sequence is
    # bidirectional, so sequence(1, 0) silently yields [1, 0] and the
    # 0 index would fault under ANSI element_at
    words = with_words(df, text_col).filter(F.size("words") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1),"
                " i -> struct(element_at(words, i) AS w1,"
                "             element_at(words, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counted = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pairs"))
    return counted.orderBy(F.desc("n_pairs"), "w1", "w2").limit(k)


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split0",
    grid: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in
    exactly one named split by where its salted id hash falls in
    cumulative fraction ranges of the hash grid — the dataset-split
    primitive of an ML data pipeline.

    Properties the naive ``randomSplit`` lacks: reproducible across
    runs, engines, and partitionings (the hash is a pure function of
    (salt, id)); disjoint and exhaustive by construction (half-open
    ranges over one hash draw); stable under appends (an old row's
    split never changes when new rows arrive); and re-saltable — a new
    ``salt`` is a fresh independent split.  Zero shuffle: pure map-side
    expression.

    ``fractions`` maps split name → fraction; they must sum to ≤ 1
    (any remainder is an implicit holdout named ``__rest``).
    Output: input columns + ``split``.
    """
    from pyspark_pipelining_spark.operators.dedup import portable_hash_id

    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = portable_hash_id(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")), grid
    )
    expr = None
    lo = 0
    for name, frac in fractions.items():  # insertion order = range order
        hi = lo + int(frac * grid)
        cond = bucket < hi if expr is None else bucket.between(lo, hi - 1)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn("split", expr.otherwise(F.lit("__rest")))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    q: int = 1_000_000,
) -> DataFrame:
    """DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling") —
    the published data-curation rung beside quality filtering
    (:func:`text.lm_bigram_score`) and mixture sampling
    (:func:`mixture_sample`): score every RAW document by how much
    more likely its hashed word-bigram bag is under the TARGET
    distribution than under the raw distribution, so a later resample
    (:func:`dsir_resample`) shifts the corpus toward the target domain
    without training a classifier.

    Semantics (deterministic, oracle-replayable):

    1. tokenize both sides with the repo's word convention
       (``with_words``) and hash each adjacent word BIGRAM occurrence
       to one of ``buckets`` slots via the portable 60-bit md5 hash —
       the paper's hashed n-gram generative model, bigrams because
       unigrams alone lose word order and the corpus shares one small
       word pool;
    2. bucket histograms per side (Laplace +1 smoothing, so a bucket
       unseen in either side still has finite log-probability), giving
       per-bucket quantized log-likelihood-ratios
       ``lam_q = round(q * (ln(ct_b + 1) - ln(Tt + B)
       - ln(cr_b + 1) + ln(Tr + B)))`` — one int64 per bucket, the
       ``lm_score`` ln-quantization convention, so every downstream
       sum is exact integer arithmetic both engines replay
       bit-identically;
    3. a raw document's log-importance-weight is the sum of its
       occurrences' ``lam_q`` — duplicate documents get identical
       weights by construction (a pure function of the text).

    Scale shape: hashing is pure map-side expression work (no Python);
    the two histograms are B-bounded aggregates (map-side combine →
    ~B rows each, B = 4096 default); the λ table is ≤ B rows and
    BROADCAST into the per-occurrence join, so the only corpus-sized
    shuffle is the final per-document sum, keyed by ``id_col`` — at
    100 TB the weight stage costs one bounded shuffle, and the
    histograms cost none that grow with the corpus.  Totals enter via
    a 1-row lazy crossJoin (no ``collect``).

    r17 (revising r16; guide §5, r16 verdict item 1): only the
    B-BOUNDED merged histogram is persisted.  The r16 shape also
    persisted the corpus-sized raw occurrence stream to collapse the
    histogram and scoring passes into one — but default-storage
    caching of a per-occurrence frame is exactly the §5 anti-pattern
    at 100 TB (the persist spills the whole stream to executor
    memory/disk; writing + re-reading it costs about a full pass
    anyway, plus cache pressure), and the measured sf0.1 A/B agrees:
    histogram-only persist runs FASTER (1.89 vs 2.03 s median
    interleaved; a pre-aggregated (doc, bucket, count) persist variant
    was also measured and lost at 2.40 s — its extra (doc, bucket)
    exchange outweighs the saved tokenize pass locally).  The raw
    tokenize+hash pipeline therefore runs twice (histogram pass +
    scoring pass) — two cheap map-side scans, stage-parallel on idle
    cores — while the histogram → totals → λ triple-recompute stays
    collapsed by the tiny histogram persist.

    Output: one row per RAW document — ``id_col``, ``n_grams``
    (bigram occurrences, BIGINT; 0-gram docs kept with weight 0),
    ``logweight_q6`` (BIGINT, quantized at ``q``), ``logweight``
    (boundary double, 6dp).
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")

    def occs(df: DataFrame) -> DataFrame:
        words = with_words(df, text_col).filter(F.size("words") >= 2)
        grams = words.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(words) - 1),"
                    " i -> concat(element_at(words, i), ' ',"
                    "             element_at(words, i + 1)))"
                )
            ).alias("gram"),
        )
        return grams.select(
            id_col, portable_hash_id(F.col("gram"), buckets).alias("bucket")
        )

    # the merged histogram frame feeds BOTH the totals and the λ
    # projection — persist it once (cache.keep, ≤ B rows; released by
    # the caller's bench/DAG scope).  The raw occurrence stream is
    # deliberately NOT persisted (r17): its two consumers (histogram,
    # scoring join) each re-run the map-side tokenize+hash scan, which
    # is cheaper at every scale than caching a corpus-sized
    # per-occurrence frame (see docstring for the measurements).
    raw_occs = occs(raw)
    tgt_occs = occs(target)
    raw_hist = raw_occs.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt_hist = tgt_occs.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    hists = cache.keep(
        raw_hist.join(tgt_hist, "bucket", "full_outer").select(
            "bucket",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    # 1-row lazy totals over the B-bounded merged histogram (absent
    # buckets contribute zero count, so these equal the per-side
    # totals); coalesce: an empty side must mean total 0, not a NULL
    # that silently nulls every λ (degenerate but model-defined)
    raw_tot = hists.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("tr"))
    tgt_tot = hists.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    lam = (
        hists
        .crossJoin(raw_tot)
        .crossJoin(tgt_tot)
        .select(
            "bucket",
            F.round(
                (
                    F.log(F.col("ct") + 1)
                    - F.log(F.col("tt") + buckets)
                    - F.log(F.col("cr") + 1)
                    + F.log(F.col("tr") + buckets)
                )
                * q
            )
            .cast("long")
            .alias("lam_q"),
        )
    )
    scored = (
        raw_occs.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lam_q").alias("logweight_q6"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("logweight_q6", F.lit(0)).cast("long").alias("logweight_q6"),
            F.round(F.coalesce("logweight_q6", F.lit(0)) / q, 6).alias("logweight"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int = 64,
    salt: str = "dsir0",
    id_col: str = "doc_id",
    weight_q_col: str = "logweight_q6",
    q: int = 1_000_000,
) -> DataFrame:
    """Gumbel top-k importance resampling over :func:`dsir_logweights`
    output — the paper's "sample without replacement with probability
    ∝ importance weight" step, derandomized: each document's Gumbel
    noise ``g = -ln(-ln(u))`` comes from the salted portable hash,
    quantized at ``q`` like the weight, and the k largest
    ``key_q6 = logweight_q6 + gumbel_q6`` win — the Gumbel-max theorem
    makes that exactly a weighted sample without replacement, yet
    reproducible across runs, engines, and partitionings (re-salt for
    a fresh draw).

    ``u = (h mod 2^52 + 1) / (2^52 + 1)``: both operands are exactly
    representable doubles (< 2^53), so u is ONE correctly-rounded
    division — bit-identical in both engines — and strictly inside
    (0, 1) (the raw 60-bit hash over 2^60 + 1 would round u to exactly
    1.0 for top hash values, and ``-ln(-ln(1))`` is infinite).

    Scale shape: the key is one map-side expression; selection is a
    global top-k (``orderBy(...).limit(k)`` → TakeOrdered — per-
    partition heaps, never a full sort/shuffle of the corpus).

    Output: ``id_col``, ``logweight_q6``, ``key_q6``, ``rank`` —
    rank 1 = largest key, id tiebreak (integer keys can tie).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    grid = 1 << 52
    h = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(grid),
    )
    u = (h + 1) / F.lit(float(grid + 1))
    gumbel_q = F.round(-F.log(-F.log(u)) * q).cast("long")
    keyed = weights.select(
        id_col,
        weight_q_col,
        (F.col(weight_q_col) + gumbel_q).alias("key_q6"),
    )
    top = keyed.orderBy(F.desc("key_q6"), id_col).limit(k)
    w = Window.orderBy(F.desc("key_q6"), id_col)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def unimax_allocation(
    counts: DataFrame,
    max_epochs: int = 1,
    budget: int | None = None,
    budget_frac: tuple[int, int] | None = None,
    source_col: str = "source",
    count_col: str = "n_chars",
) -> DataFrame:
    """UniMax-style per-source budget allocation (Chung et al. 2023,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining") — the published mixing
    policy a 100 TB corpus owner runs ABOVE :func:`mixture_sample`'s
    fixed fractions: spread a total training budget UNIFORMLY across
    sources, except no source may exceed ``max_epochs`` repeats of its
    available data; the budget freed by capped (small) sources
    redistributes uniformly over the rest.  Equivalently: per-source
    allocation ``min(cap_i, L)`` with the water level ``L`` solving
    ``Σ min(cap_i, L) = B``.

    Exact integer waterfill (no floats anywhere): sort sources by
    ``cap = max_epochs · n`` (name tiebreak); the capped prefix ends at
    the first index k where ``cap_k · (m − k + 1) ≥ B − prefix_{k−1}``
    (the condition is monotone in k, the classic waterfill argument);
    uncapped sources take ``base = (B − prefix_{k−1}) div (m − k + 1)``
    tokens with the division remainder handed to the first ``r`` of
    them in sort order — so ``Σ alloc = B`` EXACTLY whenever
    ``Σ cap ≥ B``, and everything is int64 arithmetic both engines
    replay bit-identically.  If the budget exceeds every cap, all
    sources allocate their cap and the leftover is the caller's signal
    to raise ``max_epochs``.

    ``budget`` is an absolute count; ``budget_frac = (p, q)`` instead
    derives ``B = (Σ n) · p div q`` INSIDE the plan (1-row lazy
    cross-joined aggregate — scale-relative budgets never collect).

    Scale shape: one aggregation shuffle to the per-source counts
    frame (m rows — sources, languages, domains: thousands at most);
    the waterfill itself is window work over that m-row frame (the
    global windows are over m rows, never the corpus).  Output:
    ``source, n_avail, cap, alloc, epochs, is_capped`` — alloc/cap
    BIGINT, ``epochs = alloc/n`` the one boundary double.
    """
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    if (budget is None) == (budget_frac is None):
        raise ValueError("exactly one of budget / budget_frac required")
    c = counts.select(
        F.col(source_col).alias("source"),
        F.col(count_col).cast("long").alias("n_avail"),
    ).withColumn("cap", F.col("n_avail") * max_epochs)
    tot = c.agg(
        F.count(F.lit(1)).alias("_m"), F.sum("n_avail").alias("_ntot")
    )  # 1 row, lazy
    if budget is not None:
        if budget < 0:
            raise ValueError(f"budget must be >= 0, got {budget}")
        b_expr = F.lit(int(budget))
    else:
        p, q = budget_frac
        if p < 0 or q <= 0:
            raise ValueError(f"budget_frac must be a non-negative fraction, got {budget_frac}")
        b_expr = F.expr(f"div(_ntot * {p}, {q})")
    wo = Window.orderBy("cap", "source")
    wf = Window.partitionBy(F.lit(1))  # full m-row frame
    ranked = (
        c.crossJoin(tot)
        .withColumn("B", b_expr)
        .withColumn("idx", F.row_number().over(wo).cast("long"))
        .withColumn(
            "pfx",
            F.coalesce(
                F.sum("cap").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("rem", F.col("B") - F.col("pfx"))
        .withColumn("denom", F.col("_m") - F.col("idx") + 1)
        .withColumn("ok", F.col("cap") * F.col("denom") >= F.col("rem"))
    )
    # the flagged set is a suffix; row k has the LARGEST rem/denom in it
    rem_k = F.max(F.when(F.col("ok"), F.col("rem"))).over(wf)
    denom_k = F.max(F.when(F.col("ok"), F.col("denom"))).over(wf)
    solved = ranked.select(
        "source",
        "n_avail",
        "cap",
        "idx",
        rem_k.alias("rem_k"),
        denom_k.alias("denom_k"),
    )
    k = F.col("denom_k").isNotNull()
    base = F.expr("div(rem_k, denom_k)")
    r = F.col("rem_k") - base * F.col("denom_k")
    # k (the first uncapped index) = m - denom_k + 1, recovered from the
    # suffix length so no extra join is needed
    k_start = F.max("idx").over(Window.partitionBy(F.lit(1))) - F.col("denom_k") + 1
    alloc = (
        F.when(~k, F.col("cap"))  # budget exceeds every cap
        .when(F.col("idx") < k_start, F.col("cap"))  # capped prefix
        .otherwise(base + F.when(F.col("idx") - k_start < r, 1).otherwise(0))
    )
    return solved.select(
        "source",
        "n_avail",
        "cap",
        alloc.cast("long").alias("alloc"),
        F.when(
            F.col("n_avail") > 0,
            F.round(alloc / F.col("n_avail"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("epochs"),
        F.when(~k | (F.col("idx") < k_start), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_capped"),
    )


def ccnet_ppl_buckets(
    docs: DataFrame,
    bin_w: int = 2_000,
    offset: int = 10_000_000,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """CCNet-style perplexity-bucket filtering (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data") — the published LM-quality rung ABOVE the raw score
    (:func:`text.lm_bigram_score` is the repo's KenLM stand-in): split
    each source's documents into ``head`` / ``middle`` / ``tail``
    thirds of the per-source score distribution and keep head+middle,
    exactly CCNet's per-language percentile cut (the paper computes
    per-language perplexity histograms and cuts at the 33%/66%
    points; ``source`` is this corpus's language analog).

    Semantics (deterministic, oracle-replayable):

    1. per-doc quality score = the char-bigram LM mean log-prob,
       re-quantized to ONE int64 per doc:
       ``score_q6 = round(total_q6 / n_bigrams)`` — a single
       correctly-rounded double division of two exact ints, so both
       engines compute the identical integer (higher = better; CCNet's
       perplexity ordering with the sign flipped);
    2. integer histogram: ``bin = (score_q6 + offset) div bin_w``
       (both Spark's ``div`` and DuckDB's ``//`` truncate toward zero
       on BIGINT, so the engines agree for any operand sign — but a
       sub-``-offset`` score would silently fold into bin 0's
       neighborhood IDENTICALLY on both sides, the oracle-blind
       failure class ``_gopher_pack`` guards against, so the
       positivity envelope is enforced at runtime with a JVM-side
       ``raise_error`` branch) — mirrors CCNet's practice of binning
       perplexities to integers before taking percentiles;
    3. per-source cutoff bins: the smallest bins t1, t2 where the
       ascending cumulative count reaches 1/3 and 2/3 of the source's
       documents (``3·cum ≥ n`` / ``3·cum ≥ 2n`` — integer
       comparisons, no division); every document in a boundary bin
       gets the boundary's bucket, the histogram-cut semantics;
    4. bucket: ``bin ≤ t1 → 'tail'``, ``≤ t2 → 'middle'``, else
       ``'head'``; ``kept = bucket != 'tail'`` (CCNet keeps
       head+middle for most languages).

    Scale shape: the score reuses ``lm_bigram_score``'s one bounded
    model pass; the histogram is a (source × ~O(score-range/bin_w))
    BOUNDED aggregate — the per-source cumulative window runs over
    bin rows, never document rows (a per-source document rank would
    be an unbounded hot-key window; the histogram cut is both
    CCNet-faithful and the only shape that survives a 100 TB source);
    the cutoff table is |sources| rows, broadcast back.  The only
    corpus-sized shuffles are lm_bigram_score's per-doc sum and the
    final doc-keyed cutoff join (map-side after the broadcast).

    Output: one row per scored doc — ``doc_id, source, score_q6, bin,
    bucket, kept`` (ints BIGINT, kept 0/1 BIGINT).
    """
    from pyspark_pipelining_spark.operators.text import lm_bigram_score

    lm = lm_bigram_score(docs, text_col=text_col)
    scored = lm.join(docs.select("doc_id", source_col), "doc_id").select(
        "doc_id",
        source_col,
        F.round(F.col("total_q6") / F.col("n_bigrams"))
        .cast("long")
        .alias("score_q6"),
    )
    # positivity envelope, enforced like _gopher_pack: a score below
    # -offset would land in bin 0's neighborhood identically on both
    # engines (oracle-blind), so fail the job loudly instead
    guarded = F.when(
        F.col("score_q6") + F.lit(int(offset)) >= 0, F.col("score_q6")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "ccnet_ppl_buckets: score_q6 %s below -offset "
                f"{int(offset)}; bin arithmetic would fold sub-offset "
                "scores together",
                F.col("score_q6"),
            )
        ).cast("long")
    )
    binned = scored.withColumn("score_q6", guarded).withColumn(
        "bin", F.expr(f"(score_q6 + {int(offset)}) div {int(bin_w)}")
    )
    hist = binned.groupBy(source_col, "bin").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(source_col).orderBy("bin")
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.groupBy(source_col).agg(F.sum("c").alias("n"))
    cuts = (
        cum.join(tot, source_col)
        .groupBy(source_col)
        .agg(
            F.min(F.when(3 * F.col("cum") >= F.col("n"), F.col("bin"))).alias("t1"),
            F.min(
                F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("bin"))
            ).alias("t2"),
        )
    )
    bucket = (
        F.when(F.col("bin") <= F.col("t1"), F.lit("tail"))
        .when(F.col("bin") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return (
        binned.join(F.broadcast(cuts), source_col)
        .select(
            "doc_id",
            source_col,
            "score_q6",
            "bin",
            bucket.alias("bucket"),
            (bucket != "tail").cast("long").alias("kept"),
        )
    )
