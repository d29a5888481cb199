"""Beyond-reference query registry: dedup, similarity search, text
analysis, multimodal plumbing (merged into the driver contract by
``queries.py``).

Oracle-parity notes: the dedup/simhash correctness variants use
md5-derived token ids (portable across engines; see operators/dedup.py);
cosine scores are rounded to 6dp before ranking so float→double cast
noise cannot flip a comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipelining_spark.operators import dedup, multimodal, similarity, text
from pyspark_pipelining_spark.sources.registry import load_table

MERSENNE = dedup.MERSENNE

# ---------------------------------------------------------------------------
# Shared oracle fragments
# ---------------------------------------------------------------------------

SQL_WORDS = """
words AS (
    SELECT doc_id, lang, source, n_chars, text,
           string_split_regex(lower(text), ' +') AS w
    FROM documents
)"""

SQL_BIGRAMS = f"""{SQL_WORDS},
grams AS (
    SELECT doc_id, source,
           list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                          i -> w[i] || ' ' || w[i + 1]) AS ngrams
    FROM words
)"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(load_table(spark, sf_dir, "documents"))


SQL_TEXT_FINGERPRINT = f"""
WITH {SQL_WORDS},
codes AS (
    SELECT doc_id,
           list_transform(w, x -> CAST(length(x) * 31 + ascii(x) AS BIGINT)) AS cs
    FROM words
)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
                   (a, b) -> (a * 31 + b) % {text.FNV_MOD}) AS fingerprint
FROM codes
"""


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_count(load_table(spark, sf_dir, "documents"))


SQL_TEXT_TOKENS = """
SELECT doc_id,
       CAST(len(string_split_regex(lower(text), ' +')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS subword_tokens
FROM documents
"""


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(load_table(spark, sf_dir, "documents"))


def _lang_fragments() -> tuple[list[str], str]:
    """(per-language score expressions, argmax pred_lang CASE expr)."""
    score_cols = []
    for lang in sorted(text.STOPWORDS):
        lst = ", ".join(f"'{w}'" for w in text.STOPWORDS[lang])
        score_cols.append(
            f"len(list_filter(w, x -> list_contains([{lst}], x))) / len(w) AS score_{lang}"
        )
    langs = sorted(text.STOPWORDS)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return score_cols, pred


def _sql_lang_scores() -> str:
    score_cols, pred = _lang_fragments()
    langs = sorted(text.STOPWORDS)
    return f"""
WITH {SQL_WORDS},
scored AS (SELECT doc_id, {', '.join(score_cols)} FROM words)
SELECT doc_id, {', '.join(f'score_{lang}' for lang in langs)}, {pred} AS pred_lang
FROM scored
"""


SQL_TEXT_LANGUAGE_ID = _sql_lang_scores()


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(load_table(spark, sf_dir, "documents"))


_EN = ", ".join(f"'{w}'" for w in text.STOPWORDS["en"])
SQL_TEXT_QUALITY = f"""
WITH {SQL_WORDS},
feats AS (
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_words,
           length(text) / len(w) AS mean_word_len,
           len(list_filter(w, x -> list_contains([{_EN}], x))) / len(w) AS stopword_ratio,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text) AS alpha_ratio
    FROM words
)
SELECT doc_id, n_words, mean_word_len, stopword_ratio, alpha_ratio,
       least(n_words / 100.0, 1.0) * 0.25 + alpha_ratio * 0.5
         + least(stopword_ratio * 5.0, 1.0) * 0.25 AS quality
FROM feats
"""


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"), ["text"])


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def _minhash_fragments(num_hashes: int = 16, bands: int = 8) -> tuple[str, str, str]:
    """Shared DuckDB fragments: (signature CTE chain, band-match
    predicate, agreement-count expression)."""
    rows = num_hashes // bands
    coeffs = dedup.minhash_coeffs(num_hashes)
    mins = ",\n           ".join(
        f"min((sid * {a} + {b}) % {MERSENNE}) AS h{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_match = " OR ".join(
        "("
        + " AND ".join(f"a.h{j} = b.h{j}" for j in range(bd * rows, (bd + 1) * rows))
        + ")"
        for bd in range(bands)
    )
    agree = " + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(num_hashes))
    ctes = f"""{SQL_BIGRAMS},
shing AS (SELECT DISTINCT doc_id, unnest(ngrams) AS shingle FROM grams),
ds AS (
    SELECT doc_id,
           ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MERSENNE} AS sid
    FROM shing
),
sig AS (
    SELECT doc_id,
           {mins}
    FROM ds GROUP BY doc_id
)"""
    return ctes, band_match, agree


def _sql_minhash(num_hashes: int = 16, bands: int = 8) -> str:
    ctes, band_match, agree = _minhash_fragments(num_hashes, bands)
    return f"""
WITH {ctes}
SELECT a.doc_id AS doc_1, b.doc_id AS doc_2,
       ({agree}) / {num_hashes}.0 AS est_jaccard
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_match})
"""


SQL_DEDUP_MINHASH = _sql_minhash()


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering: LSH candidate pairs (est Jaccard
    ≥ 0.5) → connected components by min-id label propagation → every
    document labeled with its cluster's min doc id.

    Shares its whole pipeline with ``dedup_impact``; each query reruns
    it because the driver contract requires independent queries — a
    production DAG materializes the cluster labels ONCE (plans/dag.py
    idempotent task materialization) and both reports read the table."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    return dedup.dedup_clusters(docs, pairs)


def _sql_dedup_clusters(threshold: float = 0.5, num_hashes: int = 16, bands: int = 8) -> str:
    # The oracle computes component min-ids with a recursive reachability
    # CTE (UNION dedups, so it terminates); fine at oracle scale, while
    # the engine side uses bounded label propagation.
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
comp AS (SELECT doc_id, min(lbl) AS cluster_id FROM walk GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


SQL_DEDUP_CLUSTERS = _sql_dedup_clusters()


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep pipeline as ONE query:
    quality-score + language-ID every document, cluster near-duplicates
    (LSH → components), and keep only high-quality English cluster
    representatives — what a corpus owner actually runs before
    tokenizing 100 TB.

    Every stage shares the scan; the only shuffles are the LSH
    band-bucket join, the component propagation, and the final
    doc_id-keyed joins (co-partitioned).
    """
    docs = load_table(spark, sf_dir, "documents")
    qual = text.quality_score(docs).select("doc_id", "quality")
    lang = text.language_id(docs).select("doc_id", "pred_lang")
    pairs = dedup.minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    clusters = dedup.dedup_clusters(docs, pairs)
    return (
        docs.select("doc_id", "source")
        .join(qual, "doc_id")
        .join(lang, "doc_id")
        .join(clusters, "doc_id")
        .filter(
            (F.col("quality") >= 0.5)
            & (F.col("pred_lang") == "en")
            & (F.col("cluster_id") == F.col("doc_id"))
        )
        .select("doc_id", "source", "pred_lang", "quality")
    )


def _sql_corpus_prep(threshold: float = 0.5) -> str:
    ctes, band_match, agree = _minhash_fragments()
    score_cols, pred = _lang_fragments()
    return f"""
WITH RECURSIVE {ctes},
pairs AS (
    SELECT a.doc_id AS doc_1, b.doc_id AS doc_2
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_match})
    WHERE ({agree}) / 16.0 >= {threshold}
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
feats AS (
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_words,
           len(list_filter(w, x -> list_contains([{_EN}], x))) / len(w) AS stopword_ratio,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text) AS alpha_ratio
    FROM words
),
qual AS (
    SELECT doc_id,
           least(n_words / 100.0, 1.0) * 0.25 + alpha_ratio * 0.5
             + least(stopword_ratio * 5.0, 1.0) * 0.25 AS quality
    FROM feats
),
scored AS (SELECT doc_id, {', '.join(score_cols)} FROM words),
lang AS (SELECT doc_id, {pred} AS pred_lang FROM scored)
SELECT d.doc_id, d.source, l.pred_lang, q.quality
FROM documents d
JOIN qual q USING (doc_id)
JOIN lang l USING (doc_id)
LEFT JOIN comp c USING (doc_id)
WHERE q.quality >= 0.5 AND l.pred_lang = 'en'
  AND coalesce(c.cluster_id, d.doc_id) = d.doc_id
"""


SQL_CORPUS_PREP = _sql_corpus_prep()


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(load_table(spark, sf_dir, "documents"))


def _sql_simhash(bits: int = 32) -> str:
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(bits)
    )
    total = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    return f"""
WITH {SQL_WORDS},
toks AS (SELECT DISTINCT doc_id, unnest(w) AS token FROM words),
h AS (
    SELECT doc_id,
           ('0x' || substr(md5(token), 1, 15))::BIGINT % 4294967296 AS h
    FROM toks
),
bs AS (
    SELECT doc_id,
           {bit_sums}
    FROM h GROUP BY doc_id
)
SELECT doc_id, {total} AS simhash FROM bs
"""


SQL_DEDUP_SIMHASH = _sql_simhash()


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=2, group_col="source", threshold=0.2
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {SQL_BIGRAMS},
gset AS (SELECT DISTINCT doc_id, source AS grp, unnest(ngrams) AS g FROM grams),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM gset GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_1, b.doc_id AS doc_2, count(*) AS i
    FROM gset a JOIN gset b ON a.grp = b.grp AND a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_1, doc_2, i / (s1.n_grams + s2.n_grams - i) AS jaccard
FROM inter
JOIN sizes s1 ON inter.doc_1 = s1.doc_id
JOIN sizes s2 ON inter.doc_2 = s2.doc_id
WHERE i / (s1.n_grams + s2.n_grams - i) >= 0.2
"""


def q_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-wide 4-gram-Jaccard ≥ 0.8 self-join via prefix
    filtering (operators/dedup.prefix_jaccard_join — AllPairs/PPJoin):
    deterministic and recall-lossless where MinHash-LSH is
    probabilistic, with candidates pruned to rare-shingle prefix
    collisions instead of a blocking key.  4-gram shingles because
    prefix filtering needs a discriminative vocabulary: this corpus
    has only ~900 distinct bigrams, so every bigram is frequent and
    prefixes prune nothing (measured 36 s at sf0.1), while the ~200k
    4-grams restore rare-first selectivity (5 s, identical pair set).
    The oracle is the brute-force all-pairs join — the prefix filter
    must lose NOTHING."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_jaccard_join(docs, threshold=0.8, n=4).orderBy(
        "doc_1", "doc_2"
    )


SQL_FOURGRAMS = f"""{SQL_WORDS},
grams AS (
    SELECT doc_id, source,
           list_transform(range(1, greatest(len(w) - 3, 0) + 1),
                          i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3]) AS ngrams
    FROM words
)"""


SQL_JACCARD_PREFIX_PAIRS = f"""
WITH {SQL_FOURGRAMS},
gset AS (SELECT DISTINCT doc_id, unnest(ngrams) AS g FROM grams),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM gset GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_1, b.doc_id AS doc_2, count(*) AS i
    FROM gset a JOIN gset b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_1, doc_2,
       round(i / (s1.n_grams + s2.n_grams - i), 6) AS jaccard
FROM inter
JOIN sizes s1 ON inter.doc_1 = s1.doc_id
JOIN sizes s2 ON inter.doc_2 = s2.doc_id
WHERE i / (s1.n_grams + s2.n_grams - i) >= 0.8
ORDER BY doc_1, doc_2
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

DIM = 64
N_QUERIES = 3
TOPK = 5


def _query_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def q_sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _query_vecs(spark, sf_dir), k=TOPK)


_DOT = "list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.query_vec AS DOUBLE[]))"
_NE = "sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
_NQ = "sqrt(list_dot_product(CAST(q.query_vec AS DOUBLE[]), CAST(q.query_vec AS DOUBLE[])))"
SQL_SIM_BRUTEFORCE_TOPK = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < {N_QUERIES}
),
pairs AS (
    SELECT q.query_id, e.vec_id,
           round({_DOT} / ({_NE} * {_NQ}), 6) AS cosine
    FROM embeddings e, q WHERE e.vec_id != q.query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
    FROM pairs
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {TOPK}
"""


def _sql_bucket(vec_expr: str, num_planes: int, offset: int = 0) -> str:
    planes = []
    for bit, p in enumerate(range(offset, offset + num_planes)):
        dot = (
            f"round(list_sum(list_transform(range(0, {DIM}), "
            f"i -> CAST({vec_expr}[i + 1] AS DOUBLE) * (((i * 31 + {p} * 17 + 7) % 7) - 3))), 6)"
        )
        planes.append(f"CASE WHEN {dot} > 0 THEN {1 << bit} ELSE 0 END")
    return " + ".join(planes)


def q_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_cosine_topk(emb, _query_vecs(spark, sf_dir), k=TOPK, num_planes=8, dim=DIM)


SQL_SIM_LSH_TOPK = f"""
WITH corpus AS (
    SELECT *, {_sql_bucket('embedding', 8)} AS bucket FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, embedding AS query_vec, {_sql_bucket('embedding', 8)} AS bucket
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
pairs AS (
    SELECT q.query_id, e.vec_id,
           round({_DOT} / ({_NE} * {_NQ}), 6) AS cosine
    FROM corpus e JOIN q ON e.bucket = q.bucket AND e.vec_id != q.query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
    FROM pairs
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {TOPK}
"""


LSH_MT_PLANES = 4
LSH_MT_TABLES = 4


def q_sim_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane LSH (operators/similarity.lsh_cosine_topk
    with num_tables>1): a true neighbor only needs to collide in ONE of
    the independent tables, so recall rises with table count while the
    candidate join stays (table, bucket)-pruned — the standard
    recall-at-scale lever single-signature LSH lacks (fixture recall
    0.0 → 0.4 at p=4, L=4; see test_lsh_recall_floors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_cosine_topk(
        emb,
        _query_vecs(spark, sf_dir),
        k=TOPK,
        num_planes=LSH_MT_PLANES,
        dim=DIM,
        num_tables=LSH_MT_TABLES,
    )


def _sql_lsh_multitable() -> str:
    matches = "\nUNION ALL\n".join(
        f"    SELECT q.query_id, e.vec_id\n"
        f"    FROM corpus e JOIN q ON "
        f"{_sql_bucket('e.embedding', LSH_MT_PLANES, t * LSH_MT_PLANES)}"
        f" = {_sql_bucket('q.query_vec', LSH_MT_PLANES, t * LSH_MT_PLANES)}"
        f" AND e.vec_id != q.query_id"
        for t in range(LSH_MT_TABLES)
    )
    return f"""
WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
q AS (
    SELECT vec_id AS query_id, embedding AS query_vec
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
cand AS (
    SELECT DISTINCT query_id, vec_id FROM (
{matches}
    )
),
pairs AS (
    SELECT c.query_id, c.vec_id,
           round({_DOT} / ({_NE} * {_NQ}), 6) AS cosine
    FROM cand c
    JOIN embeddings e ON c.vec_id = e.vec_id
    JOIN (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings
          WHERE vec_id < {N_QUERIES}) q ON c.query_id = q.query_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
    FROM pairs
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {TOPK}
"""


SQL_SIM_LSH_MULTITABLE = _sql_lsh_multitable()


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, _query_vecs(spark, sf_dir), k=TOPK, cells=8, nprobe=2, dim=DIM
    )


def _sql_ivf_score(vec_expr: str, j: int) -> str:
    return (
        f"round(list_sum(list_transform(range(0, {DIM}), "
        f"i -> CAST({vec_expr}[i + 1] AS DOUBLE) * (((i * 13 + {j} * 29 + 5) % 11) - 5))), 6)"
    )


def _sql_ivf(cells: int = 8, nprobe: int = 2) -> str:
    corp_scores = [_sql_ivf_score("embedding", j) for j in range(cells)]
    best = "greatest(" + ", ".join(f"s{j}" for j in range(cells)) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN s{j} = {best} THEN {j}" for j in range(cells)
    ) + " END"
    score_cols = ", ".join(f"{s} AS s{j}" for j, s in enumerate(corp_scores))
    probe_rows = " UNION ALL ".join(
        f"SELECT query_id, query_vec, {j} AS cell, s{j} AS score FROM qs" for j in range(cells)
    )
    return f"""
WITH scored AS (SELECT vec_id, embedding, {score_cols} FROM embeddings),
corpus AS (SELECT vec_id, embedding, {argmax} AS cell FROM scored),
qs AS (
    SELECT vec_id AS query_id, embedding AS query_vec, {score_cols}
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
probes_all AS ({probe_rows}),
probes AS (
    SELECT * FROM (
        SELECT query_id, query_vec, cell,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cell ASC) AS pr
        FROM probes_all
    ) WHERE pr <= {nprobe}
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


SQL_SIM_IVF_TOPK = _sql_ivf()


def q_sim_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(emb, threshold=0.2, num_planes=6, dim=DIM)


_DOT_AB = "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
_NA = "sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
_NB = "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))"
SQL_SIM_NEAR_DUP = f"""
WITH sig AS (
    SELECT *, {_sql_bucket('embedding', 6)} AS bucket FROM embeddings
)
SELECT a.vec_id AS id_1, b.vec_id AS id_2,
       round({_DOT_AB} / ({_NA} * {_NB}), 6) AS cosine
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({_DOT_AB} / ({_NA} * {_NB}), 6) >= 0.2
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.documents_as_media(docs))
    # Flatten the feature vector to scalar columns: the driver's
    # canonicalizer hash-compares pandas columns, and array cells are
    # unhashable there.  f0..f3 is also the friendlier report shape.
    return feats.select(
        "media_id",
        "byte_len",
        "checksum",
        F.col("feature")[0].alias("f0"),
        F.col("feature")[1].alias("f1"),
        F.col("feature")[2].alias("f2"),
        F.col("feature")[3].alias("f3"),
    )


# Byte-based oracle: decode_stub sums UTF-8 payload *octets*, so the SQL
# must too (codepoint ascii() would diverge on any non-ASCII text).
# DuckDB: hex(encode(text)) then read 2-char pairs as ints.
SQL_MEDIA_FEATURES = """
WITH hexed AS (
    SELECT doc_id, hex(encode(text)) AS h,
           CAST(octet_length(encode(text)) AS BIGINT) AS n
    FROM documents
),
sums AS (
    SELECT doc_id, n,
           CAST(COALESCE(list_sum(list_transform(range(1, n + 1),
                    i -> ('0x' || substr(h, CAST(2*i-1 AS INTEGER), 2))::BIGINT)), 0)
               % 1000000007 AS BIGINT) AS checksum,
           CASE WHEN n = 0 THEN 0 ELSE ('0x' || substr(h, 1, 2))::BIGINT END AS first_b,
           CASE WHEN n = 0 THEN 0 ELSE ('0x' || substr(h, CAST(2*n-1 AS INTEGER), 2))::BIGINT END AS last_b
    FROM hexed
)
SELECT doc_id AS media_id, n AS byte_len, checksum,
       CAST(n AS DOUBLE) AS f0, CAST(first_b AS DOUBLE) AS f1,
       CAST(last_b AS DOUBLE) AS f2, CAST(checksum % 256 AS DOUBLE) AS f3
FROM sums
"""


def q_media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(docs).withColumn(
        "meta",
        F.col("meta").withField("duration_ms", (F.col("media_id") % 5 * 1000 + 500).cast("long")),
    )
    return multimodal.frame_sample_plan(media, every_ms=1000)


SQL_MEDIA_FRAME_PLAN = """
SELECT doc_id AS media_id,
       CAST(t.i AS INTEGER) AS frame_no,
       t.i * 1000 AS ts_ms
FROM documents, unnest(range(0, (doc_id % 5 * 1000 + 500) // 1000 + 1)) AS t(i)
"""


def q_sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/similarity.ivfpq_topk): coarse cells prune
    each query to nprobe inverted lists, PQ asymmetric distance scores
    only those candidates in the compressed domain — the production
    index composition of the sim_ivf and sim_pq stages."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(
        emb, _query_vecs(spark, sf_dir), m=4, k=8, iters=2, dim=DIM,
        cells=8, nprobe=2, topk=TOPK,
    )


def _sql_ivfpq(
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    grid: int = 10**6,
    cells: int = 8,
    nprobe: int = 2,
    nq: int = N_QUERIES,
    topk: int = TOPK,
    rerank: int = 0,
) -> str:
    """PQ Lloyd/encode/table CTEs (as in _sql_pq) + IVF probe pruning;
    candidates = probed cells minus self-matches.  ``rerank > 0``
    appends the exact-L2 refine stage over the ADC top-``rerank``
    shortlist (mirrors ``similarity.ivfpq_topk(rerank=...)``)."""
    d2 = dim // m
    steps = []
    prev = "a0"
    for i in range(1, iters + 1):
        steps.append(f"""
c{i} AS (
    SELECT p.sub, p.cell, b.spos, sum(b.s) // count(*) AS c
    FROM base b JOIN {prev} p ON b.vec_id = p.vec_id AND b.sub = p.sub
    GROUP BY p.sub, p.cell, b.spos
),
d{i} AS (
    SELECT b.vec_id, b.sub, c{i}.cell,
           CAST(sum((b.s - c{i}.c) * (b.s - c{i}.c)) AS BIGINT) AS d
    FROM base b JOIN c{i} ON b.sub = c{i}.sub AND b.spos = c{i}.spos
    GROUP BY b.vec_id, b.sub, c{i}.cell
),
a{i} AS (
    SELECT vec_id, sub, cell FROM (
        SELECT vec_id, sub, cell,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cell) AS rn
        FROM d{i})
    WHERE rn = 1
)""")
        prev = f"a{i}"
    corp_scores = [_sql_ivf_score("embedding", j) for j in range(cells)]
    best = "greatest(" + ", ".join(f"s{j}" for j in range(cells)) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN s{j} = {best} THEN {j}" for j in range(cells)
    ) + " END"
    score_cols = ", ".join(f"{s} AS s{j}" for j, s in enumerate(corp_scores))
    probe_rows = " UNION ALL ".join(
        f"SELECT qid, {j} AS pcell, s{j} AS score FROM qs2" for j in range(cells)
    )
    return f"""
WITH base AS (
    SELECT vec_id, CAST((g.i - 1) // {d2} AS BIGINT) AS sub,
           (g.i - 1) % {d2} AS spos,
           CAST(round(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * {grid})
                AS BIGINT) AS s
    FROM embeddings, generate_series(1, {dim}) AS g(i)
),
a0 AS (
    SELECT vec_id, CAST(t.j AS BIGINT) AS sub, vec_id % {k} AS cell
    FROM embeddings, range({m}) t(j)
),
{",".join(steps)},
dt AS (
    SELECT q.vec_id AS qid, q.sub, c{iters}.cell,
           CAST(sum((q.s - c{iters}.c) * (q.s - c{iters}.c)) AS BIGINT) AS d
    FROM base q JOIN c{iters} ON q.sub = c{iters}.sub AND q.spos = c{iters}.spos
    WHERE q.vec_id < {nq}
    GROUP BY q.vec_id, q.sub, c{iters}.cell
),
cellsco AS (SELECT vec_id, {score_cols} FROM embeddings),
corpcell AS (SELECT vec_id, {argmax} AS pcell FROM cellsco),
qs2 AS (SELECT vec_id AS qid, {score_cols} FROM embeddings WHERE vec_id < {nq}),
probes_all AS ({probe_rows}),
probes AS (
    SELECT qid, pcell FROM (
        SELECT qid, pcell,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, pcell ASC) AS pr
        FROM probes_all
    ) WHERE pr <= {nprobe}
),
cand AS (
    SELECT p.qid, c.vec_id
    FROM corpcell c JOIN probes p ON c.pcell = p.pcell
    WHERE c.vec_id != p.qid
),
scored AS (
    SELECT cand.qid AS query_id, cand.vec_id, CAST(sum(dt.d) AS BIGINT) AS adc_d
    FROM cand
    JOIN {prev} a ON a.vec_id = cand.vec_id
    JOIN dt ON dt.qid = cand.qid AND dt.sub = a.sub AND dt.cell = a.cell
    GROUP BY cand.qid, cand.vec_id
){_sql_ivfpq_tail(topk, rerank)}
"""


def _sql_ivfpq_tail(topk: int, rerank: int) -> str:
    if not rerank:
        return f"""
SELECT query_id, vec_id, adc_d,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_d, vec_id)
            AS BIGINT) AS rn
FROM scored
QUALIFY rn <= {topk}
ORDER BY query_id, rn"""
    return f""",
short AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id ORDER BY adc_d, vec_id) AS rr
        FROM scored)
    WHERE rr <= {rerank}
),
ex AS (
    SELECT s.query_id, s.vec_id,
           CAST(sum((b.s - qb.s) * (b.s - qb.s)) AS BIGINT) AS exact_d
    FROM short s
    JOIN base b ON b.vec_id = s.vec_id
    JOIN base qb ON qb.vec_id = s.query_id AND qb.sub = b.sub AND qb.spos = b.spos
    GROUP BY s.query_id, s.vec_id
)
SELECT query_id, vec_id, exact_d,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY exact_d, vec_id)
            AS BIGINT) AS rn
FROM ex
QUALIFY rn <= {topk}
ORDER BY query_id, rn"""


SQL_SIM_IVFPQ_TOPK = _sql_ivfpq()

IVFPQ_RERANK = 20


def q_sim_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact re-rank (operators/similarity.ivfpq_topk with
    ``rerank``): the ADC top-20 shortlist per query is re-scored with
    exact integer L2² on the snapped vectors — the FAISS
    IndexRefineFlat composition that restores recall when quantization
    distortion swamps small neighbor margins."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(
        emb, _query_vecs(spark, sf_dir), m=4, k=8, iters=2, dim=DIM,
        cells=8, nprobe=2, topk=TOPK, rerank=IVFPQ_RERANK,
    )


SQL_SIM_IVFPQ_RERANK = _sql_ivfpq(rerank=IVFPQ_RERANK)


RP_K, RP_DIM, RP_GRID = 8, 64, 10**6


def q_rp_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random-projection sketch of every
    embedding (operators/similarity.rp_project): 64 floats → 8 exact
    int64 Rademacher sums + the sketch norm — the payload-shrinking
    pre-pass for ANN at scale, bit-identical on any engine/layout."""
    return similarity.rp_project(
        load_table(spark, sf_dir, "embeddings"), k=RP_K, dim=RP_DIM, grid=RP_GRID
    )


def _sql_rp() -> str:
    signs = similarity.rp_signs(RP_DIM, RP_K)
    r_cols = []
    for j in range(RP_K):
        lits = ", ".join(str(v) for v in signs[j])
        r_cols.append(
            f"list_sum(list_transform(range(1, {RP_DIM} + 1),"
            f" i -> sv[CAST(i AS INT)] * ([{lits}])[i])) AS r{j}"
        )
    norm = " + ".join(f"r{j} * r{j}" for j in range(RP_K))
    return f"""
WITH s AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * {RP_GRID}) AS BIGINT)) AS sv
    FROM embeddings
),
proj AS (SELECT vec_id, {", ".join(r_cols)} FROM s)
SELECT vec_id, {", ".join(f"CAST(r{j} AS BIGINT) AS r{j}" for j in range(RP_K))},
       CAST({norm} AS BIGINT) AS norm2
FROM proj
"""


SQL_RP_SKETCH = _sql_rp()


RESIZE_TARGET = 224


def q_media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan (operators/multimodal.resize_plan):
    fit-within-224 target dims from metadata only — pure integer
    arithmetic, the sizing pre-pass for the Arrow-batched pixel resize
    (resize_stub carries the stubbed mapInPandas path)."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(docs)
    return multimodal.resize_plan(media, target=RESIZE_TARGET).orderBy("media_id")


SQL_MEDIA_RESIZE_PLAN = f"""
WITH dims AS (
    SELECT doc_id AS media_id,
           CAST(n_chars % 640 AS BIGINT) AS width,
           CAST(n_chars % 480 AS BIGINT) AS height
    FROM documents
)
SELECT media_id, width, height,
       CASE WHEN width > 0 AND height > 0 AND greatest(width, height) > {RESIZE_TARGET}
            THEN greatest(1, (width * {RESIZE_TARGET}) // greatest(width, height))
            WHEN width > 0 AND height > 0 THEN width END AS out_width,
       CASE WHEN width > 0 AND height > 0 AND greatest(width, height) > {RESIZE_TARGET}
            THEN greatest(1, (height * {RESIZE_TARGET}) // greatest(width, height))
            WHEN width > 0 AND height > 0 THEN height END AS out_height,
       CAST(CASE WHEN width > 0 AND height > 0 AND greatest(width, height) > {RESIZE_TARGET}
                 THEN 1 ELSE 0 END AS INTEGER) AS needs_resize
FROM dims
ORDER BY media_id
"""


def q_media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio analysis-window plan (operators/multimodal
    .audio_window_plan): deterministic per-clip durations synthesized
    from ids — this query exercises the WINDOW-PLAN geometry over the
    sf documents table (real sample-level decode on actual WAV bytes
    is ``wav_pcm_windows``); some clips are shorter than one window
    and contribute zero rows — the plan handles them without
    special-casing."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(docs).withColumn(
        "meta",
        F.col("meta")
        .withField("modality", F.lit("audio"))
        .withField("duration_ms", (F.col("media_id") % 7 * 700 + 800).cast("long")),
    )
    return multimodal.audio_window_plan(media, window_ms=1000, hop_ms=500)


SQL_MEDIA_AUDIO_WINDOWS = """
WITH clips AS (
    SELECT doc_id AS media_id, doc_id % 7 * 700 + 800 AS dur FROM documents
),
n AS (
    SELECT media_id,
           CASE WHEN dur >= 1000 THEN (dur - 1000) // 500 + 1 ELSE 0 END AS nw
    FROM clips
)
SELECT media_id, CAST(t.i AS BIGINT) AS window_no,
       t.i * 500 AS start_ms, t.i * 500 + 1000 AS end_ms
FROM n, unnest(range(0, nw)) AS t(i)
"""


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (operators/text.
    repetition_signals): chars covered by the most repetitive word
    bigram and by duplicated word trigrams, per document.  Beyond-
    reference scope (no analogue in xiaowei1234/pySpark-Pipelining)."""
    return text.repetition_signals(load_table(spark, sf_dir, "documents"))


SQL_REPETITION_SIGNALS = """
WITH docs AS (
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           string_split_regex(lower(text), ' +') AS w
    FROM documents
),
b AS (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                                 i -> w[i] || ' ' || w[i + 1])) AS gram
    FROM docs
),
t AS (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                                 i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
    FROM docs
),
bc AS (SELECT doc_id, gram, count(*) AS cnt FROM b GROUP BY doc_id, gram),
tc AS (SELECT doc_id, gram, count(*) AS cnt FROM t GROUP BY doc_id, gram),
b2 AS (SELECT doc_id, max(cnt * length(gram)) AS top2_chars FROM bc GROUP BY doc_id),
t3 AS (SELECT doc_id, sum(cnt * length(gram)) FILTER (WHERE cnt >= 2) AS dup3_chars
       FROM tc GROUP BY doc_id)
SELECT d.doc_id, d.n_chars,
       CAST(COALESCE(b2.top2_chars, 0) AS BIGINT) AS top2_chars,
       CAST(COALESCE(t3.dup3_chars, 0) AS BIGINT) AS dup3_chars,
       CASE WHEN d.n_chars > 0
            THEN round(CAST(COALESCE(b2.top2_chars, 0) AS DOUBLE) / d.n_chars, 6)
            ELSE 0.0 END AS top2_frac,
       CASE WHEN d.n_chars > 0
            THEN round(CAST(COALESCE(t3.dup3_chars, 0) AS DOUBLE) / d.n_chars, 6)
            ELSE 0.0 END AS dup3_frac
FROM docs d
LEFT JOIN b2 USING (doc_id)
LEFT JOIN t3 USING (doc_id)
"""


QUERIES_LLM = {
    "text_fingerprint": q_text_fingerprint,
    "repetition_signals": q_repetition_signals,
    "text_tokens": q_text_tokens,
    "text_language_id": q_text_language_id,
    "text_quality": q_text_quality,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_clusters": q_dedup_clusters,
    "corpus_prep": q_corpus_prep,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "jaccard_prefix_pairs": q_jaccard_prefix_pairs,
    "sim_bruteforce_topk": q_sim_bruteforce_topk,
    "sim_lsh_topk": q_sim_lsh_topk,
    "sim_lsh_multitable": q_sim_lsh_multitable,
    "sim_ivf_topk": q_sim_ivf_topk,
    "sim_near_dup": q_sim_near_dup,
    "media_features": q_media_features,
    "media_frame_plan": q_media_frame_plan,
    "media_audio_windows": q_media_audio_windows,
    "media_resize_plan": q_media_resize_plan,
    "rp_sketch": q_rp_sketch,
    "sim_ivfpq_topk": q_sim_ivfpq_topk,
    "sim_ivfpq_rerank": q_sim_ivfpq_rerank,
}

ORACLES_LLM = {
    "text_fingerprint": SQL_TEXT_FINGERPRINT,
    "repetition_signals": SQL_REPETITION_SIGNALS,
    "text_tokens": SQL_TEXT_TOKENS,
    "text_language_id": SQL_TEXT_LANGUAGE_ID,
    "text_quality": SQL_TEXT_QUALITY,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "corpus_prep": SQL_CORPUS_PREP,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "jaccard_prefix_pairs": SQL_JACCARD_PREFIX_PAIRS,
    "sim_bruteforce_topk": SQL_SIM_BRUTEFORCE_TOPK,
    "sim_lsh_topk": SQL_SIM_LSH_TOPK,
    "sim_lsh_multitable": SQL_SIM_LSH_MULTITABLE,
    "sim_ivf_topk": SQL_SIM_IVF_TOPK,
    "sim_near_dup": SQL_SIM_NEAR_DUP,
    "media_features": SQL_MEDIA_FEATURES,
    "media_frame_plan": SQL_MEDIA_FRAME_PLAN,
    "media_audio_windows": SQL_MEDIA_AUDIO_WINDOWS,
    "media_resize_plan": SQL_MEDIA_RESIZE_PLAN,
    "rp_sketch": SQL_RP_SKETCH,
    "sim_ivfpq_topk": SQL_SIM_IVFPQ_TOPK,
    "sim_ivfpq_rerank": SQL_SIM_IVFPQ_RERANK,
}


def q_pagerank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank over the near-duplicate similarity graph
    (operators/graph.pagerank_int): the graph-centrality quality prior,
    deterministic by integer arithmetic.  Nodes = documents appearing
    in an LSH pair at est Jaccard >= 0.5 (isolated documents carry no
    graph signal and are excluded by construction)."""
    from pyspark_pipelining_spark.operators.graph import pagerank_int, symmetrize

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    edges = symmetrize(pairs, "doc_1", "doc_2", "src", "dst")
    out = pagerank_int(edges, iters=3)
    return out.select(F.col("id").alias("doc_id"), "r")


def _sql_pagerank(
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    iters: int = 3,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """Oracle with the iterations unrolled (fixed count), mirroring the
    engine's integer arithmetic exactly (// == Spark's div on
    non-negative operands)."""
    ctes, band_match, agree = _minhash_fragments(num_hashes, bands)
    base = f"(CAST({scale} AS BIGINT) * {damp_den - damp_num} // {damp_den}) // n"
    prev = "r0"
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
it{i} AS (
    SELECT nodes.id,
           {base} + (({damp_num} * COALESCE(sub.s, 0)) // {damp_den}) AS r
    FROM nodes CROSS JOIN nn
    LEFT JOIN (
        SELECT e.dst AS id, CAST(sum(p.r // d.deg) AS BIGINT) AS s
        FROM edges e
        JOIN {prev} p ON e.src = p.id
        JOIN deg d ON e.src = d.id
        GROUP BY e.dst
    ) sub ON nodes.id = sub.id
)""")
        prev = f"it{i}"
    return f"""
WITH {ctes},
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
nodes AS (SELECT DISTINCT src AS id FROM edges),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
r0 AS (SELECT id, CAST({scale} AS BIGINT) // n AS r FROM nodes CROSS JOIN nn),
{",".join(steps)}
SELECT id AS doc_id, r FROM {prev}
"""


SQL_PAGERANK_DOCS = _sql_pagerank()


# defined below the registry literals, so registered here
QUERIES_LLM["pagerank_docs"] = q_pagerank_docs
ORACLES_LLM["pagerank_docs"] = SQL_PAGERANK_DOCS


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts over the near-duplicate similarity
    graph (operators/graph.triangle_count): dense LSH cliques vs chance
    collisions.  Degree-ordered wedge enumeration keeps the join
    O(m^1.5) on any degree distribution."""
    from pyspark_pipelining_spark.operators.graph import symmetrize, triangle_count

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    edges = symmetrize(pairs, "doc_1", "doc_2", "src", "dst")
    out = triangle_count(edges)
    return out.select(F.col("id").alias("doc_id"), "triangles")


def _sql_triangles(
    threshold: float = 0.5, num_hashes: int = 16, bands: int = 8
) -> str:
    """Oracle via the id-ordered (a<b<c) formulation — enumerates the
    same triangle set the degree-ordered engine finds."""
    ctes, band_match, agree = _minhash_fragments(num_hashes, bands)
    return f"""
WITH {ctes},
pairs AS (
    SELECT a.doc_id AS doc_1, b.doc_id AS doc_2
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_match})
    WHERE ({agree}) / {num_hashes}.0 >= {threshold}
),
tri AS (
    SELECT e1.doc_1 AS a, e1.doc_2 AS b, e2.doc_2 AS c
    FROM pairs e1
    JOIN pairs e2 ON e2.doc_1 = e1.doc_2
    JOIN pairs e3 ON e3.doc_1 = e1.doc_1 AND e3.doc_2 = e2.doc_2
),
corners AS (
    SELECT a AS doc_id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
SELECT doc_id, count(*) AS triangles FROM corners GROUP BY doc_id
"""


SQL_GRAPH_TRIANGLES = _sql_triangles()

QUERIES_LLM["graph_triangles"] = q_graph_triangles
ORACLES_LLM["graph_triangles"] = SQL_GRAPH_TRIANGLES


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer-lattice k-means over the embeddings table
    (operators/cluster.kmeans_int): 2 unrolled Lloyd steps, exact int64
    arithmetic end-to-end, so the DuckDB oracle replays the identical
    iteration — the oracle-checkable counterpart of the float
    learned_centroids quantizer trainer."""
    from pyspark_pipelining_spark.operators.cluster import kmeans_int

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_int(emb, k=8, iters=2)


def _sql_kmeans(k: int = 8, iters: int = 2, dim: int = 64, grid: int = 10**6) -> str:
    """Unrolled Lloyd steps mirroring kmeans_int bit-for-bit: DuckDB
    ``//`` and Spark ``div`` both truncate toward zero (negatives
    included), floor-snap and squared-L2 are exact integers."""
    steps = []
    prev = "a0"
    for i in range(1, iters + 1):
        steps.append(f"""
c{i} AS (
    SELECT p.cell, b.pos, sum(b.s) // count(*) AS c
    FROM base b JOIN {prev} p USING (vec_id)
    GROUP BY p.cell, b.pos
),
d{i} AS (
    SELECT b.vec_id, c{i}.cell, CAST(sum((b.s - c{i}.c) * (b.s - c{i}.c)) AS BIGINT) AS d
    FROM base b JOIN c{i} ON b.pos = c{i}.pos
    GROUP BY b.vec_id, c{i}.cell
),
a{i} AS (
    SELECT vec_id, cell, d FROM (
        SELECT vec_id, cell, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM d{i})
    WHERE rn = 1
)""")
        prev = f"a{i}"
    return f"""
WITH base AS (
    SELECT vec_id, g.i AS pos,
           CAST(round(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * {grid})
                AS BIGINT) AS s
    FROM embeddings, generate_series(1, {dim}) AS g(i)
),
a0 AS (SELECT vec_id, vec_id % {k} AS cell FROM embeddings),
{",".join(steps)}
SELECT vec_id, cell, d FROM {prev}
"""


SQL_KMEANS_CELLS = _sql_kmeans()

def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.pq_train_codes /
    pq_adc_topk): per-subspace integer Lloyd codebooks, corpus encoded
    to m codes per vector, asymmetric-distance top-k via broadcast
    lookup tables — the compressed-domain scale path that completes
    brute-force → LSH → IVF → PQ."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(
        emb, _query_vecs(spark, sf_dir), m=4, k=8, iters=2, dim=DIM, topk=TOPK
    )


def _sql_pq(
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    grid: int = 10**6,
    nq: int = N_QUERIES,
    topk: int = TOPK,
) -> str:
    """Unrolled per-subspace Lloyd + ADC, mirroring pq_adc_topk
    bit-for-bit (truncating integer division, spos-aligned joins, tie
    rules on cell / vec_id)."""
    d2 = dim // m
    steps = []
    prev = "a0"
    for i in range(1, iters + 1):
        steps.append(f"""
c{i} AS (
    SELECT p.sub, p.cell, b.spos, sum(b.s) // count(*) AS c
    FROM base b JOIN {prev} p ON b.vec_id = p.vec_id AND b.sub = p.sub
    GROUP BY p.sub, p.cell, b.spos
),
d{i} AS (
    SELECT b.vec_id, b.sub, c{i}.cell,
           CAST(sum((b.s - c{i}.c) * (b.s - c{i}.c)) AS BIGINT) AS d
    FROM base b JOIN c{i} ON b.sub = c{i}.sub AND b.spos = c{i}.spos
    GROUP BY b.vec_id, b.sub, c{i}.cell
),
a{i} AS (
    SELECT vec_id, sub, cell FROM (
        SELECT vec_id, sub, cell,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cell) AS rn
        FROM d{i})
    WHERE rn = 1
)""")
        prev = f"a{i}"
    return f"""
WITH base AS (
    SELECT vec_id, CAST((g.i - 1) // {d2} AS BIGINT) AS sub,
           (g.i - 1) % {d2} AS spos,
           CAST(round(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * {grid})
                AS BIGINT) AS s
    FROM embeddings, generate_series(1, {dim}) AS g(i)
),
a0 AS (
    SELECT vec_id, CAST(t.j AS BIGINT) AS sub, vec_id % {k} AS cell
    FROM embeddings, range({m}) t(j)
),
{",".join(steps)},
dt AS (
    SELECT q.vec_id AS qid, q.sub, c{iters}.cell,
           CAST(sum((q.s - c{iters}.c) * (q.s - c{iters}.c)) AS BIGINT) AS d
    FROM base q JOIN c{iters} ON q.sub = c{iters}.sub AND q.spos = c{iters}.spos
    WHERE q.vec_id < {nq}
    GROUP BY q.vec_id, q.sub, c{iters}.cell
),
scored AS (
    SELECT dt.qid AS query_id, a{iters}.vec_id, CAST(sum(dt.d) AS BIGINT) AS adc_d
    FROM a{iters} JOIN dt ON a{iters}.sub = dt.sub AND a{iters}.cell = dt.cell
    GROUP BY dt.qid, a{iters}.vec_id
)
SELECT query_id, vec_id, adc_d,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_d, vec_id)
            AS BIGINT) AS rn
FROM scored
QUALIFY rn <= {topk}
ORDER BY query_id, rn
"""


SQL_SIM_PQ_TOPK = _sql_pq()

QUERIES_LLM["sim_pq_topk"] = q_sim_pq_topk
ORACLES_LLM["sim_pq_topk"] = SQL_SIM_PQ_TOPK

QUERIES_LLM["kmeans_cells"] = q_kmeans_cells
ORACLES_LLM["kmeans_cells"] = SQL_KMEANS_CELLS


# ---------------------------------------------------------------------------
# Round-8 registrations (formerly queries_staged.py): containment join,
# Zipf slope, dedup impact report
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
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_containment_join(docs, threshold=0.8, n=4).orderBy(
        "doc_inner", "doc_outer"
    )


SQL_CONTAINMENT_PAIRS = f"""
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

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        text.with_words(docs)
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


SQL_ZIPF_SLOPE = f"""
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


def q_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the near-dup dedup would actually DELETE, per source: docs
    cluster by LSH → connected components (dedup_clusters), a doc is
    removed iff it is not its cluster's min-id representative
    (drop_duplicate_docs policy), and the report rolls up removed
    docs/chars and the removal fraction — the go/no-go artifact a
    corpus owner reads before a 100 TB dedup pass.  One broadcast-able
    rollup over the cluster labels; all heavy lifting is the already
    scale-shaped clustering — rerun here only because the driver
    contract requires independent queries; a production DAG
    materializes the labels once via plans/dag.py and this report
    reads that table (see ``q_dedup_clusters``)."""
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

QUERIES_LLM["containment_pairs"] = q_containment_pairs
ORACLES_LLM["containment_pairs"] = SQL_CONTAINMENT_PAIRS
QUERIES_LLM["zipf_slope"] = q_zipf_slope
ORACLES_LLM["zipf_slope"] = SQL_ZIPF_SLOPE
QUERIES_LLM["dedup_impact"] = q_dedup_impact
ORACLES_LLM["dedup_impact"] = SQL_DEDUP_IMPACT


# ---------------------------------------------------------------------------
# Round-9 registrations (formerly queries_staged.py): TF-IDF weighted
# cosine similarity self-join
# ---------------------------------------------------------------------------

COS_NGRAM = 4
COS_DF_CAP = 200
COS_THRESHOLD = 0.5

# composed over the module's single words CTE (SQL_WORDS) so the
# tokenizer convention lives in exactly one place, like SQL_BIGRAMS
_SQL_GRAM_TF = f"""{SQL_WORDS},
occs AS (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(w) - 3, 0) + 1),
                  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
                       || ' ' || w[i + 3])) AS gram
    FROM words
),
tf AS (
    SELECT doc_id, gram, count(*) AS tf FROM occs GROUP BY doc_id, gram
)"""


def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All doc pairs with TF-IDF cosine ≥ ``COS_THRESHOLD`` over
    4-gram shingles with doc_freq ≤ ``COS_DF_CAP`` — the WEIGHTED
    set-similarity join: where jaccard_prefix_pairs treats every
    shared shingle equally, here rare shingles dominate the score, so
    boilerplate-diluted near-dups that share distinctive content
    phrases still surface (and ubiquitous boilerplate contributes
    ~nothing even below the cap).

    Determinism: IDF is the ONE transcendental — ln(n_docs/df)
    int64-quantized at 1e6 (the lm_score convention), so term weights
    ``wq = tf·idf_q`` are exact integers, norms and dot products are
    exact DECIMAL(38,0) sums, and the final cosine is one
    exactly-rounded double expression both engines evaluate
    identically (÷, ×, sqrt are IEEE exactly-rounded; only ln needs
    the quantization).

    Scale shape, quantization discipline, and the df-cap candidate
    bound are documented on the operator
    (``operators/dedup.tfidf_cosine_pairs``)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.tfidf_cosine_pairs(
        docs, threshold=COS_THRESHOLD, n=COS_NGRAM, df_cap=COS_DF_CAP
    ).orderBy("doc_a", "doc_b")


SQL_SPARSE_COSINE_PAIRS = f"""
WITH {_SQL_GRAM_TF},
nd AS (SELECT count(*) AS n_docs FROM documents),
vocab AS (
    SELECT gram,
           CAST(round(ln(CAST(n_docs AS DOUBLE) / doc_freq) * 1000000)
                AS BIGINT) AS idf_q
    FROM (SELECT gram, count(*) AS doc_freq FROM tf GROUP BY gram) d
    CROSS JOIN nd
    WHERE doc_freq <= {COS_DF_CAP}
),
post AS (
    SELECT doc_id, tf.gram, tf * idf_q AS wq
    FROM tf JOIN vocab ON tf.gram = vocab.gram
),
norms AS (
    SELECT doc_id, sum(CAST(wq AS DECIMAL(38,0)) * wq) AS n2
    FROM post GROUP BY doc_id
),
dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           sum(CAST(a.wq AS DECIMAL(38,0)) * b.wq) AS dot
    FROM post a JOIN post b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
cos AS (
    SELECT doc_a, doc_b,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS c
    FROM dots
    JOIN norms na ON dots.doc_a = na.doc_id
    JOIN norms nb ON dots.doc_b = nb.doc_id
    WHERE na.n2 > 0 AND nb.n2 > 0
)
SELECT doc_a, doc_b, round(c, 6) AS cosine
FROM cos WHERE c >= {COS_THRESHOLD}
ORDER BY doc_a, doc_b
"""

QUERIES_LLM["sparse_cosine_pairs"] = q_sparse_cosine_pairs
ORACLES_LLM["sparse_cosine_pairs"] = SQL_SPARSE_COSINE_PAIRS


# ---------------------------------------------------------------------------
# Round-14 registrations (formerly queries_staged.py): span-level
# exact-substring dedup — cross-document verbatim passages and
# intra-document self-repeats (Lee et al. 2022 semantics as diagonal
# gram islands) — plus SemDeDup-style semantic dedup over the
# embedding space
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
    return f"""span_grams AS (
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
  SELECT * FROM span_grams
  WHERE h NOT IN (SELECT h FROM span_grams GROUP BY h HAVING count(*) > {SPAN_MAX_OCC})
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
  SELECT * FROM span_grams
  WHERE h NOT IN (SELECT h FROM span_grams GROUP BY h HAVING count(*) > {SPAN_MAX_OCC})
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

QUERIES_LLM["exact_substring_spans"] = q_exact_substring_spans
ORACLES_LLM["exact_substring_spans"] = SQL_EXACT_SUBSTRING_SPANS
QUERIES_LLM["self_repeat_spans"] = q_self_repeat_spans
ORACLES_LLM["self_repeat_spans"] = SQL_SELF_REPEAT_SPANS
QUERIES_LLM["semantic_dedup"] = q_semantic_dedup
ORACLES_LLM["semantic_dedup"] = SQL_SEMANTIC_DEDUP


# ---------------------------------------------------------------------------
# Round-16 registration (formerly queries_staged.py): Gopher repetition
# filters (Rae et al. 2021 Table A1; the published repetition-quality
# rung beside lm_score and the dedup ladder).  Gates in
# tests/test_gopher.py.
# ---------------------------------------------------------------------------


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher repetition signals over ``documents``
    (``operators/text.gopher_repetition``): most-frequent-2/3-gram
    char coverage, duplicated-3-gram word-interval coverage, and the
    integer-exact composite flag at the paper's thresholds — joined to
    ``source`` so per-source repetition pressure reads directly."""
    docs = load_table(spark, sf_dir, "documents")
    rep = text.gopher_repetition(docs)
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

QUERIES_LLM["gopher_repetition"] = q_gopher_repetition
ORACLES_LLM["gopher_repetition"] = SQL_GOPHER_REPETITION
