"""Unit tests for corpus-preparation operators (operators/corpus.py,
similarity.centroid_cosines) — fixtures with known answers; the
engine-vs-DuckDB comparison lives in test_queries_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_pipelining_spark.operators.corpus import (
    contamination,
    hash_fraction_sample,
    pack_greedy,
    scrub_pii,
    stratified_topk_sample,
    vocab_topk,
)
from pyspark_pipelining_spark.operators.similarity import centroid_cosines


def test_scrub_pii_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact bob@example.com or visit https://ex.com/a?b=1 now"),
            (2, "call 555-123-4567 or 555.123.4567 today"),
            (3, "clean text with no pii at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in scrub_pii(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_url"] == 1
    assert out[1]["clean"] == "contact <EMAIL> or visit <URL> now"
    assert out[2]["n_phone"] == 2
    assert out[2]["clean"] == "call <PHONE> or <PHONE> today"
    assert out[3] == {"doc_id": 3, "n_url": 0, "n_email": 0, "n_phone": 0,
                      "clean": "clean text with no pii at all"}


def test_contamination_known_overlap(spark):
    # corpus doc 1 shares its only trigram with the eval set; doc 2 none;
    # doc 3 is too short for trigrams and must be absent
    corpus_df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta eta"), (3, "one two")],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in contamination(corpus_df, eval_df, n=3).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_grams"] == 1 and rows[1]["n_contaminated"] == 1
    assert rows[1]["contamination"] == 1.0
    assert rows[2]["n_grams"] == 2 and rows[2]["n_contaminated"] == 0


def test_vocab_topk_orders_and_breaks_ties(spark):
    docs = spark.createDataFrame(
        [(1, "b b a a c"), (2, "a b z")], ["doc_id", "text"]
    )
    top = [(r["token"], r["n"]) for r in vocab_topk(docs, k=3).collect()]
    assert top == [("a", 3), ("b", 3), ("c", 1)]  # count desc, token asc


def test_stratified_topk_sample_exact_k_per_stratum(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], ["doc_id", "source"]
    )
    out = stratified_topk_sample(docs, k=4).collect()
    by_stratum: dict[str, int] = {}
    for r in out:
        by_stratum[r["source"]] = by_stratum.get(r["source"], 0) + 1
    assert by_stratum == {"s0": 4, "s1": 4, "s2": 4}
    # deterministic across invocations
    again = stratified_topk_sample(docs, k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_hash_fraction_sample_deterministic_and_composable(spark):
    docs = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
    half = set(r["doc_id"] for r in hash_fraction_sample(docs, 0.5).collect())
    quarter = set(r["doc_id"] for r in hash_fraction_sample(docs, 0.25).collect())
    assert quarter <= half  # nested thresholds => nested samples
    assert 0.2 < len(quarter) / 1000 < 0.3
    assert 0.45 < len(half) / 1000 < 0.55
    # re-run is identical (no partition-layout dependence)
    assert half == set(r["doc_id"] for r in hash_fraction_sample(docs, 0.5).collect())


def test_pack_greedy_respects_budget_and_order(spark):
    docs = spark.createDataFrame(
        [
            # group a: 900+900 fit a pack; 300+900 next; 2500 oversized alone
            (1, "a", 900), (2, "a", 900), (3, "a", 300), (4, "a", 900),
            (5, "a", 2500), (6, "a", 100),
            (10, "b", 1), (11, "b", 1),
        ],
        ["doc_id", "source", "n_chars"],
    )
    out = {r["doc_id"]: r["pack_id"] for r in pack_greedy(docs, budget=2000).collect()}
    assert out[1] == 0 and out[2] == 0          # 1800 <= 2000
    assert out[3] == 1 and out[4] == 1          # 300 + 900
    assert out[5] == 2                          # oversized gets its own pack
    assert out[6] == 3                          # fill resets after oversized
    assert out[10] == 0 and out[11] == 0        # groups pack independently


def test_centroid_cosines_degenerate_and_known(spark):
    # label 0: two identical vectors -> both exactly at the centroid
    # label 1: orthogonal pair -> centroid at 45 degrees, cos = ~0.707107
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 1), (3, [0.0, 1.0], 1),
        ],
        ["vec_id", "embedding", "label"],
    )
    out = {r["vec_id"]: r["centroid_cos"] for r in centroid_cosines(emb).collect()}
    assert out[0] == 1.0 and out[1] == 1.0
    assert abs(out[2] - 0.707107) < 1e-6 and abs(out[3] - 0.707107) < 1e-6


def test_collapse_repeats_known(spark):
    from pyspark_pipelining_spark.operators.corpus import collapse_repeats

    docs = spark.createDataFrame(
        [(1, "a a the line table table table key"), (2, "x y z"), (3, "q")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in collapse_repeats(docs).collect()}
    assert out[1]["clean"] == "a the line table key"
    assert out[1]["n_words"] == 8 and out[1]["n_kept"] == 5
    assert out[2]["clean"] == "x y z" and out[2]["n_kept"] == 3
    assert out[3]["clean"] == "q" and out[3]["n_kept"] == 1


def test_training_shuffle_deterministic_and_epoch_varying(spark):
    from pyspark_pipelining_spark.operators.corpus import training_shuffle

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(200)], ["doc_id", "text"])
    a = training_shuffle(docs, num_shards=4).collect()
    b = training_shuffle(docs, num_shards=4).collect()
    # same salt -> identical shard assignment AND identical within-shard order
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert set(r["shard"] for r in a) == {0, 1, 2, 3}
    assert sorted(r["doc_id"] for r in a) == list(range(200))
    # a different salt is a different permutation (new epoch)
    c = training_shuffle(docs, num_shards=4, salt="epoch1").collect()
    assert [tuple(r) for r in c] != [tuple(r) for r in a]
    assert sorted(r["doc_id"] for r in c) == list(range(200))


def test_dedup_lines_first_occurrence_wins_and_reassembles(spark):
    from pyspark_pipelining_spark.operators.corpus import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "alpha beta. shared line. gamma."),
            (2, "shared line. delta epsilon. another one."),
            (3, "shared line. another one."),  # every line a duplicate
            (4, ""),  # no lines at all -> absent (no splittable content)
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    # doc 1 keeps everything (first occurrence of all its lines)
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    # split consumes the [.!?]\s+ delimiters; the final "gamma." keeps
    # its period (no trailing whitespace after it to match)
    assert out[1]["clean"] == "alpha beta shared line gamma."
    # doc 2 loses "shared line" to doc 1, keeps its own two
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 2
    assert out[2]["clean"] == "delta epsilon another one."
    # doc 3 loses both lines but still appears
    assert out[3]["n_lines"] == 2 and out[3]["n_kept"] == 0
    assert out[3]["clean"] == ""


def test_mixture_sample_subset_and_monotone_targets(spark):
    """The mixture sample must be a subset of the corpus, keep a group
    with target >= total intact, and a smaller target must select a
    SUBSET of a larger target's rows (hash-rule composability)."""
    from pyspark_pipelining_spark.operators.corpus import mixture_sample

    rows = [(i, "a" if i % 2 == 0 else "b", 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    big = {r["doc_id"] for r in mixture_sample(df, {"a": 5000, "b": 100000}).collect()}
    small = {r["doc_id"] for r in mixture_sample(df, {"a": 2000, "b": 100000}).collect()}
    all_b = {i for i in range(200) if i % 2 == 1}
    assert all_b <= big  # b's target exceeds its total -> kept whole
    assert small <= big  # composable: shrinking a target shrinks the set
    n_a_small = len([i for i in small if i % 2 == 0])
    # a's total is 10000; target 2000 -> ~20% of 100 docs, hash variance aside
    assert 5 <= n_a_small <= 40


def test_split_assign_disjoint_exhaustive_and_remainder(spark):
    """Every row gets exactly one split; fractions summing under 1
    leave an implicit __rest holdout; fractions over 1 are rejected."""
    import pytest

    from pyspark_pipelining_spark.operators.corpus import split_assign

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = split_assign(df, {"train": 0.5, "val": 0.2})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == 1000
    assert set(counts) <= {"train", "val", "__rest"} and counts["__rest"] > 0
    # rough proportions (hash uniformity at n=1000: generous tolerance)
    assert 400 <= counts["train"] <= 600
    with pytest.raises(ValueError, match="> 1"):
        split_assign(df, {"a": 0.9, "b": 0.2})
