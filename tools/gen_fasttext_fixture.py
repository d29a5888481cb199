"""One-shot trainer for the committed linear quality-classifier fixture
(`fixtures/fasttext/weights.parquet`) behind the queued
`fasttext_quality` query — the DCLM / fastText-style model-based
quality rung (Li et al. 2024, "DataComp-LM"; Joulin et al. 2016
fastText: a LINEAR classifier over hashed n-gram bags, which is why the
frozen model is exactly-replayable in SQL while the TRAINING loop is
not — the same split as the k-means quantizer behind
`sim_ivf_learned_topk`, tools/gen_ann_fixtures.py).

Training setup (deterministic, runs on the committed sf0.01 testdata):

* features: word-bigram counts hashed into ``BUCKETS`` buckets with the
  repo's engine-portable md5 hash (``int(md5[:15],16) % B`` — the exact
  arithmetic of ``operators/dedup.portable_hash_id``), L1-normalized
  per doc (the fastText mean-of-embeddings shape);
* labels: ``lang == 'en'`` — the corpus's deterministic stand-in for
  DCLM's curated-vs-web split (the generator's per-language word
  distributions differ, so the task is learnable but not trivial);
* optimizer: full-batch gradient descent on logistic loss, fixed seed,
  fixed iteration count — rerunning this script reproduces the
  committed fixture bit-for-bit;
* export: weights scaled by ``Q`` and rounded to int64 (`w_q6`), bias
  the same; row ``bucket = -1`` carries the bias.  Quantization is part
  of the MODEL, not a lossy approximation: the query's score is defined
  over the int64 weights, so Spark and DuckDB replay it bit-identically.

Run: ``python tools/gen_fasttext_fixture.py`` (writes the parquet and
prints per-sf keep rates so threshold sanity is visible at commit time).
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

BUCKETS = 4096
Q = 1_000_000
SEED = 20260817
ITERS = 4000
LR = 10.0
TRAIN_SF = "/root/testdata/sf0.01/documents.parquet"
OUT = os.path.join(HERE, "fixtures", "fasttext", "weights.parquet")


def bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % BUCKETS


def doc_features(text: str) -> np.ndarray:
    words = [w for w in text.lower().split(" ") if w]
    x = np.zeros(BUCKETS)
    for a, b in zip(words, words[1:]):
        x[bucket(f"{a} {b}")] += 1.0
    n = x.sum()
    return x / n if n else x


def main() -> int:
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{TRAIN_SF}' ORDER BY doc_id"
    ).fetchall()
    X = np.stack([doc_features(t) for _, _, t in rows])
    y = np.array([1.0 if lang == "en" else 0.0 for _, lang, _ in rows])

    rng = np.random.default_rng(SEED)
    w = rng.normal(0, 0.01, BUCKETS)
    b = 0.0
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        w -= LR * (X.T @ g) / len(y)
        b -= LR * g.mean()

    w_q = np.round(w * Q).astype(np.int64)
    b_q = int(round(b * Q))

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    buckets = list(range(BUCKETS)) + [-1]
    weights = list(w_q) + [b_q]
    pq.write_table(
        pa.table(
            {
                "bucket": pa.array(buckets, pa.int64()),
                "w_q6": pa.array(weights, pa.int64()),
            }
        ),
        OUT,
    )
    print(f"wrote {OUT}: {BUCKETS} buckets + bias {b_q}")

    # committed-scale sanity: keep rate per sf with the int64 weights
    # (score > 0 <=> sum_q6 + bias_q6 * n > 0), and train accuracy
    wq = {i: int(v) for i, v in zip(buckets, weights)}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        rows = duckdb.sql(f"SELECT lang, text FROM '{path}'").fetchall()
        kept = correct = 0
        for lang, t in rows:
            words = [x for x in t.lower().split(" ") if x]
            grams = [f"{a} {b2}" for a, b2 in zip(words, words[1:])]
            s = sum(wq[bucket(g)] for g in grams)
            k = int(len(grams) > 0 and s + b_q * len(grams) > 0)
            kept += k
            correct += int(k == (lang == "en"))
        print(
            f"{sf}: kept {kept}/{len(rows)} "
            f"({kept / len(rows):.2%}), agree-with-lang {correct / len(rows):.2%}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
