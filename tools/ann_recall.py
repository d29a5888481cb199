"""Recall proxies for the ANN ladder decision table (r12 verdict
item 8): for every approximate variant, the overlap of its top-k
vec_id set with the exact brute-force cosine top-k, averaged over the
shared query set, at a chosen sf:

    python tools/ann_recall.py [--sf /root/testdata/sf0.1]

This is a measurement tool, not a gate — the per-variant exactness
contracts (bit-identical oracles) live in the test suite; recall
against exact cosine is the LADDER property (how much ranking quality
each compression rung trades), recorded in README's decision table.
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# approximate-variant query names, each compared against BASELINE's
# exact top-k by (query_id, vec_id) set overlap
VARIANTS = [
    "sim_lsh_topk",
    "sim_lsh_multitable",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "sim_ivfpq_rerank",
    "sim_bq_topk",
    "sim_bq_rerank",
    "sim_sq8_rerank",
]

BASELINE = "sim_bruteforce_topk"


def _topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args(argv)

    from pyspark_pipelining_spark import cache
    from pyspark_pipelining_spark.queries import QUERIES
    from pyspark_pipelining_spark.session import get_spark

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    exact = _topk_sets(QUERIES[BASELINE](spark, args.sf))
    cache.release_all()
    print(f"baseline {BASELINE}: {len(exact)} queries, k per query "
          f"{sorted({len(v) for v in exact.values()})}")
    for name in VARIANTS:
        if name not in QUERIES:
            print(f"{name}: not registered, skipped")
            continue
        df = QUERIES[name](spark, args.sf)
        if not {"query_id", "vec_id"} <= set(df.columns):
            cache.release_all()
            print(f"{name}: no query_id/vec_id columns, incomparable")
            continue
        got = _topk_sets(df)
        cache.release_all()
        qids = sorted(set(exact) & set(got))
        if not qids:
            print(f"{name}: no shared queries with baseline, incomparable")
            continue
        rec = sum(len(exact[q] & got[q]) / len(exact[q]) for q in qids) / len(qids)
        print(f"{name}: recall@k={rec:.3f} over {len(qids)} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
