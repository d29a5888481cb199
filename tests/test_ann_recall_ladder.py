"""ANN ladder recall ORDERING pins (r13 verdict stretch item): the
README decision table's strongest claims, asserted as orderings (never
absolute recall values — those are corpus- and sf-specific, per the
table's non-transferability caveats) at sf0.001 so a silent quantizer
regression fails the suite instead of only drifting a hand-run
measurement (`tools/ann_recall.py`).

What is safe to pin at smoke scale (verified against measured values
0.0 / 0.4 / 0.27 / 0.07 / 0.07 / 0.13 / 0.2 / 0.8 / 1.0):

* SQ8 + exact-int rerank recovers the exact top-k EXACTLY (recall 1.0)
  — the headline claim; a min/max calibration or centered-dot bug
  breaks this first;
* exact-rerank variants never score below their quantized bases
  (BQ+rerank >= BQ, IVFPQ+rerank >= IVFPQ) — reranking the same
  shortlist by exact distance cannot lose to the quantized ranking on
  this corpus, and a rerank wiring bug (wrong id join, wrong score
  sign) drops it to ~0;
* multi-table LSH never scores below single-table (candidate union is
  a superset);
* SQ8 tops the whole ladder (it is exact; everything else quantizes).

NOT pinned: the PQ-vs-BQ-vs-IVF interior ordering — at sf0.001 it
inverts vs sf0.1 (BQ 0.2 > PQ 0.07 here; the opposite at sf0.1), which
is exactly the non-transferability the README documents.

Full-suite only (not the quick lane): ten sf0.001 query evaluations.
"""

from __future__ import annotations

from pyspark_pipelining_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

BASELINE = "sim_bruteforce_topk"
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


def _recalls(spark) -> dict[str, float]:
    from pyspark_pipelining_spark import cache

    def topk(name):
        out: dict = {}
        for r in QUERIES[name](spark, SF_SMOKE).collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        cache.release_all()
        return out

    exact = topk(BASELINE)
    assert exact, "baseline produced no queries"
    rec = {}
    for name in VARIANTS:
        got = topk(name)
        qids = sorted(set(exact) & set(got))
        assert qids, f"{name}: no shared query_ids with baseline"
        rec[name] = sum(len(exact[q] & got[q]) / len(exact[q]) for q in qids) / len(
            qids
        )
    return rec


def test_ladder_recall_orderings(spark):
    rec = _recalls(spark)
    # the headline: SQ8's int8 shortlist + exact-int rerank is EXACT
    assert rec["sim_sq8_rerank"] == 1.0, rec
    # and therefore tops every quantized rung
    assert all(rec["sim_sq8_rerank"] >= v for v in rec.values()), rec
    # exact rerank never loses to its quantized base
    assert rec["sim_bq_rerank"] >= rec["sim_bq_topk"], rec
    assert rec["sim_ivfpq_rerank"] >= rec["sim_ivfpq_topk"], rec
    # more LSH tables = candidate superset = no recall loss
    assert rec["sim_lsh_multitable"] >= rec["sim_lsh_topk"], rec
    # the rerank rungs must actually buy something over the weakest
    # quantized signal (a rerank wired to the wrong score collapses)
    assert rec["sim_bq_rerank"] > rec["sim_pq_topk"], rec
