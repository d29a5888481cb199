"""SemDeDup-style semantic dedup (``operators/dedup.semantic_dedup``,
query ``semantic_dedup``, registered round 14 in queries_llm.py —
r12 verdict item 4).

The registry gates (oracle compare at sf0.001, pandas-dtype,
plan-invariant, plan-shape lock) run via ``queries_llm`` imports in
their own files; this file pins the operator's LAWS and the
cluster-bounded plan shape:

* collapse law — an exact twin of an earlier (smaller-id) vector is
  ALWAYS dropped: twins share a cluster (assignment is a pure function
  of the vector once centroids are fixed) and the later twin sees the
  earlier at cosine exactly 1;
* orthogonality law — mutually-orthogonal vectors are NEVER dropped
  (cosine 0 < tau for any positive tau);
* the pair join is keyed by ``cell`` (cluster-bounded — never
  all-pairs), and the keeper join is a broadcast.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_pipelining_spark.operators.dedup import semantic_dedup
from pyspark_pipelining_spark.queries_llm import (
    SEMD_ITERS,
    SEMD_K,
    SEMD_TAU,
    q_semantic_dedup,
)
from tests.conftest import SF_SMOKE

DIM = 8


def _frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


@given(
    scales=st.lists(
        st.integers(min_value=1, max_value=3), min_size=2, max_size=DIM
    ),
    dups=st.lists(st.integers(min_value=0, max_value=DIM - 1), max_size=4),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_collapse_and_orthogonality_laws(spark, scales, dups):
    """Base vectors are one-hot on DISTINCT dimensions (pairwise
    orthogonal, arbitrary positive integer scales — lattice-exact);
    ``dups`` appends exact copies of base vectors.  The exact law:
    ``dropped == 1`` iff the vector has an identical twin with a
    smaller vec_id — duplicates always collapse onto their earliest
    copy, orthogonal vectors never collapse, and nothing else can
    drop (every non-twin pair has cosine exactly 0)."""
    base = []
    for d, s in enumerate(scales):
        v = [0] * DIM
        v[d] = s
        base.append(tuple(v))
    vecs = base + [base[i % len(base)] for i in dups]
    got = {
        r["vec_id"]: r["dropped"]
        for r in semantic_dedup(_frame(spark, vecs), k=4, iters=2).collect()
    }
    assert set(got) == set(range(len(vecs)))
    for i, v in enumerate(vecs):
        model = int(any(vecs[j] == v for j in range(i)))
        assert got[i] == model, (i, v, got)


def test_keeper_is_rank_one_and_never_dropped(spark):
    """Structural output invariants on the real table: exactly one
    rank-1 member per cell, it is its own keeper, and it is never
    dropped (it has no earlier-ranked cluster-mate)."""
    rows = q_semantic_dedup(spark, SF_SMOKE).collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        firsts = [m for m in members if m["rank"] == 1]
        assert len(firsts) == 1, cell
        assert firsts[0]["vec_id"] == firsts[0]["keeper_id"]
        assert firsts[0]["dropped"] == 0
        assert all(m["keeper_id"] == firsts[0]["vec_id"] for m in members)
        assert sorted(m["rank"] for m in members) == list(
            range(1, len(members) + 1)
        )


def test_plan_pair_join_is_cluster_keyed(spark):
    """The 100 TB contract: the member-pair join keys on ``cell``
    (cluster-bounded fanout — the paper's k knob), never a cartesian;
    the k-row keeper join is a broadcast; no row-wise Python UDF."""
    plan = (
        q_semantic_dedup(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    key_lines = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith(("Left keys", "Right keys"))
    ]
    cell_keyed = [
        line
        for line in key_lines
        if re.search(r"\[cell#\d+L?\]", line) is not None
    ]
    assert cell_keyed, key_lines
    assert "BroadcastExchange" in plan


def test_tau_rejects_nonpositive(spark):
    emb = _frame(spark, [(1, 0, 0, 0, 0, 0, 0, 0)])
    with pytest.raises(ValueError):
        semantic_dedup(emb, tau=(0, 10))


def test_staged_params_are_in_corpus_regime():
    """The staged query's threshold must sit below 1/2: the synthetic
    embeddings are near-orthogonal (measured max pairwise cosine 0.48),
    so a production-style 0.95 would make ``dropped`` constant-zero and
    the oracle value-blind to the decision arithmetic."""
    p, q = SEMD_TAU
    assert 0 < p / q < 0.5
    assert SEMD_K >= 8 and SEMD_ITERS >= 1


@given(
    scales=st.lists(
        st.integers(min_value=1, max_value=3), min_size=2, max_size=DIM
    ),
    dups=st.lists(st.integers(min_value=0, max_value=DIM - 1), max_size=4),
    cap=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_max_candidates_exact_below_cap_and_under_drops_above(
    spark, scales, dups, cap
):
    """The hot-cluster skew lever's two contracts: with the cap at or
    above every cluster's size the output is BIT-IDENTICAL to full
    mode, and with any cap the capped drops are a SUBSET of the full
    drops (the approximation only ever under-drops — the conservative
    keep direction)."""
    base = []
    for d, s in enumerate(scales):
        v = [0] * DIM
        v[d] = s
        base.append(tuple(v))
    vecs = base + [base[i % len(base)] for i in dups]
    emb = _frame(spark, vecs)
    full = {
        r["vec_id"]: tuple(r)
        for r in semantic_dedup(emb, k=4, iters=2).collect()
    }
    capped_big = {
        r["vec_id"]: tuple(r)
        for r in semantic_dedup(
            emb, k=4, iters=2, max_candidates=len(vecs)
        ).collect()
    }
    assert capped_big == full  # cap >= every cluster size -> identical
    capped = {
        r["vec_id"]: r["dropped"]
        for r in semantic_dedup(emb, k=4, iters=2, max_candidates=cap).collect()
    }
    for vid, row in full.items():
        if capped[vid] == 1:
            assert row[4] == 1, (vid, cap)  # capped drop => full drop


def test_max_candidates_rejects_nonpositive(spark):
    emb = _frame(spark, [(1, 0, 0, 0, 0, 0, 0, 0)])
    with pytest.raises(ValueError):
        semantic_dedup(emb, max_candidates=0)


def test_corpus_embeddings_within_lattice_precondition(spark):
    """The decimal(38,0) headroom argument (operator docstring
    PRECONDITION, r13 ADVICE) assumes |x| <= 1 so |s| <= grid; an
    out-of-range corpus would silently NULL-overflow Spark-side while
    DuckDB's HUGEINT stays exact.  Pin the committed embedding table
    inside the envelope so a testdata regeneration that breaks the
    convention fails loudly here, not as a red driver row."""
    from pyspark.sql import functions as F

    from pyspark_pipelining_spark.sources.registry import load_table
    from tests.conftest import SF_ORACLE

    # probe EVERY committed scale semantic_dedup runs against in the
    # local gates (sf0.001 every run, sf0.01 in the rotating oracle
    # tier) — a regeneration of either table outside the envelope must
    # fail HERE, not as a silent NULL-overflow divergence (r14 ADVICE;
    # sf0.1 is covered by the same probe inside
    # tools/sf01_oracle_spotcheck.py)
    for sf_dir in (SF_SMOKE, SF_ORACLE):
        emb = load_table(spark, sf_dir, "embeddings")
        mx = emb.select(
            F.max(
                F.expr(
                    "aggregate(embedding, CAST(0.0 AS DOUBLE),"
                    " (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
                )
            ).alias("mx")
        ).collect()[0]["mx"]
        assert mx <= 1.0, (sf_dir, mx)
