"""Gopher repetition filters (``operators/text.gopher_repetition``;
queued query ``gopher_repetition`` — Rae et al. 2021 Table A1, the
published repetition-quality rung).

Layers: DuckDB oracle compare + dtype parity at both gate scales, a
quadratic pure-Python model under hypothesis (top-n-gram coverage AND
the duplicated-3-gram word-interval union — overlaps counted once),
hand-checked flag cases at the published thresholds, and the plan
invariants."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_pipelining_spark.operators.text import (
    GOPHER_DUP3,
    GOPHER_TOP2,
    GOPHER_TOP3,
    gopher_repetition,
)
from pyspark_pipelining_spark.queries_llm import (
    SQL_GOPHER_REPETITION,
    q_gopher_repetition,
)
from tests.conftest import SF_ORACLE, SF_SMOKE

INT_COLS = ["n_words", "n_chars", "top2_cov", "top3_cov", "dup3_cov_words"]


def model(text: str) -> tuple:
    """(n_words, n_chars, top2_cov, top3_cov, dup3_cov_words, flagged)
    — quadratic mirror of the operator."""
    w = re.split(" +", text.lower())
    n_words, n_chars = len(w), len(text)

    def top_cov(n: int) -> int:
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
        if not grams:
            return 0
        cnt = Counter(grams)
        top_c = max(cnt.values())
        return max(c * len(g) for g, c in cnt.items() if c == top_c)

    t2, t3 = top_cov(2), top_cov(3)
    g3 = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
    cnt3 = Counter(g3)
    covered: set[int] = set()
    for i, g in enumerate(g3, start=1):
        if cnt3[g] > 1:
            covered.update(range(i, i + 3))
    d3 = len(covered)
    (p2, q2), (p3, q3), (pd, qd) = GOPHER_TOP2, GOPHER_TOP3, GOPHER_DUP3
    flag = int(
        t2 * q2 > n_chars * p2 or t3 * q3 > n_chars * p3 or d3 * qd > n_words * pd
    )
    return (n_words, n_chars, t2, t3, d3, flag)


def _run(spark, texts: list[str]) -> dict[int, tuple]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: tuple(r[c] for c in INT_COLS + ["flagged_repetition"])
        for r in gopher_repetition(df).collect()
    }


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=4
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_matches_python_model(spark, texts):
    """Engine output equals the quadratic model on arbitrary tiny-
    alphabet corpora (repeated words, empty tokens from runs of
    spaces, 0/1/2-word docs, heavy gram ties — the tie-break and
    interval-union edge cases)."""
    got = _run(spark, texts)
    assert got == {i: model(t) for i, t in enumerate(texts)}


def test_known_flag_cases(spark):
    """A pathological doc (one bigram pasted over and over) flags on
    every signal; diverse text flags on none; the interval union
    counts overlapping duplicated 3-grams once."""
    spammy = "buy now " * 20  # 'buy now' dominates; dup 3-grams everywhere
    # long enough that the longest all-unique gram stays under the
    # thresholds (on a short doc ANY single gram exceeds 20% of chars —
    # the reason the paper pairs these filters with length minimums)
    clean = " ".join(f"w{i:02d}x" for i in range(40))
    got = _run(spark, [spammy.strip(), clean])
    n_words, n_chars, t2, t3, d3, flag = got[0]
    assert flag == 1 and d3 == n_words  # fully covered by dup 3-grams
    assert got[1][5] == 0 and got[1][4] == 0
    # union not double-counted: covered words can never exceed n_words
    assert d3 <= n_words


def test_oracle_compare_and_dtypes(spark):
    from tests.oracle_utils import compare, duck_connection

    compare(spark, SF_SMOKE, q_gopher_repetition, SQL_GOPHER_REPETITION)
    compare(spark, SF_ORACLE, q_gopher_repetition, SQL_GOPHER_REPETITION)
    sdf = q_gopher_repetition(spark, SF_SMOKE)
    dt = dict(sdf.dtypes)
    for c in INT_COLS + ["doc_id", "flagged_repetition"]:
        assert dt[c] == "bigint", (c, dt)
    con = duck_connection(SF_SMOKE)
    pdf = con.execute(SQL_GOPHER_REPETITION).df()
    for c in INT_COLS + ["doc_id", "flagged_repetition"]:
        assert str(pdf.dtypes[c]) == "int64", (c, pdf.dtypes)
    # non-degeneracy: the flag must split the corpus (a constant column
    # would leave the threshold arithmetic value-blind)
    flags = [r["flagged_repetition"] for r in sdf.collect()]
    assert 0 < sum(flags) < len(flags), sum(flags)


def test_plan_invariants(spark):
    """No cartesian / row-UDF; gram construction is map-side (the only
    Generate feeds from the projected scan, not a shuffled frame)."""
    plan = (
        q_gopher_repetition(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_pack_envelope_guard(spark):
    """The (count, coverage) single-BIGINT packing silently corrupts
    both the count ordering and the ``% key`` coverage extraction once
    coverage >= key — identically in BOTH engines, so the oracle gate
    cannot catch it (r14 ADVICE).  The operator therefore carries a
    runtime ``raise_error`` branch: verify it stays silent inside the
    envelope (values equal the plain packing) and fires loudly beyond
    it (exercised with a tiny key — a real overflow needs a ~1 GB
    doc)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from pyspark_pipelining_spark.operators.text import _GOPHER_KEY, _gopher_pack

    df = spark.createDataFrame(
        [(3, 40), (1, 99)], "c long, cov long"
    )
    ok = df.select(_gopher_pack(F.col("c"), F.col("cov")).alias("k")).collect()
    assert sorted(r["k"] for r in ok) == sorted(
        c * _GOPHER_KEY + cov for c, cov in [(3, 40), (1, 99)]
    )
    with pytest.raises(SparkRuntimeException, match="packing key"):
        df.select(
            _gopher_pack(F.col("c"), F.col("cov"), key=50).alias("k")
        ).collect()


def test_pack_envelope_headroom_on_committed_tables(spark):
    """Gate-time envelope check against the committed gate-scale
    corpora: the largest per-(doc, gram) coverage c*len(g) must sit
    far below the packing key, so the runtime guard is dormant at
    every certified scale (the sf0.1 table is ~100x sf0.001 and its
    max coverage stays orders of magnitude under 1e9 — checked at the
    two pytest scales; sf0.1 runs through the same guarded operator in
    tools/sf01_oracle_spotcheck.py)."""
    from pyspark_pipelining_spark.operators.text import _GOPHER_KEY, with_words
    from pyspark_pipelining_spark.sources.registry import load_table

    for sf_dir in (SF_SMOKE, SF_ORACLE):
        docs = load_table(spark, sf_dir, "documents")
        words = with_words(docs)
        g2 = (
            words.filter(F.size("words") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(words) - 1), i ->"
                        " concat_ws(' ', element_at(words, CAST(i AS INT)),"
                        " element_at(words, CAST(i + 1 AS INT))))"
                    )
                ).alias("g"),
            )
            .groupBy("doc_id", "g")
            .agg((F.count(F.lit(1)) * F.max(F.length("g"))).alias("cov"))
        )
        mx = g2.select(F.max("cov").alias("m")).collect()[0]["m"]
        assert mx is not None and mx < _GOPHER_KEY, (sf_dir, mx)
