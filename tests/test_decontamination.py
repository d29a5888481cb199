"""Span-based decontamination (registered round 15 in queries_corpus.py):
eval-vs-train verbatim spans via the unchanged exact-substring island
machinery."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_pipelining_spark.queries_corpus import (
    EVAL_SOURCE,
    SQL_DECONTAMINATION_SPANS,
    q_decontamination_spans,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_oracle_compare_smoke_and_sf001(spark):
    """Bit-exact against the DuckDB oracle at both local gate scales,
    non-empty (an empty-but-matching result would hide the source
    filter inverting), and integer dtypes on every BIGINT column."""
    from tests.oracle_utils import compare, duck_connection

    compare(spark, SF_SMOKE, q_decontamination_spans, SQL_DECONTAMINATION_SPANS)
    compare(spark, SF_ORACLE, q_decontamination_spans, SQL_DECONTAMINATION_SPANS)
    sdf = q_decontamination_spans(spark, SF_SMOKE)
    assert sdf.count() > 0
    want = {
        "eval_doc": "bigint",
        "eval_start": "bigint",
        "train_doc": "bigint",
        "train_start": "bigint",
        "train_source": "string",
        "span_len": "bigint",
    }
    assert dict(sdf.dtypes) == want
    con = duck_connection(SF_SMOKE)
    pdf = con.execute(SQL_DECONTAMINATION_SPANS).df()
    for c, t in want.items():
        assert str(pdf.dtypes[c]) == ("object" if t == "string" else "int64"), c


def test_orientation_invariant(spark):
    """Every row is eval-side-first: eval_doc belongs to the eval
    source, train_source never IS the eval source, and span_len
    respects the threshold."""
    from pyspark_pipelining_spark.sources.registry import load_table

    rows = q_decontamination_spans(spark, SF_SMOKE).collect()
    docs = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "source")
        .collect()
    }
    assert rows
    for r in rows:
        assert docs[r["eval_doc"]] == EVAL_SOURCE, r
        assert docs[r["train_doc"]] != EVAL_SOURCE, r
        assert r["train_source"] == docs[r["train_doc"]], r
        assert r["span_len"] >= 24, r


def test_plan_has_no_cartesian_or_row_udf(spark):
    """The queue-entry plan invariant (the staged gate covers dict
    members; this query is pre-dict), plus the span machinery's
    broadcast over-cap anti-join surviving the source tagging."""
    plan = (
        q_decontamination_spans(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# decontamination_report (r13 verdict item 5, staged round 16 in
# queries_staged.py): per-eval-doc contamination rate over the span output
# ---------------------------------------------------------------------------


def test_report_oracle_compare_smoke_and_sf001(spark):
    """Bit-exact against the DuckDB oracle at both local gate scales,
    and integer dtypes on every BIGINT column."""
    from pyspark_pipelining_spark.queries_corpus import (
        SQL_DECONTAMINATION_REPORT,
        q_decontamination_report,
    )
    from tests.oracle_utils import compare, duck_connection

    compare(spark, SF_SMOKE, q_decontamination_report, SQL_DECONTAMINATION_REPORT)
    compare(spark, SF_ORACLE, q_decontamination_report, SQL_DECONTAMINATION_REPORT)
    sdf = q_decontamination_report(spark, SF_SMOKE)
    dt = dict(sdf.dtypes)
    for c in ("eval_doc", "n_spans", "n_train_docs", "overlap_chars", "n_chars", "flagged"):
        assert dt[c] == "bigint", (c, dt)
    con = duck_connection(SF_SMOKE)
    pdf = con.execute(SQL_DECONTAMINATION_REPORT).df()
    for c in ("eval_doc", "n_spans", "n_train_docs", "overlap_chars", "n_chars", "flagged"):
        assert str(pdf.dtypes[c]) == "int64", (c, pdf.dtypes)


def test_report_covers_every_eval_doc_with_exact_union(spark):
    """The report row set is EXACTLY the eval docs (clean ones appear
    with zeros), and per doc the overlap is the true interval-union
    char count of that doc's spans (recomputed here as a set of
    covered positions — the quadratic model), the rate is
    overlap/n_chars, and the flag is the exact 1/20 integer
    comparison."""
    from pyspark_pipelining_spark.queries_corpus import q_decontamination_spans
    from pyspark_pipelining_spark.queries_corpus import (
        DECON_RATE_DEN,
        DECON_RATE_NUM,
        q_decontamination_report,
    )

    from pyspark_pipelining_spark.sources.registry import load_table

    spans = q_decontamination_spans(spark, SF_SMOKE).collect()
    covered: dict[int, set] = {}
    per_train: dict[int, set] = {}
    n_spans: dict[int, int] = {}
    for r in spans:
        covered.setdefault(r["eval_doc"], set()).update(
            range(r["eval_start"], r["eval_start"] + r["span_len"])
        )
        per_train.setdefault(r["eval_doc"], set()).add(r["train_doc"])
        n_spans[r["eval_doc"]] = n_spans.get(r["eval_doc"], 0) + 1
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("source") == EVAL_SOURCE)
        .select("doc_id", "n_chars")
        .collect()
    }
    rows = q_decontamination_report(spark, SF_SMOKE).collect()
    assert {r["eval_doc"] for r in rows} == set(docs)
    assert any(r["n_spans"] == 0 for r in rows)  # clean docs included
    assert any(r["flagged"] == 1 for r in rows)  # and dirty ones flagged
    for r in rows:
        d = r["eval_doc"]
        assert r["overlap_chars"] == len(covered.get(d, set())), d
        assert r["n_spans"] == n_spans.get(d, 0), d
        assert r["n_train_docs"] == len(per_train.get(d, set())), d
        assert r["n_chars"] == docs[d]
        assert r["overlap_chars"] <= r["n_chars"], d
        want_flag = int(
            r["overlap_chars"] * DECON_RATE_DEN >= r["n_chars"] * DECON_RATE_NUM
        )
        assert r["flagged"] == want_flag, d
        assert r["split"] in ("train", "val", "test", "__rest")


def test_report_plan_invariants(spark):
    """No cartesian / row-UDF; the split assignment stays a map-side
    expression (no extra join for it)."""
    from pyspark_pipelining_spark.queries_corpus import q_decontamination_report

    plan = (
        q_decontamination_report(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
