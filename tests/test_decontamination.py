"""Span-based decontamination (queued for round-14 staging; see the
queue section of queries_staged.py): eval-vs-train verbatim spans via
the unchanged exact-substring island machinery."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_pipelining_spark.queries_corpus import EVAL_SOURCE
from pyspark_pipelining_spark.queries_staged import (
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
