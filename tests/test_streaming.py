"""Streaming slice: the availableNow replay of the daily window agg
must agree exactly with its batch twin (and with DuckDB, via the
qa_hourshift oracle family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_pipelining_spark.sources.registry import load_table
from pyspark_pipelining_spark.streaming import (
    daily_counts_batch,
    daily_counts_stream,
    run_stream_to_memory,
    sliding_counts_batch,
)
from tests.conftest import SF_SMOKE


def test_stream_matches_batch(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    batch = daily_counts_batch(ev, hourshift=5, keys=["event_type"])
    stream = daily_counts_stream(
        spark, f"{SF_SMOKE}/events.parquet", hourshift=5, keys=["event_type"]
    )
    result = run_stream_to_memory(stream, "daily_counts_test")
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in result.collect())
    assert b == s and len(b) > 0


def test_sliding_window_covers_period(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    out = sliding_counts_batch(ev, "7 days", "1 day").collect()
    assert len(out) > 0
    # every 7-day window's count is >= any single day within it
    daily = {r["window_start"]: r["n_events"] for r in daily_counts_batch(ev).collect()}
    for r in out:
        total_days = sum(
            v for d, v in daily.items() if r["window_start"] <= d < r["window_end"]
        )
        assert r["n_events"] == total_days


def test_sessionize_stream_matches_batch(spark):
    """The availableNow replay of the stateful sessionizer must emit
    exactly the batch twin's sessions minus each user's final
    (still-open) session."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_pipelining_spark.streaming import sessionize_batch, sessionize_stream

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "event_id", "value")
    batch = sessionize_batch(ev, gap_min=30).collect()
    last = {}
    for r in batch:
        last[r.user_id] = max(last.get(r.user_id, 0), r.session_no)
    expected = sorted(
        (r.user_id, r.session_no, r.start_us, r.end_us, r.n_events, round(r.total_value, 2))
        for r in batch
        if r.session_no != last[r.user_id]
    )

    d = tempfile.mkdtemp(prefix="stream_sess_")
    os.symlink(f"{SF_SMOKE}/events.parquet", os.path.join(d, "events.parquet"))
    static = spark.read.parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    if dict(static.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    out = sessionize_stream(stream.select("user_id", "ts", "event_id", "value"), gap_min=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()
    got = sorted(
        (r.user_id, r.session_no, r.start_us, r.end_us, r.n_events, round(r.total_value, 2))
        for r in spark.table("sess_test").collect()
    )
    assert len(got) > 0
    assert got == expected


def test_dedup_stream_drops_duplicate_events(spark, tmp_path):
    """Streaming dedup (watermark-bounded state) must keep exactly one
    row per event_id when the source replays duplicates."""
    import pandas as pd

    from pyspark_pipelining_spark.streaming import dedup_stream

    ev = load_table(spark, SF_SMOKE, "events").limit(200).toPandas()
    dup = pd.concat([ev, ev.head(50)], ignore_index=True)  # 50 replayed ids
    src = str(tmp_path / "dup_events.parquet")
    dup.to_parquet(src)
    out = dedup_stream(spark, src, key_cols=["event_id"], watermark="1 day")
    res = run_stream_to_memory(out, "dedup_stream_test", output_mode="append")
    ids = [r["event_id"] for r in res.select("event_id").collect()]
    assert len(ids) == len(set(ids)) == ev["event_id"].nunique()


def test_corpus_prep_stages_run_on_streams(spark, tmp_path):
    """The text/corpus operators are stateless per-row transforms, so the
    same code must run unchanged over a Structured Streaming source —
    the micro-batch ingest shape of a continuously-crawled corpus.
    Stream results (quality + language + PII scrub over a parquet
    stream) must equal the batch run bit-for-bit."""
    from pyspark_pipelining_spark.operators import corpus as corpus_ops
    from pyspark_pipelining_spark.operators import text as text_ops
    from pyspark_pipelining_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs_in")
    docs.write.mode("overwrite").parquet(src)

    def prep(df):
        qual = text_ops.quality_score(df).select("doc_id", "quality")
        lang = text_ops.language_id(df).select("doc_id", "pred_lang")
        clean = corpus_ops.scrub_pii(df).select("doc_id", "clean")
        return qual.join(lang, "doc_id").join(clean, "doc_id")

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        prep(stream)
        .writeStream.format("memory")
        .queryName("corpus_ingest")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from corpus_ingest").collect()))
    want = sorted(map(tuple, prep(docs).collect()))
    assert got == want and len(got) > 0


def test_idempotent_stream_sink_no_duplicates_on_rerun(spark, tmp_path):
    """Re-running a checkpointed availableNow query must not re-deliver
    committed batches, and the batch_id=N overwrite layout must yield
    exactly the source rows once."""
    from pyspark_pipelining_spark.sources.registry import load_table
    from pyspark_pipelining_spark.streaming.windows import write_stream_idempotent
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    write_stream_idempotent(stream, out, ckpt)
    first = sorted(map(tuple, spark.read.parquet(out).select("doc_id", "source").collect()))
    assert sorted(map(tuple, docs.collect())) == first and len(first) > 0

    # second run against the same checkpoint: no new batches, no dupes
    stream2 = spark.readStream.schema(docs.schema).parquet(src)
    write_stream_idempotent(stream2, out, ckpt)
    again = sorted(map(tuple, spark.read.parquet(out).select("doc_id", "source").collect()))
    assert again == first


def test_idempotent_stream_sink_reraises_batch_failure(spark, tmp_path):
    """A query whose batch function throws must surface the error to the
    caller, not return as if the write succeeded."""
    import pytest

    from pyspark_pipelining_spark.sources.registry import load_table
    from pyspark_pipelining_spark.streaming.windows import write_stream_idempotent
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    src = str(tmp_path / "src")
    docs.write.mode("overwrite").parquet(src)

    # a stream whose plan fails at execution time: ANSI division by zero
    # inside the batch write (raise_error survives the stream planner)
    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(src)
        .select(F.raise_error(F.lit("boom in batch")).alias("x"))
    )
    with pytest.raises(Exception, match="boom in batch"):
        write_stream_idempotent(
            stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
