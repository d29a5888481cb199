"""Streaming slice: the availableNow replay of the daily window agg
must agree exactly with its batch twin (and with DuckDB, via the
qa_hourshift oracle family)."""

from __future__ import annotations

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
