"""Event-time windowed aggregations — batch and Structured Streaming.

The reference is batch-only; its closest streaming-shaped semantics is
the dataQA daily job: shift event timestamps by N hours, truncate to a
date, group into 1-day buckets over a trailing period (reference
``dataQA/dailyQAHelpers.py:43-56``, ``dailyQA.py:44-63`` — SURVEY
§2.10).  This module expresses that same computation three ways:

* :func:`daily_counts_batch` — ``F.window`` tumbling 1-day buckets over
  a static frame (semantics identical to the QA temp-table);
* :func:`sliding_counts_batch` — the trailing-period variant as a
  sliding window;
* :func:`daily_counts_stream` — the same plan over ``readStream`` with
  a watermark for late data; :func:`run_stream_to_memory` executes it
  with ``trigger(availableNow=True)`` so tests and backfills replay the
  full history deterministically and terminate.

Scale: windowed streaming aggregation is Spark's native incremental
shuffle — state is partitioned by (window, keys); the watermark bounds
state size.  The same code runs continuously on a cluster by swapping
the trigger and sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _shifted(df: DataFrame, hourshift: int, ts_col: str) -> DataFrame:
    if hourshift:
        return df.withColumn(ts_col, F.col(ts_col) + F.expr(f"INTERVAL {hourshift} HOURS"))
    return df


def daily_counts_batch(
    df: DataFrame, hourshift: int = 0, ts_col: str = "ts", keys: list[str] | None = None
) -> DataFrame:
    """1-day tumbling event-time window counts (batch).

    Output: window_start (date), per-key columns, n_events, total_value.
    """
    keys = keys or []
    shifted = _shifted(df, hourshift, ts_col)
    return (
        shifted.groupBy(F.window(F.col(ts_col), "1 day").alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").cast("date").alias("window_start"), *keys, "n_events", "total_value")
        .orderBy("window_start", *keys)
    )


def sliding_counts_batch(
    df: DataFrame, window: str = "7 days", slide: str = "1 day", ts_col: str = "ts"
) -> DataFrame:
    """Trailing-period counts as a sliding event-time window (the QA
    "last N days" report for every day at once)."""
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("date").alias("window_start"),
            F.col("w.end").cast("date").alias("window_end"),
            "n_events",
        )
        .orderBy("window_start")
    )


def _file_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """Parquet file-stream source with nanos-as-long normalization.

    FileStreamSource requires a directory; wrap a single parquet file
    in a temp dir via symlink (production streams point at a dir)."""
    import os
    import tempfile

    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    static = spark.read.parquet(events_path)  # schema inference for the stream
    stream = spark.readStream.schema(static.schema).parquet(events_path)
    return normalize_event_time(stream, static, "ts")


def normalize_event_time(stream: DataFrame, static: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Coerce a raw parquet event-time column to ``TIMESTAMP``.

    File sources surface nanos-as-long parquet as ``bigint`` and
    non-UTC-adjusted parquet as ``TIMESTAMP_NTZ``; watermarks and
    ``unix_micros`` both require ``TIMESTAMP``.  With the session
    timezone pinned to UTC (session.py) both casts preserve the stored
    epoch micros exactly."""
    dt = dict(static.dtypes).get(ts_col)
    if dt == "bigint":  # nanos-as-long parquet
        return stream.withColumn(ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)"))
    if dt == "timestamp_ntz":
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def daily_counts_stream(
    spark: SparkSession,
    events_path: str,
    hourshift: int = 0,
    watermark: str = "1 day",
    keys: list[str] | None = None,
) -> DataFrame:
    """The streaming twin of :func:`daily_counts_batch` over a parquet
    file source with a late-data watermark."""
    keys = keys or []
    shifted = _shifted(_file_stream(spark, events_path), hourshift, "ts")
    return (
        shifted.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), "1 day").alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").cast("date").alias("window_start"), *keys, "n_events", "total_value")
    )


def dedup_stream(
    spark: SparkSession,
    events_path: str,
    key_cols: list[str] | None = None,
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exactly-once event dedup: keep the first arrival per
    key, with state BOUNDED by the watermark horizon
    (``dropDuplicatesWithinWatermark``) — the streaming face of the
    batch dedup family (``operators/dedup.exact_dedup``).

    At 100 TB/day, an unbounded ``dropDuplicates`` on a stream would
    grow key state forever; the watermark variant evicts keys older
    than the horizon, so state is O(events per horizon), which is the
    only shape that survives a long-running ingest.  Use append output
    mode (no aggregation to re-emit).
    """
    keys = key_cols or ["event_id"]
    stream = _file_stream(spark, events_path)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_sec: int = 120, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming frame with ``availableNow`` into a memory
    sink and return the result table — deterministic one-shot replay
    for tests/backfills.  ``complete`` for windowed aggregations,
    ``append`` for watermarked dedup/stateless maps."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(query_name)


def write_stream_idempotent(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    await_seconds: int = 120,
    transform=None,
) -> None:
    """Exactly-once file output on top of at-least-once micro-batch
    delivery: each batch lands in its own ``batch_id=N`` directory with
    ``overwrite`` mode, so a replayed batch (failure between sink write
    and checkpoint commit) overwrites its own previous attempt instead
    of duplicating rows.  The checkpoint makes re-running the whole
    query a no-op — already-committed batches are never re-delivered.

    This is the standard idempotent ``foreachBatch`` sink shape; readers
    consume ``out_dir`` as an ordinary partitioned parquet table.

    ``transform`` (optional, batch DataFrame → batch DataFrame) runs
    inside each batch before the write — the hook for per-batch partial
    aggregation (e.g. a mergeable sketch per micro-batch, merged at
    read time), keeping the sink's exactly-once batch_id layout.

    Failure surface: a query that errors re-raises here (a silent return
    would present an empty/partial ``out_dir`` as success), and a query
    still running at ``await_seconds`` is stopped and raises
    ``TimeoutError`` — no leaked stream either way.  Both cases are safe
    to re-run: the checkpoint skips committed batches and replayed
    batches overwrite their own directory.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        out = transform(df) if transform is not None else df
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(await_seconds)
    finally:
        if q.isActive:
            q.stop()
    if q.exception() is not None:
        raise q.exception()
    if not finished:
        raise TimeoutError(
            f"stream did not finish within {await_seconds}s; stopped (checkpoint "
            f"at {checkpoint_dir} — re-run resumes from the last committed batch)"
        )


def view_click_join_batch(
    views: DataFrame, clicks: DataFrame, within: str = "30 minutes"
) -> DataFrame:
    """Batch twin of :func:`view_click_join_stream`: every (view, click)
    pair for the same user with the click inside ``(view_ts,
    view_ts + within]`` — the impression-attribution join.

    Output: ``user_id, view_id, click_id, delta_us``.
    """
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        v.join(
            c,
            [
                v["user_id"] == c["user_id"],
                c["c_ts"] > v["v_ts"],
                c["c_ts"] <= F.expr(f"v_ts + INTERVAL {within}"),
            ],
        )
        .select(
            v["user_id"],
            "view_id",
            "click_id",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("delta_us"),
        )
    )


def view_click_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join — the Structured
    Streaming feature the rest of the streaming slice doesn't cover
    (stateful ops and window aggs keep per-key state; here BOTH inputs
    buffer, and the watermark + the time-range predicate are what let
    Spark evict matched/expired rows instead of holding two unbounded
    streams).

    State bound: each side keeps only rows younger than
    ``watermark + within`` in event time; the join condition's explicit
    upper bound is REQUIRED — without it the state is unbounded and
    Spark rejects the plan in append mode.

    Inner join, so results emit as matches arrive (the watermark gates
    state eviction, not output).  Identical output contract to
    :func:`view_click_join_batch` — the stream ≡ batch agreement is
    pinned in tests/test_streaming.py.
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        v.join(
            c,
            F.expr(
                f"user_id = c_user_id AND c_ts > v_ts"
                f" AND c_ts <= v_ts + INTERVAL {within}"
            ),
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("delta_us"),
        )
    )
