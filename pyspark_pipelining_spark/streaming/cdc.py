"""Continuous MERGE (CDC apply) over a keyed state table.

Delta/Iceberg users express this as ``MERGE INTO target USING updates``
inside ``foreachBatch``; with plain parquet the same exactly-once
contract comes from versioned snapshots: batch N merges into the
newest snapshot with version < N and writes ``v=N``.  A replayed batch
(failure between write and checkpoint commit) re-reads the same
predecessor and overwrites its own version — byte-identical, never
doubled.

Scale shape: each micro-batch is one full-outer key join of the delta
against the current snapshot (`operators/cdc.merge_upsert`) — the
standard upsert cost.  Snapshot discovery is a directory listing
(metadata-only).  For wide tables the snapshot would be bucketed by
the merge key to make the per-batch join shuffle-free; at test scale
plain parquet is used.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipelining_spark.operators.cdc import merge_upsert

_VERSION_RE = re.compile(r"^v=(\d+)$")


def _versions(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _VERSION_RE.match(name)
        if m and os.path.exists(os.path.join(table_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_current(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """The newest committed snapshot of the state table, or None."""
    vs = _versions(table_dir)
    if not vs:
        return None
    return spark.read.parquet(f"{table_dir}/v={vs[-1]}")


def make_apply_batch(
    table_dir: str,
    key: str,
    value_col: str,
    combine: Callable[[Column, Column], Column] | None = None,
    retain_versions: int = 3,
    compact_target_mb: int | None = None,
    pre_agg: str = "sum",
) -> Callable[[DataFrame, int], None]:
    """The per-micro-batch MERGE closure used by
    :func:`apply_changes_stream` (exposed so replay semantics are
    testable without fighting the streaming commit log): batch N merges
    the pre-aggregated deltas into the newest snapshot with version
    < N and overwrites ``v=N`` — idempotent under replay.

    ``pre_agg`` folds the batch per key before the merge: ``"sum"``
    (running totals, the default — pair with the additive ``combine``)
    or ``"max"`` (idempotent register state, e.g. streaming HLL
    register maintenance — pair with ``combine=F.greatest``)."""
    if pre_agg not in ("sum", "max"):
        raise ValueError(f"pre_agg must be 'sum' or 'max', got {pre_agg!r}")
    if combine is None:
        combine = lambda t, s: t + s  # noqa: E731 — delta accumulation
    retain = max(2, int(retain_versions))
    agg_fn = F.max if pre_agg == "max" else F.sum

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        import shutil

        from pyspark_pipelining_spark.sources.sinks import compact_parquet

        spark = df.sparkSession
        deltas = df.groupBy(key).agg(agg_fn(value_col).alias(value_col))
        prev = [v for v in _versions(table_dir) if v < batch_id]
        if prev:
            target = spark.read.parquet(f"{table_dir}/v={prev[-1]}")
            merged = merge_upsert(
                target, deltas, key, value_col, value_col, combine=combine
            ).select(key, F.col("merged").alias(value_col))
        else:
            merged = deltas
        merged.write.mode("overwrite").parquet(f"{table_dir}/v={batch_id}")
        if compact_target_mb is not None:
            compact_parquet(spark, f"{table_dir}/v={batch_id}", compact_target_mb)
        # prune AFTER the new version is fully committed: retention
        # keeps the newest `retain` (>= 2) versions, so the newest
        # snapshot's predecessor survives until the next checkpoint
        # commit — the only version a replay can still need
        for v in _versions(table_dir)[:-retain]:
            shutil.rmtree(f"{table_dir}/v={v}", ignore_errors=True)

    return apply_batch


def apply_changes_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str,
    value_col: str,
    combine: Callable[[Column, Column], Column] | None = None,
    await_seconds: int = 120,
    retain_versions: int = 3,
    compact_target_mb: int | None = None,
    pre_agg: str = "sum",
) -> None:
    """Fold a delta stream into a keyed parquet state table.

    ``stream_df`` rows are ``(key, value_col)`` deltas; within each
    micro-batch they are pre-aggregated with SUM per key, then merged
    into the current snapshot with ``merge_upsert`` (``combine``
    defaults to addition — the running-total convention).  Each batch
    commits snapshot ``v=<batch_id>``; readers use ``read_current``.

    Retention: after committing ``v=N``, versions older than the newest
    ``retain_versions`` are deleted (bounding the unbounded snapshot
    growth a long-running stream would otherwise accumulate).  The
    floor is 2 — exactly-once replay of the LAST batch re-reads its
    predecessor, so the newest snapshot's predecessor must survive
    until the next checkpoint commit; older ones are provably
    unreachable (checkpoint commits are sequential).

    Compaction: with ``compact_target_mb`` set, the freshly-committed
    snapshot is rewritten into ``target_mb``-sized files via
    :func:`~pyspark_pipelining_spark.sources.sinks.compact_parquet`
    (rename-aside, crash leaves a complete copy on disk) — per-batch
    merge output otherwise inherits the shuffle partition count and
    accretes small files batch over batch.
    """
    apply_batch = make_apply_batch(
        table_dir,
        key,
        value_col,
        combine=combine,
        retain_versions=retain_versions,
        compact_target_mb=compact_target_mb,
        pre_agg=pre_agg,
    )

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
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
            f"CDC stream did not finish within {await_seconds}s; stopped "
            f"(checkpoint at {checkpoint_dir} — re-run resumes)"
        )
