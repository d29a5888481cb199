"""Sinks (SURVEY §2.1 S2/S5/S6): parquet tables, single-file CSV
reports, and the multi-sheet Excel workbook export.

Reference behaviors preserved:

* table sink = overwrite semantics (``saveAsTable(mode='overwrite')``,
  reference ``pdf_to_table_excel.py:13``) → parquet overwrite here;
* CSV report written as ONE file with a header (the QA daily report,
  ``dailyMain.py:33``) — ``coalesce(1)`` is correct because reports are
  small aggregates; never coalesce a fact table;
* errors rendered INTO the report instead of crashing the job
  (``dataExceptions.py:17-23``) via :func:`error_report`;
* Excel export is a driver-side convenience for small result frames
  (``pdf_to_table_excel.py:16-32``) — gated on openpyxl being present.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    format: str = "parquet",
) -> None:
    """Columnar table sink (``parquet`` default, ``orc`` for ORC-based
    warehouses); at scale pass ``partition_by`` (e.g. date) so
    downstream readers get partition pruning."""
    if format not in ("parquet", "orc"):
        raise ValueError(f"unsupported table format {format!r} (parquet|orc)")
    writer = df.write.mode(mode).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink for co-located joins.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (bucket pruning + per-bucket sort-merge) — the
    standard pre-partitioning for repeatedly-joined 100 TB facts, where
    paying one write-side shuffle amortizes every later join.  Asserted
    shuffle-free in ``tests/test_plans.py``.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic: bool = True,
) -> None:
    """Hive-style partitioned parquet sink with DYNAMIC partition
    overwrite: an overwrite replaces only the partitions present in
    ``df``, leaving every other partition untouched — the idempotent
    daily-backfill primitive (re-run yesterday's batch without nuking
    the rest of the table).  ``dynamic=False`` restores Spark's default
    static overwrite (whole-path truncate) for full rebuilds.

    At warehouse scale the partition column is the pruning axis
    (date/region): readers filter on it and Catalyst prunes directories
    before listing files (asserted in ``tests/test_plans.py``).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode",
        "DYNAMIC" if dynamic else "STATIC",
    )
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_csv_report(df: DataFrame, path: str) -> None:
    """Single-file CSV with header (small report frames only)."""
    tmp = path + "_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)


def error_report(spark: SparkSession, message: str, path: str, logger=None) -> None:
    """Render a failure into the report file (reference
    ``DataException.to_csv`` behavior) so schedulers see output, not a
    crash; also logged to the job channel when one is passed
    (reference ``dailyLogger`` usage in ``dailyQA.py``)."""
    if logger is not None:
        logger.error("error report -> %s: %s", path, message)
    spark.createDataFrame([(message,)], ["Error"]).coalesce(1).toPandas().to_csv(
        path, index=False, encoding="utf-8"
    )


def ingest_pandas(spark: SparkSession, pdf) -> DataFrame:
    """pandas→Spark ingest (SURVEY §2 S3; reference ``pdf_to_table``,
    ``metrics/helpers/pdf_to_table_excel.py:6-13``): sanitize column
    names (spaces→underscores, the reference's rename lambda) and
    convert.  For tiny driver-side result frames only — a 100 TB input
    enters through ``spark.read``, never through the driver."""
    pdf2 = pdf.rename(columns=lambda c: str(c).replace(" ", "_"))
    return spark.createDataFrame(pdf2)


def pandas_to_table(spark: SparkSession, table: str, pdf, mode: str = "overwrite") -> None:
    """Reference ``pdf_to_table`` end-to-end: ingest + managed-table
    save (``pdf_to_table_excel.py:13`` — ``saveAsTable`` overwrite)."""
    ingest_pandas(spark, pdf).write.mode(mode).saveAsTable(table)


def excel_writer_args(path: str, append: bool = True) -> dict:
    """Writer-mode decision for the Excel sink (pure — testable without
    openpyxl): append into an existing workbook, replacing same-named
    sheets, exactly the reference's load_workbook+writer.sheets dance
    (``pdf_to_table_excel.py:16-32``); fresh write otherwise."""
    if append and os.path.isfile(path):
        return {"engine": "openpyxl", "mode": "a", "if_sheet_exists": "replace"}
    return {"engine": "openpyxl", "mode": "w"}


def write_excel_sheets(frames: dict[str, DataFrame], path: str, append: bool = True) -> bool:
    """Multi-sheet Excel export of small result frames, appending to an
    existing workbook when one is present (reference semantics:
    repeated runs accumulate sheets in ``custom_metrics_<db>.xlsx``).
    Returns False (no-op) when no Excel engine is installed — the
    parquet/CSV sinks are the durable outputs; Excel is presentation
    only."""
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return False
    import pandas as pd

    with pd.ExcelWriter(path, **excel_writer_args(path, append)) as xl:
        for sheet, df in frames.items():
            df.toPandas().to_excel(xl, sheet_name=sheet[:31], index=False)
    return True


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 256
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_mb)`` files and swap it in by a
    rename-aside dance (live → ``__old``, tmp → live, delete
    ``__old``).  Returns the new file count.

    This is the maintenance op every micro-batch ingest needs — the
    per-batch directories of :func:`~pyspark_pipelining_spark.streaming.
    windows.write_stream_idempotent` (and any streaming sink) accumulate
    small files whose per-file open/footer cost eventually dominates
    scans; compaction restores ``maxPartitionBytes``-sized splits.  At
    warehouse scale the same rewrite runs per partition directory so
    compaction parallelizes.

    Crash-safety: the rewrite lands fully in ``<path>__compacting``
    before the live directory is touched, and the live data is renamed
    aside (never deleted) until the compacted copy holds the live name —
    a crash at any step leaves a complete copy of the data on disk under
    ``path``, ``path__old``, or ``path__compacting``, recoverable by a
    single rename.  The unavailable window for concurrent readers is
    two directory renames (not a full recursive delete), but it is NOT
    zero: posix rename of two directories cannot be made one atomic op,
    and on object stores "rename" is copy+delete — a true
    zero-downtime swap needs a manifest/view indirection (e.g. a table
    format), which is out of scope here.
    """
    import math
    import shutil
    from pathlib import Path

    total = sum(f.stat().st_size for f in Path(path).rglob("*.parquet"))
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    tmp = f"{path}__compacting"
    old = f"{path}__old"
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(tmp)
    if Path(old).exists():  # leftover from a previous crashed run
        shutil.rmtree(old)
    Path(path).rename(old)
    try:
        Path(tmp).rename(path)
    except OSError:
        Path(old).rename(path)  # roll back: restore the live name
        raise
    shutil.rmtree(old)
    return len(list(Path(path).rglob("*.parquet")))
