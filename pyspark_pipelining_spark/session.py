"""SparkSession factory.

The reference hand-tuned a static cluster per task (7x16-core executors,
``spark.sql.shuffle.partitions=500``, unlimited driver result size —
reference ``metrics/tasks/create_hh_metrics_task.py:34-43``).  The rebuild
instead relies on AQE to pick shuffle parallelism at runtime and never
lifts the driver result cap: pipelines here stay lazy end-to-end, so
nothing large ever lands on the driver.

At cluster scale the same builder is used with ``master`` left to
spark-submit; the AQE + skew-join settings below are the ones that matter
at 100 TB (runtime partition coalescing, skew splitting, broadcast-join
threshold).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark_pipelining_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for local runs; on
    a real cluster pass ``master=None`` *and* launch through spark-submit,
    which wins over the builder default.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate clones the generator's input expression
        # into a filter that is then pushed below exchanges — for explode
        # over computed arrays (shingling, banding) that re-evaluates the
        # whole array expression per row on the narrow pre-shuffle side.
        # The saved empty-array rows never outweigh that at any scale.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        # Local default: match thread count.  AQE coalesces downward at
        # runtime, so this is an upper bound, not a hand-tuned constant.
        builder = builder.config("spark.sql.shuffle.partitions", cpus)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
