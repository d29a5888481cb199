"""Reach metrics — the engine's flagship query.

Reference semantics (``metrics/lib/hh_reach.py:16-43``): per dimension
value, the projected number of exposed households (``count``), the subset
reached through exactly one dimension value (``unique``), and the
remainder (``duplicates``).  Pipeline: drop null dims → dedup
(household, dim) → events-per-household count → uniqueness flag →
projection-weighted rounded sums → ``duplicates = count - unique``.

Spark-first changes vs the reference:

* the per-household count is a **window function** over the deduped
  frame instead of a groupBy + self-join (reference ``hh_reach.py:8-13``
  shuffles twice — once for the count, once for the join; the window
  partitionBy shuffles once and AQE handles skew).
* the per-dimension driver loop + pandas ``append`` accumulation
  (reference ``hh_reach.py:47-58,75-85`` — one Spark job per (type,
  dimension) pair) becomes a single unpivoted frame: dimensions melt to
  ``(dimension, value)`` rows via the ``stack`` SQL generator, so ALL
  dimensions compute in one job (SURVEY §4 anti-pattern fix).

Scale: one shuffle on household_id, one on (dimension, value); both
map-side-combined.  No driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_unique_flag(df: DataFrame, cnt_col: str, dim: str) -> DataFrame:
    """Dedup (cnt_col, dim) and flag households seen for exactly one
    dimension value (reference ``add_uniq_col``, ``hh_reach.py:7-13``,
    rebuilt join-free with a window)."""
    deduped = df.na.drop(subset=[dim]).dropDuplicates([cnt_col, dim])
    w = Window.partitionBy(cnt_col)
    return deduped.withColumn(
        "unique", F.when(F.count(F.lit(1)).over(w) > 1, F.lit(0)).otherwise(F.lit(1))
    )


def reach_count(
    df: DataFrame,
    cnt_col: str = "household_id",
    dim: str | None = None,
    project: str | None = None,
) -> DataFrame:
    """Projected reach by ``dim`` value (reference ``reach_count``,
    ``hh_reach.py:16-43``).  Returns columns
    ``dimension, value, count, unique, duplicates`` ordered by count desc.
    """
    if project is None:
        project = "projfact"
        df = df.withColumn(project, F.lit(1))
    dim_name = dim if dim is not None else "all"
    if dim is None:
        df = df.withColumn("all", F.lit(""))
    flagged = add_unique_flag(df, cnt_col, dim_name)
    out = (
        flagged.groupBy(F.col(dim_name).alias("value"))
        .agg(
            F.round(F.sum(project)).alias("count"),
            F.round(F.sum(F.col("unique") * F.col(project))).alias("unique"),
        )
        .withColumn("duplicates", F.col("count") - F.col("unique"))
        .select(F.lit(dim_name).alias("dimension"), "value", "count", "unique", "duplicates")
    )
    return out.orderBy(F.desc("count"), F.asc("value"))


def reach_all_dims(df: DataFrame, dims: list[str], cnt_col: str = "household_id", project: str = "projfact") -> DataFrame:
    """All-dimension reach in ONE job: melt ``dims`` into
    ``(dimension, value)`` rows with ``stack`` and run the reach pipeline
    once over the unpivoted frame.  Replaces the reference's O(dims)
    Spark-job loop (``hh_reach.py:47-58``)."""
    n = len(dims)
    pairs = ", ".join(f"'{d}', cast(`{d}` as string)" for d in dims)
    melted = df.select(
        cnt_col, project, F.expr(f"stack({n}, {pairs}) as (dimension, value)")
    ).na.drop(subset=["value"])
    deduped = melted.dropDuplicates([cnt_col, "dimension", "value"])
    w = Window.partitionBy(cnt_col, "dimension")
    flagged = deduped.withColumn(
        "unique", F.when(F.count(F.lit(1)).over(w) > 1, F.lit(0)).otherwise(F.lit(1))
    )
    return (
        flagged.groupBy("dimension", "value")
        .agg(
            F.round(F.sum(project)).alias("count"),
            F.round(F.sum(F.col("unique") * F.col(project))).alias("unique"),
        )
        .withColumn("duplicates", F.col("count") - F.col("unique"))
        .orderBy(F.desc("count"), F.asc("dimension"), F.asc("value"))
    )
