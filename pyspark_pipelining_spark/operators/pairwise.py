"""Pairwise media-type overlap — both reference formulations, UDF-free.

Form 1 (pivot matrix — reference ``metrics/lib/hh_pairwise.py:25-42``):
pivot each household's exposures into a 0/1 matrix over the dimension's
values, then count projected households per combination row.

Form 2 (pair explosion — reference ``metrics/lib/hh_pairwise2.py:6-61``):
for every unordered pair of dimension values, the projected number of
households exposed to BOTH, plus that overlap as a share of each value's
total audience.  The reference shipped a Python UDF producing all sorted
2-combinations of a collect_set (via ``sc.addPyFile`` of a generated
module, ``create_pairwise_task.py:15-24``); the rebuild replaces it with
a **self-join on the deduped (household, value) frame** — pure JVM-side
built-ins, no Python worker in the hot path (SURVEY §2 X1 mapping).

Scale: the self-join shuffles on household_id once (both sides share the
partitioning); per-value totals are a small agg broadcast back onto pair
rows.  No collected pandas lookup tables (reference J8 anti-pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_overlap_matrix(df: DataFrame, dim: str, values: list[str], project: bool = True) -> DataFrame:
    """0/1 exposure-combination matrix with projected household counts.

    ``values`` pins the pivot columns up front — avoids Spark's extra
    distinct-values job AND makes the output schema static (what a 100 TB
    plan needs; also required for stable oracle SQL).
    Output: one column per value (0/1) + ``count``.
    """
    if not project:
        df = df.withColumn("projfact", F.lit(1).cast("double"))
    pivoted = (
        df.withColumn("one", F.lit(1))
        .groupBy("household_id", "projfact")
        .pivot(dim, values)
        .max("one")
        .na.fill(0, values)
    )
    return (
        pivoted.groupBy(*values)
        .agg(F.round(F.sum("projfact")).alias("count"))
        .orderBy(*[F.desc(v) for v in values])
    )


def pair_overlap(df: DataFrame, dim: str, project: bool = True) -> DataFrame:
    """Unordered-pair overlap with per-side audience shares.

    Output: ``type_1, type_2, overlap_hh, pct_of_type_1, pct_of_type_2``
    (reference output shape, ``hh_pairwise2.py:28-47``).
    """
    if not project:
        df = df.withColumn("projfact", F.lit(1).cast("double"))
    # household × distinct value, with the household's projection factor
    dd = df.select("household_id", "projfact", dim).dropDuplicates(["household_id", dim])
    # per-value projected audience (reference ``overall_numbers``)
    totals = dd.groupBy(dim).agg(F.sum("projfact").alias("total_hh"))
    a = dd.select("household_id", "projfact", F.col(dim).alias("type_1"))
    b = dd.select("household_id", F.col(dim).alias("type_2"))
    pairs = (
        a.join(b, on="household_id")
        .where(F.col("type_1") < F.col("type_2"))
        .groupBy("type_1", "type_2")
        .agg(F.sum("projfact").alias("overlap_hh"))
    )
    t1 = F.broadcast(totals.select(F.col(dim).alias("type_1"), F.col("total_hh").alias("t1_hh")))
    t2 = F.broadcast(totals.select(F.col(dim).alias("type_2"), F.col("total_hh").alias("t2_hh")))
    return (
        pairs.join(t1, "type_1")
        .join(t2, "type_2")
        .select(
            "type_1",
            "type_2",
            F.round("overlap_hh").alias("overlap_hh"),
            (F.col("overlap_hh") / F.col("t1_hh")).alias("pct_of_type_1"),
            (F.col("overlap_hh") / F.col("t2_hh")).alias("pct_of_type_2"),
        )
        .orderBy(F.desc("overlap_hh"), "type_1", "type_2")
    )
