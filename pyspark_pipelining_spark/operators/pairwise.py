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

from pyspark.sql import DataFrame, Window
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

    Plan shape (the reference's collect_set idea, UDF-free): one
    ``collect_set`` shuffle per household, then all ordered pairs with
    ``x <= y`` generated map-side by nested ``transform`` + ``flatten``
    and aggregated once.  The diagonal (x == y) IS the per-value
    audience total, so overlap counts and denominators come out of the
    SAME aggregation — no self-join, no second pass (a previous
    self-join formulation cost 24 exchanges / 16 scans; this is 1 scan,
    2 shuffles, and the pair fan-out is |set|² ≤ |distinct values|²
    per household, map-side).
    """
    if not project:
        df = df.withColumn("projfact", F.lit(1).cast("double"))
    sets = df.groupBy("household_id").agg(
        F.max("projfact").alias("projfact"),
        F.collect_set(dim).alias("aset"),
    )
    ordered_pairs = F.filter(
        F.flatten(
            F.transform(
                "aset",
                lambda x: F.transform("aset", lambda y: F.struct(x.alias("t1"), y.alias("t2"))),
            )
        ),
        lambda s: s["t1"] <= s["t2"],
    )
    cells = (
        sets.select("projfact", F.explode(ordered_pairs).alias("p"))
        .groupBy(F.col("p.t1").alias("type_1"), F.col("p.t2").alias("type_2"))
        .agg(F.sum("projfact").alias("hh"))
    )
    # the diagonal cell (v, v) is v's total audience; pull it onto every
    # pair row with two windows over the tiny cells frame — no joins,
    # cells stays single-referenced (no subtree recompute)
    diag = F.max(F.when(F.col("type_1") == F.col("type_2"), F.col("hh")))
    with_totals = cells.withColumn(
        "t1_hh", diag.over(Window.partitionBy("type_1"))
    ).withColumn("t2_hh", diag.over(Window.partitionBy("type_2")))
    return (
        with_totals.filter(F.col("type_1") < F.col("type_2"))
        .select(
            "type_1",
            "type_2",
            F.round("hh").alias("overlap_hh"),
            (F.col("hh") / F.col("t1_hh")).alias("pct_of_type_1"),
            (F.col("hh") / F.col("t2_hh")).alias("pct_of_type_2"),
        )
        .orderBy(F.desc("overlap_hh"), "type_1", "type_2")
    )
