"""One-pass table profiler (beyond-reference scope; the data-quality
companion to dailyQA's aggregate checks in the reference,
``dataQA/dailyQA.py:40-64``, generalized to any table/column list).

Emits one row per profiled column: row count, null count, exact
distinct count, min and max (rendered as strings so heterogeneous
columns share one schema).

Scale notes: everything is computed in a SINGLE ``agg`` pass over the
table; Spark plans the multi-distinct via Expand (one replicated pass
per distinct column), which is the exact-answer cost — at 100 TB
switch ``exact=False`` to ``approx_count_distinct`` (HLL, one pass,
no Expand) when +-2% error is acceptable.  The long-format pivot is a
1-row driver-side array explode — free.

Profiled columns should be integer/string-typed: min/max of doubles or
timestamps render differently across engines (the oracle compares
strings), which is a rendering concern, not a correctness one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """Profile ``cols`` of ``df`` in one aggregation pass.

    Output: (col_name, n_rows, n_nulls, n_distinct, min_val, max_val),
    one row per profiled column, ordered by column name."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{i}"))
        nd = F.countDistinct(c) if exact else F.approx_count_distinct(c)
        aggs.append(nd.cast("long").alias(f"__nd_{i}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{i}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{i}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{i}").alias("n_nulls"),
            F.col(f"__nd_{i}").alias("n_distinct"),
            F.col(f"__min_{i}").alias("min_val"),
            F.col(f"__max_{i}").alias("max_val"),
        )
        for i, c in enumerate(cols)
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


def fk_integrity(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity report: one row per declared relation
    ``(name, child, child_key, parent, parent_key)`` with the child row
    count, null-key count, and orphan count (non-null child keys with
    no matching parent).  The coverage direction (parent→child, "which
    parents have no children") is just the same check with the roles
    swapped, so callers declare it as another relation.

    Scale shape: the parent side is projected to its (distinct) key
    column BEFORE the join, so only keys move; orphans come from a
    ``left_anti`` join (Spark broadcasts the key projection when small,
    shuffles on the key otherwise — both correct).  The three counts
    per relation are scalar 1-row aggregates combined by a 1-row
    crossJoin — no data-sized driver work.  NULL child keys are
    excluded from the orphan count (SQL join semantics) and surfaced
    separately."""
    reports = []
    for name, child, child_key, parent, parent_key in relations:
        counts = child.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.col(child_key).isNull().cast("long")).alias("n_null_keys"),
        )
        parent_keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
        orphans = (
            child.filter(F.col(child_key).isNotNull())
            .join(parent_keys, on=child_key, how="left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        reports.append(
            counts.crossJoin(orphans).select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_null_keys",
                "n_orphans",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("relation")
