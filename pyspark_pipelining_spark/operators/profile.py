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


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Reconcile two versions of a table by key: per-status row counts
    (``added`` = key only in right, ``removed`` = only in left,
    ``changed`` / ``unchanged`` by a portable row fingerprint over
    ``compare_cols``) — the anti-entropy check that validates a
    migration, backfill, or replication target against its source.

    The fingerprint is md5 over a unit-separator (0x1f) concat with an
    explicit null sentinel, so it is engine-portable (callers must
    stringify floats via a decimal cast upstream — raw double→string
    formatting is not cross-engine stable).

    Scale shape: each side reduces map-side to (key, hash) before the
    one full-outer join shuffle on the key; the status aggregation is
    a 4-row map-side-combined groupBy.  Nothing wider than
    keys + one hash column ever moves.
    """
    sep, sent = chr(0x1F), chr(0x01)  # 0x00 is unsafe in some engines' varchars
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(sent)) for c in compare_cols]
    fp = F.md5(F.concat_ws(sep, *parts))
    lh = left.select(*key_cols, fp.alias("h_l"))
    rh = right.select(*key_cols, fp.alias("h_r"))
    joined = lh.join(rh, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("h_l").isNull(), F.lit("added"))
        .when(F.col("h_r").isNull(), F.lit("removed"))
        .when(F.col("h_l") == F.col("h_r"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )
