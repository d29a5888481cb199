"""Ordered-funnel analysis over an event stream (beyond-reference
scope — the conversion-path report every event-analytics engine ships:
how many users progressed view → click → purchase, in order).

Semantics: a user's stage is the length of the longest prefix of
``steps`` that can be matched by scanning their events once in
``(ts, event_id)`` order — each step must occur strictly after the
event that matched the previous step (same-timestamp ties resolve by
event id, so the definition is total and engine-portable).

Scale shape: ONE shuffle (on the user key).  Events collapse to a
per-user sorted array of (ts, type-index) pairs and a single
``F.aggregate`` left-fold advances the stage counter — no per-step
self-joins (the textbook SQL formulation joins the event table once
per funnel step, k shuffles and k scans for a k-step funnel; the fold
does it in one).  State per user is one int, payload per event is
~12 bytes, so a 100 TB event table funnels with one exchange of
compact pairs.  Python never runs: the fold is a Catalyst higher-order
function inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user deepest funnel stage reached (0 = none of ``steps``).

    Output: ``<user_col>, stage``.
    """
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = df.select(
        user_col,
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(id_col).alias("i"),
            F.col(type_col).alias("y"),
        ).alias("e"),
    )
    folded = (
        ev.groupBy(user_col)
        .agg(F.sort_array(F.collect_list("e")).alias("evs"))
        .select(
            user_col,
            F.aggregate(
                "evs",
                F.lit(0),
                lambda acc, x: F.when(
                    (acc < F.lit(len(steps)))
                    & (F.element_at(step_arr, acc + 1) == x["y"]),
                    acc + 1,
                ).otherwise(acc),
            ).alias("stage"),
        )
    )
    return folded


def funnel_report(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: users per deepest stage (all stages 0..len(steps)
    present, zero-filled via a broadcast stage spine so the report shape
    is fixed regardless of data).

    Output: ``stage, users``.
    """
    stages = funnel_stages(df, steps, user_col, ts_col, type_col)
    spine = df.sparkSession.range(0, len(steps) + 1).select(
        F.col("id").cast("int").alias("stage")
    )
    counts = stages.groupBy("stage").agg(F.count(F.lit(1)).alias("users"))
    return (
        spine.join(counts, on="stage", how="left")
        .select("stage", F.coalesce("users", F.lit(0)).alias("users"))
    )
