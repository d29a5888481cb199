"""Incremental weekly reach — the reference's loop, rebuilt as windows.

Reference semantics (``metrics/lib/hh_reach_week.py:6-23``): for each
week, the projected count of households exposed that week for the FIRST
time, plus a running cumulative total.  The reference runs one Spark job
per week (anti-join against all earlier weeks, then a global sum) and
cumsums in pandas — O(weeks) shuffles and driver round-trips.

Rebuild (SURVEY §2 W1/W2): "first exposed in week w" ≡ ``min(week) per
household == w``, so the whole computation is ONE aggregation plus a
cumulative window — a single shuffle regardless of the number of weeks.

Note: the reference's ``project=False`` branch was a no-op (result of
``withColumn`` discarded, ``hh_reach_week.py:8`` — SURVEY §5 bug list);
here the flag genuinely replaces ``projfact`` with 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def incremental_weekly_reach(df: DataFrame, project: bool = True) -> DataFrame:
    """Weekly first-exposure counts + cumulative reach.

    Input needs ``week, household_id, projfact``.  Output:
    ``week, counts, cum_counts`` (one row per distinct exposure week).
    """
    if not project:
        df = df.withColumn("projfact", F.lit(1).cast("long"))
    first_week = df.groupBy("household_id").agg(
        F.min("week").alias("week"),
        # projfact is 1:1 per household (joined from the projection dim);
        # max() carries it through the aggregation.
        F.max("projfact").alias("projfact"),
    )
    weekly = first_week.groupBy("week").agg(F.round(F.sum("projfact")).cast("long").alias("counts"))
    cum = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return weekly.withColumn("cum_counts", F.sum("counts").over(cum)).orderBy("week")
