"""Frequency distributions — capped exposure-count histograms.

Reference semantics (``metrics/lib/hh_freq.py:8-38``): per household,
count exposures (all rows, or distinct values of a dimension), cap the
count at 10, then histogram: projected households per frequency bucket
plus each bucket's share of the total.

Spark-first changes:

* the share-of-total is computed with an unpartitioned window sum
  instead of pandas division on the driver (reference ``hh_freq.py:18``);
  the histogram is ≤11 rows post-aggregation, so the single-partition
  window is trivially cheap at any scale.
* ``Proj HH`` rounding happens in-plan (reference rounded in pandas).
* the non-null ``projfact`` contract the reference relied on implicitly
  (``F.count('projfact')`` counting rows, ``hh_freq.py:27``) is made
  explicit here by counting ``F.lit(1)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FREQ_CAP = 10


def household_frequency(df: DataFrame, dim: str | None = None) -> DataFrame:
    """Exposures (or distinct-``dim``-values) per household.

    Reference ``expo_freq`` / ``get_one_freq`` (``hh_freq.py:24-38``).
    ``projfact`` is constant per household; ``max`` picks it through the
    aggregation.
    """
    if dim is not None:
        df = df.dropDuplicates(["household_id", dim])
    return df.groupBy("household_id").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.max("projfact").alias("projfact"),
    )


def frequency_histogram(df: DataFrame, dim: str | None = None, cap: int = FREQ_CAP) -> DataFrame:
    """Capped frequency histogram with projected-household shares.

    Reference ``freq_dec`` (``hh_freq.py:8-21``).  Output columns:
    ``frequency, proj_hh, pct_hh`` (aliased for oracle matching).
    """
    counts = household_frequency(df, dim)
    capped = counts.withColumn(
        "frequency",
        F.when(F.col("frequency") >= cap, F.lit(cap)).otherwise(F.col("frequency")),
    )
    hist = capped.groupBy("frequency").agg(F.sum("projfact").alias("raw_hh"))
    total = Window.partitionBy()
    return (
        hist.withColumn("pct_hh", F.col("raw_hh") / F.sum("raw_hh").over(total))
        .withColumn("proj_hh", F.round("raw_hh").cast("long"))
        .select("frequency", "proj_hh", "pct_hh")
        .orderBy("frequency")
    )
