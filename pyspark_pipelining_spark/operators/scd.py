"""Slowly-changing-dimension (type 2) history maintenance — the
warehouse-side upsert pattern (beyond-reference scope; the reference's
Luigi pipelines overwrite dimensions wholesale, losing history).

Spark without a table format has no MERGE INTO, so SCD2 is expressed as
the *rebuild* form: pour all versioned observations (current history's
version-open rows + incoming updates) into one frame and recompute the
interval columns declaratively.  The rebuild is idempotent (re-running
with the same inputs yields byte-identical history), deterministic, and
one shuffle on the business key — both window specs share the same
(partition, sort), so Catalyst plans a single exchange + sort.

At 100 TB dimension scale the rebuild is still the right default: SCD
dimensions are orders of magnitude smaller than facts, and the
alternative (point updates) needs a transactional table format (Delta/
Iceberg MERGE), which is deployment-specific — this operator is the
engine-level semantics those formats implement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_rebuild(
    versions: DataFrame, key: str, valid_from: str, attr_cols: list[str]
) -> DataFrame:
    """Rebuild SCD2 history from versioned observations.

    Input: one row per (key, valid_from) observation with the attribute
    values seen at that time (pre-aggregate duplicates per (key,
    valid_from) upstream — ties have no deterministic winner).

    Output: ``key, valid_from, valid_to, *attr_cols`` where consecutive
    observations with unchanged attributes are collapsed into the
    earlier version, and ``valid_to`` is the next version's
    ``valid_from`` (null = currently open).  Comparison is null-safe
    (a null attribute is a value, not a wildcard).
    """
    w = Window.partitionBy(key).orderBy(valid_from)
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(c).over(w)) for c in attr_cols],
    )
    first = F.lag(valid_from).over(w).isNull()
    kept = versions.withColumn("_keep", first | changed).filter("_keep").drop("_keep")
    w2 = Window.partitionBy(key).orderBy(valid_from)
    return kept.select(
        key,
        valid_from,
        F.lead(valid_from).over(w2).alias("valid_to"),
        *attr_cols,
    )
