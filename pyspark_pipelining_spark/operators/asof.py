"""As-of (point-in-time) join — the canonical custom operator Spark's
DataFrame API lacks (beyond-reference scope; the attribution /
"state at event time" primitive of event pipelines).

Implementation is the scale-correct **union + single-window** plan, not
a range join: tag probe and reference rows, union them, and take the
last reference value over a (key, time)-ordered running window.  Both
inputs share ONE shuffle on the key; the per-key sort is the window's
own.  A range join (``l.key = r.key AND l.ts >= r.ts`` + per-row argmax)
re-shuffles both sides and explodes to O(matches) intermediate rows —
quadratic per hot key — before collapsing; the union-window form never
materializes more than the union's row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    ts: str,
    ref_cols: list[str],
    strict: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """For every probe row, attach the reference row with the greatest
    timestamp at-or-before (``strict=False``) or strictly-before
    (``strict=True``) the probe's timestamp, per key — left semantics
    (unmatched probes keep nulls).

    Output: all probe columns + ``<prefix><ts>`` and ``<prefix><c>``
    for each requested reference column.

    Tie handling is encoded in the sort, not a filter: at equal
    timestamps, probe rows sort *before* reference rows when strict
    (the running window cannot see a same-instant reference) and
    *after* them when inclusive.  Reference rows should be unique per
    (key, ts) — with duplicates, which of the tied rows wins is
    engine-dependent (true of every as-of implementation, including
    DuckDB's ASOF JOIN); pre-aggregate the reference side if ties are
    possible.
    """
    tag = F.lit(1)
    p = probe.withColumn("_is_probe", tag)
    r = reference.select(
        F.col(key),
        F.col(ts),
        *[F.col(c).alias(f"{prefix}{c}") for c in ref_cols],
    ).withColumn("_is_probe", F.lit(0))
    u = p.unionByName(r, allowMissingColumns=True)
    probe_first = F.col("_is_probe").desc() if strict else F.col("_is_probe").asc()
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), probe_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref_ts = F.last(
        F.when(F.col("_is_probe") == 0, F.col(ts)), ignorenulls=True
    ).over(w)
    matched = u.withColumn(f"{prefix}{ts}", ref_ts)
    for c in ref_cols:
        matched = matched.withColumn(
            f"{prefix}{c}",
            F.last(
                F.when(F.col("_is_probe") == 0, F.col(f"{prefix}{c}")),
                ignorenulls=True,
            ).over(w),
        )
    return matched.filter(F.col("_is_probe") == 1).drop("_is_probe")


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_us: str,
    start_us: str,
    end_us: str,
    bin_minutes: int = 60,
) -> DataFrame:
    """Point-in-interval join without a range-join explosion: intervals
    are replicated once per time bin they overlap, points map to their
    single bin, and the join is a plain hash equi-join on
    ``(key, bin)`` with the exact ``[start, end]`` containment applied
    as a post-filter.

    Inputs carry epoch-micro longs (``point_us``/``start_us``/
    ``end_us``) plus any payload columns; output is the joined rows
    (all columns of both sides) for every point inside an interval,
    bounds inclusive.  Payload column names must not collide.

    Why this shape at 100 TB: Spark compiles a raw
    ``p.key = i.key AND p.ts BETWEEN i.start AND i.end`` to a hash join
    on key alone — every point meets every interval of its key before
    the range filter, quadratic on hot keys.  Binning bounds the work:
    a point meets only the intervals overlapping its bin.  Replication
    cost is ``interval_length / bin`` rows per interval — pick
    ``bin_minutes`` near the typical interval length so replication
    stays O(1) per interval while bins stay selective.
    """
    bin_us = bin_minutes * 60 * 1_000_000
    p = points.withColumn("_bin", F.expr(f"{point_us} div {bin_us}"))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_us} div {bin_us}"), F.expr(f"{end_us} div {bin_us}")
            )
        ),
    )
    return (
        p.join(i, on=[key, "_bin"])
        .filter((F.col(point_us) >= F.col(start_us)) & (F.col(point_us) <= F.col(end_us)))
        .drop("_bin")
    )
