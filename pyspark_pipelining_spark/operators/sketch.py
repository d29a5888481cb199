"""KMV (k-minimum-values) distinct-count sketch — the "novel sketch"
custom-operator category (beyond-reference scope): a mergeable
cardinality estimator whose answer is a deterministic function of the
input SET, so unlike HyperLogLog it has a bit-exact cross-engine oracle.

Estimator: hash every value to a uniform 60-bit integer; keep the k
smallest distinct hashes per group.  If fewer than k distinct hashes
exist the count is exact (nothing was ever discarded); otherwise the
k-th smallest hash h_(k) estimates density and
``(k-1) · 2^60 / h_(k)`` estimates the distinct count.

Scale shape — the part a naive implementation gets wrong:

* phase 1 is a ``mapInPandas`` **partial combine**: each task streams
  its Arrow batches through an O(groups × k) accumulator and emits at
  most k candidate hashes per (group, task).  This is the bounded-state
  mergeable-sketch pattern; memory never depends on group cardinality.
  (A ``collect_set``-then-sort over raw values would buffer whole
  groups — the exact thing a sketch exists to avoid.)
* phase 2 merges candidates with one ordinary groupBy: ≤ k × tasks
  rows per group, dimension-sized by construction.
* correctness of the merge: every one of the global k smallest distinct
  hashes is among the k smallest of whichever task saw it, so it
  survives phase 1 — the final k-min set is layout-independent
  (property-tested under repartitioning).

Hashes are md5-derived (``conv(substring(md5(v),1,15),16,10)`` — the
same portable trick as operators/dedup.portable_hash_id), so the DuckDB
oracle reproduces the estimate bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TWO_60 = 1 << 60


def _kmv_partials(
    hashed: DataFrame, group_col: str, k: int
) -> DataFrame:
    """Per-task k-min-distinct candidates: (group, h) → ≤ k rows per
    group per task, streamed over Arrow batches with bounded state."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[object, np.ndarray] = {}
        for pdf in batches:
            for g, sub in pdf.groupby(group_col, sort=False):
                vals = sub["h"].to_numpy(dtype=np.int64)
                cur = best.get(g)
                pool = vals if cur is None else np.concatenate([cur, vals])
                uniq = np.unique(pool)  # sorted ascending
                best[g] = uniq[:k]
        rows = [(g, int(h)) for g, arr in best.items() for h in arr]
        yield pd.DataFrame(rows, columns=[group_col, "h"])

    return hashed.mapInPandas(partial, schema=f"{group_col} string, h long")


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 16
) -> DataFrame:
    """Estimated distinct ``value_col`` per ``group_col`` via a KMV
    sketch.  Output: <group_col>, est_distinct (double, 6dp; exact when
    the group has fewer than k distinct values)."""
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 15), 16, 10).cast("long")
    hashed = df.select(F.col(group_col), h.alias("h"))
    cand = _kmv_partials(hashed, group_col, k)
    merged = cand.groupBy(group_col).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("mins")
    )
    n = F.size("mins")
    kth = F.element_at("mins", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float((k - 1) * TWO_60)) / kth.cast("double")
    )
    return merged.select(group_col, F.round(est, 6).alias("est_distinct"))
