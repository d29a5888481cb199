"""Blocked fuzzy record linkage — approximate-string matching the
reference's exact equi-joins cannot express (beyond-reference scope;
the entity-resolution / near-duplicate-entity step of a warehouse
cleanup or a training-data metadata dedup).

Design: the classic blocking strategy.  An all-pairs edit-distance
comparison is O(n²) and dead at any scale; instead rows are compared
only within a cheap deterministic *blocking key* (here a categorical
column the caller picks), and within a block a zero-cost length-band
prefilter (|len(a) − len(b)| ≤ max_dist is a lower bound on
Levenshtein) discards most candidates before the DP distance runs.

Scale shape: one shuffle on the blocking key; the quadratic term is
confined to single blocks, so the knob that matters at 100 TB is block
size, not corpus size.  With a skewed block (one giant brand) the
block itself explodes — production linkage re-blocks with a compound
key (brand × name-prefix) or sorted-neighborhood windows; the compound
variant is ``block_cols`` here, and AQE skew-join splitting handles
residual imbalance.  ``F.levenshtein`` is JVM codegen — no Python
workers anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    block_cols: list[str] | str,
    max_dist: int = 2,
) -> DataFrame:
    """All within-block row pairs whose ``text_col`` values are within
    ``max_dist`` Levenshtein edits, each unordered pair once
    (``key_1 < key_2``).

    Output: ``*block_cols, key_1, key_2, name_1, name_2, dist``.
    """
    if isinstance(block_cols, str):
        block_cols = [block_cols]
    left = df.select(
        *block_cols,
        F.col(key_col).alias("key_1"),
        F.col(text_col).alias("name_1"),
    )
    right = df.select(
        *block_cols,
        F.col(key_col).alias("key_2"),
        F.col(text_col).alias("name_2"),
    )
    return (
        left.join(right, on=block_cols)
        .filter(F.col("key_1") < F.col("key_2"))
        # length band: a Levenshtein lower bound, evaluated before the
        # O(len²) DP so most candidates never reach it
        .filter(
            F.abs(F.length("name_1") - F.length("name_2")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("name_1", "name_2").cast("long"))
        .filter(F.col("dist") <= max_dist)
    )
