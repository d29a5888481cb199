"""Integer-lattice k-means — deterministic Lloyd clustering over
embedding columns (beyond-reference scope: the semantic-clustering /
IVF-quantizer-training primitive of an embedding-aware corpus engine).

Determinism design (the pagerank_int playbook applied to clustering):
classic k-means is float arithmetic whose per-cell means depend on
shuffle order — not oracle-comparable and not even run-to-run stable.
Here every coordinate snaps to a ``1/grid`` integer lattice
(``round(double(x)·grid)``, exact in both engines — the float operand
is widened BEFORE the multiply), centroids are truncated
integer means (``sum div count`` — Spark ``div`` and DuckDB ``//``
both truncate toward zero, verified including negatives), and
distances are exact int64 squared-L2 (headroom: diff ≤ 2·grid,
squared ≤ 4·grid², ×64 dims = 2.6e14 at grid 1e6 — five orders below
int64).  Assignment ties break on cell id.  The whole 2-iteration run
is a pure function of the data — bit-identical in any engine, any
partitioning, any layout — so a DuckDB oracle can replay it unrolled.

Scale shape per Lloyd step: one posexplode→groupBy(cell, pos) partial
aggregation for centroids (map-side combined; k×dim result — always
tiny), centroids broadcast back, assignment is a map-side argmin over
k distance expressions.  The corpus shuffles only in the centroid
aggregation, and only (cell, pos, coord) triples move — never whole
vectors.  A fixed iteration count keeps the plan finite (the
convergence-driven variant would reuse the scalar-count pattern of
``dedup.cluster_assignments``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 1_000_000


def kmeans_int(
    emb_df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = GRID,
    keep_vec: bool = False,
) -> DataFrame:
    """Deterministic k-means assignment after ``iters`` Lloyd steps.

    Seeding: ``cell = id mod k`` (engine-portable, data-independent).
    Output: ``<id_col>, cell, d`` — final cell and exact int64 squared
    lattice distance to its centroid.  ``keep_vec=True`` also emits
    ``s``, the snapped lattice vector the assignment already carries —
    free for consumers that need the coordinates downstream
    (``dedup.semantic_dedup``'s cosine stage), where re-snapping and
    joining back on id would cost an extra scan plus a shuffle join.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1 (distance needs a centroid)")
    # snap via the proven centroid_cosines idiom: widen float->double
    # BEFORE the multiply (a float-precision product rounds differently
    # across engines), then round — portable on both engines
    snapped = emb_df.select(
        id_col,
        F.expr(
            f"transform({vec_col},"
            f" x -> CAST(round(CAST(x AS DOUBLE) * {grid}) AS BIGINT))"
        ).alias("s"),
    ).localCheckpoint(eager=True)
    assigned = snapped.select(
        id_col, "s", F.pmod(F.col(id_col), F.lit(k)).cast("long").alias("cell")
    )
    # map-side argmin: all k centroids ride in ONE broadcast row as an
    # array of (cell, centroid) structs, and the assignment is a
    # higher-order fold per vector — the corpus itself never shuffles
    # (the earlier crossJoin + groupBy(id, vec) formulation re-shuffled
    # every vector, array key included, once per Lloyd step).  array_min
    # over (d, cell) structs keeps the cell-ascending tie rule and is
    # insensitive to collect_list's nondeterministic order.
    best = F.expr(
        "array_min(transform(cents, c -> struct("
        "  aggregate(zip_with(s, c.centroid, (a, b) -> (a - b) * (a - b)),"
        "            CAST(0 AS BIGINT), (acc, x) -> acc + x) AS d,"
        "  c.cell AS cell)))"
    )
    for _ in range(iters):
        cent_row = (
            assigned.select("cell", F.posexplode("s").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.expr("sum(x) div count(*)").alias("c"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, c))), p -> p.c)"
                ).alias("centroid")
            )
            .agg(F.collect_list(F.struct("cell", "centroid")).alias("cents"))
        )
        assigned = (
            snapped.crossJoin(F.broadcast(cent_row))
            .withColumn("best", best)
            .select(
                id_col,
                "s",
                F.col("best.cell").alias("cell"),
                F.col("best.d").alias("d"),
            )
        )
    cols = [id_col, "cell", "d"] + (["s"] if keep_vec else [])
    return assigned.select(*cols)
