"""Integer-arithmetic PageRank — graph-based document quality prior
(beyond-reference scope; the web-graph centrality signal corpus
curation pipelines use alongside text-quality scores).

Determinism design: classic PageRank is float arithmetic whose sums are
shuffle-order-dependent — not oracle-comparable.  Here rank mass is an
int64 in units of ``1/scale`` and every step is integer: per-edge
contribution ``r div deg`` (floor), damping ``(num · s) div den``.
Integer sums are commutative/associative, so the result is a pure
function of the graph — bit-identical in any engine, any layout.  The
floor divisions leak ≤ deg ulps of mass per node per round (documented,
deliberate): determinism is worth more than the 1e-12-scale mass drift,
and ranking order is unaffected at any realistic scale.

Scale shape per round: one join of edges to the rank vector on src
(shuffle on src — at warehouse scale pre-partition both by src so
rounds reuse the exchange), one (dst) aggregation with map-side
combine, one left join back to the node set.  A fixed iteration count
(the common production choice for a quality prior) keeps the plan
finite; for convergence-driven loops reuse the localCheckpoint cadence
of ``operators/dedup.cluster_assignments``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list
    (symmetrize upstream for an undirected similarity graph — then
    every node has out-degree ≥ 1 and no dangling-mass handling is
    needed).

    Output: ``id, r`` — rank in integer ``1/scale`` units.
    """
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    deg = edges.groupBy(F.col(src).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "id", F.expr(f"CAST({scale} AS BIGINT) div n").alias("r")
    )
    base = f"(CAST({scale} AS BIGINT) * {damp_den - damp_num} div {damp_den}) div n"
    for _ in range(iters):
        contrib = (
            edges.select(F.col(src).alias("id"), F.col(dst).alias("to"))
            .join(r.select("id", "r"), on="id")
            .join(deg, on="id")
            .select(F.col("to").alias("id"), F.expr("r div deg").alias("c"))
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(sums, on="id", how="left")
            .select(
                "id",
                F.expr(f"{base} + (({damp_num} * coalesce(s, 0)) div {damp_den})").alias("r"),
            )
        )
    return r
