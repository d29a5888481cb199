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
finite.  The (src, dst, deg) edge table is materialized ONCE up front
(``localCheckpoint``): the iterative plan references it every round,
and without truncation Spark re-executes the whole upstream edge
pipeline (an LSH candidate join here) per reference — measured 18–28 s
→ ~2 s at sf0.1.  The node count becomes a driver scalar (the same
pattern as cluster_assignments' convergence check) so per-round work
is exactly one join + one aggregation; a symmetrized graph needs no
per-round re-join to the node set (every node has in-edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 10**12


def symmetrize(
    pairs: DataFrame,
    a: str = "doc_1",
    b: str = "doc_2",
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """Both directions of an undirected pair list via ONE map-side
    explode (r17, guide §2.4 / r16 verdict item 8): the former
    ``select ∪ select-swapped`` referenced the pair frame from two
    branches, so when the pair frame is an unpersisted expensive
    pipeline (the LSH candidate join everywhere in this module),
    Catalyst clones that whole subtree into both union branches and an
    eager edge checkpoint executes it twice (ReuseExchange dedupes the
    final dedup exchange when shapes align, but the post-exchange
    aggregate and projections still run per branch).  One explode =
    one reference = the upstream pipeline appears exactly once in the
    materialization job.  Row multiset is identical to the union."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a).alias(src), F.col(b).alias(dst)),
                F.struct(F.col(b).alias(src), F.col(a).alias(dst)),
            )
        ).alias("_e")
    ).select(f"_e.{src}", f"_e.{dst}")


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
    ed = edges.select(F.col(src).alias("id"), F.col(dst).alias("to"))
    deg = ed.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    # one materialized (src, dst, deg) edge table feeds every round.
    # LAZY checkpoint: the node-count action right below materializes
    # it in the same job (distinct() sits above the opaque RDD scan, so
    # nothing is pruned), saving a full materialization pass per call.
    ed2 = ed.join(deg, on="id").localCheckpoint(eager=False)
    # n as a driver scalar (the cluster_assignments convergence-check
    # pattern): it parameterizes integer constants the oracle mirrors
    n = ed2.select("id").distinct().count()
    r0 = scale // n
    base_c = (scale * (damp_den - damp_num) // damp_den) // n
    # symmetrized input ⇒ every node has in-edges ⇒ the (dst) aggregation
    # already covers the full node set — no per-round re-join to nodes
    step = f"{base_c} + (({damp_num} * s) div {damp_den})"
    sums = (
        ed2.select("to", F.expr(f"CAST({r0} AS BIGINT) div deg").alias("c"))
        .groupBy("to")
        .agg(F.sum("c").alias("s"))
    )
    r = sums.select(F.col("to").alias("id"), F.expr(step).alias("r"))
    for _ in range(iters - 1):
        contrib = ed2.join(r, on="id").select(
            "to", F.expr("r div deg").alias("c")
        )
        sums = contrib.groupBy("to").agg(F.sum("c").alias("s"))
        r = sums.select(F.col("to").alias("id"), F.expr(step).alias("r"))
    return r


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected graph given as a
    symmetrized edge list (both directions present, no self-loops) —
    the local-clustering signal corpus curation uses to separate dense
    near-duplicate cliques from chance LSH collisions.

    Scale shape — degree-ordered orientation: each undirected edge is
    directed from its lower ``(deg, id)`` endpoint to the higher one,
    so every triangle is found exactly once, from its lowest-degree
    corner.  Wedge fan-out per node is then bounded by O(sqrt(m)) on
    any graph (the classic O(m^1.5) triangle-enumeration bound), which
    is what keeps a power-law similarity graph tractable: the id-only
    a<b<c orientation lets one celebrity node with 10^6 neighbors
    enumerate 10^12 wedges; degree ordering caps it.  Three shuffles
    (degree agg, wedge self-join on the pivot, closing-edge join), all
    on node ids, payload is ids only.

    Output: ``id, triangles`` for every node in ≥ 1 triangle.

    The edge list is materialized once (``localCheckpoint``) before the
    three self-references — same reasoning as :func:`pagerank_int`:
    without truncation Spark re-executes the upstream edge pipeline
    (an LSH candidate join here) once per reference, measured 26 s →
    ~3 s at sf0.1.
    """
    ed = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    deg = ed.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # orient each undirected edge lower-(deg,id) -> higher-(deg,id);
    # keep the head's degree so wedges can canonically order (b, c)
    both = (
        ed.join(deg, on="a")
        .withColumnRenamed("deg", "da")
        .join(deg.select(F.col("a").alias("b"), F.col("deg").alias("db")), on="b")
    )
    oriented = both.filter(
        (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ).select("a", "b", "db")
    # wedges from the pivot a: unordered pair {b, c} counted once via
    # the same (deg, id) order — the closing edge is then oriented b->c
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(e2, on="a").filter(
        (F.col("e1.db") < F.col("e2.db"))
        | ((F.col("e1.db") == F.col("e2.db")) & (F.col("e1.b") < F.col("e2.b")))
    ).select(F.col("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c"))
    closing = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tris = wedges.join(closing, on=["b", "c"])
    # one explode instead of a 3-way union of tris projections: the
    # union referenced the wedge⋈closing join from three branches, so
    # the join (and everything the ReusedExchange rule does not dedupe)
    # executed once per corner; the explode emits all three corners
    # map-side from a single join execution (guide §2.4).
    corners = tris.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("id")
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))


def node_jaccard(pairs: DataFrame) -> DataFrame:
    """Neighbor-set Jaccard similarity for each candidate pair in an
    undirected graph given as (doc_1, doc_2) edges with doc_1 < doc_2
    — structural similarity (do these two documents sit in the same
    near-dup neighborhood?), the link-prediction baseline.

    Scale shape: the edge list symmetrizes once; degrees are ONE
    node-keyed count; common neighbors come from the standard
    wedge-join (edges ⋈ edges on the shared endpoint) RESTRICTED to
    the candidate pairs first, so the join is |pairs|-bounded, not
    |wedges|-bounded.  Pairs with no common neighbor survive via the
    left join with ``common = 0``.

    Output: ``doc_1, doc_2, deg_1, deg_2, common, jaccard`` (6dp;
    neighbor sets include the partner node itself, so
    ``union = deg_1 + deg_2 - common`` is never zero for an edge).
    """
    # The candidate-pair input is typically an expensive LSH pipeline;
    # this plan references it from five branches (edge union ×2, the
    # pair spine, both wedge sides).  Truncating lineage once up front
    # guarantees a single execution regardless of whether AQE's
    # ReusedExchange can dedupe the branches (it usually can here —
    # measured ~11% at sf0.1 — but reuse is plan-shape-fragile and the
    # wedge join dominates anyway).
    p = pairs.select("doc_1", "doc_2").localCheckpoint(eager=True)
    edges = symmetrize(p, "doc_1", "doc_2", "doc_1", "doc_2")
    deg = edges.groupBy("doc_1").agg(F.count(F.lit(1)).alias("deg"))
    ea = edges.select(F.col("doc_1").alias("a"), F.col("doc_2").alias("na"))
    eb = edges.select(F.col("doc_1").alias("b"), F.col("doc_2").alias("nb"))
    common = (
        p.join(ea, p["doc_1"] == ea["a"])
        .join(eb, (p["doc_2"] == eb["b"]) & (ea["na"] == eb["nb"]))
        .groupBy("doc_1", "doc_2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        p.join(common, ["doc_1", "doc_2"], "left")
        .join(deg.select(F.col("doc_1"), F.col("deg").alias("deg_1")), "doc_1")
        .join(
            deg.select(F.col("doc_1").alias("doc_2"), F.col("deg").alias("deg_2")),
            "doc_2",
        )
        .select(
            "doc_1",
            "doc_2",
            "deg_1",
            "deg_2",
            F.coalesce("common", F.lit(0)).alias("common"),
            F.round(
                F.coalesce("common", F.lit(0))
                / (F.col("deg_1") + F.col("deg_2") - F.coalesce("common", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
        .orderBy("doc_1", "doc_2")
    )


def kcore_peel(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 3,
    a: str = "doc_1",
    b: str = "doc_2",
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` synchronous rounds of
    removing nodes whose current degree is below ``k`` (and their
    edges).  A fixed round count keeps the plan finite and the oracle
    expressible (the SQL unrolls the same rounds); full-fixpoint coreness
    would iterate to convergence with the same per-round shape.

    Scale shape per round: one node-keyed degree aggregation and one
    semi-join of edges against surviving nodes — both shuffles keyed on
    node id.  The edge table is ``localCheckpoint``-ed up front so the
    iterative plan never re-executes the upstream candidate-pair
    pipeline (same pattern as pagerank_int).

    Output: ``node, degree`` for nodes surviving all rounds, with their
    post-peel degree.
    """
    edges = symmetrize(pairs, a, b).localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("s")
        edges = (
            edges.join(keep, "s", "leftsemi")
            .join(keep.select(F.col("s").alias("d")), "d", "leftsemi")
            .localCheckpoint(eager=True)
        )
    return (
        edges.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("node")
    )


def kcore_fixpoint(
    pairs: DataFrame,
    k: int = 2,
    max_rounds: int = 50,
    a: str = "doc_1",
    b: str = "doc_2",
) -> DataFrame:
    """k-core to FIXPOINT: peel until no directed edge is removed
    (every surviving node has degree ≥ k — the true k-core), with
    ``max_rounds`` as a safety bound only.

    Convergence is detected with one driver-side ``count()`` per round
    over the checkpointed (already materialized) edge set — a scalar
    loop-control action, not data movement; the per-round dataflow is
    identical to :func:`kcore_peel` (degree agg + two semi-joins,
    shuffles keyed on node id, ``localCheckpoint`` truncating lineage
    each round).  Peeling is monotone so "edge count unchanged" is
    exactly "no node fell below k" — the fixpoint.
    """
    edges = symmetrize(pairs, a, b).localCheckpoint(eager=True)
    n_edges = edges.count()
    for _ in range(max_rounds):
        deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("s")
        edges = (
            edges.join(keep, "s", "leftsemi")
            .join(keep.select(F.col("s").alias("d")), "d", "leftsemi")
            .localCheckpoint(eager=True)
        )
        remaining = edges.count()
        if remaining == n_edges:
            break
        n_edges = remaining
    return (
        edges.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("node")
    )


def lpa_communities(
    pairs: DataFrame,
    rounds: int = 2,
    a: str = "doc_1",
    b: str = "doc_2",
) -> DataFrame:
    """Synchronous label propagation communities over a candidate-pair
    graph, made DETERMINISTIC: each round every node adopts the most
    frequent label among its neighbors, ties broken by smallest label
    (classic LPA is order-dependent; the (count desc, label asc)
    argmax makes any engine and any layout agree, and a bounded round
    count keeps the oracle expressible — the same bounded-unroll
    contract as :func:`kcore_peel`).

    Scale shape per round: one edge ⋈ labels shuffle keyed on node id,
    one (node, label) count with map-side partials, one per-node
    argmax window — all keyed on node.  Rounds run in BLOCKS OF TWO
    per ``localCheckpoint`` (the cluster_assignments block discipline):
    each label frame is referenced exactly once by the next round, so
    fusing two rounds into one job executes the same shuffles while
    skipping a materialization pass — measured 2.60 s → 2.23 s median
    at sf0.1 for rounds=2 — and the checkpoint every second round
    still truncates lineage before Catalyst plans grow.  The final
    round never checkpoints (the caller's action materializes it).

    Output: ``node, community`` (community = converged-or-bounded
    label), one row per node appearing in ``pairs``.
    """
    edges = symmetrize(pairs, a, b).localCheckpoint(eager=True)
    labels = edges.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("lbl"))
    for i in range(rounds):
        nbr = edges.join(
            labels.select(F.col("node").alias("d"), "lbl"), "d"
        ).select(F.col("s").alias("node"), "lbl")
        counts = nbr.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "lbl")
        )
        if (i + 1) % 2 == 0 and i + 1 < rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("lbl").alias("community")).orderBy("node")
