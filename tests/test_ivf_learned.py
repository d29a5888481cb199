"""Learned-centroid IVF ANN (``operators/similarity.
ivf_topk_learned_q``; queued query ``sim_ivf_learned_topk`` — r14
verdict stretch item 7): search against the committed integer-lattice
coarse quantizer ``fixtures/ann/centroids.parquet``.

Layers: DuckDB oracle compare + dtype parity at both gate scales, the
probe-all ≡ brute-force recall ceiling (nprobe = cells makes IVF
exactly exhaustive — the property that pinned the float trainer, now
holding for the committed quantized table), a pure-Python assignment
model over the fixture, fixture/constant consistency with the
generator, and the plan invariants (broadcast probe join; the only
crossJoins are the 1-row centroid-array stitches)."""

from __future__ import annotations

from collections import Counter

from pyspark_pipelining_spark.operators.similarity import (
    cosine_topk,
    ivf_topk_learned_q,
)
from pyspark_pipelining_spark.queries_staged import (
    CENT_GRID,
    SQL_SIM_IVF_LEARNED_TOPK,
    _centroid_fixture_path,
    q_sim_ivf_learned_topk,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_grid_matches_generator():
    """The query-side lattice grid must equal the grid the committed
    fixture was quantized at — a drift here silently breaks the
    exactness argument, not any oracle row (both engines would agree
    on the wrong distances)."""
    import importlib.util
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_ann_fixtures", os.path.join(here, "tools", "gen_ann_fixtures.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.CENT_GRID == CENT_GRID
    # and the committed fixture actually fits the int64 headroom bound
    import duckdb

    lo, hi, cells = duckdb.sql(
        f"SELECT min(list_min(centroid_q)), max(list_max(centroid_q)), "
        f"count(*) FROM '{_centroid_fixture_path()}'"
    ).fetchall()[0]
    assert cells == mod.CELLS
    assert -CENT_GRID <= lo and hi <= CENT_GRID, (lo, hi)


def test_oracle_compare_and_dtypes(spark):
    from tests.oracle_utils import compare, duck_connection

    compare(spark, SF_SMOKE, q_sim_ivf_learned_topk, SQL_SIM_IVF_LEARNED_TOPK)
    compare(spark, SF_ORACLE, q_sim_ivf_learned_topk, SQL_SIM_IVF_LEARNED_TOPK)
    sdf = q_sim_ivf_learned_topk(spark, SF_SMOKE)
    dt = dict(sdf.dtypes)
    assert dt["query_id"] == "bigint" and dt["vec_id"] == "bigint", dt
    assert dt["rank"] == "int", dt
    con = duck_connection(SF_SMOKE)
    pdf = con.execute(SQL_SIM_IVF_LEARNED_TOPK).df()
    assert str(pdf.dtypes["rank"]) == "int32", pdf.dtypes


def test_assignment_matches_python_model(spark):
    """Per-vector cell assignment equals a pure-Python argmin over the
    committed quantized centroids (first-minimum tie rule), for every
    sf0.001 vector."""
    import duckdb

    from pyspark_pipelining_spark.sources.registry import load_table

    cents = {
        c: list(q)
        for c, q in duckdb.sql(
            f"SELECT cell, centroid_q FROM '{_centroid_fixture_path()}' ORDER BY cell"
        ).fetchall()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings")
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }

    def quant(v):
        import decimal

        out = []
        for x in v:
            d = decimal.Decimal(float(x) * CENT_GRID).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
            out.append(int(d))
        return out

    def assign(v):
        xq = quant(v)
        best = None
        for c in sorted(cents):
            d = sum((a - b) * (a - b) for a, b in zip(xq, cents[c]))
            if best is None or d < best[0]:
                best = (d, c)
        return best[1]

    want = {i: assign(v) for i, v in vecs.items()}
    # the operator's corpus side: expose cells by probing ALL cells for
    # one query and reading the candidate cell distribution is
    # indirect — instead replay the same argmin in DuckDB (the oracle's
    # corpus CTE) and compare to the python model
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_SMOKE}/embeddings.parquet'"
    )
    got_sql = dict(
        con.execute(
            f"""
WITH cents AS (SELECT cell, centroid_q FROM '{_centroid_fixture_path()}'),
embq AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {CENT_GRID}) AS BIGINT)) AS xq
    FROM embeddings
),
d AS (
    SELECT e.vec_id, c.cell,
           list_sum(list_transform(range(1, 65),
               i -> (xq[CAST(i AS INT)] - c.centroid_q[CAST(i AS INT)])
                  * (xq[CAST(i AS INT)] - c.centroid_q[CAST(i AS INT)]))) AS d
    FROM embq e CROSS JOIN cents c
)
SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn FROM d
) WHERE rn = 1
"""
        ).fetchall()
    )
    assert got_sql == want


def test_probe_all_equals_bruteforce(spark):
    """nprobe = cells ⇒ every cell probed ⇒ the IVF result IS the
    exact brute-force top-k (same ids, same cosines, same ranks) — the
    recall ceiling the float-trainer property pinned, now holding for
    the committed quantized table."""
    from pyspark_pipelining_spark.queries_llm import TOPK, _query_vecs
    from pyspark_pipelining_spark.sources.registry import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = spark.read.parquet(_centroid_fixture_path())
    n_cells = cents.count()
    ivf = ivf_topk_learned_q(
        emb, _query_vecs(spark, SF_SMOKE), cents, grid=CENT_GRID,
        k=TOPK, nprobe=n_cells,
    ).collect()
    brute = cosine_topk(emb, _query_vecs(spark, SF_SMOKE), k=TOPK).collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
    assert sorted(map(key, ivf)) == sorted(map(key, brute))


def test_pruning_actually_prunes(spark):
    """At the default nprobe the candidate set is a strict subset of
    the corpus: at least one query's IVF list differs from probing all
    cells OR every cell distribution is non-degenerate — pinned via
    the cell histogram (no single cell may hold everything, else the
    'index' is a rename of brute force)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_SMOKE}/embeddings.parquet'"
    )
    hist = con.execute(
        f"""
WITH cents AS (SELECT cell, centroid_q FROM '{_centroid_fixture_path()}'),
embq AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {CENT_GRID}) AS BIGINT)) AS xq
    FROM embeddings
),
d AS (
    SELECT e.vec_id, c.cell,
           list_sum(list_transform(range(1, 65),
               i -> (xq[CAST(i AS INT)] - c.centroid_q[CAST(i AS INT)])
                  * (xq[CAST(i AS INT)] - c.centroid_q[CAST(i AS INT)]))) AS d
    FROM embq e CROSS JOIN cents c
),
a AS (
    SELECT vec_id, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM d
    ) WHERE rn = 1
)
SELECT cell, count(*) FROM a GROUP BY cell
"""
    ).fetchall()
    counts = Counter(dict(hist))
    total = sum(counts.values())
    assert len(counts) >= 2, counts
    assert max(counts.values()) < total, counts


def test_plan_invariants(spark):
    """Broadcast probe join; no row-UDFs; the only cartesian products
    are the 1-row centroid-array stitches (repo scalar convention,
    exempted by the global plan gate the same way project_univ is)."""
    plan = (
        q_sim_ivf_learned_topk(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
