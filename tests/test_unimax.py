"""UniMax budget allocation (``operators/corpus.unimax_allocation``;
queued query ``unimax_allocation`` — Chung et al. 2023, the published
uniform-with-epoch-cap sampling policy).

Layers: DuckDB oracle compare + dtype parity at both gate scales, a
pure-Python waterfill model under hypothesis, and the allocation LAWS
(budget exactness, cap respect, uniformity of the uncapped level,
capped-below-level ordering)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_pipelining_spark.operators.corpus import unimax_allocation
from pyspark_pipelining_spark.queries_corpus import (
    SQL_UNIMAX_ALLOCATION,
    q_unimax_allocation,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def model(counts: dict[str, int], epochs: int, budget: int) -> dict[str, tuple]:
    """Quadratic mirror: source -> (cap, alloc, is_capped)."""
    rows = sorted(((n * epochs, s, n) for s, n in counts.items()))
    m = len(rows)
    out = {}
    pfx = 0
    k = None
    for i, (cap, s, n) in enumerate(rows, start=1):
        if cap * (m - i + 1) >= budget - pfx:
            k = i
            break
        pfx += cap
    if k is None:  # budget exceeds every cap
        return {s: (cap, cap, 1) for cap, s, n in rows}
    base, r = divmod(budget - pfx, m - k + 1)
    for i, (cap, s, n) in enumerate(rows, start=1):
        if i < k:
            out[s] = (cap, cap, 1)
        else:
            out[s] = (cap, base + (1 if i - k < r else 0), 0)
    return out


def _run(spark, counts: dict[str, int], epochs: int, budget: int):
    df = spark.createDataFrame(
        [(s, n) for s, n in counts.items()], "source string, n_chars long"
    )
    return {
        r["source"]: (r["cap"], r["alloc"], r["is_capped"])
        for r in unimax_allocation(df, max_epochs=epochs, budget=budget).collect()
    }


@given(
    ns=st.lists(st.integers(0, 200), min_size=1, max_size=8),
    epochs=st.integers(1, 3),
    budget=st.integers(0, 1200),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_matches_python_model(spark, ns, epochs, budget):
    """Engine equals the quadratic waterfill on arbitrary count/budget
    mixes — zero-size sources, over-budget (everything capped),
    zero budget, remainder distribution, duplicate counts (name
    tiebreak)."""
    counts = {f"s{i:02d}": n for i, n in enumerate(ns)}
    got = _run(spark, counts, epochs, budget)
    want = model(counts, epochs, budget)
    assert got == want
    # the laws, asserted on the engine output directly
    total_cap = sum(c for c, _, _ in got.values())
    assert sum(a for _, a, _ in got.values()) == min(budget, total_cap)
    assert all(a <= c for c, a, _ in got.values())
    uncapped = sorted(a for _, a, f in got.values() if f == 0)
    if uncapped:
        assert uncapped[-1] - uncapped[0] <= 1  # uniform level ±1
        # every capped source sits at or below the level (why it capped)
        assert all(
            c <= uncapped[-1] for c, _, f in got.values() if f == 1
        ), got


def test_validation_errors(spark):
    df = spark.createDataFrame([("a", 10)], "source string, n_chars long")
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_allocation(df, max_epochs=0, budget=5)
    with pytest.raises(ValueError, match="exactly one"):
        unimax_allocation(df)
    with pytest.raises(ValueError, match="exactly one"):
        unimax_allocation(df, budget=5, budget_frac=(1, 2))
    with pytest.raises(ValueError, match="budget"):
        unimax_allocation(df, budget=-1)


def test_oracle_compare_and_dtypes(spark):
    from pyspark.sql import functions as F

    from tests.oracle_utils import compare, duck_connection

    compare(spark, SF_SMOKE, q_unimax_allocation, SQL_UNIMAX_ALLOCATION)
    compare(spark, SF_ORACLE, q_unimax_allocation, SQL_UNIMAX_ALLOCATION)
    sdf = q_unimax_allocation(spark, SF_SMOKE)
    dt = dict(sdf.dtypes)
    for c in ("n_avail", "cap", "alloc", "is_capped"):
        assert dt[c] == "bigint", (c, dt)
    con = duck_connection(SF_SMOKE)
    pdf = con.execute(SQL_UNIMAX_ALLOCATION).df()
    for c in ("n_avail", "cap", "alloc", "is_capped"):
        assert str(pdf.dtypes[c]) == "int64", (c, pdf.dtypes)
    # non-degeneracy: both branches populated at the committed fraction
    rows = sdf.collect()
    capped = sum(r["is_capped"] for r in rows)
    assert 0 < capped < len(rows), capped
    # budget exactness on the real table
    total = sum(r["n_avail"] for r in rows)
    assert sum(r["alloc"] for r in rows) == total * 19 // 20
