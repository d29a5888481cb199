"""Physical-plan shape tests: the scale properties SURVEY §4 commits to
(pushdown, pruning, broadcast strategy, map-side partial aggregation)
must be visible in `.explain` output — a correct-but-degraded plan is a
regression even when results still match the oracle."""

from __future__ import annotations

import pytest

from pyspark_pipelining_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pricing_summary_pushes_date_filter_and_prunes_columns(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # projection pruning: the 11-column lineitem scan must read only what
    # the query needs (no l_orderkey / l_partkey / l_suppkey)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert col not in read
    # map-side partial agg: two HashAggregates around the key exchange
    assert plan.count("HashAggregate") >= 2


def test_revenue_by_region_broadcasts_all_dims(spark):
    plan = plan_of(spark, "revenue_by_region")
    # customer/nation/region are dimension-scale: every join must be a
    # broadcast hash join, never a sort-merge shuffle join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_reach_by_etype_broadcasts_projection_dim(spark):
    plan = plan_of(spark, "reach_by_etype")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sim_bruteforce_broadcasts_query_side(spark):
    plan = plan_of(spark, "sim_bruteforce_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_dedup_minhash_joins_only_on_band_buckets(spark):
    plan = plan_of(spark, "dedup_minhash")
    # the LSH self-join must be keyed (hash-partitioned equi-join on the
    # band/bsig bucket), never a cartesian/nested-loop candidate blowup
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["qa_trailing_window", "qa_hourshift"])
def test_qa_scans_prune_to_needed_columns(spark, name):
    plan = plan_of(spark, name)
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert reads, "expected a parquet scan"
    for line in reads:
        assert "props" not in line  # the wide JSON column must be pruned
