"""Boundary-semantics pin for filter_to_range — the reference's own six
unit tests, preserved verbatim (FIXTURES.md §A; reference
``metrics/tests/test_hhmetrics.py:44-105``).  Each row exercises one
window edge; presence/absence is asserted via the sentinel volume_tgt."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_pipelining_spark.operators.before_after import filter_to_range, tag_before_after

SCHEMA = T.StructType(
    [
        T.StructField("household_id", T.LongType()),
        T.StructField("volume_tgt", T.DoubleType()),
        T.StructField("volume_cat", T.DoubleType()),
        T.StructField("max_dt", T.DateType()),
        T.StructField("date", T.DateType()),
        T.StructField("pdate", T.DateType()),
    ]
)

D = dt.date


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows = [
        # (sentinel volume_tgt, expectation) — see FIXTURES.md §A
        (1, 0.1, 2.0, D(2017, 1, 28), D(2017, 1, 14), D(2017, 1, 28)),  # after window → out
        (1, 0.5, 2.0, D(2017, 1, 28), D(2017, 1, 14), D(2016, 12, 31)),  # before window → out
        (1, 0.2, 2.0, D(2017, 1, 28), D(2017, 1, 14), D(2017, 1, 1)),  # within, before → kept
        (1, 0.3, 2.0, D(2017, 1, 28), D(2017, 1, 14), D(2017, 1, 27)),  # within, after → kept
        (2, 0.4, 2.0, D(2017, 1, 28), D(2017, 1, 23), D(2017, 1, 27)),  # < min_wks post → out
        (3, 0.6, 2.0, D(2017, 1, 28), D(2017, 1, 22), D(2017, 1, 27)),  # exactly min_wks → kept
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def kept(fixture_df):
    out = filter_to_range(fixture_df, min_wks=1, max_wks=2)
    return {r["volume_tgt"] for r in out.collect()}


def test_purchase_after_window_dropped(kept):
    assert 0.1 not in kept


def test_purchase_before_window_dropped(kept):
    assert 0.5 not in kept


def test_within_window_before_kept(kept):
    assert 0.2 in kept


def test_within_window_after_kept(kept):
    assert 0.3 in kept


def test_below_min_weeks_dropped(kept):
    assert 0.4 not in kept


def test_exactly_min_weeks_kept(kept):
    assert 0.6 in kept


def test_weight_is_post_period_days(fixture_df):
    out = filter_to_range(fixture_df, min_wks=1, max_wks=2)
    wgts = {r["volume_tgt"]: r["wgt"] for r in out.collect()}
    # household 1: post window capped by date+13 (2017-01-27) < max_dt → 14 days
    assert wgts[0.2] == 14 and wgts[0.3] == 14
    # household 3: capped by max_dt (2017-01-28) → 7 days, exactly min_wks
    assert wgts[0.6] == 7


def test_before_after_tagging(fixture_df):
    out = tag_before_after(filter_to_range(fixture_df, 1, 2))
    tags = {r["volume_tgt"]: r["bef_aft"] for r in out.collect()}
    assert tags[0.2] == "before" and tags[0.3] == "after" and tags[0.6] == "after"
