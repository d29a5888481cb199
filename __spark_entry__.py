"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reach query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (see
``pyspark_pipelining_spark/queries.py`` for the registry itself).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark_pipelining_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: projected household reach by media type
    (reference ``hh_reach.reach_count`` — SURVEY §7.2 step 2)."""
    return QUERIES["reach_by_etype"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
