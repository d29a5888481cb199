"""Declared-schema registry + parquet sources with fail-fast validation.

The reference had *implicit* schemas (Hive metastore at read time) and
validated column presence ad hoc at runtime — raising ``ValueError`` when
a requested dimension was missing (reference ``metrics/helpers/
make_media.py:32-34``) and a custom ``DataException`` for missing
``date``/``timestamp``/``impressions`` columns (reference
``dataQA/dailyQA.py:131-147``).  The rebuild makes the schema a declared,
first-class ``StructType`` per table and keeps the same fail-fast
semantics through :func:`require_columns` / :class:`SchemaError`.

Scale note: all loads are plain ``spark.read.parquet`` — the vectorized
parquet reader + Catalyst column pruning / predicate pushdown apply
untouched.  At 100 TB the same call reads a date-partitioned directory
tree and partition pruning is automatic for ``date``-filtered queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaError(ValueError):
    """Raised when an input table is missing required columns.

    Mirrors the reference's fail-fast guards (``DataException`` in
    ``dataQA/dataExceptions.py:4-14``; ``ValueError`` in
    ``metrics/helpers/make_media.py:32-34``).
    """


#: Every driver testdata table, declared (SURVEY.md §1.2: the rebuild
#: replaces metastore-implicit schemas with a declared registry).
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.LongType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.LongType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.LongType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES: tuple[str, ...] = tuple(SCHEMAS)


def require_columns(df: DataFrame, cols: list[str], table: str = "<df>") -> DataFrame:
    """Fail fast if ``cols`` are not all present (reference semantics:
    ``make_media.py:32-34``, ``dailyQA.py:131-147``)."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise SchemaError(f"table {table!r} is missing required columns {missing}; has {df.columns}")
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, validating declared columns are present.

    We deliberately do NOT force the declared schema onto the reader —
    parquet already carries types, and a forced schema would silence
    drift.  Instead we verify the declared columns all exist (fail-fast)
    and let any extra columns pass through.

    Nanosecond-precision parquet timestamps (which Spark's vectorized
    reader rejects) are read as long via the legacy conf and converted to
    microsecond timestamps here, so every consumer sees the declared
    ``TimestampType``.
    """
    if name not in SCHEMAS:
        raise SchemaError(f"unknown table {name!r}; registry has {sorted(SCHEMAS)}")
    try:  # runtime-settable; makes TIMESTAMP(NANOS) readable as long
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df = require_columns(df, [f.name for f in SCHEMAS[name].fields], name)
    for field in SCHEMAS[name].fields:
        actual = df.schema[field.name].dataType
        if isinstance(field.dataType, T.TimestampType) and isinstance(actual, T.LongType):
            # nanos since epoch → microsecond timestamp (floor division
            # matches DuckDB's ns→us truncation for positive epochs)
            df = df.withColumn(field.name, F.expr(f"timestamp_micros({field.name} div 1000)"))
    return df


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure at least ``min_parallelism`` partitions before a
    compute-heavy stage (shingling, signature folds, per-doc features).

    Small local scans arrive as a single parquet split, which would pin
    all downstream array/codegen work to one core.  At cluster scale a
    100 TB table has thousands of splits, so the partition count already
    exceeds the target and this is a no-op — no shuffle is added.
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` works over the
    same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
