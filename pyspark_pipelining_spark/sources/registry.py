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

    Parquet timestamps written without ``isAdjustedToUTC`` surface as
    ``TIMESTAMP_NTZ`` under Spark 4's NTZ inference; downstream epoch
    arithmetic (``unix_micros``) rejects NTZ.  With the session timezone
    pinned to UTC, casting NTZ→TIMESTAMP reproduces the exact epoch
    micros stored in the file, so every consumer (and the DuckDB oracle,
    which computes on naive timestamps) sees identical values.
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
        elif isinstance(field.dataType, T.TimestampType) and isinstance(
            actual, T.TimestampNTZType
        ):
            # NTZ wall-clock == epoch wall-clock only under UTC.  The
            # engine's whole timestamp contract (unix_micros arithmetic,
            # date_trunc vs the naive-timestamp DuckDB oracle) assumes a
            # UTC session, so pin it and FAIL LOUDLY if the session ends
            # up non-UTC — a silent fallback would shift every epoch
            # value downstream with no error.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            if spark.conf.get("spark.sql.session.timeZone") != "UTC":
                raise SchemaError(
                    f"table {name!r} has a TIMESTAMP_NTZ column "
                    f"({field.name}); reading it requires a UTC session "
                    "timezone, but spark.sql.session.timeZone="
                    f"{spark.conf.get('spark.sql.session.timeZone')!r} "
                    "could not be pinned to UTC"
                )
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# JDBC / warehouse source (SURVEY §2 S7)
# ---------------------------------------------------------------------------


def jdbc_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Validated option dict for a ``spark.read.format('jdbc')`` load
    (pure — unit-testable without a live database).

    Replaces the reference's psycopg2 connection + ``pd.read_sql``
    (``dataQA/dailyConnection.py:5-14``, ``dailyQAHelpers.py:15,36``):
    ``table=`` maps a bare table read, ``query=`` maps an arbitrary SQL
    pull.  For parallel extraction, ``partition_column`` +
    ``lower_bound``/``upper_bound``/``num_partitions`` split the read
    into ``num_partitions`` range-predicated scans — the difference
    between a single-connection driver pull (the reference's shape,
    which caps at one cursor's throughput) and a cluster-wide ingest.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if table is not None:
        opts["dbtable"] = table
    else:
        opts["query"] = query  # type: ignore[assignment]
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part):
        if any(p is None for p in part):
            raise ValueError(
                "partitioned reads need all of partition_column, lower_bound, "
                "upper_bound, num_partitions"
            )
        if query is not None:
            raise ValueError("partition_column requires table=, not query=")
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    predicates: list[str] | None = None,
    **kwargs,
) -> DataFrame:
    """JDBC/warehouse source (SURVEY §2 S7; reference
    ``dataQA/dailyConnection.py:5-14`` + every ``pd.read_sql`` call in
    ``dailyQAHelpers.py``).

    ``predicates`` gives one partition per predicate string (Spark's
    classic ``spark.read.jdbc(..., predicates=...)`` path — the direct
    analog of the reference slicing its pulls by date literal).
    Otherwise builds a ``format('jdbc')`` load from
    :func:`jdbc_options`, including range-partitioned parallel scans.
    Filters and projections on the returned frame push down into the
    remote engine's WHERE clause (Catalyst JDBC pushdown), so
    ``read_jdbc(...).filter(...)`` does not ship the whole table.
    """
    if predicates is not None:
        if table is None:
            raise ValueError("predicates= requires table=")
        props = {
            k: v
            for k, v in (
                ("user", kwargs.get("user")),
                ("password", kwargs.get("password")),
                ("driver", kwargs.get("driver")),
            )
            if v is not None
        }
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    return spark.read.format("jdbc").options(**jdbc_options(url, table, **kwargs)).load()


# ---------------------------------------------------------------------------
# Catalog introspection (SURVEY §2 S9)
# ---------------------------------------------------------------------------


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """Table names visible in the catalog (reference ``check_tables``'
    ``pg_table_def`` scan, ``dataQA/dailyQAHelpers.py:6-19``)."""
    return [t.name for t in spark.catalog.listTables(database)]


def table_exists(spark: SparkSession, name: str) -> bool:
    """Existence probe (reference ``dailyQAHelpers.py:15-18``:
    missing ad table → degrade, missing log table → fail)."""
    return spark.catalog.tableExists(name)


def list_columns(spark: SparkSession, table: str) -> dict[str, str]:
    """``{column: dataType}`` for a catalog table or temp view
    (reference ``ad_cols``/``log_cols`` column pulls,
    ``dataQA/dailyQA.py:66-80``)."""
    return {c.name: c.dataType for c in spark.catalog.listColumns(table)}


def probe_schema(spark: SparkSession, table: str) -> T.StructType:
    """Zero-row schema probe — the ``select * from t limit 0`` trick
    (reference ``dailyQA.py:66-70``) without reading any data."""
    return spark.table(table).limit(0).schema


def check_timestamp_column(spark: SparkSession, table: str, col: str = "ts") -> None:
    """Fail fast unless ``table.col`` is a timestamp (reference
    ``check_timestamp``, ``dailyQAHelpers.py:32-41``)."""
    cols = list_columns(spark, table)
    if col not in cols:
        raise SchemaError(f"table {table!r} has no column {col!r}; has {sorted(cols)}")
    if "timestamp" not in cols[col].lower():
        raise SchemaError(
            f"column {table}.{col} must be a timestamp for hour-shift queries; is {cols[col]}"
        )


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure at least ``min_parallelism`` partitions before a
    compute-heavy stage (shingling, signature folds, per-doc features).

    Small local scans arrive as a single parquet split, which would pin
    all downstream array/codegen work to one core.  At cluster scale a
    100 TB table has thousands of splits, so the partition count already
    exceeds the target and this is a no-op — no shuffle is added.

    Streaming frames pass through untouched (micro-batch partitioning
    is decided by the source at runtime, and ``.rdd`` is illegal on a
    streaming plan) — this keeps every operator built on top of
    ``spread`` (text features, shingling, scrubbing) stream-compatible.
    """
    if df.isStreaming:
        return df
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


# ---------------------------------------------------------------------------
# File sources beyond parquet (CSV / JSON lines)
# ---------------------------------------------------------------------------


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Schema-enforced CSV source.

    CSV carries no types, so the declared ``StructType`` is mandatory
    (never ``inferSchema`` — an inference pass is a second full read of
    the data and can silently flip a column's type between runs).
    ``FAILFAST`` makes malformed rows abort the job instead of turning
    into nulls mid-pipeline — the same fail-fast stance as
    :func:`require_columns`.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    return require_columns(df, [f.name for f in schema.fields], path)


def load_json(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    """Schema-enforced JSON-lines source (same stance as :func:`load_csv`:
    explicit schema, FAILFAST on malformed records)."""
    reader = spark.read.schema(schema).option("mode", "FAILFAST")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.json(path)
    return require_columns(df, [f.name for f in schema.fields], path)


def fixtures_dir(name: str) -> str:
    """Absolute path of a committed fixture set (``fixtures/<name>`` at
    the repo root), derived from the package location at import time so
    oracle SQL built from it carries the right path wherever the repo
    sits — the single home for the derivation ``queries_ann_media``
    (audio) and the staged png query (images) share."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "fixtures",
        name,
    )


def sql_str_literal(s: str) -> str:
    """Escape a string for embedding inside a single-quoted SQL literal
    (ANSI doubling, understood by both DuckDB and Spark SQL).  Every
    oracle string that interpolates a filesystem path (the fixture
    dirs above) must pass through this — a checkout path containing a
    quote would otherwise truncate the literal (r09 ADVICE)."""
    return s.replace("'", "''")


def load_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-media ingestion via Spark's built-in ``binaryFile`` source:
    one row per file with ``path, modificationTime, length, content``
    (binary) — the real on-ramp for the multimodal operators
    (``operators/multimodal.sniff_headers`` etc. consume the
    ``content`` column directly).

    Scale notes: ``pathGlobFilter`` prunes at LISTING time (files never
    open), and a ``length <=`` predicate pushes into the format (the
    reader skips oversized payloads without reading them) — both are
    the difference between touching metadata and touching bytes on a
    100 TB media lake.  One file = one row = one task unit; tiny-file
    lakes should be compacted upstream (``sinks.compact_parquet``
    reasoning applies to media files doubly).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def load_text_lines(
    spark: SparkSession, path: str, wholetext: bool = False
) -> DataFrame:
    """Line-oriented text source (``spark.read.text``): one row per
    line (``value`` string), or one row per FILE with
    ``wholetext=True`` — the raw-corpus on-ramp for the text/dedup
    operators (pair with ``F.input_file_name()`` upstream when the
    file is the document id).  No schema ambiguity: text is text."""
    return spark.read.text(path, wholetext=wholetext)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the schemas of every parquet file
    under ``path`` (``mergeSchema``) so files written before a column
    existed surface it as NULL.  Merging costs a footer read per file
    at planning time — that is why it is NOT the default read path
    (``load_table`` declares its schema); use this for lakes that
    evolved in place, then compact to the current schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def load_json_with_errors(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingestion with an ERROR CHANNEL instead of FAILFAST:
    returns ``(good, bad)`` where malformed records land in ``bad``
    with their raw text (PERMISSIVE mode + ``_corrupt_record``) — the
    quarantine pattern for feeds too dirty for :func:`load_json` but
    too valuable to drop.  ``bad`` pairs with
    ``sinks.write_csv_report`` for the reference's error-report flow.

    Spark caveat handled here: a ``_corrupt_record`` column cannot be
    filtered from the same lazy scan that defines it (the parser only
    fills it for rows it actually fails on during THAT action), so the
    parsed frame is cached before splitting — documented Spark
    behavior, not a workaround of ours.

    The cache pins the parsed feed in executor storage for the
    session; once both splits are materialized, release it with
    ``unpersist_json_with_errors(good)`` (the cached parent is
    reachable from either child).  Callers that sink ``good``/``bad``
    once and move on should do so to keep long sessions bounded.
    """
    full = T.StructType(list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())])
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    good = parsed.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw")
    )
    good._json_errors_parent = parsed  # handle for unpersist_json_with_errors
    bad._json_errors_parent = parsed
    return good, bad


def unpersist_json_with_errors(df: DataFrame) -> None:
    """Release the cached parse behind a :func:`load_json_with_errors`
    split (pass either the ``good`` or ``bad`` child).  No-op on
    frames that did not come from that loader."""
    parent = getattr(df, "_json_errors_parent", None)
    if parent is not None:
        parent.unpersist()
