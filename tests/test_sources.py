"""Source-layer tests: JDBC option plumbing (S7, no live DB needed) and
catalog introspection over registered views (S9)."""

from __future__ import annotations

import pytest

from pyspark_pipelining_spark.sources.registry import (
    SchemaError,
    check_timestamp_column,
    jdbc_options,
    list_columns,
    list_tables,
    probe_schema,
    register_views,
    table_exists,
)
from tests.conftest import SF_SMOKE


def test_jdbc_options_table_read():
    opts = jdbc_options("jdbc:postgresql://h/db", table="events", user="u", password="p")
    assert opts["url"] == "jdbc:postgresql://h/db"
    assert opts["dbtable"] == "events"
    assert opts["user"] == "u" and opts["password"] == "p"
    assert "query" not in opts


def test_jdbc_options_query_read():
    opts = jdbc_options("jdbc:x", query="select * from t where d = '2024-01-01'")
    assert opts["query"].startswith("select")
    assert "dbtable" not in opts


def test_jdbc_options_partitioned_read():
    opts = jdbc_options(
        "jdbc:x",
        table="events",
        partition_column="event_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    assert opts["partitionColumn"] == "event_id"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "32"


def test_jdbc_options_validation():
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_options("jdbc:x")
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_options("jdbc:x", table="t", query="select 1")
    with pytest.raises(ValueError, match="all of"):
        jdbc_options("jdbc:x", table="t", partition_column="id")
    with pytest.raises(ValueError, match="requires table"):
        jdbc_options(
            "jdbc:x",
            query="select 1",
            partition_column="id",
            lower_bound=0,
            upper_bound=1,
            num_partitions=2,
        )


def test_catalog_discovery_over_registered_views(spark):
    register_views(spark, SF_SMOKE, ["events", "nation"])
    tables = list_tables(spark)
    assert "events" in tables and "nation" in tables
    assert table_exists(spark, "events")
    assert not table_exists(spark, "no_such_table")
    cols = list_columns(spark, "events")
    assert set(cols) >= {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert "timestamp" in cols["ts"].lower()


def test_probe_schema_reads_no_rows(spark):
    register_views(spark, SF_SMOKE, ["nation"])
    schema = probe_schema(spark, "nation")
    assert [f.name for f in schema.fields][:2] == ["n_nationkey", "n_name"]


def test_check_timestamp_column(spark):
    register_views(spark, SF_SMOKE, ["events", "nation"])
    check_timestamp_column(spark, "events", "ts")  # passes
    with pytest.raises(SchemaError, match="must be a timestamp"):
        check_timestamp_column(spark, "events", "event_type")
    with pytest.raises(SchemaError, match="no column"):
        check_timestamp_column(spark, "nation", "ts")


def test_load_csv_enforces_schema_and_failfast(spark, tmp_path):
    from pyspark.sql import types as T

    from pyspark_pipelining_spark.sources.registry import SchemaError, load_csv

    p = tmp_path / "in.csv"
    p.write_text("id,name,qty\n1,widget,5\n2,gadget,7\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("qty", T.IntegerType()),
        ]
    )
    rows = sorted(map(tuple, load_csv(spark, str(p), schema).collect()))
    assert rows == [(1, "widget", 5), (2, "gadget", 7)]
    # malformed row -> FAILFAST abort, not silent nulls
    bad = tmp_path / "bad.csv"
    bad.write_text("id,name,qty\n1,widget,notanumber\n")
    import pytest as _pytest

    with _pytest.raises(Exception):
        load_csv(spark, str(bad), schema).collect()


def test_load_json_enforces_schema(spark, tmp_path):
    from pyspark.sql import types as T

    from pyspark_pipelining_spark.sources.registry import load_json

    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "name": "a"}\n{"id": 2, "name": "b"}\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    rows = sorted(map(tuple, load_json(spark, str(p), schema).collect()))
    assert rows == [(1, "a"), (2, "b")]


def test_compact_parquet_merges_small_files_losslessly(spark, tmp_path):
    from pyspark_pipelining_spark.sources.sinks import compact_parquet

    df = spark.range(0, 1000).withColumnRenamed("id", "v")
    path = str(tmp_path / "many")
    df.repartition(40).write.parquet(path)  # 40 tiny files
    import pathlib

    assert len(list(pathlib.Path(path).rglob("*.parquet"))) == 40
    n = compact_parquet(spark, path, target_mb=256)
    assert n == 1
    back = spark.read.parquet(path)
    assert sorted(r["v"] for r in back.collect()) == list(range(1000))


def test_compact_parquet_crash_rollback_restores_live_dir(spark, tmp_path, monkeypatch):
    """If the tmp→live rename fails, the live name is rolled back so no
    reader ever finds the dataset missing after the call returns."""
    import pathlib

    from pyspark_pipelining_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "data")
    spark.range(0, 100).withColumnRenamed("id", "v").repartition(5).write.parquet(path)

    real_rename = pathlib.Path.rename

    def failing_rename(self, target):
        if str(self).endswith("__compacting"):
            raise OSError("simulated crash between renames")
        return real_rename(self, target)

    monkeypatch.setattr(pathlib.Path, "rename", failing_rename)
    import pytest as _pytest

    with _pytest.raises(OSError, match="simulated crash"):
        compact_parquet(spark, path, target_mb=256)
    monkeypatch.undo()
    # live dir restored with the original data; no __old stranded copy
    back = spark.read.parquet(path)
    assert sorted(r["v"] for r in back.collect()) == list(range(100))
    assert not pathlib.Path(f"{path}__old").exists()


def test_compact_parquet_recovers_from_stale_old_dir(spark, tmp_path):
    """A leftover <path>__old from a previous crashed run is cleaned up,
    not an error."""
    import pathlib

    from pyspark_pipelining_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "data")
    spark.range(0, 50).withColumnRenamed("id", "v").repartition(4).write.parquet(path)
    stale = pathlib.Path(f"{path}__old")
    stale.mkdir()
    (stale / "junk").write_text("stale")
    n = compact_parquet(spark, path, target_mb=256)
    assert n == 1
    assert not stale.exists()
    back = spark.read.parquet(path)
    assert sorted(r["v"] for r in back.collect()) == list(range(50))


def test_write_partitioned_dynamic_overwrite_touches_only_present_partitions(spark, tmp_path):
    """Re-running one day's batch must replace that day only — other
    partitions survive byte-for-byte (the idempotent backfill contract)."""
    from pyspark_pipelining_spark.sources.sinks import write_partitioned

    path = str(tmp_path / "t")
    full = spark.createDataFrame(
        [(1, "d1"), (2, "d1"), (3, "d2"), (4, "d3")], "v long, day string"
    )
    write_partitioned(full, path, ["day"])
    # backfill d2 with corrected rows
    fix = spark.createDataFrame([(30, "d2"), (31, "d2")], "v long, day string")
    write_partitioned(fix, path, ["day"])
    got = sorted((r["day"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got == [("d1", 1), ("d1", 2), ("d2", 30), ("d2", 31), ("d3", 4)]
    # static mode really does truncate everything (the full-rebuild path)
    write_partitioned(fix, path, ["day"], dynamic=False)
    got2 = sorted((r["day"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got2 == [("d2", 30), ("d2", 31)]


def test_write_table_orc_round_trip(spark, tmp_path):
    """ORC sink round-trips values and partition pruning like parquet."""
    from pyspark_pipelining_spark.sources.sinks import write_table

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], ["id", "grp", "v"]
    )
    out = str(tmp_path / "t_orc")
    write_table(df, out, partition_by=["grp"], format="orc")
    back = spark.read.orc(out)
    assert sorted((r["id"], r["grp"], r["v"]) for r in back.collect()) == [
        (1, "a", 10), (2, "b", 20), (3, "a", 30)
    ]
    # partition layout exists -> pruning applies on grp
    import os as _os
    assert any(d.startswith("grp=") for d in _os.listdir(out))


def test_write_table_rejects_unknown_format(spark, tmp_path):
    import pytest as _pytest

    from pyspark_pipelining_spark.sources.sinks import write_table

    df = spark.createDataFrame([(1,)], ["id"])
    with _pytest.raises(ValueError, match="unsupported table format"):
        write_table(df, str(tmp_path / "x"), format="avro")


def test_binary_file_source_feeds_sniffer(spark, tmp_path):
    """binaryFile ingestion: real PNG-signature files on disk read as
    binary rows, glob-pruned at listing time, size-filtered at the
    format, and the content column flows straight into the JVM header
    sniffer."""
    import struct

    from pyspark.sql import functions as F

    from pyspark_pipelining_spark.operators.multimodal import sniff_headers
    from pyspark_pipelining_spark.sources.registry import load_binary_files

    d = tmp_path / "media"
    d.mkdir()
    for i, (w, h) in enumerate([(320, 200), (64, 48)]):
        png = (
            b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
            + struct.pack(">II", w, h) + b"\x00" * 5
        )
        (d / f"img{i}.png").write_bytes(png)
    (d / "ignore.txt").write_bytes(b"not media")
    (d / "huge.png").write_bytes(b"\x89PNG" + b"\x00" * 10_000)

    df = load_binary_files(spark, str(d), glob="*.png", max_bytes=1000)
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 2  # txt glob-pruned, huge size-filtered
    media = df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col("content").alias("payload"),
    )
    sniffed = {
        (r["sniffed_width"], r["sniffed_height"])
        for r in sniff_headers(media).collect()
    }
    assert sniffed == {(320, 200), (64, 48)}


def test_text_lines_source_feeds_line_dedup(spark, tmp_path):
    """text source: one row per line; wholetext=True gives one row per
    file — both shapes verified against the files on disk."""
    from pyspark_pipelining_spark.sources.registry import load_text_lines

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha\nbeta\nalpha\n")
    (d / "b.txt").write_text("beta\ngamma\n")

    lines = load_text_lines(spark, str(d))
    vals = sorted(r["value"] for r in lines.collect())
    assert vals == ["alpha", "alpha", "beta", "beta", "gamma"]

    whole = load_text_lines(spark, str(d), wholetext=True)
    assert whole.count() == 2
    assert {r["value"].count("\n") for r in whole.collect()} == {2, 3}


def test_parquet_merge_schema_reads_evolved_lake(spark, tmp_path):
    """mergeSchema surfaces columns added after older files were
    written (NULL for pre-evolution rows) — and the declared-schema
    default path stays strict."""
    from pyspark_pipelining_spark.sources.registry import read_parquet_merged

    d = str(tmp_path / "lake")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.mode("append").parquet(d)
    df = read_parquet_merged(spark, d)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def test_json_error_channel_quarantines_bad_rows(spark, tmp_path):
    """PERMISSIVE ingestion splits clean rows from malformed ones; the
    malformed raw text is preserved for the error report, and
    good + bad partitions the input exactly."""
    from pyspark.sql import types as T

    from pyspark_pipelining_spark.sources.registry import load_json_with_errors

    p = tmp_path / "feed.json"
    p.write_text(
        '{"id": 1, "v": "x"}\n'
        "not json at all\n"
        '{"id": 2, "v": "y"}\n'
        '{"id": "NaN-ish", "v": 3}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, bad = load_json_with_errors(spark, str(p), schema)
    assert sorted((r["id"], r["v"]) for r in good.collect()) == [(1, "x"), (2, "y")]
    raws = [r["raw"] for r in bad.collect()]
    assert len(raws) == 2 and "not json at all" in raws
    # the documented release path drops the cached parse behind both
    # children (ADVICE r06: the cache must not pin the feed forever)
    from pyspark_pipelining_spark.sources.registry import (
        unpersist_json_with_errors,
    )

    parent = good._json_errors_parent
    assert parent.storageLevel.useMemory or parent.storageLevel.useDisk
    unpersist_json_with_errors(good)
    assert not (parent.storageLevel.useMemory or parent.storageLevel.useDisk)
    # no-op on frames that did not come from the loader
    unpersist_json_with_errors(good.select("id"))
