"""Name-mapping dimension build (reference ``metrics/lib/hh_mapping.py``
+ ``metrics/helpers/name_mapping.py``).

Semantics: normalize an adserver key/value meta table (lowercase ``key``,
``_id``→``id`` in ``id_type``), assign each distinct ``value`` a
surrogate ``val_id``, then right-outer-join onto the dimension master on
(dimension=id_type, label=id_value, etype) and coalesce the adserver
fields with the master's (so every master row survives, enriched when
matched).

Rebuild differences:

* ``val_id`` is a **deterministic md5-derived hash of value** instead
  of ``monotonically_increasing_id`` (reference ``hh_mapping.py:8-10``),
  which is partition-layout-dependent and unstable across runs
  (SURVEY §2 F10, §5 bug list).  The hash is pure map-side work —
  reproducible in any engine (including the DuckDB oracle) and, unlike
  a dense_rank over a global window, needs no single-partition funnel:
  at warehouse scale the value vocabulary never converges on one task.
* friendly-name enrichment (``name_mapping.py:36-48`` — driver pandas
  ``.loc`` lookups) becomes a broadcast left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipelining_spark.operators.dedup import portable_hash_id
from pyspark_pipelining_spark.sources.registry import load_table

# 40-bit surrogate-id space: collision odds stay negligible for any
# realistic adserver value vocabulary (~1e-7 at a million values) while
# the id remains comfortably inside an exact int64/double.
VAL_ID_MOD = 1 << 40


def normalize_adserver_keys(ka_df: DataFrame) -> DataFrame:
    """Key normalization + stable surrogate ids
    (reference ``filter_to_relevant``, ``hh_mapping.py:4-12``).

    ``val_id`` is assigned map-side via :func:`portable_hash_id` — no
    distinct, no join, no global window; the same expression reproduced
    in the DuckDB oracle."""
    return (
        ka_df.withColumn("key", F.lower(F.col("key")))
        .withColumn("id_type", F.regexp_replace("id_type", "_id", "id"))
        .withColumn("val_id", portable_hash_id(F.col("value"), VAL_ID_MOD))
    )


def make_map(ka_df: DataFrame, dm_df: DataFrame) -> DataFrame:
    """Mapping-dim assembly (reference ``make_map``, ``hh_mapping.py:15-23``).

    Output: ``etype, key, dimension, label, id, value, val_id``.
    """
    ka2 = normalize_adserver_keys(ka_df).withColumn("etype2", F.lit("dig"))
    cond = [
        dm_df["dimension"] == ka2["id_type"],
        dm_df["label"] == ka2["id_value"],
        dm_df["etype"] == ka2["etype2"],
    ]
    return (
        ka2.join(dm_df, on=cond, how="right_outer")
        .withColumn("key", F.coalesce(F.col("key"), F.col("dimension")))
        .withColumn("val_id", F.coalesce("val_id", "id"))
        .select("etype", "key", "dimension", "label", "id", "value", "val_id")
    )


def hierarchy_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy dim derived from region/nation (FIXTURES.md §B.6):
    regions are parents of nations.  Columns:
    ``dimension, friendly_name, id, parent_id``."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    regions = region.select(
        F.lower("r_name").alias("dimension"),
        F.initcap("r_name").alias("friendly_name"),
        F.col("r_regionkey").alias("id"),
        F.lit(None).cast("long").alias("parent_id"),
    )
    nations = nation.select(
        F.lower("n_name").alias("dimension"),
        F.initcap("n_name").alias("friendly_name"),
        F.col("n_nationkey").alias("id"),
        F.col("n_regionkey").alias("parent_id"),
    )
    return regions.unionByName(nations)


def adserver_meta_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adserver key/value meta mapped from nation (FIXTURES.md §B.5):
    ``key, value, id_type, id_value``."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        F.upper("n_name").alias("key"),
        F.concat(F.lit("v_"), F.lower("n_name")).alias("value"),
        F.lit("nation_id").alias("id_type"),
        F.col("n_name").alias("id_value"),
    )


def dimension_master_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension master mapped from nation: ``dimension, label, etype, id``."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        F.lit("nationid").alias("dimension"),
        F.col("n_name").alias("label"),
        F.when(F.col("n_nationkey") % 2 == 0, F.lit("dig")).otherwise(F.lit("tv")).alias("etype"),
        F.col("n_nationkey").alias("id"),
    )


def friendly_names(df: DataFrame, hier_df: DataFrame, col: str) -> DataFrame:
    """Broadcast-join friendly-name substitution (replaces the driver
    pandas lookup at reference ``name_mapping.py:41-48``)."""
    m = hier_df.select(F.col("dimension").alias("__k"), "friendly_name").dropDuplicates(["__k"])
    return (
        df.join(F.broadcast(m), on=F.lower(F.col(col)) == F.col("__k"), how="left")
        .withColumn(col, F.coalesce("friendly_name", col))
        .drop("__k", "friendly_name")
    )
