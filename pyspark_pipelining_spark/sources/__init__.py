from pyspark_pipelining_spark.sources.registry import (
    SCHEMAS,
    SchemaError,
    load_table,
    load_tables,
    register_views,
    require_columns,
)

__all__ = [
    "SCHEMAS",
    "SchemaError",
    "load_table",
    "load_tables",
    "register_views",
    "require_columns",
]
