"""Benchmark runner: times every registered query at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced to full execution with a count-style noop action
(``df.write.format("noop")``) so timings measure the whole plan without
driver materialization cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark_pipelining_spark import cache
from pyspark_pipelining_spark.queries import QUERIES
from pyspark_pipelining_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    # warm the JVM + parquet footers with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    timings: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            print(f"bench: query {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
        finally:
            # drop intra-operator persist() handles so cached blocks from
            # one query never skew the next one's timing or memory
            cache.release_all()
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
