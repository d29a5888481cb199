"""Diagnostic sweep: per registered query, how many times does each
parquet table appear in the executed plan's lineage, and is any reuse
machinery (InMemoryTableScan / ReusedExchange) present?

    python tools/scan_audit.py [min_scans] [--staged]

Lineage strings over-count cached subtrees (an InMemoryRelation prints
its full child plan), so a high scan count WITH InMemoryTableScan /
ReusedExchange nodes is usually fine; a high count with NEITHER is the
multi-branch-recompute smell worth a manual look (the class the
round-7 review caught in funnel/retention/cms).  Diagnostic only — not
a gate; bounded dims legitimately scan twice.
"""

from __future__ import annotations

import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    from pyspark.sql import SparkSession

    from pyspark_pipelining_spark import cache
    from pyspark_pipelining_spark.queries import QUERIES

    registry = dict(QUERIES)
    argv = [a for a in sys.argv[1:] if a != "--staged"]
    if "--staged" in sys.argv[1:]:
        # audit the staging area too (same resolution as bracket.py) —
        # staged plans get the pytest invariant gate, but this
        # diagnostic is where the multi-branch-recompute smell shows
        from pyspark_pipelining_spark.queries_staged import (
            QUERIES_QUEUED,
            QUERIES_STAGED,
        )

        QUERIES_STAGED = {**QUERIES_STAGED, **QUERIES_QUEUED}

        # a staged name colliding with a registered one would silently
        # shadow the registered plan and audit the wrong query (ADVICE r11)
        clash = set(registry) & set(QUERIES_STAGED)
        assert not clash, f"staged names shadow registered queries: {sorted(clash)}"
        registry.update(QUERIES_STAGED)

    min_scans = int(argv[0]) if argv else 3
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("scan-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for name in sorted(registry):
        try:
            df = registry[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"ERR  {name}: {type(exc).__name__}: {str(exc)[:120]}")
            continue
        finally:
            cache.release_all()
            spark.catalog.clearCache()
        counts = {
            t: plan.count(f"{t}.parquet")
            for t in re.findall(r"(\w+)\.parquet", plan)
        }
        reuse = plan.count("InMemoryTableScan") + plan.count("ReusedExchange")
        hot = {t: c for t, c in counts.items() if c >= min_scans}
        if hot and reuse == 0:
            flagged += 1
            print(f"FLAG {name}: scans={hot} (no reuse nodes)")
    print(f"done: {flagged} queries flagged (>= {min_scans} lineage scans, zero reuse nodes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
