"""Round-12 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-11 snapshot window already
carries this round's registrations (the former round-11 staged trio:
``partition_pruned_revenue`` → queries_coverage, ``hll_register_merge``
→ queries_corpus, ``png_pixel_stats`` → queries_ann_media), and late
additions would defer pending revalidations (CLAUDE.md: registry
freeze).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into their family
modules, reset this file, and regenerate VALIDATION.md.  The local
gates exercise everything here every pytest run (oracle compare at
sf0.001, the pandas-dtype gate, and the plan-invariant gate), so
staged queries are pytest-green now and driver-validated next round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES_STAGED: dict[str, QueryFn] = {}

ORACLES_STAGED: dict[str, str] = {}
