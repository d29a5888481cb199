"""Round-13 staging area: oracle-paired queries that are READY but
deliberately NOT registered — the round-12 snapshot window already
carries this round's registrations (the former round-12 staged
quartet: ``cms_merge_parity`` → queries_corpus,
``dpp_top_year_revenue`` → queries_coverage,
``png_filter_pixel_stats`` and ``wav_window_features`` →
queries_ann_media), and late additions would defer pending
revalidations (CLAUDE.md: registry freeze).

Next round: merge QUERIES_STAGED / ORACLES_STAGED into their family
modules, reset this file, repoint the moved queries' tests, and
regenerate VALIDATION.md.  The local gates exercise everything here
every pytest run (oracle compare at sf0.001, the pandas-dtype gate,
and the plan-invariant gate), so staged queries are pytest-green now
and driver-validated next round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES_STAGED: dict[str, QueryFn] = {}

ORACLES_STAGED: dict[str, str] = {}
