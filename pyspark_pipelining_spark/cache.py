"""Scoped lifecycle for intra-operator ``persist()`` handles.

Operators like the LSH families persist an intermediate (the signature
stage) that both branches of a self-join consume.  The consuming action
happens in the *caller*, so the operator cannot unpersist before
returning — and a bare ``persist()`` would leak cached blocks across
repeated calls in a long-lived session (driver REPLs, schedulers,
bench loops).

:func:`keep` registers every such handle; :func:`release_all` drops
them after the caller's action completes.  ``bench.py`` releases
between queries; batch jobs release at stage boundaries.  Unpersisting
a frame whose action already ran is free; unpersisting one mid-action
is safe too (Spark recomputes), so release_all can never corrupt
results — it only trades cache hits for memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: list[DataFrame] = []


def keep(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for later release."""
    df.persist()
    _live.append(df)
    return df


def release_all() -> int:
    """Unpersist every registered handle (non-blocking); returns how
    many were released."""
    n = len(_live)
    for df in _live:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    _live.clear()
    return n
