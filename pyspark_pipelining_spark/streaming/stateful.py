"""Custom stateful streaming operator: event-time sessionization.

The reference has no streaming at all (SURVEY §2.10); this is the
beyond-reference "custom stateful operator" slice, built the way Spark
wants it:

* :func:`sessionize_batch` — the batch twin: gap-based sessions via
  ``lag``/running-sum window functions (one shuffle on user_id; both
  window specs share the same partitioning so Catalyst plans a single
  exchange).  Fully SQL-expressible → DuckDB oracle.
* :func:`sessionize_stream` — the streaming version with
  ``applyInPandasWithState``: per-user state holds the OPEN session
  (start, last ts, count, value sum); each micro-batch merges new
  events in event-time order, emits every session that CLOSES (a gap >
  ``gap_min`` appears), and keeps the still-open tail in state.  State
  per key is O(1) — the operator never buffers raw events.

Agreement contract (tested): an ``availableNow`` replay of the stream
emits exactly the batch twin's sessions minus each user's final
(still-open) session.

Scale: state lives in the state store partitioned by user_id; skewed
users cost O(their events per batch) at merge time only.  The pandas
path transfers Arrow batches — one python worker round-trip per user
group per batch, the documented price of custom state logic (built-in
``F.session_window`` covers the no-custom-logic case JVM-side).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

D = "decimal(18,2)"

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# open-session carryover: (session_no, start_us, last_us, n, value cents)
# val_cents is int64, not float: integer-cent accumulation is associative
# and exact, so long sessions agree bit-for-bit with the batch twin's
# decimal(18,2) sum (a float += per event can drift in the last ulp).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("val_cents", T.LongType()),
    ]
)


def sessionize_batch(df: DataFrame, gap_min: int = 30) -> DataFrame:
    """Gap-based sessions over (user_id, ts, event_id, value).

    Output: user_id, session_no (1-based per user), start_us/end_us
    (epoch micros — engine-portable, no timestamp rendering drift),
    n_events, total_value (exact decimal sum cast double).
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_min * 60 * 1_000_000
    new_sess = (
        F.when(
            F.lag("ts").over(order).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(order)) > gap_us),
            1,
        )
        .otherwise(0)
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = df.withColumn("new_s", new_sess).withColumn(
        "session_no", F.sum("new_s").over(run).cast("long")
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("double").alias("total_value"),
        )
        # no final orderBy: output is one row per session (fact-sized at
        # scale) and consumers/compare are order-insensitive — a global
        # sort here would add a full range-shuffle for nothing
    )


def _merge_sessions(gap_us: int):
    """Build the applyInPandasWithState merge function (closure over the
    gap).  Emits closed sessions; keeps the open tail in state."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        events = pd.concat(list(pdfs), ignore_index=True)
        events = events.sort_values(["ts", "event_id"])
        # normalize to epoch micros regardless of pandas datetime unit
        ts_us = (
            pd.to_datetime(events["ts"]).astype("datetime64[us]").astype("int64").to_list()
        )
        # accumulate integer cents so the sum is exact and associative —
        # bit-identical to the batch twin's decimal(18,2) arithmetic
        # even for arbitrarily long sessions spanning many micro-batches
        cents = [int(round(v * 100)) for v in events["value"].to_list()]
        if state.exists:
            session_no, start_us, last_us, n, val = state.get
        else:
            session_no, start_us, last_us, n, val = 0, None, None, 0, 0
        out: list[tuple[Any, ...]] = []
        for t_us, c in zip(ts_us, cents):
            if start_us is None:  # very first event for this user
                session_no, start_us, last_us, n, val = session_no + 1, t_us, t_us, 1, c
            elif t_us - last_us > gap_us:  # gap → close the open session
                out.append((user_id, session_no, start_us, last_us, n, val / 100.0))
                session_no, start_us, last_us, n, val = session_no + 1, t_us, t_us, 1, c
            else:
                last_us, n, val = t_us, n + 1, val + c
        state.update((session_no, start_us, last_us, n, val))
        cols = ["user_id", "session_no", "start_us", "end_us", "n_events", "total_value"]
        yield pd.DataFrame(out, columns=cols).astype(
            {c: "int64" for c in cols[:-1]} | {"total_value": "float64"}
        )

    return fn


def sessionize_stream(stream_df: DataFrame, gap_min: int = 30) -> DataFrame:
    """Streaming sessionization over a stream with (user_id, ts,
    event_id, value).  Emits one row per CLOSED session (append mode);
    the open session per user persists in the state store across
    micro-batches."""
    gap_us = gap_min * 60 * 1_000_000
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _merge_sessions(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
