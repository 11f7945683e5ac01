"""Sessionization + custom stateful streaming operators.

Absent in the reference (D2RQ is batch-only, SURVEY §2.9); these are
the event-stream extensions a training-data pipeline needs (user
sessions for interaction data, stateful per-key accumulation).

Three surfaces, one semantics:
  * ``sessionize``        — batch gaps-and-islands via window functions
                            (lag → new-session flag → running sum →
                            groupBy).  Fully SQL-replayable: the driver
                            oracle runs the identical query in DuckDB.
  * ``sessionize_stream`` — the SAME gap semantics under Structured
                            Streaming via the native
                            ``F.session_window`` state store + a
                            watermark (bounded state, late data merged
                            while the watermark allows).
  * ``running_totals_stream`` — applyInPandasWithState: the custom-
                            stateful escape hatch for semantics the
                            built-ins can't express; per-key state is
                            an Arrow-backed pandas batch per group per
                            micro-batch, never per-row Python.

Scale notes (100 TB of events): one shuffle on the session key for all
three; the batch path's window sort is per-user-partition (AQE handles
skewed users); streaming state is bounded by (active sessions ×
watermark horizon).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """→ (user_id, session_id, session_start, session_end, n_events,
    sum_value): gaps-and-islands sessions, new session when the gap to
    the previous event exceeds ``gap_seconds``.

    Deterministic: ordering within a user breaks ties on ``order_col``
    (equal-timestamp events are always in one session regardless of
    order, so the session SET is order-independent; the tiebreak just
    pins the plan)."""
    w = W.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_col).asc())
    prev = F.lag(ts_col).over(w)
    # TIMESTAMP_NTZ needs the intermediate timestamp cast before →long;
    # the gap is a DIFFERENCE, so the session-tz offset cancels
    secs = lambda c: c.cast("timestamp").cast("long")
    new_s = F.when(
        prev.isNull() | ((secs(F.col(ts_col)) - secs(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    run = W.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    ).rowsBetween(W.unboundedPreceding, 0)
    sess = events.withColumn("_new", new_s).withColumn(
        "session_id", F.sum("_new").over(run).cast("bigint")
    )
    return sess.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessions via the native session_window state store —
    identical gap semantics to ``sessionize`` (session extends while
    successive events arrive within ``gap``).  The watermark bounds the
    state: a session finalizes once the watermark passes its close."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_TOTALS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("batch_events", T.LongType()),
    ]
)
_TOTALS_STATE = T.StructType([T.StructField("n", T.LongType())])


def _totals_fn(
    key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-user running event count across micro-batches.  State is one
    long; each micro-batch contributes its Arrow batches at once."""
    batch = sum(len(pdf) for pdf in pdfs)
    (prev,) = state.get if state.exists else (0,)
    total = prev + batch
    state.update((total,))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events_total": [total], "batch_events": [batch]}
    )


def running_totals_stream(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """applyInPandasWithState demo operator: per-user cumulative event
    count that survives across micro-batches (custom keyed state the
    built-in aggregations can't express incrementally with arbitrary
    user logic attached)."""
    return events.groupBy(user_col).applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
