"""Structured-Streaming twins of the batch operators.

The reference is batch-only (SURVEY.md §2.5: no watermarks/event-time/state),
so everything here is north-star extension surface:

* ``score_stream`` — the fitted IForestModel applied to a stream. The batch
  scorer already is a stateless pandas_udf + Catalyst ``when``, so the same
  plan runs under ``readStream``; the two eager actions of the reference's
  transform (count + approxQuantile) are the only blockers, hence the
  preconditions (absolute maxSamples, explicit threshold).
* ``windowed_agg_stream`` — tumbling event-time window + watermark.
* ``sessionize_stream`` — gap-session assembly with
  ``applyInPandasWithState`` (custom stateful operator).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def score_stream(model, stream: DataFrame) -> DataFrame:
    """Score a streaming DataFrame with a fitted IForestModel.

    Requires ``maxSamples > 1`` (the fractional setting needs a count of the
    scored dataset — impossible on a stream; reference IForest.scala:87-89)
    and an explicit ``setThreshold`` (the contamination quantile needs a
    batch pass; reference IForest.scala:101-105).
    """
    if not stream.isStreaming:
        raise ValueError("score_stream expects a streaming DataFrame")
    if model.getMaxSamples() <= 1.0:
        raise ValueError("score_stream requires an absolute maxSamples (> 1)")
    if model.getThreshold() < 0:
        raise ValueError("score_stream requires setThreshold(...) first")
    return model.transform(stream)


def windowed_agg_stream(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling aggregation with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful gap-sessionization via applyInPandasWithState.

    Emits a session row when a user is idle past the gap (state timeout) —
    the streaming twin of operators.relational.sessionize. State per key is
    three longs; timeouts are event-time based off the watermark.
    """
    gap_us = gap_seconds * 1_000_000

    def assemble(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_us = pd.concat([pdf[ts_col] for pdf in pdfs]).astype("int64") // 1000
        ts_us = ts_us.sort_values()
        out = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = int(ts_us.iloc[0])
            n = 0
        for t in ts_us:
            t = int(t)
            if t - last_us > gap_us:
                out.append((user_id, start_us, last_us, n))
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
                    "n_events": [r[3] for r in out],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
