"""Per-key monotone sequence counter as a stateful streaming operator.

The reference's ``pollCount++`` (kinesis-pay.php:231-236) is a
window-function ``row_number`` in batch (win_poll_seq) — but window
functions don't exist on unbounded streams, so the streaming form is a
per-key counter in ``applyInPandasWithState``: state = (next_seq), each
batch's rows are numbered in event-time order continuing from state.

Correct ONLY under per-key in-order delivery (Kinesis per-shard order,
our file-replay order) — out-of-order rows within the watermark would
need buffering; the golden test in tests/test_streaming.py pins
equality with the batch row_number under ordered replay.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("poll_seq", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("next_seq", T.IntegerType())])


def seq_counter_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    (next_seq,) = state.get if state.exists else (1,)
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    n = len(pdf)
    seqs = list(range(next_seq, next_seq + n))
    state.update((next_seq + n,))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * n,
            "event_id": pdf["event_id"].to_numpy(),
            "ts": pdf["ts"].to_numpy(),
            "poll_seq": seqs,
        }
    )


def streaming_poll_seq(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            seq_counter_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
