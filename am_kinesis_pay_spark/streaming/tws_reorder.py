"""Per-key event-time reorder buffer on `transformWithStateInPandas`
(SURVEY.md §2.9 extension; third TWS operator, exercising ListState).

The streaming primitive the other stateful operators assume away:
sources deliver events out of order WITHIN a key (multi-shard fan-in,
retried HTTP posts — the reference's poll responses can interleave,
kinesis-pay.php:231-263), but sequence-sensitive consumers (the state
machine's first-terminal-wins rule, the poll-sequence counter) want
per-key event-time order. This operator buffers each key's events in
**ListState** and releases them in (ts, event_id) order once the
watermark passes them — the same contract Flink calls an event-time
sorter and Kafka Streams a buffer-until-watermark.

Mechanics: every input batch appends (ts, event_id) to the key's
ListState and arms an event-time timer just past the current
watermark. When a timer fires, rows at or below the watermark drain in
sorted order with a monotone per-key ``emit_seq`` (ValueState
counter); later rows stay buffered and re-arm the timer. Rows are
therefore emitted exactly once, in event-time order, delayed by at
most one watermark advance — and state per key is bounded by the
watermark delay times the key's event rate (the watermark GC bound
every Structured Streaming stateful op shares). The guarantee is
correspondingly bounded: rows arriving BELOW the watermark are dropped
by the event-time lateness gate before the processor sees them, so the
buffer restores order only within the declared delay — both sides of
that contract are pinned in the golden test.

At 100 TB: state is (delay-window x per-key rate) rows of 16 bytes —
RocksDB-resident, changelog-checkpointed; the sort is per-key
per-drain (tiny), never a shuffle. The golden test replays a
deliberately shuffled fixture and pins the output against the batch
sort (tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

OUTPUT_SCHEMA = "user_id long, ts timestamp, event_id long, emit_seq int"


class ReorderBufferProcessor(StatefulProcessor):
    """ListState buffer + ValueState emit counter + event-time timers."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._buf = handle.getListState("buf", "ts_us long, event_id long")
        self._seq = handle.getValueState("next_seq", "next_seq int")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        ts_us = (pdf["ts"].astype("int64") // 1_000).to_numpy()
        self._buf.appendList(
            [
                (int(t), int(e))
                for t, e in zip(ts_us, pdf["event_id"].to_numpy())
            ]
        )
        # arm a timer just past the current watermark: it fires on the
        # next watermark advance, which is exactly when newly-final
        # rows can exist
        self._handle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
        return iter(())

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_us = timerValues.getCurrentWatermarkInMs() * 1_000
        buffered = list(self._buf.get()) if self._buf.exists() else []
        if not buffered:
            return
        ready = sorted(
            [(t, e) for t, e in buffered if t <= wm_us]
        )
        rest = [(t, e) for t, e in buffered if t > wm_us]
        if ready:
            start = self._seq.get()[0] if self._seq.exists() else 1
            self._seq.update((start + len(ready),))
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(ready),
                    "ts": [pd.Timestamp(t, unit="us") for t, _ in ready],
                    "event_id": [e for _, e in ready],
                    "emit_seq": list(range(start, start + len(ready))),
                }
            )
        self._buf.clear()
        if rest:
            self._buf.put(rest)
            self._handle.registerTimer(
                timerValues.getCurrentWatermarkInMs() + 1
            )

    def close(self) -> None:
        pass


def reorder_buffer_tws(
    events_stream: DataFrame, watermark: str = "1 minute"
) -> DataFrame:
    """transformWithStateInPandas wiring: event-time mode, append
    output, RocksDB provider required (multi-column-family state)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=ReorderBufferProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventtime",
        )
    )
