"""Per-key per-event-type running counters on
`transformWithStateInPandas` **MapState** — the fourth TWS operator,
completing the typed-state surface (ValueState: tws_state_machine /
tws_throttle; ListState: tws_reorder; MapState: here; plus TTL and
event-time timers across them).

The shape: a hand-maintained update-mode aggregation. The reference
keeps several per-payment tallies in one KV bag (poll count, amounts,
flags — kinesis-pay.php:176,231-236); the faithful state layout is a
MAP per key, not one ValueState per tally, because the set of tallied
sub-keys (event types) is open-ended and per-key sparse. Each batch
increments only the sub-keys it saw and emits a changelog row per
UPDATED sub-key with the new running total — what
``groupBy(user, type).count()`` in update mode does inside the engine,
reconstructed on the user-level API where it can feed custom logic
(thresholds, ratios between sub-counters) that the built-in
aggregation cannot express.

State per key is O(|distinct sub-keys|) — bounded by the event-type
vocabulary, not the stream length; RocksDB holds each (key, sub-key)
as its own store entry, so updating one sub-key never rewrites the
map. The golden test pins the changelog contract against the batch
aggregate: final emission per (user, type) equals the batch count, and
successive emissions are strictly increasing.
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

OUTPUT_SCHEMA = "user_id long, event_type string, running_count long"


class TypeCounterProcessor(StatefulProcessor):
    """MapState(event_type -> count); emits changed entries per batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "cnt long"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        batch_counts = pdf["event_type"].value_counts()
        out_types, out_totals = [], []
        for etype in sorted(batch_counts.index):
            prev = self._counts.getValue((etype,))
            total = (int(prev[0]) if prev is not None else 0) + int(
                batch_counts[etype]
            )
            self._counts.updateValue((etype,), (total,))
            out_types.append(etype)
            out_totals.append(total)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_types),
                "event_type": out_types,
                "running_count": out_totals,
            }
        )

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:  # pragma: no cover - no timers registered
        return iter(())

    def close(self) -> None:
        pass


def type_counter_tws(events_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas wiring: no timers (timeMode none),
    append-mode changelog output, RocksDB provider required."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeCounterProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
