"""Per-key poll-throttle counter on `transformWithStateInPandas`
(SURVEY.md §2.9 stream_poll_throttle_log, Spark-4 stateful form).

[REF] kinesis-pay.php:231-236 (`pollCount++`) and :302-304 (log every
10th poll): each payment's polls get a monotone sequence number and
only every EMIT_EVERY-th one reaches the audit log. Batch form is
``stream_poll_throttle_log`` (row_number + modulus,
streaming/batch_equiv.py); ``applyInPandasWithState`` counter form is
streaming/seq_counter.py. This is the same contract on the successor
API, adding the piece the older API cannot express: **state TTL**.

Why TTL matters here: a payment that goes silent keeps its counter row
in the state store forever under the old API unless a timeout fires
per key. TWS TTL (`ttlDurationMs`) lets the RocksDB store expire idle
counters by itself — processing-time based, watermark-independent — so
at 100 TB/day the state size tracks ACTIVE payments, not ever-seen
payments. That is the operational GC story the reference gets for free
from its 630 s failsafe (kinesis-pay.php:264-268).

Ordering caveat (same as seq_counter.py): per-key sequence numbering is
correct only under per-key in-order delivery — Kinesis per-shard order,
or our file-replay rig. The golden test pins equality with the batch
row_number form under ordered replay.
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

EMIT_EVERY = 10  # kinesis-pay.php:302 — every 10th poll is logged

OUTPUT_SCHEMA = "user_id long, ts timestamp, poll_seq int"

# Idle counters are GC'd by the store one hour after the last update —
# far past the reference's 10-minute payment deadline, so no live
# payment can lose its sequence, while dead keys cannot accumulate.
TTL_MS = 60 * 60 * 1000


class PollThrottleProcessor(StatefulProcessor):
    """ValueState(next_seq) with TTL; emits every EMIT_EVERY-th poll."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seq = handle.getValueState("next_seq", "next_seq int", TTL_MS)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True).sort_values("ts")
        start = self._seq.get()[0] if self._seq.exists() else 1
        seqs = range(start, start + len(pdf))
        self._seq.update((start + len(pdf),))
        hits = [
            (ts, s) for ts, s in zip(pdf["ts"], seqs) if s % EMIT_EVERY == 0
        ]
        if hits:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(hits),
                    "ts": [h[0] for h in hits],
                    "poll_seq": [h[1] for h in hits],
                }
            )

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:  # pragma: no cover - no timers registered
        return iter(())

    def close(self) -> None:
        pass


def poll_throttle_tws(events_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas wiring: processing-time mode (TTL is
    processing-time based; no event-time timers needed), append output.
    Use the RocksDB provider in production for changelog-checkpointed
    TTL'd state.

    A processing-time-mode query NEVER goes idle: timers/TTL are
    re-evaluated every trigger, so micro-batches run back-to-back
    forever even with no new data — bounded test drains must detect
    source exhaustion and stop explicitly (see
    runner.run_to_completion(available_now=True)). Production poll
    cadence: ``trigger(processingTime="10 seconds")`` matches the
    reference's poll loop (kinesis-pay.php:263)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=PollThrottleProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingtime",
    )
