"""Per-payment state machine on the Spark 4 `transformWithStateInPandas`
API (SURVEY.md §2.9 stream_state_machine, second implementation).

Same reference semantics as streaming/state_machine.py (the
applyInPandasWithState form): first terminal event within the 10-minute
deadline decides processed/rejected exactly once
(kinesis-pay.php:239-249,323,515-518); a silent payment expires at the
deadline via an event-time timer (:210,:245-249,:264-268).

Why a second implementation: transformWithState is the successor API —
typed per-key state handles (value/list/map), first-class timers that
can be registered/deleted independently of state, TTL support, and the
RocksDB state store backend. At 100 TB/day the operational differences
matter: state is per-field (no whole-tuple rewrite per batch), timers
are range-scanned by the store rather than scanned per key, and state
TTL gives GC even when watermarks stall. The golden test pins this
implementation's output to the applyInPandasWithState form — two
engines, one contract.
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

from am_kinesis_pay_spark.streaming.state_machine import (
    EXPIRY_US,
    OUTPUT_SCHEMA,
    _decide,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class PaymentStateProcessor(StatefulProcessor):
    """ValueState (created_us, decided) + one event-time timer at the
    payment deadline. Emission paths mirror payment_state_fn exactly."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState(
            "pay_state", "created_us long, decided boolean"
        )

    def _emit(self, user_id: int, final_state: str, decided_us: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "final_state": [final_state],
                "decided_at": [pd.Timestamp(decided_us, unit="us")],
            }
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        ts_us = int((pdf["ts"].astype("int64") // 1_000).min())
        if self._state.exists():
            created_us, decided = self._state.get()
            created_us = min(int(created_us), ts_us)
        else:
            created_us, decided = ts_us, False

        if decided:
            # exactly-once: terminal transition already fired — late
            # polls only refresh state (kinesis-pay.php:515-518)
            self._state.update((created_us, True))
            return

        result = _decide(pdf, created_us)
        deadline_us = created_us + EXPIRY_US
        if result is not None:
            final_state, decided_us = result
            self._state.update((created_us, True))
            yield self._emit(user_id, final_state, decided_us)
        elif timerValues.getCurrentWatermarkInMs() * 1000 >= deadline_us:
            # watermark already past the deadline: decide expired now —
            # a timer below the watermark would never fire
            self._state.update((created_us, True))
            yield self._emit(user_id, "expired", deadline_us)
        else:
            self._state.update((created_us, False))
            # event-time timer at the deadline (630 s failsafe analog,
            # kinesis-pay.php:264-268); ceil to ms so it never fires
            # before the true deadline
            self._handle.registerTimer((deadline_us + 999) // 1000)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if not self._state.exists():
            return
        created_us, decided = self._state.get()
        self._state.clear()
        if not decided:
            yield self._emit(user_id, "expired", int(created_us) + EXPIRY_US)

    def close(self) -> None:
        pass


def payment_state_machine_tws(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """transformWithStateInPandas wiring: event-time mode, append output.
    Requires the RocksDB state store provider (set
    spark.sql.streaming.stateStore.providerClass to ROCKSDB_PROVIDER
    before starting the query)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=PaymentStateProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventtime",
        )
    )


def tws_available() -> bool:
    """transformWithState's Python worker speaks a protobuf protocol.
    This image ships no pip `protobuf`, but compat.ensure_protobuf()
    can wire in the Cloud SDK's bundled pure-python runtime (canonical
    google/ namespace layout) — see compat.py for the full ordering and
    version-skew story. False only when no runtime exists anywhere, in
    which case the golden test (tests/test_streaming.py) skips."""
    from am_kinesis_pay_spark.compat import ensure_protobuf

    return ensure_protobuf()
