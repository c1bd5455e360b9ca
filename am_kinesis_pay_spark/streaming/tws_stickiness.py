"""Incremental trailing-28-day distinct actives (DAU/MAU stickiness)
on `transformWithStateInPandas` — the streaming production shape of
the batch `events_stickiness_dau_mau` entry (VERDICT r9 #7).

The batch form computes MAU(d) = |{users active in [d-27, d]}| with an
explode-offset equi-join over the full (day, user) distinct frame. A
stream cannot re-scan history per micro-batch, so the incremental
identity is maintained instead: each user's contribution to MAU is
+1 for every spine day their trailing window NEWLY covers. A user
whose active-day set is S covers exactly union([s, s+27] for s in S);
when a batch delivers a first-ever activity on day n for the user, the
processor emits a +1 `mau_delta` changelog row for every day of
[n, n+27] not already covered by S, and one +1 `dau_delta` row for n
itself (first activity of THIS user on THIS day). Summing the
changelog per day then reproduces the batch DAU/MAU exactly:

    MAU(d) = sum(mau_delta where day = d)      -- each (user, d)
    DAU(d) = sum(dau_delta where day = d)      --   covered/active once

State per key is the user's ACTIVE-DAY SET (MapState day -> 1), which
is bounded by the calendar domain, not the stream length — the same
saturating-domain contract the batch entry's (day, user) distinct
frame prices (SCALE.md). Re-delivered events are absorbed by the
set-membership check (at-least-once delivery -> exactly-once deltas),
the property tests/test_streaming.py pins by replaying the table in
arbitrary file splits: the summed changelog must equal the batch
aggregate regardless of how the stream was chopped.

RocksDB state store required (MapState layout: one store entry per
(user, day), so adding a day never rewrites the set).
"""

from __future__ import annotations

import datetime
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

#: trailing window in days, inclusive — MUST match the batch entry
#: (operators/integration.py::_STICK_WINDOW); kept as a literal here so
#: the streaming module has no import-time registry dependency
STICK_WINDOW = 28

OUTPUT_SCHEMA = "day date, dau_delta long, mau_delta long"


class StickinessProcessor(StatefulProcessor):
    """MapState(active day -> 1) per user; emits first-seen DAU deltas
    and newly-covered MAU deltas per batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._days = handle.getMapState("days", "d int", "one int")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        batch_days = sorted(
            {d.toordinal() for d in pdf["d"] if d is not None}
        )
        existing = [k[0] for k in self._days.keys()]
        covered: set[int] = set()
        for e in existing:
            covered.update(range(e, e + STICK_WINDOW))
        out_day, out_dau, out_mau = [], [], []
        seen = set(existing)
        for n in batch_days:
            if n in seen:
                continue  # re-delivered / duplicate day: exactly-once
            seen.add(n)
            self._days.updateValue((n,), (1,))
            out_day.append(n)
            out_dau.append(1)
            out_mau.append(0)
            for d in range(n, n + STICK_WINDOW):
                if d not in covered:
                    covered.add(d)
                    out_day.append(d)
                    out_dau.append(0)
                    out_mau.append(1)
        if out_day:
            yield pd.DataFrame(
                {
                    "day": [
                        datetime.date.fromordinal(d) for d in out_day
                    ],
                    "dau_delta": out_dau,
                    "mau_delta": out_mau,
                }
            )

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:  # pragma: no cover - no timers registered
        return iter(())

    def close(self) -> None:
        pass


def stickiness_tws(events_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas wiring: per-user keyed, append-mode
    delta changelog, no timers. The downstream consumer folds the
    changelog additively (sum per day) — the AdditiveRollupSink shape."""
    return (
        events_stream.select(
            "user_id", F.to_date("ts").alias("d")
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=StickinessProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
