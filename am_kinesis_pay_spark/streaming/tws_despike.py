"""Incremental Hampel despike + LOCF panel maintenance on
``transformWithStateInPandas`` — the streaming production shapes of the
batch ``win_hampel_filter`` / ``win_locf_backfill`` entries
(VERDICT r10 #7).

Both batch entries reduce the event stream to a per-segment DAILY
frame first, then window over that saturating calendar-domain frame.
A stream cannot re-scan history per micro-batch, and a day's value is
never "final" under late data (a late event changes the day's sum,
which changes the rolling median of the NEXT SIX observed days too).
The honest incremental shape is therefore an UPSERT CHANGELOG, not an
append log: each processor keys by segment (event_type), holds the
per-day accumulator map in MapState, and on every micro-batch
recomputes and re-emits exactly the rows whose value changed — tagged
with a per-key monotone ``seq`` so the consumer folds last-writer-wins
per (segment, day). That is the contract a KV/serving sink consumes
(the ``sink_kv_upsert`` shape), and it makes the fold independent of
how the stream was chopped: the LAST upsert for each day was computed
from the complete accumulator, so the folded changelog equals the
one-shot batch query exactly (golden-pinned in
tests/test_streaming.py against ``win_hampel_filter`` /
``win_locf_backfill``).

* ``HampelProcessor``: MapState day -> sum in integer CENTS (exact —
  the batch entry's DECIMAL(18,2) discipline carried into state; all
  rolling-median/MAD order statistics are picked from sorted int
  lists, so Python and the batch plan extract the identical element).
  Per batch it re-emits each dirty day plus the <= 6 FOLLOWING
  observed days (their trailing 7-ROW window contains the dirty row;
  an insertion also shifts exactly those frames).
* ``LocfPanelProcessor``: MapState day -> (sum cents, count) for the
  sparse observation panel. It re-emits dirty days' raw accumulators
  (the mean and its half-up rounding are applied engine-side at fold
  time so no Python float rounding enters the comparison). The
  calendar densification (grid join + last-IGNORE NULLS window) is a
  STATELESS view over this maintained panel — the serving layer's
  job, same decomposition the ``stream_topk_per_window`` golden
  established — reusing the batch entry's own ``_locf_densify``.

State per key is bounded by the calendar domain (one map entry per
observed day), never by stream length. File splits deliver each event
exactly once here; an at-least-once source needs the upstream
``stream_dedup_payment`` dedup first, since day sums (unlike the
stickiness set-membership deltas) are not redelivery-idempotent —
stated here so the contract is explicit.

RocksDB state store required (MapState layout: one store entry per
(segment, day), so accumulating a day never rewrites the map).
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

#: trailing window LENGTH in rows — MUST match the batch entry's
#: rowsBetween(-6, 0) frame (operators/windows.py::win_hampel_filter);
#: module-local literal, pinned by tests/test_streaming.py
HAMPEL_WINDOW = 7

#: 3 sigma * 1.4826 — same literal as operators/windows.py::_HAMPEL_K
HAMPEL_K = 4.4478

#: sparsifying user-panel modulus — mirror of
#: operators/windows.py::_LOCF_MOD, pinned by tests/test_streaming.py
LOCF_MOD = 97

HAMPEL_OUTPUT_SCHEMA = (
    "event_type string, day date, v double, n_window bigint, "
    "rolling_med double, rolling_mad double, is_spike boolean, "
    "despiked double, seq long"
)

LOCF_OUTPUT_SCHEMA = "event_type string, day date, s long, c long, seq long"


def _median_rank(n: int) -> int:
    """0-based TYPE-1 lower-middle rank — floor((n+1)/2) 1-indexed,
    identical to both engines' element_at(array_sort(...), k)."""
    return (n + 1) // 2 - 1


class HampelProcessor(StatefulProcessor):
    """MapState(day -> sum cents) per segment; re-emits the Hampel row
    for every day whose trailing 7-row window changed this batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._acc = handle.getMapState("acc", "d int", "cents long")
        self._seq = handle.getValueState("seq", "s long")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        event_type = key[0]
        pdf = pd.concat(list(rows), ignore_index=True)
        batch = pdf.groupby("d", sort=False)["cents"].sum()
        if batch.empty:
            return
        acc = {k[0]: v[0] for k, v in self._acc.iterator()}
        dirty = set()
        for d, c in batch.items():
            n = d.toordinal()
            acc[n] = acc.get(n, 0) + int(c)
            self._acc.updateValue((n,), (acc[n],))
            dirty.add(n)
        prev = self._seq.get()
        seq = (prev[0] + 1) if prev is not None else 0
        self._seq.update((seq,))
        days = sorted(acc)
        # affected = each dirty day and the <= 6 following observed
        # days (their 7-ROW trailing frames contain the dirty row)
        affected = set()
        for i, d in enumerate(days):
            if d in dirty:
                affected.update(days[i : i + HAMPEL_WINDOW])
        out = {k: [] for k in (
            "day", "v", "n_window", "rolling_med", "rolling_mad",
            "is_spike", "despiked",
        )}
        for i, d in enumerate(days):
            if d not in affected:
                continue
            lo = max(0, i - (HAMPEL_WINDOW - 1))
            window = sorted(acc[x] for x in days[lo : i + 1])
            n = len(window)
            med = window[_median_rank(n)]
            mad = sorted(abs(x - med) for x in window)[_median_rank(n)]
            v = acc[d]
            spike = abs(v - med) / 100.0 > HAMPEL_K * (mad / 100.0)
            out["day"].append(datetime.date.fromordinal(d))
            out["v"].append(v / 100.0)
            out["n_window"].append(n)
            out["rolling_med"].append(med / 100.0)
            out["rolling_mad"].append(mad / 100.0)
            out["is_spike"].append(spike)
            out["despiked"].append((med if spike else v) / 100.0)
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(out["day"]),
                **out,
                "seq": [seq] * len(out["day"]),
            }
        )

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:  # pragma: no cover - no timers registered
        return iter(())

    def close(self) -> None:
        pass


class LocfPanelProcessor(StatefulProcessor):
    """MapState(day -> (sum cents, count)) per segment; re-emits dirty
    days' raw accumulators as upserts (mean + rounding applied at the
    fold, engine-side)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._acc = handle.getMapState("acc", "d int", "s long, c long")
        self._seq = handle.getValueState("seq", "s long")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        event_type = key[0]
        pdf = pd.concat(list(rows), ignore_index=True)
        if pdf.empty:
            return
        grouped = pdf.groupby("d", sort=False)["cents"].agg(["sum", "count"])
        prev = self._seq.get()
        seq = (prev[0] + 1) if prev is not None else 0
        self._seq.update((seq,))
        out_day, out_s, out_c = [], [], []
        for d, row in grouped.iterrows():
            n = d.toordinal()
            cur = self._acc.getValue((n,))
            s = (cur[0] if cur else 0) + int(row["sum"])
            c = (cur[1] if cur else 0) + int(row["count"])
            self._acc.updateValue((n,), (s, c))
            out_day.append(datetime.date.fromordinal(n))
            out_s.append(s)
            out_c.append(c)
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(out_day),
                "day": out_day,
                "s": out_s,
                "c": out_c,
                "seq": [seq] * len(out_day),
            }
        )

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:  # pragma: no cover - no timers registered
        return iter(())

    def close(self) -> None:
        pass


def _cents(col: str = "value"):
    """round(value, 2) in exact integer cents — Spark-side, so the
    processor only ever accumulates longs."""
    return (
        (F.round(col, 2).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )


def hampel_tws(events_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas wiring for the Hampel despiker:
    per-segment keyed, upsert changelog out (fold last-writer-wins by
    seq per (event_type, day))."""
    return (
        events_stream.filter(F.col("value").isNotNull())
        .select("event_type", F.to_date("ts").alias("d"), _cents())
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=HampelProcessor(),
            outputStructType=HAMPEL_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def locf_tws(events_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas wiring for the LOCF observation
    panel: the sparsified user sample, per-segment keyed, upsert
    changelog of raw (sum, count) accumulators."""
    return (
        events_stream.filter(
            F.col("value").isNotNull() & (F.col("user_id") % LOCF_MOD == 0)
        )
        .select("event_type", F.to_date("ts").alias("d"), _cents())
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=LocfPanelProcessor(),
            outputStructType=LOCF_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
