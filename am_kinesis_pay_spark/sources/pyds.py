"""Custom Python data source (Spark 4 DataSource API): the reference's
browser status-poll loop as a first-class Spark source.

The reference generates its event stream with a JS `setInterval` poll
every 10 s carrying a monotone counter, until a terminal status or the
630 s failsafe (~63 polls) ends the loop (kinesis-pay.php:231-236,263,
264-268). `kpay_polls` synthesizes exactly that surface,
deterministically (seeded by payment id — no RNG state), as:

- a BATCH source: the full poll history, split into payment-range
  input partitions (scales out like any scan; no driver materialization
  — each task generates only its payment range), and
- a STREAMING source: micro-batch = a range of poll rounds; offsets
  are just round numbers over a deterministic generator, so any
  [start, end) replays identically — checkpoint recovery is exact and
  batch ≡ stream by construction.

This is the engine's extension-surface demonstration: where the
reference's "custom source" is PHP glue around HTTP polling
(kinesis-pay.php:286-352), ours is ~100 lines against the documented
DataSource API, and the SAME generator serves batch and streaming —
the Structured Streaming unification property.

Schema: payment_id, poll_seq, ts, status — the §1.1 #4 stream shape.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA = "payment_id bigint, poll_seq int, ts timestamp, status string"
POLL_INTERVAL_S = 10  # kinesis-pay.php:263
MAX_POLLS = 63  # 630 s failsafe / 10 s cadence (kinesis-pay.php:264-268)
BASE = datetime(2024, 3, 1, 12, 0, 0)  # naive UTC wall clock (session tz)


def _decision(payment_id: int) -> tuple[str, int]:
    """Deterministic outcome for a payment: (terminal_status,
    terminal_poll_seq). Seeded by id only — any executor, any retry,
    any engine computes the same stream. ~70% processed, ~15% rejected,
    ~15% expired (expired = no terminal before the failsafe)."""
    h = int.from_bytes(
        hashlib.sha256(str(payment_id).encode()).digest()[:8], "big"
    )
    bucket = h % 100
    if bucket < 70:
        return "processed", 1 + (h // 100) % (MAX_POLLS - 1)
    if bucket < 85:
        return "rejected", 1 + (h // 100) % (MAX_POLLS - 1)
    return "expired", MAX_POLLS  # never decided in-loop; loop runs out


def _payment_rows(payment_id: int, lo_seq: int, hi_seq: int):
    """Poll rows for one payment with poll_seq in [lo_seq, hi_seq):
    'pending' until the terminal poll, the terminal status once, then
    the browser stops polling (no further rows)."""
    status, t_seq = _decision(payment_id)
    created = BASE + timedelta(seconds=payment_id % 60)
    last = min(hi_seq, t_seq + 1 if status != "expired" else MAX_POLLS)
    for seq in range(lo_seq, last):
        ts = created + timedelta(seconds=POLL_INTERVAL_S * seq)
        if status != "expired" and seq == t_seq:
            yield (payment_id, seq, ts, status)
        else:
            yield (payment_id, seq, ts, "pending")


class _PaymentRange(InputPartition):
    def __init__(self, lo: int, hi: int, lo_seq: int, hi_seq: int):
        self.lo, self.hi = lo, hi
        self.lo_seq, self.hi_seq = lo_seq, hi_seq


class KPayPollBatchReader(DataSourceReader):
    """Batch reader with REAL filter pushdown (Spark 4.1 DataSource
    ``pushFilters``): range comparisons on ``payment_id`` / ``poll_seq``
    narrow the generator bounds BEFORE partition planning, so filtered
    scans plan fewer/smaller input partitions and never generate the
    excluded rows — the predicate reaches the source exactly the way
    PushedFilters reach a parquet scan. Unsupported filters are
    returned to Spark, which keeps them as a post-scan Filter (the
    documented contract: pushed filters may also still be re-checked
    by Spark, so accepting a filter is an optimization, never a
    correctness hazard)."""

    def __init__(self, options):
        self.n = int(options.get("num_payments", 100))
        self.parts = int(options.get("partitions", 4))
        # half-open pushed-down bounds, narrowed by pushFilters()
        self.pid_lo, self.pid_hi = 0, self.n
        self.seq_lo, self.seq_hi = 0, MAX_POLLS

    def pushFilters(self, filters: list) -> "list[Filter]":
        # eager list, NOT a generator: the bound-narrowing side effects
        # must happen during planning even if the engine never drains
        # the returned iterable
        unsupported = []
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            # Only exact ints are pushable: int(5.5) truncates toward
            # zero, so accepting `payment_id < 5.5` would wrongly set
            # pid_hi=5 and exclude payment_id=5 — and an ACCEPTED filter
            # is not guaranteed to be re-checked post-scan. Non-int
            # literals (floats, bools, strings) go back to Spark.
            if col == "payment_id" and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and type(f.value) is int:
                v = f.value
                if isinstance(f, EqualTo):
                    self.pid_lo = max(self.pid_lo, v)
                    self.pid_hi = min(self.pid_hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.pid_lo = max(self.pid_lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.pid_lo = max(self.pid_lo, v)
                elif isinstance(f, LessThan):
                    self.pid_hi = min(self.pid_hi, v)
                else:
                    self.pid_hi = min(self.pid_hi, v + 1)
            elif col == "poll_seq" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and type(f.value) is int:
                v = f.value
                if isinstance(f, GreaterThan):
                    self.seq_lo = max(self.seq_lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.seq_lo = max(self.seq_lo, v)
                elif isinstance(f, LessThan):
                    self.seq_hi = min(self.seq_hi, v)
                else:
                    self.seq_hi = min(self.seq_hi, v + 1)
            else:
                unsupported.append(f)  # Spark keeps it as a post-scan Filter
        return unsupported

    def partitions(self) -> Sequence[InputPartition]:
        lo_p, hi_p = self.pid_lo, max(self.pid_lo, self.pid_hi)
        span = hi_p - lo_p
        if span <= 0:
            return [_PaymentRange(0, 0, 0, 0)]  # pruned to nothing
        step = max(1, (span + self.parts - 1) // self.parts)
        return [
            _PaymentRange(
                lo, min(lo + step, hi_p), self.seq_lo, self.seq_hi
            )
            for lo in range(lo_p, hi_p, step)
        ]

    def read(self, partition: _PaymentRange) -> Iterator[tuple]:
        for pid in range(partition.lo, partition.hi):
            yield from _payment_rows(pid, partition.lo_seq, partition.hi_seq)


class KPayPollStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch = a range of poll rounds; the offset dict is just
    {'seq': next_round}. SimpleDataSourceStreamReader is the right
    restart contract for a source whose availability is generator-
    driven: ``read(start)`` receives the AUTHORITATIVE checkpointed
    offset every batch and returns (rows, next_offset), so a restarted
    query resumes exactly where the checkpoint says — there is no
    reader-side offset counter to regress (the full
    DataSourceStreamReader's ``latestOffset`` has no view of the
    checkpoint and can replan backwards after restart; observed as
    duplicate rounds before this switch). ``readBetweenOffsets``
    serves replay of in-flight batches deterministically. Trade-off:
    rows for a fresh batch surface via the driver (Spark prefetches) —
    right-sized for a 10 s-cadence poll relay; the executor-parallel
    partitioned path is the batch reader above."""

    def __init__(self, options):
        self.n = int(options.get("num_payments", 100))
        self.rounds_per_batch = int(options.get("rounds_per_batch", 8))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _rows(self, lo_seq: int, hi_seq: int) -> Iterator[tuple]:
        # materialized list iterator, not a generator: Spark's prefetch
        # cache copy.copy()s the iterator for replay between read() and
        # commit() (datasource_internal caching), and generators don't
        # copy. Bounded by rounds_per_batch x payments per batch.
        out = []
        for pid in range(self.n):
            out.extend(_payment_rows(pid, lo_seq, hi_seq))
        return iter(out)

    def read(self, start: dict):
        lo = start["seq"]
        hi = min(MAX_POLLS, lo + self.rounds_per_batch)
        return self._rows(lo, hi), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(start["seq"], end["seq"])

    def commit(self, end: dict) -> None:
        pass


class KPayPollDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kpay_polls"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return KPayPollBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return KPayPollStreamReader(self.options)


def register_kpay_source(spark) -> None:
    """Idempotent registration of the custom source. Also enables
    Python-source filter pushdown at RUNTIME (session conf, settable
    mid-session like tables.load's nanosAsLong): a reader that
    implements pushFilters() hard-errors on any scan while the conf is
    false, and the external driver builds a vanilla session that would
    otherwise not carry it."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KPayPollDataSource)


def expected_rows(num_payments: int) -> list[tuple]:
    """Pure-Python mirror of the full batch output — the test oracle
    (no Spark involved)."""
    out = []
    for pid in range(num_payments):
        out.extend(_payment_rows(pid, 0, MAX_POLLS))
    return out
