"""Custom Python DataSource (sources/pyds.py): content pinned against
a pure-Python mirror, partition scaling, determinism, and the
batch ≡ stream property the shared generator guarantees."""

from __future__ import annotations

import uuid

from am_kinesis_pay_spark.sources.pyds import (
    MAX_POLLS,
    expected_rows,
    register_kpay_source,
)


def _read_batch(spark, n=50, parts=3):
    register_kpay_source(spark)
    return (
        spark.read.format("kpay_polls")
        .option("num_payments", n)
        .option("partitions", parts)
        .load()
    )


def test_batch_matches_pure_python_mirror(spark):
    got = sorted(tuple(r) for r in _read_batch(spark, 50, 3).collect())
    want = sorted(expected_rows(50))
    assert got == want


def test_partitioning_splits_payment_ranges(spark):
    df = _read_batch(spark, 40, 5)
    assert df.rdd.getNumPartitions() == 5
    # every payment's rows live in exactly one partition (range split)
    per_part = df.rdd.mapPartitions(
        lambda it: [set(r.payment_id for r in it)]
    ).collect()
    seen = set()
    for s in per_part:
        assert not (s & seen)
        seen |= s
    assert seen == set(range(40))


def test_deterministic_across_reads(spark):
    a = sorted(tuple(r) for r in _read_batch(spark, 30, 2).collect())
    b = sorted(tuple(r) for r in _read_batch(spark, 30, 4).collect())
    assert a == b  # partition count must not change content


def test_terminal_rows_are_last_and_unique(spark):
    df = _read_batch(spark, 80, 4)
    rows = [tuple(r) for r in df.collect()]
    by_pid = {}
    for pid, seq, ts, status in rows:
        by_pid.setdefault(pid, []).append((seq, status))
    for pid, seqs in by_pid.items():
        seqs.sort()
        statuses = [s for _, s in seqs]
        terminals = [s for s in statuses if s in ("processed", "rejected")]
        assert len(terminals) <= 1
        if terminals:
            assert statuses[-1] == terminals[0]  # polling stops after it
        else:
            assert len(seqs) == MAX_POLLS  # expired: full failsafe loop
        assert [q for q, _ in seqs] == list(range(len(seqs)))  # gapless


def test_stream_equals_batch(spark):
    register_kpay_source(spark)
    stream = (
        spark.readStream.format("kpay_polls")
        .option("num_payments", 50)
        .option("partitions", 3)
        .option("rounds_per_batch", 16)
        .load()
    )
    name = f"pyds_{uuid.uuid4().hex[:6]}"
    # default trigger + processAllAvailable: latestOffset advances
    # rounds_per_batch per poll, so this drives MULTIPLE micro-batches
    # (availableNow would snapshot the first throttled offset only)
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.table(name).collect())
    want = sorted(expected_rows(50))
    assert got == want
    # and it really was incremental: ceil(63/16) = 4 non-empty batches
    assert q.lastProgress["batchId"] >= 3


def test_stream_checkpoint_recovery_resumes_offsets(spark, tmp_path):
    """Replayable-offset claim made executable: stop the stream after
    the first micro-batches, restart from the checkpoint, and the final
    sink holds every row exactly once — the poll-round offsets resume
    where they stopped instead of re-emitting or skipping."""
    register_kpay_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out_name = f"pydsr_{uuid.uuid4().hex[:6]}"

    def start(query_name):
        stream = (
            spark.readStream.format("kpay_polls")
            .option("num_payments", 40)
            .option("partitions", 2)
            .option("rounds_per_batch", 8)
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .queryName(query_name)
            .start()
        )

    # phase 1: a few micro-batches, then stop mid-stream
    q1 = start(out_name + "_a")
    while (q1.lastProgress or {}).get("batchId", -1) < 2:
        q1.awaitTermination(1)
    q1.stop()

    # phase 2: restart from the checkpoint, drain fully
    q2 = start(out_name + "_b")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("payment_id", "poll_seq", "ts", "status")
        .collect()
    )
    assert got == sorted(expected_rows(40))
