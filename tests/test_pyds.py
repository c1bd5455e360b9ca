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


def test_custom_source_drives_state_machine_end_to_end(spark):
    """Full pipeline composition: the custom Python source streams poll
    rounds → the applyInPandasWithState payment state machine decides
    terminals → decisions must equal the generator's own deterministic
    outcome table. Source, stateful operator, and oracle never share
    code paths (generator tuples vs Arrow state machine), so agreement
    pins the whole chain."""
    from am_kinesis_pay_spark.sources.pyds import _decision
    from am_kinesis_pay_spark.streaming.runner import run_to_completion
    from am_kinesis_pay_spark.streaming.state_machine import (
        payment_state_machine,
    )
    from pyspark.sql import functions as F

    register_kpay_source(spark)
    n = 60
    polls = (
        spark.readStream.format("kpay_polls")
        .option("num_payments", n)
        .option("rounds_per_batch", 16)
        .load()
    )
    # adapt the poll schema to the state machine's event contract:
    # processed/rejected are the terminal events, pending polls are
    # neutral 'view' events that only establish creation time
    events = polls.select(
        F.col("payment_id").alias("user_id"),
        F.col("ts"),
        F.when(F.col("status") == "processed", "purchase")
        .when(F.col("status") == "rejected", "error")
        .otherwise("view")
        .alias("event_type"),
    )
    out = run_to_completion(
        payment_state_machine(events, watermark="1 minute"),
        f"pydssm_{uuid.uuid4().hex[:6]}",
        "append",
    )
    got = {r.user_id: r.final_state for r in out.collect()}

    want = {}
    for pid in range(n):
        status, t_seq = _decision(pid)
        # a terminal poll within the 10-min deadline (60 rounds at
        # 10 s) decides; later terminals leave the payment to expire
        if status != "expired" and t_seq * 10 <= 600:
            want[pid] = "processed" if status == "processed" else "rejected"
        else:
            want[pid] = "expired"
    # every decided payment must match; expiries need the watermark to
    # pass their deadline — the last poll round plus slack covers most
    decided = {k: v for k, v in got.items()}
    for pid, state in decided.items():
        assert state == want[pid], (pid, state, want[pid])
    terminal_pids = {p for p, wv in want.items() if wv != "expired"}
    assert terminal_pids <= set(got), "all in-deadline terminals must emit"


def test_pyds_writer_abort_leaves_target_invisible(spark, tmp_path):
    """The custom writer's two-phase commit: a job that fails mid-write
    must leave NO manifest and NO committed part files — readers see
    the sink exactly as before the attempt (here: nonexistent). Then a
    successful append on the same path commits atomically, and a second
    append MERGES into the manifest instead of clobbering it."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.sources.pyds_writer import (
        read_committed,
        register_audit_sink,
    )

    register_audit_sink(spark)
    out = str(tmp_path / "audit_sink")

    ok = spark.range(10).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 7).alias("user_id"),
        F.lit("user-***0").alias("masked_user"),
        F.lit("request").alias("log_kind"),
    )

    # failing job: a row-level exception inside the task
    @F.udf("long")
    def boom(v):
        raise RuntimeError("injected task failure")

    bad = ok.withColumn("user_id", boom("event_id"))
    with pytest.raises(Exception):
        bad.write.format("kpay_audit").option("path", out).mode("append").save()
    assert not os.path.exists(os.path.join(out, "_manifest.json"))
    assert not any(
        f.startswith("part-") for f in os.listdir(out)
    ) if os.path.exists(out) else True

    # successful append: manifest + parts land, read-back is exact
    ok.write.format("kpay_audit").option("path", out).mode("append").save()
    got = read_committed(spark, out)
    assert sorted(r.event_id for r in got.collect()) == list(range(10))

    # second append merges manifests (no clobber)
    ok.withColumn("event_id", F.col("event_id") + 100).write.format(
        "kpay_audit"
    ).option("path", out).mode("append").save()
    with open(os.path.join(out, "_manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest["n_rows"] == 20
    got2 = read_committed(spark, out)
    assert got2.count() == 20
    assert sorted(r.event_id for r in got2.collect()) == list(range(10)) + [
        i + 100 for i in range(10)
    ]


def test_pyds_stream_writer_epoch_manifests_and_idempotence(spark, tmp_path):
    """The custom STREAMING writer publishes one manifest per epoch,
    the union of manifests equals the batch projection exactly, and a
    redelivered epoch (simulated by re-invoking commit with re-staged
    files) publishes nothing twice — the txnVersion-style idempotence
    that makes the sink exactly-once under micro-batch replay."""
    import json
    import os
    import uuid as _uuid

    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.sources.pyds_writer import (
        AuditLogStreamWriter,
        _StagedFile,
        read_stream_committed,
        register_audit_stream_sink,
    )
    from am_kinesis_pay_spark.streaming.runner import (
        events_stream,
        stage_stream_dir,
    )
    from am_kinesis_pay_spark.tables import load

    from tests.conftest import SF_DIR

    register_audit_stream_sink(spark)
    stream_src = stage_stream_dir(
        spark, SF_DIR, n_files=4, base_dir=str(tmp_path / "src")
    )
    out = str(tmp_path / "stream_sink")

    masked = F.concat(
        F.lit("user-***"), (F.col("user_id") % 10).cast("string")
    ).alias("masked_user")
    stream = (
        events_stream(spark, stream_src)
        .filter(F.col("event_id") % 20 == 0)
        .select(
            "event_id", "user_id", masked, F.lit("request").alias("log_kind")
        )
    )
    q = (
        stream.writeStream.format("kpay_audit_stream")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    manifests = sorted(
        f for f in os.listdir(out) if f.startswith("epoch-") and f.endswith(".json")
    )
    assert len(manifests) >= 2  # one per non-empty micro-batch

    got = read_stream_committed(spark, out)
    want = (
        load(spark, SF_DIR, "events")
        .filter(F.col("event_id") % 20 == 0)
        .select("event_id")
    )
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in want.collect()
    )

    # redelivery: re-commit an already-published epoch with fresh staged
    # files — nothing may be published twice, stragglers are cleaned up
    epoch0 = int(manifests[0].split("-")[1].split(".")[0])
    before = json.load(open(os.path.join(out, manifests[0])))
    staging = os.path.join(out, "_staging")
    os.makedirs(staging, exist_ok=True)
    stray = os.path.join(staging, f"task-{_uuid.uuid4().hex}.jsonl")
    with open(stray, "w") as fh:
        fh.write('{"event_id": 1}\n')
    writer = AuditLogStreamWriter({"path": out}, False)
    writer.commit([_StagedFile(staged=stray, n_rows=1)], epoch0)
    after = json.load(open(os.path.join(out, manifests[0])))
    assert after == before  # manifest unchanged
    assert not os.path.exists(stray)  # re-staged file discarded
    assert read_stream_committed(spark, out).count() == got.count()

    # torn manifest (crash mid-write, pre-atomic-replace artifact): must
    # read as NOT committed, so the redelivered epoch publishes its rows
    # instead of silently dropping them
    torn_epoch = epoch0 + 7777
    torn_path = os.path.join(out, f"epoch-{torn_epoch:010d}.json")
    with open(torn_path, "w") as fh:
        fh.write('{"files": ["trunca')  # truncated JSON
    restaged = os.path.join(staging, f"task-{_uuid.uuid4().hex}.jsonl")
    with open(restaged, "w") as fh:
        fh.write(
            '{"event_id": 999991, "user_id": 1, '
            '"masked_user": "user-***1", "log_kind": "request"}\n'
        )
    writer.commit([_StagedFile(staged=restaged, n_rows=1)], torn_epoch)
    recovered = json.load(open(torn_path))  # now a complete manifest
    assert recovered["n_rows"] == 1
    assert read_stream_committed(spark, out).count() == got.count() + 1
    # no temp artifacts linger from the atomic publishes
    assert not any(".tmp-" in f for f in os.listdir(out))


def test_pyds_writer_overwrite_uses_fresh_names_and_gcs_old(spark, tmp_path):
    """Each commit names its data files with a fresh commit id, so an
    overwrite never renames new bytes onto names a live manifest still
    references (a crash or concurrent reader mid-commit can't see torn
    state), and the previous commit's files are GC'd only after the new
    manifest is live."""
    import json
    import os

    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.sources.pyds_writer import (
        read_committed,
        register_audit_sink,
    )

    register_audit_sink(spark)
    out = str(tmp_path / "audit_sink_ow")

    def mk(base):
        return spark.range(5).select(
            (F.col("id") + base).alias("event_id"),
            F.col("id").alias("user_id"),
            F.lit("user-***0").alias("masked_user"),
            F.lit("request").alias("log_kind"),
        )

    mk(0).write.format("kpay_audit").option("path", out).mode("append").save()
    with open(os.path.join(out, "_manifest.json")) as fh:
        first_files = set(json.load(fh)["files"])
    assert first_files

    mk(1000).coalesce(1).write.format("kpay_audit").option("path", out).mode(
        "overwrite"
    ).save()
    with open(os.path.join(out, "_manifest.json")) as fh:
        second = json.load(fh)
    # fresh names: zero overlap with the files the old manifest named
    assert not (set(second["files"]) & first_files)
    # old commit's files are gone (post-publish GC), no temp artifacts
    listing = set(os.listdir(out))
    assert not (first_files & listing)
    assert not any(".tmp-" in f for f in listing)
    got = sorted(r.event_id for r in read_committed(spark, out).collect())
    assert got == [1000 + i for i in range(5)]


def test_pyds_filter_pushdown_prunes_generation(spark):
    """pushFilters must actually narrow the reader (bounds, partition
    spans, generated rows) — and the end-to-end Spark result must equal
    the pure-Python mirror under the same predicate, whether or not the
    engine re-checks pushed filters post-scan."""
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        LessThan,
        StringStartsWith,
    )

    from am_kinesis_pay_spark.sources.pyds import (
        KPayPollBatchReader,
        expected_rows,
        register_kpay_source,
    )

    r = KPayPollBatchReader({"num_payments": "100", "partitions": "4"})
    rest = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("payment_id",), 40),
                LessThan(("payment_id",), 60),
                LessThan(("poll_seq",), 5),
                StringStartsWith(("status",), "pro"),
            ]
        )
    )
    # only the un-pushable filter comes back to Spark
    assert [type(f).__name__ for f in rest] == ["StringStartsWith"]
    parts = r.partitions()
    assert parts and all(p.lo >= 40 and p.hi <= 60 for p in parts)
    assert all(p.lo_seq == 0 and p.hi_seq == 5 for p in parts)
    rows = [row for p in parts for row in r.read(p)]
    assert rows
    assert all(40 <= row[0] < 60 and row[1] < 5 for row in rows)

    # contradiction prunes to nothing without crashing the planner
    r2 = KPayPollBatchReader({"num_payments": "100", "partitions": "4"})
    r2.pushFilters(
        [GreaterThanOrEqual(("payment_id",), 90), LessThan(("payment_id",), 10)]
    )
    assert sum(1 for p in r2.partitions() for _ in r2.read(p)) == 0

    # end-to-end through the engine: same rows as the python mirror
    register_kpay_source(spark)
    df = (
        spark.read.format("kpay_polls")
        .option("num_payments", 100)
        .load()
        .filter("payment_id >= 40 and payment_id < 60 and poll_seq < 5")
    )
    got = sorted((r.payment_id, r.poll_seq, r.status) for r in df.collect())
    want = sorted(
        (pid, seq, st)
        for (pid, seq, _ts, st) in expected_rows(100)
        if 40 <= pid < 60 and seq < 5
    )
    assert got == want


def test_pyds_pushdown_rejects_non_int_literals():
    """int(5.5) truncates toward zero, so accepting `payment_id < 5.5`
    would set pid_hi=5 and wrongly drop payment_id=5 — and an accepted
    filter is not guaranteed to be re-checked post-scan. Non-exact-int
    literals (floats, bools) must come back as unsupported with the
    reader bounds untouched."""
    from pyspark.sql.datasource import EqualTo, LessThan

    from am_kinesis_pay_spark.sources.pyds import KPayPollBatchReader

    r = KPayPollBatchReader({"num_payments": "100", "partitions": "4"})
    rest = list(
        r.pushFilters(
            [
                LessThan(("payment_id",), 5.5),
                EqualTo(("payment_id",), True),
                LessThan(("poll_seq",), 2.0),
            ]
        )
    )
    assert len(rest) == 3  # all returned to Spark for post-scan eval
    assert (r.pid_lo, r.pid_hi) == (0, 100)
    assert (r.seq_lo, r.seq_hi) == (0, r.seq_hi) and r.seq_lo == 0

    # exact ints still push
    r.pushFilters([LessThan(("payment_id",), 5)])
    assert r.pid_hi == 5
