"""Exactly-once MERGE upsert under replay (streaming/foreach_sink.py
MergeKeyedSink) — the lakehouse-MERGE contract emulated on parquet:

- last-writer-wins by version, per key
- redelivered epoch (marker present) is a no-op
- crash between snapshot write and marker (marker deleted here) is
  repaired by redelivery without duplicating or losing rows
- a real readStream → foreachBatch run lands the same state as the
  batch-applied merges
"""

from __future__ import annotations

import os

from pyspark.sql import Row

from am_kinesis_pay_spark.streaming.foreach_sink import MergeKeyedSink


def _rows(sink):
    return sorted(
        (r.k, r.val, r.version) for r in sink.read().collect()
    )


def _batch(spark, rows):
    return spark.createDataFrame([Row(k=k, val=v, version=ver) for k, v, ver in rows])


def test_merge_upsert_exactly_once_under_replay(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("merge_sink"))
    sink = MergeKeyedSink(spark, path, key_cols=["k"], version_col="version")

    b1 = _batch(spark, [(1, "a", 10), (2, "b", 10), (2, "b2", 11)])
    sink.process_batch(b1, epoch_id=0)
    # within-batch winner: key 2 keeps its highest-version row
    assert _rows(sink) == [(1, "a", 10), (2, "b2", 11)]

    # redelivery of the SAME epoch: marker short-circuit, state frozen
    sink.process_batch(_batch(spark, [(1, "poison", 99)]), epoch_id=0)
    assert _rows(sink) == [(1, "a", 10), (2, "b2", 11)]

    # epoch 1: update key 1 (newer version wins), stale update to key 2
    # loses (version 5 < 11), key 3 inserts
    b2 = _batch(spark, [(1, "a2", 20), (2, "stale", 5), (3, "c", 7)])
    sink.process_batch(b2, epoch_id=1)
    after_e1 = [(1, "a2", 20), (2, "b2", 11), (3, "c", 7)]
    assert _rows(sink) == after_e1

    # crash between snapshot and marker: delete the marker and redeliver
    os.remove(sink._marker(1))
    assert sink.last_committed_epoch() == 0  # readers still see epoch 0
    sink.process_batch(b2, epoch_id=1)
    assert _rows(sink) == after_e1
    assert sink.committed(1)


def test_merge_sink_streaming_end_to_end(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge_stream")
    src = str(base / "src")
    path = str(base / "table")
    ckpt = str(base / "ckpt")

    # two source files -> (usually) separate micro-batches; availableNow
    # drains them all either way, and MERGE semantics don't depend on
    # the batch boundaries because versions are monotone per key
    _batch(spark, [(1, "a", 10), (2, "b", 10)]).write.mode(
        "append"
    ).parquet(src)
    _batch(spark, [(1, "a2", 20), (3, "c", 7)]).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema("k bigint, val string, version bigint").parquet(src)
    sink = MergeKeyedSink(spark, path, key_cols=["k"], version_col="version")
    q = (
        sink.attach(stream, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(sink) == [(1, "a2", 20), (2, "b", 10), (3, "c", 7)]


def test_additive_rollup_exactly_once_and_torn_snapshot(spark, tmp_path_factory):
    """AdditiveRollupSink: (1) a redelivered epoch must NOT double-count
    — additive merges aren't idempotent, the marker short-circuit is
    correctness; (2) a crash BETWEEN snapshot write and marker (torn
    commit) leaves the previous committed snapshot authoritative and
    the redelivery rebuilds the epoch exactly."""
    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.streaming.foreach_sink import AdditiveRollupSink

    path = str(tmp_path_factory.mktemp("additive_rollup"))
    rows = [
        Row(event_id=i, event_type="a" if i % 2 == 0 else "b", value=float(i))
        for i in range(30)
    ]
    ev = spark.createDataFrame(rows)
    sink = AdditiveRollupSink(spark, path, ["event_type"])

    sink.process_batch(ev.filter(F.col("event_id") % 3 == 0), 0)
    sink.process_batch(ev.filter(F.col("event_id") % 3 == 1), 1)
    sink.process_batch(ev.filter(F.col("event_id") % 3 == 1), 1)  # redelivery
    # torn commit for epoch 2: snapshot lands, marker does not
    delta2 = ev.filter(F.col("event_id") % 3 == 2)
    base = sink.read()
    (
        base.unionByName(
            delta2.groupBy("event_type").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
            )
        )
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_v").cast("decimal(18,2)").alias("sum_v"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "v2"))
    )
    # reader must still see epoch 1 (marker absent => v2 invisible)
    assert sink.last_committed_epoch() == 1
    # redelivery of epoch 2 commits it properly
    sink.process_batch(delta2, 2)
    got = {
        (r.event_type, r.n_events, float(r.sum_v))
        for r in sink.read().collect()
    }
    want = {
        (r.event_type, r.n_events, float(r.sum_v))
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
        )
        .collect()
    }
    assert got == want


def test_additive_rollup_rejects_out_of_order_epoch(spark, tmp_path_factory):
    """ADVICE r5: read() resolves the snapshot as the MAX committed
    epoch, so an UNCOMMITTED epoch applied below the high-water mark
    would fold its delta into an invisible v{earlier}. process_batch
    must fail loudly on that (manual drives only — foreachBatch is
    monotonic), while a redelivered already-committed epoch stays a
    silent no-op."""
    import pytest
    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.streaming.foreach_sink import AdditiveRollupSink

    path = str(tmp_path_factory.mktemp("additive_ooo"))
    ev = spark.createDataFrame(
        [Row(event_id=i, event_type="a", value=float(i)) for i in range(6)]
    )
    sink = AdditiveRollupSink(spark, path, ["event_type"])
    sink.process_batch(ev, 5)
    before = [(r.event_type, r.n_events, float(r.sum_v)) for r in sink.read().collect()]
    # committed epoch below the mark: exactly-once no-op, no error
    sink.process_batch(ev, 5)
    # UNcommitted epoch below the mark: must raise, state unchanged
    with pytest.raises(ValueError, match="out-of-order epoch"):
        sink.process_batch(ev, 3)
    after = [(r.event_type, r.n_events, float(r.sum_v)) for r in sink.read().collect()]
    assert before == after and sink.last_committed_epoch() == 5


def test_additive_rollup_streaming_end_to_end(spark, tmp_path_factory):
    """Real readStream drive of AdditiveRollupSink: two source files
    drained by availableNow, rollup equals the batch GROUP BY of the
    union — and the per-epoch markers make a checkpoint-replayed
    restart a no-op (exactly-once accumulation)."""
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("additive_stream")
    src = str(base / "src")
    path = str(base / "table")
    ckpt = str(base / "ckpt")

    from am_kinesis_pay_spark.streaming.foreach_sink import AdditiveRollupSink

    rows1 = [Row(event_type="a", value=10.0), Row(event_type="b", value=5.5)]
    rows2 = [Row(event_type="a", value=2.25), Row(event_type="a", value=1.0)]
    spark.createDataFrame(rows1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2).write.mode("append").parquet(src)

    stream = spark.readStream.schema("event_type string, value double").parquet(src)
    sink = AdditiveRollupSink(spark, path, ["event_type"])
    q = sink.attach(stream, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)

    want = {
        (r.event_type, r.n_events, float(r.sum_v))
        for r in spark.createDataFrame(rows1 + rows2)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
        )
        .collect()
    }
    got = {
        (r.event_type, r.n_events, float(r.sum_v))
        for r in sink.read().collect()
    }
    assert got == want
    # restart over the same checkpoint: nothing new to process; even if
    # the last epoch were redelivered, the marker makes it a no-op
    q2 = sink.attach(stream, ckpt).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    got2 = {
        (r.event_type, r.n_events, float(r.sum_v))
        for r in sink.read().collect()
    }
    assert got2 == want
