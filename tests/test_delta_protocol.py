"""Delta-protocol table (sources/delta_protocol.py): log replay,
remove semantics, atomic commits, torn-commit recovery, time travel."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from am_kinesis_pay_spark.sources.delta_protocol import DeltaProtocolTable


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows])


def _state(tbl, version=None):
    return sorted((r.k, r.v) for r in tbl.read(version).collect())


def test_create_append_merge_and_time_travel(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("delta_tbl"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a"), (2, "b")]))
    tbl.append(_df(spark, [(3, "c")]))
    # MERGE-style rewrite: drop k=2, add k=4
    tbl.overwrite_where(_df(spark, [(4, "d")]), F.col("k") != 2)

    assert tbl.versions() == [0, 1, 2]
    assert _state(tbl) == [(1, "a"), (3, "c"), (4, "d")]
    # time travel replays a log PREFIX, not a directory listing
    assert _state(tbl, version=0) == [(1, "a"), (2, "b")]
    assert _state(tbl, version=1) == [(1, "a"), (2, "b"), (3, "c")]
    # removed files stay on disk (vacuum is separate) yet are invisible
    on_disk = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert set(tbl.active_files()) < on_disk


def test_staged_files_invisible_until_commit(spark, tmp_path_factory):
    """Atomicity: parquet staged for a version that never commits must
    not reach any reader — the log, not the directory, is the table."""
    path = str(tmp_path_factory.mktemp("delta_torn"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a")]))
    # simulate a crash between staging and commit: data file present,
    # no commit JSON
    orphan = os.path.join(path, "v9-part-00000.parquet")
    _df(spark, [(99, "zz")]).coalesce(1).write.mode("overwrite").parquet(
        orphan + ".dir"
    )
    assert _state(tbl) == [(1, "a")]
    assert tbl.latest_version() == 0
    # the next real commit is unaffected
    tbl.append(_df(spark, [(2, "b")]))
    assert _state(tbl) == [(1, "a"), (2, "b")]


def test_commit_version_conflict_rejected(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("delta_conflict"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="already committed"):
        tbl._commit(0, [{"commitInfo": {"operation": "DUP"}}])


def test_unknown_actions_ignored_and_bad_version_raises(
    spark, tmp_path_factory
):
    path = str(tmp_path_factory.mktemp("delta_fwd"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a")]))
    # forward compatibility: an action kind this reader does not know
    # must not break replay (the spec's reader rule)
    with open(tbl._log_path(1), "w") as fh:
        fh.write(json.dumps({"futureAction": {"x": 1}}) + "\n")
    assert _state(tbl) == [(1, "a")]
    with pytest.raises(FileNotFoundError):
        tbl.read(version=-1)


def test_log_is_json_per_spec_shape(spark, tmp_path_factory):
    """The v0 commit carries protocol + metaData + add actions in the
    spec's field shapes — the structural compatibility claim."""
    path = str(tmp_path_factory.mktemp("delta_shape"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a")]))
    actions = [
        json.loads(line)
        for line in open(tbl._log_path(0))
        if line.strip()
    ]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert "add" in kinds and kinds[-1] == "commitInfo"
    add = next(a["add"] for a in actions if "add" in a)
    assert {"path", "partitionValues", "size", "modificationTime",
            "dataChange"} <= set(add)
    proto = actions[0]["protocol"]
    assert proto["minReaderVersion"] == 1


def test_txn_action_exactly_once(spark, tmp_path_factory):
    """The protocol's txn (appId, version) contract: a redelivered
    micro-batch at or below the recorded high-water mark is a silent
    no-op, distinct appIds track independently — at-least-once
    foreachBatch becomes exactly-once on this table."""
    path = str(tmp_path_factory.mktemp("delta_txn"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a")]))
    assert tbl.append_txn(_df(spark, [(2, "b")]), "etl", 0) is True
    assert tbl.append_txn(_df(spark, [(2, "b")]), "etl", 0) is False  # replay
    assert tbl.append_txn(_df(spark, [(3, "c")]), "etl", 1) is True
    # a lower-or-equal version from the same app never re-applies
    assert tbl.append_txn(_df(spark, [(9, "x")]), "etl", 1) is False
    # a different app has its own watermark
    assert tbl.append_txn(_df(spark, [(4, "d")]), "backfill", 0) is True
    assert _state(tbl) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert tbl.txn_version("etl") == 1 and tbl.txn_version("backfill") == 0


def test_txn_drives_real_stream(spark, tmp_path_factory):
    """End-to-end: a readStream driven through foreachBatch into
    append_txn (epoch_id as txnVersion) lands each file's rows exactly
    once, even when process_batch is replayed manually afterwards."""
    base = str(tmp_path_factory.mktemp("delta_stream"))
    data_dir = os.path.join(base, "data")
    os.makedirs(data_dir)
    for i in range(3):
        _df(spark, [(i * 10 + j, f"r{i}{j}") for j in range(4)]).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(data_dir, f"batch_{i}"))

    tbl = DeltaProtocolTable(spark, os.path.join(base, "table"))
    tbl.create(_df(spark, [(-1, "seed")]))

    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(data_dir, "batch_*"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .option(
            "checkpointLocation", os.path.join(base, "ckpt")
        )
        .foreachBatch(
            lambda df, epoch: tbl.append_txn(df, "stream", epoch)
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n = tbl.read().count()
    assert n == 1 + 12
    # manual replay of an old epoch: no-op
    assert tbl.append_txn(_df(spark, [(999, "dup")]), "stream", 0) is False
    assert tbl.read().count() == n
