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


def test_checkpoint_read_equivalence(spark, tmp_path_factory):
    """Checkpoints (PROTOCOL.md log compaction): after the interval
    fires, a fresh reader seeds from {v:020d}.checkpoint.parquet and
    replays ONLY the JSON suffix, and the state it sees is
    action-for-action identical to a full JSON replay; time travel to
    a pre-checkpoint version falls back to full replay and stays
    exact."""
    path = str(tmp_path_factory.mktemp("delta_ckpt"))
    tbl = DeltaProtocolTable(spark, path, checkpoint_interval=5)
    tbl.create(_df(spark, [(0, "v0")]))
    tbl.append_txn(_df(spark, [(1, "v1")]), "etl", 7)
    for i in range(2, 12):
        tbl.append(_df(spark, [(i, f"v{i}")]))
    # interval 5 → checkpoints fired at v5 and v10; v5's parquet was
    # superseded and unlinked, the pointer names v10
    assert os.path.exists(tbl._ckpt_path(10))
    assert not os.path.exists(tbl._ckpt_path(5))
    assert tbl._read_last_checkpoint() == 10

    fresh = DeltaProtocolTable(spark, path)
    state = _state(fresh)
    assert fresh.last_read_used_checkpoint is True
    assert fresh.last_read_json_commits == 1  # only v11 replayed as JSON
    # bit-equivalence vs a full JSON replay (checkpoint pointer hidden)
    full = DeltaProtocolTable(spark, path)
    full._read_last_checkpoint = lambda: None
    assert _state(full) == state == [(i, f"v{i}") for i in range(12)]
    assert full.last_read_used_checkpoint is False
    # txn high-water marks survive checkpointing
    assert fresh.txn_version("etl") == 7
    # pre-checkpoint time travel: full replay fallback, still exact
    assert _state(fresh, version=3) == [(i, f"v{i}") for i in range(4)]
    assert fresh.last_read_used_checkpoint is False


def test_commit_put_if_absent_single_winner(spark, tmp_path_factory):
    """Two writers racing the SAME version: os.link put-if-absent lets
    exactly one commit land, and the loser's bytes never replace the
    winner's (ADVICE r6: the committed version must point at the
    winner's actions)."""
    from am_kinesis_pay_spark.sources.delta_protocol import (
        DeltaConcurrentCommitError,
    )

    path = str(tmp_path_factory.mktemp("delta_race"))
    w1 = DeltaProtocolTable(spark, path)
    w1.create(_df(spark, [(1, "a")]))
    w2 = DeltaProtocolTable(spark, path)
    w1._commit(1, [{"commitInfo": {"operation": "W1"}}])
    with pytest.raises(DeltaConcurrentCommitError, match="already committed"):
        w2._commit(1, [{"commitInfo": {"operation": "W2"}}])
    committed = [json.loads(x) for x in open(w1._log_path(1)) if x.strip()]
    assert committed == [{"commitInfo": {"operation": "W1"}}]


def test_append_rebases_after_lost_race(spark, tmp_path_factory):
    """A writer whose view of the latest version is STALE (another
    writer committed in between) must rebase: retry at the true next
    version instead of failing or clobbering."""
    path = str(tmp_path_factory.mktemp("delta_rebase"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a")]))
    other = DeltaProtocolTable(spark, path)
    other.append(_df(spark, [(2, "b")]))  # the concurrent winner: v1

    real = tbl.latest_version
    calls = {"n": 0}

    def stale_once():
        calls["n"] += 1
        return 0 if calls["n"] == 1 else real()

    tbl.latest_version = stale_once
    v = tbl.append(_df(spark, [(3, "c")]))  # first attempt targets v1: lost
    assert v == 2 and calls["n"] >= 2
    assert _state(tbl) == [(1, "a"), (2, "b"), (3, "c")]


def test_overwrite_rebases_on_full_state(spark, tmp_path_factory):
    """overwrite_where does not commute: on a lost race it must re-read
    the CURRENT state (including the concurrent append) and re-apply
    its predicate, so the rebased rewrite covers the racer's rows."""
    path = str(tmp_path_factory.mktemp("delta_rw_rebase"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a"), (2, "b")]))

    real_latest = tbl.latest_version
    injected = {"done": False}

    def racing_latest():
        v = real_latest()
        if not injected["done"]:
            injected["done"] = True
            # a racer appends AFTER this writer read its base version
            DeltaProtocolTable(tbl.spark, tbl.path).append(
                _df(tbl.spark, [(3, "c")])
            )
        return v

    tbl.latest_version = racing_latest
    tbl.overwrite_where(_df(spark, [(4, "d")]), F.col("k") != 2)
    # rebase re-read state INCLUDING the racer's (3, "c")
    assert _state(tbl) == [(1, "a"), (3, "c"), (4, "d")]


def test_concurrent_writer_threads(spark, tmp_path_factory):
    """Torture: two threads interleave 4 appends each against one
    table path; every commit must land (no lost updates), versions are
    gap-free, and every appended row survives."""
    import threading

    path = str(tmp_path_factory.mktemp("delta_threads"))
    DeltaProtocolTable(spark, path).create(_df(spark, [(0, "seed")]))
    barrier = threading.Barrier(2)
    errs = []

    def work(writer_id):
        try:
            w = DeltaProtocolTable(spark, path)
            barrier.wait()
            for i in range(4):
                w.append(_df(spark, [(writer_id * 100 + i, f"w{writer_id}")]))
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    ts = [threading.Thread(target=work, args=(w,)) for w in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    tbl = DeltaProtocolTable(spark, path)
    assert tbl.versions() == list(range(9))  # seed + 8 appends, gap-free
    ks = sorted(r.k for r in tbl.read().collect())
    assert ks == [0] + [100 + i for i in range(4)] + [200 + i for i in range(4)]


def test_vacuum_bounds_disk_and_keeps_retained_versions(
    spark, tmp_path_factory
):
    """vacuum(retention_versions=N): files referenced only by versions
    older than the retention window — plus orphans from aborted
    stagings — are deleted; reads within the window stay exact, and the
    table dir stays bounded under repeated overwrite churn."""
    path = str(tmp_path_factory.mktemp("delta_vacuum"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(1, "a"), (2, "b")]))
    for i in range(3, 7):  # 4 full REPLACE rewrites: old files pile up
        tbl.overwrite_where(_df(spark, [(i, f"r{i}")]), F.col("k") < 0)
    # an aborted staging orphan: never referenced by any commit
    orphan = os.path.join(path, "part-deadbeefdead-ab-00000.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"PAR1junkPAR1")

    latest = tbl.latest_version()
    before = {f for f in os.listdir(path) if f.endswith(".parquet")}
    keep = set(tbl.active_files(latest)) | set(tbl.active_files(latest - 1))
    assert keep < before  # churn really left garbage behind

    deleted = tbl.vacuum(retention_versions=2, min_age_s=0)
    after = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert after == keep
    assert "part-deadbeefdead-ab-00000.parquet" in deleted
    # reads within the retention window still exact
    assert _state(tbl, version=latest) == [(6, "r6")]
    assert _state(tbl, version=latest - 1) == [(5, "r5")]
    # the DEFAULT min_age_s guard spares just-written files — a live
    # concurrent writer's staged bytes are safe unless explicitly aged
    tbl.append(_df(spark, [(99, "young")]))
    assert tbl.vacuum(retention_versions=1) == []


def test_add_action_stats_and_file_skipping(spark, tmp_path_factory):
    """add actions carry the spec's stats JSON (numRecords +
    minValues/maxValues for stats_cols); files_where prunes exactly
    the files whose recorded range cannot intersect, and a file
    WITHOUT stats is scanned conservatively."""
    path = str(tmp_path_factory.mktemp("delta_stats"))
    tbl = DeltaProtocolTable(spark, path, stats_cols=("v",))
    tbl.create(_df(spark, [(1, "a"), (2, "b")]).selectExpr(
        "k", "CAST(k * 10 AS DOUBLE) AS v").coalesce(1))
    tbl.append(_df(spark, [(5, "e"), (6, "f")]).selectExpr(
        "k", "CAST(k * 10 AS DOUBLE) AS v").coalesce(1))
    state = tbl._replay_state()
    stats = [json.loads(a["stats"]) for a in state["adds"].values()]
    assert all(s["numRecords"] == 2 for s in stats)
    assert sorted(s["minValues"]["v"] for s in stats) == [10.0, 50.0]
    assert sorted(s["maxValues"]["v"] for s in stats) == [20.0, 60.0]

    keep, total = tbl.files_where("v", lo=45.0)
    assert total == 2 and len(keep) == 1  # [10,20] pruned, [50,60] kept
    df, scanned, tot = tbl.read_where("v", lo=45.0)
    assert (scanned, tot) == (1, 2)
    assert sorted(r.k for r in df.collect()) == [5, 6]
    # boundary: lo exactly at a file max -> the file must be scanned
    keep, _ = tbl.files_where("v", lo=20.0)
    assert len(keep) == 2
    # a stats-less writer's file is never pruned
    blind = DeltaProtocolTable(spark, path)  # stats_cols=()
    blind.append(_df(spark, [(9, "z")]).selectExpr(
        "k", "CAST(90.0 AS DOUBLE) AS v").coalesce(1))
    keep, total = tbl.files_where("v", hi=0.0)  # intersects nothing
    assert total == 3
    assert len(keep) == 1  # only the stats-less file survives (conservative)


@pytest.mark.parametrize("seed", [3, 11])
def test_model_based_random_ops(spark, tmp_path_factory, seed):
    """Model-based check: a deterministic pseudo-random interleaving of
    append / overwrite_where / append_txn (with replays) / vacuum must
    keep the table bit-equal to a trivial in-memory model at EVERY
    committed version still inside the vacuum retention window — the
    differential-fuzz strategy applied to the transaction log."""
    path = str(tmp_path_factory.mktemp(f"delta_model_{seed}"))
    tbl = DeltaProtocolTable(spark, path, checkpoint_interval=4)
    model: dict[int, str] = {0: "seed"}
    tbl.create(_df(spark, [(0, "seed")]))
    history = {0: dict(model)}
    txn_hw: dict[str, int] = {}
    vacuumed_before = -1  # versions <= this may have lost files
    next_k = 1
    x = seed
    for step in range(12):
        x = (x * 1103515245 + 12345) % (1 << 31)
        op = x % 4
        if op == 0:  # append 1-3 fresh rows
            n = 1 + x % 3
            rows = [(next_k + i, f"a{step}") for i in range(n)]
            next_k += n
            v = tbl.append(_df(spark, rows))
            model.update({k: s for k, s in rows})
        elif op == 1:  # copy-on-write delete + insert
            m, r = 2 + x % 3, x % 2
            rows = [(next_k, f"o{step}")]
            next_k += 1
            v = tbl.overwrite_where(
                _df(spark, rows), (F.col("k") % m) != r
            )
            model = {k: s for k, s in model.items() if k % m != r}
            model.update({k: s for k, s in rows})
        elif op == 2:  # txn append, sometimes a REPLAY of an old epoch
            app = f"app{x % 2}"
            ver = (x // 7) % 4
            rows = [(next_k, f"t{step}")]
            applied = tbl.append_txn(_df(spark, rows), app, ver)
            should = txn_hw.get(app) is None or ver > txn_hw[app]
            assert applied is should
            if should:
                next_k += 1
                txn_hw[app] = ver
                model.update({k: s for k, s in rows})
            v = tbl.latest_version()
        else:  # vacuum: retained time travel must keep working
            tbl.vacuum(retention_versions=3, min_age_s=0)
            v = tbl.latest_version()
            vacuumed_before = max(vacuumed_before, v - 3)
        history[tbl.latest_version()] = dict(model)

    assert dict(_state(tbl)) == model
    for v, snap in history.items():
        if v > vacuumed_before:
            assert dict(_state(tbl, version=v)) == snap, f"version {v}"


def test_txn_single_snapshot_closes_toctou(spark, tmp_path_factory):
    """ADVICE r7 regression: a rival committing the SAME (appId,
    version) while this writer is staging must turn the call into a
    no-op, never a double-commit. The old form read the txn high-water
    mark and the commit version from two separate log listings with
    the slow _stage between them, so the rival's commit fell in the
    gap — invisible to the dedup check, yet not colliding on the
    version file. The single-snapshot derivation makes the rival's
    commit collide at max(snapshot)+1, forcing a retry that SEES the
    rival's txn action."""
    path = str(tmp_path_factory.mktemp("delta_toctou"))
    tbl = DeltaProtocolTable(spark, path)
    tbl.create(_df(spark, [(0, "seed")]))
    rival = DeltaProtocolTable(spark, path)

    real_stage = tbl._stage
    fired = {"done": False}

    def stage_with_rival(df):
        adds = real_stage(df)
        if not fired["done"]:
            fired["done"] = True
            # the rival redelivers the SAME epoch first and wins
            rival.append_txn(_df(spark, [(1, "rival")]), "etl", 5)
        return adds

    tbl._stage = stage_with_rival
    committed = tbl.append_txn(_df(spark, [(2, "dupe")]), "etl", 5)
    assert committed is False  # exactly-once: the rival's batch stands
    assert _state(tbl) == [(0, "seed"), (1, "rival")]
    assert tbl.txn_version("etl") == 5


def test_checkpoint_parquet_is_spec_shaped(spark, tmp_path_factory):
    """ADVICE r7: the checkpoint parquet must use PROTOCOL.md's
    per-action STRUCT columns (protocol/metaData/txn/add/remove),
    exactly one non-null per row — the shape a real delta-spark /
    delta-rs reader consumes — not a private flattened layout. Read it
    back with plain spark.read.parquet to prove a standard reader can."""
    path = str(tmp_path_factory.mktemp("delta_ckpt_shape"))
    tbl = DeltaProtocolTable(spark, path, checkpoint_interval=5)
    tbl.create(_df(spark, [(0, "v0")]))
    tbl.append_txn(_df(spark, [(1, "v1")]), "etl", 7)
    for i in range(2, 6):
        tbl.append(_df(spark, [(i, f"v{i}")]))
    ckpt = tbl._ckpt_path(5)
    assert os.path.exists(ckpt)

    df = spark.read.parquet(ckpt)
    assert set(df.columns) == {"protocol", "metaData", "txn", "add",
                               "remove"}
    add_fields = {f.name for f in df.schema["add"].dataType.fields}
    assert add_fields == {"path", "partitionValues", "size",
                          "modificationTime", "dataChange", "stats"}
    meta_fields = {f.name for f in df.schema["metaData"].dataType.fields}
    assert {"id", "format", "schemaString", "partitionColumns",
            "configuration"} <= meta_fields
    rows = df.collect()
    for r in rows:
        non_null = [c for c in df.columns if r[c] is not None]
        assert len(non_null) == 1, f"checkpoint row not single-action: {r}"
    adds = sorted(r["add"]["path"] for r in rows if r["add"] is not None)
    assert adds == tbl.active_files(5)
    txns = [(r["txn"]["appId"], r["txn"]["version"])
            for r in rows if r["txn"] is not None]
    assert txns == [("etl", 7)]
    meta = next(r["metaData"] for r in rows if r["metaData"] is not None)
    json.loads(meta["schemaString"])  # spec: a JSON-serialized schema
    # and the module's own reader seeds from these same struct columns
    fresh = DeltaProtocolTable(spark, path)
    assert _state(fresh) == [(i, f"v{i}") for i in range(6)]
    assert fresh.last_read_used_checkpoint is True


def test_checkpoint_self_heal_after_lost_checkpoint(spark):
    """ADVICE r7: _commit deliberately swallows checkpoint-write
    failures (a failed optimization must not fail a durable commit),
    and the fixture's version guard never rebuilds a complete log — so
    a lost checkpoint (transient disk failure) must be REPAIRED by the
    next build, not leave source_delta_checkpoint failing forever."""
    import shutil

    from am_kinesis_pay_spark.sources.delta_protocol import (
        _build_checkpointed_table,
    )
    from tests.conftest import SF_DIR

    tbl = _build_checkpointed_table(spark, SF_DIR)
    assert tbl._read_last_checkpoint() == 10
    # simulate the swallowed failure: checkpoint + pointer vanish, the
    # 12-commit JSON log stays complete
    os.unlink(tbl._ckpt_path(10))
    os.unlink(os.path.join(tbl.log_dir, "_last_checkpoint"))
    assert tbl._read_last_checkpoint() is None

    healed = _build_checkpointed_table(spark, SF_DIR)
    assert healed._read_last_checkpoint() == 10
    assert shutil.os.path.exists(healed._ckpt_path(10))
    healed.read()
    assert healed.last_read_used_checkpoint is True


def _commit_race_worker(path, writer_id, n_versions, q):
    """Child-process body for the cross-process put-if-absent race
    (module-level so multiprocessing can pickle it). _commit is pure
    file ops — no SparkSession crosses the fork."""
    from am_kinesis_pay_spark.sources.delta_protocol import (
        DeltaConcurrentCommitError,
        DeltaProtocolTable,
    )

    tbl = DeltaProtocolTable(None, path, checkpoint_interval=None)
    wins = []
    for v in range(1, n_versions + 1):
        try:
            tbl._commit(
                v,
                [{"commitInfo": {"operation": f"writer{writer_id}",
                                 "raceVersion": v}}],
            )
            wins.append(v)
        except DeltaConcurrentCommitError:
            pass
    q.put((writer_id, wins))


def test_commit_cross_process_single_winner(tmp_path_factory):
    """VERDICT r7 #5: the r7 optimistic-concurrency pin was in-process
    threads; the original ADVICE race was CROSS-PROCESS. Two writer
    PROCESSES race _commit over 40 versions of one table: os.link
    put-if-absent must make exactly one winner per version (no lost
    commits, no double-commits), and each committed file's bytes must
    be exactly one writer's actions — never torn or interleaved."""
    import multiprocessing as mp

    path = str(tmp_path_factory.mktemp("delta_xproc"))
    seed = DeltaProtocolTable(None, path, checkpoint_interval=None)
    seed._commit(0, [{"commitInfo": {"operation": "seed"}}])

    n_versions = 40
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_commit_race_worker, args=(path, w, n_versions, q))
        for w in (1, 2)
    ]
    for p in procs:
        p.start()
    results = dict(q.get(timeout=120) for _ in procs)
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0

    wins1, wins2 = set(results[1]), set(results[2])
    # exactly one winner per version: disjoint, and the union is total
    assert wins1 & wins2 == set()
    assert wins1 | wins2 == set(range(1, n_versions + 1))
    # committed bytes match the reported winner exactly (never torn)
    for v in range(1, n_versions + 1):
        actions = [json.loads(x) for x in open(seed._log_path(v))
                   if x.strip()]
        winner = 1 if v in wins1 else 2
        assert actions == [{"commitInfo": {"operation": f"writer{winner}",
                                           "raceVersion": v}}]
