"""Custom Python data source WRITER (Spark 4 DataSource API): the
reference's masked audit log as a first-class Spark SINK with real
two-phase commit.

`sources/pyds.py` covers the READ half of the extension surface (the
poll loop as a custom batch+stream source); this module covers the
WRITE half — the reference's append-only invoice/audit log
(kinesis-pay.php:446-462), whose durability contract ("a log line the
operator saw is never half-written") maps exactly onto the DataSource
writer's commit protocol:

- ``write(iterator)`` runs per TASK: rows stream to a staging file
  (``_staging/task-<uuid>.jsonl``) and the task returns a
  ``WriterCommitMessage`` naming it — nothing under the target is
  readable yet. A re-attempted task stages a NEW file; the loser's
  message simply never reaches commit (speculative/retried tasks
  cannot double-write).
- ``commit(messages)`` runs ONCE on the driver after every task
  succeeded: staged files rename (atomic within the filesystem) to
  data files named with a fresh per-commit id — a published manifest's
  files are NEVER reused or mutated by a later commit — and a
  ``_manifest.json`` naming exactly the committed files lands LAST,
  itself published atomically (temp file + fsync + ``os.replace``).
  Readers resolve through the manifest, so a crash anywhere before the
  manifest replace leaves the previous complete manifest authoritative
  (never a truncated one) — the same snapshot-then-marker discipline
  as ``MergeKeyedSink``. Overwrite garbage-collects the previous
  commit's now-unreferenced files only AFTER the new manifest is live.
- ``abort(messages)`` deletes whatever staged; the target is untouched.

At 100 TB the staging dir is an object-store prefix and the manifest a
conditional PUT — the protocol is unchanged. The registered query
``sink_pyds_writer`` drives the sink end-to-end (write → manifest →
read-back) against a DuckDB oracle on the same projection; the
abort/no-manifest invisibility path is pinned in tests/test_pyds.py.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

from am_kinesis_pay_spark.paths import scratch_path
from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

AUDIT_SCHEMA = "event_id bigint, user_id bigint, masked_user string, log_kind string"


def _write_manifest_atomic(manifest_path: str, payload: dict) -> None:
    """Crash-safe manifest publish: write to a unique temp name in the
    same directory, fsync, then os.replace() onto the final name —
    readers see either the previous complete manifest or the new
    complete one, never a truncated file. At 100 TB this line is the
    object store's conditional PUT; the discipline is identical."""
    tmp = manifest_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, manifest_path)


def _load_manifest(manifest_path: str) -> dict | None:
    """Read a manifest if present AND parseable. A missing or corrupt
    manifest reads as 'no committed state': treating an unparseable
    file as committed would make epoch redelivery silently drop rows
    (the old existence-only check did exactly that)."""
    if not os.path.exists(manifest_path):
        return None
    try:
        with open(manifest_path) as fh:
            return json.load(fh)
    except (json.JSONDecodeError, OSError):
        return None


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str
    n_rows: int


class AuditLogWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kpay_audit writer requires option 'path'")
        self.overwrite = overwrite

    # -- executor side -------------------------------------------------
    def write(self, iterator: Iterator[Row]) -> _StagedFile:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = os.path.join(staging, f"task-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(name, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _StagedFile(staged=name, n_rows=n)

    # -- driver side ---------------------------------------------------
    def commit(self, messages: List[Optional[_StagedFile]]) -> None:
        manifest_path = os.path.join(self.path, "_manifest.json")
        prev = _load_manifest(manifest_path)
        old_files: list[str] = []
        old_rows = 0
        if not self.overwrite and prev is not None:
            old_files, old_rows = prev["files"], prev["n_rows"]
        staged = sorted(
            (m.staged, m.n_rows) for m in messages if m is not None
        )
        # fresh per-commit id: files named by a published manifest are
        # never renamed onto or mutated by a later commit, so a crash
        # (or concurrent reader) mid-commit can never see new bytes
        # under old committed names
        commit_id = uuid.uuid4().hex[:12]
        files, total = [], 0
        for i, (src, n) in enumerate(staged):
            dst = os.path.join(self.path, f"part-{commit_id}-{i:05d}.jsonl")
            os.replace(src, dst)
            files.append(os.path.basename(dst))
            total += n
        # manifest LAST and ATOMIC: before this replace no reader sees
        # the new write (append: old+new file list; overwrite: new list
        # only — old files become unreferenced the instant it lands)
        _write_manifest_atomic(
            manifest_path,
            {"files": old_files + files, "n_rows": old_rows + total},
        )
        if self.overwrite and prev is not None:
            # new manifest is live; the previous commit's files are now
            # unreferenced — GC them (post-publish, so never readable)
            for name in prev["files"]:
                if name not in files:
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass

    def abort(self, messages: List[Optional[_StagedFile]]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class KPayAuditDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kpay_audit"

    def schema(self) -> str:
        return AUDIT_SCHEMA

    def writer(self, schema: StructType, overwrite: bool) -> AuditLogWriter:
        return AuditLogWriter(self.options, overwrite)


def register_audit_sink(spark: SparkSession) -> None:
    spark.dataSource.register(KPayAuditDataSource)


def read_committed(spark: SparkSession, path: str) -> DataFrame:
    """Manifest-resolved read: only files the manifest names exist for
    readers; staged or orphaned files are invisible."""
    with open(os.path.join(path, "_manifest.json")) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], AUDIT_SCHEMA)
    return spark.read.schema(AUDIT_SCHEMA).json(files)


@register(
    "sink_pyds_writer",
    oracle="""
SELECT event_id, user_id,
  'user-***' || CAST(user_id % 10 AS VARCHAR) AS masked_user,
  'request' AS log_kind
FROM events WHERE event_type = 'click' AND event_id % 50 = 0
UNION ALL
SELECT event_id, user_id,
  'user-***' || CAST(user_id % 10 AS VARCHAR) AS masked_user,
  'response' AS log_kind
FROM events WHERE event_type = 'view' AND event_id % 50 = 0
""",
    tags=("sink", "pyds"),
)
def sink_pyds_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked audit log through the CUSTOM Python DataSource writer —
    write path exercised for real (per-task staging files, driver-side
    rename + manifest commit), then read back manifest-resolved. The
    masking generalizes kinesis-pay.php:459's secret masking; the
    oracle recomputes the same projection straight from events, so the
    write→commit→read round trip must be lossless and exactly-once.
    All-integer/string payload: JSON round-trips it bit-exactly."""
    import shutil

    register_audit_sink(spark)
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    masked = F.concat(
        F.lit("user-***"), (F.col("user_id") % 10).cast("string")
    ).alias("masked_user")
    req = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", masked, F.lit("request").alias("log_kind")
    )
    resp = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", masked, F.lit("response").alias("log_kind")
    )
    out = scratch_path(spark, "akps_pyds_audit")
    shutil.rmtree(out, ignore_errors=True)
    req.unionByName(resp).write.format("kpay_audit").option(
        "path", out
    ).mode("append").save()
    return read_committed(spark, out)


class AuditLogStreamWriter(DataSourceStreamWriter):
    """Streaming form of the audit sink: same per-task staging, but the
    driver-side commit is PER EPOCH — each micro-batch publishes an
    ``epoch-<id>.json`` manifest naming its files. Exactly-once comes
    from manifest idempotence: a redelivered epoch (foreachBatch-style
    at-least-once replay after a crash) sees its manifest already
    present and discards the re-staged files instead of double-
    publishing — the txnVersion=epochId dedup every transactional sink
    uses, here spelled out in ~15 lines."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kpay_audit_stream writer requires option 'path'")

    def write(self, iterator: Iterator[Row]) -> _StagedFile:
        return AuditLogWriter({"path": self.path}, False).write(iterator)

    def _epoch_manifest(self, batch_id: int) -> str:
        return os.path.join(self.path, f"epoch-{batch_id:010d}.json")

    def commit(self, messages: List[Optional[_StagedFile]], batchId: int) -> None:
        manifest = self._epoch_manifest(batchId)
        staged = sorted(
            (m.staged, m.n_rows) for m in messages if m is not None
        )
        if _load_manifest(manifest) is not None:
            # redelivered epoch: already published (manifest present AND
            # parseable — a torn file must NOT count as committed or the
            # redelivery's rows would be silently dropped) — drop the
            # re-staged files, publish nothing (exactly-once)
            for src, _ in staged:
                if os.path.exists(src):
                    os.remove(src)
            return
        files, total = [], 0
        for i, (src, n) in enumerate(staged):
            dst = os.path.join(
                self.path, f"epoch-{batchId:010d}-part-{i:05d}.jsonl"
            )
            os.replace(src, dst)
            files.append(os.path.basename(dst))
            total += n
        _write_manifest_atomic(manifest, {"files": files, "n_rows": total})

    def abort(self, messages: List[Optional[_StagedFile]], batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class KPayAuditStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kpay_audit_stream"

    def schema(self) -> str:
        return AUDIT_SCHEMA

    def streamWriter(self, schema: StructType, overwrite: bool):
        return AuditLogStreamWriter(self.options, overwrite)


def register_audit_stream_sink(spark: SparkSession) -> None:
    spark.dataSource.register(KPayAuditStreamDataSource)


def read_stream_committed(spark: SparkSession, path: str) -> DataFrame:
    """Union of every published epoch manifest's files — the reader
    view of the streaming sink (uncommitted staging invisible)."""
    files: list[str] = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.startswith("epoch-") and name.endswith(".json"):
                with open(os.path.join(path, name)) as fh:
                    files.extend(
                        os.path.join(path, f) for f in json.load(fh)["files"]
                    )
    if not files:
        return spark.createDataFrame([], AUDIT_SCHEMA)
    return spark.read.schema(AUDIT_SCHEMA).json(files)
