"""From-scratch Delta Lake TRANSACTION-LOG protocol on plain parquet.

The Delta protocol (public spec: github.com/delta-io/delta PROTOCOL.md)
is a directory convention, not a jar: a table is parquet data files
plus an ordered ``_delta_log/{version:020d}.json`` of newline-delimited
ACTIONS — ``add`` (file enters the table), ``remove`` (file leaves),
``metaData``/``protocol`` (bootstrap), ``txn`` (streaming idempotence),
``commitInfo`` (audit). A reader replays the log in version order,
accumulating adds minus removes; the surviving file set IS the table
state, and stopping the replay early is time travel. This module
implements that contract with no Delta jar, and since r7 speaks BOTH
halves the r6 version documented as simplifications:

- **Optimistic concurrency** (PROTOCOL.md "Delta Log Entries" — a
  commit is a put-if-absent of the next version file): ``_commit``
  publishes via ``os.link`` (atomic create-if-absent on POSIX), so two
  writers racing to the same version produce exactly one winner; the
  loser raises ``DeltaConcurrentCommitError`` and the public writer
  ops rebase-and-retry (``append`` re-reads the latest version,
  ``append_txn`` re-checks the txn high-water mark, ``overwrite_where``
  re-reads the table state before re-staging). Data files carry a
  writer-unique token in their names, so a losing writer's staged
  parquet can never be overwritten by the winner's — it just becomes
  an unreferenced orphan that ``vacuum`` reaps (ADVICE r6: staging
  under shared ``v{N}-part-*`` names let the loser's bytes win).
- **Checkpoints** (PROTOCOL.md "Checkpoints"): every
  ``checkpoint_interval`` commits the writer materializes the replayed
  state (protocol, metaData, active adds, txn high-water marks) as
  ``{version:020d}.checkpoint.parquet`` plus a ``_last_checkpoint``
  pointer. Readers seed from the checkpoint and replay only the JSON
  suffix — O(commits since checkpoint) instead of O(commits) per read.
  Time travel to a pre-checkpoint version falls back to full JSON
  replay (log files are retained).
- **vacuum(retention_versions=N)**: deletes data files not active in
  any retained version (and stale orphans), bounding the table dir
  under repeated MERGE/overwrite churn; time travel within the
  retention window still works, pinned in tests.

Correctness properties (pinned in tests/test_delta_protocol.py):
- atomicity: data files are invisible until their commit JSON lands —
  a crash between staging parquet and writing the log leaves the
  previous version authoritative;
- remove semantics: a logically-deleted file stays on disk until
  vacuum yet never reaches a reader;
- time travel: ``read(version=N)`` replays only log entries <= N;
- checkpointed reads are bit-equivalent to full-replay reads;
- two interleaved writers never lose a commit (put-if-absent + rebase).

Reference parity: the versioned invoice-state history the reference
mutates in place (kinesis-pay.php:176,509) becomes an auditable
append-only commit log — every state the table ever had stays
readable within the vacuum retention window.

At 100 TB the log stays tiny (actions, not rows); readers list one
directory, seed from the newest checkpoint, and read only surviving
files; MERGE rewrites only the files whose key range intersects the
batch (emulated here as a full-state rewrite at fixture scale, the
same documented simplification as sources/sinks.py's MergeKeyedSink).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

_LOG_DIR = "_delta_log"
_LAST_CKPT = "_last_checkpoint"


class DeltaConcurrentCommitError(ValueError):
    """Another writer won the put-if-absent race for this version."""


class DeltaProtocolTable:
    """Delta-protocol table: parquet data files + a JSON action log
    replayed by the reader, with checkpoint acceleration and
    optimistic-concurrency commits."""

    #: bounded rebase attempts before a writer gives up (each attempt
    #: re-reads the log, so livelock needs a pathological writer storm)
    MAX_COMMIT_ATTEMPTS = 10

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        checkpoint_interval: int | None = 10,
        stats_cols: tuple = (),
    ):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)
        self.checkpoint_interval = checkpoint_interval
        # columns whose per-file min/max land in each add action's
        # `stats` JSON (the spec's file-skipping field); numRecords is
        # always recorded
        self.stats_cols = tuple(stats_cols)
        # writer identity: makes staged data-file names collision-free
        # across concurrent writers (never influences table CONTENT)
        self._writer_token = uuid.uuid4().hex[:12]
        #: diagnostics for tests: did the last replay seed from a
        #: checkpoint, and how many JSON commits did it still walk?
        self.last_read_used_checkpoint = False
        self.last_read_json_commits = 0

    # --- log plumbing ---------------------------------------------------

    def _log_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def _ckpt_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.checkpoint.parquet")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json"):
                try:
                    out.append(int(name[: -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _commit(self, version: int, actions: list[dict]) -> None:
        """Put-if-absent commit: write the actions to a writer-unique
        temp file, then ``os.link`` it to the version path — on POSIX
        the link either creates the name or fails with EEXIST, so two
        writers racing the same version get exactly one winner and the
        loser's bytes never land (the protocol's single contention
        point). Readers can never observe a half-written commit because
        the name appears only after the bytes are durable."""
        os.makedirs(self.log_dir, exist_ok=True)
        target = self._log_path(version)
        if os.path.exists(target):
            raise DeltaConcurrentCommitError(
                f"version {version} already committed"
            )
        tmp = f"{target}.{self._writer_token}.tmp"
        with open(tmp, "w") as fh:
            for action in actions:
                fh.write(json.dumps(action, sort_keys=True) + "\n")
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise DeltaConcurrentCommitError(
                f"version {version} already committed"
            ) from None
        finally:
            os.unlink(tmp)
        # checkpointing is an OPTIMIZATION on top of a commit that is
        # already durable: a failed checkpoint write (disk full, racing
        # pointer swap) must never report the commit as failed — a
        # harness-level retry would then re-apply the batch
        try:
            self._maybe_checkpoint(version)
        except Exception:
            pass

    # --- state replay (checkpoint-seeded where possible) ------------------

    def _read_last_checkpoint(self) -> int | None:
        try:
            with open(os.path.join(self.log_dir, _LAST_CKPT)) as fh:
                v = int(json.load(fh)["version"])
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return None
        return v if os.path.exists(self._ckpt_path(v)) else None

    def _apply(self, state: dict, action: dict) -> None:
        if "add" in action:
            state["adds"][action["add"]["path"]] = action["add"]
        elif "remove" in action:
            state["adds"].pop(action["remove"]["path"], None)
        elif "txn" in action:
            t = action["txn"]
            prev = state["txns"].get(t["appId"])
            if prev is None or t["version"] > prev:
                state["txns"][t["appId"]] = t["version"]
        elif "metaData" in action:
            state["metaData"] = action["metaData"]
        elif "protocol" in action:
            state["protocol"] = action["protocol"]
        # unknown action kinds are ignored (spec's forward-compat rule)

    def _replay_state(
        self, version: int | None = None, snapshot: list[int] | None = None
    ) -> dict:
        """Reconstruct table state at ``version`` (latest if None):
        seed from the newest usable checkpoint, then replay only the
        JSON suffix. Records which path was taken for test pinning.

        ``snapshot`` pins the replay to a version listing the CALLER
        already took, instead of re-listing here — the single-snapshot
        derivation append_txn needs (ADVICE r7): deriving the txn
        high-water mark and the commit version from two separate
        listings lets a concurrent commit land invisibly between them."""
        vs = self.versions() if snapshot is None else sorted(snapshot)
        if version is not None:
            vs = [v for v in vs if v <= version]
            if not vs:
                raise FileNotFoundError(
                    f"no commit at or before version {version} under {self.path}"
                )
        elif not vs:
            raise FileNotFoundError(f"not a Delta-protocol table: {self.path}")
        state: dict = {"adds": {}, "txns": {}, "metaData": None,
                       "protocol": None}
        # liveness marker for the scratch janitor: READS refresh the
        # table dir's mtime too, so gc_scratch's TTL guard sees a
        # querying session as live, not just a committing one
        try:
            os.utime(self.path, None)
        except OSError:
            pass
        ckpt_v = self._read_last_checkpoint()
        self.last_read_used_checkpoint = False
        if ckpt_v is not None and ckpt_v <= vs[-1] and ckpt_v in vs:
            try:
                self._load_checkpoint(ckpt_v, state)
                vs = [v for v in vs if v > ckpt_v]
                self.last_read_used_checkpoint = True
            except OSError:
                # the pointer's parquet vanished between the existence
                # check and the read (a concurrent write_checkpoint
                # swap): fall back to full JSON replay
                state["adds"].clear()
                state["txns"].clear()
        self.last_read_json_commits = len(vs)
        for v in vs:
            with open(self._log_path(v)) as fh:
                for line in fh:
                    if line.strip():
                        self._apply(state, json.loads(line))
        return state

    def active_files(self, version: int | None = None) -> list[str]:
        """Surviving data-file paths at ``version`` — adds accumulate,
        removes retract, checkpoint-seeded when one covers the prefix."""
        return sorted(self._replay_state(version)["adds"])

    # --- checkpoints -------------------------------------------------------

    def _maybe_checkpoint(self, version: int) -> None:
        k = self.checkpoint_interval
        if k and version > 0 and version % k == 0:
            self.write_checkpoint(version)

    @staticmethod
    def _checkpoint_schema():
        """PROTOCOL.md "Checkpoint Schema": one column PER ACTION KIND,
        each a struct mirroring the JSON action's fields, exactly one
        non-null per row. This is the shape delta-spark / delta-rs
        readers expect (ADVICE r7: the flat kind/action_json layout was
        consumable only by this module). ``remove`` is present in the
        schema but always null — this writer checkpoints live state
        only, never tombstones (vacuum replays the retained JSON log
        directly, so expired-tombstone bookkeeping has nothing to
        read from a checkpoint here)."""
        import pyarrow as pa

        str_map = pa.map_(pa.string(), pa.string())
        return pa.schema(
            [
                ("protocol", pa.struct([
                    ("minReaderVersion", pa.int32()),
                    ("minWriterVersion", pa.int32()),
                ])),
                ("metaData", pa.struct([
                    ("id", pa.string()),
                    ("name", pa.string()),
                    ("description", pa.string()),
                    ("format", pa.struct([
                        ("provider", pa.string()),
                        ("options", str_map),
                    ])),
                    ("schemaString", pa.string()),
                    ("partitionColumns", pa.list_(pa.string())),
                    ("configuration", str_map),
                    ("createdTime", pa.int64()),
                ])),
                ("txn", pa.struct([
                    ("appId", pa.string()),
                    ("version", pa.int64()),
                    ("lastUpdated", pa.int64()),
                ])),
                ("add", pa.struct([
                    ("path", pa.string()),
                    ("partitionValues", str_map),
                    ("size", pa.int64()),
                    ("modificationTime", pa.int64()),
                    ("dataChange", pa.bool_()),
                    ("stats", pa.string()),
                ])),
                ("remove", pa.struct([
                    ("path", pa.string()),
                    ("deletionTimestamp", pa.int64()),
                    ("dataChange", pa.bool_()),
                ])),
            ]
        )

    def write_checkpoint(self, version: int) -> str:
        """Materialize the replayed state at ``version`` as a parquet
        checkpoint (one row per retained action: protocol, metaData,
        active adds, txn high-water marks) plus the ``_last_checkpoint``
        pointer readers consult first — the spec's log-compaction
        mechanism. Full JSON replay builds the state (checkpoints must
        not chain off possibly-stale state), pyarrow writes the file
        (a KB-scale metadata object; no Spark job needed). The parquet
        uses the spec's per-action STRUCT columns (_checkpoint_schema),
        so a real Delta reader can consume it; _load_checkpoint proves
        the columns are self-sufficient by reading them back itself."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        # full replay on purpose: do NOT seed from an older checkpoint
        prev = self._read_last_checkpoint()
        state = self._full_replay(version)
        rows: list[dict] = []
        if state["protocol"] is not None:
            rows.append({"protocol": state["protocol"]})
        if state["metaData"] is not None:
            rows.append({"metaData": state["metaData"]})
        for app_id in sorted(state["txns"]):
            rows.append(
                {"txn": {"appId": app_id, "version": state["txns"][app_id]}}
            )
        for p in sorted(state["adds"]):
            rows.append({"add": state["adds"][p]})
        table = pa.Table.from_pylist(rows, schema=self._checkpoint_schema())
        ckpt = self._ckpt_path(version)
        tmp = f"{ckpt}.{self._writer_token}.tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, ckpt)
        # pointer is advisory: readers fall back to JSON replay if the
        # parquet is missing, so a torn pointer update is harmless
        ptr_tmp = os.path.join(
            self.log_dir, f"{_LAST_CKPT}.{self._writer_token}.tmp"
        )
        with open(ptr_tmp, "w") as fh:
            json.dump({"version": version, "size": len(rows)}, fh)
        os.replace(ptr_tmp, os.path.join(self.log_dir, _LAST_CKPT))
        if prev is not None and prev != version:
            # previous checkpoint parquet is now unreferenced
            try:
                os.unlink(self._ckpt_path(prev))
            except OSError:
                pass
        return ckpt

    def _full_replay(self, version: int) -> dict:
        state: dict = {"adds": {}, "txns": {}, "metaData": None,
                       "protocol": None}
        for v in self.versions():
            if v > version:
                break
            with open(self._log_path(v)) as fh:
                for line in fh:
                    if line.strip():
                        self._apply(state, json.loads(line))
        return state

    def _load_checkpoint(self, version: int, state: dict) -> None:
        """Seed state from the spec-shaped struct columns (NOT a private
        side-channel — reading the same columns a foreign Delta reader
        would proves the checkpoint is self-sufficient). pyarrow maps
        surface as [(k, v), ...] in to_pylist; fold them back to dicts
        so checkpoint-seeded state is shape-identical to JSON-replayed
        state."""
        import pyarrow.parquet as pq

        def _demap(v):
            if isinstance(v, dict):
                return {k: _demap(x) for k, x in v.items()}
            if isinstance(v, list):
                if v and all(isinstance(x, tuple) and len(x) == 2 for x in v):
                    return {k: _demap(x) for k, x in v}
                return [_demap(x) for x in v]
            return v

        table = pq.read_table(
            self._ckpt_path(version),
            columns=["protocol", "metaData", "txn", "add", "remove"],
        )
        for row in table.to_pylist():
            for kind in ("protocol", "metaData", "txn", "add", "remove"):
                val = row.get(kind)
                if val is not None:
                    self._apply(state, {kind: _demap(val)})

    # --- writer operations ----------------------------------------------

    def _stage(self, df: DataFrame) -> list[dict]:
        """Write df's rows as parquet data files OUTSIDE the log under
        WRITER-UNIQUE names (part-{writer}-{batch}-{i}), then describe
        them as add actions. Unique names mean a concurrent writer can
        never clobber these bytes (ADVICE r6); files stay invisible to
        every reader until _commit links the log entry, and an aborted
        stage leaves only orphans for vacuum."""
        batch = uuid.uuid4().hex[:8]
        stage_dir = os.path.join(
            self.path, f"_staged_{self._writer_token}_{batch}"
        )
        df.write.mode("overwrite").parquet(stage_dir)
        adds = []
        i = 0
        for name in sorted(os.listdir(stage_dir)):
            if not name.endswith(".parquet"):
                continue
            rel = f"part-{self._writer_token}-{batch}-{i:05d}.parquet"
            os.replace(
                os.path.join(stage_dir, name), os.path.join(self.path, rel)
            )
            adds.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(self.path, rel)),
                        # fixed mtime keeps table state deterministic
                        "modificationTime": 0,
                        "dataChange": True,
                        "stats": self._file_stats(
                            os.path.join(self.path, rel)
                        ),
                    }
                }
            )
            i += 1
        for leftover in os.listdir(stage_dir):
            os.remove(os.path.join(stage_dir, leftover))
        os.rmdir(stage_dir)
        return adds

    def _file_stats(self, full_path: str) -> str:
        """Per-file stats JSON for the add action (the spec's `stats`
        field): numRecords always, minValues/maxValues for
        ``stats_cols`` — lifted straight from the parquet footer (no
        data read), which is what makes file skipping free to write."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(full_path).metadata
        mins: dict = {}
        maxs: dict = {}
        if self.stats_cols:
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for col in self.stats_cols:
                ci = idx.get(col)
                if ci is None:
                    continue
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    mins[col] = lo
                    maxs[col] = hi
        out: dict = {"numRecords": md.num_rows}
        if mins:
            out["minValues"] = mins
            out["maxValues"] = maxs
        return json.dumps(out, sort_keys=True)

    def files_where(self, col: str, lo=None, hi=None) -> tuple[list, int]:
        """Data skipping off the add-action stats: return (surviving
        file paths, total active files). A file is pruned only when
        its recorded [min, max] for ``col`` provably cannot intersect
        [lo, hi]; files without stats are always scanned (the spec's
        conservative rule)."""
        state = self._replay_state()
        keep = []
        for p in sorted(state["adds"]):
            add = state["adds"][p]
            scan = True
            try:
                st = json.loads(add.get("stats") or "{}")
                fmin = st.get("minValues", {}).get(col)
                fmax = st.get("maxValues", {}).get(col)
                if fmin is not None and fmax is not None:
                    if (lo is not None and fmax < lo) or (
                        hi is not None and fmin > hi
                    ):
                        scan = False
            except (ValueError, TypeError):
                pass  # malformed stats: scan conservatively
            if scan:
                keep.append(p)
        return keep, len(state["adds"])

    def read_where(self, col: str, lo=None, hi=None) -> tuple[DataFrame, int, int]:
        """Stats-pruned read: (frame over surviving files, files
        scanned, files total). The caller still applies the row-level
        predicate — skipping is an optimization, never a filter."""
        files, total = self.files_where(col, lo, hi)
        if not files:
            raise FileNotFoundError("predicate prunes every file")
        df = self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )
        return df, len(files), total

    def create(self, df: DataFrame) -> int:
        """Version 0: protocol + metaData bootstrap plus the first data.
        No retry: losing the race for v0 means the table already
        exists, which is a caller error, not a rebase."""
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "akps-delta-protocol-table",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
        ]
        actions += self._stage(df)
        actions.append({"commitInfo": {"operation": "CREATE TABLE AS SELECT"}})
        self._commit(0, actions)
        return 0

    def append(self, df: DataFrame) -> int:
        """Blind append with rebase-retry: appends commute with any
        concurrent commit, so losing the version race just means
        re-reading the latest version and re-linking — the staged
        files (version-independent names) are reused as-is."""
        adds = self._stage(df)
        actions = adds + [
            {"commitInfo": {"operation": "WRITE", "mode": "Append"}}
        ]
        last_err: Exception | None = None
        for _ in range(self.MAX_COMMIT_ATTEMPTS):
            v = (self.latest_version() or 0) + 1
            try:
                self._commit(v, actions)
                return v
            except DeltaConcurrentCommitError as e:
                last_err = e
        raise last_err  # pathological contention: surface it

    # --- txn actions: the protocol's exactly-once streaming mechanism ----

    def txn_version(self, app_id: str) -> int | None:
        """Highest ``txn`` action version recorded for app_id — what
        delta-spark consults to make foreachBatch idempotent
        (checkpoint-seeded like every other state read)."""
        return self._replay_state()["txns"].get(app_id)

    def append_txn(self, df: DataFrame, app_id: str, version: int) -> bool:
        """Exactly-once append: the commit carries a ``txn`` action
        (appId, version); a redelivered (app_id, version) at or below
        the recorded high-water mark is a silent no-op — the Delta
        protocol's txnAppId/txnVersion contract, which is what turns
        foreachBatch's at-least-once into exactly-once on this table.
        The high-water check reruns on every rebase attempt, so a
        concurrent writer landing the same (app, version) first turns
        this call into the no-op it should be (its staged files orphan
        for vacuum). Returns True if the batch committed.

        Single-snapshot derivation (ADVICE r7 closed the TOCTOU here):
        the txn high-water mark AND the commit version both come from
        ONE versions() listing. The old form listed twice (txn_version,
        then latest_version) with the slow _stage between them, so a
        concurrent commit carrying the same (appId, version) could land
        in the gap — invisible to the dedup check yet not colliding on
        the version file, committing the batch twice. Now any commit
        that lands after the snapshot necessarily occupies v =
        max(snapshot)+1, so our os.link put-if-absent at v fails and
        the retry re-reads a snapshot that INCLUDES the rival's txn
        action — the same reasoning that makes overwrite_where safe."""
        staged: list[dict] | None = None
        last_err: Exception | None = None
        for _ in range(self.MAX_COMMIT_ATTEMPTS):
            vs = self.versions()
            last = self._replay_state(snapshot=vs)["txns"].get(app_id)
            if last is not None and version <= last:
                return False
            if staged is None:
                staged = self._stage(df)
            v = (vs[-1] if vs else 0) + 1
            actions = [{"txn": {"appId": app_id, "version": version}}]
            actions += staged
            actions.append(
                {"commitInfo": {"operation": "STREAMING UPDATE",
                                "mode": "Append"}}
            )
            try:
                self._commit(v, actions)
                return True
            except DeltaConcurrentCommitError as e:
                last_err = e
        raise last_err

    def overwrite_where(self, df: DataFrame, keep_predicate) -> int:
        """Copy-on-write rewrite (the MERGE/DELETE building block): the
        new version removes EVERY current file and adds files holding
        (current rows passing keep_predicate) plus df's rows — the
        reader of version v-1 still sees the old state untouched.
        Rewrites do NOT commute, so a lost race triggers a FULL rebase:
        re-read the (new) current state, re-filter, re-stage, retry —
        delta-spark's ConcurrentModification resolution for
        overlapping transactions."""
        last_err: Exception | None = None
        for _ in range(self.MAX_COMMIT_ATTEMPTS):
            base_v = self.latest_version() or 0
            current = self.read()
            merged = current.filter(keep_predicate).unionByName(df)
            actions = [
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": 0,
                        "dataChange": True,
                    }
                }
                for p in self.active_files()
            ]
            actions += self._stage(merged)
            actions.append({"commitInfo": {"operation": "MERGE"}})
            try:
                self._commit(base_v + 1, actions)
                return base_v + 1
            except DeltaConcurrentCommitError as e:
                last_err = e  # state moved under us: rebase fully
        raise last_err

    # --- maintenance -------------------------------------------------------

    def vacuum(
        self, retention_versions: int = 2, min_age_s: float = 3600.0
    ) -> list[str]:
        """Delete data files no retained version references: the
        survivors are the union of active_files(v) for the newest
        ``retention_versions`` commits, everything else — files removed
        by old rewrites AND orphans from aborted/lost-race stages —
        is reaped, bounding the table dir under MERGE churn. Time
        travel within the retention window keeps working (pinned in
        tests); older reads may fail on missing files, exactly the
        delta-spark trade. ``min_age_s`` (default 1 h, like real
        Delta's retention-hours check) guards a live concurrent
        writer's staged-but-not-yet-committed files from the reaper —
        _stage moves data files into the table root BEFORE the commit
        links, so a zero-age vacuum racing a writer would delete bytes
        its commit is about to reference; pass 0 only in single-writer
        contexts."""
        import time

        latest = self.latest_version()
        if latest is None:
            return []
        retained = [v for v in self.versions()
                    if v > latest - retention_versions]
        keep: set[str] = set()
        for v in retained:
            keep.update(self.active_files(v))
        now = time.time()
        deleted = []
        for name in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, name)
            if not name.endswith(".parquet") or not os.path.isfile(full):
                continue
            if name in keep:
                continue
            try:
                if min_age_s and (now - os.path.getmtime(full)) < min_age_s:
                    continue
                os.unlink(full)
                deleted.append(name)
            except OSError:
                continue
        return deleted

    # --- reader ----------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        files = self.active_files(version)
        if not files:
            raise FileNotFoundError(f"table {self.path} has no active files")
        return self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )


def _build_events_table(spark: SparkSession, sf_dir: str) -> DeltaProtocolTable:
    """The deterministic 3-commit fixture both registered queries read:
    v0 CREATE with click events, v1 APPEND purchase events, v2 MERGE
    that drops low-value clicks (value <= 100) while keeping purchases.
    Built once per (session, sf) under the scratch convention; the
    build (rmtree + three commits) holds the artifact lock so parallel
    harness threads cannot interleave a read with a rebuild (ADVICE
    r6)."""
    from am_kinesis_pay_spark.paths import _artifact_lock, scratch_path, sf_tag

    path = scratch_path(spark, f"akps_delta_tbl_{sf_tag(sf_dir)}")
    tbl = DeltaProtocolTable(spark, path)
    with _artifact_lock():
        if tbl.latest_version() != 2:
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            ev = load(spark, sf_dir, "events").select(
                "event_id", "user_id", "event_type", "value"
            )
            tbl.create(ev.filter(F.col("event_type") == "click"))
            tbl.append(ev.filter(F.col("event_type") == "purchase"))
            tbl.overwrite_where(
                df=tbl.read().limit(0),  # pure delete: no new rows
                keep_predicate=(F.col("event_type") == "purchase")
                | (F.col("value") > 100),
            )
    return tbl


@register(
    "source_delta_protocol",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type = 'purchase'
   OR (event_type = 'click' AND value > 100)
GROUP BY event_type
""",
    tags=("source", "merge", "incremental"),
)
def source_delta_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Lake TRANSACTION-LOG protocol from scratch (public spec,
    no jar): the table is parquet files + an ordered _delta_log of
    JSON actions, and the reader REPLAYS the log — adds accumulate,
    removes retract, the surviving file set is the state. The fixture
    commits v0 CREATE (clicks), v1 APPEND (purchases), v2 MERGE-style
    copy-on-write delete (low-value clicks dropped by removing every
    old file and adding rewritten ones); this query aggregates the
    replayed final state, and the oracle computes the same post-state
    from first principles — a hash match proves the log replay, the
    remove semantics, and the rewrite all compose correctly.
    Atomicity (staged files invisible until the commit JSON links in),
    torn-commit recovery, version time travel, optimistic concurrency,
    checkpointed reads, and vacuum are pinned in
    tests/test_delta_protocol.py. At 100 TB the log is actions (KBs),
    not rows; readers seed from the newest checkpoint; MERGE rewrites
    only intersecting files (full-state rewrite here is the documented
    fixture-scale simplification, as in MergeKeyedSink)."""
    tbl = _build_events_table(spark, sf_dir)
    return (
        tbl.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "source_delta_protocol_history",
    oracle="""
SELECT CAST(0 AS INT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events WHERE event_type = 'click'
UNION ALL
SELECT CAST(1 AS INT), CAST(COUNT(*) AS BIGINT)
FROM events WHERE event_type IN ('click', 'purchase')
UNION ALL
SELECT CAST(2 AS INT), CAST(COUNT(*) AS BIGINT)
FROM events
WHERE event_type = 'purchase' OR (event_type = 'click' AND value > 100)
""",
    tags=("source", "merge", "incremental"),
)
def source_delta_protocol_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the from-scratch Delta log: one row per
    committed version with the row count a reader pinned to that
    version sees — CREATE (v0), after APPEND (v1), after the
    MERGE-style delete (v2). ``read(version=N)`` replays only log
    entries <= N, so history never needs extra storage beyond the
    files themselves (removed files stay on disk until vacuum). The
    oracle recomputes each version's state from first principles; a
    hash match proves version pinning is exact, not approximate."""
    tbl = _build_events_table(spark, sf_dir)
    frames = []
    for v in tbl.versions():
        frames.append(
            tbl.read(version=v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            ).select("version", "n_rows")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _build_checkpointed_table(
    spark: SparkSession, sf_dir: str
) -> DeltaProtocolTable:
    """12-commit fixture for the checkpointed-read query: CREATE with
    the event_id%12==0 slice, 11 appends of the remaining residues →
    final state is EXACTLY the events table, and the auto-checkpoint
    (interval 10) fires at v10, so the default read seeds from the
    checkpoint parquet and replays only the v11 JSON suffix."""
    from am_kinesis_pay_spark.paths import _artifact_lock, scratch_path, sf_tag

    path = scratch_path(spark, f"akps_delta_ckpt_{sf_tag(sf_dir)}")
    tbl = DeltaProtocolTable(spark, path, checkpoint_interval=10)
    with _artifact_lock():
        if tbl.latest_version() != 11:
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            ev = load(spark, sf_dir, "events").select(
                "event_id", "event_type", "value"
            )
            tbl.create(ev.filter(F.col("event_id") % 12 == 0))
            for r in range(1, 12):
                tbl.append(ev.filter(F.col("event_id") % 12 == r))
        if tbl._read_last_checkpoint() is None:
            # self-heal (ADVICE r7): _commit deliberately swallows
            # checkpoint-write failures (a failed OPTIMIZATION must not
            # fail a durable commit), and the version guard above never
            # rebuilds a complete 12-commit log — so one transient
            # checkpoint failure (disk full mid-write) would otherwise
            # leave source_delta_checkpoint's seeding assert failing
            # forever. Repair the missed auto-checkpoint on next build.
            tbl.write_checkpoint(10)
    return tbl


@register(
    "source_delta_checkpoint",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
""",
    tags=("source", "merge", "incremental"),
)
def source_delta_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-accelerated Delta read (the spec's log-compaction
    half, closing the r6 "O(commits) replay" gap): the fixture lands
    12 commits (CREATE + 11 residue appends whose union is exactly the
    events table); the auto-checkpoint at v10 materializes the replayed
    state as {v:020d}.checkpoint.parquet + _last_checkpoint, and this
    reader seeds from that parquet and replays ONLY the JSON suffix
    (v11) — O(commits since checkpoint) instead of O(commits). The
    oracle is the plain events aggregate, so a hash match proves
    checkpoint state == replayed state action-for-action (that the
    checkpoint path was actually taken is pinned separately in
    tests/test_delta_protocol.py::test_checkpoint_read_equivalence).
    At 100 TB with thousands of commits this is the difference between
    a constant-time table open and a linear log walk."""
    tbl = _build_checkpointed_table(spark, sf_dir)
    out = (
        tbl.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    if not tbl.last_read_used_checkpoint:  # never stripped under -O
        raise RuntimeError("checkpoint seeding did not engage")
    return out


@register(
    "sink_delta_txn",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_id % 3 IN (0, 1)
GROUP BY event_type
""",
    tags=("sink", "merge", "incremental"),
)
def sink_delta_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming appends through the Delta txn action,
    driver-visible: three micro-batches land via append_txn — epoch 0
    (event_id%3==0), epoch 1 (%3==1), then epoch 0 REDELIVERED with
    poisoned rows (%3==2, which must NEVER appear) — and the replayed
    table must equal exactly batches 0+1. The oracle computes that
    post-state from first principles, so the hash match proves the
    txn high-water-mark check, not just the happy path: if the replay
    were applied, both n and total_value would differ for every group.
    This is the same contract MergeKeyedSink/AdditiveRollupSink pin on
    the snapshot+marker layout, now in the industry-standard log
    format (delta_protocol.append_txn; real readStream drive in
    tests/test_delta_protocol.py::test_txn_drives_real_stream). The
    fixture build holds the artifact lock (ADVICE r6: unguarded scratch
    mutation raced parallel harness threads)."""
    from am_kinesis_pay_spark.paths import _artifact_lock, scratch_path, sf_tag

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    path = scratch_path(spark, f"akps_delta_txn_{sf_tag(sf_dir)}")
    tbl = DeltaProtocolTable(spark, path)
    with _artifact_lock():
        if tbl.latest_version() is None:
            tbl.create(ev.filter(F.col("event_id") % 3 == 0))
            # CREATE is epoch 0's commit in this fixture; version 0 is
            # claimed below before the poison replays
        if tbl.txn_version("kpay_stream") is None:
            tbl.append_txn(
                ev.filter(F.col("event_id") % 3 == 1), "kpay_stream", 1
            )
            # redelivery of an OLD epoch with poisoned rows: must no-op
            tbl.append_txn(
                ev.filter(F.col("event_id") % 3 == 2), "kpay_stream", 1
            )
            tbl.append_txn(
                ev.filter(F.col("event_id") % 3 == 2), "kpay_stream", 0
            )
    return (
        tbl.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def _build_skipping_table(
    spark: SparkSession, sf_dir: str
) -> DeltaProtocolTable:
    """Value-clustered fixture for the data-skipping query: one commit
    per value bucket (floor(value/100) capped at 9), one data file per
    commit (coalesce(1)), so every file's [min, max] on value is a
    tight 100-wide band and a value predicate can prove most files
    irrelevant from the log alone."""
    from am_kinesis_pay_spark.paths import _artifact_lock, scratch_path, sf_tag

    path = scratch_path(spark, f"akps_delta_skip_{sf_tag(sf_dir)}")
    tbl = DeltaProtocolTable(spark, path, stats_cols=("value",))
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    bkt = F.least(F.floor(F.col("value") / 100).cast("bigint"), F.lit(9))
    with _artifact_lock():
        buckets = [
            r[0]
            for r in ev.select(bkt.alias("b"))
            .where(F.col("b").isNotNull())
            .distinct()
            .orderBy("b")
            .collect()
        ]
        # rebuild guard checks the EXACT final version (one commit per
        # bucket), like the sibling builders — a crash mid-build must
        # trigger a rebuild, never a silently short table
        expected = max(0, len(buckets) - 1)
        if tbl.latest_version() != expected:
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            if not buckets:  # empty input: a valid zero-row table
                tbl.create(ev.limit(0).coalesce(1))
            first = True
            for b in buckets:
                batch = ev.filter(bkt == b).coalesce(1)
                if first:
                    tbl.create(batch)
                    first = False
                else:
                    tbl.append(batch)
    return tbl


@register(
    "source_delta_skipping",
    oracle="""
WITH b AS (
  SELECT event_type, value,
    LEAST(CAST(floor(value / 100) AS BIGINT), 9) AS bkt
  FROM events WHERE value IS NOT NULL
), f AS (
  SELECT CAST(COUNT(DISTINCT bkt) AS BIGINT) AS files_total,
    CAST(COUNT(DISTINCT CASE WHEN bkt >= 3 THEN bkt END) AS BIGINT)
      AS files_scanned
  FROM b
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  (SELECT files_scanned FROM f) AS files_scanned,
  (SELECT files_total FROM f) AS files_total
FROM b WHERE value >= 300
GROUP BY event_type
""",
    tags=("source", "merge", "incremental"),
)
def source_delta_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE SKIPPING off Delta add-action stats (the spec's `stats`
    JSON: numRecords + minValues/maxValues, lifted from parquet
    footers at write time): the fixture clusters each commit's single
    data file on a 100-wide value band, and a `value >= 300` read
    prunes every file whose recorded [min, max] cannot intersect —
    from the LOG alone, before any parquet footer or row is touched.
    The query returns the filtered aggregate PLUS the measured
    (files_scanned, files_total); the oracle recomputes both from
    first principles (bucket b >= 3 must scan, b < 3 must prune), so
    the hash match proves the pruning is exact — no file wrongly
    skipped (the aggregate would lose rows), none wrongly scanned
    (files_scanned would differ). Files without stats scan
    conservatively per the spec. This is the zone-map story
    (sink_zorder_layout, source_parquet_footer_stats) landed in the
    transaction log itself, which is where Delta actually keeps it at
    100 TB: planning reads KBs of log, not a million footers."""
    tbl = _build_skipping_table(spark, sf_dir)
    df, scanned, total = tbl.read_where("value", lo=300.0)
    return (
        df.filter(F.col("value") >= 300)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .withColumn("files_scanned", F.lit(scanned).cast("bigint"))
        .withColumn("files_total", F.lit(total).cast("bigint"))
    )
