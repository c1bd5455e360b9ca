"""Per-session scratch locations for queries that materialize through
the filesystem or the catalog (bucketed layouts, conf-scoped rewrites,
format round-trips).

Fixed names like ``/tmp/akps_bucketed`` / table ``akps_orders_b`` are
correct for one session but clobber each other when concurrent sessions
share a tmpdir or metastore (parallel bench runs, multi-user clusters).
Suffixing every scratch path and table name with the Spark
``applicationId`` makes them per-session-unique while staying stable
within a session (so overwrite-then-read-back patterns still work).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import SparkSession


def session_token(spark: SparkSession) -> str:
    """applicationId sanitized to a SQL-identifier-safe suffix."""
    return re.sub(r"[^A-Za-z0-9]", "_", spark.sparkContext.applicationId)


def scratch_path(spark: SparkSession, name: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"{name}_{session_token(spark)}")


def scratch_table(spark: SparkSession, name: str) -> str:
    return f"{name}_{session_token(spark)}"


def sf_tag(sf_dir: str) -> str:
    """Short stable tag for an sf dir, for artifact names that must be
    distinct per data directory within one session (the test suite
    drives the same session at several SFs)."""
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


_SESSION_ARTIFACTS: set[str] = set()
# Paths already rebuilt under AKPS_FORCE_RECOMPUTE: force rebuilds each
# artifact AT MOST ONCE per process. Without this, nested artifact
# builds (rep-pairs build reads rep-norms reads members) re-overwrite
# an inner artifact that an ALREADY-RETURNED DataFrame still references
# — parquet reads snapshot the file listing at read time, so the stale
# frame fails with FILE_NOT_EXIST when executed after the overwrite.
_FORCE_REBUILT: set[str] = set()

# artifact name -> cumulative build seconds in THIS process (first-
# consumer attribution: the timed query that triggered each build paid
# for it; bench.py ships this map so snapshot diffs can tell artifact
# build cost from query drift — VERDICT r11 #3/#6)
ARTIFACT_BUILD_SECS: dict[str, float] = {}
_ARTIFACT_LOCK = None


def _artifact_lock():
    global _ARTIFACT_LOCK
    if _ARTIFACT_LOCK is None:
        import threading

        _ARTIFACT_LOCK = threading.RLock()
    return _ARTIFACT_LOCK


_GC_DONE = False
# Every scratch path this package writes starts with this prefix; the
# janitor only ever considers these, never arbitrary tmpdir contents.
_SCRATCH_PREFIX = "akps_"


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path, onerror=lambda e: None):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def gc_scratch(
    keep_token: str | None = None, budget_bytes: int | None = None
) -> list[str]:
    """Size-bounded LRU janitor for the session-artifact layer: scratch
    dirs accumulate per (session, sf) — on a box that runs the suite
    repeatedly (CI, the per-round driver) they would otherwise grow
    without bound. Scans tempdir for ``akps_*`` dirs NOT owned by the
    current session, keeps the most-recently-touched ones within
    ``budget_bytes`` (env ``AKPS_SCRATCH_GB``, default 8 GiB), deletes
    the rest, and returns the deleted paths. Runs once per process,
    lazily before the first artifact build, so the budget bounds disk
    across repeated sessions without ever racing this session's own
    writes (another LIVE session's artifacts self-heal: its
    session_artifact re-builds on the missing ``_SUCCESS``).

    Recently-touched dirs are never reaped (``AKPS_SCRATCH_TTL_S``,
    default 1 h): Delta-protocol table dirs (akps_delta_*) are NOT
    _SUCCESS-guarded, so a cross-process deletion between a live
    session's log replay and its parquet read would fail that query
    instead of self-healing (ADVICE r6). Any dir a live session is
    using gets fresh mtimes from its commits/reads; only genuinely
    stale sessions age past the TTL and become eligible."""
    import shutil
    import tempfile as _tf
    import time as _time

    if budget_bytes is None:
        budget_bytes = int(
            float(os.environ.get("AKPS_SCRATCH_GB", "8")) * (1 << 30)
        )
    ttl_s = float(os.environ.get("AKPS_SCRATCH_TTL_S", "3600"))
    now = _time.time()
    tmp = _tf.gettempdir()
    candidates = []
    try:
        entries = os.listdir(tmp)
    except OSError:
        return []
    for e in entries:
        p = os.path.join(tmp, e)
        if not e.startswith(_SCRATCH_PREFIX) or not os.path.isdir(p):
            continue
        if keep_token and e.endswith(keep_token):
            continue
        try:
            candidates.append((os.path.getmtime(p), _tree_bytes(p), p))
        except OSError:
            continue
    candidates.sort(reverse=True)  # newest first
    deleted, used = [], 0
    for mtime, size, p in candidates:
        used += size
        if used > budget_bytes and (now - mtime) > ttl_s:
            shutil.rmtree(p, ignore_errors=True)
            deleted.append(p)
    return deleted


def session_artifact(spark: SparkSession, name: str, build, schema=None):
    """Session-scoped scratch-parquet memo: build() the frame and write
    it on first use, read it back on every use. AKPS_FORCE_RECOMPUTE=1
    forces one rebuild per artifact per process (stand-alone cost
    measurement runs a fresh session per query, so "once" is a full
    rebuild there; bounding it prevents nested builds from overwriting
    an artifact a returned frame still references). Unlike
    .cache()/persist() this pins no executor storage
    and can never leak into sibling queries through CacheManager plan
    substitution — reuse is an explicit parquet read. At 100 TB this
    is the persisted-index ingest shape: expensive shared stages (a
    signature index, a tokenizer merge table) are tables maintained
    once and probed by every consumer."""
    global _GC_DONE
    path = scratch_path(spark, name)
    force_env = os.environ.get("AKPS_FORCE_RECOMPUTE", "") not in ("", "0")
    # serialized build: concurrent driver threads (a parallel harness)
    # must not race the overwrite of a shared artifact path
    with _artifact_lock():
        if not _GC_DONE:
            _GC_DONE = True
            gc_scratch(keep_token=session_token(spark))
        force = force_env and path not in _FORCE_REBUILT
        if (
            force
            or path not in _SESSION_ARTIFACTS
            or not os.path.exists(os.path.join(path, "_SUCCESS"))
        ):
            import time as _time

            t0 = _time.perf_counter()
            build().write.mode("overwrite").parquet(path)
            # first-consumer attribution ledger (VERDICT r11 #3/#6):
            # build cost lands on whichever timed query built the
            # artifact; record it so bench payloads can expose it
            ARTIFACT_BUILD_SECS[name] = round(
                ARTIFACT_BUILD_SECS.get(name, 0.0)
                + (_time.perf_counter() - t0),
                3,
            )
            _SESSION_ARTIFACTS.add(path)
            if force_env:
                _FORCE_REBUILT.add(path)
    reader = spark.read.schema(schema) if schema else spark.read
    return reader.parquet(path)
