"""Optional-dependency shims (import-try gated, no installs).

``ensure_protobuf()`` makes ``google.protobuf`` importable on images
that ship no pip-installed protobuf, from two sources (first hit
wins): a canonical pure-Python runtime elsewhere on disk (the Google
Cloud SDK's App Engine platform bundles protobuf 6.32 in the standard
``google/protobuf`` namespace-package layout), or the repo's OWN
vendored copy of that same runtime (``vendor/protobuf_runtime.zip``,
BSD-licensed upstream sources + LICENSE, ~150 KB), extracted once to
a writable cache dir — so TWS execution is portable to bare images
with neither pip protobuf nor an SDK. Spark 4's
``transformWithStateInPandas`` Python worker needs that runtime to
decode its state-server protocol (pyspark/sql/streaming/proto/
StateMessage_pb2.py — gencode pinned to protoc 6.33).

Two things make the skew safe to bridge:

* ``google`` is a namespace package, so appending the SDK platform dir
  to ``sys.path`` resolves ``google.protobuf`` with zero shimming.
* protobuf's own gencode validator exposes an official escape hatch —
  the ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` env var
  (google/protobuf/runtime_version.py) — for exactly this
  gencode-newer-than-runtime minor-version skew. The serialized
  FileDescriptorProto the gencode carries is wire-stable across minors.

Ordering constraint: this must run BEFORE the SparkSession's JVM
launches. TWS state processors execute in forked Python worker
processes whose ``sys.path`` is rebuilt from the ``PYTHONPATH`` env
var the JVM inherited — so both the path and the version-check flag
must be in ``os.environ`` at JVM spawn time, not merely in the
driver's ``sys.path``. am_kinesis_pay_spark.session calls this at
import time to guarantee that.

Reference semantics unaffected: this only unlocks executing the
Spark-4 state-machine backend (kinesis-pay.php:239-268 semantics,
already golden-tested via applyInPandasWithState) on its successor
API. No protobuf -> everything still works except TWS execution, and
``tws_available()`` reports False.
"""

from __future__ import annotations

import os
import sys

# Known locations of a canonical pure-python `google/protobuf` runtime.
# First hit wins; SPARK_GRAFT_PROTOBUF_DIR overrides for other images.
_PROTOBUF_RUNTIME_DIRS = (
    os.environ.get("SPARK_GRAFT_PROTOBUF_DIR"),
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_VENDOR_ZIP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vendor",
    "protobuf_runtime.zip",
)


def _cache_root() -> str:
    """User-owned cache dir for extracted assets. NOT world-writable
    /tmp: on a shared host another local user could pre-plant a
    malicious ``google/protobuf`` tree at a predictable /tmp name and
    get code execution in the driver and every Spark worker. Order:
    $SPARK_GRAFT_CACHE_DIR, ~/.cache/akps (created 0700), then a
    per-process mkdtemp memoized for the life of the process."""
    global _CACHE_ROOT
    if _CACHE_ROOT is not None:
        return _CACHE_ROOT
    for cand in (
        os.environ.get("SPARK_GRAFT_CACHE_DIR"),
        os.path.join(os.path.expanduser("~"), ".cache", "akps"),
    ):
        if not cand:
            continue
        try:
            os.makedirs(cand, mode=0o700, exist_ok=True)
            if os.access(cand, os.W_OK):
                _CACHE_ROOT = cand
                return cand
        except OSError:
            continue
    import tempfile

    _CACHE_ROOT = tempfile.mkdtemp(prefix="akps_cache_")
    return _CACHE_ROOT


_CACHE_ROOT: str | None = None


def _zip_digest(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:16]


def _matches_zip(base: str, zip_path: str) -> bool:
    """Extracted tree is trusted only if it holds exactly the zip's
    members with matching sizes — a pre-planted or tampered tree
    (extra files, swapped modules) fails and gets re-extracted."""
    import zipfile

    try:
        with zipfile.ZipFile(zip_path) as z:
            members = {i.filename: i.file_size for i in z.infolist() if not i.is_dir()}
        on_disk: dict[str, int] = {}
        for root, _dirs, files in os.walk(base):
            for fn in files:
                p = os.path.join(root, fn)
                on_disk[os.path.relpath(p, base).replace(os.sep, "/")] = (
                    os.path.getsize(p)
                )
        return on_disk == members
    except OSError:
        return False


def _vendored_runtime_dir() -> str | None:
    """Extract the repo's vendored pure-python protobuf runtime to a
    user-owned cache dir (once) and return it. The final dirname embeds
    the zip's sha256, and an existing dir is re-verified member-by-
    member against the zip manifest before being trusted. Extraction is
    crash/race safe: unpack into a unique temp dir, then os.rename onto
    the final name — concurrent extractors lose the rename and reuse
    the winner. Returns None when the vendor zip is absent (source
    checkouts that stripped binary assets)."""
    if not os.path.isfile(_VENDOR_ZIP):
        return None
    try:
        digest = _zip_digest(_VENDOR_ZIP)
    except OSError:
        return None
    final = os.path.join(_cache_root(), f"protobuf_runtime-{digest}")
    if _runtime_ok(final) and _matches_zip(final, _VENDOR_ZIP):
        return final
    import shutil
    import uuid
    import zipfile

    tmp = f"{final}.extract-{uuid.uuid4().hex}"
    try:
        with zipfile.ZipFile(_VENDOR_ZIP) as z:
            z.extractall(tmp)
        try:
            os.rename(tmp, final)
        except OSError:
            # Target exists: either a concurrent extractor won (fine)
            # or a stale/invalid tree squats the name — replace it so
            # a bad dir can't permanently disable the fallback.
            if not (_runtime_ok(final) and _matches_zip(final, _VENDOR_ZIP)):
                shutil.rmtree(final, ignore_errors=True)
                try:
                    os.rename(tmp, final)
                except OSError:
                    pass
    except (OSError, zipfile.BadZipFile):
        return None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return final if _runtime_ok(final) else None

_checked = False
_available = False


def _runtime_ok(base: str) -> bool:
    """A usable runtime = canonical layout AND new enough to carry
    runtime_version.py (>=5.27), i.e. it understands the disable flag
    and the builder API the Spark gencode uses."""
    pb = os.path.join(base, "google", "protobuf")
    return os.path.isfile(os.path.join(pb, "__init__.py")) and os.path.isfile(
        os.path.join(pb, "runtime_version.py")
    )


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable; True if it is (or became so).

    Idempotent; cheap after the first call. Never raises: images with
    neither pip protobuf nor a bundled runtime just get False (and the
    TWS golden test importorskips as before).
    """
    global _checked, _available
    if _checked:
        return _available
    _checked = True

    try:
        import google.protobuf  # noqa: F401

        _available = True
        return True
    except ImportError:
        pass

    candidates = [b for b in _PROTOBUF_RUNTIME_DIRS if b and _runtime_ok(b)]
    if not candidates:
        vendored = _vendored_runtime_dir()
        if vendored:
            candidates.append(vendored)
    for base in candidates:
        # Env first: forked Spark Python workers rebuild sys.path from
        # PYTHONPATH and re-run the gencode's version validator there.
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        # The SDK dir is typically root-owned, so Python cannot drop
        # .pyc files next to the sources — every fresh worker would
        # re-PARSE the whole protobuf package (seconds each, per state
        # partition, per micro-batch). Redirect bytecode to a writable
        # cache so only the first worker ever pays the parse.
        os.environ.setdefault(
            "PYTHONPYCACHEPREFIX",
            os.path.join(_cache_root(), "pycache"),
        )
        existing = os.environ.get("PYTHONPATH", "")
        if base not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                base + os.pathsep + existing if existing else base
            )
        if base not in sys.path:
            sys.path.append(base)
        try:
            import google.protobuf  # noqa: F401

            _available = True
        except ImportError:  # layout lied; undo nothing, try next dir
            continue
        return True

    return False
