"""ensure_protobuf() portability: the vendored runtime must make
google.protobuf importable on a BARE image (no pip protobuf, no cloud
SDK) — simulated in a subprocess with the disk search list emptied and
PYTHONPATH scrubbed. Extraction goes to a USER-OWNED cache dir (never
world-writable /tmp, where another local user could pre-plant a
malicious google/protobuf tree at a predictable name), the dirname
embeds the zip's sha256, and an existing tree is re-verified against
the zip manifest before being trusted."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CODE = r"""
import os, sys
import am_kinesis_pay_spark.compat as C
C._PROTOBUF_RUNTIME_DIRS = ()  # simulate: no SDK anywhere on disk
ok = C.ensure_protobuf()
assert ok, "ensure_protobuf() False on vendored-zip path"
import google.protobuf
root = os.environ["SPARK_GRAFT_CACHE_DIR"]
prefix = os.path.join(root, "protobuf_runtime-")
assert google.protobuf.__file__.startswith(prefix), google.protobuf.__file__
# the runtime is real: build a descriptor-backed message end to end
from google.protobuf import descriptor_pb2
fd = descriptor_pb2.FileDescriptorProto(name="x.proto")
assert descriptor_pb2.FileDescriptorProto.FromString(
    fd.SerializeToString()
).name == "x.proto"
print("VENDORED_OK", google.protobuf.__file__)
"""


def _run(code: str, cache_dir: str) -> subprocess.CompletedProcess:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYTHONPYCACHEPREFIX")
    }
    env["PYTHONPATH"] = REPO  # repo only: no SDK dir leaks in
    env["SPARK_GRAFT_CACHE_DIR"] = cache_dir
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )


def test_vendored_protobuf_fallback_on_bare_image(tmp_path):
    proc = _run(_CODE, str(tmp_path))
    assert proc.returncode == 0, proc.stderr
    assert "VENDORED_OK" in proc.stdout

    # idempotent second use: the extracted cache is reused as-is
    proc2 = _run(_CODE, str(tmp_path))
    assert proc2.returncode == 0, proc2.stderr


def test_preplanted_cache_tree_is_replaced(tmp_path):
    """A squatting dir at the exact cache name (stale, tampered, or
    adversarial) must neither be trusted nor permanently disable the
    fallback: manifest verification fails, the tree is replaced by a
    fresh extraction, and the import still resolves to real protobuf."""
    import am_kinesis_pay_spark.compat as C

    digest = C._zip_digest(C._VENDOR_ZIP)
    planted = tmp_path / f"protobuf_runtime-{digest}"
    pb = planted / "google" / "protobuf"
    pb.mkdir(parents=True)
    # passes the cheap _runtime_ok layout probe, fails the manifest check
    (pb / "__init__.py").write_text("raise RuntimeError('planted')\n")
    (pb / "runtime_version.py").write_text("")

    proc = _run(_CODE, str(tmp_path))
    assert proc.returncode == 0, proc.stderr
    assert "VENDORED_OK" in proc.stdout
    # the planted sabotage file is gone, replaced by the real module
    body = (pb / "__init__.py").read_text()
    assert "planted" not in body


def test_extracted_tree_matches_zip_manifest(tmp_path):
    """The trust check itself: exact member set + sizes. Extra files or
    a size mismatch must fail verification."""
    import zipfile

    import am_kinesis_pay_spark.compat as C

    dest = tmp_path / "x"
    with zipfile.ZipFile(C._VENDOR_ZIP) as z:
        z.extractall(dest)
    assert C._matches_zip(str(dest), C._VENDOR_ZIP)
    (dest / "google" / "extra.py").write_text("x")
    assert not C._matches_zip(str(dest), C._VENDOR_ZIP)
