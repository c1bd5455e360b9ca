"""ensure_protobuf() portability: the vendored runtime must make
google.protobuf importable on a BARE image (no pip protobuf, no cloud
SDK) — simulated in a subprocess with the disk search list emptied and
PYTHONPATH scrubbed."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_vendored_protobuf_fallback_on_bare_image(tmp_path):
    code = r"""
import os, sys
import am_kinesis_pay_spark.compat as C
C._PROTOBUF_RUNTIME_DIRS = ()  # simulate: no SDK anywhere on disk
ok = C.ensure_protobuf()
assert ok, "ensure_protobuf() False on vendored-zip path"
import google.protobuf
base = os.path.join(os.environ["TMPDIR"], "akps_protobuf_runtime")
assert google.protobuf.__file__.startswith(base), google.protobuf.__file__
# the runtime is real: build a descriptor-backed message end to end
from google.protobuf import descriptor_pb2
fd = descriptor_pb2.FileDescriptorProto(name="x.proto")
assert descriptor_pb2.FileDescriptorProto.FromString(
    fd.SerializeToString()
).name == "x.proto"
print("VENDORED_OK", google.protobuf.__file__)
"""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYTHONPYCACHEPREFIX")
    }
    env["PYTHONPATH"] = REPO  # repo only: no SDK dir leaks in
    env["TMPDIR"] = str(tmp_path)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "VENDORED_OK" in proc.stdout

    # idempotent second use: the extracted cache is reused as-is
    proc2 = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert proc2.returncode == 0, proc2.stderr
