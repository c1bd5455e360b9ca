"""Unit pins for the bench-snapshot integrity machinery (VERDICT r9
#1): the /proc/stat steal arithmetic, the stale-adjudication
invalidation bench.py runs after every snapshot write, and the
sha-binding check tools/bench_diff.py --check gates round close with.
No Spark session required."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_steal_pct_arithmetic():
    bench = _load("bench_mod", os.path.join(REPO, "bench.py"))
    # 1000 total jiffies elapsed, 150 stolen -> 15%
    assert bench._steal_pct((10_000, 200), (11_000, 350)) == 15.0
    # zero elapsed window must not divide by zero
    assert bench._steal_pct((10_000, 200), (10_000, 200)) == 0.0
    # live sample parses and is sane
    total, steal = bench._stat_sample()
    assert total > 0 and 0 <= steal <= total


def test_snapshot_sha_stable_and_content_bound(tmp_path):
    bd = _load("bench_diff_mod", os.path.join(REPO, "tools", "bench_diff.py"))
    p = tmp_path / "snap.json"
    p.write_text(json.dumps({"value": 1.0}))
    sha1 = bd._snapshot_sha(str(p))
    assert sha1 == bd._snapshot_sha(str(p)) and len(sha1) == 16
    p.write_text(json.dumps({"value": 2.0}))
    assert bd._snapshot_sha(str(p)) != sha1


def test_stale_adjudication_removed_on_snapshot_rewrite(tmp_path):
    """bench.py must delete a round-N adjudication whose recorded sha
    no longer matches the round-N snapshot on disk — the r9 defect
    (adjudicator decided on an earlier run than the shipped file)."""
    bench = _load("bench_mod2", os.path.join(REPO, "bench.py"))
    snap = tmp_path / "BENCH_local_r99.json"
    snap.write_text(json.dumps({"value": 1.0, "queries": {}}))
    adj = tmp_path / "BENCH_adjudication.json"
    adj.write_text(
        json.dumps(
            {"old_round": 98, "new_round": 99,
             "new_snapshot_sha256": "0" * 16, "rows": []}
        )
    )
    bench._invalidate_stale_adjudication(
        str(tmp_path), 99, "BENCH_local_r99.json"
    )
    assert not adj.exists()
    # matching sha survives
    bd = _load("bench_diff_mod2", os.path.join(REPO, "tools", "bench_diff.py"))
    adj.write_text(
        json.dumps(
            {"old_round": 98, "new_round": 99,
             "new_snapshot_sha256": bd._snapshot_sha(str(snap)), "rows": []}
        )
    )
    bench._invalidate_stale_adjudication(
        str(tmp_path), 99, "BENCH_local_r99.json"
    )
    assert adj.exists()
    # an adjudication for a DIFFERENT round is left alone (bench_diff
    # --check separately fails it as round-mismatched)
    adj.write_text(
        json.dumps(
            {"old_round": 97, "new_round": 98,
             "new_snapshot_sha256": "f" * 16, "rows": []}
        )
    )
    bench._invalidate_stale_adjudication(
        str(tmp_path), 99, "BENCH_local_r99.json"
    )
    assert adj.exists()


def test_regression_flagging_thresholds():
    bd = _load("bench_diff_mod3", os.path.join(REPO, "tools", "bench_diff.py"))
    qo = {"a": 1.0, "b": 1.0, "c": 0.1, "d": 2.0}
    qn = {"a": 1.35, "b": 1.25, "c": 0.35, "d": 2.5}
    # a: ratio 1.35 > 1.3 AND delta 0.35 > 0.2 -> flagged
    # b: ratio 1.25 below RATIO -> not flagged
    # c: ratio 3.5x but delta 0.25 > 0.2 -> flagged
    # d: delta 0.5 but ratio 1.25 -> not flagged
    assert set(bd._regressions(qo, qn)) == {"a", "c"}
