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
    # ADVICE r10: unmeasurable propagates as None, never as 0.0 —
    # a (0, 0) sentinel silently disarmed the gate
    assert bench._steal_pct(None, (11_000, 350)) is None
    assert bench._steal_pct((10_000, 200), None) is None


def _fake_proc(tmp_path, pid, comm, ppid, rss_kb):
    d = tmp_path / str(pid)
    d.mkdir()
    (d / "comm").write_text(comm + "\n")
    (d / "stat").write_text(f"{pid} ({comm}) S {ppid} 1 1 0 -1\n")
    (d / "status").write_text(f"Name:\t{comm}\nVmRSS:\t{rss_kb} kB\n")


def test_co_jvm_scan_excludes_own_tree(tmp_path):
    """The bench's own Spark JVM (a descendant of this process) must
    not count as a co-resident; a foreign idle REPL JVM must — the r10
    trap: an 8 GB parked REPL corrupted medians at ~0% steal."""
    bench = _load("bench_mod_jvm", os.path.join(REPO, "bench.py"))
    me = os.getpid()
    # our child JVM: ppid chain reaches os.getpid()
    _fake_proc(tmp_path, 9001, "java", me, 4_000_000)
    # a foreign 8 GB JVM parented to init
    _fake_proc(tmp_path, 9002, "java", 1, 8_000_000)
    # a foreign tiny helper JVM (recorded, below the refusal floor)
    _fake_proc(tmp_path, 9003, "java", 1, 100_000)
    # a non-java process is ignored entirely
    _fake_proc(tmp_path, 9004, "python3", 1, 9_000_000)
    got = bench._co_jvms(proc=str(tmp_path))
    by_pid = {j["pid"]: j for j in got}
    assert 9001 not in by_pid and 9004 not in by_pid
    assert by_pid[9002]["rss_mb"] == 7812  # 8e6 kB, banker's round
    assert by_pid[9003]["rss_mb"] == 98


def test_gate_refusal_reasons():
    bench = _load("bench_mod_gate", os.path.join(REPO, "bench.py"))
    big = [{"pid": 1, "comm": "java", "rss_mb": 8192}]
    small = [{"pid": 2, "comm": "java", "rss_mb": 64}]
    assert bench._gate(0.5, [], False, []) == []
    assert bench._gate(0.5, [], False, small) == []
    assert bench._gate(0.5, [], False, big) == ["co_resident_jvm"]
    assert bench._gate(9.9, [], False, []) == ["steal_run"]
    assert bench._gate(0.5, ["q1"], False, []) == ["steal_queries"]
    # unmeasurable is NOT clean (fail-closed), and None steal likewise
    assert bench._gate(0.5, [], True, []) == ["steal_unmeasurable"]
    assert bench._gate(None, [], False, []) == ["steal_unmeasurable"]
    assert set(bench._gate(9.9, ["q1"], False, big)) == {
        "steal_run", "steal_queries", "co_resident_jvm"
    }


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


def test_adjudication_summary_generated_from_artifact():
    """VERDICT r10 #6: the SCALE.md close sentence must be EMITTED
    from BENCH_adjudication.json (the r10 close hand-wrote '24
    variance, 1 explained' over a 25-row all-variance artifact)."""
    bd = _load("bench_diff_summary", os.path.join(REPO, "tools", "bench_diff.py"))
    adj = {
        "old_round": 10, "new_round": 11, "n_runs": 5,
        "new_snapshot_sha256": "ab" * 8,
        "rows": [
            {"query": "q_a", "label": "variance"},
            {"query": "q_b", "label": "variance"},
            {"query": "q_c", "label": "explained(SCALE.md r7: trade)"},
        ],
    }
    s = bd._summary_text(adj)
    assert "3 flagged rows" in s
    assert "2 variance (q_a, q_b)" in s
    assert "1 explained (q_c)" in s
    assert "median-of-5" in s and "ab" * 8 in s
    assert bd._summary_text({"old_round": 1, "new_round": 2, "rows": []}
                            ).endswith("0 flagged rows — none flagged.")


def test_regression_flagging_thresholds():
    bd = _load("bench_diff_mod3", os.path.join(REPO, "tools", "bench_diff.py"))
    qo = {"a": 1.0, "b": 1.0, "c": 0.1, "d": 2.0}
    qn = {"a": 1.35, "b": 1.25, "c": 0.35, "d": 2.5}
    # a: ratio 1.35 > 1.3 AND delta 0.35 > 0.2 -> flagged
    # b: ratio 1.25 below RATIO -> not flagged
    # c: ratio 3.5x but delta 0.25 > 0.2 -> flagged
    # d: delta 0.5 but ratio 1.25 -> not flagged
    assert set(bd._regressions(qo, qn)) == {"a", "c"}
