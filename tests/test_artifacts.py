"""Session-artifact layer (am_kinesis_pay_spark/paths.py
session_artifact): the scratch-parquet memo the minhash family, the
embedding-dedup family, and the BPE merge table all ride on. Pins the
three behaviors consumers depend on: (1) the build runs once per
(session, name) and read-backs are equal, (2) a torn artifact (missing
_SUCCESS — a killed writer) is rebuilt instead of trusted, (3)
AKPS_FORCE_RECOMPUTE=1 rebuilds even when the memo says done, and the
recomputed results are identical (stand-alone == memoized)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from am_kinesis_pay_spark.paths import scratch_path, session_artifact

from tests.conftest import SF_DIR


def _builder(spark, calls):
    def build():
        calls.append(1)
        return spark.range(10).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )

    return build


def test_artifact_builds_once_and_rereads(spark):
    calls: list[int] = []
    build = _builder(spark, calls)
    a = session_artifact(spark, "akps_test_art_once", build, "id bigint, v bigint")
    b = session_artifact(spark, "akps_test_art_once", build, "id bigint, v bigint")
    assert len(calls) == 1, "second access must not rebuild"
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == 10


def test_torn_artifact_rebuilds(spark):
    calls: list[int] = []
    build = _builder(spark, calls)
    session_artifact(spark, "akps_test_art_torn", build, "id bigint, v bigint")
    assert len(calls) == 1
    # simulate a writer killed mid-publish: data files present, no
    # _SUCCESS marker — the memo set still remembers the path, but the
    # marker check must win and trigger a rebuild
    os.remove(os.path.join(scratch_path(spark, "akps_test_art_torn"), "_SUCCESS"))
    out = session_artifact(
        spark, "akps_test_art_torn", build, "id bigint, v bigint"
    )
    assert len(calls) == 2, "missing _SUCCESS must rebuild"
    assert out.count() == 10


def test_force_recompute_rebuilds_and_matches(spark, monkeypatch):
    calls: list[int] = []
    build = _builder(spark, calls)
    first = session_artifact(
        spark, "akps_test_art_force", build, "id bigint, v bigint"
    ).collect()
    monkeypatch.setenv("AKPS_FORCE_RECOMPUTE", "1")
    second = session_artifact(
        spark, "akps_test_art_force", build, "id bigint, v bigint"
    ).collect()
    assert len(calls) == 2, "AKPS_FORCE_RECOMPUTE=1 must rebuild"
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_emb_family_standalone_equals_memoized(spark, monkeypatch):
    """The shared-artifact consumers must return identical results
    whether they hit the memoized artifacts or rebuild from scratch —
    the correctness contract behind the SCALE.md amortization claim."""
    from am_kinesis_pay_spark.registry import queries

    memoized = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in queries()["emb_dedup_cosine_lsh"](spark, SF_DIR).collect()
    }
    monkeypatch.setenv("AKPS_FORCE_RECOMPUTE", "1")
    rebuilt = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in queries()["emb_dedup_cosine_lsh"](spark, SF_DIR).collect()
    }
    assert memoized == rebuilt


def test_gc_scratch_lru_budget(tmp_path, monkeypatch):
    """The artifact janitor (VERDICT r5 #8): akps_* scratch dirs from
    PAST sessions are kept newest-first within the byte budget, older
    ones deleted; the current session's dirs, non-akps tmpdir contents,
    and RECENTLY-TOUCHED dirs (live sessions — e.g. Delta-protocol
    tables, which are not _SUCCESS-guarded and cannot self-heal,
    ADVICE r6) are never touched."""
    import os
    import tempfile
    import time

    import am_kinesis_pay_spark.paths as P

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setenv("AKPS_SCRATCH_TTL_S", "5")

    def mk(name, size, age_s):
        d = tmp_path / name
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x" * size)
        old = time.time() - age_s
        os.utime(d, (old, old))
        return str(d)

    newest = mk("akps_a_sess1", 600, 10)
    middle = mk("akps_b_sess1", 600, 20)
    oldest = mk("akps_c_sess2", 600, 30)
    mine = mk("akps_d_current", 600, 99999)  # current session: immune
    other = mk("not_akps_dir", 600, 99999)   # foreign tmp content: immune
    # a LIVE foreign session's Delta table: fresh mtime → inside the
    # TTL → immune even when the budget is busted (ADVICE r6)
    live = mk("akps_delta_tbl_sess3", 600, 1)
    os.utime(live, None)  # now
    (tmp_path / "akps_delta_tbl_sess3" / "_delta_log").mkdir()

    deleted = P.gc_scratch(keep_token="current", budget_bytes=1900)
    # live(600) + newest(600) + middle(600) fit in 1900; oldest busts it
    assert deleted == [oldest]
    assert os.path.isdir(newest) and os.path.isdir(middle)
    assert os.path.isdir(mine) and os.path.isdir(other)
    assert not os.path.exists(oldest)

    # zero budget: every non-current STALE akps dir goes; the live
    # (recent-mtime) one survives the TTL guard
    deleted2 = set(P.gc_scratch(keep_token="current", budget_bytes=0))
    assert deleted2 == {newest, middle}
    assert os.path.isdir(mine) and os.path.isdir(other)
    assert os.path.isdir(live)


def test_artifact_build_ledger_records_first_consumer_cost(spark):
    """ARTIFACT_BUILD_SECS (r12 OPT, VERDICT r11 #3/#6): each build
    charges its one-time cost to the ledger exactly once, so bench
    payloads can expose first-consumer attribution; read-backs add
    nothing."""
    from am_kinesis_pay_spark import paths

    calls: list[int] = []
    build = _builder(spark, calls)
    name = "akps_test_art_ledger"
    paths.ARTIFACT_BUILD_SECS.pop(name, None)
    session_artifact(spark, name, build, "id bigint, v bigint")
    assert name in paths.ARTIFACT_BUILD_SECS
    first = paths.ARTIFACT_BUILD_SECS[name]
    assert first > 0.0
    session_artifact(spark, name, build, "id bigint, v bigint")
    assert paths.ARTIFACT_BUILD_SECS[name] == first, (
        "read-back must not re-charge the ledger"
    )
    assert len(calls) == 1
