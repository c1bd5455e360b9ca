#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print the
full payload JSON line ({"metric", "value", "unit", "queries": {name:
sec, ...}, ...}) followed by a COMPACT summary JSON as the FINAL stdout
line (no per-query map — the driver tails stdout and parses the last
line, and the 306-entry map overflows its capture; the full map is
persisted to BENCH_local_r{N}.json).

`--family agg,llm` / `--queries name1,name2` run a subset for cheap
iteration (stdout only; no snapshot/diff side effects).

Each query is forced end-to-end with the noop sink (full computation,
no serialization/collect cost — the same convention as spark-sql-perf).
A tiny warmup query absorbs JVM/codegen startup, and each query is
timed as the MEDIAN of three consecutive runs (VERDICT r8 #4: the
snapshot itself must be a steady-state statistic, not a single draw —
r8 had five vec_* entries "regress" with zero code changes because
single-run snapshots diffed box noise). The median discards the one
cold first run (plan compile, cache warm) AND any one GC/host stall,
so BENCHDIFF diffs steady states; the timing discipline is recorded
in the payload ("timing": "median-of-3").

Snapshot integrity (VERDICT r9 #1): this VM suffers intermittent
hypervisor CPU STEAL (r9 measured five identical full runs at
251/316/358/368/243 s with vmstat `st` up to 34%), so a snapshot taken
under steal records box noise as if it were code drift. bench.py now
samples /proc/stat around EVERY query's timing triple: a query window
whose steal exceeds {STEAL_QUERY_PCT}% is re-run (up to
{STEAL_RETRIES} retries) until clean; if any query stays degraded, or
the whole-run steal exceeds {STEAL_RUN_PCT}%, the payload is marked
"degraded_steal" and the BENCH_local snapshot is REFUSED (stdout still
prints, so the driver's capture works, but no BENCHDIFF/adjudication
input is produced from a dirty run). The measured steal ships inside
the payload ("steal_pct", "steal_pct_max_query") and inside every
snapshot, and the snapshot records its own sha256 prefix so
tools/bench_diff.py --adjudicate can bind its verdicts to EXACTLY this
file (the r9 defect: the adjudicator decided on an earlier snapshot
than the one shipped).

Round-11 hardening (VERDICT r10 #3 + ADVICE r10):
  * CO-RESIDENT JVM GUARD — the r10 lesson: an IDLE 8 GB Spark REPL
    parked in tmux inflated adjudication medians 1.5-4x while steal
    read ~0%; steal metering cannot see same-host memory/NUMA
    pressure from another JVM. bench.py now scans /proc for live java
    processes OUTSIDE its own process tree, ships them in the payload
    ("co_jvms"), and REFUSES the snapshot when any foreign JVM holds
    >= {CO_JVM_RSS_MB} MB RSS — the same refusal discipline as the
    steal gate, mechanized instead of a README sentence.
  * FAIL-CLOSED STEAL SAMPLING — a /proc/stat read failure used to
    return (0, 0), every window then read 0.0% steal and the gate
    silently disarmed. _stat_sample now returns None on failure, the
    payload records "steal_pct": null + "steal_unmeasurable": true,
    and an unmeasurable run is refused (not measurable != clean).
  * KEPT-WINDOW ACCOUNTING — retried queries' kept triples are fully
    warm while never-retried ones include the cold first run, and the
    old whole-run steal included the DISCARDED dirty windows (a run
    whose kept timings were all clean could be refused for steal that
    never touched a kept number). The run-level gate now aggregates
    steal over KEPT windows only ("steal_pct", basis recorded in
    "steal_basis"); the raw wall figure ships alongside
    ("steal_pct_wall") and every retried query name is recorded in
    "steal_retried_queries" even when eventually clean.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from am_kinesis_pay_spark.registry import queries  # noqa: E402
from am_kinesis_pay_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# CPU-steal gating (VERDICT r9 #1). A query window at 10% steal reads
# ~1.1x slow — just under the adjudicator's 1.3x flag threshold — so
# 5% per query keeps steal inflation well inside diff noise; 3% over a
# whole multi-minute run means sustained contention and the run is not
# a steady-state measurement at all.
STEAL_QUERY_PCT = 5.0
STEAL_RUN_PCT = 3.0
STEAL_RETRIES = 2

# A foreign JVM this large on the box invalidates the run (r10: an
# idle 8 GB REPL corrupted three adjudication medians at ~0% steal).
# Small helper JVMs (gradle daemons etc.) are recorded but tolerated.
CO_JVM_RSS_MB = 512


def _stat_sample() -> tuple[int, int] | None:
    """(total_jiffies, steal_jiffies) from the aggregate /proc/stat cpu
    line. Monotonic counters; diff two samples for a window's steal.
    Returns None when /proc/stat cannot be read/parsed — FAIL CLOSED:
    'not measurable' must never be reported as 'zero steal' (ADVICE
    r10: the old (0, 0) sentinel silently disarmed the gate)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        if len(vals) <= 7:
            return None
        return sum(vals), vals[7]
    except (OSError, ValueError):
        return None


def _steal_pct(
    a: tuple[int, int] | None, b: tuple[int, int] | None
) -> float | None:
    """Steal %% over a window; None propagates (unmeasurable window)."""
    if a is None or b is None:
        return None
    dt = b[0] - a[0]
    return 100.0 * (b[1] - a[1]) / dt if dt > 0 else 0.0


def _co_jvms(proc: str = "/proc") -> list[dict]:
    """Live java processes OUTSIDE this process tree: [{pid, comm,
    rss_mb}, ...]. The bench's own Spark JVM is a child of this python
    process, so anything java-named whose parent chain does NOT reach
    os.getpid() is a co-resident — the r10 measurement-hygiene trap
    (SCALE.md:1135-1150) that steal metering cannot see."""
    me = os.getpid()

    def ppid_of(pid: int) -> int:
        try:
            with open(f"{proc}/{pid}/stat") as fh:
                # comm may contain spaces/parens: split after the
                # LAST ')' per proc(5)
                tail = fh.read().rsplit(")", 1)[1].split()
            return int(tail[1])  # field 4 (ppid); tail[0] is state
        except (OSError, ValueError, IndexError):
            return 0

    out: list[dict] = []
    try:
        pids = [int(p) for p in os.listdir(proc) if p.isdigit()]
    except OSError:
        return out
    for pid in pids:
        try:
            with open(f"{proc}/{pid}/comm") as fh:
                comm = fh.read().strip()
        except OSError:
            continue
        if "java" not in comm.lower():
            continue
        cur, hops, mine = pid, 0, False
        while cur > 1 and hops < 64:
            if cur == me:
                mine = True
                break
            cur = ppid_of(cur)
            hops += 1
        if mine:
            continue
        rss_kb = 0
        try:
            with open(f"{proc}/{pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS:"):
                        rss_kb = int(line.split()[1])
                        break
        except (OSError, ValueError):
            pass
        out.append({"pid": pid, "comm": comm, "rss_mb": round(rss_kb / 1024)})
    return out


def _gate(
    steal_kept: float | None,
    degraded_queries: list[str],
    unmeasurable: bool,
    co_jvms: list[dict],
) -> list[str]:
    """Snapshot-refusal decision, pure for unit pinning: the reasons a
    run is not a publishable steady-state measurement (empty = clean)."""
    reasons = []
    if unmeasurable or steal_kept is None:
        reasons.append("steal_unmeasurable")
    elif steal_kept > STEAL_RUN_PCT:
        reasons.append("steal_run")
    if degraded_queries:
        reasons.append("steal_queries")
    if any(j["rss_mb"] >= CO_JVM_RSS_MB for j in co_jvms):
        reasons.append("co_resident_jvm")
    return reasons


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Run registered queries end-to-end and time them."
    )
    p.add_argument(
        "--family",
        default=None,
        help="comma-separated family tags (a query's first registry tag,"
        " e.g. 'agg,llm'); runs only those families. Partial runs are"
        " stdout-only: no BENCH_local snapshot, no BENCHDIFF refresh.",
    )
    p.add_argument(
        "--queries",
        default=None,
        help="comma-separated exact query names to run (same partial-run"
        " rules as --family).",
    )
    return p.parse_args()


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _artifact_build_secs() -> dict:
    """Session-artifact build ledger (paths.ARTIFACT_BUILD_SECS) —
    empty dict if the package predates it."""
    try:
        from am_kinesis_pay_spark.paths import ARTIFACT_BUILD_SECS
        return dict(ARTIFACT_BUILD_SECS)
    except ImportError:
        return {}


def main() -> None:
    args = _parse_args()
    spark = get_session("bench")
    qs = queries()
    from am_kinesis_pay_spark.registry import REGISTRY

    partial = bool(args.family or args.queries)
    if args.family:
        fams = {f.strip() for f in args.family.split(",") if f.strip()}
        qs = {
            n: fn
            for n, fn in qs.items()
            if (REGISTRY[n].tags[0] if REGISTRY[n].tags else "other") in fams
        }
    if args.queries:
        want = {n.strip() for n in args.queries.split(",") if n.strip()}
        missing = want - set(qs)
        if missing:
            sys.exit(f"unknown queries: {sorted(missing)}")
        qs = {n: fn for n, fn in qs.items() if n in want}
    if not qs:
        sys.exit("filter matched no queries")

    # warmup: JVM, codegen, parquet footer caches
    from am_kinesis_pay_spark.tables import load

    load(spark, SF_DIR, "region").count()
    warm = "agg_status_counts" if "agg_status_counts" in qs else sorted(qs)[0]
    run_query(queries()[warm](spark, SF_DIR))

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    co_jvms = _co_jvms()  # pre-run scan; re-scanned after the run
    run_start = _stat_sample()
    steal_max_query = 0.0
    kept_dt = 0  # jiffy sums over KEPT windows only (ADVICE r10: the
    kept_st = 0  # run gate must not price windows the retries discarded)
    unmeasurable = run_start is None
    degraded: list[str] = []
    retried: list[str] = []
    for name in sorted(qs):
        try:
            # steal-gated timing triple: re-run the whole triple when
            # hypervisor steal contaminated its window (VERDICT r9 #1)
            for attempt in range(1 + STEAL_RETRIES):
                runs: list[float] = []
                w0 = _stat_sample()
                for _ in range(3):
                    t0 = time.perf_counter()
                    run_query(qs[name](spark, SF_DIR))
                    runs.append(time.perf_counter() - t0)
                w1 = _stat_sample()
                steal = _steal_pct(w0, w1)
                if steal is None or steal <= STEAL_QUERY_PCT:
                    break
            if attempt > 0:
                # kept triple is fully warm (cold run happened in a
                # discarded attempt) — record the asymmetry (ADVICE r10)
                retried.append(name)
            if steal is None:
                unmeasurable = True
            else:
                if steal > STEAL_QUERY_PCT:
                    degraded.append(name)
                steal_max_query = max(steal_max_query, steal)
                kept_dt += w1[0] - w0[0]
                kept_st += w1[1] - w0[1]
            times[name] = round(sorted(runs)[1], 3)  # median of 3
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # take down the whole bench run; record and continue
            errors[name] = f"{type(e).__name__}: {e}"[:200]
    steal_run = (
        round(100.0 * kept_st / kept_dt, 2) if kept_dt > 0 and not
        unmeasurable else None
    )
    steal_wall = _steal_pct(run_start, _stat_sample())
    for j in _co_jvms():  # post-run scan: a JVM that appeared mid-run
        if j["pid"] not in {c["pid"] for c in co_jvms}:
            co_jvms.append(j)

    total = round(sum(times.values()), 3)
    families: dict[str, float] = {}
    for name, sec in times.items():
        tags = REGISTRY[name].tags
        fam = tags[0] if tags else "other"
        families[fam] = round(families.get(fam, 0.0) + sec, 3)
    payload = {
        "metric": "total_wall_seconds_all_queries",
        "timing": "median-of-3",
        "value": total,
        "unit": "sec",
        "queries": times,
        "families": families,
        "sf": _sf_from_dir(SF_DIR),
        "n_queries": len(times),
        "errors": errors,
        # coverage grows round over round; normalize so totals
        # stay comparable across rounds
        "sec_per_query": round(total / max(1, len(times)), 4),
        # in-run hypervisor CPU steal (VERDICT r9 #1 + ADVICE r10):
        # run-level steal aggregated over KEPT timing windows only
        # (discarded retry windows never touched a kept number), plus
        # the raw whole-run wall figure and the worst kept window;
        # null = not measurable, which REFUSES the snapshot
        "steal_pct": steal_run,
        "steal_basis": "kept-windows",
        "steal_pct_wall": None if steal_wall is None else round(steal_wall, 2),
        "steal_pct_max_query": round(steal_max_query, 2),
        # every query whose triple was re-run for steal, even when the
        # kept triple came back clean: its median is fully warm while
        # never-retried queries include the cold first run
        "steal_retried_queries": sorted(retried),
        # co-resident JVM guard (VERDICT r10 #3): java processes
        # outside this process tree; any >= CO_JVM_RSS_MB refuses
        "co_jvms": sorted(co_jvms, key=lambda j: -j["rss_mb"]),
        # first-consumer attribution (VERDICT r11 #3/#6): seconds each
        # session artifact's one-time build cost — charged to whichever
        # timed query built it — so snapshot diffs can separate
        # artifact-build cost from query drift. Disclosure-only; the
        # timing loop above is untouched.
        "artifact_build_secs": dict(
            sorted(_artifact_build_secs().items())
        ),
    }
    if unmeasurable:
        payload["steal_unmeasurable"] = True
    refusal = _gate(steal_run, degraded, unmeasurable, co_jvms)
    degraded_run = bool(refusal)
    if degraded_run:
        payload["degraded_steal"] = True
        payload["degraded_reasons"] = refusal
        if degraded:
            payload["degraded_queries"] = sorted(degraded)
    if partial:
        payload["partial"] = True
    # Persist the full per-query dict in-repo so any round can diff any
    # query without rerunning (tools/bench_diff.py reads these). The
    # round number keys off the driver's OWN BENCH_r{N}.json files:
    # every bench run this round (including the driver's final one)
    # overwrites the same BENCH_local_r{N+1}.json, so the file left
    # behind is the round's last run. Partial (--family/--queries) runs
    # never snapshot — a filtered dict would corrupt the round diff.
    queries_file = None
    if degraded_run and not partial:
        big = [j for j in co_jvms if j["rss_mb"] >= CO_JVM_RSS_MB]
        print(
            f"REFUSING snapshot ({', '.join(refusal)}): kept-window "
            f"run steal {steal_run}% (limit {STEAL_RUN_PCT}%), "
            f"degraded queries after {STEAL_RETRIES} retries: "
            f"{sorted(degraded)} (per-query limit {STEAL_QUERY_PCT}%), "
            f"co-resident JVMs >= {CO_JVM_RSS_MB} MB: {big} — kill the "
            "foreign JVM / re-run on a quiet box; stdout payload still "
            "printed below",
            file=sys.stderr,
        )
    if not partial and not degraded_run:
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            driver_rounds = [
                int(f[len("BENCH_r"):-len(".json")])
                for f in os.listdir(here)
                if f.startswith("BENCH_r") and f.endswith(".json")
                and f[len("BENCH_r"):-len(".json")].isdigit()
            ]
            n = 1 + max(driver_rounds, default=0)
            queries_file = f"BENCH_local_r{n}.json"
            with open(os.path.join(here, queries_file), "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=True)
            _invalidate_stale_adjudication(here, n, queries_file)
            _write_benchdiff(here)
        except OSError:
            queries_file = None  # read-only checkout: stdout only
    # stdout discipline (VERDICT r7 #1): the driver records only a
    # short TAIL of stdout and parses the LAST line as JSON — seven
    # rounds of BENCH_r0N.json carried "parsed": null because the full
    # 306-entry per-query map overflowed that tail. Print the full
    # payload FIRST (human/debug convenience), then a compact summary
    # as the FINAL line so the driver's parse always succeeds; the
    # complete per-query map lives in BENCH_local_r{N}.json.
    print(json.dumps(payload))
    summary = {
        "metric": payload["metric"],
        "value": total,
        "unit": "sec",
        "sf": payload["sf"],
        "n_queries": len(times),
        "n_errors": len(errors),
        "errors": dict(sorted(errors.items())[:3]),
        "sec_per_query": payload["sec_per_query"],
        "steal_pct": payload["steal_pct"],
        "n_co_jvms": len(co_jvms),
        "families": families,
        "queries_file": queries_file,
    }
    if degraded_run:
        summary["degraded_steal"] = True
    if partial:
        summary["partial"] = True
    print(json.dumps(summary))


def _snapshot_sha(path: str) -> str:
    import hashlib

    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()[:16]


def _invalidate_stale_adjudication(here: str, n: int, queries_file: str) -> None:
    """A freshly-written snapshot for round N makes any existing
    round-N adjudication stale: its verdicts describe a run that no
    longer exists (the exact r9 defect — the adjudicator decided on an
    earlier snapshot than the one finally shipped, leaving four never-
    adjudicated 3-4x steal rows in the shipped file). Delete it so the
    round-close gate (tools/bench_diff.py --check) forces a re-
    adjudication against the file that will actually ship."""
    adj_path = os.path.join(here, "BENCH_adjudication.json")
    if not os.path.exists(adj_path):
        return
    try:
        adj = json.load(open(adj_path))
    except (OSError, ValueError):
        os.remove(adj_path)
        return
    sha = _snapshot_sha(os.path.join(here, queries_file))
    if adj.get("new_round") == n and adj.get("new_snapshot_sha256") != sha:
        os.remove(adj_path)
        print(
            f"removed stale BENCH_adjudication.json (bound to sha "
            f"{adj.get('new_snapshot_sha256')}, snapshot is now {sha}) — "
            "re-run tools/bench_diff.py --adjudicate",
            file=sys.stderr,
        )


def _write_benchdiff(here: str) -> None:
    """Refresh BENCHDIFF.md from the latest two BENCH_local snapshots
    (VERDICT r6 #7: the per-query diff must be produced automatically,
    not extracted by hand from truncated driver tails). Non-fatal: a
    single snapshot or a diff failure never breaks the bench run."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.join(here, "tools", "bench_diff.py")],
            capture_output=True, text=True, timeout=60,
        )
        if out.returncode != 0:
            return  # e.g. only one snapshot exists yet
        with open(os.path.join(here, "BENCHDIFF.md"), "w") as fh:
            fh.write(
                "# BENCHDIFF — per-query deltas vs the previous round\n\n"
                "Auto-written by bench.py after each snapshot "
                "(tools/bench_diff.py over the latest two "
                "BENCH_local_r*.json files).\n\n```\n"
            )
            fh.write(out.stdout)
            fh.write("```\n")
    except (OSError, subprocess.SubprocessError):
        pass


if __name__ == "__main__":
    main()
