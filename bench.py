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
    for name in sorted(qs):
        runs: list[float] = []
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                run_query(qs[name](spark, SF_DIR))
                runs.append(time.perf_counter() - t0)
            times[name] = round(sorted(runs)[1], 3)  # median of 3
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # take down the whole bench run; record and continue
            errors[name] = f"{type(e).__name__}: {e}"[:200]

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
    }
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
    if not partial:
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
        "families": families,
        "queries_file": queries_file,
    }
    if partial:
        summary["partial"] = True
    print(json.dumps(summary))


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
