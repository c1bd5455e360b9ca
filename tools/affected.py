#!/usr/bin/env python
"""Map changed files to the registered queries they affect, and print
ready-to-paste slice commands (VERDICT r7 #8: at 300+ queries the full
bench is minutes and the oracle suite ~19 min — iteration cost must
stay flat as the surface grows).

Usage:
    python tools/affected.py                  # vs HEAD (unstaged+staged)
    python tools/affected.py HEAD~3           # vs an older ref
    python tools/affected.py --files am_kinesis_pay_spark/operators/joins.py

Resolution: each registered query's defining module comes from its
function's __module__; a changed module selects its queries. Changes
to shared infrastructure (registry/session/tables/paths/compat) or to
bench/test harness files select EVERYTHING — a conservative fallback,
printed as such.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# a change here can affect any query — run the full suite
_GLOBAL_FILES = {
    "am_kinesis_pay_spark/registry.py",
    "am_kinesis_pay_spark/session.py",
    "am_kinesis_pay_spark/tables.py",
    "am_kinesis_pay_spark/paths.py",
    "am_kinesis_pay_spark/compat.py",
    "am_kinesis_pay_spark/engine.py",
    "am_kinesis_pay_spark/functions/compat.py",
    "__spark_entry__.py",
    "tests/conftest.py",
    "bench.py",
}


def _changed_files(ref: str | None, explicit: list[str]) -> list[str]:
    if explicit:
        return explicit
    cmd = ["git", "-C", REPO, "diff", "--name-only"]
    if ref:
        cmd.append(ref)
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return [f for f in out.stdout.splitlines() if f.strip()]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", nargs="?", default=None,
                    help="git ref to diff against (default: working tree vs HEAD)")
    ap.add_argument("--files", nargs="*", default=None,
                    help="explicit file list instead of a git diff")
    args = ap.parse_args()

    files = _changed_files(args.ref, args.files or [])
    if not files:
        print("no changed files")
        return

    from am_kinesis_pay_spark.registry import REGISTRY, _load_all

    _load_all()
    by_module: dict[str, list[str]] = {}
    for name, spec in REGISTRY.items():
        mod = spec.fn.__module__.replace(".", "/") + ".py"
        by_module.setdefault(mod, []).append(name)

    affected: set[str] = set()
    full_reason = None
    for f in files:
        if f in _GLOBAL_FILES:
            full_reason = f
            break
        names = by_module.get(f)
        if names:
            affected.update(names)

    if full_reason:
        print(f"shared infrastructure changed ({full_reason}) -> full suite:")
        print("  python -m pytest tests/ -q")
        print("  python bench.py")
        return
    if not affected:
        print("changed files register no queries (docs/tests/tools only);")
        print("run the test files matching the change directly.")
        for f in files:
            print(f"  {f}")
        return

    names = sorted(affected)
    print(f"{len(names)} affected queries from {len(files)} changed file(s):")
    for n in names:
        print(f"  {n}")
    kexpr = " or ".join(names)
    print("\noracle parity (both SFs):")
    print(f'  python -m pytest tests/test_oracle.py -q -k "{kexpr}"')
    print("plan hygiene:")
    print(f'  python -m pytest tests/test_plan_sweep.py -q -k "{kexpr}"')
    print("bench slice:")
    print(f"  python bench.py --queries {','.join(names)}")


if __name__ == "__main__":
    main()
