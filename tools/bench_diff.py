#!/usr/bin/env python
"""Diff two full bench snapshots (BENCH_local_r{N}.json, written by
bench.py) and print the top per-query regressions/improvements, plus
queries added or removed — so each round's verdict can compare every
query against the previous round without rerunning anything.

Usage:
    python tools/bench_diff.py                 # latest two snapshots
    python tools/bench_diff.py r6 r7           # explicit rounds
    python tools/bench_diff.py --top 20
"""

from __future__ import annotations

import argparse
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _snapshots() -> dict[int, str]:
    out = {}
    for f in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_local_r(\d+)\.json", f)
        if m:
            out[int(m.group(1))] = os.path.join(REPO, f)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?", help="round tag like r6 (default: second-newest)")
    ap.add_argument("new", nargs="?", help="round tag like r7 (default: newest)")
    ap.add_argument("--top", type=int, default=12, help="rows per direction")
    args = ap.parse_args()

    snaps = _snapshots()
    if not snaps:
        raise SystemExit("no BENCH_local_r*.json snapshots found; run bench.py first")

    def pick(tag: str | None, default_idx: int) -> tuple[int, str]:
        if tag is not None:
            n = int(tag.lstrip("r"))
            if n not in snaps:
                raise SystemExit(f"no snapshot for round {n}; have {sorted(snaps)}")
            return n, snaps[n]
        order = sorted(snaps)
        if len(order) < 2 and default_idx == -2:
            raise SystemExit(f"need two snapshots to diff; have {sorted(snaps)}")
        return order[default_idx], snaps[order[default_idx]]

    n_new, p_new = pick(args.new, -1)
    n_old, p_old = pick(args.old, -2)
    old = json.load(open(p_old))
    new = json.load(open(p_new))
    qo, qn = old["queries"], new["queries"]

    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    common = sorted(set(qn) & set(qo))
    deltas = sorted(
        ((qn[k] - qo[k], k) for k in common), key=lambda t: -t[0]
    )

    print(
        f"r{n_old} -> r{n_new}: total {old['value']:.1f}s/{old['n_queries']}q "
        f"-> {new['value']:.1f}s/{new['n_queries']}q  "
        f"(per-query {old['sec_per_query']:.3f} -> {new['sec_per_query']:.3f})"
    )
    if added:
        print(f"added   ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    if old.get("errors") or new.get("errors"):
        print(f"errors: r{n_old}={sorted(old.get('errors', {}))} r{n_new}={sorted(new.get('errors', {}))}")

    print(f"\ntop {args.top} regressions (sec old -> new):")
    for d, k in deltas[: args.top]:
        if d <= 0:
            break
        print(f"  {d:+7.3f}  {k:40s} {qo[k]:7.3f} -> {qn[k]:7.3f}")
    print(f"\ntop {args.top} improvements:")
    for d, k in deltas[::-1][: args.top]:
        if d >= 0:
            break
        print(f"  {d:+7.3f}  {k:40s} {qo[k]:7.3f} -> {qn[k]:7.3f}")


if __name__ == "__main__":
    main()
