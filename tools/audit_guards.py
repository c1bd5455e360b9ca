#!/usr/bin/env python
"""Degenerate-input audit: list every sqrt()/ln() callsite in every
registered oracle so a reviewer can check each argument is guarded
against the cross-engine divergence class ADVICE r9 found three times
and the r10 sweep found four more of:

  * sqrt(tiny-negative) — a single-pass variance (ss - s*s/n) rounds
    below 0 on a constant-valued cell: DuckDB throws Out of Range,
    Spark returns NaN. Guard: `WHERE var > 0` on BOTH engines, or
    GREATEST(expr, 0.0) when the form is mathematically >= 0
    (delta-method quadratic form, per-key gap variance).
  * ln(0) — an md5-derived uniform hits an exact edge (u in {0, .5, 1},
    p = 2^-48 per key): DuckDB throws, Spark returns NULL. Guard:
    GREATEST(arg, 3.552713678800501e-15) with the IDENTICAL literal in
    both expression trees (the sample_weighted_gumbel convention).
  * x / 0 — ANSI Spark (the driver default) THROWS on double division
    by zero where DuckDB returns NULL — a zero denominator must be
    filtered identically on both engines, never left to engine
    semantics.

A fourth class greps can NOT catch (VERDICT r10 #1/#2): silent
engine-side type promotion — DuckDB 1.0.0's LEAST/GREATEST over
DECIMAL return DOUBLE, turning an intended-exact decimal SUM into an
order-dependent parallel DOUBLE sum.  `--typeof` delegates to
tools/audit_sum_typeof.py which evaluates typeof() of every SUM input
of every oracle on DuckDB and flags DOUBLE sums whose argument never
asked for double.

Run: python tools/audit_guards.py            # full sqrt/ln listing
     python tools/audit_guards.py --unguarded-hint   # callsites with no
                                  GREATEST/NULLIF/guard token nearby
     python tools/audit_guards.py --typeof   # SUM-input typeof audit
                                  (exit 1 on any flag or probe error)

tests/test_degenerate_guards.py executes the guarded entries on a
zero-variance fixture; a NEW sqrt/ln entry should be added there when
this audit flags it.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GUARD_TOKENS = ("GREATEST", "NULLIF", "nullif", "> 0", ">= 1", "+ 0.5", "+ 1")


def main() -> int:
    if "--typeof" in sys.argv:
        from tools import audit_sum_typeof

        return audit_sum_typeof.main()
    from am_kinesis_pay_spark.registry import REGISTRY, queries

    queries()  # populate the registry
    hint_only = "--unguarded-hint" in sys.argv
    n_sites = 0
    n_flagged = 0
    for name in sorted(REGISTRY):
        sql = REGISTRY[name].oracle or ""
        for m in re.finditer(r"\b(sqrt|ln)\s*\(", sql):
            n_sites += 1
            lo = max(0, m.start() - 120)
            ctx = sql[lo : m.start() + 140].replace("\n", " ")
            guarded = any(tok in ctx for tok in GUARD_TOKENS)
            if hint_only and guarded:
                continue
            n_flagged += not guarded
            mark = "  " if guarded else "!! "
            print(f"{mark}{name:32s} {m.group(1):4s} | {ctx[-140:]}")
    print(
        f"\n{n_sites} sqrt/ln oracle callsites; "
        f"{n_flagged} with no guard token in context "
        "(heuristic — review each; positive-by-construction args like "
        "ln(count>=1 / total) need no guard)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
