"""Silent-type-promotion audit over every oracle's SUM inputs.

VERDICT r10 #2: the `agg_winsorized_stats` oracle shipped two rounds
with `SUM(LEAST(GREATEST(v, lo), hi) * cnt)` where DuckDB 1.0.0's
LEAST/GREATEST over DECIMAL silently return DOUBLE — a parallel
order-dependent DOUBLE sum whose 6-dp round flips at 1-ULP
boundaries, so the oracle hash match was luck.  Greps and docstrings
cannot catch this class; only evaluating `typeof()` of the actual
aggregate input on DuckDB can.

For EVERY oracle in the registry this tool:

1. finds each `SUM(<arg>)` callsite (plain, DISTINCT, FILTER, and
   windowed `SUM(...) OVER`) with a balanced-paren scan over the
   string-literal-masked SQL;
2. locates the innermost enclosing SELECT block and rebuilds that
   block's FROM/JOIN/WHERE context (CTEs stay in scope because the
   probe reuses the oracle's full WITH clause — DuckDB permits unused
   CTE entries);
3. executes `SELECT typeof(<arg>), typeof(<each column ref in arg>)
   ... LIMIT 1` on DuckDB over the sf parquet views;
4. FLAGS the callsite when typeof(arg) is DOUBLE/FLOAT but nothing in
   the argument says double on purpose: no `CAST(... AS DOUBLE)`, no
   `::DOUBLE`, no float literal, no division, no double-returning
   math function (ln/exp/sqrt/power/...), and every column reference
   the argument reads is itself non-DOUBLE.  That conjunction is
   exactly the silent-promotion signature: decimal/integer in, DOUBLE
   out, author never asked for DOUBLE.

The unfixed winsorized text flags (pinned as a canary in
tests/test_sum_typeof_audit.py); the fixed registry must produce ZERO
flags and ZERO unparseable callsites — both asserted in that test and
by `python tools/audit_guards.py --typeof` (exit 1 on any flag).

Scope note: AVG/stddev inputs are deliberately out of scope — DuckDB
computes them in floating point regardless of input type, so their
input type cannot create a NEW order-dependence the output type
doesn't already show (and the result-schema audit in
tools/oracle_type_audit.py pins output types for every oracle).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SQL keywords / type names that a column-ref scan must skip.
_NON_REFS = {
    "case", "when", "then", "else", "end", "and", "or", "not", "null",
    "is", "in", "like", "between", "as", "cast", "distinct", "filter",
    "where", "over", "partition", "by", "order", "rows", "range",
    "preceding", "following", "unbounded", "current", "row", "interval",
    "true", "false", "double", "float", "real", "decimal", "numeric",
    "bigint", "int", "integer", "smallint", "tinyint", "hugeint",
    "varchar", "text", "date", "timestamp", "boolean", "escape",
    "day", "days", "month", "months", "year", "years", "hour", "hours",
    "minute", "minutes", "second", "seconds", "asc", "desc", "nulls",
    "first", "last",
}

# Functions documented to return DOUBLE on DuckDB — their presence in
# a SUM argument means the author opted into floating point.
_DOUBLE_FUNCS = (
    "ln", "log", "log2", "log10", "exp", "sqrt", "cbrt", "power",
    "pow", "random", "pi", "degrees", "radians", "sin", "cos", "tan",
    "asin", "acos", "atan", "atan2", "sinh", "cosh", "tanh", "gamma",
    "lgamma",
)

_EXPLICIT_DOUBLE = re.compile(
    r"(::\s*(double|float|real)\b)|(\bas\s+(double|float|real)\b)"
    r"|(\d\.\d)|(\d+e[+-]?\d)|(/)"
    + "".join(f"|(\\b{f}\\s*\\()" for f in _DOUBLE_FUNCS),
    re.IGNORECASE,
)

_REF_RE = re.compile(r"\b[a-zA-Z_][\w]*(?:\.[a-zA-Z_][\w]*)?\b")


def mask_literals(sql: str) -> str:
    """Blank out single-quoted string literals and -- comments so the
    paren/keyword scan never trips on quoted text (lengths and
    positions are preserved)."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            for k in range(i, j):
                out[k] = " "
            i = j
        else:
            i += 1
    return "".join(out)


def _depths(masked: str) -> list[int]:
    d, out = 0, []
    for c in masked:
        if c == "(":
            out.append(d)
            d += 1
        elif c == ")":
            d -= 1
            out.append(d)
        else:
            out.append(d)
    return out


def find_sum_args(masked: str, original: str) -> list[tuple[int, str]]:
    """Return [(pos_of_sum, arg_text), ...] for every SUM callsite.
    Strips a leading DISTINCT from the argument."""
    sites = []
    for m in re.finditer(r"\bsum\s*\(", masked, re.IGNORECASE):
        start = m.end()  # first char after '('
        depth = 1
        j = start
        while j < len(masked) and depth > 0:
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        arg = original[start : j - 1].strip()
        arg = re.sub(r"^\s*distinct\b", "", arg, flags=re.IGNORECASE).strip()
        sites.append((m.start(), arg))
    return sites


def _enclosing_select(masked: str, depths: list[int], pos: int) -> int:
    """Position of the innermost SELECT whose block contains pos."""
    best = -1
    for m in re.finditer(r"\bselect\b", masked, re.IGNORECASE):
        s = m.start()
        if s >= pos:
            break
        # the SELECT encloses pos iff no paren between s and pos closes
        # below the SELECT's own depth
        if depths[s] <= depths[pos] and min(depths[s:pos]) >= depths[s]:
            best = s
    return best


def _block_from_context(masked: str, original: str, depths: list[int],
                        sel_pos: int) -> str | None:
    """FROM/JOIN/WHERE text of the SELECT block at sel_pos, with
    GROUP BY/HAVING/QUALIFY/ORDER BY/LIMIT/UNION stripped."""
    base = depths[sel_pos]
    end = len(masked)
    for j in range(sel_pos, len(masked)):
        if depths[j] < base:
            end = j
            break
    block_masked = masked[sel_pos:end]
    block_orig = original[sel_pos:end]
    rel_depths = _depths(block_masked)
    from_m = None
    for m in re.finditer(r"\bfrom\b", block_masked, re.IGNORECASE):
        if rel_depths[m.start()] == 0:
            from_m = m
            break
    if from_m is None:
        return None
    cut = len(block_masked)
    tail_kw = re.compile(
        r"\b(group\s+by|having|qualify|window|order\s+by|limit|union)\b",
        re.IGNORECASE,
    )
    for m in tail_kw.finditer(block_masked, from_m.end()):
        if rel_depths[m.start()] == 0:
            cut = m.start()
            break
    return block_orig[from_m.end():cut].strip()


def _with_clause(masked: str, original: str) -> str:
    """The oracle's full WITH clause (empty string if none): text up to
    the final top-level SELECT."""
    if not re.match(r"\s*with\b", masked, re.IGNORECASE):
        return ""
    depths = _depths(masked)
    for m in re.finditer(r"\bselect\b", masked, re.IGNORECASE):
        # first top-level SELECT = start of the main query; cutting at
        # a later one would drag a dangling UNION branch into the probe
        if depths[m.start()] == 0:
            return original[: m.start()]
    return ""


def column_refs(arg_masked: str) -> list[str]:
    """Identifier tokens in a SUM argument that are column references
    (not function calls, not keywords)."""
    refs = []
    for m in _REF_RE.finditer(arg_masked):
        tok = m.group(0)
        after = arg_masked[m.end():].lstrip()
        if after.startswith("("):
            continue  # function call
        parts = tok.lower().split(".")
        if len(parts) == 1 and parts[0] in _NON_REFS:
            continue
        if tok not in refs:
            refs.append(tok)
    return refs


def audit_sql(con, sql: str, entry: str = "?") -> list[dict]:
    """Audit one oracle text. Returns a list of per-SUM-site records:
    {entry, arg, t_arg, ref_types, verdict, detail} where verdict is
    'ok' | 'flag' | 'probe_error'."""
    masked = mask_literals(sql)
    depths = _depths(masked)
    with_txt = _with_clause(masked, sql)
    records = []
    for pos, arg in find_sum_args(masked, sql):
        rec = {"entry": entry, "arg": " ".join(arg.split())[:120]}
        sel = _enclosing_select(masked, depths, pos)
        if sel < 0:
            rec.update(verdict="probe_error", detail="no enclosing SELECT")
            records.append(rec)
            continue
        ctx = _block_from_context(masked, sql, depths, sel)
        if ctx is None:
            rec.update(verdict="probe_error", detail="no FROM in block")
            records.append(rec)
            continue
        arg_masked = mask_literals(arg)
        refs = column_refs(arg_masked)
        probes = [f"typeof({arg}) AS t_arg"] + [
            f"typeof({r}) AS t_ref_{i}" for i, r in enumerate(refs)
        ]
        probe_sql = f"{with_txt} SELECT {', '.join(probes)} FROM {ctx} LIMIT 1"
        try:
            row = con.execute(probe_sql).fetchone()
        except Exception as e:  # noqa: BLE001 — record, reviewed by test
            rec.update(verdict="probe_error", detail=str(e).split("\n")[0][:200])
            records.append(rec)
            continue
        if row is None:  # empty relation: type still unknowable — treat ok
            rec.update(verdict="ok", detail="empty relation", t_arg=None)
            records.append(rec)
            continue
        t_arg = row[0].upper()
        ref_types = {r: row[1 + i].upper() for i, r in enumerate(refs)}
        rec.update(t_arg=t_arg, ref_types=ref_types)
        if not (t_arg.startswith("DOUBLE") or t_arg.startswith("FLOAT")):
            rec.update(verdict="ok", detail="non-floating sum input")
        elif _EXPLICIT_DOUBLE.search(arg_masked):
            rec.update(verdict="ok", detail="explicit double in argument")
        elif any(t.startswith(("DOUBLE", "FLOAT")) for t in ref_types.values()):
            rec.update(verdict="ok", detail="double column reference")
        else:
            rec.update(
                verdict="flag",
                detail=(
                    "silent promotion: SUM input is DOUBLE but every "
                    "referenced column is "
                    + (",".join(sorted(set(ref_types.values()))) or "unknown")
                    + " and the argument never asks for double"
                ),
            )
        records.append(rec)
    return records


def audit_registry(sf_dir: str) -> list[dict]:
    import duckdb

    from am_kinesis_pay_spark.registry import REGISTRY, queries
    from am_kinesis_pay_spark.tables import TABLES

    queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    records = []
    for name in sorted(REGISTRY):
        sql = REGISTRY[name].oracle
        if not sql:
            continue
        records.extend(audit_sql(con, sql, entry=name))
    con.close()
    return records


def main() -> int:
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = positional[0] if positional else os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    records = audit_registry(sf_dir)
    flags = [r for r in records if r["verdict"] == "flag"]
    errs = [r for r in records if r["verdict"] == "probe_error"]
    for r in flags:
        print(f"FLAG  {r['entry']:36s} SUM({r['arg']}) -> {r['t_arg']}")
        print(f"      {r['detail']}")
    for r in errs:
        print(f"ERR   {r['entry']:36s} SUM({r['arg']})")
        print(f"      {r['detail']}")
    n_ok = sum(r["verdict"] == "ok" for r in records)
    print(
        f"\n{len(records)} SUM callsites probed across the registry: "
        f"{n_ok} ok, {len(flags)} flagged, {len(errs)} probe errors"
    )
    return 1 if (flags or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
