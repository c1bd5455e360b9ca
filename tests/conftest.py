"""Shared fixtures: one SparkSession per test run, DuckDB oracle helper.

The oracle helper mirrors the driver's t2 check: run the registered
Spark query and its DuckDB oracle SQL on the same parquet dir, then
compare row count, column names, and values (order-insensitive,
exact — the driver hashes values, so approximate equality is NOT
enough; see functions/compat.py for the decimal convention that makes
exact float equality achievable).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from am_kinesis_pay_spark.session import get_session
from am_kinesis_pay_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_session("tests")
    yield s


def _duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def ducks():
    con = _duck_con(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def ducks_for():
    """Factory fixture: one cached DuckDB connection per sf dir, for
    tests parametrized over scale factors (value-level sf-dependence —
    ties, overflow, .xx5 rounding boundaries — only shows up when the
    parity suite runs at the driver's sf too)."""
    cons: dict[str, object] = {}

    def get(sf_dir: str):
        if sf_dir not in cons:
            cons[sf_dir] = _duck_con(sf_dir)
        return cons[sf_dir]

    yield get
    for c in cons.values():
        c.close()


def normalize(rows, ndigits: int = 9):
    """Sort-key-able canonical form of a result set (order-insensitive)."""
    out = []
    for row in rows:
        canon = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon.append("NaN")
                else:
                    canon.append(v)
            elif v is None:
                canon.append(None)
            else:
                canon.append(v)
        out.append(tuple(canon))
    return sorted(out, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def compare_query(spark, ducks, name: str, sf_dir: str = SF_DIR, exact: bool = True):
    """Run registered query `name` vs its oracle; assert parity."""
    from am_kinesis_pay_spark.registry import REGISTRY, queries

    q = queries()[name]
    spec = REGISTRY[name]
    sdf = q(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    assert spec.oracle is not None, f"{name} has no oracle"
    cur = ducks.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"

    col_order = sorted(range(len(scols)), key=lambda i: scols[i])
    d_index = {c: i for i, c in enumerate(dcols)}
    s_sorted = normalize([tuple(r[i] for i in col_order) for r in srows])
    d_sorted = normalize(
        [tuple(r[d_index[scols[i]]] for i in col_order) for r in drows]
    )
    mismatches = []
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            if not exact and _approx_eq(a, b):
                continue
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches {mismatches[:5]}"


def _approx_eq(a, b):
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True
