"""Property test for the money-rounding convention (SURVEY.md §2.8
fn_round_halfup): the DECIMAL pipeline must reproduce PHP
number_format's round-half-away-from-zero on both engines for any
representable money value — hypothesis drives DuckDB (fast, no Spark
session) against Python's Decimal ROUND_HALF_UP reference; the Spark
side of the same convention is pinned by the fn_money_pipeline oracle
test."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings, strategies as st

con = duckdb.connect()

money = st.decimals(
    min_value=Decimal("-999999.9999"),
    max_value=Decimal("999999.9999"),
    places=4,
    allow_nan=False,
    allow_infinity=False,
)


@settings(max_examples=300, deadline=None)
@given(money)
def test_duckdb_decimal_round_is_half_up(x: Decimal):
    got = con.execute(
        "SELECT round(CAST(? AS DECIMAL(18,4)), 2)", [str(x)]
    ).fetchone()[0]
    want = x.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    assert Decimal(str(got)).quantize(Decimal("0.01")) == want, (x, got, want)


@settings(max_examples=200, deadline=None)
@given(money, st.decimals(min_value=Decimal("0.01"), max_value=Decimal("9.99"),
                          places=2, allow_nan=False, allow_infinity=False))
def test_duckdb_decimal_multiply_round_exact(x: Decimal, pct: Decimal):
    """The full reference arithmetic (total × pct then round 2,
    kinesis-pay.php:137-140) in exact decimals."""
    got = con.execute(
        "SELECT round(CAST(? AS DECIMAL(18,4)) * CAST(? AS DECIMAL(4,2)), 2)",
        [str(x), str(pct)],
    ).fetchone()[0]
    want = (x * pct).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    assert Decimal(str(got)).quantize(Decimal("0.01")) == want, (x, pct, got, want)


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=0, max_value=2 * 10**18))
def test_fixed_point_damping_decomposition(mass: int):
    """graph_pagerank damps in int64-safe split form: 17*(m div 20) +
    (17*(m mod 20)) div 20 must equal the direct (17*m) div 20 for
    every non-negative mass (m = 20q+r → 17m = 340q+17r → div 20 =
    17q + (17r div 20)); the split never exceeds ~1.7e18 < 2^63."""
    assert 17 * (mass // 20) + (17 * (mass % 20)) // 20 == (17 * mass) // 20
    assert 17 * (mass // 20) + (17 * (mass % 20)) // 20 < 2**63


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2 * 10**18))
def test_fixed_point_damping_matches_engines(mass: int):
    """The same split form evaluates identically in DuckDB integer
    arithmetic (the oracle's expression)."""
    got = con.execute(
        "SELECT 17 * (CAST(? AS BIGINT) // 20)"
        " + (17 * (CAST(? AS BIGINT) % 20)) // 20",
        [mass, mass],
    ).fetchone()[0]
    assert got == (17 * mass) // 20


# --- fixed-point floor quantization (the iterative-query discipline) ----
#
# text_classifier_train's oracle-checkability rests on this claim:
# floor(v * 10^s + 0.5) is the SAME IEEE op chain in both engines, so
# unlike round(double, s) — where Spark rounds the shortest decimal
# repr while DuckDB rounds the scaled binary, disagreeing on ~1.2e-3
# of ratio-of-small-int values at scale 9 — the floor form cannot
# drift. Pin both halves: floor agreement on the adversarial
# population, and the round() disagreement staying nonzero (if an
# engine change ever makes round() safe, we want to KNOW — the
# comment in curation.py would then overstate the hazard).


def test_fixed_point_floor_agrees_where_round_disagrees(spark):
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    n = 120_000
    a = rng.integers(1, 60, n)
    b = rng.integers(1, 60, n)
    w = np.round(rng.uniform(-0.05, 0.05, n), 9)
    vals = w * (a / b)

    con.register("fpvals", pa.table({"v": vals}))
    d_floor = con.execute(
        "SELECT CAST(floor(v * 1000000000.0 + 0.5) AS BIGINT) FROM fpvals"
    ).fetchnumpy()
    d_floor = next(iter(d_floor.values()))
    d_round = con.execute(
        "SELECT round(v, 9) FROM fpvals"
    ).fetchnumpy()
    d_round = next(iter(d_round.values()))

    sdf = spark.createDataFrame(pa.table({"v": vals}).to_pandas())
    s_rows = sdf.select(
        F.floor(F.col("v") * 1000000000.0 + 0.5).alias("f"),
        F.round("v", 9).alias("r"),
    ).collect()
    s_floor = np.array([r["f"] for r in s_rows])
    s_round = np.array([r["r"] for r in s_rows])

    assert int(np.sum(d_floor != s_floor)) == 0
    n_round_diff = int(np.sum(d_round != s_round))
    assert n_round_diff > 0, (
        "round(double, 9) now agrees cross-engine on the adversarial "
        "population — revisit the fixed-point rationale in "
        "llm/curation.py (text_classifier_train)"
    )
