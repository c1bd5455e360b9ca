"""t2-style oracle parity: every registered query with an oracle must
match DuckDB exactly — at the default test SF *and* at sf0.01, the
scale the driver actually checks (value-level sf-dependence — ties,
overflow, .xx5 rounding boundaries — only shows up at the bigger SF;
r1's q_priority_shipping HUGEINT bug was exactly this class)."""

from __future__ import annotations

import os

import pytest

from am_kinesis_pay_spark.registry import REGISTRY, queries

from tests.conftest import SF_DIR, compare_query

_ALL = sorted(queries().keys())
_WITH_ORACLE = [n for n in _ALL if REGISTRY[n].oracle is not None]
_ROWS_ONLY = [n for n in _ALL if REGISTRY[n].oracle is None]

_DRIVER_SF_DIR = "/root/testdata/sf0.01"
_SF_DIRS = [SF_DIR]
if os.path.isdir(_DRIVER_SF_DIR) and os.path.realpath(
    _DRIVER_SF_DIR
) != os.path.realpath(SF_DIR):
    _SF_DIRS.append(_DRIVER_SF_DIR)


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, ducks_for, name, sf_dir):
    compare_query(spark, ducks_for(sf_dir), name, sf_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = queries()[name](spark, SF_DIR)
    assert df.count() >= 0
