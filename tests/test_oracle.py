"""t2-style oracle parity: every registered query with an oracle must
match DuckDB exactly (same check the driver runs at sf0.01)."""

from __future__ import annotations

import pytest

from am_kinesis_pay_spark.registry import REGISTRY, queries

from tests.conftest import SF_DIR, compare_query

_ALL = sorted(queries().keys())
_WITH_ORACLE = [n for n in _ALL if REGISTRY[n].oracle is not None]
_ROWS_ONLY = [n for n in _ALL if REGISTRY[n].oracle is None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, ducks, name):
    compare_query(spark, ducks, name, SF_DIR)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = queries()[name](spark, SF_DIR)
    assert df.count() >= 0
