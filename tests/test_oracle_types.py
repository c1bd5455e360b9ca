"""Arrow-type parity between every DuckDB oracle and its Spark query.

`tests/test_oracle.py` compares Python values, which erases type
distinctions the driver's value-hasher can see (round 1's only red row,
`q_priority_shipping`, was a DuckDB HUGEINT vs Spark BIGINT divergence
with identical values).  This suite asserts the Arrow schema DuckDB
produces for each oracle matches the Spark result schema exactly, so
any new oracle with an uncast SUM / ROW_NUMBER / length() output fails
here before the driver ever sees it.
"""

from __future__ import annotations

import pytest

from am_kinesis_pay_spark.registry import REGISTRY, queries

from tests.conftest import SF_DIR

_WITH_ORACLE = sorted(n for n in queries() if REGISTRY[n].oracle is not None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_arrow_types(spark, name):
    from tools.oracle_type_audit import audit

    bad = audit(spark, SF_DIR, names=[name])
    assert not bad, f"type mismatches (col, spark, duck): {bad}"
