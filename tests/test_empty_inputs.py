"""Robustness sweep: every registered query must run (not crash) on
EMPTY inputs with the production schemas — the degenerate case every
100 TB pipeline hits on a fresh partition or an all-filtered day."""

from __future__ import annotations

import os

import pytest

from am_kinesis_pay_spark.registry import queries
from am_kinesis_pay_spark.tables import TABLES, load

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        load(spark, SF_DIR, t).limit(0).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.mark.parametrize("name", sorted(queries().keys()))
def test_query_survives_empty_tables(spark, empty_dir, name):
    df = queries()[name](spark, empty_dir)
    assert df.count() >= 0
