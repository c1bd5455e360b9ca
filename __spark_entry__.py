"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``am_kinesis_pay_spark.registry`` — every operator
from SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame callable
plus (when SQL-expressible) a DuckDB oracle SQL string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from am_kinesis_pay_spark import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (agg_pricing_summary, SURVEY.md §2.4 A1) on sf0.001."""
    return _registry.queries()["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query.

    Two entries are DELIBERATELY absent — ``agg_approx_distinct`` and
    ``agg_hll_partitioned`` use Spark's HLL sketches, which no DuckDB
    SQL reproduces (different estimator, different hash). Per the
    driver contract their check is rows-only BY DESIGN, not an error;
    their exact twins (``agg_distinct_users``, ``agg_bitmap_distinct``)
    are oracle-checked, and since r6 each sketch row carries its own
    ``within_tol`` audit column (approx vs exact, 3-sigma rtol)
    asserted in tests/test_engine.py, so even a rows-only sample shows
    estimator sanity inline."""
    return _registry.oracle_sql()
