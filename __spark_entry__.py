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

    13 entries are DELIBERATELY absent (rows-only BY DESIGN, not an
    error — each is provably outside an exact SQL oracle's reach, and
    each carries a pytest pinning its semantics another way plus,
    where the entry is a sketch, an inline tested accuracy column):

    - Engine-specific sketches: ``agg_approx_distinct``,
      ``agg_hll_partitioned`` (Spark HLL — different estimator/hash
      than anything DuckDB can run; exact twins agg_distinct_users /
      agg_bitmap_distinct ARE oracle-checked; within_tol audit
      columns asserted in tests/test_engine.py),
      ``agg_percentile_approx`` (rank-error audit inline).
    - Order-dependent iterative float accumulation: ``emb_kmeans``,
      ``emb_pca_power``, ``emb_label_centroids`` (its _long twin IS
      oracle-checked), ``vec_ann_pq`` / ``vec_ann_ivf_pq`` (trained
      PQ codebooks; inline recall_at_k audit columns since r9,
      value-checked in tests/test_llm.py).
    - Iterative argmax recurrences: ``text_bpe_train``,
      ``text_bpe_train_batched``, ``text_bpe_encode`` (exact parity
      vs an independent pure-Python BPE pinned in tests/test_llm.py).
    - ``fn_hmac_sign`` (DuckDB sha256 is VARCHAR-only — HMAC's
      raw-byte inner digest is inexpressible; digests pinned vs
      Python hmac) and ``source_parquet_footer_stats`` (physical
      footer metadata, not derivable from logical rows).

    The machine-readable copy of this list (with per-entry reasons)
    is tools/correctness_full.py::ROWS_ONLY_REASONS, embedded in each
    round's CORRECTNESS_full_r{N}.json."""
    return _registry.oracle_sql()
