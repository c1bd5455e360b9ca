"""Sorts / limits / top-k (SURVEY.md §2.6).

Scale notes: ORDER BY + LIMIT k plans as TakeOrderedAndProject — each
task keeps a k-sized heap and only k·partitions rows reach the driver,
so S1 is safe at any scale. S2 (top-k per group) is a single window
shuffle; no global sort ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "sort_limit",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 25
""",
    tags=("sort",),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 [DRV]: ORDER BY + LIMIT (top-25 customers by balance).
    c_custkey tie-break makes the LIMIT cut deterministic — without it
    two engines may legitimately return different row sets."""
    return (
        load(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(25)
    )


@register(
    "topk_per_group",
    oracle="""
SELECT c_nationkey, c_custkey, c_acctbal, rn
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
  FROM customer
)
WHERE rn <= 3
""",
    tags=("sort",),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 [REF]: first-per-key — the best-bid `bids[0]` top-of-book
    pattern (kinesis-pay.php:484) generalized to top-3 per nation."""
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "sort_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'F'
ORDER BY o_totalprice DESC, o_orderkey
""",
    tags=("sort",),
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 [DRV]: full global ORDER BY (no LIMIT) — plans as a
    range-partitioned total sort: Spark samples the sort key to build
    range bounds, each partition sorts locally, partitions concatenate
    in order. The scalable total-order path (contrast sort_limit's
    TakeOrderedAndProject, which is top-k only). The driver's
    value-hash is order-insensitive, so the ordering property itself
    is pinned by the RangePartitioning plan assertion in
    tests/test_plans.py."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@register(
    "sort_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
""",
    tags=("sort",),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: ORDER BY ... LIMIT k OFFSET n with a deterministic
    total order (price, key tie-break). Spark plans offset+limit as a
    single TakeOrderedAndProject-style collect of the first n+k rows —
    fine for page-sized n; deep pagination at 100 TB should switch to
    keyset pagination (WHERE (price, key) < last-seen), which is the
    same plan as lookup_by_secure_id."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(40)
        .limit(20)
    )
