"""Window functions (SURVEY.md §2.5, W1–W5).

Scale notes: every window here partitions by a high-cardinality key
(payment/user/customer), so state per partition is small and the
single shuffle per window spec is the floor. W4's global ORDER BY
window is the one deliberate exception — documented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "win_poll_seq",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS poll_seq
FROM events
""",
    tags=("window",),
)
def win_poll_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 [REF]: the monotone per-payment poll counter (`pollCount++`,
    kinesis-pay.php:231-233) as row_number per key ordered by time."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    return ev.select(
        "event_id", "user_id", "ts", F.row_number().over(w).alias("poll_seq")
    )


@register(
    "win_rank_topk",
    oracle="""
WITH spend AS (
  SELECT c.c_nationkey, c.c_custkey,
    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, c.c_custkey
)
SELECT c_nationkey, c_custkey, total_spend,
  RANK() OVER (PARTITION BY c_nationkey ORDER BY total_spend DESC, c_custkey) AS spend_rank,
  DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY total_spend DESC, c_custkey) AS spend_dense_rank
FROM spend
""",
    tags=("window",),
)
def win_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 [DRV]: rank / dense_rank of customers by spend per nation.
    c_custkey tie-break keeps ranks deterministic across engines."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    spend = (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend")
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return spend.select(
        "c_nationkey",
        "c_custkey",
        "total_spend",
        F.rank().over(w).alias("spend_rank"),
        F.dense_rank().over(w).alias("spend_dense_rank"),
    )


@register(
    "win_lag_status_change",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev_type
  FROM events
)
SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, prev_type, event_type
FROM seq
WHERE prev_type IS NOT NULL AND prev_type <> event_type
""",
    tags=("window",),
)
def win_lag_status_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 [REF]: status-transition detection between consecutive polls
    (pending→processed etc., kinesis-pay.php:239-249) via lag()."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    return (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "ts", "prev_type", "event_type")
    )


@register(
    "win_running_total",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
""",
    tags=("window",),
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 [DRV]: cumulative value over time per user. Partitioned by
    user_id — a truly global running total would serialize into one
    task at 100 TB; per-key framing is the scalable form (a global one
    would be two-pass: per-partition sums + prefix-broadcast)."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "running_value"
        ),
    )


@register(
    "win_frame_sliding_avg",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS sliding_avg
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def win_frame_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 [DRV]: trailing-24h moving average per user over a RANGE
    frame keyed on epoch seconds (range frames over timestamps differ
    between engines; integer seconds are portable). AVG is decomposed
    into exact-SUM/COUNT for cross-engine float determinism."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-86400, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("sliding_avg"),
    )
