"""Set operations (SURVEY.md §2.7).

union_all mirrors the reference's request+response audit-stream merge
(`$log->add($req); $log->add($resp)`, kinesis-pay.php:460-461);
intersect/except complete the relational surface.

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions.
INTERSECT / EXCEPT ALL shuffle on the full row — at 100 TB project to
the key columns first (as these queries do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "set_union_all",
    oracle="""
SELECT event_id, user_id, 'request' AS log_kind, value FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, user_id, 'response' AS log_kind, value FROM events WHERE event_type = 'view'
""",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:460-461 — merge request- and response-log
    records into one audit stream, tagged by origin."""
    ev = load(spark, sf_dir, "events")
    req = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("request").alias("log_kind"), "value"
    )
    resp = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit("response").alias("log_kind"), "value"
    )
    return req.unionByName(resp)


@register(
    "set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'signup'
""",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV]: users present in both segments (INTERSECT = distinct)."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 190
EXCEPT
SELECT user_id FROM events WHERE event_type = 'signup' AND value > 190
""",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV]: high-value purchasers minus high-value signups
    (EXCEPT = distinct; predicates chosen so the result is non-empty
    at every sf)."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 190)).select(
        "user_id"
    )
    b = ev.filter((F.col("event_type") == "signup") & (F.col("value") > 190)).select(
        "user_id"
    )
    return a.subtract(b)
