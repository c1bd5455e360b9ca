"""Projections / filters / predicates (SURVEY.md §2.2).

Each query mirrors a concrete predicate chain in the reference; all are
single-table scans, so at 100 TB every one of these is a pure
map-side pipeline: predicate pushdown into the parquet scan, column
pruning, zero shuffles (verified via explain() in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "filter_free_first",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE CAST(o_totalprice AS DOUBLE) <= 25000.0 AND o_orderstatus = 'O'
""",
    tags=("filter",),
)
def filter_free_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:124-128 — the free-first-payment bypass
    (`first_total <= 0 AND is_first_payment`) as a conjunctive
    short-circuit filter."""
    return (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_totalprice").cast("double") <= 25000.0)
            & (F.col("o_orderstatus") == "O")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "filter_status_terminal",
    oracle="""
SELECT event_id, user_id, event_type,
  CASE WHEN event_type IN ('purchase', 'signup') THEN 'terminal' ELSE 'pending' END AS route
FROM events
WHERE event_type IN ('purchase', 'signup', 'error')
""",
    tags=("filter",),
)
def filter_status_terminal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:239-249,323 — route on terminal status
    (processed/rejected/expired vs pending) via isin + when/otherwise."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("purchase", "signup", "error")).select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.col("event_type").isin("purchase", "signup"), "terminal")
        .otherwise("pending")
        .alias("route"),
    )


@register(
    "filter_paysys_match",
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE event_type = 'click' AND props IS NOT NULL AND value IS NOT NULL
""",
    tags=("filter",),
)
def filter_paysys_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:29-31,46 — render only when paysys_id
    matches AND amount_paid IS NOT NULL: conjunctive filter with
    null-guards."""
    return (
        load(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "click")
            & F.col("props").isNotNull()
            & F.col("value").isNotNull()
        )
        .select("event_id", "user_id", "value")
    )


@register(
    "filter_http_ok",
    oracle="""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS code,
  CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS BIGINT) AS code_class
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) BETWEEN 20 AND 29
""",
    tags=("filter", "json"),
)
def filter_http_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:152-156 — keep 2xx responses, classify by
    ``floor(code/100)``; props.k stands in for the HTTP status code
    (exercises fn_json_get + fn_floor_div on the same path)."""
    ev = load(spark, sf_dir, "events")
    code = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_id", code.alias("code"))
        .filter(F.col("code").between(20, 29))
        .withColumn("code_class", F.floor(F.col("code") / 10).cast("bigint"))
    )


@register(
    "filter_mod_sample",
    oracle="""
SELECT event_id, user_id, event_type
FROM events
WHERE event_id % 10 = 0
""",
    tags=("filter",),
)
def filter_mod_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:302-304 — 1-in-10 log sampling
    (``pcount % 10 == 0``)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 10 == 0)
        .select("event_id", "user_id", "event_type")
    )


@register(
    "project_payment_request",
    oracle="""
SELECT o_orderkey,
  printf('{"globalMerchantId":"%s","amount":"%.2f"}', 'merchant-42', CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.85 AS DECIMAL(4,2)), 2) AS DOUBLE)) AS payload
FROM orders
WHERE o_orderstatus = 'O'
""",
    tags=("project", "json"),
)
def project_payment_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:143-151 — construct the payment-request
    payload {globalMerchantId, amount} with the 2-dp half-up amount
    (number_format, kinesis-pay.php:140). printf/format_string is used
    instead of to_json so byte-level output matches the oracle."""
    orders = load(spark, sf_dir, "orders")
    amount = F.round(
        F.col("o_totalprice").cast("decimal(18,2)") * F.lit("0.85").cast("decimal(4,2)"),
        2,
    ).cast("double")
    return orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.format_string(
            '{"globalMerchantId":"%s","amount":"%.2f"}', F.lit("merchant-42"), amount
        ).alias("payload"),
    )


@register(
    "validate_chain",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'F'
  AND o_totalprice > 1000.0
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
""",
    tags=("filter",),
)
def validate_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:520-537 — the transaction validator chain
    (source ∧ status='processed' ∧ terms) as one conjunctive filter;
    Catalyst collapses it into a single scan predicate."""
    return (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") > 1000.0)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "predicate_configured",
    oracle="""
SELECT COUNT(*) AS n_configured
FROM customer
WHERE c_name IS NOT NULL AND c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
""",
    tags=("filter",),
)
def predicate_configured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:115-118 — tri-field configured check
    (merchant_id ∧ access_token ∧ secret_token all present)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(
            F.col("c_name").isNotNull()
            & F.col("c_mktsegment").isNotNull()
            & F.col("c_acctbal").isNotNull()
        )
        .agg(F.count(F.lit(1)).alias("n_configured"))
    )
