"""The reference's payment lifecycle, composed end-to-end on Spark
(SURVEY.md §3.1 EP1–EP3 → §3.2).

Domain-schema functions (FIXTURES.md §B tables) that chain into the
full flow:

EP1  create_payment_requests: free-trial bypass → price adjustment →
     payload build → HMAC signing            (kinesis-pay.php:120-179)
EP2  triage_responses: HTTP status classes, JSON-or-plain-text body
     fallback                               (kinesis-pay.php:152-168,158-162)
     settle_transactions: dedup by global payment id → validator chain
     → conditional KAU/KAG amount           (kinesis-pay.php:513-537,507-509)
EP3  rate lookups as-of payment time        (kinesis-pay.php:468-485)
     audit_log: masked, sampled, append-only (kinesis-pay.php:302-304,446-462)

Each step is a pure DataFrame→DataFrame function so the whole lifecycle
stays one Catalyst plan — the reference's four process boundaries
(browser/PHP/API/DB) collapse into expression evaluation + one shuffle
per keyed step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from am_kinesis_pay_spark.functions.signing import SECRET, make_hmac_udf

PAYMENT_ID_KEY = "kinesis-pay-payment_id"  # kinesis-pay.php:15
AMOUNT_PAID_KEY = "kinesis-pay-amount_paid"  # kinesis-pay.php:16


def create_payment_requests(
    invoices: DataFrame,
    merchant_id: str = "merchant-42",
    percentage: float = 100.0,
    secret: str = SECRET,
) -> DataFrame:
    """EP1 (kinesis-pay.php:120-179): drop free first payments, apply
    abs(pct)/100 to the ternary-selected total, round half-up to 2 dp,
    build the JSON payload, and sign nonce.method.path.payload."""
    pct = F.lit(str(abs(percentage) / 100.0)).cast("decimal(8,4)")
    total = F.when(
        F.col("is_first_payment"), F.col("first_total")
    ).otherwise(F.col("second_total"))
    payable = invoices.filter(
        (F.col("paysys_id") == "kinesis-pay")
        & ~((F.col("first_total").cast("double") <= 0.0) & F.col("is_first_payment"))
    )
    amount = F.round(total.cast("decimal(12,2)") * pct, 2).cast("double")
    nonce = F.unix_millis(F.col("created_at"))
    payload = F.format_string(
        '{"globalMerchantId":"%s","amount":"%.2f"}', F.lit(merchant_id), amount
    )
    message = F.concat(
        nonce.cast("string"),
        F.lit("POST"),
        F.lit("/api/merchants/payment"),
        payload,
    )
    return payable.select(
        "invoice_id",
        "public_id",
        "currency",
        amount.alias("amount"),
        nonce.alias("nonce"),
        payload.alias("payload"),
        make_hmac_udf(secret)(message).alias("x_signature"),
    )


def triage_responses(status_polls: DataFrame) -> DataFrame:
    """EP2 response triage (kinesis-pay.php:152-168): class =
    floor(code/100); body parsed as JSON when possible, reference's
    plain-text fallback otherwise (:158-162) — from_json-style NULL on
    non-JSON reproduced by get_json_object returning NULL."""
    code_class = F.floor(F.col("http_code") / 100).cast("int")
    status = F.get_json_object("body", "$.status")
    return status_polls.select(
        "payment_id",
        "poll_seq",
        "ts",
        "http_code",
        code_class.alias("code_class"),
        (code_class == 2).alias("is_ok"),
        F.coalesce(status, F.lit("unparseable")).alias("status"),
        F.get_json_object("body", "$.expiryAt").alias("expiry_at_raw"),
    )


def settle_transactions(polls: DataFrame, payments: DataFrame) -> DataFrame:
    """EP2 settlement (kinesis-pay.php:513-537,487-510): first
    'processed' poll per payment id (exactly-once, :515-518), validator
    chain (2xx ∧ processed ∧ amount>0), then the KAU/KAG conditional
    amount pick (:507-508)."""
    triaged = triage_responses(polls)
    w = W.partitionBy("payment_id").orderBy("ts", "poll_seq")
    first_processed = (
        triaged.filter(F.col("is_ok") & (F.col("status") == "processed"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    joined = first_processed.join(
        payments, first_processed.payment_id == payments.global_payment_id
    )
    validated = joined.filter(
        (F.col("status") == "processed") & (F.col("amount").cast("double") > 0.0)
    )
    metal_amount = F.when(
        F.col("payment_currency") == "KAU", F.col("payment_kau_amount")
    ).otherwise(F.col("payment_kag_amount"))
    return validated.select(
        "payment_id",
        "invoice_id",
        F.col("ts").alias("settled_at"),
        F.col("amount").cast("double").alias("amount"),
        "payment_currency",
        F.round(metal_amount.cast("decimal(18,5)"), 5)
        .cast("double")
        .alias("metal_amount"),
        F.format_string(
            "%.2f %s", F.col("amount").cast("double"), F.col("currency")
        ).alias("amount_label"),
    )


def rates_asof(settled: DataFrame, rates: DataFrame) -> DataFrame:
    """EP3 (kinesis-pay.php:468-485): best bid at-or-before settlement
    — the union + running last(ignorenulls) as-of pattern from
    operators/joins.py, on the domain pair key."""
    pair = F.concat_ws(
        "_",
        F.when(F.col("payment_currency") == "KAU", "KAU").otherwise("KAG"),
        F.lit("USD"),
    )
    left = settled.withColumn("pair", pair).select(
        "pair",
        F.col("settled_at").alias("ts"),
        F.lit(None).cast("double").alias("bid"),
        "payment_id",
        "amount",
        "metal_amount",
    )
    ticks = rates.select(
        "pair",
        "ts",
        "bid",
        F.lit(None).cast("string").alias("payment_id"),
        F.lit(None).cast("double").alias("amount"),
        F.lit(None).cast("double").alias("metal_amount"),
    )
    w = (
        W.partitionBy("pair")
        .orderBy("ts", F.col("payment_id").isNotNull().cast("int"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ticks.unionByName(left)
        .withColumn("rate", F.last("bid", ignorenulls=True).over(w))
        .filter(F.col("payment_id").isNotNull())
        .select(
            "payment_id",
            "pair",
            F.col("ts").alias("settled_at"),
            "amount",
            "metal_amount",
            "rate",
            F.round(
                F.col("amount").cast("decimal(12,2)")
                / F.coalesce(F.col("rate"), F.lit(1.0)).cast("decimal(12,5)"),
                5,
            )
            .cast("double")
            .alias("metal_equiv"),
        )
    )


def audit_log(polls: DataFrame, secret: str = SECRET) -> DataFrame:
    """Audit sink rows (kinesis-pay.php:302-304,446-462): 1-in-10
    sampled titles, secret masked with a literal (non-regex) replace."""
    return polls.filter(F.col("poll_seq") % 10 == 0).select(
        "payment_id",
        "ts",
        F.format_string("POLL STATUS #%d", F.col("poll_seq")).alias("title"),
        F.expr(
            f"replace(coalesce(body, '{{}}'), '{secret}', '***secret_token***')"
        ).alias("payload"),
    )
