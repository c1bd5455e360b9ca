"""Edge-fixture tests for the payment lifecycle (SURVEY.md §5.2.4,
FIXTURES.md §B): zero/negative totals, x.xx5 half-up rounding, JSON vs
plain-text body fallback, duplicate payment ids, KAU/KAG conditional,
as-of rate gaps, secret masking."""

from __future__ import annotations

import datetime as dt
import hashlib
import hmac as hmac_mod
from decimal import Decimal

from pyspark.sql import functions as F, types as T

from am_kinesis_pay_spark.functions.signing import SECRET
from am_kinesis_pay_spark.plans import payment_pipeline as pp

TS0 = dt.datetime(2024, 5, 1, 12, 0, 0)


def _invoices(spark):
    schema = T.StructType(
        [
            T.StructField("invoice_id", T.LongType()),
            T.StructField("public_id", T.StringType()),
            T.StructField("paysys_id", T.StringType()),
            T.StructField("first_total", T.DecimalType(12, 2)),
            T.StructField("second_total", T.DecimalType(12, 2)),
            T.StructField("is_first_payment", T.BooleanType()),
            T.StructField("currency", T.StringType()),
            T.StructField("created_at", T.TimestampType()),
        ]
    )
    rows = [
        # normal first payment
        (1, "INV-1", "kinesis-pay", Decimal("100.00"), Decimal("50.00"), True, "USD", TS0),
        # free trial: first_total==0 AND first payment → bypassed (kinesis-pay.php:124-128)
        (2, "INV-2", "kinesis-pay", Decimal("0.00"), Decimal("30.00"), True, "USD", TS0),
        # negative first total, first payment → also bypassed
        (3, "INV-3", "kinesis-pay", Decimal("-5.00"), Decimal("30.00"), True, "USD", TS0),
        # recurring payment: second_total used even though first is 0
        (4, "INV-4", "kinesis-pay", Decimal("0.00"), Decimal("30.00"), False, "USD", TS0),
        # other paysystem → filtered (kinesis-pay.php:30,46)
        (5, "INV-5", "stripe", Decimal("10.00"), Decimal("10.00"), True, "USD", TS0),
        # half-up rounding boundary: 10.10 * 0.85 = 8.585 → 8.59 (kinesis-pay.php:140)
        (6, "INV-6", "kinesis-pay", Decimal("10.10"), Decimal("0.00"), True, "USD", TS0),
    ]
    return spark.createDataFrame(rows, schema)


def test_create_payment_requests_edges(spark):
    out = {
        r.invoice_id: r
        for r in pp.create_payment_requests(
            _invoices(spark), percentage=-85.0
        ).collect()
    }
    # bypass + paysys filters
    assert set(out) == {1, 4, 6}
    # abs(-85)/100 applied to ternary total (kinesis-pay.php:137-138)
    assert out[1].amount == 85.0
    assert out[4].amount == 25.5  # second_total path
    # the x.xx5 half-up edge: 10.10*0.85 = 8.585 → 8.59, not 8.58
    assert out[6].amount == 8.59
    assert '"amount":"8.59"' in out[6].payload
    # signature = HMAC(nonce.method.path.payload), uppercase hex
    r = out[1]
    msg = f"{r.nonce}POST/api/merchants/payment{r.payload}"
    want = hmac_mod.new(SECRET.encode(), msg.encode(), hashlib.sha256).hexdigest().upper()
    assert r.x_signature == want


def _polls(spark):
    schema = T.StructType(
        [
            T.StructField("payment_id", T.StringType()),
            T.StructField("poll_seq", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("http_code", T.IntegerType()),
            T.StructField("body", T.StringType()),
        ]
    )
    t = lambda m: TS0 + dt.timedelta(minutes=m)
    rows = [
        ("pay-A", 1, t(0), 200, '{"status":"pending"}'),
        ("pay-A", 2, t(1), 200, '{"status":"processed"}'),
        # duplicate 'processed' → must not settle twice (kinesis-pay.php:515-518)
        ("pay-A", 3, t(2), 200, '{"status":"processed"}'),
        # non-JSON body → plain-text fallback (kinesis-pay.php:158-162)
        ("pay-B", 1, t(0), 200, "Internal error, please retry"),
        ("pay-B", 2, t(1), 503, '{"status":"processed"}'),  # non-2xx → invalid
        ("pay-C", 10, t(3), 200, '{"status":"processed"}'),
        ("pay-D", 20, t(4), 200, '{"status":"rejected"}'),
        ("pay-E", 30, t(5), 200, f'{{"status":"pending","secret":"{SECRET}"}}'),
    ]
    return spark.createDataFrame(rows, schema)


def _payments(spark):
    schema = T.StructType(
        [
            T.StructField("global_payment_id", T.StringType()),
            T.StructField("invoice_id", T.LongType()),
            T.StructField("amount", T.DecimalType(12, 2)),
            T.StructField("payment_currency", T.StringType()),
            T.StructField("payment_kau_amount", T.DecimalType(18, 5)),
            T.StructField("payment_kag_amount", T.DecimalType(18, 5)),
            T.StructField("currency", T.StringType()),
        ]
    )
    rows = [
        ("pay-A", 1, Decimal("85.00"), "KAU", Decimal("1.23456"), Decimal("99.0"), "USD"),
        ("pay-B", 4, Decimal("25.50"), "KAG", Decimal("0.0"), Decimal("7.65432"), "USD"),
        ("pay-C", 6, Decimal("8.59"), "KAG", Decimal("0.0"), Decimal("2.5"), "USD"),
        ("pay-D", 7, Decimal("10.00"), "KAU", Decimal("1.0"), Decimal("1.0"), "USD"),
        # zero-amount payment fails the validator chain (kinesis-pay.php:520-537)
        ("pay-E", 8, Decimal("0.00"), "KAU", Decimal("1.0"), Decimal("1.0"), "USD"),
    ]
    return spark.createDataFrame(rows, schema)


def test_triage_json_fallback(spark):
    t = {(r.payment_id, r.poll_seq): r for r in pp.triage_responses(_polls(spark)).collect()}
    assert t[("pay-A", 1)].status == "pending"
    assert t[("pay-B", 1)].status == "unparseable"  # plain-text body
    assert t[("pay-B", 2)].code_class == 5 and not t[("pay-B", 2)].is_ok


def test_settle_exactly_once_and_conditional_amount(spark):
    settled = {r.payment_id: r for r in pp.settle_transactions(_polls(spark), _payments(spark)).collect()}
    # pay-A settles once (first processed poll), KAU amount picked
    assert set(settled) == {"pay-A", "pay-C"}
    a = settled["pay-A"]
    assert a.settled_at == TS0 + dt.timedelta(minutes=1)
    assert a.metal_amount == 1.23456  # KAU branch (kinesis-pay.php:507-508)
    assert a.amount_label == "85.00 USD"
    # pay-C is KAG
    assert settled["pay-C"].metal_amount == 2.5
    # pay-B: its only 'processed' poll was non-2xx → no settle
    # pay-D: rejected; pay-E: amount 0 fails validation


def test_rates_asof_with_gaps(spark):
    settled = pp.settle_transactions(_polls(spark), _payments(spark))
    rate_rows = [
        ("KAU_USD", TS0 + dt.timedelta(minutes=0, seconds=30), 73.5),
        ("KAU_USD", TS0 + dt.timedelta(minutes=5), 99.9),  # after settle — ignored
        # no KAG_USD tick before pay-C settles → NULL rate path
        ("KAG_USD", TS0 + dt.timedelta(minutes=30), 29.1),
    ]
    rates = spark.createDataFrame(
        rate_rows, "pair string, ts timestamp, bid double"
    )
    out = {r.payment_id: r for r in pp.rates_asof(settled, rates).collect()}
    assert out["pay-A"].rate == 73.5  # latest at-or-before, not the later tick
    assert out["pay-A"].metal_equiv == round(85.00 / 73.5, 5)
    assert out["pay-C"].rate is None  # gap: no prior tick
    assert out["pay-C"].metal_equiv == 8.59  # coalesce rate→1.0 fallback


def test_audit_log_sampling_and_masking(spark):
    logs = {r.payment_id: r for r in pp.audit_log(_polls(spark)).collect()}
    # only poll_seq % 10 == 0 rows (kinesis-pay.php:302-304)
    assert set(logs) == {"pay-C", "pay-D", "pay-E"}
    assert logs["pay-C"].title == "POLL STATUS #10"
    # the secret never appears; the mask does (kinesis-pay.php:459)
    assert SECRET not in logs["pay-E"].payload
    assert "***secret_token***" in logs["pay-E"].payload
