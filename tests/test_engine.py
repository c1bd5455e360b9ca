"""Engine facade: catalog access, SQL over views, lifecycle passthrough."""

from __future__ import annotations

from am_kinesis_pay_spark.engine import Engine

from tests.conftest import SF_DIR


def test_engine_catalog_and_query(spark):
    eng = Engine(SF_DIR, spark=spark)
    cat = eng.catalog()
    assert len(cat) >= 80 and "agg_pricing_summary" in cat
    assert eng.query("agg_pricing_summary").count() > 0
    assert eng.table("lineitem").count() > 0


def test_engine_sql_over_views(spark):
    eng = Engine(SF_DIR, spark=spark)
    row = eng.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0]
    assert row.n > 0


def test_engine_lifecycle_passthrough(spark):
    import tests.test_payment_pipeline as tp

    eng = Engine(SF_DIR, spark=spark)
    reqs = eng.create_payment_requests(tp._invoices(spark), percentage=-85.0)
    assert reqs.count() == 3
    settled = eng.settle_payments(tp._polls(spark), tp._payments(spark))
    assert settled.count() == 2
