"""User-facing facade: one object that gives a reference user the
whole engine — tables, the named query catalog, SQL over registered
views, the payment lifecycle, and the streaming runner.

    from am_kinesis_pay_spark.engine import Engine

    eng = Engine(data_dir="/root/testdata/sf0.01")
    eng.query("agg_pricing_summary").show()
    eng.sql("SELECT count(*) FROM lineitem").show()
    settled = eng.settle_payments(polls_df, payments_df)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from am_kinesis_pay_spark import registry
from am_kinesis_pay_spark.session import get_session
from am_kinesis_pay_spark.tables import TABLES, load


class Engine:
    def __init__(
        self,
        data_dir: str,
        spark: SparkSession | None = None,
        register_views: bool = True,
    ):
        self.spark = spark or get_session()
        self.data_dir = data_dir
        if register_views:
            for t in TABLES:
                load(self.spark, data_dir, t).createOrReplaceTempView(t)

    # -- catalog ---------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return load(self.spark, self.data_dir, name)

    def query(self, name: str) -> DataFrame:
        """Run a named operator from the catalog (SURVEY §2 inventory)."""
        return registry.queries()[name](self.spark, self.data_dir)

    def catalog(self) -> dict[str, str]:
        """name → one-line description of every registered query."""
        registry._load_all()
        return {
            name: (spec.fn.__doc__ or "").strip().splitlines()[0]
            for name, spec in sorted(registry.REGISTRY.items())
        }

    def sql(self, statement: str) -> DataFrame:
        """SQL over the fixture tables (registered as temp views)."""
        return self.spark.sql(statement)

    # -- payment lifecycle (SURVEY §3.1 EP1–EP3) --------------------------
    def create_payment_requests(self, invoices: DataFrame, **kw) -> DataFrame:
        from am_kinesis_pay_spark.plans import payment_pipeline as pp

        return pp.create_payment_requests(invoices, **kw)

    def settle_payments(
        self, polls: DataFrame, payments: DataFrame
    ) -> DataFrame:
        from am_kinesis_pay_spark.plans import payment_pipeline as pp

        return pp.settle_transactions(polls, payments)

    def apply_rates(self, settled: DataFrame, rates: DataFrame) -> DataFrame:
        from am_kinesis_pay_spark.plans import payment_pipeline as pp

        return pp.rates_asof(settled, rates)

    def audit_log(self, polls: DataFrame) -> DataFrame:
        from am_kinesis_pay_spark.plans import payment_pipeline as pp

        return pp.audit_log(polls)

    # -- streaming ---------------------------------------------------------
    def stream_events(self, stream_dir: str, **kw) -> DataFrame:
        from am_kinesis_pay_spark.streaming.runner import events_stream

        return events_stream(self.spark, stream_dir, **kw)

    def payment_state_machine(self, stream: DataFrame, **kw) -> DataFrame:
        from am_kinesis_pay_spark.streaming.state_machine import (
            payment_state_machine,
        )

        return payment_state_machine(stream, **kw)
