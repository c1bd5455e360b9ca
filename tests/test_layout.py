"""File-layout invariants for the table-maintenance operators (file
counts are physical properties the SQL oracle can't see)."""

from __future__ import annotations

from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR


def test_compaction_reduces_files_conserves_rows(spark):
    row = queries()["sink_compaction"](spark, SF_DIR).collect()[0]
    assert row.n_files_before == 64
    assert 1 <= row.n_files_after <= 4
    from am_kinesis_pay_spark.tables import load

    assert row.n_rows == load(spark, SF_DIR, "events").count()


def test_schema_evolution_nulls_only_on_old_batch(spark):
    rows = queries()["source_schema_evolution"](spark, SF_DIR).collect()
    assert rows, "expected evolved dataset to be non-empty at test SF"
    # the added column is NULL exactly for the v1 (signup) batch
    assert all((r.channel is None) or (r.channel == "purchase") for r in rows)
    assert any(r.channel is None for r in rows)
    assert any(r.channel == "purchase" for r in rows)


def test_observed_write_metrics_without_second_scan(spark, tmp_path):
    """write_parquet_observed: the metrics returned by the Observation
    must equal what a (deliberately paid) verification scan finds."""
    from am_kinesis_pay_spark.sources.sinks import write_parquet_observed
    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR

    df = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    out = str(tmp_path / "observed")
    metrics = write_parquet_observed(df, out)
    back = spark.read.parquet(out)
    assert metrics["n_rows"] == back.count()
    assert metrics["n_null_first_col"] == back.filter("o_orderkey IS NULL").count()
