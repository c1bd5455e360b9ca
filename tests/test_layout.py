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
