"""Degenerate-input guards (the ADVICE r9 defect class, swept across
the whole registry in r10): constant-valued cells make single-pass
variances round to tiny NEGATIVE doubles (DuckDB sqrt() throws,
Spark returns NaN), and md5-uniform edge values make ln() arguments
exactly 0 (DuckDB throws, Spark returns NULL). These tests build
fixtures that HIT those cells and assert the entries degrade
deterministically (drop the cell / clamp) instead of crashing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from am_kinesis_pay_spark.registry import queries
from am_kinesis_pay_spark.tables import TABLES, load

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def constant_value_dir(spark, tmp_path_factory):
    """Every table as-is, except events.value is a CONSTANT: every
    per-cell variance in the experiment family is exactly 0 (and
    rounds to +-epsilon in the single-pass identity)."""
    d = str(tmp_path_factory.mktemp("degenerate_sf"))
    for t in TABLES:
        df = load(spark, SF_DIR, t)
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("value").isNotNull(), F.lit(42.0)).otherwise(
                    F.lit(None).cast("double")
                ),
            )
        df.write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize(
    "name",
    [
        "agg_ab_ttest",
        "agg_power_mde",
        "agg_diff_in_diff",
        "agg_tost_equivalence",
        "agg_delta_method_ci",
        "agg_jackknife_variance",
        "emb_centroid_outliers",
        "events_bot_detection",
        "eval_forecast_backtest",
        "win_hampel_filter",
    ],
    ids=str,
)
def test_variance_entries_survive_constant_metric(
    spark, constant_value_dir, name
):
    """No sqrt(negative) / divide-by-zero crash on a zero-variance
    metric: the entry either drops the degenerate cells (guarded
    filters) or returns exact zeros (clamped forms)."""
    rows = queries()[name](spark, constant_value_dir).collect()
    # zero-variance t-tests/MDE/DiD must drop their cells entirely
    if name in (
        "agg_ab_ttest",
        "agg_power_mde",
        "agg_diff_in_diff",
        "agg_tost_equivalence",
    ):
        assert rows == []


def test_tost_margin_positive_on_negative_metric(
    spark, tmp_path_factory
):
    """ADVICE r10: the TOST margin anchored to the SIGNED pooled mean
    went <= 0 on negative-valued metrics, inverting z_lower/z_upper
    and making equivalence unsatisfiable. With the abs() anchor both
    engines must produce positive margins and agree row-for-row on an
    all-negative metric."""
    import duckdb

    from am_kinesis_pay_spark.registry import REGISTRY

    d = str(tmp_path_factory.mktemp("negated_sf"))
    for t in TABLES:
        df = load(spark, SF_DIR, t)
        if t == "events":
            df = df.withColumn("value", -F.abs(F.col("value")) - 1.0)
        df.write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    got = queries()["agg_tost_equivalence"](spark, d).collect()
    assert got, "negative-metric fixture produced no segments"
    assert all(r.margin > 0 and r.mean_a < 0 for r in got)
    # z_lower/z_upper keep their TOST meaning: lower bound above -margin
    for r in got:
        want = (r.diff + r.margin) / r.se > 1.644854 and (
            r.diff - r.margin
        ) / r.se < -1.644854
        assert abs((r.equivalent or False) - want) <= 0 or r.equivalent == want
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )
    want_rows = sorted(
        tuple(r) for r in
        con.execute(REGISTRY["agg_tost_equivalence"].oracle).fetchall()
    )
    con.close()
    assert sorted(tuple(r) for r in got) == want_rows


def test_ttest_guard_matches_oracle_on_constant_metric(
    spark, constant_value_dir
):
    """The guard must be mirrored: DuckDB runs the SAME oracle on the
    degenerate fixture without throwing, and both engines agree on
    the (empty) result."""
    import duckdb

    from am_kinesis_pay_spark.registry import REGISTRY

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            # Spark writes each table as a DIRECTORY of part files
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{constant_value_dir}/{t}.parquet/*.parquet'"
        )
    for name in ("agg_ab_ttest", "agg_power_mde", "agg_diff_in_diff"):
        want = con.execute(REGISTRY[name].oracle).fetchall()
        got = queries()[name](spark, constant_value_dir).collect()
        assert len(got) == len(want) == 0, name
    con.close()
