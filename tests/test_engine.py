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


def test_histogram_merges_across_shards(spark):
    """agg_histogram's scale claim, demonstrated: per-shard histograms
    re-aggregate by bucket into exactly the global histogram (sum the
    counts, min/max the extrema). This is what makes the fixed-width
    form streaming-mergeable and shard-parallel with no pre-pass —
    an equi-depth histogram has neither property."""
    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.registry import queries
    from am_kinesis_pay_spark.tables import load

    ev = load(spark, SF_DIR, "events")
    bucket = F.floor(F.col("value") / F.lit(25.0)).cast("bigint")
    shard = ev.withColumn("shard", F.col("event_id") % 2)
    per_shard = shard.groupBy("shard", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo_raw"),
        F.max("value").alias("hi_raw"),
    )
    merged = {
        r.bucket: (r.n, round(r.lo, 6), round(r.hi, 6))
        for r in per_shard.groupBy("bucket")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.min("lo_raw"), 6).alias("lo"),
            F.round(F.max("hi_raw"), 6).alias("hi"),
        )
        .collect()
    }
    direct = {
        r.bucket: (r.n, r.lo, r.hi)
        for r in queries()["agg_histogram"](spark, SF_DIR).collect()
    }
    assert merged == direct


def test_hll_merge_equals_direct_sketch(spark):
    """agg_hll_partitioned: merging per-day HLL sketches must give the
    SAME estimate as sketching the raw stream directly (HLL union is
    lossless w.r.t. the sketch state), and land within the sketch's
    error envelope of the exact distinct count."""
    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.registry import queries
    from am_kinesis_pay_spark.tables import load

    merged = {
        r.event_type: r.approx_distinct_users
        for r in queries()["agg_hll_partitioned"](spark, SF_DIR).collect()
    }
    ev = load(spark, SF_DIR, "events")
    direct = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert merged == direct
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, est in merged.items():
        assert abs(est - exact[et]) <= max(2, 0.05 * exact[et]), (et, est, exact[et])


def test_listagg_distinct_upstream_bug(spark):
    """Upstream pin (VERDICT r5 #7): Spark 4.1 throws an internal
    ClassCastException when a listagg(DISTINCT ...) WITHIN GROUP shares
    its aggregate with a SECOND distinct aggregate — the reason
    agg_ordered_listagg derives n_types from the joined string instead
    (operators/aggregations.py agg_ordered_listagg docstring). This
    xfail(strict) fires the NAIVE form on purpose: the day the image's
    Spark fixes it, this test FAILS (xpass) and the workaround can be
    deleted."""
    import pytest

    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR

    ev = load(spark, SF_DIR, "events")
    ev.createOrReplaceTempView("events_v_listagg_bug")
    naive = spark.sql(
        """
        SELECT user_id,
          listagg(DISTINCT event_type, ',')
            WITHIN GROUP (ORDER BY event_type) AS type_list,
          COUNT(DISTINCT event_type) AS n_types
        FROM events_v_listagg_bug
        GROUP BY user_id
        """
    )
    with pytest.raises(Exception) as exc_info:
        naive.collect()
    msg = str(exc_info.value)
    assert "ClassCastException" in msg or "INTERNAL" in msg.upper(), msg


def test_sketch_entries_within_tolerance(spark):
    """The two deliberately-oracle-less sketch entries carry their own
    tolerance audit column; it must be all-true at every test SF (the
    driver's rows-only sample then shows estimator sanity inline)."""
    from am_kinesis_pay_spark.registry import queries

    qs = queries()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in (
            "agg_approx_distinct",
            "agg_hll_partitioned",
            # rank-interval audit (VERDICT r7 #6): the sketch's actual
            # contract is |rank/n - q| <= 1/accuracy
            "agg_percentile_approx",
        ):
            rows = qs[name](spark, sf_dir).collect()
            assert rows and all(r.within_tol for r in rows), (name, sf_dir, rows)


def test_parquet_footer_stats_match_duckdb(spark):
    """source_parquet_footer_stats (rows-only) pinned value-exact
    against DuckDB's parquet_metadata() at both test SFs — footer
    num_values/null_count/min/max including the stringified rendering
    of min/max (ints '0', floats '1.0', timestamps ISO)."""
    import duckdb

    from am_kinesis_pay_spark.registry import queries

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(
            (r.row_group, r.column, r.num_values, r.null_count,
             r.min_val, r.max_val)
            for r in queries()["source_parquet_footer_stats"](
                spark, sf_dir
            ).collect()
        )
        want = sorted(
            map(
                tuple,
                duckdb.sql(f"""
        SELECT row_group_id, path_in_schema, num_values,
               stats_null_count, stats_min_value, stats_max_value
        FROM parquet_metadata('{sf_dir}/lineitem.parquet')
        WHERE path_in_schema IN
              ('l_orderkey', 'l_quantity', 'l_shipdate', 'l_returnflag')
        """).fetchall(),
            )
        )
        assert len(got) == len(want) and len(got) > 0
        for g, w in zip(got, want):
            # timestamps render differently ('1996-03-15 00:00:00' vs
            # pyarrow's datetime str) — compare prefix-normalized
            gn = tuple(str(x)[:19] if x is not None else None for x in g)
            wn = tuple(str(x)[:19] if x is not None else None for x in w)
            assert gn == wn, (g, w)
