"""Physical-plan assertions (SURVEY.md §4.2 'verify with explain'):
filters reach the parquet scan, projections prune columns, small dims
broadcast, aggregations keep their map-side partial phase, and
scan-only pipelines stay shuffle-free. These are the properties that
decide whether a plan survives a 100× scale-up."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = queries()[name](spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "validate_chain")
    assert "PushedFilters:" in plan
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan[:2000]


def test_column_pruning_in_scan(spark):
    plan = plan_of(spark, "filter_free_first")
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m, plan[:2000]
    schema = m.group(1)
    # only the 4 referenced columns — not the full 6-column orders table
    assert "o_orderdate" not in schema and "o_orderpriority" not in schema


def test_small_dims_broadcast(spark):
    plan = plan_of(spark, "join_broadcast_dim")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    assert "SortMergeJoin" not in plan


def test_range_theta_stays_hash_join(spark):
    # the equi key keeps J6 a hash join; the band predicate must NOT
    # force a nested-loop cross product
    plan = plan_of(spark, "join_range_theta")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]


def test_range_bucketed_is_equi_join(spark):
    # keyless band predicate via bucketed_range_join: must plan as an
    # equi join on the bucket (hash or sort-merge), never a nested-loop
    # cross product — the scale-safe form when neither side broadcasts
    plan = plan_of(spark, "join_range_bucketed")
    assert (
        "ShuffledHashJoin" in plan
        or "SortMergeJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan[:3000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:3000]


def test_partial_aggregation_present(spark):
    # HashAggregate appears twice per grouping: partial (map-side) +
    # final — the map-side combine that absorbs skew at scale
    plan = plan_of(spark, "agg_pricing_summary")
    assert plan.count("HashAggregate") >= 2, plan[:3000]


def test_scan_only_pipeline_has_no_shuffle(spark):
    plan = plan_of(spark, "fn_money_pipeline")
    assert "Exchange" not in plan, plan[:3000]


def test_sort_limit_is_take_ordered(spark):
    plan = plan_of(spark, "sort_limit")
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_asof_join_single_shuffle(spark):
    # union + window as-of: exactly one exchange on the key (plus AQE
    # wrappers) — no range cross-product operator anywhere
    plan = plan_of(spark, "join_asof_rate")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, f"expected 1 shuffle, saw {n_exchange}\n{plan[:3000]}"


def test_wholestage_codegen_active(spark):
    # AQE finalizes the physical plan only on execution — run the
    # query, then inspect the executed plan for codegen stages
    df = queries()["agg_pricing_summary"](spark, SF_DIR)
    # .count() would build a separate query execution; collect() runs
    # THIS df's plan so AQE finalizes it in place
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(n)' operator prefixes mark whole-stage-codegen stages
    assert re.search(r"\*\(\d+\)", plan), plan[:2000]


def test_minhash_no_cartesian_product(spark):
    plan = plan_of(spark, "text_dedup_minhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]


def test_salted_agg_two_stage(spark):
    # two groupings → at least two separate HashAggregate pairs
    plan = plan_of(spark, "agg_salted_tf")
    assert plan.count("HashAggregate") >= 4, plan[:3000]


def test_global_running_total_partitions_by_day(spark):
    # the per-day window must be partitioned (no single global sort of
    # the full table before the window)
    plan = plan_of(spark, "win_global_running_total")
    import re as _re

    assert _re.search(r"Window.*day", plan, _re.S), plan[:3000]


def test_returned_items_broadcasts_nation_and_pushes_filter(spark):
    plan = plan_of(spark, "q_returned_items")
    # returnflag filter must reach the lineitem scan
    assert re.search(r"PushedFilters: \[[^\]]*l_returnflag", plan), plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_volume_shipping_broadcasts_both_nation_roles(spark):
    # nation joins twice under different roles — both must broadcast,
    # never a nested loop from the disjunctive cross-nation predicate
    plan = plan_of(spark, "q_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]


def test_corpus_filter_single_wide_shuffle(spark):
    # dedup window + final agg: the wide text column feeds exactly one
    # exchange (the window hash); the post-filter agg reshuffles only
    # the narrow (lang, source, n_tokens) projection
    plan = plan_of(spark, "pipeline_corpus_filter")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 2, f"expected <=2 shuffles, saw {n_exchange}\n{plan[:3000]}"
    assert plan.count("HashAggregate") >= 2, plan[:3000]


def test_exists_subquery_becomes_semi_join(spark):
    # RewritePredicateSubquery must decorrelate EXISTS into a semi
    # join — no per-row subquery execution survives in the plan
    plan = plan_of(spark, "subquery_exists")
    assert "LeftSemi" in plan or "SemiJoin" in plan.replace(" ", ""), plan[:3000]


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """SCALE.md's layout claim, demonstrated: lineitem and orders
    written bucketed+sorted by the join key make the fact-fact join
    read-local — the SMJ consumes bucket files directly, no Exchange
    anywhere in the plan."""
    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR as _SF

    n_buckets = 8
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load(spark, _SF, tbl)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", str(tmp_path / tbl))
            .mode("overwrite")
            .saveAsTable(f"{tbl}_bucketed")
        )
    try:
        j = (
            spark.table("lineitem_bucketed")
            .hint("merge")
            .join(
                spark.table("orders_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan, plan[:3000]
        # the join itself must be exchange-free; only the final
        # aggregation may shuffle (on the tiny grouped output)
        assert "Exchange" not in join_section, join_section[:3000]
    finally:
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_global_sort_uses_range_partitioning(spark):
    # a total sort must sample-and-range-partition, not single-task sort
    plan = plan_of(spark, "sort_global")
    assert "rangepartitioning" in plan.lower(), plan[:3000]
    assert "TakeOrderedAndProject" not in plan


def test_disjunctive_join_extracts_both_side_filters(spark):
    # from the OR-of-conjunctions, Catalyst must derive a part-only
    # filter (brand/size) AND a lineitem-only filter (quantity bands)
    # and push BOTH to their scans
    plan = plan_of(spark, "q_disjunctive_revenue")
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan, re.S)
    assert any("p_brand" in f for f in pushed), plan[:3000]
    assert any("l_quantity" in f for f in pushed), plan[:3000]
    assert "BroadcastHashJoin" in plan


def test_dormant_balances_uses_anti_join(spark):
    # NOT EXISTS must rewrite to a left-anti join; the scalar avg
    # subquery must not appear as a per-row subquery
    plan = plan_of(spark, "q_dormant_balances")
    assert "LeftAnti" in plan, plan[:3000]


def test_sole_late_shipper_has_semi_and_anti(spark):
    # EXISTS -> left-semi and NOT EXISTS -> left-anti must both appear,
    # decorrelated against the same fact table
    plan = plan_of(spark, "q_sole_late_shipper")
    assert "LeftSemi" in plan, plan[:3000]
    assert "LeftAnti" in plan, plan[:3000]


def test_excess_shippers_nested_in_becomes_semi_joins(spark):
    # both IN subqueries (supplier <- lineitem <- part) rewrite to
    # semi joins; no correlated per-row execution survives
    plan = plan_of(spark, "q_excess_shippers")
    assert plan.count("LeftSemi") >= 2, plan[:3000]


def test_market_share_broadcasts_all_dims(spark):
    # nation x2 and region are broadcast; the two fact joins may shuffle
    plan = plan_of(spark, "q_market_share")
    assert plan.count("BroadcastHashJoin") >= 3, plan[:3000]
    assert "CartesianProduct" not in plan


def test_partitioned_write_prunes_partitions(spark):
    # sink_partitioned_write reads back a date-partitioned layout with a
    # 3-day predicate: the filter must land in PartitionFilters (file
    # listing prunes to 3 directories), not in the row-level data filter
    plan = plan_of(spark, "sink_partitioned_write")
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "event_date" in m.group(1), plan[:3000]


def test_decontaminate_broadcasts_benchmark_grams(spark):
    # the benchmark gram set is tiny relative to the training corpus —
    # the contamination probe must be a broadcast join, never a
    # shuffled join of the full training gram stream
    plan = plan_of(spark, "text_decontaminate")
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_time_rollup_reaggregates_partials(spark):
    # two levels of hash aggregation (daily, then weekly from daily
    # partials) — four HashAggregate nodes total (partial+final each),
    # and only the events scan feeds them (no join, no extra shuffle)
    plan = plan_of(spark, "agg_time_rollup")
    assert plan.count("HashAggregate") >= 4, plan[:3000]
    assert "Join" not in plan, plan[:3000]


def test_training_set_pipeline_shuffle_budget(spark):
    # the end-to-end corpus build: decontamination stays a broadcast
    # anti-join (never SMJ), and the whole 6-stage pipeline fits in <=5
    # data Exchanges — the mixture-rank and packing windows share the
    # lang partitioning, and the final pack aggregation rides it too
    plan = plan_of(spark, "pipeline_training_set")
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    n_exchanges = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_exchanges <= 5, f"{n_exchanges} exchanges\n" + plan[:3000]


def test_shuffled_hash_join_strategy(spark):
    # the SHUFFLE_HASH hint must yield a ShuffledHashJoin — neither a
    # broadcast (hint overrides size-based selection) nor a sort-merge
    plan = plan_of(spark, "join_shuffled_hash")
    assert "ShuffledHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_editdist_kernel_stays_out_of_join(spark):
    # the Levenshtein kernel must be a post-shuffle projection, never a
    # join condition: Catalyst merging the distance filter into the
    # join serializes the kernel into the byte-sized join stage
    # (SCALE.md expression-level lessons; 73s -> 2.3s at the 10x stress)
    plan = plan_of(spark, "text_dedup_editdist")
    m = re.search(r"Join condition: (.*)", plan)
    joins = re.findall(r"Join condition: (.*)", plan)
    assert joins, plan[:2000]
    for cond in joins:
        assert "levenshtein" not in cond.lower(), cond
    assert m and "levenshtein" in plan.lower(), "kernel missing entirely"


def test_dpp_injects_runtime_partition_filter(spark):
    # join_dpp: the hot-days dimension is derived from a scan, so no
    # static partition filter exists — Catalyst must inject a
    # dynamicpruning subquery into the partitioned fact scan, pruning
    # date directories at runtime from the broadcast join's build side
    plan = plan_of(spark, "join_dpp")
    assert "dynamicpruning" in plan, plan[:3000]


def test_skew_salted_join_has_no_extra_shuffle(spark):
    # the salted join must still be ONE join on (key, salt): salting
    # adds a projected column and an explode, never a second Exchange
    # chain or a nested-loop fallback
    plan = plan_of(spark, "join_skew_salted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_fingerprint_is_map_only(spark):
    # per-document reductions over the shingle array must not explode
    # into a shuffle: the whole fingerprint pass is one scan
    plan = plan_of(spark, "text_winnow_fingerprint")
    assert "Exchange" not in plan, plan[:3000]


def test_bloom_filter_injected_on_probe_side(spark):
    # join_bloom_runtime: with the creation side non-broadcastable, the
    # InjectRuntimeFilter rule must build a Bloom filter over the
    # filtered orders keys and guard the lineitem side with
    # might_contain BEFORE its shuffle
    from pyspark.sql import functions as F
    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load(spark, SF_DIR, "lineitem")
        orders = load(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt[:3000]
        assert "bloom_filter_agg" in opt, opt[:3000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_coalesces_shuffle_partitions_at_runtime(spark):
    # static plans request spark.sql.shuffle.partitions=32; for a tiny
    # grouped output AQE must coalesce the exchange read at runtime —
    # the knob that lets one config serve sf0.001 and 100 TB
    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR

    df = (
        load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # materialize so the adaptive plan is final
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in executed, executed[:2000]
    assert "coalesced" in executed, executed[:2000]


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    # hand-built 90%-one-key skew: AQE's skew-join handling must mark
    # the sort-merge join as skew=true (split oversized partitions)
    # instead of letting one straggler task carry 90% of the rows
    import pyspark.sql.functions as SF

    n = 400_000
    skewed = spark.range(n).select(
        SF.when(SF.col("id") % 10 != 0, SF.lit(7)).otherwise(SF.col("id")).alias("k"),
        SF.col("id").alias("payload"),
    )
    other = spark.range(50_000).select(
        SF.col("id").alias("k"), SF.lit(1).alias("tag")
    )
    skewed.write.mode("overwrite").parquet(str(tmp_path / "skewed"))
    other.write.mode("overwrite").parquet(str(tmp_path / "other"))
    a = spark.read.parquet(str(tmp_path / "skewed"))
    b = spark.read.parquet(str(tmp_path / "other"))

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    # thresholds sized for test data (defaults target multi-GB partitions)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        j = a.join(b, "k").select(SF.sum("payload").alias("s"))
        j.collect()
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:3000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_quantize_is_shuffle_free(spark):
    # int8 quantization is pure per-row arithmetic: the plan must be a
    # scan + project with NO Exchange — scan-bound at any corpus size
    plan = plan_of(spark, "vec_quantize_int8")
    assert "Exchange" not in plan, plan[:3000]


def test_interval_join_never_cross_products(spark):
    # the bucketize-then-residual form must keep the no-equi-key
    # interval overlap an equi join on the hour bucket
    plan = plan_of(spark, "join_interval_bucketed")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:3000]


def test_shard_shuffle_has_no_global_window_partition(spark):
    # pass 2 ranks WITHIN md5-prefix buckets; the only unpartitioned
    # window is the 256-row offset cumsum. The big-side window must
    # carry the bucket partition key.
    plan = plan_of(spark, "sample_shard_shuffle")
    import re as _re

    windows = _re.findall(r"Arguments: \[row_number\(\).*?\]", plan)
    assert any("partitionspec" in w.lower() or "bkt" in w for w in windows), (
        windows or plan[:3000]
    )


def test_merge_on_read_deltas_broadcast(spark):
    # both delta files must broadcast: the base scan never shuffles
    # for the merge itself (the only Exchange is the final aggregate)
    plan = plan_of(spark, "source_merge_on_read")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_hybrid_rrf_has_no_theta_join(spark):
    """pipeline_hybrid_rrf candidates must come from the shingle
    inverted-index equi-join: no BroadcastNestedLoopJoin (the old
    cand_id != query_id theta join against the full corpus) and no
    per-pair array_intersect string work anywhere in the plan."""
    plan = plan_of(spark, "pipeline_hybrid_rrf")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "array_intersect" not in plan


def test_auc_and_decile_have_no_global_rank_window(spark):
    """agg_model_auc must not rank rows at all (per-score midranks via
    the two-pass prefix-sum), and agg_decile_lift must not use NTILE's
    single-task global sort (two-pass rank + explicit NTILE
    arithmetic). The only unpartitioned windows left are the tiny
    bucket-frame offset cumsums and the 10-row gains cumulative."""
    auc_plan = plan_of(spark, "agg_model_auc")
    assert "rank(" not in auc_plan.replace("row_number", "")
    lift_plan = plan_of(spark, "agg_decile_lift")
    assert "ntile" not in lift_plan
    # the per-row ranking window must carry the bucket partition key
    import re as _re

    wins = _re.findall(r"row_number\(\) windowspecdefinition\((.*?)\)", lift_plan)
    assert wins and all("bkt" in w for w in wins), wins or lift_plan[:3000]


@pytest.mark.parametrize(
    "name",
    [
        "er_customer_linkage",
        "er_sorted_neighborhood",
        "er_lsh_blocking",
        "emb_semdedup",
        "udaf_user_zscore",
    ],
)
def test_fanout_stages_keep_their_pinned_spread(spark, name):
    """Regression pin for the r7 AQE blind-spot fixes: these queries
    feed a byte-small frame (capped blocks, id-only pair candidates,
    grouped-map input) into a fan-out/CPU-heavy stage, and rely on an
    EXPLICIT fixed-width repartition to stop AQE from coalescing the
    stage into one task (measured 2-4x wall-clock; SCALE.md r7). A
    refactor that drops the pin would pass every correctness test and
    silently reintroduce the serialization — so the plan itself is
    asserted: a user-specified repartitioning must survive into the
    optimized plan."""
    from am_kinesis_pay_spark.registry import queries

    df = queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert (
        "REPARTITION_BY_NUM" in plan or "RepartitionByExpression" in plan
    ), f"{name} lost its pinned fan-out spread"
