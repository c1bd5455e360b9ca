"""Joins (SURVEY.md §2.3, J1–J8) including the as-of join the
reference's best-bid rate lookup generalizes to.

Scale notes (100 TB):
- J1/J3 fact⋈fact: sort-merge join on the shuffled key; at 100 TB both
  sides would be bucketed by the join key so the shuffle disappears.
- J2/J6: dimension sides are small → broadcast (hinted explicitly);
  a broadcast join is shuffle-free regardless of fact-side size.
- J4/J5 semi/anti: Spark keeps only the key column of the build side.
- J7 as-of: implemented as union + running `last(ignorenulls)` window,
  i.e. ONE shuffle on (key) + a sort within partitions — the same
  strategy as a bucketed merge-asof; no cross product at any scale.
- J8 self range join: bounded by pre-filtering and an equi key on
  user_id, so the theta predicate only runs within user partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.functions.compat import dsum
from am_kinesis_pay_spark.paths import scratch_path, scratch_table
from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "join_inner_equi",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
""",
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 [DRV]: orders ⋈ customer ⋈ nation — generalizes the
    invoice↔payment linkage (kinesis-pay.php:176,297)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
    )


@register(
    "join_broadcast_dim",
    oracle="""
SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    tags=("join",),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 [DRV]: fact ⋈ tiny dims with explicit broadcast hints — the
    dim side stays resident per executor; zero shuffle for the join
    itself (mirrors the 5-currency config table scale,
    kinesis-pay.php:102-107)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 [DRV]: customer LEFT JOIN orders — NULL-extension for
    customers without orders (mirrors the may-be-absent `paid` flag,
    kinesis-pay.php:29-31). COUNT(col) skips NULLs on both engines."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit("0").cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 [DRV]: left-semi = EXISTS — 'invoice has a payment id'
    existence check (kinesis-pay.php:173,298-300)."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 [DRV]: left-anti = NOT EXISTS — the missing-payment error
    path (kinesis-pay.php:298-300). Filtered to urgent orders so the
    result is non-empty at every sf."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_range_theta",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, p.p_partkey,
  CAST(l.l_extendedprice AS DOUBLE) AS line_price, p.p_retailprice
FROM lineitem l
JOIN part p
  ON l.l_partkey = p.p_partkey
 AND l.l_extendedprice >= p.p_retailprice * 10.0
 AND l.l_extendedprice <  p.p_retailprice * 20.0
""",
    tags=("join",),
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 [DRV]: non-equi band predicate on top of an equi key — price
    within a per-part band. The equi component keeps it a hash join
    (the theta predicate becomes a post-join filter), so it scales
    without a nested-loop cross product."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return li.join(
        F.broadcast(part),
        (li.l_partkey == part.p_partkey)
        & (li.l_extendedprice >= part.p_retailprice * 10.0)
        & (li.l_extendedprice < part.p_retailprice * 20.0),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "p_partkey",
        F.col("l_extendedprice").cast("double").alias("line_price"),
        "p_retailprice",
    )


@register(
    "join_asof_rate",
    oracle="""
WITH ticks AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
), lookups AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, CAST(l.ts AS TIMESTAMP) AS ts, t.value AS rate
FROM lookups l
ASOF LEFT JOIN ticks t
  ON l.user_id = t.user_id AND l.ts >= t.ts
""",
    tags=("join", "asof"),
)
def join_asof_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 [REF]: as-of join — rate at-or-before payment time,
    generalizing the best-bid orderbook lookup (kinesis-pay.php:468-485).

    Spark has no native ASOF JOIN; this is the sort-based pattern:
    union ticks + lookups, then per-key running ``last(value,
    ignorenulls=True)`` ordered by (ts, tick-first). One shuffle on the
    key, no range cross-product — the plan a bucketed merge-asof would
    produce, and it survives arbitrarily many ticks per key."""
    ev = load(spark, sf_dir, "events")
    ticks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("tick_value"), F.lit(None).cast("bigint").alias("event_id")
    )
    lookups = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("double").alias("tick_value"), "event_id"
    )
    unioned = ticks.unionByName(lookups)
    # ticks sort before lookups at identical ts (is_lookup 0 < 1) so an
    # exactly-simultaneous tick is visible — DuckDB ASOF `>=` semantics.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").isNotNull().cast("int"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("rate", F.last("tick_value", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select("event_id", "user_id", "ts", "rate")
    )


@register(
    "join_self_window",
    oracle="""
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTES
 AND a.event_type = 'click' AND b.event_type = 'purchase'
GROUP BY a.user_id
""",
    tags=("join",),
)
def join_self_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 [DRV]: self-join within a time window — click followed by a
    purchase within 5 minutes per user (sessionization precursor;
    generalizes the poll-stream cadence, kinesis-pay.php:231-263).
    Equi key user_id bounds the theta predicate to within-user pairs."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    return (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(F.col("a_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_shuffled_hash",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'F'
""",
    tags=("join", "strategy"),
)
def join_shuffled_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third join strategy made explicit: SHUFFLE_HASH hint forces
    a ShuffledHashJoin (plan-asserted) — the right choice when both
    sides are too big to broadcast but one side's per-partition build
    set fits in memory, beating sort-merge by skipping both sorts.
    At 100 TB this is the fact⋈mid-size-dim sweet spot; the hint is
    how you pin it when AQE's stats miss."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    return o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name"
    )


@register(
    "join_dpp",
    oracle="""
WITH hot AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS event_date
  FROM events WHERE event_type = 'purchase' AND value > 330
)
SELECT h.event_date, COUNT(*) AS n_events,
  COUNT(DISTINCT e.user_id) AS n_users
FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS event_date, user_id
      FROM events) e
JOIN hot h USING (event_date)
GROUP BY h.event_date
""",
    tags=("join", "layout"),
)
def join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] dynamic partition pruning — the runtime counterpart of
    the static pruning in sink_partitioned_write: the fact table is
    partitioned by event date on disk, the "hot days" dimension is
    derived from a scan (so no static filter on the fact side is
    possible), and Catalyst injects a dynamicpruning# subquery into
    the fact scan's PartitionFilters — only the matching date
    directories are read. At 100 TB this is the difference between
    scanning 3 days and scanning the whole stream history whenever
    the driving filter lives on the other side of a join.
    tests/test_plans.py pins the dynamicpruning plan shape."""
    import os
    import tempfile

    ev = load(spark, sf_dir, "events")
    fact = ev.select(
        "event_id",
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("event_date"),
    )
    out = scratch_path(spark, "akps_dpp_events")
    fact.write.mode("overwrite").partitionBy("event_date").parquet(out)
    part_fact = spark.read.schema(
        "event_id bigint, user_id bigint, event_date date"
    ).parquet(out)
    hot = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 330))
        .select(F.to_date(F.date_trunc("day", "ts")).alias("event_date"))
        .distinct()
    )
    return (
        part_fact.join(F.broadcast(hot), "event_date")
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "join_skew_salted",
    oracle="""
SELECT o.o_orderpriority,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] hand-salted skew join — the manual fallback when AQE's
    skew-join split cannot help (e.g. a single hot key inside one
    shuffle block, or a build side that must replicate): the probe
    side gets a salt in [0, S) so one hot key spreads across S
    reducers, the build side is replicated S times via explode, and
    the join key becomes (key, salt). Correctness is salt-invariant —
    the oracle is the UNSALTED join. S=8 here; at 100 TB, S is sized
    to the observed hot-key share (agg_skew_profile measures it) and
    only the skewed keys need salting (split the input, salt the hot
    slice, union). The cost is deliberate: build side x S replication
    buys even reducer fan-out."""
    S = 8
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(S)).alias(
            "salt"
        ),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(S - 1))).alias("salt"),
    ).withColumn("salt", F.col("salt").cast("bigint"))
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("revenue"),
        )
    )


@register(
    "join_bloom_runtime",
    oracle="""
SELECT l.l_returnflag,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
""",
    tags=("join", "runtime-filter"),
)
def join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] runtime Bloom-filter join pruning — the shuffle-join
    counterpart of join_dpp's partition pruning: the selective filter
    lives on the orders side, so Catalyst (InjectRuntimeFilter) builds
    a Bloom filter over the filtered orders keys and applies
    `might_contain` to the lineitem side BEFORE its shuffle. At 100 TB
    this cuts the probe-side shuffle by the filter's selectivity when
    neither side broadcasts — exactly the case (fact ⋈ fact with a
    selective dim-like predicate) where DPP can't help because the
    pruning column isn't a partition column.

    The rule only fires when the creation side is not broadcastable,
    so the tuned confs are applied for THIS computation and restored:
    the result is materialized eagerly under them (the join_dpp temp-
    write pattern) and returned as a scan, keeping the session confs
    clean for every other query. tests/test_plans.py asserts the
    might_contain injection on the live plan."""
    import os
    import tempfile

    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.enabled": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    out = scratch_path(spark, "akps_bloom_join")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load(spark, sf_dir, "lineitem")
        orders = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dsum("l_extendedprice").alias("revenue"),
            )
        )
        j.write.mode("overwrite").parquet(out)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return spark.read.parquet(out)


@register(
    "join_asof_tolerance",
    oracle="""
WITH ticks AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
),
lookups AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, CAST(l.ts AS TIMESTAMP) AS ts,
  CASE WHEN l.ts - t.ts <= INTERVAL 1 DAY THEN t.value END AS rate
FROM lookups l
ASOF LEFT JOIN ticks t
  ON l.user_id = t.user_id AND l.ts >= t.ts
""",
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the latest at-or-before
    tick counts only if it is at most 1 day old — the production form
    of the reference's best-bid lookup (kinesis-pay.php:468-485): a
    quote that stale is no quote (NULL), not a price. Same single
    shuffle + running last(ignorenulls) plan as join_asof_rate; the
    matched tick's timestamp rides along in the same window pass so
    the staleness gate is a post-window projection, not a re-join."""
    ev = load(spark, sf_dir, "events")
    # One struct per tick so value and timestamp always travel together
    # through a single last(ignorenulls) — two independent windows could
    # pair an old value with a newer timestamp if a tick ever carried a
    # NULL value. Lookup rows carry a NULL struct (a struct of NULLs is
    # NOT null and would be picked up by ignorenulls).
    tick_t = "struct<tick_ts:timestamp,tick_value:double>"
    ticks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.struct(
            F.col("ts").alias("tick_ts"), F.col("value").alias("tick_value")
        ).alias("tick"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    lookups = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast(tick_t).alias("tick"),
        "event_id",
    )
    unioned = ticks.unionByName(lookups)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("event_id").isNotNull().cast("int"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fresh = F.col("matched.tick_ts") >= F.col("ts") - F.expr("INTERVAL 1 DAY")
    return (
        unioned.withColumn("matched", F.last("tick", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(fresh, F.col("matched.tick_value")).alias("rate"),
        )
    )


@register(
    "join_interval_bucketed",
    oracle="""
SELECT p.event_id AS promo_id,
  v.event_id AS view_id,
  CAST(date_diff('second', p.ts, v.ts) AS BIGINT) AS lag_sec
FROM (SELECT event_id, ts FROM events
      WHERE event_type = 'purchase' AND event_id % 97 = 0) p
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'view') v
  ON v.ts >= p.ts - INTERVAL 1 HOUR
 AND v.ts <  p.ts + INTERVAL 1 HOUR
""",
    tags=("join", "interval"),
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join with NO equi key — every view that falls
    inside the ±1 h window around a flagged purchase, across ALL users
    (the 'views near a big sale' attribution shape the reference's
    same-user as-of join J7 cannot express). A naive theta join here is
    a cross product; the scalable form is the shared
    ``bucketed_range_join`` helper (see its docstring for the plan
    argument): hour buckets on epoch seconds, exact full-precision
    timestamp comparison as the residual (the events ts carries
    microseconds; truncation only feeds the bucket, never the
    predicate)."""
    ev = load(spark, sf_dir, "events")
    promo = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 97 == 0)
    ).select(
        F.col("event_id").alias("promo_id"),
        F.col("ts").alias("p_ts"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    promo_n = promo.withColumn(
        "s_sec", F.unix_timestamp("s").cast("double")
    ).withColumn("e_sec", F.unix_timestamp("e").cast("double"))
    views_n = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
        F.unix_timestamp("ts").cast("double").alias("v_sec"),
    )
    return bucketed_range_join(
        promo_n,
        views_n,
        "s_sec",
        "e_sec",
        "v_sec",
        bucket_width=3600.0,
        residual=(F.col("v_ts") >= F.col("s")) & (F.col("v_ts") < F.col("e")),
    ).select(
        "promo_id",
        "view_id",
        (F.unix_timestamp("v_ts") - F.unix_timestamp("p_ts")).alias("lag_sec"),
    )


def bucketed_range_join(
    intervals: DataFrame,
    points: DataFrame,
    lo: str,
    hi: str,
    point: str,
    bucket_width: float,
    hi_inclusive: bool = False,
    residual=None,
    how: str = "inner",
) -> DataFrame:
    """Reusable bucketize-then-residual range join — the scale-safe
    form for a range predicate with NO equi key, where a naive theta
    join is a cross product (BroadcastNestedLoopJoin) and neither side
    is guaranteed broadcast-able.

    Each interval row explodes into the integer buckets
    ``floor(lo/w) .. floor(hi/w)`` it covers (cost = range/width + 1
    rows — pick ``bucket_width`` near the typical interval length so
    this is a small constant); each point row carries its single
    bucket ``floor(point/w)``; the join becomes an EQUI join on the
    bucket with the exact range check re-applied as a residual filter.
    A point's bucket is unique, so every qualifying pair meets in
    exactly one bucket — no post-join dedup. Plan: one shuffle of each
    side on the bucket (or broadcast if one side is small); hot
    buckets are ordinary join skew (AQE skew split / salting); the
    cross product never exists at any scale. Same trick a production
    range-join hint implements natively (e.g. Databricks RANGE_JOIN).

    ``lo``/``hi``/``point`` name NUMERIC columns (cast timestamps to
    epoch seconds first). Pass ``residual`` to override the default
    range check — e.g. to compare the original full-precision
    timestamps while bucketing on truncated seconds (safe: truncation
    never moves a value across a ``floor(x/w)`` boundary for integer
    ``w``). Default residual is ``lo <= point < hi`` (``<= hi`` when
    ``hi_inclusive``)."""
    w = F.lit(float(bucket_width))
    iv = intervals.withColumn(
        "_rb_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w).cast("long"),
                F.floor(F.col(hi) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("_rb_bkt", F.floor(F.col(point) / w).cast("long"))
    if residual is None:
        upper = (
            F.col(point) <= F.col(hi)
            if hi_inclusive
            else F.col(point) < F.col(hi)
        )
        residual = (F.col(point) >= F.col(lo)) & upper
    return iv.join(pt, "_rb_bkt", how).filter(residual).drop("_rb_bkt")


@register(
    "join_range_bucketed",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, p.p_partkey,
  CAST(l.l_extendedprice AS DOUBLE) AS line_price, p.p_retailprice
FROM lineitem l
JOIN part p
  ON CAST(l.l_extendedprice AS DOUBLE) >= CAST(p.p_retailprice - 1.0 AS DOUBLE)
 AND CAST(l.l_extendedprice AS DOUBLE) <  CAST(p.p_retailprice + 1.0 AS DOUBLE)
WHERE l.l_orderkey % 7 = 0
""",
    tags=("join", "interval"),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 variant with NO equi key: price-proximity match — every part
    whose retail price is within ±1 of a line's extended price, across
    ALL parts. Where `join_range_theta` leans on its partkey equi
    component, this band has no key at all, so the scale-safe plan is
    `bucketed_range_join`: parts explode into the ≤2 width-2 price
    buckets their ±1 band covers, lines carry their single bucket, and
    the band becomes an equi join on the bucket + residual — asserted
    shuffle-hash/sort-merge, never BroadcastNestedLoopJoin
    (tests/test_plans.py). Bucket math on doubles is safe here: 2-dp
    decimal inputs sit ≥0.01 from any bucket boundary, 12 orders above
    double rounding error."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("line_price"),
        )
    )
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        (F.col("p_retailprice") - 1.0).cast("double").alias("band_lo"),
        (F.col("p_retailprice") + 1.0).cast("double").alias("band_hi"),
    )
    return bucketed_range_join(
        part, li, "band_lo", "band_hi", "line_price", bucket_width=2.0
    ).select(
        "l_orderkey", "l_linenumber", "p_partkey", "line_price", "p_retailprice"
    )


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM {nation} n,
LATERAL (
  SELECT c_name, c_acctbal
  FROM {customer} c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) t
"""


@register(
    "join_lateral_topk",
    oracle=_LATERAL_SQL.format(nation="nation", customer="customer"),
    tags=("join", "sql"),
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 4 SQL surface): for each
    nation, its top-2 customers by balance — the per-row-subquery
    shape SQL users reach for before they learn window functions, now
    first-class in both engines, so the SAME SQL text is the oracle.
    Catalyst decorrelates the LATERAL into a join + per-key ranking
    rather than executing the subquery once per outer row: the plan is
    the `topk_per_group` plan, which is the point — declarative
    LATERAL costs the same as the hand-rewritten window form, and at
    100 TB both reduce to one shuffle of the big side keyed on the
    correlation column. Output columns pass through unreduced, so the
    hash check is exact with no float convention needed."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_v_lat")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v_lat")
    return spark.sql(
        _LATERAL_SQL.format(nation="nation_v_lat", customer="customer_v_lat")
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS view_us,
    CASE WHEN event_type = 'view' THEN event_id END AS view_id
  FROM events WHERE event_type IN ('purchase', 'view')
), marked AS (
  SELECT user_id, event_id, ts, event_type,
    last_value(view_us IGNORE NULLS) OVER w_prev AS prev_us,
    last_value(view_id IGNORE NULLS) OVER w_prev AS prev_id,
    first_value(view_us IGNORE NULLS) OVER w_next AS next_us,
    first_value(view_id IGNORE NULLS) OVER w_next AS next_id
  FROM ev
  WINDOW
    w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_id AS purchase_id,
  CASE WHEN next_us IS NULL THEN prev_id
       WHEN prev_us IS NULL THEN next_id
       WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts) THEN prev_id
       ELSE next_id END AS matched_view_id,
  CASE WHEN next_us IS NULL THEN epoch_us(ts) - prev_us
       WHEN prev_us IS NULL THEN next_us - epoch_us(ts)
       WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts)
            THEN epoch_us(ts) - prev_us
       ELSE next_us - epoch_us(ts) END AS gap_us
FROM marked
WHERE event_type = 'purchase' AND (prev_us IS NOT NULL OR next_us IS NOT NULL)
""",
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join — each purchase matched to the
    closest view by |time difference| in either direction (ties go to
    the earlier/backward match): the sensor-fusion / clickstream
    variant of J7's backward-only as-of, which DuckDB's ASOF JOIN
    cannot express (it is backward-only) — so the oracle builds the
    same two-window construction explicitly. Gaps are exact integer
    microseconds (unix_micros ↔ epoch_us — both engines read the
    TIMESTAMP(NANOS) parquet at µs truncation).

    Scale shape: union-tag + ONE Exchange/Sort per user serves both
    directions (the backward pass reads the frame up to CURRENT ROW,
    the forward pass from CURRENT ROW — Spark plans them over the
    same sort because partition key and order match); no join node at
    all, so there is nothing to skew. Same single-shuffle discipline
    as join_asof_rate."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.when(
                F.col("event_type") == "view", F.unix_micros("ts")
            ).alias("view_us"),
            F.when(F.col("event_type") == "view", F.col("event_id")).alias(
                "view_id"
            ),
        )
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last("view_us", ignorenulls=True).over(w_prev).alias("prev_us"),
        F.last("view_id", ignorenulls=True).over(w_prev).alias("prev_id"),
        F.first("view_us", ignorenulls=True).over(w_next).alias("next_us"),
        F.first("view_id", ignorenulls=True).over(w_next).alias("next_id"),
    )
    us = F.unix_micros("ts")
    prev_gap = us - F.col("prev_us")
    next_gap = F.col("next_us") - us
    pick_prev = F.col("next_us").isNull() | (
        F.col("prev_us").isNotNull() & (prev_gap <= next_gap)
    )
    return (
        marked.filter(
            (F.col("event_type") == "purchase")
            & (F.col("prev_us").isNotNull() | F.col("next_us").isNotNull())
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.when(pick_prev, F.col("prev_id"))
            .otherwise(F.col("next_id"))
            .alias("matched_view_id"),
            F.when(pick_prev, prev_gap).otherwise(next_gap).alias("gap_us"),
        )
    )


@register(
    "join_allocation_fifo",
    oracle="""
WITH inv AS (
  SELECT o_custkey AS user_id, o_orderkey,
    CAST(o_totalprice AS DECIMAL(18,2)) AS amt,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS cum_hi
  FROM orders
), pay AS (
  SELECT user_id, event_id, CAST(value AS DECIMAL(18,2)) AS amt,
    SUM(CAST(value AS DECIMAL(18,2))) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS cum_hi
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, o_orderkey, event_id,
  CAST(hi - lo AS DOUBLE) AS allocated
FROM (
  SELECT i.user_id, i.o_orderkey, p.event_id,
    -- CASE, not LEAST/GREATEST: DuckDB's LEAST coerces DECIMAL(38,2)
    -- to DOUBLE, which would break exact parity with Spark's decimal
    CASE WHEN i.cum_hi < p.cum_hi THEN i.cum_hi ELSE p.cum_hi END AS hi,
    CASE WHEN i.cum_hi - i.amt > p.cum_hi - p.amt
         THEN i.cum_hi - i.amt ELSE p.cum_hi - p.amt END AS lo
  FROM inv i JOIN pay p ON i.user_id = p.user_id
) t
WHERE hi > lo
""",
    tags=("join", "window", "finance"),
)
def join_allocation_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO payment-to-invoice allocation — the waterfall every billing
    ledger runs (apply each incoming payment to the customer's OLDEST
    open invoice, spill the remainder forward), and the set-based
    rewrite of the reference's running AMOUNT_PAID accumulation
    against an invoice total (kinesis-pay.php:509), generalized from
    one invoice to a per-customer ledger with partial fills across
    many payments.

    The classical procedural loop becomes ONE declarative plan via the
    cumulative-interval identity: lay invoices and payments each on the
    customer's cumulative money line (invoice i occupies
    [cum_hi-amt, cum_hi), payment j likewise), and FIFO allocation is
    exactly the INTERVAL OVERLAP — allocated(i,j) = max(0,
    min(hi_i, hi_j) - max(lo_i, lo_j)). Two per-key window cumsums +
    one equi-join + a filter replace the row-at-a-time loop; output is
    the sparse fill matrix (O(n+m) positive cells per customer, since
    both interval chains are totally ordered).

    Determinism: every quantity is exact DECIMAL (ordered cumsums with
    explicit id tie-breaks), the overlap is decimal min/max arithmetic,
    and only the final allocated value casts to double. At 100 TB both
    sides shuffle once on the customer key (the equi-join reuses that
    partitioning), window state is per-customer, and the overlap filter
    runs inside the join — no range explosion beyond the true fills."""
    o = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")
    w_inv = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    inv = o.select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("i_amt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w_inv)
        .alias("i_hi"),
    )
    w_pay = W.partitionBy("user_id").orderBy("ts", "event_id")
    pay = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.col("value").cast("decimal(18,2)").alias("p_amt"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w_pay)
            .alias("p_hi"),
        )
    )
    lo = F.greatest(
        F.col("i_hi") - F.col("i_amt"), F.col("p_hi") - F.col("p_amt")
    )
    hi = F.least(F.col("i_hi"), F.col("p_hi"))
    return (
        inv.join(pay, "user_id")
        .filter(hi > lo)
        .select(
            "user_id",
            "o_orderkey",
            "event_id",
            (hi - lo).cast("double").alias("allocated"),
        )
    )
