"""Aggregations (SURVEY.md §2.4, A1–A7).

A1 is the flagship: the reference's price-adjustment arithmetic
(kinesis-pay.php:137-140 — ``abs($pct)/100`` multiplier, then 2-dp
half-up rounding via ``number_format``) generalized into a TPC-H-Q1
shaped pricing summary over ``lineitem``.

Scale notes (100 TB): all of these are hash aggregations with map-side
partial aggregation — one shuffle on the grouping key, no join. Group
cardinality is tiny (≤ a few thousand), so the reduce side is never
skew-bound; AQE coalesces post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.functions.compat import davg, dec, dsum, sql_davg, sql_dsum
from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

# The reference's price multiplier: abs(getConfig('percentage', 100))/100
# (kinesis-pay.php:137). Fixed at 85% here so the ``abs``/divide path is
# exercised deterministically.
_PCT = "0.85"

_A1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum("l_quantity")} AS sum_qty,
  {sql_dsum("l_extendedprice")} AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST({_PCT} AS DECIMAL(4,2)), 2)) AS DOUBLE) AS sum_adjusted,
  {sql_davg("l_quantity")} AS avg_qty,
  {sql_davg("l_extendedprice")} AS avg_price,
  {sql_davg("l_discount", scale=2, prec=4)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_pricing_summary", oracle=_A1_ORACLE, tags=("agg", "flagship"))
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 [REF→DRV]: pricing summary with the reference's adjustment
    arithmetic (kinesis-pay.php:137-140) in TPC-H-Q1 shape.

    r11 OPT: the decimal-product partial sums are the whole cost and
    run in the scan stage — spread() fans them over the cores when the
    scan has fewer splits than cores (no-op at scale); every
    accumulator is an exact DECIMAL sum or count, order-free."""
    from am_kinesis_pay_spark.tables import spread

    li = spread(
        load(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        )
    )
    price = dec("l_extendedprice", 2)
    disc = dec("l_discount", 2, 4)
    tax = dec("l_tax", 2, 4)
    # number_format(.., 2) ≙ round-half-up on DECIMAL (kinesis-pay.php:140)
    adjusted = F.round(price * F.lit(_PCT).cast("decimal(4,2)"), 2)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            F.sum(adjusted).cast("double").alias("sum_adjusted"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_status_counts",
    oracle="""
SELECT event_type, COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
    tags=("agg",),
)
def agg_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 [REF]: events per status — state-machine telemetry
    (kinesis-pay.php:239-249)."""
    return load(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "agg_distinct_users",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
""",
    tags=("agg",),
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 [DRV]: exact COUNT(DISTINCT) — generalizes the uniq-payment-id
    contract (kinesis-pay.php:515-518). Two-phase shuffle in Spark
    (partial distinct then count) — scales without a driver bottleneck."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register("agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3b [DRV]: HyperLogLog++ approximate distinct — the 100 TB path
    where exact distinct would shuffle every key. rsd=0.02 balances
    sketch size against precision (0.01 quadruples the register file
    for one extra significant digit; Spark's default is 0.05).

    DELIBERATELY absent from oracle_sql(): DuckDB's approx sketch is a
    different estimator, so no cross-engine hash can exist and the
    driver records a rows-only check. To make that check still prove
    estimator sanity, the result CARRIES its own tolerance audit: the
    exact twin (the driver-green agg_distinct_users aggregation) rides
    along per row with ``within_tol`` = |approx-exact| <= max(2,
    3*rsd*exact) — asserted all-true in pytest, and visible in any
    rows-only sample the driver takes. The exact column is the
    self-check's cost, not the production plan: at 100 TB you ship
    only the sketch and audit a sampled slice."""
    tol = F.greatest(F.lit(2.0), F.lit(3 * 0.02) * F.col("n_users_exact"))
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("n_users_approx"),
            F.countDistinct("user_id").alias("n_users_exact"),
        )
        .select(
            "event_type",
            "n_users_approx",
            "n_users_exact",
            (
                F.abs(F.col("n_users_approx") - F.col("n_users_exact"))
                <= tol
            ).alias("within_tol"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag) AS g_rf,
  GROUPING(l_linestatus) AS g_ls,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 [DRV]: ROLLUP over (returnflag, linestatus) with GROUPING()
    markers to disambiguate real NULLs from subtotal rows.

    r11 OPT: ROLLUP's Expand triples the scan stage's rows — spread()
    fans that over the cores when the scan has fewer splits than
    cores (no-op at scale); DECIMAL sum + count are order-free."""
    from am_kinesis_pay_spark.tables import spread

    li = spread(
        load(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_quantity"
        )
    )
    return (
        li.rollup("l_returnflag", "l_linestatus").agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
            F.grouping("l_linestatus").cast("bigint").alias("g_ls"),
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    ).select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "n_rows")


@register(
    "agg_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 12
""",
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 [DRV]: post-aggregation filter (HAVING). Catalyst keeps the
    filter above the partial agg — no extra shuffle."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .filter(F.col("n_orders") > 12)
    )


@register(
    "agg_max_by",
    oracle="""
SELECT event_type,
  arg_max(value, event_id) AS last_value,
  arg_max(user_id, event_id) AS last_user
FROM events
GROUP BY event_type
""",
    tags=("agg",),
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 [REF]: arg-max — the best-bid = bids[0] top-of-book lookup
    (kinesis-pay.php:468-485) as a single-pass aggregate, keyed on the
    unique monotone event_id so ties cannot occur."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("value", "event_id").alias("last_value"),
        F.max_by("user_id", "event_id").alias("last_user"),
    )


@register(
    "agg_pivot",
    oracle=f"""
SELECT user_id,
  COALESCE(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END), 0)::DOUBLE AS click,
  COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END), 0)::DOUBLE AS purchase,
  COALESCE(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END), 0)::DOUBLE AS view
FROM events
GROUP BY user_id
""",
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV]: pivot event_type into value columns — Spark's .pivot()
    with an explicit value list (never let it scan for distinct values
    at scale); equivalent to the conditional-sum expansion the oracle
    spells out."""
    ev = load(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum(dec("value", 2)))
    )
    zero = F.lit("0").cast("decimal(18,2)")
    return pivoted.select(
        "user_id",
        F.coalesce("click", zero).cast("double").alias("click"),
        F.coalesce("purchase", zero).cast("double").alias("purchase"),
        F.coalesce("view", zero).cast("double").alias("view"),
    )


@register(
    "agg_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, 'extended' AS price_kind,
  CAST(l_extendedprice AS DOUBLE) AS price
FROM lineitem WHERE l_orderkey % 500 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'discounted' AS price_kind,
  l_extendedprice * (1 - l_discount) AS price
FROM lineitem WHERE l_orderkey % 500 = 0
""",
    tags=("agg", "unpivot"),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV]: unpivot (wide→tall) via the native unpivot API — columns
    become (kind, value) rows; the oracle spells out the UNION ALL it
    desugars to."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("extended"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "discounted"
        ),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["extended", "discounted"],
        "price_kind",
        "price",
    )


@register(
    "agg_salted_tf",
    oracle="""
SELECT token, COUNT(*) AS tf
FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
WHERE token <> ''
GROUP BY token
""",
    tags=("agg", "skew"),
)
def agg_salted_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] skew handling made explicit: two-stage salted aggregation.
    Stage 1 groups on (token, salt) — hot keys ('the') split across 8
    reducers; stage 2 sums the partials per token. Identical result to
    the direct groupBy (the oracle), with the skewed shuffle replaced
    by two balanced ones. At 100 TB this is the manual fallback when
    AQE skew handling isn't enough (SCALE.md §dedup)."""
    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    salted = tokens.withColumn(
        "salt", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(8))
    )
    partial = salted.groupBy("token", "salt").agg(
        F.count(F.lit(1)).alias("partial_tf")
    )
    return partial.groupBy("token").agg(F.sum("partial_tf").alias("tf"))


@register(
    "agg_conditional",
    oracle=f"""
SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
  CAST(SUM(CASE WHEN event_type <> 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS other_value
FROM events
GROUP BY user_id
""",
    tags=("agg",),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 [REF]: conditional amount pick inside an aggregate — the
    KAU-vs-KAG currency ternary (kinesis-pay.php:507-508)."""
    ev = load(spark, sf_dir, "events")
    zero = F.lit("0").cast("decimal(18,2)")
    val = dec("value", 2)
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", val).otherwise(zero))
        .cast("double")
        .alias("purchase_value"),
        F.sum(F.when(F.col("event_type") != "purchase", val).otherwise(zero))
        .cast("double")
        .alias("other_value"),
    )


@register(
    "agg_corr_covar",
    oracle="""
SELECT l_returnflag,
  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
  round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
  round(stddev_samp(l_discount), 6) AS discount_stddev,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates — correlation, sample covariance, and
    sample stddev per group (the profiling pass a feature-engineering
    pipeline runs before normalization). All are single-pass
    partial-aggregable moments, so they scale exactly like sum/avg;
    outputs rounded to absorb accumulation-order ulps between engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("discount_stddev"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_time_rollup",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS s,
    MIN(value) AS mn, MAX(value) AS mx
  FROM events GROUP BY 1, 2
)
SELECT CAST(date_trunc('week', day) AS DATE) AS week_start, event_type,
  CAST(SUM(n) AS BIGINT) AS n_events,
  CAST(SUM(s) AS DOUBLE) AS sum_value,
  MIN(mn) AS min_value,
  MAX(mx) AS max_value,
  CAST(SUM(s) AS DOUBLE) / SUM(n) AS avg_value
FROM daily GROUP BY 1, 2
""",
    tags=("agg", "rollup"),
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time-bucket rollup (the hypertable/continuous-
    aggregate pattern): daily partials per event_type, then the weekly
    level recomputed FROM the daily partials — sum-of-sums,
    sum-of-counts, min-of-mins — never from raw rows. This is the
    mergeability property that makes downsampled retention cheap at
    100 TB: the weekly (and monthly, ...) levels read the tiny daily
    aggregate, not the fact table, and every aggregate here is
    decomposable so partial aggregation applies at both levels."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return daily.groupBy(
        F.to_date(F.date_trunc("week", "day")).alias("week_start"), "event_type"
    ).agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("s").cast("double").alias("sum_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
        (F.sum("s").cast("double") / F.sum("n")).alias("avg_value"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
WITH counts AS (
  SELECT c_mktsegment, n_nationkey AS nation, COUNT(*) AS c
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY c_mktsegment, n_nationkey
)
SELECT c_mktsegment,
  arg_min(nation, -c * 100 + nation) AS modal_nation,
  MAX(c) AS modal_count
FROM counts GROUP BY c_mktsegment
""",
    tags=("agg",),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value, ties broken by lowest
    value) — engine-native MODE() is tie-nondeterministic in both
    engines, so the portable formulation is count-then-argmax with an
    explicit scalar tie-break key (-count*100 + value; valid while
    value < 100, i.e. the 25 nation keys). Two hash aggregations, both
    with partial combine."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    counts = (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_mktsegment", F.col("n_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("c_mktsegment").agg(
        F.min_by("nation", -F.col("c") * 100 + F.col("nation")).alias(
            "modal_nation"
        ),
        F.max("c").alias("modal_count"),
    )


@register(
    "agg_profile_table",
    oracle="""
SELECT 'o_custkey' AS col_name,
  COUNT(*) - COUNT(o_custkey) AS n_nulls,
  COUNT(DISTINCT o_custkey) AS n_distinct,
  CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
  CAST(MAX(o_custkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderstatus',
  COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
  MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority',
  COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
  MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
""",
    tags=("agg", "stats"),
)
def agg_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profiling (the ANALYZE TABLE surface a CBO
    feeds on): null count, exact distinct count, min/max per column,
    emitted in long form. One pass per column here for oracle clarity;
    the production form computes all columns in ONE scan with
    count_distinct/min/max side by side (Spark does exactly that for
    ANALYZE ... COMPUTE STATISTICS FOR COLUMNS) and swaps the exact
    distinct for HLL++ at 100 TB (agg_approx_distinct is that path)."""
    o = load(spark, sf_dir, "orders")

    def stats(col: str):
        c = F.col(col)
        return o.agg(
            F.lit(col).alias("col_name"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        )

    return (
        stats("o_custkey")
        .unionByName(stats("o_orderstatus"))
        .unionByName(stats("o_orderpriority"))
    )


@register(
    "agg_skew_profile",
    oracle="""
WITH counts AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
), total AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t, COUNT(*) AS n_keys FROM counts
)
SELECT user_id, c AS n_rows,
  round(CAST(c AS DOUBLE) / t, 6) AS share,
  round(CAST(c AS DOUBLE) * n_keys / t, 6) AS skew_factor
FROM counts, total
ORDER BY c DESC, user_id
LIMIT 10
""",
    tags=("agg", "diagnostics"),
)
def agg_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiling — the diagnosis that picks between plain
    shuffle, AQE skew-join, and salting (SCALE.md): per-key row counts,
    each hot key's share of the table, and its skew factor (share ×
    key count; 1.0 = perfectly uniform). Top-10 by count. The per-key
    count is one partial-aggregated shuffle; the totals join is a
    1-row broadcast."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(
        F.sum("c").cast("bigint").alias("t"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            F.col("c").alias("n_rows"),
            F.round(F.col("c").cast("double") / F.col("t"), 6).alias("share"),
            F.round(
                F.col("c").cast("double") * F.col("n_keys") / F.col("t"), 6
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n_rows").desc(), "user_id")
        .limit(10)
    )


@register(
    "agg_profile_single_pass",
    oracle="""
SELECT COUNT(*) AS n_rows,
  COUNT(*) - COUNT(o_custkey) AS custkey_nulls,
  COUNT(DISTINCT o_custkey) AS custkey_distinct,
  CAST(MIN(o_custkey) AS BIGINT) AS custkey_min,
  CAST(MAX(o_custkey) AS BIGINT) AS custkey_max,
  COUNT(DISTINCT o_orderstatus) AS status_distinct,
  MIN(o_orderstatus) AS status_min,
  MAX(o_orderstatus) AS status_max,
  COUNT(DISTINCT o_orderpriority) AS priority_distinct,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
  MIN(o_totalprice) AS price_min,
  MAX(o_totalprice) AS price_max
FROM orders
""",
    tags=("agg", "stats"),
)
def agg_profile_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production form of agg_profile_table: ALL column statistics
    in ONE scan — one wide aggregation row instead of one pass per
    column. This is how ANALYZE TABLE ... FOR COLUMNS executes: a
    single partial+final hash aggregation, so profiling a 100 TB table
    costs exactly one read however many columns are profiled. (The
    multi-distinct here expands internally; with many columns swap
    exact distinct for HLL++ sketches so the expansion stays flat.)

    r11 OPT: the multi-distinct Expand triples the scan stage's rows
    and all of it ran on ONE task (one split at fixture scale) —
    spread() fans the expand+partial agg over the cores (no-op at
    scale); every aggregate here is order-free (counts, min/max,
    exact DECIMAL sum)."""
    from am_kinesis_pay_spark.tables import spread

    o = spread(
        load(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
    )
    c = F.col("o_custkey")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(c)).alias("custkey_nulls"),
        F.countDistinct(c).alias("custkey_distinct"),
        F.min(c).cast("bigint").alias("custkey_min"),
        F.max(c).cast("bigint").alias("custkey_max"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.min("o_orderstatus").alias("status_min"),
        F.max("o_orderstatus").alias("status_max"),
        F.countDistinct("o_orderpriority").alias("priority_distinct"),
        dsum("o_totalprice").alias("price_sum"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
    )


@register(
    "agg_histogram",
    oracle="""
SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
  CAST(CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS DOUBLE) AS bucket_lo,
  COUNT(*) AS n,
  round(MIN(value), 6) AS lo,
  round(MAX(value), 6) AS hi
FROM events
GROUP BY 1
""",
    tags=("agg", "stats"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] fixed-width value histogram (the profiling/monitoring
    primitive behind NDV estimates and alerting dashboards). Fixed
    bucket width — not equi-depth from a global min/max — because a
    fixed width needs no pre-pass: one partial+final hash aggregation,
    streaming-mergeable, and buckets from different shards/days union
    by key. Equi-depth at 100 TB is the percentile-sketch path
    (agg_percentile_approx) instead."""
    ev = load(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / F.lit(25.0)).cast("bigint")
    return ev.groupBy(bucket.alias("bucket")).agg(
        (F.first(bucket) * F.lit(25.0)).alias("bucket_lo"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    ).select("bucket", "bucket_lo", "n", "lo", "hi")


@register(
    "agg_anomaly_mad",
    oracle="""
WITH med AS (
  SELECT event_type, median(value) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_id, e.event_type, e.value, s.med,
    abs(e.value - s.med) AS adev
  FROM events e JOIN med s USING (event_type)
), mad AS (
  SELECT event_type, median(adev) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type,
  round((d.value - d.med) / (1.4826 * m.mad), 4) AS robust_z
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0 AND d.adev > 3 * 1.4826 * m.mad
""",
    tags=("agg", "stats"),
)
def agg_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] robust outlier detection via median absolute deviation:
    flag events whose |value - median| exceeds 3 sigma-equivalents
    (MAD x 1.4826 estimates sigma under normality). Median/MAD, unlike
    mean/stddev, are not corrupted by the outliers being hunted —
    the standard data-quality gate shape. Two grouped exact medians +
    two broadcast joins (5 event types -> both stats frames are tiny);
    at 100 TB swap percentile() for percentile_approx() and the plan
    is one scan + two sketch aggregations, no exact sort."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("mad") > 0)
            & (F.col("adev") > F.lit(3 * 1.4826) * F.col("mad"))
        )
        .select(
            "event_id",
            "event_type",
            F.round(
                (F.col("value") - F.col("med"))
                / (F.lit(1.4826) * F.col("mad")),
                4,
            ).alias("robust_z"),
        )
    )


@register(
    "agg_histogram_equidepth",
    oracle="""
WITH b AS (
  SELECT quantile_cont(value, 0.25) AS b1,
    quantile_cont(value, 0.50) AS b2,
    quantile_cont(value, 0.75) AS b3
  FROM events
)
SELECT CASE WHEN value <= b1 THEN 1 WHEN value <= b2 THEN 2
            WHEN value <= b3 THEN 3 ELSE 4 END AS bucket,
  COUNT(*) AS n,
  round(MIN(value), 6) AS lo,
  round(MAX(value), 6) AS hi
FROM events CROSS JOIN b
GROUP BY 1
""",
    tags=("agg", "stats"),
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram — the two-pass counterpart of
    agg_histogram's one-pass fixed-width form: pass 1 computes the
    quartile boundaries, pass 2 buckets every row against them (a
    1-row broadcast). Equi-depth is what optimizers want for
    selectivity estimation (equal mass per bucket regardless of value
    skew) and what it costs is exactly this extra pass + the loss of
    mergeability. At 100 TB pass 1 becomes percentile_approx (KLL
    sketch, mergeable) and the bucket error is the sketch epsilon."""
    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.expr("percentile(value, 0.25)").alias("b1"),
        F.expr("percentile(value, 0.50)").alias("b2"),
        F.expr("percentile(value, 0.75)").alias("b3"),
    )
    v = F.col("value")
    bucket = (
        F.when(v <= F.col("b1"), 1)
        .when(v <= F.col("b2"), 2)
        .when(v <= F.col("b3"), 3)
        .otherwise(4)
    )
    return (
        ev.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


@register("agg_hll_partitioned", tags=("agg", "sketch"))
def agg_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct-count rollup: per-day HLL sketches of
    user_id per event_type, merged across days with hll_union_agg and
    estimated once — the agg_time_rollup continuous-aggregate property
    applied to COUNT DISTINCT, which plain partial counts cannot give
    (distincts don't add). At 100 TB the daily sketch table is the ONLY
    thing any rollup window rescans: each sketch is ~KB regardless of
    day volume, merging is associative/commutative, and the estimate is
    identical to sketching the raw union directly (pinned in
    test_engine.py).

    DELIBERATELY absent from oracle_sql(): DuckDB's HLL is a different
    sketch, so no cross-engine oracle exists — the engine-internal
    merge≡direct equality is pinned in pytest instead, and since r6 the
    result also carries its own tolerance audit (``within_tol`` vs the
    exact distinct, 3-sigma of the default-precision sketch ≈ 5%) so
    the driver's rows-only sample still shows estimator sanity."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct_users"
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct_users")
    )
    tol = F.greatest(
        F.lit(2.0), F.lit(0.12) * F.col("exact_distinct_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "approx_distinct_users",
            "exact_distinct_users",
            (
                F.abs(
                    F.col("approx_distinct_users")
                    - F.col("exact_distinct_users")
                )
                <= tol
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events
GROUP BY event_type
""",
    tags=("agg", "sketch"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct count via bitmaps — the companion to
    agg_hll_partitioned's approximate path: bitmap_bucket_number
    partitions the key domain into disjoint 32k-bit buckets, each
    (group, bucket) builds a bitmap partial, OR-merge collapses
    partials, and the total is the SUM of per-bucket popcounts. Unlike
    COUNT(DISTINCT) partials (not addable) this state merges
    associatively — the same property that lets a daily rollup table
    answer weekly distincts exactly. Cost: state ∝ key-domain density
    (4 KB per occupied bucket), the right trade when keys are dense
    ints; HLL is the sparse/unbounded-domain fallback. The oracle is
    plain COUNT(DISTINCT): bitmaps are exact, so the engines agree."""
    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct_users"))
    )


@register(
    "agg_filter_clause",
    oracle="""
SELECT l_returnflag,
  COUNT(*) AS n_total,
  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
  COUNT(*) FILTER (WHERE l_quantity >= 30) AS n_bulk,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_revenue
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregates: several differently-filtered
    aggregates from ONE scan and ONE hash-aggregate pass — the
    declarative form of A7's when().otherwise() conditional aggregation
    (kinesis-pay.php:507-508), and the idiom that replaces N self-joins
    of per-condition subqueries. The Spark side runs the same SQL text
    via spark.sql; Catalyst folds every FILTER into conditional partial
    aggregates (map-side combine intact — one shuffle of the 3 group
    keys regardless of filter count)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_vfc")
    return spark.sql(
        """
        SELECT l_returnflag,
          COUNT(*) AS n_total,
          COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
          COUNT(*) FILTER (WHERE l_quantity >= 30) AS n_bulk,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
               FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_revenue
        FROM lineitem_vfc
        GROUP BY l_returnflag
        """
    )


@register(
    "agg_ab_ttest",
    oracle="""
WITH assigned AS (
  SELECT CAST(round(value, 3) AS DECIMAL(18,6)) AS v,
         user_id % 2 = 0 AS grp_a
  FROM events WHERE event_type = 'purchase'
), stats AS (
  SELECT
    CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN NOT grp_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN grp_a THEN v END) AS DOUBLE) AS s_a,
    CAST(SUM(CASE WHEN NOT grp_a THEN v END) AS DOUBLE) AS s_b,
    CAST(SUM(CASE WHEN grp_a THEN v * v END) AS DOUBLE) AS q_a,
    CAST(SUM(CASE WHEN NOT grp_a THEN v * v END) AS DOUBLE) AS q_b
  FROM assigned
), m AS (
  SELECT n_a, n_b,
    s_a / n_a AS mean_a, s_b / n_b AS mean_b,
    (q_a - s_a * s_a / n_a) / (n_a - 1) AS var_a,
    (q_b - s_b * s_b / n_b) / (n_b - 1) AS var_b
  FROM stats WHERE n_a >= 2 AND n_b >= 2
)
SELECT n_a, n_b,
  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
  round((mean_a - mean_b)
        / sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat,
  round(pow(var_a / n_a + var_b / n_b, 2)
        / (pow(var_a / n_a, 2) / (n_a - 1)
           + pow(var_b / n_b, 2) / (n_b - 1)), 6) AS welch_dof
FROM m WHERE var_a > 0 AND var_b > 0
""",
    tags=("agg", "stats"),
)
def agg_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test — the experimentation-platform
    primitive (did variant A's purchase value differ from B's?): users
    hash-split into arms (user_id % 2, the deterministic assignment
    `sample_train_split` generalizes), then ONE conditional-aggregate
    scan yields both arms' counts and exact-DECIMAL sum / sum-of-
    squares, from which mean, unbiased variance, the t statistic and
    the Welch–Satterthwaite degrees of freedom are 1-row arithmetic.

    Plan shape: the whole test is a single map-side-combined aggregate
    over the filtered fact scan — no shuffle wider than one row, which
    is what makes per-experiment × per-metric grids (thousands of
    simultaneous tests) one grouped aggregation at 100 TB (GROUP BY
    experiment_id, metric instead of the 1-row form; the arithmetic is
    unchanged). Float discipline: per-row values round to 3 dp into
    DECIMAL(18,6) so sums are order-independent; v*v stays DECIMAL
    (exact); the final mean/variance/t arithmetic runs on 1 row in
    doubles with the IDENTICAL expression tree on both engines, then
    rounds to 6 dp."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = F.round("value", 3).cast("decimal(18,6)")
    grp_a = F.col("user_id") % 2 == 0
    stats = ev.select(v.alias("v"), grp_a.alias("grp_a")).agg(
        F.sum(F.when(F.col("grp_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(~F.col("grp_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("grp_a"), F.col("v"))).cast("double").alias("s_a"),
        F.sum(F.when(~F.col("grp_a"), F.col("v"))).cast("double").alias("s_b"),
        F.sum(F.when(F.col("grp_a"), F.col("v") * F.col("v")))
        .cast("double")
        .alias("q_a"),
        F.sum(F.when(~F.col("grp_a"), F.col("v") * F.col("v")))
        .cast("double")
        .alias("q_b"),
    )
    mean_a = F.col("s_a") / F.col("n_a")
    mean_b = F.col("s_b") / F.col("n_b")
    var_a = (F.col("q_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("q_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    # degenerate-arm guard (r10, the agg_power_mde class): a constant-
    # valued arm's variance can round to a tiny NEGATIVE double, where
    # DuckDB sqrt() throws and ANSI Spark divides by zero — exclude
    # identically on both engines (oracle mirrors the filters)
    m = stats.filter(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    ).select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
    ).filter((F.col("var_a") > 0) & (F.col("var_b") > 0))
    se2_a = F.col("var_a") / F.col("n_a")
    se2_b = F.col("var_b") / F.col("n_b")
    return m.select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(
            (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2_a + se2_b), 6
        ).alias("t_stat"),
        F.round(
            F.pow(se2_a + se2_b, 2)
            / (
                F.pow(se2_a, 2) / (F.col("n_a") - 1)
                + F.pow(se2_b, 2) / (F.col("n_b") - 1)
            ),
            6,
        ).alias("welch_dof"),
    )


@register(
    "agg_model_auc",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      AS score,
    CAST(MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                  THEN 1 ELSE 0 END) AS INT) AS label
  FROM events GROUP BY user_id
), ranked AS (
  SELECT score, label,
    RANK() OVER (ORDER BY score) AS rk,
    COUNT(*) OVER (PARTITION BY score) AS tie_n
  FROM per_user
), stats AS (
  SELECT
    CAST(SUM(label) AS BIGINT) AS n_pos,
    CAST(SUM(1 - label) AS BIGINT) AS n_neg,
    SUM(CASE WHEN label = 1 THEN rk + (tie_n - 1) / 2.0 ELSE 0 END)
      AS pos_rank_sum
  FROM ranked
)
SELECT n_pos, n_neg,
  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
    round((pos_rank_sum - n_pos * (n_pos + 1) / 2.0)
          / (CAST(n_pos AS DOUBLE) * n_neg), 6) END AS auc
FROM stats
""",
    tags=("agg", "stats"),
)
def agg_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC by rank-sum (the Mann–Whitney U identity) — the model
    evaluation every quality-classifier gate in the LLM pipeline needs
    at corpus scale, computed WITHOUT thresholds or curve
    interpolation: AUC = (Σ midranks of positives − n⁺(n⁺+1)/2) /
    (n⁺·n⁻), with ties getting the textbook midrank (RANK + (ties−1)/2
    from one extra COUNT window on the same sort). Here the probe
    model scores users by view count and the label is
    purchased-or-not. Every midrank is a multiple of 0.5 exactly
    representable in binary, so the rank sum is order-independent —
    the result is EXACT, no float convention needed.

    Plan shape: NO per-row ranking window at all — the rank-sum only
    needs per-score tie-group midranks, so the plan is (1) hash
    aggregate to row-per-user, (2) hash aggregate to row-PER-SCORE
    (n_s, pos_s) — already bounded by score cardinality, not user
    count — then (3) the two-pass prefix-sum cumulative
    (sample_shard_shuffle's pattern): score-prefix buckets (score>>6,
    order-aligned), per-bucket totals cumsum'd on the tiny bucket
    frame, broadcast back, within-bucket running count partitioned BY
    bucket. midrank(s) = rows_below(s) + (n_s+1)/2, and
    pos_rank_sum = Σ pos_s·midrank(s). Midranks are exact multiples
    of 0.5 so the sum is order-independent — EXACT, no float
    convention needed. Nothing in the plan sorts more than one score
    bucket in one task; the oracle keeps the textbook per-row RANK
    formulation, pinning the algebraic identity."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        )
        .cast("int")
        .alias("label"),
    )
    per_score = per_user.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
        F.sum("label").cast("bigint").alias("pos_s"),
    )
    bucketed = per_score.withColumn("bkt", F.shiftright("score", 6))
    offsets = (
        bucketed.groupBy("bkt")
        .agg(F.sum("n_s").alias("n_b"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n_b").over(
                    W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "offset")
    )
    w_in = (
        W.partitionBy("bkt")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    rows_below = F.col("offset") + F.coalesce(F.sum("n_s").over(w_in), F.lit(0))
    midrank = rows_below + (F.col("n_s") + 1) / 2.0
    stats = (
        bucketed.join(F.broadcast(offsets), "bkt")
        .select("n_s", "pos_s", midrank.alias("midrank"))
        .agg(
            F.sum("pos_s").cast("bigint").alias("n_pos"),
            F.sum(F.col("n_s") - F.col("pos_s")).cast("bigint").alias("n_neg"),
            F.sum(F.col("pos_s") * F.col("midrank")).alias("pos_rank_sum"),
        )
    )
    return stats.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                (
                    F.col("pos_rank_sum")
                    - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
                )
                / (F.col("n_pos").cast("double") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
    )


@register(
    "agg_decile_lift",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      AS score,
    CAST(MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                  THEN 1 ELSE 0 END) AS INT) AS label
  FROM events GROUP BY user_id
), deciled AS (
  SELECT label,
    NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile
  FROM per_user
), by_decile AS (
  SELECT decile,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(label) AS BIGINT) AS n_pos
  FROM deciled GROUP BY decile
), totals AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS n_all, CAST(SUM(n_pos) AS DOUBLE) AS pos_all
  FROM by_decile
)
SELECT CAST(decile AS INT) AS decile, n, n_pos,
  round(CAST(n_pos AS DOUBLE) / n, 6) AS response_rate,
  round(CAST(SUM(n_pos) OVER (ORDER BY decile) AS DOUBLE) / t.pos_all, 6)
    AS cum_capture,
  round((CAST(n_pos AS DOUBLE) / n) / (t.pos_all / t.n_all), 6) AS lift
FROM by_decile CROSS JOIN totals t
""",
    tags=("agg", "stats"),
)
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table — `agg_model_auc`'s operational twin
    and the other half of every classifier evaluation: rank the
    population by model score, cut into deciles (best first), and per
    decile report the response rate, the cumulative capture of all
    positives, and the lift over the base rate — the table that
    decides where a quality-classifier threshold actually goes (top-k
    deciles kept, rest dropped).

    Plan shape: NTILE's global sort is replaced by the two-pass
    prefix-sum rank (sample_shard_shuffle's pattern): sort key
    sk = -score (so best-first order is ascending), order-aligned
    buckets sk>>6 (arithmetic shift keeps negatives monotone),
    per-bucket counts cumsum'd on the tiny bucket frame, broadcast
    back, row_number WITHIN each bucket + offset = exact global seq —
    then NTILE's arithmetic applied to seq directly (first n%10
    deciles get one extra row), which is bit-identical to the
    engines' NTILE. No task ever sorts more than one score bucket.
    Then a 10-row GROUP BY and window+broadcast arithmetic on the
    10-row frame. All ratio inputs are exact integers, so 6-dp
    rounding is pure formatting — hash-exact on both engines.
    Tie-break by user_id keeps decile membership identical
    cross-engine."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        )
        .cast("int")
        .alias("label"),
    )
    bucketed = per_user.select(
        "label",
        "user_id",
        (-F.col("score")).alias("sk"),
    ).withColumn("bkt", F.shiftright("sk", 6))
    offsets = (
        bucketed.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("n_b"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n_b").over(
                    W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "offset")
    )
    n_total = per_user.agg(F.count(F.lit(1)).alias("n_all_rows"))
    w_bkt = W.partitionBy("bkt").orderBy("sk", "user_id")
    seq = (F.col("offset") + F.row_number().over(w_bkt) - 1).alias("seq")
    # NTILE(10) arithmetic on the exact 0-based seq: q = n div 10 rows
    # per decile, the first r = n mod 10 deciles take one extra row.
    q = F.expr("n_all_rows div 10")
    r = F.col("n_all_rows") % 10
    cut = r * (q + 1)
    decile = F.when(
        F.col("seq") < cut,
        F.expr("seq div (n_all_rows div 10 + 1)") + 1,
    ).otherwise(
        r
        + F.expr(
            "(seq - (n_all_rows % 10) * (n_all_rows div 10 + 1))"
            " div greatest(n_all_rows div 10, 1)"
        )
        + 1
    )
    deciled = (
        bucketed.join(F.broadcast(offsets), "bkt")
        .select("label", seq)
        .crossJoin(F.broadcast(n_total))
        .select("label", decile.cast("int").alias("decile"))
    )
    by_decile = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("n_pos"),
    )
    totals = by_decile.agg(
        F.sum("n").cast("double").alias("n_all"),
        F.sum("n_pos").cast("double").alias("pos_all"),
    )
    w_cum = W.orderBy("decile")
    return (
        by_decile.crossJoin(F.broadcast(totals))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias(
                "response_rate"
            ),
            F.round(
                F.sum("n_pos").over(w_cum).cast("double") / F.col("pos_all"),
                6,
            ).alias("cum_capture"),
            F.round(
                (F.col("n_pos").cast("double") / F.col("n"))
                / (F.col("pos_all") / F.col("n_all")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "agg_ols_trend",
    oracle="""
WITH daily AS (
  SELECT event_type,
    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
    CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), sums AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS k,
    SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM daily GROUP BY event_type
)
SELECT event_type, k AS n_days,
  CAST(k * sxy - sx * sy AS DOUBLE)
    / CAST(k * sxx - sx * sx AS DOUBLE) AS slope,
  (CAST(sy AS DOUBLE)
     - (CAST(k * sxy - sx * sy AS DOUBLE)
        / CAST(k * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
    / CAST(k AS DOUBLE) AS intercept,
  CASE WHEN k * syy - sy * sy = 0 THEN NULL
       ELSE (CAST(k * sxy - sx * sy AS DOUBLE)
             * CAST(k * sxy - sx * sy AS DOUBLE))
            / (CAST(k * sxx - sx * sx AS DOUBLE)
               * CAST(k * syy - sy * sy AS DOUBLE))
  END AS r2
FROM sums
WHERE k >= 2 AND k * sxx - sx * sx <> 0
""",
    tags=("agg", "stats"),
)
def agg_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-volume trend via closed-form OLS — is traffic for
    each event type growing or shrinking, and how linearly? slope,
    intercept, and R² of y = daily count over x = day index.

    Determinism (the repo's exact-sufficient-statistics discipline):
    x and y are INTEGERS, so every sufficient statistic (k, Σx, Σy,
    Σxy, Σx², Σy²) is an exact BIGINT in any accumulation order; the
    doubles appear only in the final closed-form expressions, written
    with the identical operation order in both engines — no rounding
    step needed anywhere. The r² numerator squares in DOUBLE because
    (kΣxy - ΣxΣy)² can overflow BIGINT at warehouse scale while the
    unsquared term cannot.

    Scale shape: one groupBy to days (the same shuffle any daily
    rollup pays), one re-aggregation of the O(types × days) frame —
    the regression itself costs nothing more than the rollup. The
    same sufficient-statistics form is how regr_slope/regr_r2 are
    computed internally, but those accumulate doubles in partition
    order (not reproducible cross-engine), which is why this query
    keeps the statistics integral."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    daily = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        "y",
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    s_num = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    s_den = (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    r_den = F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = s_num / s_den
    return (
        sums.filter(
            (F.col("k") >= 2)
            & (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
        )
        .select(
            "event_type",
            F.col("k").alias("n_days"),
            slope.alias("slope"),
            (
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / F.col("k").cast("double")
            ).alias("intercept"),
            F.when(r_den == 0, F.lit(None).cast("double"))
            .otherwise(s_num * s_num / (s_den * r_den.cast("double")))
            .alias("r2"),
        )
    )


_CUPED_SPLIT = "2024-01-16"


@register(
    "agg_cuped_adjusted",
    oracle=f"""
WITH u AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT} 00:00:00'
             THEN 1 ELSE 0 END) AS BIGINT) AS x,
    CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT} 00:00:00'
             THEN CAST(value AS DECIMAL(18,2)) END), 0)
         AS DECIMAL(18,2)) AS y
  FROM events GROUP BY user_id
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS gsx, SUM(y) AS gsy,
    SUM(x * y) AS gsxy, SUM(x * x) AS gsxx
  FROM u
), th AS (
  SELECT CAST(n * gsxy - gsx * gsy AS DOUBLE)
           / CAST(n * gsxx - gsx * gsx AS DOUBLE) AS theta,
         CAST(gsx AS DOUBLE) / n AS mx
  FROM g
), a AS (
  SELECT user_id % 2 AS arm, CAST(COUNT(*) AS BIGINT) AS n_users,
    SUM(y) AS sy, SUM(x) AS sx, SUM(y * y) AS syy,
    SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM u GROUP BY user_id % 2
)
SELECT CAST(arm AS BIGINT) AS arm, n_users,
  CAST(sy AS DOUBLE) / n_users AS mean_y,
  CAST(sy AS DOUBLE) / n_users
    - th.theta * (CAST(sx AS DOUBLE) / n_users - th.mx) AS mean_y_cuped,
  CAST(n_users * syy - sy * sy AS DOUBLE)
    / (n_users * (n_users - 1)) AS var_y,
  CAST(n_users * syy - sy * sy AS DOUBLE) / (n_users * (n_users - 1))
    - 2 * th.theta * (CAST(n_users * sxy - sx * sy AS DOUBLE)
                      / (n_users * (n_users - 1)))
    + th.theta * th.theta * (CAST(n_users * sxx - sx * sx AS DOUBLE)
                             / (n_users * (n_users - 1))) AS var_y_cuped,
  th.theta AS theta
FROM a, th
""",
    tags=("agg", "stats", "experiment"),
)
def agg_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, WSDM — "Improving
    the Sensitivity of Online Controlled Experiments"): adjust each
    experiment arm's post-period metric with a pre-period covariate,
    y_adj = y - θ(x - E[x]), θ = cov(x,y)/var(x) — the standard way to
    cut A/B-test variance without changing the point estimate. Arms
    are the deterministic user_id % 2 split; x = the user's
    PRE-period event count (an integer — covariates from before the
    experiment can't be affected by it), y = the user's post-period
    decimal spend.

    Determinism: the entire computation reduces to exact sufficient
    statistics — integer counts, DECIMAL sums of y, x·y, y² (per-user
    y is re-cast to DECIMAL(18,2) after aggregation so squares stay
    inside precision 38) — and doubles appear only in the final
    closed-form mean/variance/θ expressions, written with the same
    operation order in both engines. The per-arm adjusted MEAN is
    computed algebraically (mean_y - θ(mean_x - E[x])) rather than by
    summing per-user adjusted doubles, which would be
    accumulation-order-dependent; likewise var(y_adj) expands to
    var_y - 2θcov + θ²var_x over exact partials.

    Scale shape: one groupBy(user) with conditional aggregates (the
    same shuffle any per-user rollup pays), a 1-row global-θ
    broadcast, and a per-arm re-aggregation of the user frame —
    O(users) intermediate, O(arms) output."""
    split = F.lit(f"{_CUPED_SPLIT} 00:00:00").cast("timestamp")
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= split, dec("value", 2))),
            F.lit(0),
        )
        .cast("decimal(18,2)")
        .alias("y"),
    )
    g = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("gsx"),
        F.sum("y").alias("gsy"),
        F.sum(F.col("x") * F.col("y")).alias("gsxy"),
        F.sum(F.col("x") * F.col("x")).alias("gsxx"),
    )
    th = g.select(
        (
            (F.col("n") * F.col("gsxy") - F.col("gsx") * F.col("gsy")).cast(
                "double"
            )
            / (F.col("n") * F.col("gsxx") - F.col("gsx") * F.col("gsx")).cast(
                "double"
            )
        ).alias("theta"),
        (F.col("gsx").cast("double") / F.col("n")).alias("mx"),
    )
    a = u.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("y").alias("sy"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nn1 = F.col("n_users") * (F.col("n_users") - 1)
    mean_y = F.col("sy").cast("double") / F.col("n_users")
    var_y = (
        F.col("n_users") * F.col("syy") - F.col("sy") * F.col("sy")
    ).cast("double") / nn1
    cov_a = (
        F.col("n_users") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / nn1
    var_x = (
        F.col("n_users") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double") / nn1
    return a.crossJoin(F.broadcast(th)).select(
        F.col("arm").cast("bigint").alias("arm"),
        "n_users",
        mean_y.alias("mean_y"),
        (
            mean_y
            - F.col("theta")
            * (F.col("sx").cast("double") / F.col("n_users") - F.col("mx"))
        ).alias("mean_y_cuped"),
        var_y.alias("var_y"),
        (
            var_y
            - F.lit(2) * F.col("theta") * cov_a
            + F.col("theta") * F.col("theta") * var_x
        ).alias("var_y_cuped"),
        "theta",
    )


@register(
    "agg_ordered_listagg",
    oracle="""
WITH l AS (
  SELECT user_id,
    string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_list
  FROM events GROUP BY user_id
)
SELECT user_id, type_list,
  CAST(length(type_list) - length(replace(type_list, ',', '')) + 1
       AS BIGINT) AS n_types
FROM l
""",
    tags=("agg", "sql"),
)
def agg_ordered_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4 `listagg ... WITHIN GROUP`,
    SQL:2016 F441 — DuckDB's string_agg ORDER BY twin): each user's
    distinct event types joined in lexical order. The determinism
    point this entry pins: bare collect_list/collect_set (and an
    unordered string_agg) emit in PARTITION-ARRIVAL order, which is
    run- and engine-dependent — an explicit WITHIN GROUP order is the
    only hash-stable way to aggregate strings. The aggregation is one
    groupBy with map-side partials; per-group state is bounded by the
    distinct-type alphabet, not the row count. (n_types derives from
    the joined string: Spark 4.1 hits an internal ClassCastException
    when a listagg-DISTINCT-WITHIN-GROUP shares its aggregate with a
    second DISTINCT aggregate, so the count is one string expression
    instead.)"""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_v_listagg")
    return spark.sql(
        """
        WITH l AS (
          SELECT user_id,
            listagg(DISTINCT event_type, ',')
              WITHIN GROUP (ORDER BY event_type) AS type_list
          FROM events_v_listagg
          GROUP BY user_id
        )
        SELECT user_id, type_list,
          CAST(length(type_list) - length(replace(type_list, ',', '')) + 1
               AS BIGINT) AS n_types
        FROM l
        """
    )


@register(
    "agg_gini_concentration",
    oracle="""
WITH r AS (
  SELECT c_mktsegment AS seg, CAST(c_acctbal AS DECIMAL(12,2)) AS x,
    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey) AS BIGINT) AS i
  FROM customer
), s AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(i * x) AS six
  FROM r GROUP BY seg
)
SELECT seg, n,
  CAST(sx AS DOUBLE) AS total_bal,
  2.0 * CAST(six AS DOUBLE) / (n * CAST(sx AS DOUBLE))
    - (CAST(n AS DOUBLE) + 1) / n AS gini
FROM s
WHERE sx <> 0
""",
    tags=("agg", "stats"),
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration audit: the Gini coefficient of account balances
    per market segment — the inequality measure behind "what share of
    revenue do the top customers hold" questions — via the rank
    formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over ascending-sorted x.

    Determinism: i·x_i is BIGINT × DECIMAL (exact, any accumulation
    order), ranks come from an explicit (balance, custkey) sort order
    — equal balances contribute the same Σi·x regardless of tie
    order, so the statistic is tie-stable by construction — and the
    one double expression is written identically in both engines.

    Scale shape: one Exchange+Sort per segment for the rank window
    (the same shuffle any per-group ordering pays; at 100 TB swap the
    global per-group sort for the two-pass prefix-sum rank the
    agg_decile_lift docstring documents), then a per-segment
    aggregation of exact partials."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        dec("c_acctbal", 2).alias("x"),
        "c_acctbal",
        "c_custkey",
    )
    w = W.partitionBy("seg").orderBy("c_acctbal", "c_custkey")
    r = c.withColumn("i", F.row_number().over(w).cast("bigint"))
    s = r.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return s.filter(F.col("sx") != 0).select(
        "seg",
        "n",
        F.col("sx").cast("double").alias("total_bal"),
        (
            F.lit(2.0)
            * F.col("six").cast("double")
            / (F.col("n") * F.col("sx").cast("double"))
            - (F.col("n").cast("double") + 1) / F.col("n")
        ).alias("gini"),
    )


@register(
    "agg_quantile_rollup",
    oracle="""
WITH h AS (
  SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(floor(value / 5.0) AS BIGINT)
), c AS (
  SELECT event_type, bin, n,
    SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
    SUM(n) OVER (PARTITION BY event_type) AS total
  FROM h
)
SELECT event_type,
  CAST(MAX(total) AS BIGINT) AS n_events,
  CAST(5.0 * (MIN(CASE WHEN cum >= 0.50 * total THEN bin END) + 1) AS DOUBLE)
    AS p50_edge,
  CAST(5.0 * (MIN(CASE WHEN cum >= 0.95 * total THEN bin END) + 1) AS DOUBLE)
    AS p95_edge,
  CAST(5.0 * (MIN(CASE WHEN cum >= 0.99 * total THEN bin END) + 1) AS DOUBLE)
    AS p99_edge
FROM c GROUP BY event_type
""",
    tags=("agg", "sketch", "incremental"),
)
def agg_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE rollup — the continuous-aggregate property of
    agg_time_rollup applied to percentiles, which raw percentile state
    cannot give (order statistics don't add; sketches like t-digest
    trade exactness for it). Equi-width integer histograms DO add:
    the Spark side genuinely maintains per-(type, day) histogram
    partials (the daily sketch table a rollup pipeline would persist)
    and merges them by bin-count addition; quantile-at-p is the first
    bin whose cumulative count reaches p*total, reported as the bin's
    upper edge — error bounded by the bin width (5.0), a STATED bound,
    unlike an engine sketch's. The DuckDB oracle computes the same
    quantiles directly from the raw table, so the hash match PROVES
    histogram-merge associativity, exactly the mv_incremental_refresh
    trick — and the reason this entry is oracle-checkable while
    agg_percentile_approx/agg_hll_partitioned never can be. All
    arithmetic is integer counts plus one p*total comparison of exact
    integers; nothing accumulates in float.

    At 100 TB: the daily histogram table is O(days x types x occupied
    bins) — KBs — and any rollup window (weekly p99, trailing-30-day
    p50) rescans sketches, never events."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") / 5.0).cast("bigint").alias("bin"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    merged = daily.groupBy("event_type", "bin").agg(
        F.sum("n").cast("bigint").alias("n")
    )
    w_cum = W.partitionBy("event_type").orderBy("bin")
    w_tot = W.partitionBy("event_type")
    c = merged.select(
        "event_type",
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("total"),
    )

    def edge(p):
        return (
            F.lit(5.0)
            * (
                F.min(
                    F.when(
                        F.col("cum") >= F.lit(p) * F.col("total"), F.col("bin")
                    )
                )
                + 1
            )
        ).cast("double")

    return c.groupBy("event_type").agg(
        F.max("total").cast("bigint").alias("n_events"),
        edge(0.50).alias("p50_edge"),
        edge(0.95).alias("p95_edge"),
        edge(0.99).alias("p99_edge"),
    )


@register(
    "dq_benford",
    oracle="""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS INT) AS d
  FROM orders WHERE o_totalprice >= 1
), counts AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts)
SELECT c.d AS leading_digit, c.n,
  CAST(c.n AS DOUBLE) / t.t AS observed_p,
  round(log10(1.0 + 1.0 / c.d), 6) AS benford_p,
  round(abs(CAST(c.n AS DOUBLE) / t.t - round(log10(1.0 + 1.0 / c.d), 6)), 6)
    AS abs_dev
FROM counts c CROSS JOIN tot t
""",
    tags=("agg", "dq"),
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classical fraud / fabricated-data screen (Benford 1938; Nigrini's
    forensic-accounting standard): naturally-occurring multiplicative
    amounts put digit d first with probability log10(1 + 1/d) (~30.1%
    ones, ~4.6% nines), and a ledger that deviates hard was rounded,
    capped, or invented. Reports per-digit observed vs expected and
    the absolute deviation — the audit table a release gate thresholds
    on (the distribution-level sibling of dq_expectations' row-level
    checks).

    Exactness: the leading digit comes from the DECIMAL(18,2) string
    rendering (identical in both engines; no float log/floor digit
    extraction), counts are integers, and the two divisions are single
    float ops on exact operands. One hash aggregation to 9 rows + a
    1-row total broadcast; at 100 TB it is one scan of one column."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("t"))
    benford_p = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d")), 6)
    obs = F.col("n").cast("double") / F.col("t")
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("leading_digit"),
        "n",
        obs.alias("observed_p"),
        benford_p.alias("benford_p"),
        F.round(F.abs(obs - benford_p), 6).alias("abs_dev"),
    )


@register(
    "agg_mann_whitney",
    oracle="""
WITH two AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('click', 'purchase')
), vals AS (
  SELECT value,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS n1v,
    CAST(COUNT(*) AS BIGINT) AS tv
  FROM two GROUP BY value
), pre AS (
  SELECT n1v, tv,
    COALESCE(SUM(tv) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM vals
), u AS (
  SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
    CAST(SUM(tv - n1v) AS BIGINT) AS n2,
    CAST(SUM(n1v * (2 * cb + tv + 1)) AS BIGINT) AS r2_1
  FROM pre
)
SELECT n1, n2,
  CAST(r2_1 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1,
  round((CAST(r2_1 - n1 * (n1 + 1) AS DOUBLE) / 2
         - CAST(n1 AS DOUBLE) * n2 / 2)
        / sqrt(CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 1) / 12), 6) AS z
FROM u
""",
    tags=("agg", "stats"),
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test (Wilcoxon rank-sum) between two event
    populations — the NONPARAMETRIC two-sample test that replaces
    agg_ab_ttest when values are skewed/heavy-tailed (payment amounts
    always are): compare summed RANKS instead of means, so no moment
    assumptions and outliers cannot dominate.

    DISTINCT-VALUE prefix-sum form (VERDICT r6: the row-scale global
    rank window was the repo's last single-task sort). One hash
    aggregation reduces the two populations to the distinct-value
    frame (value, n_clicks, total) — value is 2-dp money, so this
    frame is VALUE-DOMAIN-sized and saturates while rows grow 100×
    (sf0.1: 13k distinct vs 40k rows; at 10^9 rows it is still the
    price domain) — then one window prefix-sums totals over ordered
    distinct values. Exact midranks under ties survive arithmetically:
    every row tied at value v has midrank cum_before(v) + (t_v + 1)/2,
    so the click rank-sum doubles to the exact INTEGER
    sum(n1_v * (2*cum_before + t_v + 1)) and accumulates in BIGINT —
    the ts_autocorrelation integer convention applied to order
    statistics; the final U/z is a handful of float ops on exact
    operands. The window's input is the reduced frame (allowlisted in
    test_plan_sweep's global-window lint with this proof)."""
    ev = load(spark, sf_dir, "events")
    two = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", "value"
    )
    vals = two.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("n1v"),
        F.count(F.lit(1)).cast("bigint").alias("tv"),
    )
    w_pre = W.orderBy("value").rowsBetween(W.unboundedPreceding, -1)
    pre = vals.select(
        "n1v",
        "tv",
        F.coalesce(F.sum("tv").over(w_pre), F.lit(0))
        .cast("bigint")
        .alias("cb"),
    )
    u = pre.agg(
        F.sum("n1v").cast("bigint").alias("n1"),
        F.sum(F.col("tv") - F.col("n1v")).cast("bigint").alias("n2"),
        F.sum(
            F.col("n1v") * (F.lit(2) * F.col("cb") + F.col("tv") + 1)
        )
        .cast("bigint")
        .alias("r2_1"),
    )
    u1 = (F.col("r2_1") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2
    z = (
        u1 - F.col("n1").cast("double") * F.col("n2") / 2
    ) / F.sqrt(
        F.col("n1").cast("double")
        * F.col("n2")
        * (F.col("n1") + F.col("n2") + 1)
        / 12
    )
    return u.select("n1", "n2", u1.alias("u1"), F.round(z, 6).alias("z"))


@register(
    "agg_ks_test",
    oracle="""
WITH two AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('click', 'purchase')
), vals AS (
  SELECT value,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS c1v,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS c2v
  FROM two GROUP BY value
), pts AS (
  SELECT
    SUM(c1v) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
    SUM(c2v) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
  FROM vals
), ns AS (
  SELECT CAST(SUM(c1v) AS BIGINT) AS n1, CAST(SUM(c2v) AS BIGINT) AS n2
  FROM vals
)
SELECT n1, n2,
  CAST(MAX(abs(c1 * n2 - c2 * n1)) AS DOUBLE) / (n1 * n2) AS ks_d,
  round(sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))
        * CAST(MAX(abs(c1 * n2 - c2 * n1)) AS DOUBLE) / (n1 * n2), 6)
    AS ks_stat
FROM pts CROSS JOIN ns
GROUP BY n1, n2
""",
    tags=("agg", "stats"),
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    purchase value distributions — the SHAPE test beside
    agg_mann_whitney's location test (KS catches variance or tail
    differences a rank test misses; together they are the standard
    drift-detection pair for model-input monitoring).

    DISTINCT-VALUE prefix-sum form (VERDICT r6): one hash aggregation
    reduces the rows to per-distinct-value counts (c1_v, c2_v) — a
    VALUE-DOMAIN-sized frame for 2-dp money, saturating while rows
    grow — then ONE window cumulative-sums both counts over ordered
    distinct values. This is exactly the row-level ECDF at every jump
    point: the ECDF only changes at distinct values, and the previous
    row-scale RANGE-frame window assigned every tied row the block-end
    cumulative anyway, so the supremum over the distinct frame equals
    the supremum over rows bit-for-bit. D = max|c1*n2 - c2*n1|/(n1*n2)
    stays all-integer until two final float ops (the
    ts_autocorrelation convention applied to distribution distance).
    The 1-row (n1, n2) totals broadcast is the allowlisted NLJ; the
    prefix window's input is the reduced frame (allowlisted in
    test_plan_sweep's global-window lint with this proof)."""
    ev = load(spark, sf_dir, "events")
    two = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", "value"
    )
    vals = two.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("c1v"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("c2v"),
    )
    w = W.orderBy("value").rowsBetween(W.unboundedPreceding, W.currentRow)
    pts = vals.select(
        F.sum("c1v").over(w).alias("c1"),
        F.sum("c2v").over(w).alias("c2"),
    )
    ns = vals.agg(
        F.sum("c1v").cast("bigint").alias("n1"),
        F.sum("c2v").cast("bigint").alias("n2"),
    )
    joined = pts.crossJoin(F.broadcast(ns))
    d_num = F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
    return joined.groupBy("n1", "n2").agg(
        (d_num.cast("double") / (F.col("n1") * F.col("n2"))).alias("ks_d"),
        F.round(
            F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2"))
            )
            * d_num.cast("double")
            / (F.col("n1") * F.col("n2")),
            6,
        ).alias("ks_stat"),
    )


@register(
    "agg_entropy_profile",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
), totals AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
    CAST(COUNT(*) AS BIGINT) AS k
  FROM counts GROUP BY user_id
), terms AS (
  SELECT c.user_id, t.n, t.k,
    CAST(round(-(CAST(c.c AS DOUBLE) / t.n)
               * ln(CAST(c.c AS DOUBLE) / t.n), 6)
         AS DECIMAL(18,6)) AS term
  FROM counts c JOIN totals t ON t.user_id = c.user_id
)
SELECT user_id, n AS n_events, k AS n_types,
  CAST(SUM(term) AS DOUBLE) AS entropy_nats
FROM terms GROUP BY user_id, n, k
""",
    tags=("agg", "stats"),
)
def agg_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — the
    information-theoretic behavior profile (a bot replays one action,
    entropy ~0; an engaged user spreads across the alphabet, entropy
    near ln k), the standard anomaly/segmentation feature beside
    events_rfm_segments' recency/frequency/monetary axes.

    -sum(p ln p) with the repo's order-independent float convention:
    each type's term rounds to 6 dp then accumulates in DECIMAL, so
    the per-user sum is engine-exact despite ln(). Two hash
    aggregations (type counts, then user totals re-joined — the
    totals join is on the same user_id shuffle AQE already produced)
    and one decimal re-aggregation; state is users x alphabet."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = counts.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    p = F.col("c").cast("double") / F.col("n")
    terms = counts.join(totals, "user_id").select(
        "user_id",
        "n",
        "k",
        F.round(-p * F.log(p), 6).cast("decimal(18,6)").alias("term"),
    )
    return terms.groupBy("user_id", "n", "k").agg(
        F.sum("term").cast("double").alias("entropy_nats")
    ).select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("k").alias("n_types"),
        "entropy_nats",
    )


@register(
    "agg_chi_square",
    oracle="""
WITH obs AS (
  SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
    CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, dayofweek(CAST(ts AS DATE))
), margins AS (
  SELECT o.event_type, o.dow, o.o,
    SUM(o.o) OVER (PARTITION BY o.event_type) AS row_n,
    SUM(o.o) OVER (PARTITION BY o.dow) AS col_n,
    SUM(o.o) OVER () AS n
  FROM obs o
), terms AS (
  SELECT CAST(round(
      (o - CAST(row_n AS DOUBLE) * col_n / n)
      * (o - CAST(row_n AS DOUBLE) * col_n / n)
      / (CAST(row_n AS DOUBLE) * col_n / n), 6) AS DECIMAL(18,6)) AS term,
    event_type, dow
  FROM margins
), dims AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
    CAST(COUNT(DISTINCT dow) AS BIGINT) AS c
  FROM obs
)
SELECT CAST(SUM(term) AS DOUBLE) AS chi2,
  CAST((SELECT (r - 1) * (c - 1) FROM dims) AS BIGINT) AS dof
FROM terms
""",
    tags=("agg", "stats"),
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between event type and day-of-week
    — "does behavior depend on the weekday?", the categorical
    counterpart completing the statistics suite (t-test for means,
    Mann-Whitney for location, KS for shape, chi-square for
    contingency). Observed counts are exact integers; expected counts
    row_n*col_n/n are single float expressions on exact operands
    computed IDENTICALLY on both engines; each cell's (o-e)^2/e rounds
    to 6 dp then accumulates in DECIMAL (the order-independent
    convention), so the statistic is engine-exact. One aggregation to
    the contingency table (types x 7 cells), margins via three window
    sums over that tiny frame, one decimal reduce — at 100 TB this is
    one scan plus constant-size post-processing."""
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek(F.to_date("ts")).alias("dow")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    w_row = W.partitionBy("event_type")
    w_col = W.partitionBy("dow")
    w_all = W.partitionBy()
    margins = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(w_row).alias("row_n"),
        F.sum("o").over(w_col).alias("col_n"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    terms = margins.select(
        F.round((F.col("o") - e) * (F.col("o") - e) / e, 6)
        .cast("decimal(18,6)")
        .alias("term")
    )
    dims = obs.agg(
        F.countDistinct("event_type").cast("bigint").alias("r"),
        F.countDistinct("dow").cast("bigint").alias("c"),
    )
    return (
        terms.agg(F.sum("term").cast("double").alias("chi2"))
        .crossJoin(F.broadcast(dims))
        .select(
            "chi2", ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof")
        )
    )


@register(
    "agg_anova_oneway",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
    SUM(CAST(value AS DECIMAL(18,2))) AS s_g,
    SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS ss_g
  FROM events GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, SUM(s_g) AS s,
    CAST(COUNT(*) AS BIGINT) AS k
  FROM g
), terms AS (
  SELECT
    CAST(round(CAST(ss_g AS DOUBLE)
               - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g, 6)
         AS DECIMAL(28,6)) AS ssw_term,
    CAST(round(n_g * (CAST(s_g AS DOUBLE) / n_g - CAST(s AS DOUBLE) / n)
                   * (CAST(s_g AS DOUBLE) / n_g - CAST(s AS DOUBLE) / n), 6)
         AS DECIMAL(28,6)) AS ssb_term,
    n, k
  FROM g CROSS JOIN tot
)
SELECT k, n,
  CAST(SUM(ssb_term) AS DOUBLE) AS ssb,
  CAST(SUM(ssw_term) AS DOUBLE) AS ssw,
  round((CAST(SUM(ssb_term) AS DOUBLE) / (k - 1))
        / (CAST(SUM(ssw_term) AS DOUBLE) / (n - k)), 6) AS f_stat
FROM terms GROUP BY k, n
""",
    tags=("agg", "stats"),
)
def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic of event value across event types —
    the K-GROUP mean test completing the statistics suite (t-test for
    two means, Mann-Whitney for location, KS for shape, chi-square for
    contingency, ANOVA for k-way means): does ANY event type's mean
    value differ from the others?

    Exactness: per-group sufficient statistics (n, sum, sum-of-squares)
    accumulate in DECIMAL — value is 2-dp money, so value^2 is exact at
    4 dp and the sums are engine-exact integers-in-decimal. The
    between/within square terms are single float expressions on those
    exact operands computed IDENTICALLY on both engines, rounded to
    6 dp, then DECIMAL-accumulated across the k groups (the
    order-independent float convention), so F = (SSB/(k-1))/(SSW/(n-k))
    is bit-stable. Plan: ONE map-side-combined hash aggregation to the
    k-group frame, a 1-row grand-total broadcast (allowlisted NLJ), and
    a k-row decimal reduce — at 100 TB one scan plus constant-size
    post-processing, the same shape as agg_chi_square."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(v).alias("s_g"),
        F.sum(v * v).alias("ss_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    sd = F.col("s_g").cast("double")
    ssw_term = F.round(
        F.col("ss_g").cast("double") - sd * sd / F.col("n_g"), 6
    ).cast("decimal(28,6)")
    dev = sd / F.col("n_g") - F.col("s").cast("double") / F.col("n")
    ssb_term = F.round(F.col("n_g") * dev * dev, 6).cast("decimal(28,6)")
    terms = g.crossJoin(F.broadcast(tot)).select(
        ssw_term.alias("ssw_term"), ssb_term.alias("ssb_term"), "n", "k"
    )
    ssb = F.sum("ssb_term").cast("double")
    ssw = F.sum("ssw_term").cast("double")
    return terms.groupBy("k", "n").agg(
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
    )


_KMV_K = 64  # sketch size; relative std error ~ 1/sqrt(K-2) ~ 12.7%


@register(
    "agg_kmv_distinct",
    oracle=f"""
WITH hashes AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events
), ranked AS (
  SELECT event_type, h,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_exact
  FROM hashes
), sk AS (
  SELECT event_type, MIN(n_exact) AS n_exact,
    CAST(COUNT(*) AS BIGINT) AS n_sketch,
    MAX(CASE WHEN rn = {_KMV_K}
        THEN CAST(('0x' || substr(h, 1, 15)) AS BIGINT) END) AS kth
  FROM ranked WHERE rn <= {_KMV_K}
  GROUP BY event_type
), est AS (
  SELECT event_type, n_exact, n_sketch,
    CASE WHEN n_sketch < {_KMV_K} THEN CAST(n_sketch AS DOUBLE)
         ELSE round(({_KMV_K} - 1)
              / (CAST(kth AS DOUBLE) / 1152921504606846976), 6)
    END AS kmv_estimate
  FROM sk
)
SELECT event_type, n_exact, n_sketch, kmv_estimate,
  abs(kmv_estimate - n_exact) / n_exact
    <= 3.0 / sqrt({_KMV_K} - 2.0) AS within_tol
FROM est
""",
    tags=("agg", "sketch"),
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002, the
    Theta-sketch ancestor) — the MERGEABLE distinct counter whose
    estimate, unlike HLL's, is EXACTLY oracle-checkable: the hash is
    md5, so the K smallest hash values per group — and therefore the
    estimate (K-1)/v_K — are pure deterministic functions of the data
    that DuckDB recomputes bit-for-bit. This gives the sketch family
    an entry where the driver hash-checks the ESTIMATE itself, where
    agg_approx_distinct/agg_hll_partitioned are rows-only by nature.

    The Spark side deliberately runs the MERGEABLE path the oracle
    does NOT: per-(type, day) partial sketches (K smallest distinct
    hashes within each day — a PARTITIONED window over day-sized
    groups), unioned and re-truncated to the K smallest per type. The
    oracle computes the direct global K-minimum. The hash match
    therefore PROVES the sketch-merge identity (K smallest of a union
    of per-partition K-smallest = global K smallest — every global
    top-K hash is top-K within its own day), which is the entire
    reason KMV scales: daily sketches are K rows each, merge cost is
    sketch-count-sized, and the fact scan never reruns. Groups with
    fewer than K distinct hashes report exactly (the sketch IS the
    set); estimate accuracy carries an inline 3-sigma within_tol
    audit mirrored in SQL. At 100 TB: one scan to day-partials
    (map-side distinct), then kilobyte-sized merges — the same
    partial/merge shape as agg_hll_partitioned with proof instead of
    trust."""
    ev = load(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    pairs = ev.select(
        "event_type", F.to_date("ts").alias("day"), h.alias("h")
    ).distinct()
    w_day = W.partitionBy("event_type", "day").orderBy("h")
    partials = (
        pairs.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
    )
    merged = partials.distinct()
    w_type = W.partitionBy("event_type").orderBy("h")
    topk = merged.withColumn("rn", F.row_number().over(w_type)).filter(
        F.col("rn") <= _KMV_K
    )
    frac = F.conv(F.substring("h", 1, 15), 16, 10).cast("bigint") / F.lit(
        float(1 << 60)
    )
    sk = topk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        F.max(F.when(F.col("rn") == _KMV_K, frac)).alias("vk"),
    )
    exact = (
        ev.select("event_type", h.alias("h"))
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    est = F.when(
        F.col("n_sketch") < _KMV_K, F.col("n_sketch").cast("double")
    ).otherwise(F.round((_KMV_K - 1) / F.col("vk"), 6))
    return (
        sk.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_exact",
            "n_sketch",
            est.alias("kmv_estimate"),
        )
        .withColumn(
            "within_tol",
            F.abs(F.col("kmv_estimate") - F.col("n_exact")) / F.col("n_exact")
            <= 3.0 / float((_KMV_K - 2) ** 0.5),
        )
    )


_BOOT_B = 32  # bootstrap resamples; md5-seeded so both engines agree
# Poisson(1) inverse-CDF thresholds (cumulative, 6 dp): the Poisson
# bootstrap's per-row weight — the distributed-systems form of
# resampling (Chamandy et al., Google 2012): multiplicities are
# independent per row, so no global n is needed at draw time.
_BOOT_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340)


def _boot_cdf_sql(u: str) -> str:
    return (
        f"CASE WHEN {u} < {_BOOT_CDF[0]} THEN 0 "
        f"WHEN {u} < {_BOOT_CDF[1]} THEN 1 "
        f"WHEN {u} < {_BOOT_CDF[2]} THEN 2 "
        f"WHEN {u} < {_BOOT_CDF[3]} THEN 3 "
        f"WHEN {u} < {_BOOT_CDF[4]} THEN 4 ELSE 5 END"
    )


@register(
    "agg_bootstrap_ci",
    oracle=f"""
WITH purch AS (
  SELECT event_id, CAST(round(value, 3) AS DECIMAL(18,6)) AS v
  FROM events WHERE event_type = 'purchase'
), draws AS (
  SELECT b.b, v,
    {_boot_cdf_sql(
        "CAST(('0x' || substr(md5(concat(CAST(b.b AS VARCHAR), ':', "
        "CAST(event_id AS VARCHAR))), 1, 12)) AS BIGINT)"
        " / CAST(281474976710656 AS DOUBLE)")} AS w
  FROM purch CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b) b
), means AS (
  SELECT b, round(CAST(SUM(v * w) AS DOUBLE) / SUM(w), 6) AS m
  FROM draws GROUP BY b
), sorted AS (
  SELECT list_sort(list(m)) AS ms FROM means
), full_mean AS (
  SELECT round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean_value
  FROM purch
)
SELECT CAST({_BOOT_B} AS BIGINT) AS n_resamples,
  mean_value, ms[2] AS boot_lo, ms[{_BOOT_B - 1}] AS boot_hi,
  mean_value BETWEEN ms[2] AND ms[{_BOOT_B - 1}] AS covered
FROM sorted CROSS JOIN full_mean
""",
    tags=("agg", "stats"),
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean purchase value via
    the POISSON bootstrap (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams" — Google's distributed
    resampling): instead of drawing n-from-n (which needs global
    coordination), each row enters resample b with an independent
    Poisson(1) multiplicity, which converges to the multinomial
    bootstrap and — the point — needs only per-row state, so the
    whole resampling is one map + one aggregation at any scale.

    Deterministic everywhere a textbook bootstrap uses an RNG: the
    per-(row, b) uniform is md5-derived (the dq_dp_noise seeding
    convention) and the Poisson draw is a fixed inverse-CDF when-chain
    — so both engines produce the SAME {_BOOT_B} resample means and
    the oracle hash-checks the interval itself, not a tolerance
    around it. Resample means round to 6 dp from exact DECIMAL
    weighted sums; the CI is the sorted means' 2nd and {_BOOT_B - 1}th
    elements (~94% coverage at B={_BOOT_B}), extracted from ONE
    sort_array over a {_BOOT_B}-element list — no window, no second
    pass. Plan: a {_BOOT_B}-way row expansion feeding one map-side-
    combined hash agg to {_BOOT_B} rows; at 100 TB the expansion is
    the honest cost of B resamples and the reduce state is B cells."""
    from am_kinesis_pay_spark.tables import spread

    ev = load(spark, sf_dir, "events")
    # r11 OPT: the B-way explode + per-(row, b) md5 draws run in the
    # scan stage — spread() fans them over the cores (no-op at scale)
    purch = spread(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", F.round("value", 3).cast("decimal(18,6)").alias("v")
        )
    )
    b = F.explode(F.array(*[F.lit(i) for i in range(_BOOT_B)])).alias("b")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("event_id").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint") / F.lit(float(1 << 48))
    w = (
        F.when(u < _BOOT_CDF[0], 0)
        .when(u < _BOOT_CDF[1], 1)
        .when(u < _BOOT_CDF[2], 2)
        .when(u < _BOOT_CDF[3], 3)
        .when(u < _BOOT_CDF[4], 4)
        .otherwise(5)
    )
    draws = purch.select("event_id", "v", b).select("v", "b", w.alias("w"))
    means = draws.groupBy("b").agg(
        F.round(
            F.sum(F.col("v") * F.col("w")).cast("double") / F.sum("w"), 6
        ).alias("m")
    )
    sorted_ms = means.agg(F.sort_array(F.collect_list("m")).alias("ms"))
    full_mean = purch.agg(
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_value"
        )
    )
    lo = F.element_at("ms", 2)
    hi = F.element_at("ms", _BOOT_B - 1)
    return (
        sorted_ms.crossJoin(F.broadcast(full_mean))
        .select(
            F.lit(_BOOT_B).cast("bigint").alias("n_resamples"),
            "mean_value",
            lo.alias("boot_lo"),
            hi.alias("boot_hi"),
            ((F.col("mean_value") >= lo) & (F.col("mean_value") <= hi)).alias(
                "covered"
            ),
        )
    )


# SPRT design constants (Wald 1945): fixed BEFORE the data arrives,
# like any sequential design. H0: conversion p0, H1: p1 (the minimum
# lift worth shipping); alpha = beta = 0.05 gives symmetric
# log-boundaries ln((1-beta)/alpha) = -ln(beta/(1-alpha)) = ln(19).
_SPRT_P0 = 0.20
_SPRT_P1 = 0.25
_SPRT_BOUND = 2.944439  # round(ln(19), 6); compared against ROUNDED llr


@register(
    "agg_sprt_sequential",
    oracle=f"""
WITH trials AS (
  SELECT CAST(ts AS DATE) AS day,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS k
  FROM events
  WHERE user_id % 2 = 1 AND event_type IN ('click', 'purchase')
  GROUP BY CAST(ts AS DATE)
), cum AS (
  SELECT day,
    CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
    CAST(SUM(k) OVER w AS BIGINT) AS k_cum
  FROM trials
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)
), scored AS (
  SELECT day, n_cum, k_cum,
    round(k_cum * ln({_SPRT_P1} / {_SPRT_P0})
          + (n_cum - k_cum) * ln((1 - {_SPRT_P1}) / (1 - {_SPRT_P0})), 6)
      AS llr
  FROM cum
), decided AS (
  SELECT day, n_cum, k_cum, llr,
    CASE WHEN llr >= {_SPRT_BOUND} THEN 'accept_h1'
         WHEN llr <= -{_SPRT_BOUND} THEN 'accept_h0'
         ELSE 'continue' END AS decision
  FROM scored
), stop AS (
  SELECT MIN(day) AS stop_day FROM decided WHERE decision <> 'continue'
)
SELECT d.day, d.n_cum, d.k_cum, d.llr, d.decision,
  (SELECT stop_day FROM stop) AS stop_day
FROM decided d
""",
    tags=("agg", "stats"),
)
def agg_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (SPRT, 1945) on the
    test variant's conversion rate — the EARLY-STOPPING companion to
    the fixed-horizon suite (agg_ab_ttest / agg_cuped_adjusted decide
    at a planned n; SPRT decides the moment the evidence crosses a
    boundary, the optimal sequential design and the ancestor of every
    always-valid-inference product). Per day, the cumulative
    conversions/trials update the log-likelihood ratio
    k*ln(p1/p0) + (n-k)*ln((1-p1)/(1-p0)); the run reports each day's
    LLR, its decision against the ln(19) boundaries, and the first
    stopping day.

    Exactness: cumulative (k, n) are integers from one hash agg +
    a DAY-frame prefix window (calendar-sized, allowlisted in the
    global-window lint — never row-scale); the LLR is two integer
    multiplications by log-constants folded identically from the same
    literals on both engines, rounded to 6 dp BEFORE the boundary
    comparison so the decision column is hash-stable (ulp skew in
    ln() is ~1e-13 at fixture scale against a 5e-7 rounding
    boundary). The 1-row stop-day broadcast is the allowlisted NLJ.
    At 100 TB this is the one-scan + calendar-frame shape of
    ts_seasonal_decompose: the fact scan dominates, everything after
    the first agg is days-sized."""
    ev = load(spark, sf_dir, "events")
    trials = (
        ev.filter(
            (F.col("user_id") % 2 == 1)
            & F.col("event_type").isin("click", "purchase")
        )
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("k"),
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = trials.select(
        "day",
        F.sum("n").over(w).alias("n_cum"),
        F.sum("k").over(w).alias("k_cum"),
    )
    llr = F.round(
        F.col("k_cum") * F.log(F.lit(_SPRT_P1) / F.lit(_SPRT_P0))
        + (F.col("n_cum") - F.col("k_cum"))
        * F.log(F.lit(1 - _SPRT_P1) / F.lit(1 - _SPRT_P0)),
        6,
    )
    decided = cum.select(
        "day",
        "n_cum",
        "k_cum",
        llr.alias("llr"),
        F.when(llr >= _SPRT_BOUND, "accept_h1")
        .when(llr <= -_SPRT_BOUND, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )
    stop = decided.filter(F.col("decision") != "continue").agg(
        F.min("day").alias("stop_day")
    )
    return decided.crossJoin(F.broadcast(stop))


@register(
    "dq_psi_drift",
    oracle="""
WITH b AS (
  SELECT CAST(ts AS DATE) AS day,
    LEAST(CAST(floor(value / 25.0) AS BIGINT), 19) AS bucket
  FROM events WHERE value IS NOT NULL
), span AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM b
), lab AS (
  SELECT bucket,
    CASE WHEN 2 * datediff('day', d0, day)
              < datediff('day', d0, d1) + 1
         THEN 0 ELSE 1 END AS half
  FROM b CROSS JOIN span
), cnt AS (
  SELECT bucket,
    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM lab GROUP BY bucket
), tot AS (
  SELECT CAST(SUM(n_a) AS DOUBLE) AS tot_a,
    CAST(SUM(n_b) AS DOUBLE) AS tot_b,
    CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM cnt
), terms AS (
  SELECT bucket, n_a, n_b,
    CAST(round(((n_a + 0.5) / (tot_a + 0.5 * n_buckets)
                - (n_b + 0.5) / (tot_b + 0.5 * n_buckets))
               * ln(((n_a + 0.5) / (tot_a + 0.5 * n_buckets))
                    / ((n_b + 0.5) / (tot_b + 0.5 * n_buckets))), 6)
         AS DECIMAL(18,6)) AS psi_term
  FROM cnt CROSS JOIN tot
)
SELECT bucket, n_a, n_b, CAST(psi_term AS DOUBLE) AS psi_term,
  (SELECT CAST(SUM(psi_term) AS DOUBLE) FROM terms) AS psi_total
FROM terms
""",
    tags=("agg", "dq", "stats"),
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event window — THE production drift monitor for feature/score
    distributions (PSI < 0.1 stable, 0.1-0.25 shifting, > 0.25 act;
    standard credit-scoring practice). Value histogram buckets (width
    25, capped at 19 like agg_histogram), halves split at the
    data-derived midpoint day so the query is calendar-free; 0.5
    Laplace smoothing keeps one-sided buckets finite — all of it
    integer/decimal arithmetic until the final ln, whose 6-dp-rounded
    terms accumulate in DECIMAL (the text_bigram_nll convention).

    Plan: one scan -> hash agg to the BUCKET frame (<= 20 rows) ->
    arithmetic + two 1-row broadcasts. Row growth lands entirely in
    the map-side partial agg; the PSI frame is domain-sized, so at
    100 TB this is the same plan with bigger partials."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.select(
        F.to_date("ts").alias("day"),
        F.least(
            F.floor(F.col("value") / 25.0).cast("bigint"), F.lit(19)
        ).alias("bucket"),
    )
    span = b.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    lab = b.crossJoin(F.broadcast(span)).select(
        "bucket",
        F.when(
            2 * F.datediff(F.col("day"), F.col("d0"))
            < F.datediff(F.col("d1"), F.col("d0")) + 1,
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    cnt = lab.groupBy("bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    tot = cnt.agg(
        F.sum("n_a").cast("double").alias("tot_a"),
        F.sum("n_b").cast("double").alias("tot_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    p = (F.col("n_a") + 0.5) / (F.col("tot_a") + 0.5 * F.col("n_buckets"))
    q = (F.col("n_b") + 0.5) / (F.col("tot_b") + 0.5 * F.col("n_buckets"))
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_a",
        "n_b",
        F.round((p - q) * F.log(p / q), 6)
        .cast("decimal(18,6)")
        .alias("psi_term"),
    )
    total = terms.agg(F.sum("psi_term").cast("double").alias("psi_total"))
    return terms.crossJoin(F.broadcast(total)).select(
        "bucket",
        "n_a",
        "n_b",
        F.col("psi_term").cast("double").alias("psi_term"),
        "psi_total",
    )


_BH_ALPHA = 0.05
_BH_BUCKETS = 20
# Abramowitz & Stegun 7.1.26 erf coefficients (|error| <= 1.5e-7 —
# two decades below the repo's 6-dp rounding): both engines evaluate
# the SAME literal-coefficient Horner polynomial + exp, so the only
# cross-engine risk is a 1-ulp exp() difference crossing a 6-dp
# boundary, the same accepted class as the ln() convention.
_ERF_COEFS = (0.254829592, -0.284496736, 1.421413741,
              -1.453152027, 1.061405429)
_INV_SQRT2 = 0.7071067811865476


@register(
    "agg_benjamini_hochberg",
    oracle=f"""
WITH b AS (
  SELECT user_id % {_BH_BUCKETS} AS bucket,
    CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL
), g AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_h,
    SUM(v) AS s_h, SUM(v * v) AS ss_h
  FROM b GROUP BY bucket
), tot AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n, SUM(s_h) AS s FROM g
), z AS (
  SELECT bucket, n_h,
    (CAST(s_h AS DOUBLE) / n_h - CAST(s AS DOUBLE) / n)
      / sqrt((CAST(ss_h AS DOUBLE)
              - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE) / n_h)
             / (n_h - 1) / n_h) AS z
  FROM g CROSS JOIN tot
), p AS (
  SELECT bucket, n_h, round(z, 6) AS z,
    round((((({_ERF_COEFS[4]} * (1.0 / (1.0 + 0.3275911 * (abs(z) * {_INV_SQRT2})))
        + {_ERF_COEFS[3]}) * (1.0 / (1.0 + 0.3275911 * (abs(z) * {_INV_SQRT2})))
        + {_ERF_COEFS[2]}) * (1.0 / (1.0 + 0.3275911 * (abs(z) * {_INV_SQRT2})))
        + {_ERF_COEFS[1]}) * (1.0 / (1.0 + 0.3275911 * (abs(z) * {_INV_SQRT2})))
        + {_ERF_COEFS[0]}) * (1.0 / (1.0 + 0.3275911 * (abs(z) * {_INV_SQRT2})))
        * exp(-((abs(z) * {_INV_SQRT2}) * (abs(z) * {_INV_SQRT2}))), 6) AS p
  FROM z
), ranked AS (
  SELECT bucket, n_h, z, p,
    CAST(ROW_NUMBER() OVER (ORDER BY p, bucket) AS BIGINT) AS k,
    CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM p
), crit AS (
  SELECT *, MAX(CASE WHEN p <= k * {_BH_ALPHA} / m THEN p END)
    OVER () AS p_cutoff
  FROM ranked
)
SELECT bucket, n_h, z, p, k, m,
  round(k * {_BH_ALPHA} / m, 6) AS bh_threshold,
  COALESCE(p <= p_cutoff, FALSE) AS rejected
FROM crit
""",
    tags=("agg", "stats", "experiment"),
)
def agg_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control — the multiple-testing layer the
    A/B family was missing: with 20 user buckets each z-tested against
    the global mean value, raw alpha=0.05 rejections would
    false-positive ~once by chance; BH sorts the p-values and rejects
    up to the largest p_(k) <= k*alpha/m, bounding the expected FALSE
    DISCOVERY RATE at alpha (Benjamini & Benjamini-Hochberg 1995 —
    the standard guard for metric dashboards testing many segments).
    p-values come from the normal z approximation via the
    Abramowitz-Stegun 7.1.26 erf polynomial — literal coefficients,
    same Horner evaluation in both engines, error 1.5e-7 (two decades
    under the 6-dp rounding).

    Plan: one hash agg to the 20-bucket moment frame, a 1-row total
    broadcast, then rank/cutoff windows over that DOMAIN-sized frame
    (allowlisted: 20 rows by construction — the bucket count is the
    hypothesis count, never row-scale). Row growth lands in the
    map-side partials, like the rest of the statistics family."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.col("value").cast("decimal(18,2)")
    g = ev.select(
        (F.col("user_id") % _BH_BUCKETS).alias("bucket"), v.alias("v")
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("v").alias("s_h"),
        F.sum(F.col("v") * F.col("v")).alias("ss_h"),
    )
    tot = g.agg(
        F.sum("n_h").cast("bigint").alias("n"), F.sum("s_h").alias("s")
    )
    mean_h = F.col("s_h").cast("double") / F.col("n_h")
    var_h = (
        F.col("ss_h").cast("double")
        - F.col("s_h").cast("double") * F.col("s_h").cast("double") / F.col("n_h")
    ) / (F.col("n_h") - 1)
    zc = (mean_h - F.col("s").cast("double") / F.col("n")) / F.sqrt(
        var_h / F.col("n_h")
    )
    z = g.crossJoin(F.broadcast(tot)).select(
        "bucket", "n_h", zc.alias("z_raw")
    )
    y = F.abs(F.col("z_raw")) * F.lit(_INV_SQRT2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * y)
    poly = (
        (
            (
                (F.lit(_ERF_COEFS[4]) * t + F.lit(_ERF_COEFS[3])) * t
                + F.lit(_ERF_COEFS[2])
            )
            * t
            + F.lit(_ERF_COEFS[1])
        )
        * t
        + F.lit(_ERF_COEFS[0])
    ) * t
    p = z.select(
        "bucket",
        "n_h",
        F.round("z_raw", 6).alias("z"),
        F.round(poly * F.exp(-(y * y)), 6).alias("p"),
    )
    w_rank = W.orderBy("p", "bucket")
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = p.select(
        "bucket",
        "n_h",
        "z",
        "p",
        F.row_number().over(w_rank).cast("bigint").alias("k"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("m"),
    )
    cutoff = F.max(
        F.when(
            F.col("p") <= F.col("k") * _BH_ALPHA / F.col("m"), F.col("p")
        )
    ).over(w_all)
    return ranked.withColumn("p_cutoff", cutoff).select(
        "bucket",
        "n_h",
        "z",
        "p",
        "k",
        "m",
        F.round(F.col("k") * _BH_ALPHA / F.col("m"), 6).alias("bh_threshold"),
        F.coalesce(F.col("p") <= F.col("p_cutoff"), F.lit(False)).alias(
            "rejected"
        ),
    )


_Z_95 = 1.959964  # two-sided 95% normal quantile, 6 dp


@register(
    "agg_delta_method_ci",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 = 0 AS grp_a,
    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        THEN CAST(round(value, 3) AS DECIMAL(18,3)) END), 0)
      AS DECIMAL(18,3)) AS x,
    CAST(COUNT(*) AS DECIMAL(18,3)) AS y
  FROM events GROUP BY user_id
), arm AS (
  SELECT grp_a,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
    CAST(SUM(x * x) AS DOUBLE) AS sxx,
    CAST(SUM(y * y) AS DOUBLE) AS syy,
    CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM per_user GROUP BY grp_a
), m AS (
  SELECT grp_a, n, sx / sy AS ratio, sy / n AS mean_y,
    (sxx - sx * sx / n) / (n - 1) AS var_x,
    (syy - sy * sy / n) / (n - 1) AS var_y,
    (sxy - sx * sy / n) / (n - 1) AS cov_xy
  FROM arm
), se AS (
  SELECT grp_a, n, ratio,
    sqrt(GREATEST(var_x - 2 * ratio * cov_xy + ratio * ratio * var_y,
                  0.0) / n)
      / mean_y AS se_ratio
  FROM m
)
SELECT CASE WHEN grp_a THEN 'A' ELSE 'B' END AS arm, n,
  round(ratio, 6) AS ratio, round(se_ratio, 6) AS se_ratio,
  round(ratio - {_Z_95} * se_ratio, 6) AS ci_lo,
  round(ratio + {_Z_95} * se_ratio, 6) AS ci_hi
FROM se
""",
    tags=("agg", "stats"),
)
def agg_delta_method_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (revenue
    per event, the experimentation-platform staple where the unit of
    randomization — the user — is not the unit of analysis — the
    event; Deng et al. 2017 "Trustworthy online controlled
    experiments"): a naive per-event t-test is wrong because events
    within a user are correlated, so the variance must come from the
    per-user (x, y) = (revenue, events) pairs via the first-order
    Taylor expansion Var(X̄/Ȳ) ≈ (σ²_x − 2R·σ_xy + R²·σ²_y)/(n·ȳ²).
    Completes the experimentation family next to agg_ab_ttest (mean
    metrics), agg_cuped_adjusted (variance reduction) and
    agg_sprt_sequential (sequential stopping).

    Plan shape: one hash aggregation events → per-user (x, y) pairs
    (shuffle on user_id, map-side combined), then one 2-row arm
    aggregation — at 100 TB this is exactly the grouped form an
    experiments × metrics grid needs (add experiment_id/metric to both
    GROUP BYs; the arithmetic is unchanged). Float discipline: per-row
    values round to 3 dp into DECIMAL(18,3); per-user x, y and their
    pairwise products stay DECIMAL through both aggregations (exact,
    order-independent), casting to DOUBLE only on the 2-row frame
    where mean/variance/covariance/SE run the IDENTICAL expression
    tree on both engines, then round to 6 dp."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round("value", 3).cast("decimal(18,3)"),
                )
            ),
            F.lit(0),
        )
        .cast("decimal(18,3)")
        .alias("x"),
        F.count(F.lit(1)).cast("decimal(18,3)").alias("y"),
    )
    per_user = per_user.select(
        (F.col("user_id") % 2 == 0).alias("grp_a"), "x", "y"
    )
    arm = per_user.groupBy("grp_a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    ratio = F.col("sx") / F.col("sy")
    mean_y = F.col("sy") / n
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    cov_xy = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    m = arm.select(
        "grp_a",
        "n",
        ratio.alias("ratio"),
        mean_y.alias("mean_y"),
        var_x.alias("var_x"),
        var_y.alias("var_y"),
        cov_xy.alias("cov_xy"),
    )
    # the quadratic form var(x - r*y) is mathematically >= 0 but can
    # round to a tiny negative double when x is (near-)proportional to
    # y — DuckDB sqrt() throws on it (the agg_power_mde class); clamp
    # at 0.0 with the identical GREATEST on both engines
    se_ratio = (
        F.sqrt(
            F.greatest(
                F.col("var_x")
                - 2 * F.col("ratio") * F.col("cov_xy")
                + F.col("ratio") * F.col("ratio") * F.col("var_y"),
                F.lit(0.0),
            )
            / F.col("n")
        )
        / F.col("mean_y")
    )
    se = m.select("grp_a", "n", "ratio", se_ratio.alias("se_ratio"))
    return se.select(
        F.when(F.col("grp_a"), "A").otherwise("B").alias("arm"),
        "n",
        F.round("ratio", 6).alias("ratio"),
        F.round("se_ratio", 6).alias("se_ratio"),
        F.round(F.col("ratio") - _Z_95 * F.col("se_ratio"), 6).alias("ci_lo"),
        F.round(F.col("ratio") + _Z_95 * F.col("se_ratio"), 6).alias("ci_hi"),
    )


_THETA_K = 64  # per-cohort sketch size, matches _KMV_K conventions


@register(
    "agg_theta_setops",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT event_type AS cohort,
    CAST(date_trunc('day', ts) AS DATE) AS day,
    md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE event_type IN ('click', 'purchase')
), partials AS (
  SELECT cohort, h FROM (
    SELECT cohort, h,
      ROW_NUMBER() OVER (PARTITION BY cohort, day ORDER BY h) AS rn
    FROM pairs
  ) WHERE rn <= {_THETA_K}
), merged AS (
  SELECT DISTINCT cohort, h FROM partials
), sk AS (
  SELECT cohort, h, rn FROM (
    SELECT cohort, h,
      ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY h) AS rn
    FROM merged
  ) WHERE rn <= {_THETA_K}
), stats AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_sketch,
    MAX(CASE WHEN rn = {_THETA_K}
        THEN CAST(('0x' || substr(h, 1, 15)) AS BIGINT)
             / 1152921504606846976.0 END) AS vk
  FROM sk GROUP BY cohort
), st1 AS (
  SELECT
    MAX(CASE WHEN cohort = 'click' THEN n_sketch END) AS n_a,
    MAX(CASE WHEN cohort = 'purchase' THEN n_sketch END) AS n_b,
    MAX(CASE WHEN cohort = 'click' THEN
      CASE WHEN n_sketch < {_THETA_K} THEN 1.0 ELSE vk END END) AS theta_a,
    MAX(CASE WHEN cohort = 'purchase' THEN
      CASE WHEN n_sketch < {_THETA_K} THEN 1.0 ELSE vk END END) AS theta_b,
    MAX(CASE WHEN cohort = 'click' THEN
      CASE WHEN n_sketch < {_THETA_K} THEN CAST(n_sketch AS DOUBLE)
           ELSE ({_THETA_K} - 1) / vk END END) AS est_a,
    MAX(CASE WHEN cohort = 'purchase' THEN
      CASE WHEN n_sketch < {_THETA_K} THEN CAST(n_sketch AS DOUBLE)
           ELSE ({_THETA_K} - 1) / vk END END) AS est_b
  FROM stats
), valid AS (
  SELECT s.cohort, s.h
  FROM sk s JOIN stats t USING (cohort)
  WHERE s.rn < {_THETA_K} OR t.n_sketch < {_THETA_K}
), common AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_common
  FROM (SELECT h FROM valid WHERE cohort = 'click') a
  JOIN (SELECT h FROM valid WHERE cohort = 'purchase') b USING (h)
), users AS (
  SELECT h,
    MAX(CASE WHEN cohort = 'click' THEN 1 ELSE 0 END) AS in_a,
    MAX(CASE WHEN cohort = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM (SELECT DISTINCT cohort, h FROM pairs) GROUP BY h
), exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS exact_intersect
  FROM users
)
SELECT
  round(est_a, 6) AS est_click,
  round(est_b, 6) AS est_purchase,
  round(n_common / LEAST(theta_a, theta_b), 6) AS est_intersect,
  round(est_a + est_b - n_common / LEAST(theta_a, theta_b), 6) AS est_union,
  exact_intersect, exact_union,
  abs(est_a + est_b - n_common / LEAST(theta_a, theta_b) - exact_union)
    / exact_union <= 3.0 / sqrt({_THETA_K} - 2.0) AS within_tol_union
FROM st1, common, exact
""",
    tags=("agg", "sketch"),
)
def agg_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA (Dasgupta et al. 2016, "Theta-sketch
    framework" — the Apache DataSketches set-operation core) over the
    KMV sketches agg_kmv_distinct introduced: per-cohort K-minimum
    sketches of the click and purchase user populations, then
    intersection (entries common to both sketches below
    theta = min(theta_a, theta_b), estimate |sample|/theta) and union
    by inclusion-exclusion — the sketch answer to "how many users
    clicked AND purchased?" that never materializes either population.
    Like KMV, the md5 hash makes every estimate a pure deterministic
    function of the data, so the ORACLE CHECKS THE ESTIMATES
    THEMSELVES — the property HLL set operations can never offer.

    The theta identity that removes all runtime-threshold logic:
    h < theta_c ⇔ rn_c < K (the Kth smallest IS theta), or the whole
    sketch when it is not full (theta = 1) — so "common below theta"
    is a plain equi-join of the two ≤K-row sketches, no comparison
    against a computed threshold row. Plan shape: one distinct scan to
    (cohort, day, h); per-(cohort, day) partial top-K windows
    (day-sized partitions); kilobyte-sized merge + two ≤K-row sketch
    frames; the exact audit is one more hash agg over the distinct
    frame. The only cross joins combine 1-row aggregate frames (est /
    n_common / exact) — O(1)-row broadcasts on the reviewed NLJ
    allowlist. At 100 TB cohort sketches build in one pass and set
    operations cost kilobytes — the pre-aggregated-audience-overlap
    pattern. Float discipline: theta derives from the first 15 hex
    chars as in agg_kmv_distinct; estimates round to 6 dp; the union
    estimate carries a 3-sigma within_tol audit vs the exact union."""
    K = _THETA_K
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    # r12 OPT (guide §5): pairs feeds BOTH the sketch chain (day-
    # partial windows) and the exact audit (users re-distinct on a
    # narrower key) — differently-pruned distincts, so each execution
    # scanned events twice; one lineage cut on the saturating
    # (cohort, day, h) frame halves the scans.
    pairs = ev.select(
        F.col("event_type").alias("cohort"),
        F.to_date("ts").alias("day"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    ).distinct().localCheckpoint()
    w_day = W.partitionBy("cohort", "day").orderBy("h")
    partials = (
        pairs.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") <= K)
        .select("cohort", "h")
    )
    merged = partials.distinct()
    w_c = W.partitionBy("cohort").orderBy("h")
    sk = merged.withColumn("rn", F.row_number().over(w_c)).filter(
        F.col("rn") <= K
    )
    frac = F.conv(F.substring("h", 1, 15), 16, 10).cast("bigint") / F.lit(
        float(1 << 60)
    )
    stats = sk.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        F.max(F.when(F.col("rn") == K, frac)).alias("vk"),
    )
    theta_c = F.when(F.col("n_sketch") < K, F.lit(1.0)).otherwise(F.col("vk"))
    est_c = F.when(
        F.col("n_sketch") < K, F.col("n_sketch").cast("double")
    ).otherwise((K - 1) / F.col("vk"))
    st1 = stats.agg(
        F.max(F.when(F.col("cohort") == "click", theta_c)).alias("theta_a"),
        F.max(F.when(F.col("cohort") == "purchase", theta_c)).alias(
            "theta_b"
        ),
        F.max(F.when(F.col("cohort") == "click", est_c)).alias("est_a"),
        F.max(F.when(F.col("cohort") == "purchase", est_c)).alias("est_b"),
    )
    valid = sk.join(
        stats.select("cohort", "n_sketch"), "cohort"
    ).filter((F.col("rn") < K) | (F.col("n_sketch") < K))
    common = (
        valid.filter(F.col("cohort") == "click")
        .select("h")
        .join(valid.filter(F.col("cohort") == "purchase").select("h"), "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    users = (
        pairs.select("cohort", "h")
        .distinct()
        .groupBy("h")
        .agg(
            F.max(
                F.when(F.col("cohort") == "click", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("cohort") == "purchase", 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    exact = users.agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("exact_intersect"),
    )
    theta = F.least(F.col("theta_a"), F.col("theta_b"))
    est_i = F.col("n_common") / theta
    est_u = F.col("est_a") + F.col("est_b") - est_i
    return (
        st1.crossJoin(common)
        .crossJoin(exact)
        .select(
            F.round("est_a", 6).alias("est_click"),
            F.round("est_b", 6).alias("est_purchase"),
            F.round(est_i, 6).alias("est_intersect"),
            F.round(est_u, 6).alias("est_union"),
            "exact_intersect",
            "exact_union",
            (
                F.abs(est_u - F.col("exact_union")) / F.col("exact_union")
                <= 3.0 / float((K - 2) ** 0.5)
            ).alias("within_tol_union"),
        )
    )


@register(
    "agg_ols_multifeature",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS DOUBLE) AS a,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS b,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS c,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS d,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS e,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS f,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS r0,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS r1,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS r2,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
), solved AS (
  SELECT l_returnflag, a AS n, r0, r1, r2, syy,
    a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c) AS det,
    r0 * (d * f - e * e) - b * (r1 * f - e * r2) + c * (r1 * e - d * r2)
      AS det0,
    a * (r1 * f - e * r2) - r0 * (b * f - e * c) + c * (b * r2 - r1 * c)
      AS det1,
    a * (d * r2 - r1 * e) - b * (b * r2 - r1 * c) + r0 * (b * e - d * c)
      AS det2
  FROM s
), coef AS (
  SELECT l_returnflag, n, r0, r1, r2, syy,
    det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
  FROM solved
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
  round(b0, 6) AS intercept,
  round(b1, 6) AS coef_quantity,
  round(b2, 6) AS coef_discount,
  round(1 - (syy - b0 * r0 - b1 * r1 - b2 * r2)
          / (syy - r0 * r0 / n), 6) AS r2
FROM coef
""",
    tags=("agg", "stats"),
)
def agg_ols_multifeature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression by NORMAL EQUATIONS — the
    distributed-OLS pattern (price ~ quantity + discount per return
    flag): ONE grouped scan accumulates the Gram matrix XᵀX and XᵀY as
    nine sufficient-statistic sums, then the 3×3 system solves in
    closed form (Cramer's rule) on the group-count-sized frame.
    Extends agg_ols_trend (single-feature regr_slope) to the
    multi-feature case no built-in aggregate covers, without MLlib,
    without an iterative pass — the textbook "sufficient statistics
    beat gradient descent when p is small" design (p features cost
    O(p²) aggregate columns and an O(p³) driver-free solve per group).

    Plan shape: exactly one hash aggregation with map-side combine
    (shuffle on l_returnflag, 3 groups); the solve is pure projection
    arithmetic on the 3-row frame. At 100 TB this is the canonical
    grouped-regression shape — millions of groups work identically
    because nothing downstream of the aggregate depends on row count.
    Float discipline: every sum accumulates DECIMAL products of 2-dp
    DECIMAL casts (exact, order-independent — the property that makes
    the Cramer determinants reproducible cross-engine); the 3-row
    solve runs in DOUBLE with the IDENTICAL expression tree on both
    engines, then rounds to 6 dp. R² audits fit quality inline
    (SSE = Syy − bᵀXᵀY, SST = Syy − (ΣY)²/n)."""
    from am_kinesis_pay_spark.tables import spread

    # r11 OPT: the ten decimal-product partial sums are the whole cost
    # and they run in the SCAN stage — one task per input split, one
    # split at fixture scale. spread() projects to the four used
    # columns and round-robins them over the cores first (no-op when
    # the scan already has >= core-count splits); decimal sums are
    # exact and order-free, so the result is bit-identical.
    li = spread(
        load(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
        )
    )
    q = F.col("l_quantity").cast("decimal(18,2)")
    dis = F.col("l_discount").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("a"),
        F.sum(q).cast("double").alias("b"),
        F.sum(dis).cast("double").alias("c"),
        F.sum(q * q).cast("double").alias("d"),
        F.sum(q * dis).cast("double").alias("e"),
        F.sum(dis * dis).cast("double").alias("f"),
        F.sum(y).cast("double").alias("r0"),
        F.sum(q * y).cast("double").alias("r1"),
        F.sum(dis * y).cast("double").alias("r2"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    d, e, f = F.col("d"), F.col("e"), F.col("f")
    r0, r1, r2 = F.col("r0"), F.col("r1"), F.col("r2")
    solved = s.select(
        "l_returnflag",
        a.alias("n"),
        "r0",
        "r1",
        "r2",
        "syy",
        (a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c))
        .alias("det"),
        (
            r0 * (d * f - e * e)
            - b * (r1 * f - e * r2)
            + c * (r1 * e - d * r2)
        ).alias("det0"),
        (
            a * (r1 * f - e * r2)
            - r0 * (b * f - e * c)
            + c * (b * r2 - r1 * c)
        ).alias("det1"),
        (
            a * (d * r2 - r1 * e)
            - b * (b * r2 - r1 * c)
            + r0 * (b * e - d * c)
        ).alias("det2"),
    )
    coef = solved.select(
        "l_returnflag",
        "n",
        "r0",
        "r1",
        "r2",
        "syy",
        (F.col("det0") / F.col("det")).alias("b0"),
        (F.col("det1") / F.col("det")).alias("b1"),
        (F.col("det2") / F.col("det")).alias("b2"),
    )
    n = F.col("n")
    sse = (
        F.col("syy")
        - F.col("b0") * F.col("r0")
        - F.col("b1") * F.col("r1")
        - F.col("b2") * F.col("r2")
    )
    sst = F.col("syy") - F.col("r0") * F.col("r0") / n
    return coef.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round("b0", 6).alias("intercept"),
        F.round("b1", 6).alias("coef_quantity"),
        F.round("b2", 6).alias("coef_discount"),
        F.round(1 - sse / sst, 6).alias("r2"),
    )


@register(
    "agg_period_over_period",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
    CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
      AS revenue,
    CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY CAST(date_trunc('day', o_orderdate) AS DATE)
)
SELECT cur.d, cur.revenue, cur.n_orders,
  prior.revenue AS revenue_prior_week,
  round((cur.revenue - prior.revenue) / prior.revenue * 100, 6)
    AS wow_pct
FROM daily cur
LEFT JOIN daily prior ON prior.d = cur.d - INTERVAL 7 DAY
""",
    tags=("agg", "analytics"),
)
def agg_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period comparison (week-over-week revenue delta per
    day) — the dashboard primitive behind every "vs last week" tile.
    Deliberately NOT a LAG window: row-offset lag silently compares
    the wrong days the moment the calendar has gaps, and an
    unpartitioned ordered window serializes the frame into one task.
    Instead the daily aggregate SELF-JOINS on the exact calendar
    offset (d − 7 days): correct under gaps (missing prior week →
    NULL, not a wrong neighbor), and at 100 TB both sides of the
    equi-join are the already-reduced day frame — kilobytes, hash-
    joined, no sort, no single-task stage. One scan, one hash agg,
    one self-equi-join of a calendar-domain frame.

    Float discipline: daily revenue sums 2-dp DECIMAL (exact,
    order-independent) and casts to DOUBLE on the day frame; the WoW
    percent runs the identical expression tree on both engines and
    rounds to 6 dp."""
    od = load(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("d")
    ).agg(
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    prior = daily.select(
        F.col("d").alias("p_d"), F.col("revenue").alias("revenue_prior_week")
    )
    return (
        daily.join(prior, F.col("p_d") == F.date_sub(F.col("d"), 7), "left")
        .select(
            "d",
            "revenue",
            "n_orders",
            "revenue_prior_week",
            F.round(
                (F.col("revenue") - F.col("revenue_prior_week"))
                / F.col("revenue_prior_week")
                * 100,
                6,
            ).alias("wow_pct"),
        )
    )


@register(
    "agg_mutual_information",
    oracle="""
WITH cells AS (
  SELECT event_type AS x, dayofweek(CAST(ts AS DATE)) AS y,
    CAST(COUNT(*) AS BIGINT) AS nxy
  FROM events GROUP BY event_type, dayofweek(CAST(ts AS DATE))
), mx AS (
  SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY x
), my AS (
  SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY y
), tot AS (
  SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM cells
), mi AS (
  SELECT CAST(SUM(CAST(round(
      (CAST(nxy AS DOUBLE) / n)
      * ln((CAST(nxy AS DOUBLE) * n) / (CAST(nx AS DOUBLE) * ny)), 9)
      AS DECIMAL(18,9))) AS DOUBLE) AS mi
  FROM cells JOIN mx USING (x) JOIN my USING (y), tot
), hx AS (
  SELECT CAST(SUM(CAST(round(
      -(CAST(nx AS DOUBLE) / n) * ln(CAST(nx AS DOUBLE) / n), 9)
      AS DECIMAL(18,9))) AS DOUBLE) AS hx
  FROM mx, tot
), hy AS (
  SELECT CAST(SUM(CAST(round(
      -(CAST(ny AS DOUBLE) / n) * ln(CAST(ny AS DOUBLE) / n), 9)
      AS DECIMAL(18,9))) AS DOUBLE) AS hy
  FROM my, tot
)
SELECT round(mi, 6) AS mi_nats,
  round(mi / sqrt(hx * hy), 6) AS nmi,
  round(hx, 6) AS h_event_type,
  round(hy, 6) AS h_weekday
FROM mi, hx, hy
""",
    tags=("agg", "stats"),
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; weekday) with sqrt-normalized
    NMI — the information-theoretic dependence measure next to
    agg_chi_square's significance test and text_collocations_pmi's
    pairwise form (PMI is the per-cell term; MI is its p_xy-weighted
    expectation): I = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), normalized by
    sqrt(H(x)·H(y)) so 0 = independent, 1 = deterministic. Category
    relabeling leaves MI invariant, so the engines' different weekday
    numbering conventions cannot matter (same argument as
    agg_chi_square).

    Plan shape: ONE hash aggregation to the |event_types| x 7
    contingency frame — the only stage that sees raw rows; margins,
    entropies and the MI sum are joins over that ≤35-row frame plus a
    1-row total broadcast (allowlisted O(1)-row NLJ). At 100 TB this
    generalizes to any feature-pair MI grid by adding the pair id to
    the GROUP BY. Float discipline: each cell term (a double log) is
    rounded to 9 dp and FROZEN as DECIMAL(18,9) before summation so
    the Σ over cells is order-independent; final values round to
    6 dp from identical expression trees."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"),
        F.dayofweek(F.col("ts").cast("date")).alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nxy"))
    mx = cells.groupBy("x").agg(F.sum("nxy").cast("bigint").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").cast("bigint").alias("ny"))
    tot = cells.agg(F.sum("nxy").cast("bigint").alias("n"))
    joined = (
        cells.join(mx, "x").join(my, "y").crossJoin(F.broadcast(tot))
    )
    n = F.col("n")
    mi_term = F.round(
        (F.col("nxy").cast("double") / n)
        * F.log(
            (F.col("nxy").cast("double") * n)
            / (F.col("nx").cast("double") * F.col("ny"))
        ),
        9,
    ).cast("decimal(18,9)")
    mi = joined.agg(F.sum(mi_term).cast("double").alias("mi"))
    hx_term = F.round(
        -(F.col("nx").cast("double") / n)
        * F.log(F.col("nx").cast("double") / n),
        9,
    ).cast("decimal(18,9)")
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .agg(F.sum(hx_term).cast("double").alias("hx"))
    )
    hy_term = F.round(
        -(F.col("ny").cast("double") / n)
        * F.log(F.col("ny").cast("double") / n),
        9,
    ).cast("decimal(18,9)")
    hy = (
        my.crossJoin(F.broadcast(tot))
        .agg(F.sum(hy_term).cast("double").alias("hy"))
    )
    return (
        mi.crossJoin(hx)
        .crossJoin(hy)
        .select(
            F.round("mi", 6).alias("mi_nats"),
            F.round(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6).alias(
                "nmi"
            ),
            F.round("hx", 6).alias("h_event_type"),
            F.round("hy", 6).alias("h_weekday"),
        )
    )


@register(
    "agg_raking_ipf",
    oracle="""
WITH cells AS (
  SELECT event_type AS x, CAST(isodow(CAST(ts AS DATE)) AS INT) AS y,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(isodow(CAST(ts AS DATE)) AS INT)
), dims AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS total,
    CAST(COUNT(DISTINCT x) AS BIGINT) AS r,
    CAST(COUNT(DISTINCT y) AS BIGINT) AS c
  FROM cells
), w0 AS (
  SELECT x, y, n, CAST(n AS DECIMAL(28,9)) AS w FROM cells
), r1 AS (
  SELECT w0.x, w0.y, w0.n,
    CAST(round(CAST(w0.w AS DOUBLE)
      * ((dims.total / dims.r) / rm.s), 9) AS DECIMAL(28,9)) AS w
  FROM w0
  JOIN (SELECT x, CAST(SUM(w) AS DOUBLE) AS s FROM w0 GROUP BY x) rm
    ON w0.x = rm.x, dims
), c1 AS (
  SELECT r1.x, r1.y, r1.n,
    CAST(round(CAST(r1.w AS DOUBLE)
      * ((dims.total / dims.c) / cm.s), 9) AS DECIMAL(28,9)) AS w
  FROM r1
  JOIN (SELECT y, CAST(SUM(w) AS DOUBLE) AS s FROM r1 GROUP BY y) cm
    ON r1.y = cm.y, dims
), r2 AS (
  SELECT c1.x, c1.y, c1.n,
    CAST(round(CAST(c1.w AS DOUBLE)
      * ((dims.total / dims.r) / rm.s), 9) AS DECIMAL(28,9)) AS w
  FROM c1
  JOIN (SELECT x, CAST(SUM(w) AS DOUBLE) AS s FROM c1 GROUP BY x) rm
    ON c1.x = rm.x, dims
), c2 AS (
  SELECT r2.x, r2.y, r2.n,
    CAST(round(CAST(r2.w AS DOUBLE)
      * ((dims.total / dims.c) / cm.s), 9) AS DECIMAL(28,9)) AS w
  FROM r2
  JOIN (SELECT y, CAST(SUM(w) AS DOUBLE) AS s FROM r2 GROUP BY y) cm
    ON r2.y = cm.y, dims
), audit AS (
  SELECT
    MAX(abs(rs.s - dims.total / dims.r) / (dims.total / dims.r))
      AS max_row_err
  FROM (SELECT x, CAST(SUM(w) AS DOUBLE) AS s FROM c2 GROUP BY x) rs, dims
), audit_c AS (
  SELECT
    MAX(abs(cs.s - dims.total / dims.c) / (dims.total / dims.c))
      AS max_col_err
  FROM (SELECT y, CAST(SUM(w) AS DOUBLE) AS s FROM c2 GROUP BY y) cs, dims
)
SELECT c2.x AS event_type, c2.y AS iso_weekday, c2.n,
  round(CAST(c2.w AS DOUBLE), 6) AS raked_weight,
  round(audit.max_row_err, 6) AS max_row_err,
  round(audit_c.max_col_err, 6) AS max_col_err
FROM c2, audit, audit_c
""",
    tags=("agg", "stats"),
)
def agg_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKING — iterative proportional fitting (Deming & Stephan 1940;
    the survey-calibration standard behind every post-stratification
    weighting pipeline): adjust the (event_type × ISO-weekday)
    contingency weights until both margins match UNIFORM targets
    (total/R per type, total/C per weekday), by alternately scaling
    rows and columns — two full IPF iterations unrolled (row, col,
    row, col), with the residual margin errors reported inline as the
    convergence audit (col margins exact after the last col step; row
    margins show the remaining alternation error).

    Plan shape: ONE hash aggregation to the ≤35-cell contingency
    frame — the only stage that sees raw rows; every IPF step is a
    GROUP BY + join ON THAT FRAME (margin sums are ≤7-row
    aggregates), so iterations cost kilobytes at any corpus size; the
    1-row dims/audit frames broadcast (allowlisted O(1)-row NLJ).
    Float discipline: weights re-quantize to DECIMAL(28,9) after
    every multiplicative step, so margin sums — the inputs of the
    NEXT step — are exact decimal additions (order-independent) and
    both engines walk identical weight trajectories; ISO weekday
    (isodow / EXTRACT DAYOFWEEK_ISO, Monday=1 both engines) keys the
    output so even the category labels agree."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"),
        F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("int").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # the DAG references this <=35-row frame ~8 times (dims, one margin
    # aggregation per IPF step, two audits); without a checkpoint every
    # reference re-runs the corpus aggregation — measured 5.8 s -> 2.3 s
    # warm at sf0.1 from this line alone
    cells = cells.localCheckpoint()
    # r11 OPT: dims is ONE row over the checkpointed <=35-cell frame —
    # collect it and inline (total/r), (total/c) as literals (the same
    # bounded-artifact class as the kmeans centroid collects). The
    # pre-r11 shape cross-joined a broadcast dims into every IPF step
    # AND referenced each step's frame twice (margins + join), so the
    # unrolled final plan duplicated the whole upstream chain per
    # reference — 472 Exchange nodes in the formatted plan. A per-step
    # localCheckpoint of the <=35-row frame keeps the plan constant-
    # size (6 Exchanges; plans/r11/agg_raking_ipf_{before,after}.txt).
    # The double arithmetic is unchanged: total/r and total/c divide
    # the identical collected values.
    drow = cells.agg(
        F.sum("n").cast("double").alias("total"),
        F.countDistinct("x").cast("bigint").alias("r"),
        F.countDistinct("y").cast("bigint").alias("c"),
    ).collect()[0]
    if not drow["r"] or not drow["c"]:  # degenerate: no events at all
        total, r, c = 0.0, 1, 1
    else:
        total, r, c = float(drow["total"]), int(drow["r"]), int(drow["c"])
    row_target = F.lit(total) / F.lit(r)
    col_target = F.lit(total) / F.lit(c)
    w = cells.select(
        "x", "y", "n", F.col("n").cast("decimal(28,9)").alias("w")
    )

    def adjust(frame: DataFrame, key: str, target) -> DataFrame:
        margins = frame.groupBy(key).agg(
            F.sum("w").cast("double").alias("s")
        )
        return (
            frame.join(margins, key)
            .select(
                "x",
                "y",
                "n",
                F.round(
                    F.col("w").cast("double") * (target / F.col("s")),
                    9,
                )
                .cast("decimal(28,9)")
                .alias("w"),
            )
            # per-step lineage cut: each step references its input
            # twice (margins + join), so an uncut chain doubles the
            # unrolled plan per step
            .localCheckpoint()
        )

    w = adjust(w, "x", row_target)
    w = adjust(w, "y", col_target)
    w = adjust(w, "x", row_target)
    w = adjust(w, "y", col_target)
    row_err = (
        w.groupBy("x")
        .agg(F.sum("w").cast("double").alias("s"))
        .agg(
            F.max(F.abs(F.col("s") - row_target) / row_target).alias(
                "max_row_err"
            )
        )
    )
    col_err = (
        w.groupBy("y")
        .agg(F.sum("w").cast("double").alias("s"))
        .agg(
            F.max(F.abs(F.col("s") - col_target) / col_target).alias(
                "max_col_err"
            )
        )
    )
    return (
        w.crossJoin(F.broadcast(row_err))
        .crossJoin(F.broadcast(col_err))
        .select(
            F.col("x").alias("event_type"),
            F.col("y").alias("iso_weekday"),
            "n",
            F.round(F.col("w").cast("double"), 6).alias("raked_weight"),
            F.round("max_row_err", 6).alias("max_row_err"),
            F.round("max_col_err", 6).alias("max_col_err"),
        )
    )


@register(
    "agg_hte_segments",
    oracle="""
WITH per_user AS (
  SELECT user_id, user_id % 2 = 0 AS grp_a,
    CAST(user_id % 5 AS INT) AS segment,
    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
      AS converted
  FROM events GROUP BY user_id
), seg AS (
  SELECT segment,
    CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN NOT grp_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN grp_a THEN converted ELSE 0 END) AS BIGINT) AS c_a,
    CAST(SUM(CASE WHEN NOT grp_a THEN converted ELSE 0 END) AS BIGINT)
      AS c_b
  FROM per_user GROUP BY segment
), m AS (
  SELECT segment, n_a, n_b,
    CAST(c_a AS DOUBLE) / NULLIF(n_a, 0) AS p_a,
    CAST(c_b AS DOUBLE) / NULLIF(n_b, 0) AS p_b
  FROM seg
)
SELECT segment, n_a, n_b,
  round(p_a, 6) AS rate_a, round(p_b, 6) AS rate_b,
  round(p_a - p_b, 6) AS uplift,
  round((p_a - p_b)
    / NULLIF(sqrt(p_a * (1 - p_a) / n_a + p_b * (1 - p_b) / n_b), 0), 6)
    AS z
FROM m
""",
    tags=("agg", "stats"),
)
def agg_hte_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous treatment effects — per-SEGMENT uplift (the
    two-model / subgroup-analysis question every experiment readout
    ends with: "the average effect is X, but WHERE does it come
    from?"): users hash-split into arms as in agg_ab_ttest, conversion
    = any purchase, segments = deterministic user buckets, and each
    segment reports both arms' conversion rates, the uplift, and the
    two-proportion z statistic. The per-segment grid is exactly what
    agg_benjamini_hochberg then corrects for multiplicity — the two
    entries compose into the subgroup-readout pipeline.

    Plan shape: one hash aggregation events -> per-user (arm, segment,
    converted) — the only row-scale stage — then one 5-row segment
    aggregation; everything downstream is projection arithmetic. At
    100 TB segments x metrics grids widen the GROUP BY, nothing else.
    Float discipline: rates derive from exact BIGINT counts; the
    z arithmetic runs identical expression trees on both engines,
    rounded to 6 dp. Degenerate segments report NULL honestly (NULLIF
    guards): an empty arm has no rate, and a zero standard error —
    both rates 0 or 1, routine at tiny fixtures — has no z."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("int")
        .alias("converted")
    )
    per_user = per_user.select(
        (F.col("user_id") % 2 == 0).alias("grp_a"),
        (F.col("user_id") % 5).cast("int").alias("segment"),
        "converted",
    )
    seg = per_user.groupBy("segment").agg(
        F.sum(F.when(F.col("grp_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(~F.col("grp_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("grp_a"), F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("c_a"),
        F.sum(F.when(~F.col("grp_a"), F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("c_b"),
    )
    p_a = F.col("c_a").cast("double") / F.nullif(F.col("n_a"), F.lit(0))
    p_b = F.col("c_b").cast("double") / F.nullif(F.col("n_b"), F.lit(0))
    m = seg.select(
        "segment", "n_a", "n_b", p_a.alias("p_a"), p_b.alias("p_b")
    )
    se = F.sqrt(
        F.col("p_a") * (1 - F.col("p_a")) / F.col("n_a")
        + F.col("p_b") * (1 - F.col("p_b")) / F.col("n_b")
    )
    return m.select(
        "segment",
        "n_a",
        "n_b",
        F.round("p_a", 6).alias("rate_a"),
        F.round("p_b", 6).alias("rate_b"),
        F.round(F.col("p_a") - F.col("p_b"), 6).alias("uplift"),
        F.round(
            (F.col("p_a") - F.col("p_b")) / F.nullif(se, F.lit(0.0)), 6
        ).alias("z"),
    )


_HC_TOPN = 10  # movers reported


@register(
    "agg_heavy_change",
    oracle=f"""
WITH bounds AS (
  SELECT epoch_us(MIN(ts))
    + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS mid_us
  FROM events
), keyed AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INT) AS item,
    CASE WHEN epoch_us(ts) < bounds.mid_us THEN 0 ELSE 1 END AS half
  FROM events, bounds
), counts AS (
  SELECT item,
    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM keyed WHERE item IS NOT NULL GROUP BY item
)
SELECT item, n1, n2, n2 - n1 AS delta,
  round(CAST(n2 - n1 AS DOUBLE) / (n1 + 1), 6) AS rel_change
FROM counts
ORDER BY abs(n2 - n1) DESC, item
LIMIT {_HC_TOPN}
""",
    tags=("agg", "sketch"),
)
def agg_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAVY CHANGE detection (Cormode & Muthukrishnan's "what's new"
    question — the deltoids problem): the items whose frequency moved
    MOST between the first and second half of the event window, not
    the items that are merely big (agg_heavy_hitters answers that).
    Items are the props.k values; the report is the top {_HC_TOPN}
    movers by absolute count delta with the +1-smoothed relative
    change alongside (so a 0 -> 40 cold start ranks above a
    4000 -> 4040 drift of the same absolute delta on the relative
    column). Ties break by item id.

    Plan shape: a 1-row bounds broadcast (allowlisted O(1)-row NLJ)
    splits the scan into halves WITHOUT two passes — one conditional
    hash aggregation yields both halves' counts per item; the top-N is
    TakeOrderedAndProject. At 100 TB this is the exact two-period
    form of the count-min-based deltoid sketch with the sketch
    replaced by the exact grouped count (domain-bounded items here);
    for unbounded item domains agg_count_min is the drop-in partial.
    Counts are exact BIGINTs; only the 6-dp relative change is a
    double, on identical expression trees."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo_us"),
        F.max(F.unix_micros("ts")).alias("hi_us"),
    ).select(
        (
            F.col("lo_us")
            + F.floor((F.col("hi_us") - F.col("lo_us")) / 2).cast("long")
        ).alias("mid_us")
    )
    keyed = ev.crossJoin(F.broadcast(bounds)).select(
        F.get_json_object("props", "$.k").cast("int").alias("item"),
        F.when(F.unix_micros("ts") < F.col("mid_us"), 0)
        .otherwise(1)
        .alias("half"),
    )
    # item IS NOT NULL on both engines: a NULL item (missing or
    # non-integer props.k) tying at the top-N boundary would order
    # differently (Spark sorts NULLs first ascending, DuckDB last) —
    # ADVICE r8. NULL is "no item", not a deltoid candidate.
    counts = keyed.filter(F.col("item").isNotNull()).groupBy("item").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    delta = F.col("n2") - F.col("n1")
    return (
        counts.select(
            "item",
            "n1",
            "n2",
            delta.alias("delta"),
            F.round(delta.cast("double") / (F.col("n1") + 1), 6).alias(
                "rel_change"
            ),
        )
        .orderBy(F.abs(F.col("delta")).desc(), "item")
        .limit(_HC_TOPN)
    )


_AR_ITEMS = 20  # item domain: props.k coarsened mod 20 so pairs co-occur
_AR_BASKET_CAP = 16  # deterministic md5 cap on items per basket
_AR_MINSUP = 3  # minimum pair support
_AR_TOPN = 15  # rules reported


@register(
    "agg_assoc_rules",
    oracle=f"""
WITH bi0 AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
    CAST(json_extract_string(props, '$.k') AS INT) % {_AR_ITEMS} AS item
  FROM events
), bi1 AS (SELECT user_id, d, item FROM bi0 WHERE item IS NOT NULL),
bi AS (
  SELECT user_id, d, item FROM (
    SELECT user_id, d, item,
      ROW_NUMBER() OVER (PARTITION BY user_id, d
        ORDER BY md5(CAST(item AS VARCHAR)), item) AS rn
    FROM bi1) t
  WHERE rn <= {_AR_BASKET_CAP}
), nb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
  FROM (SELECT DISTINCT user_id, d FROM bi)
), sup AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS supp FROM bi GROUP BY item
), pairs AS (
  SELECT a.item AS ia, b.item AS ib, CAST(COUNT(*) AS BIGINT) AS supp_ab
  FROM bi a JOIN bi b ON a.user_id = b.user_id AND a.d = b.d
    AND a.item < b.item
  GROUP BY a.item, b.item
)
SELECT ia, ib, supp_ab, sa.supp AS supp_a, sb.supp AS supp_b,
  nb.n_baskets,
  round(CAST(supp_ab AS DOUBLE) / nb.n_baskets, 6) AS support,
  round(CAST(supp_ab AS DOUBLE) / sa.supp, 6) AS confidence,
  round(CAST(supp_ab AS DOUBLE) * nb.n_baskets
        / (sa.supp * sb.supp), 6) AS lift
FROM pairs JOIN sup sa ON pairs.ia = sa.item
JOIN sup sb ON pairs.ib = sb.item CROSS JOIN nb
WHERE supp_ab >= {_AR_MINSUP}
ORDER BY lift DESC, ia, ib LIMIT {_AR_TOPN}
""",
    tags=("agg", "stats", "basket"),
)
def agg_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSOCIATION RULES (Agrawal & Srikant's Apriori output layer —
    support / confidence / lift for item pairs): baskets are (user,
    day), items the props.k domain coarsened mod {_AR_ITEMS}; the top
    {_AR_TOPN} rules by lift among pairs with support >= {_AR_MINSUP}.
    Lift > 1 = the pair co-occurs more than independence predicts —
    the recommender / market-basket primitive the events family was
    missing (graph_bipartite_projection counts co-occurrence but never
    normalizes by marginals).

    Plan shape: ONE distinct (basket, item) reduction is the only
    stage that sees raw rows; baskets are capped at {_AR_BASKET_CAP}
    items by deterministic md5 rank (every co-occurrence build's
    discipline here), so the pair self-join fans out at most
    C({_AR_BASKET_CAP},2) per basket — never quadratic in an
    uncapped hot basket. Pair/item supports are hash aggregations on
    that reduced frame; n_baskets is a 1-row broadcast (allowlisted
    NLJ). At 100 TB: the distinct reduction is the corpus-sized
    shuffle, everything after is bounded by baskets x C(cap,2). The
    top-N is TakeOrderedAndProject on 6-dp-rounded lift with (ia, ib)
    tie-break — a total order, same on both engines."""
    ev = load(spark, sf_dir, "events")
    bi0 = ev.select(
        "user_id",
        F.to_date("ts").alias("d"),
        (
            F.get_json_object("props", "$.k").cast("int") % _AR_ITEMS
        ).alias("item"),
    ).filter(F.col("item").isNotNull()).distinct()
    # r11 OPT: one basket-array frame replaces the four separate
    # consumers of the capped (basket, item) frame (basket count, item
    # supports, and BOTH sides of a basket self-join). The md5-rank cap
    # becomes an in-row array_sort+slice over struct(md5, item) — the
    # identical (md5(item), item) order the ROW_NUMBER window used —
    # and the pair fan-out becomes an in-row combination explode
    # (ia < ib numerically, exactly the self-join's predicate), so the
    # C(cap,2) blow-up never crosses a shuffle. The oracle keeps the
    # original windowed-self-join SQL: same rows by construction.
    baskets = (
        bi0.groupBy("user_id", "d")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.md5(F.col("item").cast("string")).alias("m"),
                            F.col("item").alias("item"),
                        )
                    )
                ),
                1,
                _AR_BASKET_CAP,
            ).alias("capped")
        )
        .select(F.array_sort("capped.item").alias("items"))
        # three consumers (basket count, supports, pair fan-out) — one
        # lineage cut so the events scan + JSON extraction run once,
        # not once per consumer; the frame is basket-domain-sized
        .localCheckpoint()
    )
    nb = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    sup = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supp"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("items"),
                    i + 2,
                    F.greatest(F.size("items") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("ia"), y.alias("ib")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select("p.ia", "p.ib")
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supp_ab"))
        .filter(F.col("supp_ab") >= _AR_MINSUP)
    )
    sa = sup.select(F.col("item").alias("ia"), F.col("supp").alias("supp_a"))
    sb = sup.select(F.col("item").alias("ib"), F.col("supp").alias("supp_b"))
    ab = F.col("supp_ab").cast("double")
    return (
        pairs.join(F.broadcast(sa), "ia")
        .join(F.broadcast(sb), "ib")
        .crossJoin(F.broadcast(nb))
        .select(
            "ia",
            "ib",
            "supp_ab",
            "supp_a",
            "supp_b",
            "n_baskets",
            F.round(ab / F.col("n_baskets"), 6).alias("support"),
            F.round(ab / F.col("supp_a"), 6).alias("confidence"),
            F.round(
                ab * F.col("n_baskets")
                / (F.col("supp_a") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "ia", "ib")
        .limit(_AR_TOPN)
    )


_WINS_LO_NUM = 1  # winsorize at [p10, p90]: ceil(1n/10) / ceil(9n/10)
_WINS_HI_NUM = 9


@register(
    "agg_winsorized_stats",
    oracle=f"""
WITH b AS (
  SELECT event_type, CAST(round(value, 2) AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL
), dv AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY event_type, v
), cum AS (
  SELECT event_type, v, cnt,
    SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
    SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM dv
), cuts AS (
  SELECT event_type,
    MIN(CASE WHEN cum >= CAST(floor(({_WINS_LO_NUM} * CAST(n AS DOUBLE) + 9) / 10) AS BIGINT)
        THEN v END) AS lo,
    MIN(CASE WHEN cum >= CAST(floor(({_WINS_HI_NUM} * CAST(n AS DOUBLE) + 9) / 10) AS BIGINT)
        THEN v END) AS hi,
    CAST(MAX(n) AS BIGINT) AS n
  FROM cum GROUP BY event_type
), wins AS (
  SELECT dv.event_type, cuts.lo, cuts.hi, cuts.n,
    SUM(CAST(LEAST(GREATEST(dv.v, cuts.lo), cuts.hi) AS DECIMAL(18,2)) * dv.cnt) AS ws,
    SUM(dv.v * dv.cnt) AS rs
  FROM dv JOIN cuts ON dv.event_type = cuts.event_type
  GROUP BY dv.event_type, cuts.lo, cuts.hi, cuts.n
)
SELECT event_type, n, CAST(lo AS DOUBLE) AS p10, CAST(hi AS DOUBLE) AS p90,
  round(CAST(ws AS DOUBLE) / n, 6) AS winsorized_mean,
  round(CAST(rs AS DOUBLE) / n, 6) AS raw_mean
FROM wins
""",
    tags=("agg", "stats", "robust"),
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED mean per event_type (clamp to [p10, p90] then
    average — the robust-statistics standard for metric pipelines
    where a single whale order drags the plain mean; Tukey/Dixon
    winsorization, reported next to the raw mean so the outlier drag
    is visible). Percentile cutoffs are EXACT type-1 (inverted-CDF)
    quantiles: smallest value whose cumulative count reaches
    ceil(q*n), computed on the DISTINCT-VALUE frame — the
    agg_mann_whitney discipline: 2-dp money values saturate while row
    counts grow, so the ranked frame is domain-sized, never row-scale.
    Rank thresholds are exact integer arithmetic (floor((k*n+9)/10)),
    no float percentile boundary.

    Plan shape: one hash agg to the distinct-value frame, cumulative
    windows PARTITIONED by event_type over that reduced frame, a
    5-row cutoff broadcast joined back, and one more hash agg — raw
    rows are scanned exactly once. Clamping happens in DECIMAL so the
    winsorized sum is exact and summation-order-free ON BOTH ENGINES:
    DuckDB 1.0.0's LEAST/GREATEST over DECIMAL silently return DOUBLE
    (typeof-verified), so the oracle re-CASTs the clamp to
    DECIMAL(18,2) before the SUM — without that cast the oracle sum
    is a parallel order-dependent DOUBLE sum that flips the 6-dp
    round at 1-ULP boundaries (the r10 judge reproduced DuckDB
    flip-flopping across identical runs on one connection). The only
    doubles are the final divisions, rounded 6 dp on identical
    expression trees.

    r12 NOTE: dv feeds both the cumulative-window subtree and the
    wins join (two scans/execution); the dq_outlier_iqr-style
    localCheckpoint was MEASURED SLOWER here (warm probe 1.09->1.36 s
    — with only two references the eager checkpoint job costs more
    than the one scan it saves) and reverted."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dv = ev.select(
        "event_type",
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    ).groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = Window.partitionBy("event_type").orderBy("v")
    w_all = Window.partitionBy("event_type")
    cum = dv.select(
        "event_type",
        "v",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    lo_rank = F.floor(
        (F.lit(_WINS_LO_NUM) * F.col("n").cast("double") + 9) / 10
    ).cast("bigint")
    hi_rank = F.floor(
        (F.lit(_WINS_HI_NUM) * F.col("n").cast("double") + 9) / 10
    ).cast("bigint")
    cuts = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= lo_rank, F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("v"))).alias("hi"),
        F.max("n").cast("bigint").alias("n"),
    )
    clamped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    wins = (
        dv.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type", "lo", "hi", "n")
        .agg(
            F.sum(clamped * F.col("cnt")).alias("ws"),
            F.sum(F.col("v") * F.col("cnt")).alias("rs"),
        )
    )
    return wins.select(
        "event_type",
        "n",
        F.col("lo").cast("double").alias("p10"),
        F.col("hi").cast("double").alias("p90"),
        F.round(F.col("ws").cast("double") / F.col("n"), 6).alias(
            "winsorized_mean"
        ),
        F.round(F.col("rs").cast("double") / F.col("n"), 6).alias(
            "raw_mean"
        ),
    )


# z_{0.975} + z_{0.80}: the alpha=0.05 two-sided / 80%-power constant
# of the standard two-arm MDE formula, baked as one literal so both
# engines parse the identical double.
_PWR_ZSUM = "2.8015852186"
_PWR_REL = "0.05"  # target relative effect for the sample-size column


@register(
    "agg_power_mde",
    oracle=f"""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS s,
    SUM(CAST(round(value, 2) AS DECIMAL(18,2))
        * CAST(round(value, 2) AS DECIMAL(18,2))) AS ss
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), v AS (
  SELECT event_type, n, CAST(s AS DOUBLE) / n AS mean,
    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      / (n - 1) AS var
  FROM g WHERE n >= 2 AND CAST(s AS DOUBLE) > 0
)
SELECT event_type, n, round(mean, 6) AS mean, round(var, 6) AS variance,
  round({_PWR_ZSUM} * sqrt(2 * var
        / CAST(floor(CAST(n AS DOUBLE) / 2) AS BIGINT)), 6) AS mde_abs,
  round({_PWR_ZSUM} * sqrt(2 * var
        / CAST(floor(CAST(n AS DOUBLE) / 2) AS BIGINT)) / mean, 6)
    AS mde_rel,
  CAST(ceil(2 * var * {_PWR_ZSUM} * {_PWR_ZSUM}
            / ((CAST({_PWR_REL} AS DOUBLE) * mean)
               * (CAST({_PWR_REL} AS DOUBLE) * mean))) AS BIGINT)
    AS n_per_arm_rel5
FROM v WHERE var > 0
""",
    tags=("agg", "stats", "experiment"),
)
def agg_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POWER ANALYSIS per metric segment — the experiment-DESIGN half
    the A/B family was missing (agg_ab_ttest/agg_welch_ttest analyze a
    finished test; this answers "is the next one worth running"):
    for each event_type's value metric, the minimum detectable effect
    if today's traffic were split into two arms (MDE = (z_a + z_b) *
    sqrt(2*var/n_arm), alpha=.05 two-sided, 80% power — the standard
    normal-approximation formula every experimentation platform
    ships), plus the per-arm sample size needed to detect a
    {_PWR_REL}-relative lift. The z constants are ONE shared literal
    ({_PWR_ZSUM}) so both engines parse the identical double.

    Plan shape: one hash aggregation to (n, sum, sum-of-squares) per
    group — moments in exact DECIMAL, the single-pass variance
    identity — then 1-row-per-group closed-form arithmetic. At 100 TB
    this is a map-side-partial count/sum scan, nothing else."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.round("value", 2).cast("decimal(18,2)")
    g = ev.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    stats = (
        g.filter((F.col("n") >= 2) & (F.col("s").cast("double") > 0))
        .select("event_type", "n", mean.alias("mean"), var.alias("var"))
        .filter(F.col("var") > 0)
    )
    n_arm = F.floor(F.col("n").cast("double") / 2).cast("bigint")
    zsum = F.lit(float(_PWR_ZSUM))
    rel = F.lit(float(_PWR_REL))
    mde = zsum * F.sqrt(F.lit(2) * F.col("var") / n_arm)
    return stats.select(
        "event_type",
        "n",
        F.round("mean", 6).alias("mean"),
        F.round("var", 6).alias("variance"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.col("mean"), 6).alias("mde_rel"),
        F.ceil(
            F.lit(2) * F.col("var") * zsum * zsum
            / ((rel * F.col("mean")) * (rel * F.col("mean")))
        ).cast("bigint").alias("n_per_arm_rel5"),
    )


_IQR_FENCE = "1.5"  # Tukey fence multiplier


@register(
    "dq_outlier_iqr",
    oracle=f"""
WITH b AS (
  SELECT event_type, CAST(round(value, 2) AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL
), dv AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY event_type, v
), cum AS (
  SELECT event_type, v, cnt,
    SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
    SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM dv
), cuts AS (
  SELECT event_type,
    MIN(CASE WHEN cum >= CAST(floor((CAST(n AS DOUBLE) + 3) / 4) AS BIGINT)
        THEN v END) AS q1,
    MIN(CASE WHEN cum >= CAST(floor((3 * CAST(n AS DOUBLE) + 3) / 4) AS BIGINT)
        THEN v END) AS q3,
    CAST(MAX(n) AS BIGINT) AS n
  FROM cum GROUP BY event_type
), fen AS (
  SELECT event_type, n, CAST(q1 AS DOUBLE) AS q1, CAST(q3 AS DOUBLE) AS q3,
    CAST(q1 AS DOUBLE) - {_IQR_FENCE} * CAST(q3 - q1 AS DOUBLE) AS fence_lo,
    CAST(q3 AS DOUBLE) + {_IQR_FENCE} * CAST(q3 - q1 AS DOUBLE) AS fence_hi
  FROM cuts
), cnts AS (
  SELECT dv.event_type,
    CAST(SUM(CASE WHEN CAST(dv.v AS DOUBLE) < fen.fence_lo
             THEN dv.cnt ELSE 0 END) AS BIGINT) AS n_below,
    CAST(SUM(CASE WHEN CAST(dv.v AS DOUBLE) > fen.fence_hi
             THEN dv.cnt ELSE 0 END) AS BIGINT) AS n_above
  FROM dv JOIN fen ON dv.event_type = fen.event_type
  GROUP BY dv.event_type
)
SELECT fen.event_type, fen.n, fen.q1, fen.q3,
  round(fen.q3 - fen.q1, 6) AS iqr,
  round(fen.fence_lo, 6) AS fence_lo, round(fen.fence_hi, 6) AS fence_hi,
  cnts.n_below, cnts.n_above,
  round(CAST(cnts.n_below + cnts.n_above AS DOUBLE) / fen.n, 6)
    AS outlier_rate
FROM fen JOIN cnts ON fen.event_type = cnts.event_type
""",
    tags=("agg", "dq", "stats"),
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUKEY-FENCE outlier profile per event_type (q1/q3 exact type-1
    quartiles, fences at q +- {_IQR_FENCE}*IQR, below/above counts and
    the outlier rate) — the boxplot-rule DQ monitor that complements
    agg_anomaly_mad: MAD flags deviation from the median, the IQR
    fences flag TAIL MASS, the quantity a drifting ingest pipeline
    inflates first. Quartiles use exact integer rank thresholds
    (floor((k*n+3)/4)) on the cumulative distinct-value frame — no
    float percentile boundaries, no sketch.

    Plan shape: identical machinery to agg_winsorized_stats (one
    scan to the 2-dp distinct-value frame, event_type-partitioned
    cumulative windows over that saturating frame, 5-row fence
    broadcast joined back for the tail counts) — the whole query
    re-reads raw rows ZERO times after the first hash agg.

    r12 OPT (guide §5, the r11 adjudication's open dq_outlier_iqr
    row): dv is referenced THREE times in this plan (the cum windows,
    the cnts join, and fen's second reference under the final join)
    and the subtrees end in differently-pruned projections, so
    ReusedExchange never fired — every execution ran the events scan +
    distinct-value agg three times. One localCheckpoint of the
    saturating domain-sized frame cuts that to one scan."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dv = ev.select(
        "event_type",
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    ).groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint()
    w_cum = Window.partitionBy("event_type").orderBy("v")
    w_all = Window.partitionBy("event_type")
    cum = dv.select(
        "event_type",
        "v",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    q1_rank = F.floor((F.col("n").cast("double") + 3) / 4).cast("bigint")
    q3_rank = F.floor(
        (3 * F.col("n").cast("double") + 3) / 4
    ).cast("bigint")
    cuts = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= q1_rank, F.col("v"))).alias("q1d"),
        F.min(F.when(F.col("cum") >= q3_rank, F.col("v"))).alias("q3d"),
        F.max("n").cast("bigint").alias("n"),
    )
    fence = F.lit(float(_IQR_FENCE))
    iqr_d = (F.col("q3d") - F.col("q1d")).cast("double")
    fen = cuts.select(
        "event_type",
        "n",
        F.col("q1d").cast("double").alias("q1"),
        F.col("q3d").cast("double").alias("q3"),
        (F.col("q1d").cast("double") - fence * iqr_d).alias("fence_lo"),
        (F.col("q3d").cast("double") + fence * iqr_d).alias("fence_hi"),
    )
    cnts = (
        dv.join(F.broadcast(fen), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("v").cast("double") < F.col("fence_lo"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).cast("bigint").alias("n_below"),
            F.sum(
                F.when(
                    F.col("v").cast("double") > F.col("fence_hi"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).cast("bigint").alias("n_above"),
        )
    )
    return fen.join(cnts, "event_type").select(
        "event_type",
        "n",
        "q1",
        "q3",
        F.round(F.col("q3") - F.col("q1"), 6).alias("iqr"),
        F.round("fence_lo", 6).alias("fence_lo"),
        F.round("fence_hi", 6).alias("fence_hi"),
        "n_below",
        "n_above",
        F.round(
            (F.col("n_below") + F.col("n_above")).cast("double")
            / F.col("n"),
            6,
        ).alias("outlier_rate"),
    )


_SRM_CRIT = "3.841459"  # chi-square df=1 critical value at alpha=.05


@register(
    "agg_ab_srm_check",
    oracle=f"""
WITH assign AS (
  SELECT DISTINCT event_type, user_id, user_id % 2 AS arm FROM events
), counts AS (
  SELECT event_type,
    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM assign GROUP BY event_type
)
SELECT event_type, n_a, n_b,
  round(CAST(n_a AS DOUBLE) / (n_a + n_b), 6) AS frac_a,
  round((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
          / ((n_a + n_b) / 2.0)
      + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
          / ((n_a + n_b) / 2.0), 6) AS chi2,
  ((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
          / ((n_a + n_b) / 2.0)
      + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
          / ((n_a + n_b) / 2.0)) > {_SRM_CRIT} AS srm_flag
FROM counts
""",
    tags=("agg", "stats", "experiment", "dq"),
)
def agg_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH guard (the first thing every
    experimentation platform checks before reading a test: if the
    hash split isn't delivering the designed 50/50, every downstream
    p-value is garbage — Fabijan et al.'s diagnostics paper calls SRM
    the most common invalidator in industry A/B systems): per
    exposure segment (event_type), distinct users per arm (assignment
    is a USER property — the distinct is what makes repeated events
    not double-count a user), the observed split, the df=1 chi-square
    against the designed 50/50, and the alpha=.05 flag
    (chi2 > {_SRM_CRIT}). Complements agg_ab_ttest (reads the
    metric) and agg_chi_square (feature association) — this guards
    the ASSIGNMENT itself.

    Plan: one distinct reduction (event_type, user, arm) — the only
    corpus-sized stage — then a conditional hash agg to |segments|
    rows and closed-form arithmetic. The chi-square uses explicit
    multiplication (never pow) so both engines evaluate the identical
    expression tree."""
    ev = load(spark, sf_dir, "events")
    assign = ev.select(
        "event_type", "user_id", (F.col("user_id") % 2).alias("arm")
    ).distinct()
    counts = assign.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    e = (F.col("n_a") + F.col("n_b")) / 2.0
    da = F.col("n_a") - e
    db = F.col("n_b") - e
    chi2 = da * da / e + db * db / e
    return counts.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(
            F.col("n_a").cast("double") / (F.col("n_a") + F.col("n_b")), 6
        ).alias("frac_a"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(float(_SRM_CRIT))).alias("srm_flag"),
    )


_DID_SPLIT = "2024-01-16 00:00:00"  # pre/post boundary (fixture span 01-01..30)
_DID_ZCRIT = "1.959964"  # two-sided alpha=.05 normal critical value


@register(
    "agg_diff_in_diff",
    oracle=f"""
WITH cells AS (
  SELECT event_type,
    CASE WHEN ts >= TIMESTAMP '{_DID_SPLIT}' THEN 1 ELSE 0 END AS post,
    user_id % 2 AS treat,
    CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS s,
    SUM(CAST(round(value, 2) AS DECIMAL(18,2))
        * CAST(round(value, 2) AS DECIMAL(18,2))) AS ss
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type,
    CASE WHEN ts >= TIMESTAMP '{_DID_SPLIT}' THEN 1 ELSE 0 END,
    user_id % 2
  HAVING COUNT(*) >= 2
), mv AS (
  SELECT event_type, post, treat, n, CAST(s AS DOUBLE) / n AS mean,
    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      / (n - 1) AS var
  FROM cells
), wide AS (
  SELECT event_type,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN mean END) AS m_t1,
    MAX(CASE WHEN treat = 1 AND post = 0 THEN mean END) AS m_t0,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN mean END) AS m_c1,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN mean END) AS m_c0,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN var / n END) AS v_t1,
    MAX(CASE WHEN treat = 1 AND post = 0 THEN var / n END) AS v_t0,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN var / n END) AS v_c1,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN var / n END) AS v_c0,
    CAST(SUM(n) AS BIGINT) AS n_total
  FROM mv WHERE var > 0 GROUP BY event_type
  HAVING COUNT(*) = 4
)
SELECT event_type, n_total,
  round(m_t1 - m_t0, 6) AS delta_treat,
  round(m_c1 - m_c0, 6) AS delta_control,
  round((m_t1 - m_t0) - (m_c1 - m_c0), 6) AS did,
  round(sqrt(v_t1 + v_t0 + v_c1 + v_c0), 6) AS se,
  round(((m_t1 - m_t0) - (m_c1 - m_c0))
        / sqrt(v_t1 + v_t0 + v_c1 + v_c0), 6) AS z,
  abs(((m_t1 - m_t0) - (m_c1 - m_c0))
      / sqrt(v_t1 + v_t0 + v_c1 + v_c0)) > {_DID_ZCRIT} AS significant
FROM wide
""",
    tags=("agg", "stats", "experiment"),
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES estimator per metric segment — the
    quasi-experimental workhorse for launches that cannot be randomly
    assigned (Card-Krueger design): users hash-split into
    treat/control, the calendar split into pre/post at a fixed
    boundary, and the effect estimate is the treated group's pre->post
    change minus the control group's (parallel-trends counterfactual).
    SE via the four-cell normal approximation sqrt(sum var_i/n_i) and
    the alpha=.05 two-sided z flag — completing the experiment family
    next to agg_ab_ttest (pure A/B), agg_cuped_adjusted (variance
    reduction), agg_ab_srm_check (assignment validity), agg_power_mde
    (design). Segments missing any of the 4 cells (or with a
    degenerate zero-variance cell — the agg_power_mde guard class)
    are excluded on both engines.

    Plan shape: ONE conditional hash aggregation to the
    |segments| x 2 x 2 cell frame (DECIMAL moments, single-pass
    variance identity), then a 4-way conditional pivot and closed-form
    arithmetic on |segments| rows. At 100 TB: one map-side-combined
    scan, nothing else."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.round("value", 2).cast("decimal(18,2)")
    cells = (
        ev.select(
            "event_type",
            F.when(
                F.col("ts") >= F.lit(_DID_SPLIT).cast("timestamp"), 1
            ).otherwise(0).alias("post"),
            (F.col("user_id") % 2).alias("treat"),
            v.alias("v"),
        )
        .groupBy("event_type", "post", "treat")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    mv = cells.select(
        "event_type", "post", "treat", "n",
        mean.alias("mean"), var.alias("var"),
    ).filter(F.col("var") > 0)

    def cell(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col))
        )

    wide = mv.groupBy("event_type").agg(
        cell(1, 1, "mean").alias("m_t1"),
        cell(1, 0, "mean").alias("m_t0"),
        cell(0, 1, "mean").alias("m_c1"),
        cell(0, 0, "mean").alias("m_c0"),
        F.max(
            F.when(
                (F.col("treat") == 1) & (F.col("post") == 1),
                F.col("var") / F.col("n"),
            )
        ).alias("v_t1"),
        F.max(
            F.when(
                (F.col("treat") == 1) & (F.col("post") == 0),
                F.col("var") / F.col("n"),
            )
        ).alias("v_t0"),
        F.max(
            F.when(
                (F.col("treat") == 0) & (F.col("post") == 1),
                F.col("var") / F.col("n"),
            )
        ).alias("v_c1"),
        F.max(
            F.when(
                (F.col("treat") == 0) & (F.col("post") == 0),
                F.col("var") / F.col("n"),
            )
        ).alias("v_c0"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).alias("n_cells"),
    ).filter(F.col("n_cells") == 4).drop("n_cells")
    did = (F.col("m_t1") - F.col("m_t0")) - (F.col("m_c1") - F.col("m_c0"))
    se = F.sqrt(
        F.col("v_t1") + F.col("v_t0") + F.col("v_c1") + F.col("v_c0")
    )
    return wide.select(
        "event_type",
        "n_total",
        F.round(F.col("m_t1") - F.col("m_t0"), 6).alias("delta_treat"),
        F.round(F.col("m_c1") - F.col("m_c0"), 6).alias("delta_control"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 6).alias("z"),
        (F.abs(did / se) > F.lit(float(_DID_ZCRIT))).alias("significant"),
    )


_JK_BUCKETS = 20  # delete-one-bucket jackknife block count


@register(
    "agg_jackknife_variance",
    oracle=f"""
WITH b AS (
  SELECT event_type, user_id % {_JK_BUCKETS} AS j,
    CAST(COUNT(*) AS BIGINT) AS n_j,
    SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS s_j
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, user_id % {_JK_BUCKETS}
), tot AS (
  SELECT event_type, CAST(SUM(n_j) AS BIGINT) AS n, SUM(s_j) AS s,
    CAST(COUNT(*) AS BIGINT) AS jn
  FROM b GROUP BY event_type
), loo AS (
  SELECT b.event_type, b.j, tot.n, tot.jn,
    CAST(round(CAST(tot.s - b.s_j AS DOUBLE) / (tot.n - b.n_j), 12)
         AS DECIMAL(28,12)) AS theta_j
  FROM b JOIN tot ON b.event_type = tot.event_type
  WHERE tot.n - b.n_j > 0 AND tot.jn >= 2
), bar AS (
  SELECT event_type, n, jn,
    CAST(SUM(theta_j) AS DOUBLE) / jn AS theta_bar
  FROM loo GROUP BY event_type, n, jn
), dev AS (
  SELECT loo.event_type, loo.n, loo.jn, bar.theta_bar,
    CAST(round((CAST(loo.theta_j AS DOUBLE) - bar.theta_bar)
               * (CAST(loo.theta_j AS DOUBLE) - bar.theta_bar), 18)
         AS DECIMAL(38,18)) AS d2
  FROM loo JOIN bar ON loo.event_type = bar.event_type
)
SELECT event_type, n, jn AS n_blocks,
  round(theta_bar, 6) AS theta_bar,
  round(sqrt(CAST(jn - 1 AS DOUBLE) / jn * CAST(SUM(d2) AS DOUBLE)), 6)
    AS se_jackknife
FROM dev GROUP BY event_type, n, jn, theta_bar
""",
    tags=("agg", "stats", "experiment"),
)
def agg_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE-ONE-BLOCK JACKKNIFE standard error for the per-segment
    mean (Quenouille-Tukey; the block form is the uncertainty method
    search/ads A/B platforms use when the estimator is a ratio or the
    data arrives pre-sharded — one pass for the block moments, no
    resampling loop, unlike the {_JK_BUCKETS}-way row expansion the
    Poisson bootstrap pays in agg_bootstrap_ci): users hash into
    {_JK_BUCKETS} blocks, each leave-one-block-out mean is closed-form
    from the block (count, sum) moments, and the jackknife variance is
    (J-1)/J * sum (theta_j - theta_bar)^2.

    Exactness: block sums stay DECIMAL; each leave-one-out mean snaps
    to a 12-dp DECIMAL and each squared deviation to an 18-dp DECIMAL
    BEFORE the cross-row sums, so every accumulation is order-free
    fixed-point (the emb_centroid_outliers moment discipline) — only
    the final sqrt is a double. Plan shape: one hash agg to the
    |segments| x {_JK_BUCKETS} block frame, a broadcast-sized totals
    join, and two tiny aggs — at 100 TB this is a single
    map-side-combined scan plus domain-sized arithmetic."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.round("value", 2).cast("decimal(18,2)")
    b = (
        ev.select(
            "event_type",
            (F.col("user_id") % _JK_BUCKETS).alias("j"),
            v.alias("v"),
        )
        .groupBy("event_type", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_j"),
            F.sum("v").alias("s_j"),
        )
    )
    tot = b.groupBy("event_type").agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.sum("s_j").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("jn"),
    )
    loo = (
        b.join(F.broadcast(tot), "event_type")
        .filter((F.col("n") - F.col("n_j") > 0) & (F.col("jn") >= 2))
        .select(
            "event_type",
            "j",
            "n",
            "jn",
            F.round(
                (F.col("s") - F.col("s_j")).cast("double")
                / (F.col("n") - F.col("n_j")),
                12,
            ).cast("decimal(28,12)").alias("theta_j"),
        )
    )
    bar = loo.groupBy("event_type", "n", "jn").agg(
        (F.sum("theta_j").cast("double") / F.col("jn")).alias("theta_bar")
    )
    dev = loo.join(
        F.broadcast(bar.select("event_type", "theta_bar")), "event_type"
    ).select(
        "event_type",
        "n",
        "jn",
        "theta_bar",
        F.round(
            (F.col("theta_j").cast("double") - F.col("theta_bar"))
            * (F.col("theta_j").cast("double") - F.col("theta_bar")),
            18,
        ).cast("decimal(38,18)").alias("d2"),
    )
    return dev.groupBy("event_type", "n", "jn", "theta_bar").agg(
        F.sum("d2").alias("sd2")
    ).select(
        "event_type",
        "n",
        F.col("jn").alias("n_blocks"),
        F.round("theta_bar", 6).alias("theta_bar"),
        F.round(
            F.sqrt(
                (F.col("jn") - 1).cast("double")
                / F.col("jn")
                * F.col("sd2").cast("double")
            ),
            6,
        ).alias("se_jackknife"),
    )


_TOST_MARGIN = "0.05"  # relative equivalence margin vs the pooled mean
_TOST_Z1 = "1.644854"  # one-sided alpha=.05 normal critical value


@register(
    "agg_tost_equivalence",
    oracle=f"""
WITH g AS (
  SELECT event_type, user_id % 2 AS arm,
    CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS s,
    SUM(CAST(round(value, 2) AS DECIMAL(18,2))
        * CAST(round(value, 2) AS DECIMAL(18,2))) AS ss
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, user_id % 2
  HAVING COUNT(*) >= 2
), mv AS (
  SELECT event_type, arm, n, CAST(s AS DOUBLE) / n AS mean,
    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      / (n - 1) AS var
  FROM g
), wide AS (
  SELECT event_type,
    MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
    MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
    MAX(CASE WHEN arm = 0 THEN mean END) AS mean_a,
    MAX(CASE WHEN arm = 1 THEN mean END) AS mean_b,
    MAX(CASE WHEN arm = 0 THEN var END) AS var_a,
    MAX(CASE WHEN arm = 1 THEN var END) AS var_b
  FROM mv WHERE var > 0 GROUP BY event_type HAVING COUNT(*) = 2
), t AS (
  SELECT event_type, n_a, n_b, mean_a, mean_b,
    mean_a - mean_b AS diff,
    {_TOST_MARGIN} * abs((mean_a * n_a + mean_b * n_b) / (n_a + n_b))
      AS margin,
    sqrt(var_a / n_a + var_b / n_b) AS se
  FROM wide
)
SELECT event_type, n_a, n_b,
  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
  round(diff, 6) AS diff, round(margin, 6) AS margin,
  round(se, 6) AS se,
  round((diff + margin) / se, 6) AS z_lower,
  round((diff - margin) / se, 6) AS z_upper,
  (diff + margin) / se > {_TOST_Z1}
    AND (diff - margin) / se < -{_TOST_Z1} AS equivalent
FROM t
""",
    tags=("agg", "stats", "experiment"),
)
def agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST EQUIVALENCE test per metric segment (Schuirmann 1987 —
    two one-sided tests, the regulatory/bioequivalence standard): the
    experiment family can now answer the question a plain t-test
    cannot — "is the new arm the SAME as control, within a
    {_TOST_MARGIN}-relative margin?" (non-significance is NOT
    equivalence; TOST requires the difference to be significantly
    INSIDE both margin bounds). Arms hash-split (user_id % 2), margin
    anchored to abs(pooled mean) — a margin is a WIDTH, so it stays
    well-defined for negative-valued metrics — both one-sided z
    statistics at
    alpha=.05 against the shared critical literal — declared
    equivalent only when BOTH reject.

    Guards per the r10 degenerate-input discipline: cells need n >= 2,
    positive variance, and both arms present, filtered identically on
    both engines. Plan shape: ONE conditional hash aggregation to the
    |segments| x 2 DECIMAL-moment frame, then closed-form arithmetic —
    the agg_diff_in_diff scan shape."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.round("value", 2).cast("decimal(18,2)")
    g = (
        ev.select(
            "event_type", (F.col("user_id") % 2).alias("arm"), v.alias("v")
        )
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    mv = g.select(
        "event_type", "arm", "n", mean.alias("mean"), var.alias("var")
    ).filter(F.col("var") > 0)

    def arm(a: int, col: str):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    wide = (
        mv.groupBy("event_type")
        .agg(
            arm(0, "n").alias("n_a"),
            arm(1, "n").alias("n_b"),
            arm(0, "mean").alias("mean_a"),
            arm(1, "mean").alias("mean_b"),
            arm(0, "var").alias("var_a"),
            arm(1, "var").alias("var_b"),
            F.count(F.lit(1)).alias("n_arms"),
        )
        .filter(F.col("n_arms") == 2)
        .drop("n_arms")
    )
    diff = F.col("mean_a") - F.col("mean_b")
    # abs(): ADVICE r10 — a negative-valued metric's pooled mean gave
    # margin <= 0, inverting z_lower/z_upper and making equivalence
    # unsatisfiable; the relative margin is a WIDTH, always positive
    margin = F.lit(float(_TOST_MARGIN)) * F.abs(
        (
            F.col("mean_a") * F.col("n_a")
            + F.col("mean_b") * F.col("n_b")
        )
        / (F.col("n_a") + F.col("n_b"))
    )
    se = F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    t = wide.select(
        "event_type",
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        diff.alias("diff"),
        margin.alias("margin"),
        se.alias("se"),
    )
    z1 = F.lit(float(_TOST_Z1))
    return t.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("diff", 6).alias("diff"),
        F.round("margin", 6).alias("margin"),
        F.round("se", 6).alias("se"),
        F.round((F.col("diff") + F.col("margin")) / F.col("se"), 6).alias(
            "z_lower"
        ),
        F.round((F.col("diff") - F.col("margin")) / F.col("se"), 6).alias(
            "z_upper"
        ),
        (
            ((F.col("diff") + F.col("margin")) / F.col("se") > z1)
            & ((F.col("diff") - F.col("margin")) / F.col("se") < -z1)
        ).alias("equivalent"),
    )


#: capture-recapture split: first capture = days 1..15 of the month,
#: second capture = the rest (the fixture's events span one month)
_CRC_SPLIT_DAY = 15


@register(
    "agg_capture_recapture",
    oracle=f"""
WITH caps AS (
  SELECT event_type, user_id,
    MAX(CASE WHEN EXTRACT(day FROM ts) <= {_CRC_SPLIT_DAY}
             THEN 1 ELSE 0 END) AS in_c1,
    MAX(CASE WHEN EXTRACT(day FROM ts) > {_CRC_SPLIT_DAY}
             THEN 1 ELSE 0 END) AS in_c2
  FROM events GROUP BY event_type, user_id
), agg AS (
  SELECT event_type,
    CAST(SUM(in_c1) AS BIGINT) AS n1,
    CAST(SUM(in_c2) AS BIGINT) AS n2,
    CAST(SUM(in_c1 * in_c2) AS BIGINT) AS m,
    CAST(COUNT(*) AS BIGINT) AS n_true
  FROM caps GROUP BY event_type
)
SELECT event_type, n1, n2, m, n_true,
  round(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 2)
    AS n_chapman,
  round(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) * (n1 - m) * (n2 - m)
        / (CAST((m + 1) AS DOUBLE) * (m + 1) * (m + 2)), 2) AS var_chapman,
  round((CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1 - n_true)
        / n_true, 6) AS rel_err
FROM agg
""",
    tags=("agg", "stats", "events"),
)
def agg_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE-RECAPTURE population estimate (Chapman's corrected
    Lincoln-Petersen, 1951) — estimate the distinct-user population per
    segment from TWO overlapping samples without a global distinct:
    users seen in the first half of the month (capture 1) and the
    second half (capture 2); N-hat = (n1+1)(n2+1)/(m+1) - 1 where m is
    the recapture overlap, with Chapman's variance. The fixture keeps
    the exact n_true beside the estimate so rel_err audits the
    estimator's bias inline (the eval_minhash_recall convention: the
    sketch ships with its own quality audit). This is the ecology /
    data-census estimator for "how many distinct entities exist when
    full enumeration is impractical" — dedup pipelines use the same
    identity to estimate residual duplicate rates from two audit
    samples.

    Exactness: both capture memberships collapse per (segment, user)
    with MAX flags in ONE hash agg (in_c1*in_c2 gives the overlap —
    no intersect join, no second distinct pass), so n1/n2/m/n_true are
    exact integers; the Chapman arithmetic is a fixed closed-form
    double expression over those integers, written in the same textual
    order on both engines. Guards: the +1 terms make every denominator
    >= 1 by construction, and n_true >= 1 whenever the group exists.

    Plan shape: one hash aggregation to the (segment x user) domain
    frame, one to the segment frame. At 100 TB: two map-side-combined
    passes, output |segments| rows — and the estimator is exactly what
    you run when COUNT(DISTINCT) over the full corpus is the thing you
    are trying to avoid."""
    ev = load(spark, sf_dir, "events")
    caps = ev.groupBy("event_type", "user_id").agg(
        F.max(
            F.when(F.dayofmonth("ts") <= _CRC_SPLIT_DAY, 1).otherwise(0)
        ).alias("in_c1"),
        F.max(
            F.when(F.dayofmonth("ts") > _CRC_SPLIT_DAY, 1).otherwise(0)
        ).alias("in_c2"),
    )
    agg = caps.groupBy("event_type").agg(
        F.sum("in_c1").cast("bigint").alias("n1"),
        F.sum("in_c2").cast("bigint").alias("n2"),
        F.sum(F.col("in_c1") * F.col("in_c2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
    )
    n1, n2, m = F.col("n1"), F.col("n2"), F.col("m")
    chapman = (n1 + 1).cast("double") * (n2 + 1) / (m + 1) - 1
    return agg.select(
        "event_type",
        "n1",
        "n2",
        "m",
        "n_true",
        F.round(chapman, 2).alias("n_chapman"),
        F.round(
            (n1 + 1).cast("double") * (n2 + 1) * (n1 - m) * (n2 - m)
            / ((m + 1).cast("double") * (m + 1) * (m + 2)),
            2,
        ).alias("var_chapman"),
        F.round((chapman - F.col("n_true")) / F.col("n_true"), 6).alias(
            "rel_err"
        ),
    )


#: pseudo-permutation count for the hash-based permutation test
_PERM_B = 64


@register(
    "agg_permutation_test",
    oracle=f"""
WITH u AS (
  SELECT user_id, user_id % 2 AS grp,
    CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS s,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL GROUP BY user_id
), obs AS (
  SELECT
    CAST(SUM(CASE WHEN grp = 0 THEN s END) AS DOUBLE)
      / SUM(CASE WHEN grp = 0 THEN c END)
    - CAST(SUM(CASE WHEN grp = 1 THEN s END) AS DOUBLE)
      / SUM(CASE WHEN grp = 1 THEN c END) AS d_obs
  FROM u
), perms AS (
  SELECT b,
    CAST(SUM(CASE WHEN pl = 0 THEN s END) AS DOUBLE)
      / SUM(CASE WHEN pl = 0 THEN c END)
    - CAST(SUM(CASE WHEN pl = 1 THEN s END) AS DOUBLE)
      / SUM(CASE WHEN pl = 1 THEN c END) AS d_b
  FROM (
    SELECT u.s, u.c, b.b,
      CAST(('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '-'
                               || CAST(b.b AS VARCHAR)), 1, 4))
           AS INTEGER) % 2 AS pl
    FROM u CROSS JOIN (
      SELECT unnest(generate_series(0, {_PERM_B - 1})) AS b) b
  ) GROUP BY b
)
SELECT
  CAST({_PERM_B} AS BIGINT) AS n_perms,
  round(d_obs, 6) AS obs_diff,
  CAST(SUM(CASE WHEN abs(d_b) >= abs(d_obs) THEN 1 ELSE 0 END) AS BIGINT)
    AS n_extreme,
  round((1.0 + SUM(CASE WHEN abs(d_b) >= abs(d_obs) THEN 1 ELSE 0 END))
        / (1.0 + {_PERM_B}), 6) AS p_value
FROM perms CROSS JOIN obs
GROUP BY d_obs
""",
    tags=("agg", "stats"),
)
def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-BASED PERMUTATION TEST for the A/B mean difference — the
    assumption-free companion to agg_ab_ttest (no normality, no equal-
    variance; Fisher 1935 exact-test logic made tractable): the null
    distribution is built by RELABELING users, not resampling values,
    with {_PERM_B} pseudo-permutations drawn from a deterministic md5
    coin on (user, b) — the same derandomization as
    graph_triangle_doulion's edge coin, so both engines materialize
    the identical null distribution and the p-value is reproducible
    run-to-run (a seeded RNG shuffles differently per engine; a hash
    coin cannot). Estimate uses the add-one permutation p-value
    (Phipson & Smyth 2010): p = (1 + #{{|d_b| >= |d_obs|}}) / (1 + B).

    Exactness: one hash agg collapses events to per-user DECIMAL
    (sum, count) pairs; every permuted difference is a ratio of exact
    DECIMAL sums over the relabeled user frame, so no double
    accumulates across rows anywhere — the only float math is the
    final fixed-form division per b. The relabeling coin flips
    USER-level units (the randomization unit of agg_ab_ttest), never
    rows, which is what makes the test valid under within-user
    correlation.

    Plan shape: one user-level hash agg, one in-row explode of the
    {_PERM_B}-label sequence over the user frame (user-domain x B — bounded
    by the user DOMAIN, not row count), one hash agg to 2x{_PERM_B}
    cells, a 1-row observed frame broadcast-crossed in. At 100 TB the
    corpus is touched ONCE; everything after the first agg is
    domain-sized."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    ).select("user_id", (F.col("user_id") % 2).alias("grp"), "s", "c")
    obs = u.agg(
        (
            F.sum(F.when(F.col("grp") == 0, F.col("s"))).cast("double")
            / F.sum(F.when(F.col("grp") == 0, F.col("c")))
            - F.sum(F.when(F.col("grp") == 1, F.col("s"))).cast("double")
            / F.sum(F.when(F.col("grp") == 1, F.col("c")))
        ).alias("d_obs")
    )
    labeled = u.select(
        "user_id",
        "s",
        "c",
        F.explode(
            F.sequence(F.lit(0), F.lit(_PERM_B - 1))
        ).alias("b"),
    ).select(
        "s",
        "c",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "-",
                            F.col("user_id").cast("string"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % 2
        ).alias("pl"),
    )
    perms = labeled.groupBy("b").agg(
        (
            F.sum(F.when(F.col("pl") == 0, F.col("s"))).cast("double")
            / F.sum(F.when(F.col("pl") == 0, F.col("c")))
            - F.sum(F.when(F.col("pl") == 1, F.col("s"))).cast("double")
            / F.sum(F.when(F.col("pl") == 1, F.col("c")))
        ).alias("d_b")
    )
    return (
        perms.crossJoin(F.broadcast(obs))
        .groupBy("d_obs")
        .agg(
            F.lit(_PERM_B).cast("bigint").alias("n_perms"),
            F.sum(
                F.when(F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_extreme"),
        )
        .select(
            "n_perms",
            F.round("d_obs", 6).alias("obs_diff"),
            "n_extreme",
            F.round(
                (1.0 + F.col("n_extreme")) / F.lit(1.0 + _PERM_B), 6
            ).alias("p_value"),
        )
    )


@register(
    "agg_dispersion_check",
    oracle="""
WITH per_user AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY event_type, user_id
), m AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(SUM(k) AS BIGINT) AS s1,
    CAST(SUM(k * k) AS BIGINT) AS s2
  FROM per_user GROUP BY event_type
)
SELECT event_type, n_users,
  round(CAST(s1 AS DOUBLE) / n_users, 6) AS mean_k,
  round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_users)
        / (n_users - 1), 6) AS var_k,
  round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_users)
         / (n_users - 1)) / (CAST(s1 AS DOUBLE) / n_users), 6)
    AS dispersion,
  ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_users)
   / (n_users - 1)) / (CAST(s1 AS DOUBLE) / n_users) > 1.5
    AS overdispersed
FROM m
WHERE n_users >= 2
""",
    tags=("agg", "stats", "dq"),
)
def agg_dispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX-OF-DISPERSION CHECK on per-user event counts — the
    sanity test every count model needs before assuming Poisson
    (variance/mean = 1 under Poisson; user activity is almost always
    OVERDISPERSED — a few heavy users — which invalidates Poisson
    CIs and motivates negative-binomial models and the user-level
    resampling agg_permutation_test / agg_jackknife_variance already
    apply): per segment, the per-user count distribution's mean,
    sample variance, dispersion ratio, and the > 1.5 overdispersion
    flag.

    Exactness: per-user counts are integers; the segment moments are
    INTEGER sums (k*k stays bigint — the audit_sum_typeof class);
    mean/variance/ratio are one fixed-form double expression over
    three integers, written identically on both engines. n_users >= 2
    keeps the (n-1) denominator positive under ANSI; mean_k >= 1/n > 0
    by construction (every counted user has >= 1 event).

    Plan shape: two hash aggs (user domain, then segment domain).
    At 100 TB: one corpus scan with map-side combine, |segments|
    rows out."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("k").cast("bigint").alias("s1"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("s2"),
    )
    n, s1, s2 = F.col("n_users"), F.col("s1"), F.col("s2")
    mean_k = s1.cast("double") / n
    var_k = (s2.cast("double") - s1.cast("double") * s1 / n) / (n - 1)
    return m.filter(n >= 2).select(
        "event_type",
        "n_users",
        F.round(mean_k, 6).alias("mean_k"),
        F.round(var_k, 6).alias("var_k"),
        F.round(var_k / mean_k, 6).alias("dispersion"),
        (var_k / mean_k > 1.5).alias("overdispersed"),
    )
