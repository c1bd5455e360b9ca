"""Warehouse-maintenance operators: SCD Type-2 dimension builds,
data-quality expectation suites, distributed heavy-hitter detection,
and deterministic dataset splits.

These generalize the reference's state-tracking and validation
surfaces — the per-payment status history (kinesis-pay.php:239-249)
becomes a slowly-changing dimension; the conjunctive validation chain
(kinesis-pay.php:520-537) becomes a declarative expectation suite run
as ONE pass per table.

Scale notes (100 TB):
- SCD2 build: one shuffle on the entity key + two in-partition window
  passes; no self-join. At rest the dimension is MERGE-maintained
  incrementally; this operator is the full-rebuild / backfill path.
- dq_expectations: all per-row rules for a table fold into a single
  conditional-aggregate scan (one pass, map-side partials); only the
  referential rule needs a join, and its build side is key-only.
- agg_heavy_hitters: per-partition Misra-Gries candidate generation
  (bounded state, one pass) → exact verification of the candidate set
  only. The candidate frame is ≤ capacity × partitions rows no matter
  how large the input — the two-phase shape that works when a full
  groupBy on the key would shuffle 100 TB.
- sample_train_split: pure map + tiny aggregate; split membership is a
  deterministic hash of the key, so it is reproducible across engines,
  runs, repartitioning, and backfills (never TABLESAMPLE/rand()).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.functions.compat import dec
from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "dim_scd2_build",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_id, ts, event_type
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       event_type AS status,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
FROM changes
""",
    tags=("agg", "maintenance"),
)
def dim_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: collapse each user's event stream to
    its status *changes* and emit [valid_from, valid_to) intervals with
    an is_current flag — the change-data-capture shape of the
    reference's per-payment status history (pending→processed…,
    kinesis-pay.php:239-249) applied warehouse-wide.

    Both windows share one partitioning (user_id) and one sort
    (ts, event_id), so the whole build is a single Exchange + Sort
    followed by two in-partition passes — no self-join, no second
    shuffle. (ts, event_id) ordering makes tie-breaks deterministic.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_id", "ts", "event_type")
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


@register(
    "dq_expectations",
    oracle="""
WITH scan_rules AS (
  SELECT * FROM (
    SELECT 'lineitem' AS table_name, 'quantity_in_range' AS rule,
           SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 60 THEN 1 ELSE 0 END) AS n_violations,
           COUNT(*) AS n_rows
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'discount_in_unit_interval',
           SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END), COUNT(*)
    FROM lineitem
    UNION ALL
    SELECT 'orders', 'custkey_not_null',
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), COUNT(*)
    FROM orders
    UNION ALL
    SELECT 'orders', 'totalprice_positive',
           SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), COUNT(*)
    FROM orders
    UNION ALL
    SELECT 'events', 'event_type_in_domain',
           SUM(CASE WHEN event_type NOT IN ('view','click','purchase','refund','poll') THEN 1 ELSE 0 END),
           COUNT(*)
    FROM events
  )
),
pk_rule AS (
  SELECT 'orders' AS table_name, 'orderkey_unique' AS rule,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
         COUNT(*) AS n_rows
  FROM orders
),
fk_rule AS (
  SELECT 'lineitem' AS table_name, 'orderkey_references_orders' AS rule,
         CAST(COUNT(*) AS BIGINT) AS n_violations,
         (SELECT COUNT(*) FROM lineitem) AS n_rows
  FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT table_name, rule, CAST(n_violations AS BIGINT) AS n_violations,
       n_rows, (n_violations = 0) AS passed
FROM (SELECT * FROM scan_rules UNION ALL SELECT * FROM pk_rule UNION ALL SELECT * FROM fk_rule)
""",
    tags=("agg", "maintenance"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite — the reference's
    conjunctive validation chain (source ∧ status ∧ terms,
    kinesis-pay.php:520-537) generalized to a per-table rule report
    (rule, violations, row count, pass flag).

    Engineering shape: all row-local rules for one table fold into a
    SINGLE conditional-aggregate scan (one pass, map-side partials);
    the uniqueness rule rides the same scan via COUNT - COUNT(DISTINCT);
    only the referential rule needs a join, and it is a key-only
    left-anti count. Report size = #rules, independent of input size.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    li_scan = li.agg(
        cnt((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 60)).alias(
            "quantity_in_range"
        ),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "discount_in_unit_interval"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ord_scan = orders.agg(
        cnt(F.col("o_custkey").isNull()).alias("custkey_not_null"),
        cnt(F.col("o_totalprice") <= 0).alias("totalprice_positive"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("long").alias(
            "orderkey_unique"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ev_scan = ev.agg(
        cnt(
            ~F.col("event_type").isin("view", "click", "purchase", "refund", "poll")
        ).alias("event_type_in_domain"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    li_total = li.count()
    orphans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(
            F.lit("lineitem").alias("table_name"),
            F.lit("orderkey_references_orders").alias("rule"),
            "n_violations",
            F.lit(li_total).alias("n_rows"),
        )
    )

    def unpivot(scan: DataFrame, table: str, rules: list[str]) -> DataFrame:
        stack = F.expr(
            "stack({n}, {args}) AS (rule, n_violations)".format(
                n=len(rules),
                args=", ".join(f"'{r}', {r}" for r in rules),
            )
        )
        return scan.select(
            F.lit(table).alias("table_name"), stack, F.col("n_rows")
        ).select("table_name", "rule", "n_violations", "n_rows")

    report = (
        unpivot(li_scan, "lineitem", ["quantity_in_range", "discount_in_unit_interval"])
        .unionByName(
            unpivot(
                ord_scan,
                "orders",
                ["custkey_not_null", "totalprice_positive", "orderkey_unique"],
            )
        )
        .unionByName(unpivot(ev_scan, "events", ["event_type_in_domain"]))
        .unionByName(orphans)
    )
    return report.withColumn("passed", F.col("n_violations") == 0)


_MG_CAPACITY = 512


def _misra_gries_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra-Gries summary of one partition's l_suppkey stream with
    capacity k: any item whose partition count exceeds n_part/k keeps a
    counter, so the union over partitions is a guaranteed superset of
    the global > n_total/k heavy hitters (MG merge property)."""
    counters: dict[int, int] = {}
    for pdf in it:
        for key in pdf["l_suppkey"].to_numpy():
            key = int(key)
            if key in counters:
                counters[key] += 1
            elif len(counters) < _MG_CAPACITY:
                counters[key] = 1
            else:
                dead = [k for k in counters if counters[k] == 1]
                for k in counters:
                    counters[k] -= 1
                for k in dead:
                    del counters[k]
    yield pd.DataFrame({"candidate": list(counters.keys()) or []}, dtype="int64")


@register(
    "agg_heavy_hitters",
    oracle="""
SELECT l_suppkey, COUNT(*) AS n_occurrences
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) * 128 > (SELECT COUNT(*) FROM lineitem)
""",
    tags=("agg", "maintenance"),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items on l_suppkey via the two-phase distributed
    heavy-hitter algorithm: per-partition Misra-Gries candidate
    generation with capacity 512 (every key with support > 1/513 is
    guaranteed to survive some partition summary; bounded memory, ONE
    pass) → exact count verification of the candidate set only, at the
    1/128 support threshold. Exactness: MG guarantees every global heavy
    hitter survives in at least one partition summary, and verification
    re-counts candidates exactly — so the result equals the naive
    full groupBy + HAVING (the oracle), while the shuffled key set is
    ≤ capacity × partitions rows regardless of input size. The same
    candidate+verify shape backs `pcount % 10`-style telemetry rollups
    (kinesis-pay.php:302-304) when the key domain is unbounded."""
    li = load(spark, sf_dir, "lineitem")
    candidates = (
        li.select("l_suppkey")
        .mapInPandas(_misra_gries_partition, "candidate long")
        .distinct()
    )
    total = li.count()
    return (
        li.join(
            F.broadcast(candidates), li.l_suppkey == candidates.candidate, "left_semi"
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * 128 > F.lit(total))
    )


@register(
    "sample_train_split",
    oracle="""
WITH tagged AS (
  SELECT doc_id, n_chars,
    CASE
      WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 90 THEN 'train'
      WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 95 THEN 'validation'
      ELSE 'test'
    END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM tagged
GROUP BY split
""",
    tags=("agg", "sample", "maintenance"),
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/validation/test split by key hash —
    the reproducible-experiment split: membership is a pure function of
    doc_id (md5 prefix mod 100, the filter_hash_sample mechanism), so
    it is stable across engines, runs, cluster sizes, and incremental
    backfills, and never leaks rows between splits. Map-only tag + a
    3-group aggregate; at 100 TB the tag column is also the partition
    column of the written layout so each split reads its own files."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 90, "train")
        .when(bucket < 95, "validation")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "stream_cdc_apply",
    oracle="""
WITH changelog AS (
  SELECT user_id,
         CASE WHEN event_type = 'refund' THEN 'D' ELSE 'U' END AS op,
         value, ts, event_id
  FROM events
  WHERE event_type IN ('purchase', 'refund')
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn
  FROM changelog
)
SELECT user_id, value AS current_value, ts AS updated_at
FROM ranked
WHERE rn = 1 AND op = 'U'
""",
    tags=("agg", "maintenance", "cdc"),
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changelog (upserts + deletes) to produce the current
    snapshot: last-writer-wins per key by (ts, event_id), keys whose
    final operation is a delete disappear. This is the engine-level
    MERGE a Delta/Iceberg sink performs for sink_kv_upsert, expressed
    as a pure query — purchases upsert a user's value, refunds delete
    it (the reference's invoice KV bag mutation + cancellation paths,
    kinesis-pay.php:176,509 and :245-249).

    ONE window shuffle on the key; at 100 TB the changelog is
    date-partitioned, the snapshot is the previous day's result, and
    the same query runs over (snapshot-as-upserts UNION day's changes)
    — incremental cost O(daily changes + touched keys)."""
    ev = load(spark, sf_dir, "events")
    changelog = ev.filter(F.col("event_type").isin("purchase", "refund")).select(
        "user_id",
        F.when(F.col("event_type") == "refund", "D").otherwise("U").alias("op"),
        "value",
        "ts",
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        changelog.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("value").alias("current_value"),
            F.col("ts").alias("updated_at"),
        )
    )


@register(
    "dim_scd2_point_in_time",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_id, ts, event_type FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
  SELECT user_id, event_type AS status, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
)
SELECT d.status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders o
JOIN dim d
  ON o.o_custkey = d.user_id
 AND o.o_orderdate >= d.valid_from
 AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
GROUP BY d.status
""",
    tags=("join", "maintenance"),
)
def dim_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) join against the SCD2 dimension:
    each order picks the dimension row whose [valid_from, valid_to)
    interval covers the order date — the query shape SCD2 exists to
    serve (what WAS the customer's status when they ordered?). The
    interval predicate is bounded by the equi key (user), so Catalyst
    plans an equi-join with the range as a residual filter — within-key
    interval counts are small by construction (a user's status history),
    no nested-loop blowup. At 100 TB both sides hash on the same key;
    with the dimension bucketed the shuffle is one-sided. Consumes the
    same change-collapse as dim_scd2_build (one window pass)."""
    from am_kinesis_pay_spark.functions.compat import dsum

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_id", "ts", "event_type")
    )
    dim = changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(
            dim,
            (orders.o_custkey == dim.user_id)
            & (orders.o_orderdate >= dim.valid_from)
            & (dim.valid_to.isNull() | (orders.o_orderdate < dim.valid_to)),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
    )


@register(
    "mv_incremental_refresh",
    oracle="""
WITH state AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(value AS DECIMAL(18,2)) AS v
  FROM events
  WHERE event_id % 10 <> 0 AND event_id % 20 <> 5
  UNION ALL
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE event_id % 10 = 0
)
SELECT event_type, day,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(v) AS DOUBLE) AS total_value
FROM state GROUP BY event_type, day
""",
    tags=("maintenance", "agg", "incremental"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: refresh a per-(type,
    day) aggregate by MERGING SIGNED DELTAS into the existing snapshot
    instead of recomputing from the base table — the IVM algebra every
    warehouse uses to keep rollups fresh (count and decimal-SUM are
    self-maintainable; the delta batch carries +1 rows for inserts and
    -1 rows for deletes, groups whose count reaches zero drop out).

    Fixture roles (deterministic): the standing base is event_id % 10
    != 0; today's CDC batch inserts event_id % 10 == 0 and deletes
    base rows with event_id % 20 == 5. The Spark side genuinely
    executes the incremental path — snapshot aggregate ⊎ signed delta
    aggregate, merged by one re-aggregation — while the DuckDB oracle
    computes the post-state from first principles, so a hash match
    PROVES the delta algebra (not just that two engines agree on one
    formula). Sums are exact DECIMAL, so add/subtract order cannot
    drift.

    Scale shape: the snapshot side is the ALREADY-MATERIALIZED rollup
    (O(types × days), read not recomputed — here it is rebuilt only
    because the fixture has no standing store); the delta aggregate
    shuffles only the CDC batch. Merge cost is O(groups touched) —
    independent of base-table size, which is the entire point of IVM
    at 100 TB."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.to_date("ts").alias("day"),
        dec("value", 2).alias("v"),
    )
    base = ev.filter(F.col("event_id") % 10 != 0)
    snapshot = base.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("v").alias("sum_v"),
    )
    inserts = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "sign", F.lit(1)
    )
    deletes = base.filter(F.col("event_id") % 20 == 5).withColumn(
        "sign", F.lit(-1)
    )
    delta = (
        inserts.unionByName(deletes)
        .groupBy("event_type", "day")
        .agg(
            F.sum("sign").cast("bigint").alias("n_events"),
            F.sum(F.col("v") * F.col("sign")).alias("sum_v"),
        )
    )
    return (
        snapshot.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_v").alias("sum_v"),
        )
        .filter(F.col("n_events") > 0)
        .select(
            "event_type",
            "day",
            "n_events",
            F.col("sum_v").cast("double").alias("total_value"),
        )
    )


@register(
    "mv_join_delta",
    oracle="""
SELECT o.o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    tags=("maintenance", "join", "incremental"),
)
def mv_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the bilinear delta rule
    that extends mv_incremental_refresh's self-maintainable aggregates
    to multi-table views: for V = A ⋈ B with new batches ΔA, ΔB,

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    and the refreshed aggregate is base(A_old ⋈ B_old) merged with the
    three delta terms' partials. Fixture roles (deterministic): ΔA =
    orders with o_orderkey % 10 == 0, ΔB = lineitem with l_linenumber
    >= 4. The Spark side GENUINELY executes the four-term plan —
    base pre-aggregate plus three delta joins, merged by one
    re-aggregation over (count, exact-decimal sum) partials — while
    the oracle computes the post-state directly from the full join, so
    a hash match proves the delta algebra, not just engine agreement.

    Scale shape: at 100 TB the base term is the ALREADY-MATERIALIZED
    view (read, not recomputed — rebuilt here only because the fixture
    has no standing store), and each delta join touches only batch-
    sized inputs against the other table's join-key partitions: ΔA ⋈ B
    prunes B to ΔA's key range (runtime bloom / DPP), A ⋈ ΔB
    symmetrically, ΔA ⋈ ΔB is batch × batch. Refresh cost scales with
    the batches, never the base — the property that makes join views
    maintainable at all."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", (F.col("o_orderkey") % 10 == 0).alias("is_new")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        ).alias("rev"),
        (F.col("l_linenumber") >= 4).alias("is_new"),
    )
    a_old, a_new = o.filter(~F.col("is_new")), o.filter("is_new")
    b_old, b_new = li.filter(~F.col("is_new")), li.filter("is_new")

    def term(a, b):
        return (
            a.join(b, a.o_orderkey == b.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_items"),
                F.sum("rev").alias("rev_sum"),
            )
        )

    base = term(a_old, b_old)          # the standing materialized view
    d1 = term(a_new, b_old)            # ΔA ⋈ B_old
    d2 = term(a_old, b_new)            # A_old ⋈ ΔB
    d3 = term(a_new, b_new)            # ΔA ⋈ ΔB
    return (
        base.unionByName(d1)
        .unionByName(d2)
        .unionByName(d3)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_items").cast("bigint").alias("n_items"),
            F.sum("rev_sum").cast("double").alias("revenue"),
        )
    )


_CMS_D = 4    # hash rows
_CMS_W = 32   # buckets per row — deliberately small so collisions and
              # the min-over-rows recovery are OBSERVABLE at fixture SF


@register(
    "agg_count_min",
    oracle=f"""
WITH rows_h AS (
  SELECT user_id, r.r,
    CAST(('0x' || substr(md5(concat(CAST(r.r AS VARCHAR), ':',
                                    CAST(user_id AS VARCHAR))), 1, 4))
         AS BIGINT) % {_CMS_W} AS bkt
  FROM events CROSS JOIN (SELECT unnest(range({_CMS_D})) AS r) r
), counters AS (
  SELECT r, bkt, CAST(COUNT(*) AS BIGINT) AS c
  FROM rows_h GROUP BY r, bkt
), truth AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM events GROUP BY user_id
), probes AS (
  SELECT user_id, true_n FROM truth
  ORDER BY true_n DESC, user_id ASC LIMIT 5
), probe_cells AS (
  SELECT p.user_id, p.true_n, r.r,
    CAST(('0x' || substr(md5(concat(CAST(r.r AS VARCHAR), ':',
                                    CAST(p.user_id AS VARCHAR))), 1, 4))
         AS BIGINT) % {_CMS_W} AS bkt
  FROM probes p CROSS JOIN (SELECT unnest(range({_CMS_D})) AS r) r
)
SELECT pc.user_id, MIN(pc.true_n) AS true_n,
  MIN(c.c) AS cms_estimate,
  MIN(c.c) - MIN(pc.true_n) AS overestimate,
  MIN(c.c) >= MIN(pc.true_n) AS never_undercounts
FROM probe_cells pc
JOIN counters c ON c.r = pc.r AND c.bkt = pc.bkt
GROUP BY pc.user_id
""",
    tags=("agg", "sketch", "maintenance"),
)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) — the COUNTER
    sketch beside the repo's membership (bloom), distinct (HLL/bitmap/
    KMV) and quantile (mergeable histogram) families: d x w integer
    counters, every arrival increments one bucket per hash row, a
    point query reads the MIN over its d cells. Like agg_kmv_distinct
    the hash is md5, so the whole sketch AND its estimates are
    deterministic and the oracle recomputes them bit-for-bit —
    including the one-sided error contract (never_undercounts is TRUE
    for every probe: CMS can only overestimate, and w={_CMS_W} is kept
    deliberately small so collisions actually occur at fixture SF and
    the min-over-rows recovery is doing real work, not vacuously
    passing). Probes are the top-5 true heavy users (deterministic
    tie-break). Plan: the counter build is ONE hash aggregation over
    a d-way row expansion (map-side combined; state is d*w cells, not
    rows), probes broadcast onto the 128-cell counter frame. At 100 TB
    the sketch is the entire reduce state — this is how you count keys
    you cannot afford to enumerate, and counters from disjoint
    partitions merge by cell-wise addition (same partial/merge shape
    the oracle's single pass proves)."""
    ev = load(spark, sf_dir, "events")
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(_CMS_D)])
    ).alias("r")
    bkt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_W
    )
    expanded = ev.select("user_id", rows).select("user_id", "r", bkt.alias("bkt"))
    counters = expanded.groupBy("r", "bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    truth = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    probes = truth.orderBy(F.desc("true_n"), F.asc("user_id")).limit(5)
    probe_cells = probes.select(
        "user_id", "true_n", rows
    ).select("user_id", "true_n", "r", bkt.alias("bkt"))
    est = (
        probe_cells.join(F.broadcast(counters), ["r", "bkt"])
        .groupBy("user_id")
        .agg(
            F.min("true_n").alias("true_n"),
            F.min("c").alias("cms_estimate"),
        )
    )
    return est.select(
        "user_id",
        "true_n",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_n")).alias("overestimate"),
        (F.col("cms_estimate") >= F.col("true_n")).alias("never_undercounts"),
    )


_NEYMAN_BUDGET = 1000  # total sample budget K across strata


@register(
    "sample_neyman",
    oracle=f"""
WITH s AS (
  SELECT c_mktsegment,
    CAST(COUNT(*) AS BIGINT) AS n_h,
    CAST(100 * MAX(CAST(c_acctbal AS DECIMAL(18,2)))
         - 100 * MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS BIGINT)
      AS range_cents
  FROM customer GROUP BY c_mktsegment
), w AS (
  SELECT c_mktsegment, n_h, n_h * range_cents AS weight FROM s
), alloc AS (
  SELECT c_mktsegment, n_h,
    ({_NEYMAN_BUDGET} * weight) // (SELECT SUM(weight) FROM w) AS n_take
  FROM w
), ranked AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, a.n_take,
    ROW_NUMBER() OVER (
      PARTITION BY c.c_mktsegment
      ORDER BY md5(CAST(c.c_custkey AS VARCHAR)), c.c_custkey) AS rn
  FROM customer c JOIN alloc a USING (c_mktsegment)
)
SELECT c_custkey, c_mktsegment, c_acctbal,
  CAST(n_take AS BIGINT) AS stratum_take
FROM ranked WHERE rn <= n_take
""",
    tags=("agg", "sample", "maintenance"),
)
def sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling: a fixed budget K=1000 is
    split across strata proportionally to N_h x dispersion_h — the
    variance-optimal allocation (Neyman 1934), vs sample_balanced
    (equal) and proportional splits. Dispersion here is the acctbal
    RANGE IN CENTS (an exact BIGINT), not stddev: a 1-ulp float
    difference in stddev could flip a floor() allocation between
    engines, while range-based Neyman keeps the whole allocation in
    integer arithmetic (weights, the K*w // sum(w) floor division) —
    deterministic by construction. Within each stratum the take is the
    first n_h rows in md5(custkey) order (the repo's shared
    deterministic shuffle), so membership is reproducible across
    engines, runs, and repartitioning.

    The per-stratum rank does NOT use a naive
    row_number().over(partitionBy(stratum)) — 5 strata would mean 5
    single-task whole-table sorts at scale (the low-cardinality
    window hazard, win_dist_ranks class). Instead the md5's FIRST
    BYTE is a 256-way bucket whose value is a PREFIX of the sort key,
    so (bucket, md5, key) ordering equals (md5, key) ordering: count
    per (stratum, bucket), prefix-sum over that 5x256-row frame, and
    row_number only within the high-cardinality (stratum, bucket)
    partition — exact global position, no fat sort task (the
    events_rfm_segments bucket-prefix pattern). The oracle keeps the
    native single ROW_NUMBER, proving the decomposition exact."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    s = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        (100 * F.max(bal) - 100 * F.min(bal))
        .cast("bigint")
        .alias("range_cents"),
    )
    w = s.select(
        "c_mktsegment", "n_h", (F.col("n_h") * F.col("range_cents")).alias("weight")
    )
    tot = w.agg(F.sum("weight").alias("tot_w"))
    alloc = w.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        F.expr(f"({_NEYMAN_BUDGET} * weight) div tot_w").alias("n_take"),
    )
    hashed = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.md5(F.col("c_custkey").cast("string")).alias("h"),
    ).withColumn("bkt", F.substring("h", 1, 2))
    bkt_counts = hashed.groupBy("c_mktsegment", "bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_pre = (
        W.partitionBy("c_mktsegment")
        .orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = bkt_counts.select(
        "c_mktsegment",
        "bkt",
        F.coalesce(F.sum("cnt").over(w_pre), F.lit(0)).alias("cum_before"),
    )
    w_tie = W.partitionBy("c_mktsegment", "bkt").orderBy("h", "c_custkey")
    return (
        hashed.join(F.broadcast(offsets), ["c_mktsegment", "bkt"])
        .withColumn("pos", F.col("cum_before") + F.row_number().over(w_tie))
        .join(F.broadcast(alloc), "c_mktsegment")
        .filter(F.col("pos") <= F.col("n_take"))
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.col("n_take").cast("bigint").alias("stratum_take"),
        )
    )


@register(
    "dq_null_profile",
    oracle="""
WITH a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS null_et,
    CAST(SUM(CASE WHEN trim(event_type) = '' THEN 1 ELSE 0 END) AS BIGINT) AS blank_et,
    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS d_et,
    CAST(COUNT(*) - COUNT(value) AS BIGINT) AS null_v,
    CAST(SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS nan_v,
    CAST(COUNT(DISTINCT value) AS BIGINT) AS d_v,
    CAST(COUNT(*) - COUNT(props) AS BIGINT) AS null_p,
    CAST(SUM(CASE WHEN trim(props) = '' THEN 1 ELSE 0 END) AS BIGINT) AS blank_p,
    CAST(COUNT(DISTINCT props) AS BIGINT) AS d_p,
    CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS null_u,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS d_u
  FROM events
)
SELECT 'event_type' AS column_name, n_rows, null_et AS n_null,
  blank_et AS n_blank_or_nan, d_et AS n_distinct FROM a
UNION ALL
SELECT 'value', n_rows, null_v, nan_v, d_v FROM a
UNION ALL
SELECT 'props', n_rows, null_p, blank_p, d_p FROM a
UNION ALL
SELECT 'user_id', n_rows, null_u, CAST(0 AS BIGINT), d_u FROM a
""",
    tags=("agg", "dq", "maintenance"),
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness/cardinality profile — the Deequ/dbt-style column
    profiler run before any training set is cut: per column, rows,
    NULLs, blanks (strings) or NaNs (floats — which COUNT() treats as
    present, so they hide from a null check), and exact distinct
    counts. One scan; the multiple exact COUNT(DISTINCT)s plan as one
    Expand aggregation (a deliberate exactness trade, documented: at
    100 TB swap in approx_count_distinct and the Expand disappears —
    the HLL twin agg_approx_distinct shows the sketch's audit
    pattern). Output unpivots the 1-row aggregate into one row per
    column via a 4-arm stack on a 1-row frame."""
    ev = load(spark, sf_dir, "events")
    a = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("event_type")).cast("bigint").alias("null_et"),
        F.sum(F.when(F.trim("event_type") == "", 1).otherwise(0))
        .cast("bigint")
        .alias("blank_et"),
        F.countDistinct("event_type").cast("bigint").alias("d_et"),
        (F.count(F.lit(1)) - F.count("value")).cast("bigint").alias("null_v"),
        F.sum(F.when(F.isnan("value"), 1).otherwise(0))
        .cast("bigint")
        .alias("nan_v"),
        F.countDistinct("value").cast("bigint").alias("d_v"),
        (F.count(F.lit(1)) - F.count("props")).cast("bigint").alias("null_p"),
        F.sum(F.when(F.trim("props") == "", 1).otherwise(0))
        .cast("bigint")
        .alias("blank_p"),
        F.countDistinct("props").cast("bigint").alias("d_p"),
        (F.count(F.lit(1)) - F.count("user_id")).cast("bigint").alias("null_u"),
        F.countDistinct("user_id").cast("bigint").alias("d_u"),
    )
    return a.selectExpr(
        """stack(4,
          'event_type', n_rows, null_et, blank_et, d_et,
          'value', n_rows, null_v, nan_v, d_v,
          'props', n_rows, null_p, blank_p, d_p,
          'user_id', n_rows, null_u, CAST(0 AS BIGINT), d_u
        ) AS (column_name, n_rows, n_null, n_blank_or_nan, n_distinct)"""
    )


@register(
    "dq_referential_integrity",
    oracle="""
WITH r1 AS (
  SELECT 'orders->customer' AS relationship,
    CAST(COUNT(*) AS BIGINT) AS child_rows,
    CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS orphan_rows
  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
), r2 AS (
  SELECT 'lineitem->orders' AS relationship,
    CAST(COUNT(*) AS BIGINT) AS child_rows,
    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS orphan_rows
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
), r3 AS (
  SELECT 'lineitem->part' AS relationship,
    CAST(COUNT(*) AS BIGINT) AS child_rows,
    CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS orphan_rows
  FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
    ON l.l_partkey = p.p_partkey
)
SELECT relationship, child_rows, orphan_rows,
  round(CAST(orphan_rows AS DOUBLE) / child_rows * 100, 6) AS orphan_pct
FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
""",
    tags=("dq",),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — per foreign-key relationship, the
    child row count, orphan count (child key with no parent), and
    orphan percentage: the constraint check a lakehouse cannot delegate
    to the storage layer (parquet has no FKs), and the first data-
    quality gate any star-schema ingest runs. Complements
    dq_null_profile (intra-row completeness) with INTER-table
    consistency; validate_chain is the reference's row-level analog
    (kinesis-pay.php:520-537 — reject before process).

    Plan shape per relationship: one LEFT join of the child fact
    against the parent's DISTINCT key projection, aggregated to a
    single row in the same pass (count + conditional sum — the anti-
    join and the total in ONE join instead of two scans). At 100 TB
    the parent key projections (customer, orders-keys, part) are the
    small sides — Spark broadcasts or shuffle-hash-joins them under
    AQE; the fact is scanned once per relationship and never sorted.
    The three 1-row audit frames union into the report."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    def audit(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
              name: str) -> DataFrame:
        pk = parent.select(pkey).distinct()
        joined = child.join(pk, child[ckey] == pk[pkey], "left")
        return joined.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).cast("bigint").alias("child_rows"),
            F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("orphan_rows"),
        )

    rows = (
        audit(orders, "o_custkey", load(spark, sf_dir, "customer"),
              "c_custkey", "orders->customer")
        .unionAll(audit(lineitem, "l_orderkey", orders, "o_orderkey",
                        "lineitem->orders"))
        .unionAll(audit(lineitem, "l_partkey", load(spark, sf_dir, "part"),
                        "p_partkey", "lineitem->part"))
    )
    return rows.select(
        "relationship",
        "child_rows",
        "orphan_rows",
        F.round(
            F.col("orphan_rows").cast("double") / F.col("child_rows") * 100, 6
        ).alias("orphan_pct"),
    )


_FRESH_SLA_MIN = 90  # staleness SLA: max tolerated lag behind the watermark


@register(
    "dq_freshness",
    oracle=f"""
WITH wm AS (
  SELECT MAX(ts) AS watermark FROM events
), per_type AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    MAX(ts) AS last_ts
  FROM events GROUP BY event_type
)
SELECT event_type, n_events, last_ts,
  CAST((epoch_us(watermark) - epoch_us(last_ts)) // 60000000 AS BIGINT)
    AS lag_minutes,
  (epoch_us(watermark) - epoch_us(last_ts)) // 60000000
    > {_FRESH_SLA_MIN} AS is_stale
FROM per_type, wm
""",
    tags=("dq",),
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness / staleness SLA audit — per event type, how far its
    latest event lags the corpus watermark (the data-quality question
    every ingestion dashboard leads with: "is the purchase feed
    behind?"). The watermark is the corpus MAX rather than wall-clock
    so the check is reproducible on a fixture and answers the RELATIVE
    question that matters at ingest: one source stalling behind the
    others. Completes the dq family's time axis next to
    dq_null_profile (completeness) and dq_referential_integrity
    (consistency); flags lag > {_FRESH_SLA_MIN} minutes.

    Plan shape: one hash aggregation to the |event_types| frame plus a
    1-row watermark broadcast (allowlisted O(1)-row NLJ) — at 100 TB
    both MAXes come from the same map-side-combined scan, and a
    partitioned table answers them from footer stats alone
    (source_parquet_footer_stats is that path). Lags are exact BIGINT
    microsecond arithmetic floor-divided to minutes — no float
    anywhere."""
    ev = load(spark, sf_dir, "events")
    wm = ev.agg(F.max("ts").alias("watermark"))
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    lag_min = F.floor(
        (F.unix_micros("watermark") - F.unix_micros("last_ts")) / 60000000
    ).cast("bigint")
    return per_type.crossJoin(F.broadcast(wm)).select(
        "event_type",
        "n_events",
        "last_ts",
        lag_min.alias("lag_minutes"),
        (lag_min > _FRESH_SLA_MIN).alias("is_stale"),
    )


_KFOLD_K = 5


@register(
    "sample_group_kfold",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, event_type,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER)
      % {_KFOLD_K} AS fold
  FROM events
), per_fold AS (
  SELECT fold,
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_purchases
  FROM tagged GROUP BY fold
), leak AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
    CAST(COUNT(*) AS BIGINT) AS user_fold_pairs
  FROM (SELECT DISTINCT user_id, fold FROM tagged)
)
SELECT CAST(fold AS BIGINT) AS fold, n_rows, n_users, n_purchases,
  round(CAST(n_rows AS DOUBLE) / SUM(n_rows) OVER (), 6) AS row_share,
  round(CAST(n_purchases AS DOUBLE) / n_rows, 6) AS purchase_rate,
  user_fold_pairs = distinct_users AS no_leakage
FROM per_fold CROSS JOIN leak
""",
    tags=("sample", "maintenance"),
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED K-FOLD assignment — the cross-validation split
    sample_train_split cannot give you when rows are correlated within
    a user (a user in both train and validation leaks their behavior
    across the boundary; grouped CV assigns the whole GROUP to one
    fold): every event lands in fold md5(user_id) % {_KFOLD_K}, so
    membership is a pure function of the group key — stable across
    engines, runs, and backfills — and the leakage check (every user
    appears in exactly one fold: distinct (user, fold) pairs ==
    distinct users) is computed inline, the audit-beside-the-sketch
    convention. Per fold: rows, users, purchases, row share (balance
    audit), purchase rate (stratification audit — hash folds are
    balanced in expectation only, and the rate column is what tells
    you whether that held).

    Exactness: fold ids and all cells are INTEGER; the two ratio
    columns are final fixed-form divisions (n_rows >= 1 for observed
    folds). Plan shape: map-only tag, one hash agg to {_KFOLD_K}
    rows + one distinct-pair reduction for the leakage audit, a 1-row
    broadcast. At 100 TB: one scan, {_KFOLD_K} rows out."""
    ev = load(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % _KFOLD_K
    )
    tagged = ev.select(
        "user_id", "event_type", fold.alias("fold")
    )
    per_fold = tagged.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
    )
    leak = (
        tagged.select("user_id", "fold")
        .distinct()
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("distinct_users"),
            F.count(F.lit(1)).cast("bigint").alias("user_fold_pairs"),
        )
    )
    w_all = W.partitionBy()
    return per_fold.crossJoin(F.broadcast(leak)).select(
        F.col("fold").cast("bigint").alias("fold"),
        "n_rows",
        "n_users",
        "n_purchases",
        F.round(
            F.col("n_rows").cast("double") / F.sum("n_rows").over(w_all), 6
        ).alias("row_share"),
        F.round(
            F.col("n_purchases").cast("double") / F.col("n_rows"), 6
        ).alias("purchase_rate"),
        (F.col("user_fold_pairs") == F.col("distinct_users")).alias(
            "no_leakage"
        ),
    )
