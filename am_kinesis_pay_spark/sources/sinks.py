"""Sinks (SURVEY.md §2.1): append-only audit log and KV point-update.

The reference's two write paths:
- invoice log: append-only, masked payloads (kinesis-pay.php:446-462)
  → append-mode parquet/stream write (``write_audit_log``).
- invoice KV bag: point update ``set(k,v)->update()``
  (kinesis-pay.php:176,509) → MERGE/upsert. Without a table format
  with row-level MERGE (Delta/Iceberg jars absent by design), the
  pure-Spark emulation is the classic anti-join + union: new snapshot =
  (base MINUS keys-in-updates) UNION updates — which IS how MERGE
  materializes under copy-on-write anyway, so the plan shape carries to
  the real thing. ``sink_kv_upsert`` registers the transformation as an
  oracle-checked query.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from am_kinesis_pay_spark.paths import scratch_path, scratch_table
from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


def write_audit_log(df: DataFrame, path: str) -> None:
    """Append-only audit sink (kinesis-pay.php:447): append mode, never
    overwrite — history is the contract. Partition by date at scale."""
    df.write.mode("append").parquet(path)


@register(
    "sink_audit_roundtrip",
    oracle="""
SELECT event_id, user_id, 'request' AS log_kind FROM events WHERE event_type = 'click' AND event_id % 100 = 0
UNION ALL
SELECT event_id, user_id, 'response' AS log_kind FROM events WHERE event_type = 'view' AND event_id % 100 = 0
""",
    tags=("sink",),
)
def sink_audit_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:446-462 — materialize the request+response
    audit stream through a real parquet sink and read it back
    (write→read roundtrip is the check; overwrite into a scratch dir
    keeps the query idempotent for repeated driver runs)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    req = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("request").alias("log_kind")
    )
    resp = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit("response").alias("log_kind")
    )
    out = scratch_path(spark, "akps_audit_log")
    req.unionByName(resp).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@register(
    "sink_kv_upsert",
    oracle="""
WITH base AS (
  SELECT user_id, arg_min(value, event_id) AS amount_paid, arg_min(event_id, event_id) AS version
  FROM events WHERE event_type = 'view'
  GROUP BY user_id
), updates AS (
  SELECT user_id, arg_max(value, event_id) AS amount_paid, arg_max(event_id, event_id) AS version
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT user_id, amount_paid, version, 'kept' AS row_origin
FROM base WHERE user_id NOT IN (SELECT user_id FROM updates)
UNION ALL
SELECT user_id, amount_paid, version, 'updated' AS row_origin
FROM updates
""",
    tags=("sink", "merge"),
)
def sink_kv_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:176,509 — the invoice-KV point update
    (AMOUNT_PAID) as a MERGE: base snapshot ⟕ updates, update wins.
    anti-join + union — one shuffle each side on the key; with both
    sides bucketed by key at scale, shuffle-free."""
    ev = load(spark, sf_dir, "events")
    base = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.min_by("value", "event_id").alias("amount_paid"),
            F.min("event_id").alias("version"),
        )
    )
    updates = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "event_id").alias("amount_paid"),
            F.max("event_id").alias("version"),
        )
    )
    kept = base.join(updates.select("user_id"), "user_id", "left_anti").withColumn(
        "row_origin", F.lit("kept")
    )
    return kept.unionByName(updates.withColumn("row_origin", F.lit("updated")))


@register(
    "sink_partitioned_write",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS event_date, event_id,
  user_id, event_type
FROM events
WHERE CAST(date_trunc('day', ts) AS DATE)
      BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
""",
    tags=("sink", "layout"),
)
def sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB layout contract made executable: write events
    partitioned by event date (the SCALE.md layout for the stream
    history), read back with a date-range predicate. The read plans
    with PartitionFilters — only the three matching date directories
    are listed and scanned, which is the partition-pruning behavior
    that keeps time-bounded queries O(days touched) instead of O(table)
    at scale. tests/test_plans.py pins the pruned-scan shape."""
    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date(F.date_trunc("day", "ts"))
    )
    out = scratch_path(spark, "akps_partitioned_events")
    ev.select("event_id", "user_id", "event_type", "event_date").write.mode(
        "overwrite"
    ).partitionBy("event_date").parquet(out)
    # explicit schema: a fresh/empty partitioned table has no data files
    # to infer from, and production reads should pin the schema anyway
    return (
        spark.read.schema(
            "event_id bigint, user_id bigint, event_type string, event_date date"
        )
        .parquet(out)
        .filter(
            F.col("event_date").between(
                F.lit("2024-01-10").cast("date"), F.lit("2024-01-12").cast("date")
            )
        )
        .select("event_date", "event_id", "user_id", "event_type")
    )


@register(
    "sink_compaction",
    oracle="""
SELECT CAST(64 AS BIGINT) AS n_files_before,
       CAST(4 AS BIGINT) AS n_files_after,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
""",
    tags=("sink", "layout"),
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every
    long-lived 100 TB table needs: a fragmented write (64 small files,
    the streaming-ingest failure mode) is rewritten into a handful of
    scan-efficient files. ``coalesce`` narrows partitions without a
    shuffle (each output task concatenates input splits); at real scale
    the target is files ~= spark.sql.files.maxPartitionBytes so one
    scan task reads one file. Returns the before/after file counts and
    the row-conservation total. The oracle pins the full contract:
    round-robin repartition(64) fills all 64 files at every fixture SF,
    coalesce(4) lands exactly 4, and the row count survives the
    rewrite; test_curation.py re-checks the layout invariants."""
    import os
    import tempfile

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    small_dir = scratch_path(spark, "akps_compact_small")
    big_dir = scratch_path(spark, "akps_compact_big")
    ev.repartition(64).write.mode("overwrite").parquet(small_dir)

    small = spark.read.parquet(small_dir)
    n_small_files = small.select(F.input_file_name()).distinct().count()
    small.coalesce(4).write.mode("overwrite").parquet(big_dir)

    big = spark.read.parquet(big_dir)
    n_big_files = big.select(F.input_file_name()).distinct().count()
    return spark.createDataFrame(
        [(int(n_small_files), int(n_big_files), int(big.count()))],
        "n_files_before bigint, n_files_after bigint, n_rows bigint",
    )


@register(
    "sink_partition_overwrite",
    oracle="""
WITH days AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS event_date,
         CASE WHEN CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-11'
              THEN value * 2 ELSE value END AS v
  FROM events
  WHERE CAST(date_trunc('day', ts) AS DATE)
        BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
)
SELECT event_date, COUNT(*) AS n_events,
       CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM days
GROUP BY event_date
""",
    tags=("sink", "layout"),
)
def sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent backfill via DYNAMIC partition overwrite: re-running
    one day's job replaces exactly that day's directory and leaves
    every other partition untouched — the property that makes daily
    pipelines retryable at 100 TB (static overwrite mode would wipe
    the whole table; append mode would duplicate the day). Here: write
    3 days, then 'backfill' the middle day with corrected (doubled)
    values under partitionOverwriteMode=dynamic; the read-back
    aggregate proves day 2 was replaced and days 1/3 survived. The
    oracle computes the same correction declaratively."""
    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date(F.date_trunc("day", "ts"))
    )
    window = ev.filter(
        F.col("event_date").between(
            F.lit("2024-01-10").cast("date"), F.lit("2024-01-12").cast("date")
        )
    ).select("event_id", "value", "event_date")
    out = scratch_path(spark, "akps_dynamic_overwrite")
    window.write.mode("overwrite").partitionBy("event_date").parquet(out)

    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        corrected = window.filter(
            F.col("event_date") == F.lit("2024-01-11").cast("date")
        ).withColumn("value", F.col("value") * 2)
        # mode=overwrite + dynamic: only partitions present in
        # `corrected` (the one day) are replaced
        corrected.write.mode("overwrite").partitionBy("event_date").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    return (
        spark.read.schema("event_id bigint, value double, event_date date")
        .parquet(out)
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def write_parquet_observed(df: DataFrame, path: str) -> dict:
    """Write with in-flight metrics (`Observation` API): row count and
    null-key count are collected DURING the write — no second scan of
    the data to answer "what did that job just write?". This is the
    operational form of dq_expectations for sinks: at 100 TB a
    verification pass costs as much as the job, an observation is
    free (metrics accumulate on executors per task and merge on the
    driver). Returns the metrics dict; the audit-log write path
    (kinesis-pay.php:446-462) would attach these to the job record."""
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    first = df.columns[0]
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(first).isNull(), 1).otherwise(0)).alias(
            "n_null_first_col"
        ),
    )
    observed.write.mode("overwrite").parquet(path)
    return obs.get


@register(
    "sink_bucketed_join",
    oracle="""
SELECT o.o_orderpriority,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    tags=("sink", "layout", "join"),
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE.md bucketing claim as an executable query: both fact
    tables written bucketBy(8, orderkey) + sortBy, then joined — the
    sort-merge join consumes bucket files directly with NO Exchange on
    either side (asserted in test_plans.py's bucketed test; this entry
    additionally value-checks the result against the plain join). At
    100 TB this is the difference between shuffling both fact tables
    per join and shuffling neither, amortized across every query that
    joins on the bucket key. Bucket count is cluster-sized (x1024 at
    the design point, 8 here); bucket pruning also serves point lookups
    on the key."""
    import shutil

    base = scratch_path(spark, "akps_bucketed")
    orders_b = scratch_table(spark, "akps_orders_b")
    lineitem_b = scratch_table(spark, "akps_lineitem_b")
    spark.sql(f"DROP TABLE IF EXISTS {orders_b}")
    spark.sql(f"DROP TABLE IF EXISTS {lineitem_b}")
    shutil.rmtree(base, ignore_errors=True)
    for tbl, key, name in (
        ("orders", "o_orderkey", orders_b),
        ("lineitem", "l_orderkey", lineitem_b),
    ):
        (
            # shuffle onto the bucket key BEFORE the bucketed write:
            # each task then owns exactly one bucket and sorts it once,
            # instead of every input partition sorting and writing a
            # file into all 8 buckets (input-partitions × buckets
            # files, each a tiny re-sorted fragment) — at 100 TB that
            # producer-side alignment is the difference between
            # buckets and a small-file explosion
            load(spark, sf_dir, tbl)
            .repartition(8, F.col(key))
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(base, tbl))
            .mode("overwrite")
            .saveAsTable(name)
        )
    return (
        spark.table(lineitem_b)
        .hint("merge")
        .join(
            spark.table(orders_b),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


# Z-order (Morton) clustering: bit-interleave of the two layout
# dimensions after normalizing EACH into the same 10-bit space from
# its own data min/max (the value->rank normalization every real
# z-order writer applies — without it a narrow dimension contributes
# only low-order bits and the curve degenerates to a linear sort on
# the wide one). Both layouts cut into 16 equal-count range buckets.
_Z_BITS = 10
_Z_SPACE = 1 << _Z_BITS
_Z_BUCKETS = 16
# probe -> (min_stat, max_stat, lo, hi) in NORMALIZED coordinates
# (0..1023 at every SF): a bucket is scanned when its [min, max] for
# the probed dimension overlaps [lo, hi]. Each probe selects ~1/8 of
# one dimension and all of the other.
_Z_PROBES = {
    "x_range": ("min_x", "max_x", 100, 227),
    "y_range": ("min_y", "max_y", 256, 383),
}


def _zorder_oracle() -> str:
    interleave = " + ".join(
        f"(((xn >> {i}) & 1) << {2 * i}) + (((yn >> {i}) & 1) << {2 * i + 1})"
        for i in range(_Z_BITS)
    )
    probes = "\nUNION ALL\n".join(
        f"""SELECT layout, '{p}' AS probe,
  CAST({_Z_BUCKETS} AS BIGINT) AS n_buckets,
  CAST(SUM(CASE WHEN {mx} >= {lo} AND {mn} <= {hi} THEN 1 ELSE 0 END)
       AS BIGINT) AS buckets_scanned,
  CAST(SUM(CASE WHEN {mx} >= {lo} AND {mn} <= {hi} THEN n_rows ELSE 0 END)
       AS BIGINT) AS rows_scanned
FROM stats GROUP BY layout"""
        for p, (mn, mx, lo, hi) in _Z_PROBES.items()
    )
    return f"""
WITH base AS (
  SELECT event_id,
    CAST(user_id AS BIGINT) AS x,
    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS y
  FROM events
), bounds AS (
  SELECT MIN(x) AS lo_x, MAX(x) AS hi_x, MIN(y) AS lo_y, MAX(y) AS hi_y
  FROM base
), norm AS (
  SELECT event_id,
    (x - lo_x) * {_Z_SPACE} // (hi_x - lo_x + 1) AS xn,
    (y - lo_y) * {_Z_SPACE} // (hi_y - lo_y + 1) AS yn
  FROM base CROSS JOIN bounds
), z AS (
  SELECT event_id, xn, yn, ({interleave}) AS zval FROM norm
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM z),
zb AS (
  SELECT xn, yn,
    (CAST(ROW_NUMBER() OVER (ORDER BY zval, event_id) AS BIGINT) - 1)
      * {_Z_BUCKETS} // n_total AS bucket
  FROM z CROSS JOIN nn
), lb AS (
  SELECT xn, yn,
    (CAST(ROW_NUMBER() OVER (ORDER BY xn, event_id) AS BIGINT) - 1)
      * {_Z_BUCKETS} // n_total AS bucket
  FROM z CROSS JOIN nn
), stats AS (
  SELECT 'zorder' AS layout, bucket,
    MIN(xn) AS min_x, MAX(xn) AS max_x, MIN(yn) AS min_y, MAX(yn) AS max_y,
    CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM zb GROUP BY bucket
  UNION ALL
  SELECT 'linear_x', bucket,
    MIN(xn), MAX(xn), MIN(yn), MAX(yn), CAST(COUNT(*) AS BIGINT)
  FROM lb GROUP BY bucket
)
{probes}
"""


@register("sink_zorder_layout", oracle=_zorder_oracle(), tags=("sink", "layout"))
def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered layout (Delta ``OPTIMIZE ZORDER BY`` / Iceberg
    sort-order semantics, re-expressed): interleave the bits of two
    query dimensions into a Morton code, range-cut the corpus into
    equal-count buckets along that code, and write one directory per
    bucket. The payoff is measured, not asserted: per-bucket min/max
    stats (the parquet-footer zone-map stand-in) are probed with a
    range predicate on EACH dimension, and the query returns how many
    of the 16 buckets a stats-pruning scan must touch under the
    z-order layout vs a linear ``ORDER BY x`` layout. Linear prunes
    only its leading column (the y-probe hits every bucket); z-order
    prunes on either dimension at ~sqrt fan-out — the reason
    multi-dimension clustering is the default layout move for 100 TB
    tables probed on more than one key.

    Scale shape: the global rank that feeds the range cut is NOT a
    one-task window — it is the two-pass prefix-sum pattern
    (sample_shard_shuffle's): bucket by the Morton code's top bits
    (bucket order is a prefix of the global order), cumsum the 256-row
    count frame into offsets, rank within buckets in parallel, add.
    At 100 TB the equal-count cut runs from a sampled CDF instead
    (repartitionByRange), trading exactness of bucket sizes for one
    pass; the stats/pruning arithmetic is unchanged. The z-ordered
    bucket assignment is physically written (partitioned parquet) and
    the stats are computed from the read-back, so the layout the
    numbers describe is the layout on disk."""
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).cast("bigint")
    base = load(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").cast("bigint").alias("x"),
        day.alias("y"),
    )
    # normalize each dimension into the shared 10-bit space from its own
    # data min/max — equal bit-width per dimension is what makes the
    # Morton curve alternate dimensions fairly (the value->rank
    # normalization every real z-order writer applies); 1-row broadcast,
    # never a collect
    bounds = base.agg(
        F.min("x").alias("lo_x"),
        F.max("x").alias("hi_x"),
        F.min("y").alias("lo_y"),
        F.max("y").alias("hi_y"),
    )
    ev = base.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        F.expr(f"(x - lo_x) * {_Z_SPACE} div (hi_x - lo_x + 1)").alias("xn"),
        F.expr(f"(y - lo_y) * {_Z_SPACE} div (hi_y - lo_y + 1)").alias("yn"),
    )
    zval = None
    for i in range(_Z_BITS):
        xb = F.shiftleft(
            F.shiftright(F.col("xn"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        yb = F.shiftleft(
            F.shiftright(F.col("yn"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        bit = xb + yb
        zval = bit if zval is None else zval + bit
    # both layout pipelines (and the count) consume this frame — spill
    # the one normalized+Morton-coded scan to scratch parquet instead
    # of cache(): same single computation, but nothing stays pinned in
    # executor storage memory after the query (a cache() here has no
    # in-plan unpersist point — every consumer is in the returned lazy
    # plan), and at scale the coded scan IS a persisted layout table
    z_path = scratch_path(spark, "akps_zorder_scan")
    ev.withColumn("zval", zval).write.mode("overwrite").parquet(z_path)
    z = spark.read.parquet(z_path)
    n_total = z.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))

    def ranked(df: DataFrame, sort_col: str, bkt_expr) -> DataFrame:
        """Global (sort_col, event_id) rank via per-prefix-bucket
        offsets + within-bucket row_number (no one-task window)."""
        from pyspark.sql import Window as W

        b = df.withColumn("bkt", bkt_expr)
        offsets = (
            b.groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn(
                "offset",
                F.coalesce(
                    F.sum("n").over(
                        W.orderBy("bkt").rowsBetween(
                            W.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0),
                ),
            )
            .select("bkt", "offset")
        )
        w = W.partitionBy("bkt").orderBy(sort_col, "event_id")
        return (
            b.join(F.broadcast(offsets), "bkt")
            .withColumn(
                "seq", F.col("offset") + F.row_number().over(w) - 1
            )
            .crossJoin(F.broadcast(n_total))
            .withColumn(
                "bucket", F.expr(f"(seq * {_Z_BUCKETS}) div n_total")
            )
            .select("xn", "yn", "bucket")
        )

    zb = ranked(z, "zval", F.shiftright(F.col("zval"), 12))
    lb = ranked(z, "xn", F.shiftright(F.col("xn"), 2))

    out = scratch_path(spark, "akps_zorder_events")
    zb.write.mode("overwrite").partitionBy("bucket").parquet(out)
    zb_disk = spark.read.schema(
        "xn bigint, yn bigint, bucket bigint"
    ).parquet(out)

    def stats(df: DataFrame, layout: str) -> DataFrame:
        return df.groupBy("bucket").agg(
            F.min("xn").alias("min_x"),
            F.max("xn").alias("max_x"),
            F.min("yn").alias("min_y"),
            F.max("yn").alias("max_y"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        ).withColumn("layout", F.lit(layout))

    st = stats(zb_disk, "zorder").unionByName(stats(lb, "linear_x"))
    # one pass over the 32-row stats frame: each bucket row fans out to
    # its per-probe hit flag, then a single groupBy — no re-evaluation
    # of the ranking pipeline per probe
    probe_structs = [
        F.struct(
            F.lit(probe).alias("probe"),
            ((F.col(mx) >= lo) & (F.col(mn) <= hi)).alias("hit"),
        )
        for probe, (mn, mx, lo, hi) in _Z_PROBES.items()
    ]
    return (
        st.select(
            "layout", "n_rows", F.explode(F.array(*probe_structs)).alias("p")
        )
        .groupBy("layout", F.col("p.probe").alias("probe"))
        .agg(
            F.sum(F.when(F.col("p.hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("buckets_scanned"),
            F.sum(F.when(F.col("p.hit"), F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
        )
        .select(
            "layout",
            "probe",
            F.lit(_Z_BUCKETS).cast("bigint").alias("n_buckets"),
            "buckets_scanned",
            "rows_scanned",
        )
    )


# Bloom-style skip index: per-bucket membership summaries for a
# high-cardinality UNSORTED column, probed by point lookups. k hash
# "positions" per value, each a 4-hex-char md5 slice (16-bit slot
# space) so DuckDB reproduces the index bit-for-bit.
_BLOOM_SEEDS = ("b1", "b2", "b3")
_BLOOM_PROBE_IDS = (3, 77, 777)  # event_ids present at every fixture SF
_BLOOM_BUCKETS = 16


def _bloom_oracle() -> str:
    def slices(src: str) -> str:
        return ", ".join(
            f"substr(md5('{s}:' || {src}), 1, 4)" for s in _BLOOM_SEEDS
        )

    probe_ids = ", ".join(str(i) for i in _BLOOM_PROBE_IDS)
    return f"""
WITH ev AS (
  SELECT event_id, md5('u:' || CAST(event_id AS VARCHAR)) AS uuid,
         CAST(event_id % {_BLOOM_BUCKETS} AS BIGINT) AS bucket
  FROM events
), bstats AS (
  SELECT bucket, MIN(uuid) AS min_u, MAX(uuid) AS max_u,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM ev GROUP BY bucket
), bloom AS (
  SELECT DISTINCT bucket, pos FROM (
    SELECT bucket, unnest([{slices('uuid')}]) AS pos FROM ev)
), probes AS (
  SELECT event_id AS probe_id, uuid FROM ev WHERE event_id IN ({probe_ids})
), pslice AS (
  SELECT DISTINCT probe_id, pos FROM (
    SELECT probe_id, unnest([{slices('uuid')}]) AS pos FROM probes)
), pk AS (
  SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS k FROM pslice GROUP BY probe_id
), bloom_hits AS (
  SELECT p.probe_id, b.bucket
  FROM pslice p JOIN bloom b ON p.pos = b.pos
  GROUP BY p.probe_id, b.bucket
  HAVING COUNT(*) = (SELECT k FROM pk WHERE pk.probe_id = p.probe_id)
), zone_hits AS (
  SELECT p.probe_id, s.bucket, s.n_rows
  FROM probes p JOIN bstats s ON p.uuid BETWEEN s.min_u AND s.max_u
)
SELECT 'bloom_index' AS method, h.probe_id,
  CAST({_BLOOM_BUCKETS} AS BIGINT) AS n_buckets,
  CAST(COUNT(*) AS BIGINT) AS buckets_scanned,
  CAST(SUM(s.n_rows) AS BIGINT) AS rows_scanned
FROM bloom_hits h JOIN bstats s USING (bucket) GROUP BY h.probe_id
UNION ALL
SELECT 'zone_map', probe_id, CAST({_BLOOM_BUCKETS} AS BIGINT),
  CAST(COUNT(*) AS BIGINT), CAST(SUM(n_rows) AS BIGINT)
FROM zone_hits GROUP BY probe_id
"""


@register("sink_bloom_skip_index", oracle=_bloom_oracle(), tags=("sink", "layout"))
def sink_bloom_skip_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-style data-skipping index build + measured point-lookup
    pruning — the file-skipping move zone maps CANNOT make: on a
    high-cardinality column uncorrelated with ingest order (here a
    synthetic request uuid, bucketed round-robin like arrival order),
    every bucket's [min, max] spans the whole domain, so min/max
    pruning scans everything. A per-bucket membership summary (the
    parquet bloom-filter / Delta dataSkipping analog: k md5-slice
    "positions" per value, distinct (bucket, position) pairs — index
    size O(distinct values x k), independent of row width) sends a
    point probe to ~1 bucket + a quantified false-positive tail. The
    query MATERIALIZES the index to parquet (an index build is a
    write), reads it back, probes three uuids with both methods, and
    returns buckets/rows scanned per probe — bloom vs zone map, side
    by side. No false negatives by construction: a probe's every
    position is present in its home bucket's index.

    Scale shape: the index build is one explode + distinct (shuffle
    keyed on (bucket, position), map-side combined); probing
    broadcasts the k x |probes| position list against the index scan —
    the big side streams, never the index. The HAVING-all-k-positions
    check is a count equality per (probe, bucket), robust to a probe's
    own slice collisions."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.md5(F.concat(F.lit("u:"), F.col("event_id").cast("string"))).alias(
            "uuid"
        ),
        (F.col("event_id") % _BLOOM_BUCKETS).cast("bigint").alias("bucket"),
    )

    def slice_cols(src):
        return F.array(
            *[
                F.substring(F.md5(F.concat(F.lit(f"{s}:"), src)), 1, 4)
                for s in _BLOOM_SEEDS
            ]
        )

    bstats = ev.groupBy("bucket").agg(
        F.min("uuid").alias("min_u"),
        F.max("uuid").alias("max_u"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    bloom = (
        ev.select("bucket", F.explode(slice_cols(F.col("uuid"))).alias("pos"))
        .distinct()
    )
    idx_path = scratch_path(spark, "akps_bloom_index")
    bloom.write.mode("overwrite").parquet(idx_path)
    bloom_disk = spark.read.schema("bucket bigint, pos string").parquet(
        idx_path
    )

    probes = ev.filter(
        F.col("event_id").isin(*_BLOOM_PROBE_IDS)
    ).select(F.col("event_id").alias("probe_id"), "uuid")
    pslice = probes.select(
        "probe_id", F.explode(slice_cols(F.col("uuid"))).alias("pos")
    ).distinct()
    pk = pslice.groupBy("probe_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    bloom_hits = (
        F.broadcast(pslice)
        .join(bloom_disk, "pos")
        .groupBy("probe_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_match"))
        .join(F.broadcast(pk), "probe_id")
        .filter(F.col("n_match") == F.col("k"))
        .select("probe_id", "bucket")
    )
    zone_hits = F.broadcast(probes).join(
        bstats,
        F.col("uuid").between(F.col("min_u"), F.col("max_u")),
    ).select("probe_id", "bucket", "n_rows")

    bloom_counts = (
        bloom_hits.join(F.broadcast(bstats), "bucket")
        .groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("buckets_scanned"),
            F.sum("n_rows").cast("bigint").alias("rows_scanned"),
        )
        .select(
            F.lit("bloom_index").alias("method"),
            "probe_id",
            F.lit(_BLOOM_BUCKETS).cast("bigint").alias("n_buckets"),
            "buckets_scanned",
            "rows_scanned",
        )
    )
    zone_counts = (
        zone_hits.groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("buckets_scanned"),
            F.sum("n_rows").cast("bigint").alias("rows_scanned"),
        )
        .select(
            F.lit("zone_map").alias("method"),
            "probe_id",
            F.lit(_BLOOM_BUCKETS).cast("bigint").alias("n_buckets"),
            "buckets_scanned",
            "rows_scanned",
        )
    )
    return bloom_counts.unionByName(zone_counts)


@register(
    "sink_additive_rollup",
    oracle="""
SELECT event_type, CAST(ts AS DATE) AS day,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type, CAST(ts AS DATE)
""",
    tags=("sink", "streaming", "incremental"),
)
def sink_additive_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ADDITIVE rollup maintenance end-to-end
    (streaming/foreach_sink.py AdditiveRollupSink): the events table
    is replayed as three micro-batch epochs (event_id % 3), each epoch
    folds its per-(type, day) count/decimal-sum delta into the
    committed snapshot — and epoch 1 is deliberately REDELIVERED, so a
    double-count would make this query's hash mismatch the direct
    GROUP BY oracle. This is the property last-writer-wins MERGE gets
    for free but additive aggregates do not: at-least-once delivery +
    epoch-marker short-circuit = exactly-once accumulation. The
    snapshot-then-marker commit (crash between them leaves the prior
    snapshot authoritative) is pinned separately in
    tests/test_merge_sink.py."""
    import shutil

    from am_kinesis_pay_spark.streaming.foreach_sink import (
        AdditiveRollupSink,
    )

    path = scratch_path(spark, "akps_additive_rollup")
    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.to_date("ts").alias("day"),
        "value",
    )
    sink = AdditiveRollupSink(spark, path, ["event_type", "day"])
    for epoch in (0, 1, 1, 2):  # epoch 1 redelivered
        sink.process_batch(ev.filter(F.col("event_id") % 3 == epoch), epoch)
    try:
        out = sink.read()
    except FileNotFoundError:  # empty input: no epoch ever committed
        return spark.createDataFrame(
            [],
            "event_type string, day date, n_events bigint, "
            "total_value double",
        )
    return out.select(
        "event_type",
        "day",
        "n_events",
        F.col("sum_v").cast("double").alias("total_value"),
    )
