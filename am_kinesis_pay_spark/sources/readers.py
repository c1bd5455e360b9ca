"""Source connectors (SURVEY.md §2.1).

Batch: parquet via tables.load (vectorized scan, pushdown). CSV/JSON
readers with explicit schemas (never inferSchema in production paths).
Streaming: the file-replay source lives in streaming/runner.py; a
Kinesis source (BASELINE.json's production mapping for the status-poll
stream, kinesis-pay.php:231-263) needs the spark-sql-kinesis connector
jar, absent from this image — so it is surfaced as a config-validated
stub behind an import/classpath gate rather than silently failing at
runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from am_kinesis_pay_spark.paths import scratch_path, scratch_table
from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


# Maven coordinate of the Structured Streaming Kinesis connector
# (awslabs spark-sql-kinesis-connector, format name "aws-kinesis").
# Overridable because the artifact id tracks the Spark/Scala version.
KINESIS_CONNECTOR_PACKAGE = os.environ.get(
    "AKPS_KINESIS_PACKAGE",
    "software.amazon.kinesis:spark-streaming-sql-kinesis-connector_2.13:1.0.0",
)


def kinesis_submit_conf(package: str | None = None) -> dict[str, str]:
    """The spark-submit recipe that makes ``kinesis_stream`` runnable:

        spark-submit --packages <KINESIS_CONNECTOR_PACKAGE> job.py

    or equivalently each key below on ``SparkSession.builder.config``.
    Kept as data (not applied here) because ``spark.jars.packages``
    only takes effect at JVM launch — a live session can't add it."""
    return {"spark.jars.packages": package or KINESIS_CONNECTOR_PACKAGE}


def kinesis_connector_available(spark: SparkSession) -> bool:
    """True when the "aws-kinesis" DataSource is registered on the
    classpath. Probed via source lookup (not Class.forName) so any
    connector exposing the format name qualifies, regardless of its
    provider class path."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "aws-kinesis", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str = "us-east-1",
    endpoint: str | None = None,
) -> DataFrame:
    """Production source for the status-poll stream
    (kinesis-pay.php:231-263's poll loop as a readStream). Launch the
    session with ``kinesis_submit_conf()`` applied; against localstack
    or another emulator, pass its URL as ``endpoint``. Raises a clear
    error when the connector jar is absent instead of an opaque
    ClassNotFound at start()."""
    if not kinesis_connector_available(spark):
        raise NotImplementedError(
            "Kinesis connector jar not on classpath; launch via "
            f"spark-submit --packages {KINESIS_CONNECTOR_PACKAGE} "
            "(see kinesis_submit_conf()). Tests use "
            "streaming.runner.events_stream (file replay) instead."
        )
    reader = (
        spark.readStream.format("aws-kinesis")
        .option("kinesis.streamName", stream_name)
        .option("kinesis.region", region)
        .option("kinesis.consumerType", "GetRecords")
        .option("kinesis.startingPosition", "TRIM_HORIZON")
    )
    if endpoint:
        reader = reader.option("kinesis.endpointUrl", endpoint)
    return reader.load()


@register(
    "source_json_roundtrip",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type = 'signup' AND event_id % 10 = 0
""",
    tags=("source", "json"),
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:151,305-310 — the remote-JSON-endpoint
    source modeled end-to-end: records serialized to JSON lines, read
    back through the schema'd JSON source (never inferSchema), and
    surfaced relationally. Overwrite into a scratch dir keeps repeated
    driver runs idempotent."""
    import os
    import tempfile

    from pyspark.sql import types as T

    ev = (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "signup") & (F.col("event_id") % 10 == 0))
        .select("event_id", "user_id", "event_type", "value")
    )
    out = scratch_path(spark, "akps_json_source")
    ev.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return read_json(spark, out, schema)


@register(
    "lookup_by_secure_id",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders
WHERE o_orderkey = 42
""",
    tags=("source", "lookup"),
)
def lookup_by_secure_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:293-296,543-546 — point lookup of an
    invoice by its opaque secure id. Plans as a parquet scan with the
    equality predicate pushed to row-group/page pruning — the lookup
    never reads more than the matching stripes (at 100 TB: partition or
    bucket by the lookup key and this becomes file-level pruning)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


@register(
    "source_csv_roundtrip",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
  round(CAST(o_totalprice AS DECIMAL(18,2)), 2)::DOUBLE AS o_totalprice
FROM orders
WHERE o_orderkey % 100 = 0
""",
    tags=("source", "csv"),
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source surfaced end-to-end: a filtered orders slice written
    as headered CSV and read back through the schema'd CSV reader
    (never inferSchema — at 100 TB schema inference means a second full
    scan). Price goes through DECIMAL(18,2) so the text roundtrip is
    exact."""
    import os
    import tempfile

    from pyspark.sql import types as T

    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("o_totalprice"),
        )
    )
    out = scratch_path(spark, "akps_csv_source")
    o.write.mode("overwrite").option("header", "true").csv(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    return read_csv(spark, out, schema)


@register(
    "source_orc_roundtrip",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_orderkey % 500 = 0
""",
    tags=("source", "orc"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source surfaced end-to-end: a lineitem slice written as ORC
    and read back through the vectorized ORC reader. Same columnar
    pushdown/pruning properties as parquet (both go through the
    FileSourceScanExec path) — the format choice is a storage-layout
    decision, not a query-semantics one."""
    import os
    import tempfile

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 500 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )
    out = scratch_path(spark, "akps_orc_source")
    li.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@register(
    "source_schema_evolution",
    oracle="""
SELECT event_id, user_id, value, NULL AS channel FROM events
WHERE event_type = 'signup' AND event_id % 20 = 0
UNION ALL
SELECT event_id, user_id, value, event_type AS channel FROM events
WHERE event_type = 'purchase' AND event_id % 20 = 0
""",
    tags=("source", "schema"),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the source: two parquet batches written with
    different schemas (a later batch adds a ``channel`` column), read
    back as one dataset with ``mergeSchema`` — older rows surface NULL
    for the added column. This is the append-only schema-widening
    contract a long-lived 100 TB table needs; merging happens at footer
    level (no data rewrite). Production note: pin the merged schema
    explicitly after migration — mergeSchema on every read re-reads all
    footers."""
    import os
    import tempfile

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    out = scratch_path(spark, "akps_schema_evo")
    v1 = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "value"
    )
    v2 = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value", F.col("event_type").alias("channel")
    )
    v1.write.mode("overwrite").parquet(os.path.join(out, "batch1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "batch2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(out, "batch1"), os.path.join(out, "batch2"))
        .select("event_id", "user_id", "value", "channel")
    )


@register(
    "source_corrupt_records",
    oracle="""
SELECT
  CAST(SUM(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
  CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
  CAST(SUM(CASE WHEN event_id % 7 <> 0 THEN json_extract(props, '$.k')::BIGINT ELSE 0 END) AS BIGINT) AS k_total
FROM events
WHERE event_id % 50 = 0 AND props IS NOT NULL
""",
    tags=("source", "json"),
)
def source_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:158-162 — the reference tolerates
    plain-text-or-JSON payloads; at source level this is PERMISSIVE
    JSON parsing with a corrupt-record column. A JSON-lines file is
    written with a deterministic subset of rows corrupted (truncated
    payload), read back with ``columnNameOfCorruptRecord``, and triaged
    into valid/corrupt counts plus an aggregate over the successfully
    parsed field — corrupt rows quarantine instead of failing the job,
    the same fail-open posture as the reference's fallback."""
    import os
    import tempfile

    ev = (
        load(spark, sf_dir, "events")
        .filter((F.col("event_id") % 50 == 0) & F.col("props").isNotNull())
        .select(
            "event_id",
            # corrupt every 7th record: truncate the JSON payload
            F.when(
                F.col("event_id") % 7 == 0,
                F.concat(F.lit('{"k": '), F.lit('"trunc')),
            )
            .otherwise(F.col("props"))
            .alias("payload"),
        )
    )
    out = scratch_path(spark, "akps_corrupt_json")
    ev.select(
        F.concat(
            F.lit('{"event_id": '),
            F.col("event_id").cast("string"),
            F.lit(', "props": '),
            F.col("payload"),
            F.lit("}"),
        ).alias("value")
    ).write.mode("overwrite").text(out)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("props", T.StructType([T.StructField("k", T.LongType())])),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    return parsed.agg(
        F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_valid"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(
            F.when(F.col("_corrupt").isNull(), F.col("props.k")).otherwise(0)
        )
        .cast("bigint")
        .alias("k_total"),
    )


_PYDS_N_PAYMENTS = 200
_PYDS_HEX_POWERS = "[" + ", ".join(str(16 ** (16 - j)) for j in range(1, 17)) + "]"

# Regenerate the kpay_polls stream in SQL: the source's decision
# function is sha256-seeded (pyds._decision), and DuckDB's sha256
# produces the same hex digest, so h = the first 16 hex chars folded
# back into an integer (HUGEINT — the 8-byte value exceeds int64).
_PYDS_ORACLE = f"""
WITH ids AS (
  SELECT unnest(generate_series(0, {_PYDS_N_PAYMENTS - 1})) AS payment_id
), hashed AS (
  SELECT payment_id,
    list_sum(list_transform(generate_series(1, 16),
      j -> CAST(strpos('0123456789abcdef',
              substr(sha256(CAST(payment_id AS VARCHAR)), j, 1)) - 1
           AS HUGEINT) * ({_PYDS_HEX_POWERS})[j])) AS h
  FROM ids
), decided AS (
  SELECT payment_id, h % 100 AS bucket,
    1 + (h // 100) % 62 AS t_seq
  FROM hashed
), per_payment AS (
  SELECT payment_id,
    CASE WHEN bucket < 70 THEN 'processed'
         WHEN bucket < 85 THEN 'rejected'
         ELSE 'pending' END AS final_status,
    CASE WHEN bucket < 85 THEN t_seq + 1 ELSE 63 END AS n_polls
  FROM decided
)
SELECT final_status, COUNT(*) AS n_payments,
  CAST(SUM(n_polls) AS DOUBLE) / COUNT(*) AS avg_polls
FROM per_payment
GROUP BY final_status
"""


@register("source_python_ds", oracle=_PYDS_ORACLE, tags=("source", "streaming"))
def source_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 API): the reference's 10 s
    status-poll loop synthesized as a first-class `kpay_polls` source
    (sources/pyds.py — batch AND streaming from one deterministic
    generator; kinesis-pay.php:231-236,263-268). This query reads the
    batch form and rolls the poll history up to one row per payment:
    polls observed, final status, decision poll. Fully oracle-checked
    even though no fixture table exists: the generator is sha256-seeded,
    so the DuckDB oracle REGENERATES the stream in SQL (hex-digit fold
    of the digest into the same 64-bit seed, same decision thresholds,
    same poll-count arithmetic). A payment that expires never writes a
    terminal row, so its max-seq status is 'pending' — mirrored in the
    oracle's CASE. tests/test_pyds.py additionally pins full row-level
    content against a pure-Python mirror and batch ≡ stream equality."""
    from am_kinesis_pay_spark.sources.pyds import register_kpay_source

    register_kpay_source(spark)
    polls = (
        spark.read.format("kpay_polls")
        .option("num_payments", 200)
        .option("partitions", 8)
        .load()
    )
    return (
        polls.groupBy("payment_id")
        .agg(
            F.count(F.lit(1)).alias("n_polls"),
            F.max_by("status", "poll_seq").alias("final_status"),
            F.max("poll_seq").alias("last_seq"),
        )
        .groupBy("final_status")
        .agg(
            F.count(F.lit(1)).alias("n_payments"),
            F.avg("n_polls").alias("avg_polls"),
        )
    )


_PYDS_PUSHDOWN_ORACLE = f"""
WITH ids AS (
  SELECT unnest(generate_series(40, 119)) AS payment_id
), hashed AS (
  SELECT payment_id,
    list_sum(list_transform(generate_series(1, 16),
      j -> CAST(strpos('0123456789abcdef',
              substr(sha256(CAST(payment_id AS VARCHAR)), j, 1)) - 1
           AS HUGEINT) * ({_PYDS_HEX_POWERS})[j])) AS h
  FROM ids
), decided AS (
  SELECT payment_id, h % 100 AS bucket,
    1 + (h // 100) % 62 AS t_seq
  FROM hashed
), per_payment AS (
  SELECT payment_id,
    CASE WHEN bucket < 85 AND t_seq < 20 THEN
      CASE WHEN bucket < 70 THEN 'processed' ELSE 'rejected' END
    ELSE 'pending' END AS final_status,
    LEAST(20, CASE WHEN bucket < 85 THEN t_seq + 1 ELSE 63 END) AS n_polls
  FROM decided
)
SELECT final_status, COUNT(*) AS n_payments,
  CAST(SUM(n_polls) AS DOUBLE) / COUNT(*) AS avg_polls
FROM per_payment
GROUP BY final_status
"""


@register(
    "source_pyds_pushdown",
    oracle=_PYDS_PUSHDOWN_ORACLE,
    tags=("source", "pushdown"),
)
def source_pyds_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-source FILTER PUSHDOWN (Spark 4.1 DataSource
    ``pushFilters``): the payment_id range and poll_seq cap in this
    query's WHERE clause reach KPayPollBatchReader during planning,
    which narrows its generator bounds — partitions outside
    [40, 120) are never planned and rows with poll_seq >= 20 are never
    generated, exactly how PushedFilters hit a parquet scan. The
    DuckDB oracle regenerates the same truncated stream in SQL (the
    poll cap folds into the per-payment n_polls/final_status
    arithmetic: a terminal poll at t_seq >= 20 is never observed, so
    the payment reads 'pending'). tests/test_pyds.py asserts the
    pruning actually happened (bounds narrowed, partition spans
    shrunk, excluded rows never produced) rather than trusting the
    filter to have been re-applied post-scan."""
    from am_kinesis_pay_spark.sources.pyds import register_kpay_source

    register_kpay_source(spark)
    polls = (
        spark.read.format("kpay_polls")
        .option("num_payments", _PYDS_N_PAYMENTS)
        .option("partitions", 8)
        .load()
        .filter(
            (F.col("payment_id") >= 40)
            & (F.col("payment_id") < 120)
            & (F.col("poll_seq") < 20)
        )
    )
    return (
        polls.groupBy("payment_id")
        .agg(
            F.count(F.lit(1)).alias("n_polls"),
            F.max_by("status", "poll_seq").alias("final_status"),
        )
        .groupBy("final_status")
        .agg(
            F.count(F.lit(1)).alias("n_payments"),
            F.avg("n_polls").alias("avg_polls"),
        )
    )


@register(
    "source_merge_on_read",
    oracle="""
WITH survivors AS (
  SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
  WHERE o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS p
  FROM orders
  WHERE o_orderkey % 17 = 0
)
SELECT o_orderstatus, COUNT(*) AS n_rows,
  CAST(SUM(p) AS DOUBLE) AS sum_price
FROM survivors
GROUP BY o_orderstatus
""",
    tags=("source", "layout"),
)
def source_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read scan — the Iceberg-v2 / Delta-DV read path that
    makes row-level mutation cheap on a 100 TB immutable table: writers
    append small DELETE files (keys to suppress) and UPDATE files (the
    new row versions) instead of rewriting data files; every reader
    reconstructs the current snapshot as
    base ANTI-JOIN deletes ANTI-JOIN updated-keys UNION-ALL updates.
    Staged here exactly as a lakehouse would: the base table lands as
    4 immutable parquet files, a delete file carries the %13 keys, an
    update file carries the %17 rows re-priced 2x (an update IS a
    delete + append, and its append supersedes a concurrent delete of
    the same key). The read-back plan is the scale story: both delta
    files are orders of magnitude smaller than the base, so they
    BROADCAST and the base scan never shuffles for the merge —
    read amplification is O(deltas), and compaction (sink_compaction)
    folds deltas back into data files when they accumulate. The
    aggregate output pins row counts AND values so a wrong merge
    (lost delete, double-applied update) cannot hash-match. Models
    the reference's KV bag mutation (kinesis-pay.php:176,509) as
    file-level operations."""
    base_dir = scratch_path(spark, "akps_mor_base")
    del_dir = scratch_path(spark, "akps_mor_deletes")
    upd_dir = scratch_path(spark, "akps_mor_updates")

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("decimal(18,2)").alias("p")
    )
    orders.repartition(4).write.mode("overwrite").parquet(base_dir)
    orders.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey"
    ).write.mode("overwrite").parquet(del_dir)
    orders.filter(F.col("o_orderkey") % 17 == 0).withColumn(
        "p", F.col("p") * 2
    ).write.mode("overwrite").parquet(upd_dir)

    base = spark.read.parquet(base_dir)
    deletes = spark.read.parquet(del_dir)
    updates = spark.read.parquet(upd_dir)
    merged = (
        base.join(F.broadcast(deletes), "o_orderkey", "left_anti")
        .join(
            F.broadcast(updates.select("o_orderkey")), "o_orderkey", "left_anti"
        )
        .unionByName(updates)
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("p").cast("double").alias("sum_price"),
    )


@register(
    "source_time_travel",
    oracle="""
WITH base AS (
  SELECT user_id, arg_min(value, event_id) AS amount_paid,
         CAST(MIN(event_id) AS BIGINT) AS version
  FROM events WHERE event_type = 'view' GROUP BY user_id
), upd AS (
  SELECT user_id, arg_max(value, event_id) AS amount_paid,
         CAST(MAX(event_id) AS BIGINT) AS version
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), v2 AS (
  SELECT COALESCE(b.user_id, u.user_id) AS user_id,
    CASE WHEN u.user_id IS NOT NULL
          AND (b.version IS NULL OR u.version >= b.version)
         THEN u.amount_paid ELSE b.amount_paid END AS amount_paid
  FROM base b FULL JOIN upd u ON b.user_id = u.user_id
)
SELECT CAST(1 AS INT) AS as_of_version,
  CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(CAST(round(amount_paid, 6) AS DECIMAL(18,6))) AS DOUBLE)
    AS total_amount
FROM base
UNION ALL
SELECT CAST(2 AS INT), CAST(COUNT(*) AS BIGINT),
  CAST(SUM(CAST(round(amount_paid, 6) AS DECIMAL(18,6))) AS DOUBLE)
FROM v2
""",
    tags=("source", "merge"),
)
def source_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read over the MERGE sink's commit log — the
    lakehouse ``VERSION AS OF`` surface (Delta time travel / Iceberg
    snapshot reads) on plain parquet: two epochs commit through
    ``MergeKeyedSink`` (epoch 1 = base KV snapshot from 'view' events,
    epoch 2 = last-writer-wins 'purchase' upserts — the reference's
    ``data()->set()->update()`` mutation, kinesis-pay.php:176,509),
    then BOTH versions are read back via ``read_as_of`` and aggregated
    side by side. The oracle recomputes each snapshot's contents from
    the raw events, so the round-trip pins that (a) the as-of resolver
    picks the right committed snapshot and (b) the MERGE semantics
    (version >= wins, unmatched keys insert) match the declarative
    spec. Snapshot-dir-plus-marker commits mean an uncommitted write is
    never readable at any version — the same isolation a table
    format's transaction log provides. At 100 TB the snapshots are
    file-skipping MERGE rewrites and the as-of read resolves through
    the manifest instead of a directory listing; per-row amounts round
    to 6 dp and accumulate in DECIMAL (repo float convention)."""
    import shutil

    from am_kinesis_pay_spark.streaming.foreach_sink import MergeKeyedSink

    ev = load(spark, sf_dir, "events")
    base = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.min_by("value", "event_id").alias("amount_paid"),
            F.min("event_id").cast("bigint").alias("version"),
        )
    )
    upd = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "event_id").alias("amount_paid"),
            F.max("event_id").cast("bigint").alias("version"),
        )
    )
    path = scratch_path(spark, "akps_time_travel")
    shutil.rmtree(path, ignore_errors=True)
    sink = MergeKeyedSink(spark, path, ["user_id"], "version")
    sink.process_batch(base, 1)
    sink.process_batch(upd, 2)

    def snap_agg(df: DataFrame, version: int) -> DataFrame:
        return df.agg(
            F.lit(version).cast("int").alias("as_of_version"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.round("amount_paid", 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_amount"),
        ).select("as_of_version", "n_keys", "total_amount")

    return snap_agg(sink.read_as_of(1), 1).unionByName(
        snap_agg(sink.read_as_of(2), 2)
    )


@register(
    "source_snapshot_diff",
    oracle="""
WITH base AS (
  SELECT user_id, arg_min(value, event_id) AS amount_paid,
         CAST(MIN(event_id) AS BIGINT) AS version
  FROM events WHERE event_type = 'view' GROUP BY user_id
), upd AS (
  SELECT user_id, arg_max(value, event_id) AS amount_paid,
         CAST(MAX(event_id) AS BIGINT) AS version
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), v2 AS (
  SELECT COALESCE(b.user_id, u.user_id) AS user_id,
    CASE WHEN u.user_id IS NOT NULL
          AND (b.version IS NULL OR u.version >= b.version)
         THEN u.amount_paid ELSE b.amount_paid END AS amount_paid
  FROM base b FULL JOIN upd u ON b.user_id = u.user_id
)
SELECT COALESCE(a.user_id, b.user_id) AS user_id,
  CASE WHEN a.user_id IS NULL THEN 'insert'
       WHEN b.user_id IS NULL THEN 'delete'
       ELSE 'update' END AS change_type,
  a.amount_paid AS old_amount,
  b.amount_paid AS new_amount
FROM base a FULL JOIN v2 b ON a.user_id = b.user_id
WHERE a.user_id IS NULL OR b.user_id IS NULL
   OR a.amount_paid IS DISTINCT FROM b.amount_paid
""",
    tags=("source", "merge"),
)
def source_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between two committed versions — the Delta
    CDF / Iceberg changelog surface (`table_changes(v1, v2)`) on the
    same MERGE commit log ``source_time_travel`` reads: both snapshots
    come back through ``read_as_of`` and a full-outer key diff emits
    the per-key changelog (insert / update / delete; unchanged keys —
    including updates that rewrote the same value — are excluded, as
    CDF excludes no-op rewrites). This is the primitive that lets a
    downstream consumer incrementally maintain anything derived from
    the table without re-reading either snapshot's full state twice
    per sync (stream_cdc_apply is the APPLY side of the same
    contract; this op PRODUCES the feed).

    Determinism: amounts are raw stored values (min_by/max_by picks,
    no arithmetic), so the changed-value comparison is exact on both
    engines; the oracle recomputes both snapshots from raw events and
    replays the identical null-safe diff.

    At 100 TB a table format derives the feed from its transaction
    log's file-level add/remove sets instead of a key diff of full
    snapshots; the full-outer join here is the format-agnostic
    fallback, one co-partitioned shuffle on the merge key."""
    import shutil

    from am_kinesis_pay_spark.streaming.foreach_sink import MergeKeyedSink

    ev = load(spark, sf_dir, "events")
    base = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.min_by("value", "event_id").alias("amount_paid"),
            F.min("event_id").cast("bigint").alias("version"),
        )
    )
    upd = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "event_id").alias("amount_paid"),
            F.max("event_id").cast("bigint").alias("version"),
        )
    )
    path = scratch_path(spark, "akps_snapshot_diff")
    shutil.rmtree(path, ignore_errors=True)
    sink = MergeKeyedSink(spark, path, ["user_id"], "version")
    sink.process_batch(base, 1)
    sink.process_batch(upd, 2)

    v1 = sink.read_as_of(1).select(
        F.col("user_id").alias("uid_a"),
        F.col("amount_paid").alias("old_amount"),
    )
    v2 = sink.read_as_of(2).select(
        F.col("user_id").alias("uid_b"),
        F.col("amount_paid").alias("new_amount"),
    )
    diff = v1.join(v2, v1.uid_a == v2.uid_b, "full_outer")
    return diff.filter(
        F.col("uid_a").isNull()
        | F.col("uid_b").isNull()
        | ~F.col("old_amount").eqNullSafe(F.col("new_amount"))
    ).select(
        F.coalesce("uid_a", "uid_b").alias("user_id"),
        F.when(F.col("uid_a").isNull(), F.lit("insert"))
        .when(F.col("uid_b").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        "old_amount",
        "new_amount",
    )


_FOOTER_COLS = ("l_orderkey", "l_quantity", "l_shipdate", "l_returnflag")


@register("source_parquet_footer_stats", oracle=None, tags=("source", "maintenance"))
def source_parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet footer introspection as a TABLE: per (row group, column)
    value counts, null counts, and min/max statistics read from the
    file metadata — the zone maps that every data-skipping claim in
    this repo (sink_zorder_layout, sink_bloom_skip_index, predicate
    pushdown) ultimately stands on, surfaced so a pipeline can AUDIT
    its layout (a row group whose min==max is constant; one spanning
    the full domain skips nothing).

    Distributed shape: one row per file fans out to executors and each
    partition reads ONLY footers via pyarrow (never data pages) — the
    metadata-scan pattern table formats use for planning, linear in
    file count and independent of row count. Rows-only by necessity:
    oracle SQL is static while file paths vary per SF — so instead the
    cross-engine check is pinned in pytest (test_engine.py) against
    DuckDB's parquet_metadata() at BOTH test SFs, value-exact
    including the stringified min/max rendering."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("row_group", T.IntegerType()),
            T.StructField("column", T.StringType()),
            T.StructField("num_values", T.LongType()),
            T.StructField("null_count", T.LongType()),
            T.StructField("min_val", T.StringType()),
            T.StructField("max_val", T.StringType()),
        ]
    )

    def read_footers(pdfs):
        import pyarrow.parquet as pq

        for pdf in pdfs:
            out = {k.name: [] for k in schema.fields}
            paths = []
            for p in pdf["path"]:
                # a "file" may be a Spark-written directory of parts
                if os.path.isdir(p):
                    paths.extend(
                        os.path.join(p, f)
                        for f in sorted(os.listdir(p))
                        if f.endswith(".parquet")
                    )
                else:
                    paths.append(p)
            for path in paths:
                md = pq.ParquetFile(path).metadata
                base = os.path.basename(path)
                for rg_i in range(md.num_row_groups):
                    rg = md.row_group(rg_i)
                    for c_i in range(rg.num_columns):
                        col = rg.column(c_i)
                        if col.path_in_schema not in _FOOTER_COLS:
                            continue
                        st = col.statistics
                        out["file"].append(base)
                        out["row_group"].append(rg_i)
                        out["column"].append(col.path_in_schema)
                        out["num_values"].append(col.num_values)
                        out["null_count"].append(
                            st.null_count if st is not None else None
                        )
                        out["min_val"].append(
                            str(st.min) if st is not None and st.has_min_max
                            else None
                        )
                        out["max_val"].append(
                            str(st.max) if st is not None and st.has_min_max
                            else None
                        )
            yield pd.DataFrame(out)

    files = spark.createDataFrame(
        [(os.path.join(sf_dir, "lineitem.parquet"),)], "path string"
    )
    return files.mapInPandas(read_footers, schema)


@register(
    "source_jsonl_roundtrip",
    oracle="""
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
FROM documents GROUP BY lang, source
""",
    tags=("source", "format"),
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL (newline-delimited JSON) source — the wire format of real
    log/crawl ingestion (every CommonCrawl/WET-adjacent pipeline's
    first hop is JSONL -> columnar): write documents out as JSON
    lines once per (session, sf), read them back through
    spark.read.schema(...).json (EXPLICIT schema — at 100 TB schema
    inference is a full extra pass over every byte and a silent
    type-drift hazard, so production readers always pin the schema),
    and aggregate. The oracle computes the same profile from the
    parquet truth, so the hash match proves the round trip preserved
    every row, every n_chars, and — via md5(text) distinct counts —
    the exact TEXT BYTES through JSON string escaping both ways (the
    part naive CSV round trips get wrong). JSON read is splittable by
    line like any text source; the scan parallelizes per file split."""
    from am_kinesis_pay_spark.paths import _artifact_lock, sf_tag

    docs = load(spark, sf_dir, "documents")
    path = scratch_path(spark, f"akps_jsonl_{sf_tag(sf_dir)}")
    with _artifact_lock():
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
                "overwrite"
            ).json(path)
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).json(path)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_distinct_texts"),
    )


@register(
    "source_xml_roundtrip",
    oracle="""
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
FROM documents GROUP BY lang, source
""",
    tags=("source", "format"),
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source — Spark 4's BUILT-IN XML data source (SPARK-44265
    folded the spark-xml package into core): write documents out as
    one <doc> element per row once per (session, sf), read them back
    with an EXPLICIT schema (same no-inference discipline as
    source_jsonl_roundtrip — inference on XML is an extra full pass
    AND row-tag-shape dependent), aggregate the same per-(lang,
    source) profile, and hash-match it against the parquet truth. The
    md5(text) distinct count proves the text survived XML entity
    escaping (&amp;/&lt;/whitespace handling) byte-for-byte — the
    classic XML round-trip hazard. The reader splits per FILE (XML is
    not line-splittable like JSONL — a row tag can span lines), so the
    write keeps Spark's natural output partitioning: many files =
    the parallelism unit at scale, the documented trade vs JSONL."""
    from am_kinesis_pay_spark.paths import _artifact_lock, sf_tag

    docs = load(spark, sf_dir, "documents")
    path = scratch_path(spark, f"akps_xml_{sf_tag(sf_dir)}")
    with _artifact_lock():
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            docs.select(
                "doc_id", "text", "lang", "source", "n_chars"
            ).write.mode("overwrite").format("xml").option(
                "rootTag", "docs"
            ).option("rowTag", "doc").save(path)
    back = (
        spark.read.schema(
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        )
        .format("xml")
        .option("rowTag", "doc")
        # default ignoreSurroundingSpaces=true TRIMS element text, so a
        # document with leading/trailing whitespace would desync the
        # md5 distinct count vs parquet truth (ADVICE r8) — disable it
        # so the byte-for-byte claim holds for any fixture content.
        .option("ignoreSurroundingSpaces", "false")
        .load(path)
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct(F.md5("text")).cast("bigint").alias(
            "n_distinct_texts"
        ),
    )


@register(
    "source_text_lines",
    oracle="""
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
FROM documents GROUP BY lang, source
""",
    tags=("source", "format"),
)
def source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-ORIENTED TEXT source (spark.read/write.text — the rawest
    format a pipeline meets: one record per line, no schema, no
    types; the log-file / TSV-dump shape): documents are serialized
    once per (session, sf) as tab-joined lines carrying doc_id, lang,
    source, n_chars, and md5(text) — the content HASH, not the text,
    because a line format cannot carry embedded newlines (that
    honesty is the difference vs source_jsonl_roundtrip, which
    escapes them) — read back as untyped lines, split + cast, and
    aggregated to the same per-(lang, source) profile hash-matched
    against parquet truth. Text is line-splittable, so read
    parallelism is byte-range splits like CSV/JSONL at 100 TB."""
    from am_kinesis_pay_spark.paths import _artifact_lock, sf_tag

    docs = load(spark, sf_dir, "documents")
    path = scratch_path(spark, f"akps_textlines_{sf_tag(sf_dir)}")
    with _artifact_lock():
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            docs.select(
                F.concat_ws(
                    "\t",
                    F.col("doc_id").cast("string"),
                    "lang",
                    "source",
                    F.col("n_chars").cast("string"),
                    F.md5("text"),
                ).alias("value")
            ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    back = lines.select(
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("source"),
        parts.getItem(3).cast("bigint").alias("n_chars"),
        parts.getItem(4).alias("text_md5"),
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("text_md5").cast("bigint").alias(
            "n_distinct_texts"
        ),
    )
