"""Fixture-table loaders (TESTDATA.md / FIXTURES.md §A).

``spark.read.parquet`` gives the vectorized columnar scan with
predicate pushdown and column pruning for free; every query should go
through these helpers so the scan path is uniform.

At the 100 TB design point these tables would be date/key-partitioned
parquet (or Iceberg) directories; the loader signature (name → path)
is the only thing that changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # The driver may hand us a session without this config; it is
        # runtime-settable, so pin it here rather than in the builder.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the footer, surfaced as LONG nanos
        # via spark.sql.legacy.parquet.nanosAsLong (session.py); convert
        # to a first-class TIMESTAMP at microsecond precision — the same
        # truncation DuckDB applies when it hands TIMESTAMP_NS to clients.
        # Type-gated so re-written events tables (already TIMESTAMP)
        # load unchanged. Integer DIV, not `/` — float division loses
        # microseconds at 1.7e18 ns (> 2^53).
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Spark round-trips a TIMESTAMP_LTZ write back as TIMESTAMP_NTZ when
    # the footer lacks isAdjustedToUTC (inferTimestampNTZ path). Queries
    # use unix_millis()/window() which require TIMESTAMP, so normalize
    # every NTZ column to the session-zone TIMESTAMP flavor here — one
    # timestamp type engine-wide, whichever writer produced the file.
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a frame to the cluster's core count —
    ONLY when its current parallelism is lower (r11 OPT, guide §2.5
    'input skew: one huge unsplittable file ... repartition immediately
    after the read').

    Why: several CPU-heavy map passes (per-character md5 boundary
    detection, shingle explosion, codec decode) sit directly on a scan
    whose split count is the FILE count at small inputs — the fixture
    tables are one parquet file each, so the expensive stage ran on
    ONE core of local[32]. At 100 TB the same scan yields thousands of
    splits (>= defaultParallelism), the gate is false, and no
    repartition — and no extra shuffle of the heavy payload — ever
    happens; this helper is deliberately NOT a tuning constant but the
    session's own parallelism."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
