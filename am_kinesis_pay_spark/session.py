"""SparkSession factory tuned for the test harness and for scale.

Local harness: ``local[$SPARK_GRAFT_CPUS]`` single JVM. The configs
below are the ones that also matter on a 1000-executor cluster:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
UTC session timezone (oracle parity + cross-cluster determinism),
Arrow for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from am_kinesis_pay_spark.compat import ensure_protobuf

# Must run before the JVM spawns: TWS Python workers inherit
# PYTHONPATH + the protobuf version-check flag through the env
# (see compat.py). No-op when protobuf is pip-installed or absent.
ensure_protobuf()


def get_session(app_name: str = "am_kinesis_pay_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # ~1 partition per core locally; on a cluster this would be
        # 2-3x total cores — AQE coalesces the excess at runtime.
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-coalesce CACHED plan output too (default false is
        # pure plan-stability conservatism): iterative entries persist
        # hash-repartitioned frames (e.g. the classifier's featurized
        # X) so every round reuses the partitioning without an
        # exchange; with this off, the cache freezes the pre-AQE
        # partition COUNT and every downstream stage pays one task per
        # frozen partition regardless of data size. Scale-neutral: the
        # hash partitioning itself is preserved, only the post-AQE
        # partition count adapts — measured r12: text_classifier_train
        # 551->82 tasks / -20% wall at sf0.1, no plan regressed at
        # either 8 or 32 cores (OPTIMIZATION_r12.md §AQE).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as LONG and convert in tables.load().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4.1's async checkpoint-file checksum writer can park
        # RocksDB commit tasks forever when many state partitions
        # finish at once in a single local JVM (observed with the TWS
        # queries at 32 partitions: tasks stuck in
        # ChecksumCancellableFSDataOutputStream.close awaiting a
        # checksum future). It guards DFS checkpoint integrity, which
        # local-dir checkpoints don't need; keep default on clusters.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    )
    # Scale-dependent settings stay parameterised (optimization-round
    # contract): SPARK_GRAFT_EXTRA_CONF="k=v;k=v" overlays arbitrary
    # confs for A/B experiments and cluster profiles without touching
    # the local defaults the driver's bench measures.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in extra.split(";"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
