"""Exactly-once sink via foreachBatch (SURVEY.md §1.1 #5: transactions
promoted with exactly-once semantics keyed on globalPaymentId).

``foreachBatch`` gives at-least-once batch delivery; idempotent MERGE
by key turns that into effectively-exactly-once. Without Delta's MERGE
(jar absent by design) the sink keeps a parquet table and rewrites it
with the anti-join + union upsert — same contract, copy-on-write.
At scale this is a Delta/Iceberg ``MERGE INTO`` on a table partitioned
by key range; the batch function body is the only thing that changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class IdempotentKeyedSink:
    """Parquet-backed upsert sink: new keys append, existing keys keep
    their first-written row (first-wins, the reference's uniq-payment
    contract kinesis-pay.php:515-518). Redelivered micro-batches are
    no-ops."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        order_col: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        # optional deterministic within-batch tie-break: keep the row
        # with the smallest order_col per key instead of an arbitrary
        # dropDuplicates survivor — required when replays must be
        # byte-identical (the corpus-ingest contract)
        self.order_col = order_col

    def _exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.order_col is not None:
            from pyspark.sql import Window, functions as F

            w = Window.partitionBy(*self.key_cols).orderBy(self.order_col)
            batch_df = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch_df = batch_df.dropDuplicates(self.key_cols)
        if self._exists():
            current = self.read()
            fresh = batch_df.join(
                current.select(*self.key_cols), self.key_cols, "left_anti"
            )
            merged = current.unionByName(fresh)
        else:
            merged = batch_df
        # collect-then-rewrite keeps the example self-contained; a real
        # deployment MERGEs into Delta/Iceberg instead of rewriting
        staged = merged.cache()
        staged.count()
        staged.write.mode("overwrite").parquet(self.path)
        staged.unpersist()

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(self.process_batch)
        )


class MergeKeyedSink:
    """Lakehouse-MERGE-shaped upsert sink: last-writer-wins by a version
    column, exactly-once under micro-batch redelivery.

    This is the production form of the reference's ``data()->set()->
    update()`` KV mutation (kinesis-pay.php:176,509) — the row-level
    MERGE that `sink_kv_upsert`'s anti-join+union recompute emulates
    for the oracle. On a real 100 TB deployment the batch body is ONE
    statement against Delta/Iceberg::

        MERGE INTO target t USING batch s ON <key_cols match>
        WHEN MATCHED AND s.<version> >= t.<version> THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *

    with exactly-once via the table format's transaction log keyed on
    ``(txnAppId=queryId, txnVersion=epochId)``. Those jars are absent
    by design, so this class emulates BOTH halves on plain parquet,
    preserving the contract exactly:

    - **MERGE**: copy-on-write — keep base rows that lose (no batch row
      for their key, or batch version older), union the batch winners.
      At scale, partition/cluster the table by key range so the rewrite
      touches only files whose key range intersects the batch (what
      Delta's file-skipping MERGE does); emulated here as a full-table
      rewrite of the same logical result.
    - **Transaction log**: each epoch commits a NEW snapshot directory
      ``v{epoch}`` and then a ``_commits/epoch-N`` marker; readers see
      the highest marked snapshot. A redelivered epoch (foreachBatch is
      at-least-once) short-circuits on the marker; a crash BETWEEN
      snapshot write and marker leaves the previous committed snapshot
      authoritative, and the redelivery rebuilds ``v{epoch}`` from it
      deterministically — no torn state is ever readable. Both replay
      paths are pinned in tests/test_merge_sink.py.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        version_col: str,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.version_col = version_col
        self.commits_dir = os.path.join(path, "_commits")

    def _marker(self, epoch_id: int) -> str:
        return os.path.join(self.commits_dir, f"epoch-{epoch_id}")

    def committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._marker(epoch_id))

    def last_committed_epoch(self) -> int | None:
        if not os.path.isdir(self.commits_dir):
            return None
        epochs = [
            int(name.split("-", 1)[1])
            for name in os.listdir(self.commits_dir)
            if name.startswith("epoch-")
        ]
        return max(epochs) if epochs else None

    def _snapshot_dir(self, epoch_id: int) -> str:
        return os.path.join(self.path, f"v{epoch_id}")

    def read(self) -> DataFrame:
        last = self.last_committed_epoch()
        if last is None:
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        return self.spark.read.parquet(self._snapshot_dir(last))

    def read_as_of(self, epoch_id: int) -> DataFrame:
        """Time-travel read: the highest committed snapshot whose epoch
        is <= ``epoch_id`` — Delta's ``VERSION AS OF`` / Iceberg's
        snapshot-id read against this sink's commit log. Uncommitted
        (markerless) snapshot dirs are invisible here exactly as they
        are to ``read()``."""
        if not os.path.isdir(self.commits_dir):
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        epochs = [
            int(name.split("-", 1)[1])
            for name in os.listdir(self.commits_dir)
            if name.startswith("epoch-")
        ]
        eligible = [e for e in epochs if e <= epoch_id]
        if not eligible:
            raise FileNotFoundError(
                f"no snapshot at or before epoch {epoch_id} under {self.path}"
            )
        return self.spark.read.parquet(self._snapshot_dir(max(eligible)))

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window, functions as F

        if self.committed(epoch_id):
            return  # redelivered epoch: exactly-once short-circuit
        # within-batch winner per key: highest version, deterministic
        w = Window.partitionBy(*self.key_cols).orderBy(
            F.col(self.version_col).desc()
        )
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        last = self.last_committed_epoch()
        if last is not None:
            base = self.spark.read.parquet(self._snapshot_dir(last))
            # WHEN MATCHED AND s.version >= t.version THEN UPDATE:
            # a base row survives unless a batch row with >= version
            # claims its key; batch rows that lose to a newer base row
            # are dropped. Keys are compared null-safely like MERGE ON.
            newer = base.select(
                *[F.col(k) for k in self.key_cols],
                F.col(self.version_col).alias("__base_v"),
            )
            winners = (
                batch.join(newer, self.key_cols, "left")
                .filter(
                    F.col("__base_v").isNull()
                    | (F.col(self.version_col) >= F.col("__base_v"))
                )
                .drop("__base_v")
            )
            survivors = base.join(
                winners.select(*self.key_cols), self.key_cols, "left_anti"
            )
            merged = survivors.unionByName(winners)
        else:
            merged = batch
        # snapshot-then-marker: the new version dir is invisible to
        # readers until the marker lands, so a crash here is harmless
        merged.write.mode("overwrite").parquet(self._snapshot_dir(epoch_id))
        os.makedirs(self.commits_dir, exist_ok=True)
        with open(self._marker(epoch_id), "w") as fh:
            fh.write("committed\n")

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(self.process_batch)
        )


class AdditiveRollupSink:
    """Exactly-once ADDITIVE rollup maintenance via foreachBatch — the
    streaming half of mv_incremental_refresh's IVM algebra: each epoch
    folds its per-key (count, decimal-sum) delta into the standing
    rollup snapshot. Unlike MergeKeyedSink (last-writer-wins, naturally
    idempotent per key+version), additive aggregates DOUBLE-COUNT under
    foreachBatch's at-least-once redelivery — so the epoch-marker
    short-circuit here is load-bearing correctness, not an
    optimization. Same snapshot-then-marker commit as MergeKeyedSink:
    a crash between snapshot write and marker leaves the previous
    committed snapshot authoritative and the redelivered epoch rebuilds
    v{epoch} deterministically from it.

    At 100 TB the batch body is one Delta/Iceberg MERGE with
    txnAppId/txnVersion and the rollup table is partitioned by key
    range so each epoch rewrites only touched partitions; emulated here
    on plain parquet with the contract preserved exactly. Generalizes
    the reference's running AMOUNT_PAID accumulation
    (kinesis-pay.php:509) from one invoice to a keyed rollup."""

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]):
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.commits_dir = os.path.join(path, "_commits")

    def _marker(self, epoch_id: int) -> str:
        return os.path.join(self.commits_dir, f"epoch-{epoch_id}")

    def committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._marker(epoch_id))

    def last_committed_epoch(self) -> int | None:
        if not os.path.isdir(self.commits_dir):
            return None
        epochs = [
            int(name.split("-", 1)[1])
            for name in os.listdir(self.commits_dir)
            if name.startswith("epoch-")
        ]
        return max(epochs) if epochs else None

    def _snapshot_dir(self, epoch_id: int) -> str:
        return os.path.join(self.path, f"v{epoch_id}")

    def read(self) -> DataFrame:
        last = self.last_committed_epoch()
        if last is None:
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        return self.spark.read.parquet(self._snapshot_dir(last))

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        if self.committed(epoch_id):
            return  # redelivered epoch: additive merge MUST NOT re-apply
        last = self.last_committed_epoch()
        # Monotonicity guard: read() resolves the current snapshot as the
        # MAX committed epoch, so an uncommitted epoch arriving BELOW the
        # high-water mark would fold its delta into v{earlier} while
        # readers keep returning v{later} — the delta would be silently
        # dropped. foreachBatch delivers epochs monotonically; this only
        # fires when process_batch is driven manually out of order, and
        # failing loudly is the correct behavior there.
        if last is not None and epoch_id < last:
            raise ValueError(
                f"out-of-order epoch {epoch_id}: epoch {last} is already "
                f"committed under {self.path}; an additive delta applied "
                "below the high-water mark would be invisible to read()"
            )
        delta = batch_df.groupBy(*self.key_cols).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
        )
        if last is not None:
            base = self.spark.read.parquet(self._snapshot_dir(last))
            merged = (
                base.unionByName(delta)
                .groupBy(*self.key_cols)
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("sum_v")
                    .cast("decimal(18,2)")
                    .alias("sum_v"),
                )
            )
        else:
            merged = delta.select(
                *self.key_cols,
                "n_events",
                F.col("sum_v").cast("decimal(18,2)").alias("sum_v"),
            )
        merged.write.mode("overwrite").parquet(self._snapshot_dir(epoch_id))
        os.makedirs(self.commits_dir, exist_ok=True)
        with open(self._marker(epoch_id), "w") as fh:
            fh.write("committed\n")

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(self.process_batch)
        )
