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
