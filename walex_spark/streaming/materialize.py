"""Streaming table-state materialization (SURVEY.md §2.9 R10, §4.2
custom-work item 6): maintain the current snapshot of each replicated
table by applying INSERT/UPDATE/DELETE changes from the envelope
stream, keyed by primary key, in LSN order.

The reference never materializes state (walex only routes events); this
is the engine's MERGE sink. On a real deployment the natural target is
a Delta/Iceberg `MERGE INTO` from `foreachBatch`; this container has
plain parquet only, so the sink implements the same contract with
hash-bucketed parquet and bucket-pruned rewrites:

  - state lives under ``path/bucket=K/`` with K = pmod(hash(pk), N);
  - each microbatch rewrites ONLY the buckets containing changed keys —
    at 100 TB the rewrite cost scales with the churn, not the table
    (the same access pattern a MERGE with bucketed clustering gives);
  - the merge itself is materialize_table_state over
    (existing ∪ batch): latest change per key wins by (lsn, change_idx),
    DELETE drops the key;
  - replay safety: a batch re-delivered after a crash merges
    idempotently (same keys, same LSNs → same winners), matching the
    checkpoint-replay contract of foreachBatch (R12).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walex_spark.operators.transforms import materialize_table_state


def _pk_expr(key_cols: list[str], record_col: str = "record"):
    return F.concat_ws(
        "\x00",
        *[
            F.coalesce(
                F.coalesce(F.col(record_col), F.col("old_record")).getItem(k),
                F.lit(""),
            )
            for k in key_cols
        ],
    )


@dataclass
class ParquetStateSink:
    """MERGE-into-parquet stand-in: current-state table fed by envelope
    microbatches via ``foreachBatch``."""

    path: str
    key_cols: list[str]
    num_buckets: int = 16
    record_col: str = "record"
    _spark: SparkSession | None = field(default=None, init=False, repr=False)

    # -- layout ------------------------------------------------------------
    def _bucket_dir(self, k: int) -> str:
        return os.path.join(self.path, f"bucket={k}")

    def _bucket_col(self):
        return F.pmod(F.hash(_pk_expr(self.key_cols, self.record_col)), F.lit(self.num_buckets))

    def state(self, spark: SparkSession) -> DataFrame:
        """Current snapshot (envelope-shaped rows, one per live key)."""
        dirs = [
            os.path.join(self.path, d)
            for d in (os.listdir(self.path) if os.path.isdir(self.path) else [])
            if d.startswith("bucket=")
        ]
        if not dirs:
            from walex_spark.model import CHANGE_ENVELOPE_SCHEMA

            return spark.createDataFrame([], CHANGE_ENVELOPE_SCHEMA)
        return spark.read.parquet(*dirs)

    # -- merge -------------------------------------------------------------
    def process_batch(self, env: DataFrame, epoch_id: int = 0) -> None:
        """Apply one microbatch: merge changed keys into their buckets.

        Only buckets referenced by the batch are read and rewritten —
        bucket pruning is what keeps the rewrite proportional to churn.
        """
        spark = env.sparkSession
        batch = env.withColumn("__bucket", self._bucket_col())
        agg = batch.agg(
            F.collect_set("__bucket").alias("bs"),
            F.max(F.col("op") == "TRUNCATE").alias("has_trunc"),
        ).collect()[0]
        changed = list(agg.bs)
        if not changed:
            return
        if agg.has_trunc:
            # TRUNCATE wipes a whole table; its rows live in every
            # bucket, so the merge must cover all existing ones
            live = {
                int(d.split("=", 1)[1])
                for d in (os.listdir(self.path) if os.path.isdir(self.path) else [])
                if d.startswith("bucket=")
            }
            changed = sorted(live | set(changed))
        existing_dirs = [
            self._bucket_dir(k) for k in changed if os.path.isdir(self._bucket_dir(k))
        ]
        merged_input = batch.drop("__bucket")
        if existing_dirs:
            merged_input = spark.read.parquet(*existing_dirs).unionByName(merged_input)
        new_state = materialize_table_state(
            merged_input, self.key_cols, self.record_col
        ).withColumn("__bucket", self._bucket_col())

        tmp_root = os.path.join(self.path, f".tmp-epoch-{epoch_id}")
        if os.path.isdir(tmp_root):
            shutil.rmtree(tmp_root)
        new_state.write.partitionBy("__bucket").parquet(tmp_root)
        for k in changed:
            live = self._bucket_dir(k)
            tmp = os.path.join(tmp_root, f"__bucket={k}")
            if os.path.isdir(live):
                shutil.rmtree(live)
            if os.path.isdir(tmp):
                os.rename(tmp, live)
            # bucket emptied entirely (all its keys deleted) → stays gone
        shutil.rmtree(tmp_root, ignore_errors=True)

    # -- streaming attach ---------------------------------------------------
    def attach(
        self,
        env_stream: DataFrame,
        checkpoint: str,
        trigger_seconds: float | None = None,
    ):
        """writeStream.foreachBatch(self.process_batch) with a checkpoint
        (durable-slot semantics: resume + idempotent re-merge)."""
        writer = env_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint
        )
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
