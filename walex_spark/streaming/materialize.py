"""Streaming table-state materialization (SURVEY.md §2.9 R10, §4.2
custom-work item 6): maintain the current snapshot of each replicated
table by applying INSERT/UPDATE/DELETE changes from the envelope
stream, keyed by primary key, in LSN order.

The reference never materializes state (walex only routes events); this
is the engine's MERGE sink. On a real deployment the natural target is
a Delta/Iceberg `MERGE INTO` from `foreachBatch`; this container has
plain parquet only, so the sink implements the same contract with
hash-bucketed parquet and bucket-pruned rewrites:

  - state lives in versioned epoch dirs ``path/v-<epoch>-<nonce>/
    bucket=K/`` with K = pmod(hash(pk), N); a MANIFEST file maps each
    bucket to the version dir holding its current data;
  - each microbatch rewrites ONLY the buckets containing changed keys —
    at 100 TB the rewrite cost scales with the churn, not the table
    (the same access pattern a MERGE with bucketed clustering gives);
  - the merge itself is materialize_table_state over
    (existing ∪ batch): latest change per key wins by (lsn, change_idx),
    DELETE drops the key, TRUNCATE tombstones its whole table;
  - the swap is ATOMIC: new buckets are fully written before one
    os.replace() flips the MANIFEST. A crash at any point leaves the
    previous manifest — and therefore a complete, single-epoch
    snapshot — readable (the same commit protocol as a Delta/Iceberg
    version pointer). Orphaned version dirs from crashed attempts are
    garbage-collected on the next successful publish;
  - replay safety: a batch re-delivered after a crash merges
    idempotently (same keys, same LSNs → same winners), matching the
    checkpoint-replay contract of foreachBatch (R12).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
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
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST")

    def _read_manifest(self) -> dict[str, str]:
        """bucket id (str) → version dir name holding its current data."""
        try:
            with open(self._manifest_path) as f:
                return json.load(f)["buckets"]
        except FileNotFoundError:
            return {}

    def _bucket_dirs(self, manifest: dict[str, str], buckets) -> list[str]:
        return [
            os.path.join(self.path, manifest[str(k)], f"__bucket={k}")
            for k in buckets
            if str(k) in manifest
        ]

    def _bucket_col(self):
        return F.pmod(F.hash(_pk_expr(self.key_cols, self.record_col)), F.lit(self.num_buckets))

    def state(self, spark: SparkSession) -> DataFrame:
        """Current snapshot (envelope-shaped rows, one per live key)."""
        manifest = self._read_manifest()
        dirs = self._bucket_dirs(manifest, sorted(int(b) for b in manifest))
        if not dirs:
            from walex_spark.model import CHANGE_ENVELOPE_SCHEMA

            return spark.createDataFrame([], CHANGE_ENVELOPE_SCHEMA)
        return spark.read.parquet(*dirs)

    # -- merge -------------------------------------------------------------
    def process_batch(self, env: DataFrame, epoch_id: int = 0) -> None:
        """Apply one microbatch: merge changed keys into their buckets.

        Only buckets referenced by the batch are read and rewritten —
        bucket pruning is what keeps the rewrite proportional to churn.
        The publish is a single atomic manifest flip (see module doc).
        """
        spark = env.sparkSession
        batch = env.withColumn("__bucket", self._bucket_col())
        agg = batch.agg(
            F.collect_set("__bucket").alias("bs"),
            F.max(F.col("op") == "TRUNCATE").alias("has_trunc"),
        ).collect()[0]
        changed = sorted(agg.bs)
        if not changed:
            return
        manifest = self._read_manifest()
        if agg.has_trunc:
            # TRUNCATE wipes a whole table; its rows live in every
            # bucket, so the merge must cover all live ones
            changed = sorted({int(b) for b in manifest} | set(changed))
        existing_dirs = self._bucket_dirs(manifest, changed)
        merged_input = batch.drop("__bucket")
        if existing_dirs:
            merged_input = spark.read.parquet(*existing_dirs).unionByName(merged_input)
        new_state = materialize_table_state(
            merged_input, self.key_cols, self.record_col
        ).withColumn("__bucket", self._bucket_col())

        vdir = f"v-{epoch_id}-{uuid.uuid4().hex[:8]}"
        new_state.write.partitionBy("__bucket").parquet(os.path.join(self.path, vdir))
        self._publish(manifest, changed, vdir)

    def _publish(self, manifest: dict[str, str], changed: list[int], vdir: str) -> None:
        """Flip the manifest atomically, then GC unreferenced versions.

        Everything before the os.replace is invisible to readers; a
        crash anywhere leaves the previous single-epoch state intact
        (the kill-mid-swap test pins this).
        """
        new_manifest = {
            b: v for b, v in manifest.items() if int(b) not in set(changed)
        }
        for k in changed:
            if os.path.isdir(os.path.join(self.path, vdir, f"__bucket={k}")):
                new_manifest[str(k)] = vdir
            # bucket emptied entirely (all its keys deleted) → drops out
        tmp = f"{self._manifest_path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"buckets": new_manifest}, f)
        os.replace(tmp, self._manifest_path)
        # best-effort GC: version dirs no longer referenced (including
        # leftovers of crashed publishes) — a crash here is harmless
        live = set(new_manifest.values())
        for d in os.listdir(self.path):
            if d.startswith("v-") and d not in live:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

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
