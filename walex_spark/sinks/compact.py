"""Small-file compaction: rewrite a parquet directory into
size-targeted, optionally key-clustered files.

A CDC pipeline's write pattern is the small-files pathology by
construction — every microbatch lands a few rows per bucket, and a
100 TB table accumulates millions of kilobyte files whose per-file
open/footer costs dominate scans long before data volume does. The
fix is periodic compaction, the same maintenance loop Delta/Iceberg
run (`OPTIMIZE` / `rewrite_data_files`), expressed here over plain
parquet:

  - target file count = ceil(bytes / target_file_bytes), measured from
    the actual input (not row counts — row width varies);
  - `repartitionByRange(key)` when a cluster key is given: files carry
    disjoint key ranges, so later key-predicate scans prune whole
    files via parquet min/max — compaction doubles as poor-man's
    clustering;
  - without a key, `coalesce` merges files WITHOUT a shuffle (the
    whole point of compaction is to be cheaper than a re-sort);
  - output lands in a fresh directory + atomic `os.replace` of a
    DONE marker is the caller's concern — this operator is the pure
    rewrite (ParquetStateSink owns the crash-safe publish protocol).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(path: str, target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """Inspect a parquet dir: file count, bytes, and the target file
    count a compaction would produce. Driver-side listing of METADATA
    only (no data read) — at 100 TB this is the object-store LIST the
    maintenance job does anyway."""
    files = []
    for root, _dirs, names in os.walk(path):
        files += [
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        ]
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_files": max(1, math.ceil(total / target_file_bytes)),
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    cluster_key: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``src`` into ``dst`` with size-targeted files.

    Returns the plan dict (pre-compaction stats + target count).
    With ``cluster_key`` the rewrite range-partitions on the key
    (files = disjoint key ranges → min/max pruning); without it the
    rewrite is a shuffle-free coalesce.
    """
    plan = plan_compaction(src, target_file_bytes)
    df: DataFrame = spark.read.parquet(src)
    n = plan["target_files"]
    out = (
        df.repartitionByRange(n, cluster_key)
        if cluster_key
        else df.coalesce(n)
    )
    out.write.mode("overwrite").parquet(dst)
    return plan
