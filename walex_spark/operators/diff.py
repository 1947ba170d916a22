"""Snapshot diff: reconcile two versions of a keyed table.

CDC consumers need an anti-entropy pass — "what changed between the
snapshot I materialized yesterday and today's?" — both to audit the
replication path end-to-end and to backfill a sink that missed events.
``table_diff`` classifies every key as added / removed / changed
(unchanged keys are dropped) with the per-column change count.

Plan shape: ONE full-outer sort-merge join on the key — both sides
shuffle exactly once on the same key, so on bucketed/co-partitioned
snapshots (sinks/bucketed.py) the exchange disappears entirely.
Column comparison is null-safe JVM expressions (`IS DISTINCT FROM`),
no Python in the row path; the output is narrow (key + status +
count), never the full payload. At 100 TB this is the shape you want:
the only wide rows live inside the join, and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keys present only in ``new`` are added, only in ``old`` removed,
    in both with any compared column differing (null-safe) changed.

    Returns ``keys + (status, n_changed_cols)``; unchanged keys are
    filtered out so the result is proportional to the drift, not the
    table.
    """
    if not keys:
        raise ValueError("table_diff needs at least one key column")
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    missing = [c for c in compare_cols if c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from new: {missing}")

    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, on=keys, how="full_outer")

    diffs = [
        (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))).cast(T.IntegerType())
        for c in compare_cols
    ]
    n_changed = sum(diffs[1:], diffs[0]) if diffs else F.lit(0)

    status = (
        F.when(F.col("__in_old").isNull(), F.lit(STATUS_ADDED))
        .when(F.col("__in_new").isNull(), F.lit(STATUS_REMOVED))
        .when(n_changed > 0, F.lit(STATUS_CHANGED))
    )
    return (
        j.select(
            *keys,
            status.alias("status"),
            F.when(status == STATUS_CHANGED, n_changed)
            .otherwise(F.lit(0))
            .cast(T.IntegerType())
            .alias("n_changed_cols"),
        )
        .filter(F.col("status").isNotNull())
    )


def shard_manifest(
    df: DataFrame,
    key_col: str,
    hash_cols: list[str],
    shard_size: int = 100,
) -> DataFrame:
    """Shard-level integrity manifest: one row per fixed-width key
    shard with count, key bounds, and an order-free content hash —
    the artifact two sides of a 100 TB migration (or a CDC source and
    its materialized sink) exchange to find divergent shards WITHOUT
    comparing rows: only shards whose manifest rows differ get the
    expensive row-level ``table_diff`` pass.

    The content hash is the bitwise XOR of per-row 60-bit hashes
    (first 15 hex chars of md5 over '|'-joined ``hash_cols``) — XOR
    is commutative/associative, so the fold is exact at any
    parallelism and any row order, and md5 makes it engine-portable
    (DuckDB reproduces it bit-for-bit; Spark's xxhash64 wouldn't).
    NULL handling: concat_ws skips NULLs, so a NULL and an empty
    string collide — callers with nullable hash_cols should coalesce
    to a sentinel first (the registry's tables are non-null).

    Returns (shard, n_rows, min_key, max_key, xor_hash) ordered by
    shard. Scale shape: ONE map-side-combinable aggregate keyed on
    key div shard_size — shard count scales with data, each shard's
    state is 5 longs; no joins, no windows, nothing collected.
    """
    row_hash = F.conv(
        F.substring(F.md5(F.concat_ws("|", *hash_cols)), 1, 15), 16, 10
    ).cast(T.LongType())
    shard = F.expr(f"{key_col} div {int(shard_size)}").cast(T.LongType())
    return (
        df.select(
            shard.alias("shard"),
            F.col(key_col).alias("__k"),
            row_hash.alias("__h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_rows"),
            F.min("__k").cast(T.LongType()).alias("min_key"),
            F.max("__k").cast(T.LongType()).alias("max_key"),
            F.expr("bit_xor(__h)").cast(T.LongType()).alias("xor_hash"),
        )
        .orderBy("shard")
    )


def manifest_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Compare two shard manifests (``shard_manifest`` outputs): one
    row per DIVERGENT shard with a status — the cheap first pass of a
    migration check; only shards this returns need the row-level
    ``table_diff``. A shard diverges when present on one side only,
    or when any statistic (count, bounds, XOR content hash) differs.

    Returns (shard, status ∈ {added, removed, changed}, n_rows_a,
    n_rows_b, hash_match) ordered by shard. One full-outer equi-join
    of two manifest-sized (i.e. corpus/shard_size-row) frames — at
    100 TB that is thousands of rows, not billions.
    """
    pa = a.select(
        F.col("shard"),
        F.col("n_rows").alias("n_rows_a"),
        F.col("min_key").alias("min_a"),
        F.col("max_key").alias("max_a"),
        F.col("xor_hash").alias("xor_a"),
    )
    pb = b.select(
        F.col("shard"),
        F.col("n_rows").alias("n_rows_b"),
        F.col("min_key").alias("min_b"),
        F.col("max_key").alias("max_b"),
        F.col("xor_hash").alias("xor_b"),
    )
    j = pa.join(pb, "shard", "full_outer")
    status = (
        F.when(F.col("n_rows_a").isNull(), F.lit(STATUS_ADDED))
        .when(F.col("n_rows_b").isNull(), F.lit(STATUS_REMOVED))
        .when(
            (F.col("n_rows_a") != F.col("n_rows_b"))
            | (F.col("min_a") != F.col("min_b"))
            | (F.col("max_a") != F.col("max_b"))
            | (F.col("xor_a") != F.col("xor_b")),
            F.lit(STATUS_CHANGED),
        )
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            "shard",
            "status",
            "n_rows_a",
            "n_rows_b",
            # coalesced to False for one-sided shards: added/removed
            # rows have a NULL xor on one side, and a NULL hash_match
            # would silently drop them from callers filtering
            # hash_match == False
            F.coalesce(
                F.col("xor_a") == F.col("xor_b"), F.lit(False)
            ).alias("hash_match"),
        )
        .orderBy("shard")
    )
