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
