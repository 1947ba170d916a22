"""Bucketed table sink: pre-shuffle data ONCE at write time so every
downstream join/aggregation on the bucket key is exchange-free.

At 100 TB the dominant cost of a key-keyed pipeline (MERGE onto state,
changelog x snapshot joins, repeated per-key aggregations) is
re-shuffling the same fact table on the same key every query. Spark's
answer is bucketing: `bucketBy(N, key)` hash-partitions rows into N
files per partition at WRITE time and records the layout in the
catalog; a later join of two tables bucketed on the same key with the
same N plans a sort-merge join with ZERO Exchange on either side (the
scan itself reports the hash distribution).

The reference has no storage layer at all (walex routes events —
SURVEY.md §2.8); this is driver-mandated 100 TB infrastructure, and
`tests/test_bucketed.py` pins the exchange-free plan rather than
trusting the prose.

Operational notes baked into the API:
  - bucket count must MATCH across tables meant to co-join (Spark
    falls back to shuffling the mismatched side);
  - `sortBy` within buckets lets the SMJ skip its sort at read time;
  - bucketed output requires `saveAsTable` (the catalog carries the
    layout); plain `.parquet(path)` writes would lose it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.

    One full shuffle now; zero shuffles for every future join or
    aggregation keyed on ``bucket_cols`` against a co-bucketed table.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def cobucket(
    spark: SparkSession,
    frames: dict[str, tuple[DataFrame, list[str]]],
    num_buckets: int = 32,
) -> None:
    """Write several tables bucketed with IDENTICAL layout so they
    co-join exchange-free: ``frames`` maps table name -> (df, keys).
    A single bucket count is enforced across the set — mismatched
    counts silently reintroduce the shuffle on one side.
    """
    for table, (df, keys) in frames.items():
        write_bucketed(df, table, keys, num_buckets=num_buckets)
