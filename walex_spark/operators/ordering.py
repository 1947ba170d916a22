"""Global total-order utilities: distributed row indexing and prefix
sums without a single-partition sort.

The naive spelling of "give every row its global position" is
``row_number() OVER (ORDER BY key)`` — a single-partition window that
serializes the whole table through one task (Spark even warns). These
operators use the classic two-level decomposition instead:

  1. ``repartitionByRange(key)`` + ``sortWithinPartitions`` — the one
     data-sized shuffle, the same one any global sort pays;
  2. per-partition metadata (row count / value sum, and the partition's
     first ``monotonically_increasing_id``) — a metadata-sized
     aggregate, one row per partition;
  3. exclusive offsets over that tiny frame (a driver-sized window),
     broadcast back and added to each row's LOCAL index/sum.

``global_sorted_index`` needs NO second data shuffle at all: after the
range sort, ``monotonically_increasing_id`` is documented to be
``partition_id * 2^33 + local_row_counter``, so ``mid - min(mid per
partition)`` IS the local rank — recovered with a broadcast join
instead of a pid-partitioned window. ``prefix_sums`` does need one
extra pid-hash exchange for its running-sum window; rows there should
be projected narrow before calling.

Determinism: range-boundary sampling only decides WHERE partitions
split, never the total order, so positions are reproducible run to
run as long as ``order_cols`` is a TOTAL order (callers must include
a unique tiebreaker — enforced nowhere, documented everywhere).

The deterministic-shuffle use case (training-data ordering at 100 TB):
order by ``md5(salt || id)`` and the index is a stable, seedable
global shuffle position — no RDD zipWithIndex, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "global_sorted_index",
    "prefix_sums",
    "prefix_sums_multi",
    "shuffle_key",
]


def shuffle_key(id_col: Column, salt: str = "shuffle") -> Column:
    """Deterministic pseudo-random sort key: md5(salt || id). Ordering
    by it is a seeded global shuffle (new salt = new permutation)."""
    return F.md5(F.concat(F.lit(salt), id_col.cast(T.StringType())))


def _ranged(df: DataFrame, order_cols: list, num_partitions: int | None):
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    return ranged.sortWithinPartitions(*cols), cols


def global_sorted_index(
    df: DataFrame,
    order_cols: list,
    index_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """All columns of ``df`` plus ``index_col`` = the row's 1-based
    global position under ``order_cols`` (which must be a total
    order). One data shuffle (the range sort); the rank is recovered
    from monotonically_increasing_id minus the partition's first id,
    plus broadcast per-partition offsets (module docstring)."""
    s, _ = _ranged(df, order_cols, num_partitions)
    with_mid = s.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    parts = with_mid.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt"), F.min("__mid").alias("__mid0")
    )
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = parts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w), F.lit(0))
    )
    return (
        with_mid.join(F.broadcast(offs), "__pid")
        .withColumn(
            index_col,
            (F.col("__off") + (F.col("__mid") - F.col("__mid0")) + F.lit(1))
            .cast(T.LongType()),
        )
        .drop("__pid", "__mid", "__cnt", "__mid0", "__off")
    )


def prefix_sums(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    cum_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """All columns of ``df`` plus ``cum_col`` = the EXCLUSIVE prefix
    sum of ``value_col`` under the ``order_cols`` total order (sum of
    all strictly-earlier rows; first row gets 0). Integer-exact for
    integral values at any parallelism.

    Costs the range shuffle plus one pid-hash exchange for the local
    running-sum window — project rows narrow before calling."""
    s, cols = _ranged(df, order_cols, num_partitions)
    s = s.withColumn("__pid", F.spark_partition_id())
    lw = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(value_col).over(lw), F.lit(0))
    parts = s.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    ow = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = parts.withColumn(
        "__off", F.coalesce(F.sum("__psum").over(ow), F.lit(0))
    )
    return (
        s.withColumn("__local", local)
        .join(F.broadcast(offs), "__pid")
        .withColumn(
            cum_col,
            (F.col("__off") + F.col("__local")).cast(T.LongType()),
        )
        .drop("__pid", "__local", "__psum", "__off")
    )


def prefix_sums_multi(
    df: DataFrame,
    order_cols: list,
    value_cols: list[str],
    cum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """``prefix_sums`` for SEVERAL value columns in ONE range shuffle:
    each ``cum_cols[i]`` = the exclusive prefix sum of
    ``value_cols[i]`` under the ``order_cols`` order. Unlike
    ``prefix_sums`` (which casts to long), each cum column keeps the
    natural ``sum`` type of its value column — integral values stay
    integer-exact, DECIMAL values stay decimal-exact (both are
    order-free additions, so results are bit-identical at any
    parallelism and in any oracle engine).

    ``order_cols`` need not be a TOTAL order when only the cum VALUES
    are consumed: rows tied on the full key are interchangeable inside
    an order-free sum, so every distinct-key row still sees exactly
    the set of strictly-earlier rows. (Positions, as in
    global_sorted_index, would need a tiebreaker; sums do not.)

    Same cost as prefix_sums: the range shuffle + one pid-hash
    exchange; the offsets frame is one row per partition (broadcast).
    """
    if len(value_cols) != len(cum_cols):
        raise ValueError("value_cols and cum_cols must align")
    s, cols = _ranged(df, order_cols, num_partitions)
    s = s.withColumn("__pid", F.spark_partition_id())
    lw = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    parts = s.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__psum{i}") for i, v in enumerate(value_cols)]
    )
    ow = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = parts.select(
        "__pid",
        *[
            F.sum(f"__psum{i}").over(ow).alias(f"__off{i}")
            for i in range(len(value_cols))
        ],
    )
    out = s
    for i, v in enumerate(value_cols):
        out = out.withColumn(f"__local{i}", F.sum(v).over(lw))
    out = out.join(F.broadcast(offs), "__pid")
    zero = F.lit(0)
    for i, c in enumerate(cum_cols):
        out = out.withColumn(
            c,
            F.coalesce(F.col(f"__off{i}"), zero)
            + F.coalesce(F.col(f"__local{i}"), zero),
        )
    drop = ["__pid"] + [f"__local{i}" for i in range(len(value_cols))] + [
        f"__off{i}" for i in range(len(value_cols))
    ]
    return out.drop(*drop)
