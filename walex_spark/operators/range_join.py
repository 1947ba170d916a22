"""Bucketized point-in-interval range join.

A naive `points JOIN intervals ON p BETWEEN lo AND hi` has no equi
key, so open-source Spark plans it as a BroadcastNestedLoopJoin —
guaranteed OOM/quadratic at scale (engines with native range-join
optimizations bucket internally; OSS Spark does not). This operator is
the standard scale decomposition:

  1. each interval explodes to the integer buckets it overlaps
     (`sequence(floor(lo/w), floor(hi/w))` — in-partition, no UDF);
  2. each point maps to its single bucket `floor(p/w)`;
  3. candidates meet via the bucket EQUI-join (the bucket is the
     shuffle/partition key, exactly like an LSH band);
  4. a residual `lo <= p <= hi` filter removes same-bucket misses.

Each (point, interval) pair meets at most once — the point has exactly
one bucket — so no post-join dedup is needed. Fan-out is bounded by
interval_span/bucket_width + 1 copies per interval: pick
``bucket_width`` near the TYPICAL interval span so intervals explode
to O(1) buckets and buckets stay balanced. Cost: one shuffle per side
on the bucket key; skewed buckets respond to AQE skew-join like any
equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["point_interval_join"]


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row with lo <= point <= hi.

    Returns all columns of both inputs (names must not collide).
    ``how``: 'inner' or 'left_semi' (points that hit any interval).
    Intervals with hi < lo are dropped (empty range), matching SQL
    BETWEEN semantics.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"point_interval_join how={how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    w = float(bucket_width)
    bucket_of = lambda c: F.floor(c / F.lit(w)).cast(T.LongType())  # noqa: E731
    iv = intervals.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(F.col(lo_col)), bucket_of(F.col(hi_col)))),
    )
    pt = points.withColumn("__bucket", bucket_of(F.col(point_col)))
    cond = (
        (pt["__bucket"] == iv["__bucket"])
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    )
    if how == "left_semi":
        return pt.join(iv, cond, "left_semi").drop("__bucket")
    return pt.join(iv, cond, "inner").drop("__bucket")
