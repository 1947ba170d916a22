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

__all__ = ["point_interval_join", "interval_overlap_join"]


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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Join interval rows that OVERLAP: ``l_lo <= r_hi AND r_lo <= l_hi``
    (closed intervals), without a nested-loop plan.

    Both sides explode to the buckets they cover and candidates meet
    via the bucket equi-join, as in point_interval_join. An overlapping
    pair shares every bucket in the overlap region, so the duplicate
    matches are removed ALGEBRAICALLY: a match is kept only in bucket
    ``max(floor(l_lo/w), floor(r_lo/w))`` — the first bucket both
    intervals cover — which every overlapping pair shares exactly once.
    No post-join distinct, so nothing wide ever needs a dedup shuffle.

    Empty intervals (hi < lo) are dropped on both sides. Returns all
    columns of both inputs (names must not collide).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    w = float(bucket_width)
    bucket_of = lambda c: F.floor(c / F.lit(w)).cast(T.LongType())  # noqa: E731

    lv = left.filter(F.col(l_lo) <= F.col(l_hi)).withColumn(
        "__lb",
        F.explode(F.sequence(bucket_of(F.col(l_lo)), bucket_of(F.col(l_hi)))),
    )
    rv = right.filter(F.col(r_lo) <= F.col(r_hi)).withColumn(
        "__rb",
        F.explode(F.sequence(bucket_of(F.col(r_lo)), bucket_of(F.col(r_hi)))),
    )
    first_shared = F.greatest(bucket_of(F.col(l_lo)), bucket_of(F.col(r_lo)))
    cond = (
        (lv["__lb"] == rv["__rb"])
        & (F.col(l_lo) <= F.col(r_hi))
        & (F.col(r_lo) <= F.col(l_hi))
        & (lv["__lb"] == first_shared)
    )
    return lv.join(rv, cond, "inner").drop("__lb", "__rb")


def point_interval_aggregate(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    val_col: str,
    bucket_width: float,
    band_keys: list[str] | None = None,
) -> DataFrame:
    """COUNT/SUM of points inside each interval WITHOUT materializing
    the point-interval matches: the two-level (segment-tree) range
    aggregation.

    point_interval_join + groupBy produces one intermediate row per
    match — at a span/width ratio of s, that is s× the point count
    flowing through the join. Here each interval instead:

      1. takes its strictly-INTERIOR buckets' contributions from a
         per-bucket summary table (count + decimal sum, one narrow
         aggregate of the points) via the bucket equi-join — O(span/w)
         summary rows per interval, zero point rows;
      2. row-joins ONLY its two boundary buckets (residual
         lo <= p <= hi filter) — the only place point rows move;
      3. combines the two parts (integer counts and DECIMAL sums are
         order-free, so the split is exactly the unsplit aggregate).

    Returns intervals' ``band_keys`` (default: all their non-bound
    columns) with (n_matches, sum_val as DECIMAL(28,6)->double-ready
    decimal). Intervals with hi < lo are dropped.

    Exactness: the decomposition only reorders an integer count and a
    decimal sum — both order-free — so the result is bit-identical to
    the naive BETWEEN-join aggregate, and the ORACLE stays the naive
    spelling. Interior membership is decided purely on integer bucket
    ids (floor(x/w)) — no float boundary comparisons that could
    disagree with the residual filter.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    w = float(bucket_width)
    b_of = lambda c: F.floor(c / F.lit(w)).cast(T.LongType())  # noqa: E731
    dec = F.col(val_col).cast(T.DecimalType(18, 4))
    keys = band_keys or [
        c for c in intervals.columns if c not in (lo_col, hi_col)
    ]

    summaries = points.groupBy(b_of(F.col(point_col)).alias("__b")).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(dec).alias("__sum"),
    )
    iv = (
        intervals.filter(F.col(lo_col) <= F.col(hi_col))
        .withColumn("__lo_b", b_of(F.col(lo_col)))
        .withColumn("__hi_b", b_of(F.col(hi_col)))
    )
    interior = (
        iv.withColumn(
            "__b",
            F.explode(
                F.when(
                    F.col("__hi_b") - 1 >= F.col("__lo_b") + 1,
                    F.sequence(F.col("__lo_b") + 1, F.col("__hi_b") - 1),
                ).otherwise(F.array().cast(T.ArrayType(T.LongType())))
            ),
        )
        .join(summaries, "__b")
        .groupBy(*keys)
        .agg(
            F.sum("__cnt").alias("__n_int"),
            F.sum("__sum").alias("__s_int"),
        )
    )
    boundary = (
        iv.withColumn(
            "__b", F.explode(F.array_distinct(F.array("__lo_b", "__hi_b")))
        )
        .join(
            points.withColumn("__b", b_of(F.col(point_col))),
            "__b",
        )
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n_bnd"),
            F.sum(dec).alias("__s_bnd"),
        )
    )
    zero = F.lit(0).cast(T.DecimalType(18, 4))
    combined = boundary.join(interior, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col("__n_bnd"), F.lit(0))
            + F.coalesce(F.col("__n_int"), F.lit(0))
        ).cast(T.LongType()).alias("n_matches"),
        (
            F.coalesce(F.col("__s_bnd"), zero)
            + F.coalesce(F.col("__s_int"), zero)
        ).alias("sum_val"),
    )
    return combined.filter(F.col("n_matches") > 0)
