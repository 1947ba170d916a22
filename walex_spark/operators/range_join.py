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

from walex_spark.operators.ordering import prefix_sums_multi

__all__ = [
    "point_interval_join",
    "interval_overlap_join",
    "point_interval_aggregate",
]


def _spread_probe(bucketed: DataFrame, source: DataFrame) -> DataFrame:
    """Decouple the probe stage's parallelism from the source's file
    layout. The bucket equi-join multiplies its output (one row per
    in-band interval), so when the probe side is a thin file-backed
    scan — fewer files than cluster parallelism, e.g. a single-row-group
    export, which Spark cannot split below row-group granularity — the
    whole join + downstream partial aggregation runs in those few tasks
    at ANY core count. One narrow hash repartition on the bucket key
    (the join key: deterministic, skew bounded by the value histogram)
    restores parallelism. Guarded by the source's file count so a real
    table (thousands of splits at 100 TB) never pays an extra exchange;
    non-file-backed inputs (already-shuffled or synthesized frames) are
    left untouched."""
    try:
        files = source.inputFiles()
    except Exception:  # pragma: no cover - defensive: layout probe only
        return bucketed
    par = source.sparkSession.sparkContext.defaultParallelism
    if 0 < len(files) < par:
        return bucketed.repartition(par, F.col("__bucket"))
    return bucketed


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

    SCALE GUARD — output cardinality: this operator MATERIALIZES every
    (point, interval) match row. When both sides densify k x, match
    count can grow ~k^2 regardless of plan quality (q_range_join_bands
    measures ~100x matches at the 10x data step — a property of the
    OUTPUT, shared by the SQL oracle). Reach for this operator only
    when the matches themselves are the product. If the matches feed
    an aggregate (count/sum/min/max per interval), use
    ``point_interval_aggregate`` instead: event-differencing prefix
    sums compute the same aggregates in O(points + intervals) rows
    without materializing a single match (measured 1.71x at the 10x
    step vs this operator's ~7x).
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
    pt = _spread_probe(pt, points)
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
    band_keys: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """COUNT/SUM of points inside each interval WITHOUT materializing
    the point-interval matches: event-differencing over ONE global
    prefix sum (the distributed Fenwick/merge-path answer).

    Every interval becomes two EVENTS on the value axis — a lo probe
    that must see the count/sum of points strictly below lo, and a hi
    probe that must see points at or below hi. Points and events
    co-sort by (value, tag) with tags ordered lo-event < point <
    hi-event, so each probe's EXCLUSIVE prefix (ordering.py::
    prefix_sums_multi — range shuffle + per-partition running window +
    broadcast partition offsets) is exactly its predicate's point set.
    interval answer = hi-prefix − lo-prefix; groupBy(band_keys) sums
    the signed probes.

    Why not the bucketized two-level (interior-summary + boundary-row)
    form this replaced: its boundary term joins each interval's edge
    buckets to the POINT ROWS inside them, which scales as
    interval_density × point_density — measured 71× wall at a 10×
    both-sides data step (SURVEY §14, r07 scale checkpoint). The
    event form moves each point and each probe through the shuffle
    exactly once: linear in rows, no multiplicative term, no
    bucket_width to mistune. Skew: equal VALUES land in one range
    partition (any global sort's exposure) — bounded by the value
    histogram, not by interval×point products.

    Returns intervals' ``band_keys`` (default: all their non-bound
    columns) with (n_matches, sum_val as a decimal ready for the
    caller's DECIMAL(28,6)->double normalization). Intervals with
    hi < lo are dropped; keys whose intervals match nothing are
    dropped (inner-join groupBy parity).

    Exactness: the decomposition only regroups an integer count and a
    DECIMAL(18,4) sum — both order-free — so the result is
    bit-identical to the naive BETWEEN-join aggregate, and the ORACLE
    stays the naive spelling. Points and bounds are compared under
    Spark's own union type coercion, which this function REQUIRES to
    be exact (decimal/integral widening): mixing a float/double side
    with a decimal/integral side would coerce the union to DOUBLE,
    where values beyond 2^53 (or non-representable decimals) silently
    re-order against the probes — such mixes raise ValueError instead
    of voiding the contract silently. All-float inputs are fine (the
    comparison is then the same float order the naive join uses).
    """
    keys = band_keys or [
        c for c in intervals.columns if c not in (lo_col, hi_col)
    ]
    axis_types = [
        points.schema[point_col].dataType,
        intervals.schema[lo_col].dataType,
        intervals.schema[hi_col].dataType,
    ]
    exact = [isinstance(t, (T.DecimalType, T.IntegralType)) for t in axis_types]
    if any(exact) and not all(exact):
        raise ValueError(
            "point_interval_aggregate: value-axis types mix exact "
            f"(decimal/integral) and floating ({axis_types}); the union "
            "would coerce to DOUBLE and break the bit-exactness contract. "
            "Cast all three to a common decimal/integral type first."
        )
    dec = T.DecimalType(18, 4)
    zero_dec = F.lit(0).cast(dec)
    iv = intervals.filter(F.col(lo_col) <= F.col(hi_col))

    def _key_nulls(src: DataFrame):
        return [
            F.lit(None).cast(src.schema[k].dataType).alias(k) for k in keys
        ]

    pts = points.filter(F.col(point_col).isNotNull()).select(
        F.col(point_col).alias("__v"),
        F.lit(0).alias("__tag"),
        F.lit(1).cast(T.LongType()).alias("__cnt"),
        F.col(val_col).cast(dec).alias("__val"),
        *_key_nulls(intervals),
        F.lit(0).alias("__sign"),
    )

    def _probe(bound_col: str, tag: int, sign: int) -> DataFrame:
        return iv.select(
            F.col(bound_col).alias("__v"),
            F.lit(tag).alias("__tag"),
            F.lit(0).cast(T.LongType()).alias("__cnt"),
            zero_dec.alias("__val"),
            *keys,
            F.lit(sign).alias("__sign"),
        )

    events = pts.unionByName(_probe(lo_col, -1, -1)).unionByName(
        _probe(hi_col, 1, 1)
    )
    pre = prefix_sums_multi(
        events,
        ["__v", "__tag"],
        ["__cnt", "__val"],
        ["__ccnt", "__cval"],
        num_partitions=num_partitions,
    )
    combined = (
        pre.filter(F.col("__tag") != 0)
        .groupBy(*keys)
        .agg(
            F.sum(F.col("__sign") * F.col("__ccnt"))
            .cast(T.LongType())
            .alias("n_matches"),
            F.sum(
                F.when(F.col("__sign") > 0, F.col("__cval")).otherwise(
                    -F.col("__cval")
                )
            ).alias("sum_val"),
        )
    )
    return combined.filter(F.col("n_matches") > 0)
