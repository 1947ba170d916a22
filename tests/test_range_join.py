"""point_interval_join semantics + plan contract
(operators/range_join.py)."""

import pytest
from pyspark.sql import functions as F

from walex_spark.operators.range_join import point_interval_join
from walex_spark.plans import audit, formatted_plan


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 99.5), (4, 250.0), (5, -3.0)],
        "pid long, v double",
    )
    intervals = spark.createDataFrame(
        [
            (10, 0.0, 10.0),     # catches 5.0, 10.0 (inclusive), -3? no
            (11, 9.0, 120.0),    # catches 10.0, 99.5
            (12, -10.0, -1.0),   # catches -3.0 (negative buckets)
            (13, 300.0, 200.0),  # empty range: hi < lo, never matches
        ],
        "iid long, lo double, hi double",
    )
    return points, intervals


def test_matches_equal_between_semantics(spark, frames):
    points, intervals = frames
    got = sorted(
        (r.pid, r.iid)
        for r in point_interval_join(points, intervals, "v", "lo", "hi", 50.0).collect()
    )
    want = sorted(
        (r.pid, r.iid)
        for r in points.join(
            intervals, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    )
    assert got == want
    assert (5, 12) in got  # negative values bucket correctly (floor, not trunc)
    assert all(i != 13 for _, i in got)


@pytest.mark.parametrize("width", [1.0, 7.3, 1000.0])
def test_width_invariance(frames, width):
    """Any bucket width gives the same rows — width is purely a
    performance knob."""
    points, intervals = frames
    got = sorted(
        (r.pid, r.iid)
        for r in point_interval_join(points, intervals, "v", "lo", "hi", width).collect()
    )
    base = sorted(
        (r.pid, r.iid)
        for r in point_interval_join(points, intervals, "v", "lo", "hi", 50.0).collect()
    )
    assert got == base


def test_left_semi(frames):
    points, intervals = frames
    out = point_interval_join(points, intervals, "v", "lo", "hi", 50.0, how="left_semi")
    assert sorted(r.pid for r in out.collect()) == [1, 2, 3, 5]
    assert out.columns == ["pid", "v"]


def test_plan_is_bucket_equi_join_not_nested_loop(frames):
    """The scale contract: the bucket key makes this a hash/sort-merge
    EQUI-join — a BroadcastNestedLoopJoin in the plan means the
    decomposition regressed to the quadratic theta join."""
    points, intervals = frames
    out = point_interval_join(points, intervals, "v", "lo", "hi", 50.0)
    tree = formatted_plan(out)
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree


def test_rejects_bad_args(frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        point_interval_join(points, intervals, "v", "lo", "hi", 0)
    with pytest.raises(ValueError):
        point_interval_join(points, intervals, "v", "lo", "hi", 50.0, how="full")


class TestIntervalOverlap:
    def _join(self, spark, left_rows, right_rows, w):
        from walex_spark.operators.range_join import interval_overlap_join

        lv = spark.createDataFrame(left_rows, "lid long, lo long, hi long")
        rv = spark.createDataFrame(right_rows, "rid long, rlo long, rhi long")
        out = interval_overlap_join(lv, rv, "lo", "hi", "rlo", "rhi", w)
        return sorted((r.lid, r.rid) for r in out.collect())

    def test_overlap_semantics(self, spark):
        left = [(1, 0, 10), (2, 20, 25), (3, 40, 40)]
        right = [
            (100, 10, 12),   # touches interval 1 at the endpoint
            (101, 5, 8),     # contained in 1
            (102, 26, 39),   # disjoint from all
            (103, 0, 100),   # covers everything
        ]
        got = self._join(spark, left, right, 4)
        assert got == [
            (1, 100), (1, 101), (1, 103), (2, 103), (3, 103),
        ]

    def test_pair_appears_once_across_buckets(self, spark):
        # both intervals span many buckets (w=2): the pair would match
        # in every shared bucket without the algebraic dedup
        got = self._join(spark, [(1, 0, 50)], [(9, 10, 60)], 2)
        assert got == [(1, 9)]

    def test_empty_intervals_dropped(self, spark):
        got = self._join(spark, [(1, 10, 5)], [(9, 0, 100)], 4)
        assert got == []

    def test_plan_is_equi_join(self, spark):
        from walex_spark.operators.range_join import interval_overlap_join

        lv = spark.range(100).select(
            F.col("id").alias("lid"), F.col("id").alias("lo"),
            (F.col("id") + 5).alias("hi"),
        )
        rv = spark.range(100).select(
            F.col("id").alias("rid"), (F.col("id") * 2).alias("rlo"),
            (F.col("id") * 2 + 3).alias("rhi"),
        )
        plan = (
            interval_overlap_join(lv, rv, "lo", "hi", "rlo", "rhi", 8.0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    def test_validates_width(self, spark):
        from walex_spark.operators.range_join import interval_overlap_join

        df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
        with pytest.raises(ValueError):
            interval_overlap_join(df, df, "b", "c", "b", "c", 0)


def test_point_interval_aggregate_equals_join_aggregate(spark):
    """The event-differencing decomposition must equal the
    join-then-aggregate result exactly, including single-point bands,
    hi<lo drops, bound-equal-to-point ties (closed-interval
    inclusivity on both edges), and bands overhanging the data."""
    from pyspark.sql import functions as F
    from walex_spark.operators.range_join import (
        point_interval_aggregate,
        point_interval_join,
    )

    points = spark.createDataFrame(
        # multiples of 3 plus DUPLICATED values at 12 and 90 — ties on
        # the sort key must all land on the correct side of a probe
        [(float(x),) for x in range(0, 200, 3)] + [(12.0,), (90.0,)],
        "p double",
    )
    bands = spark.createDataFrame(
        [
            (1, 10.0, 90.0),    # wide; hi ties a (duplicated) point
            (2, 14.0, 16.0),    # single interior point
            (3, 150.0, 149.0),  # empty range -> dropped
            (4, 190.0, 400.0),  # overhangs the data
            (5, 12.0, 15.0),    # lo ties a duplicated point value
        ],
        "band_id long, lo double, hi double",
    )
    got = {
        r.band_id: (r.n_matches, float(r.sum_val))
        for r in point_interval_aggregate(
            points, bands, "p", "lo", "hi", "p"
        ).collect()
    }
    joined = (
        point_interval_join(points, bands, "p", "lo", "hi", 7.0)
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p").cast("decimal(18,4)")).alias("s"),
        )
    )
    expected = {r.band_id: (r.n, float(r.s)) for r in joined.collect()}
    assert got == expected
    assert 3 not in got and got[2][0] == 1  # p=15 only


def test_materializing_join_steers_to_aggregate_path():
    """The r08 verdict graded q_range_join_bands weak-by-design
    (output-cardinality-bound); the contract is that users who only
    need per-interval aggregates are STEERED to
    point_interval_aggregate. Pin the steering note so a docstring
    rewrite can't silently drop the guard."""
    from walex_spark import queries as Q
    from walex_spark.operators import range_join as rj

    doc = rj.point_interval_join.__doc__
    assert "SCALE GUARD" in doc
    assert "point_interval_aggregate" in doc
    qdoc = Q.q_range_join_bands.__doc__
    assert "q_range_agg_twolevel" in qdoc
