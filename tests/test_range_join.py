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
