"""as-of join semantics (operators/asof.py): backward inclusive match,
LEFT nulls, tolerance, and the one-shuffle plan contract."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from walex_spark.operators.asof import asof_join
from walex_spark.plans import audit


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def frames(spark):
    state = spark.createDataFrame(
        [
            (1, _ts(10, 0), 1.0, "a"),
            (1, _ts(11, 0), 2.0, "b"),
            (2, _ts(10, 30), 5.0, "c"),
        ],
        "uid long, ts timestamp, val double, tag string",
    )
    probes = spark.createDataFrame(
        [
            (100, 1, _ts(10, 30)),  # between state rows -> 10:00 match
            (101, 1, _ts(11, 0)),   # exactly at state time -> inclusive
            (102, 2, _ts(10, 0)),   # before any state -> NULL
            (103, 3, _ts(12, 0)),   # key with no state at all -> NULL
        ],
        "pid long, uid long, ts timestamp",
    )
    return probes, state


def test_backward_inclusive_left(frames):
    probes, state = frames
    out = {
        r.pid: r
        for r in asof_join(probes, state, on="uid").collect()
    }
    assert out[100].val_asof == 1.0 and out[100].tag_asof == "a"
    assert out[100].ts_asof == _ts(10, 0)
    # inclusive: state at exactly probe time matches
    assert out[101].val_asof == 2.0 and out[101].tag_asof == "b"
    # LEFT: probes with no preceding state survive with NULLs
    assert out[102].val_asof is None and out[102].ts_asof is None
    assert out[103].val_asof is None
    # probe columns unchanged
    assert sorted(out) == [100, 101, 102, 103]


def test_tolerance_nulls_stale_matches(frames):
    probes, state = frames
    out = {
        r.pid: r
        for r in asof_join(
            probes, state, on="uid", tolerance_seconds=600
        ).collect()
    }
    # 100 matched 10:00, probe 10:30 -> 1800 s stale -> nulled
    assert out[100].val_asof is None and out[100].ts_asof is None
    # 101 matched at 0 s -> kept
    assert out[101].val_asof == 2.0


def test_tolerance_with_numeric_time_columns(spark):
    """Epoch/long time columns work throughout asof_join; tolerance
    must too (the gap is then a number, not an INTERVAL)."""
    state = spark.createDataFrame(
        [(1, 1000, 1.0), (1, 2000, 2.0)], "uid long, ts long, val double"
    )
    probes = spark.createDataFrame(
        [(100, 1, 1300), (101, 1, 2100)], "pid long, uid long, ts long"
    )
    out = {
        r.pid: r
        for r in asof_join(
            probes, state, on="uid", tolerance_seconds=200
        ).collect()
    }
    # 100 matched ts=1000, gap 300 > 200 -> nulled
    assert out[100].val_asof is None and out[100].ts_asof is None
    # 101 matched ts=2000, gap 100 <= 200 -> kept
    assert out[101].val_asof == 2.0 and out[101].ts_asof == 2000


def test_no_payload_raises(spark, frames):
    probes, _ = frames
    bare = spark.createDataFrame([(1, _ts(9))], "uid long, ts timestamp")
    with pytest.raises(ValueError):
        asof_join(probes, bare, on="uid")


def test_single_shuffle_plan(frames):
    """The scale contract: one Exchange (the window partitionBy on the
    key) — same as a sort-merge join would pay, no broadcast, no
    row explosion."""
    probes, state = frames
    r = audit(asof_join(probes, state, on="uid"))
    assert r.shuffle_exchanges == 1
    assert r.broadcast_exchanges == 0


def test_asof_enrichment_in_streaming_microbatch(spark, tmp_path, frames):
    """The streaming face of the as-of join: each microbatch of a
    change stream is enriched point-in-time against a versioned state
    table inside foreachBatch (batch asof per epoch — the same pattern
    a feature-store lookup uses; pure stream-stream asof would need
    full history in state, which is exactly what the versioned table
    already is)."""
    import datetime as dt

    probes, state = frames
    src = str(tmp_path / "asof_src")
    probes.write.parquet(src)
    got = []

    def enrich(batch_df, epoch):
        out = asof_join(batch_df, state, on="uid")
        got.extend((r.pid, r.val_asof) for r in out.collect())

    q = (
        spark.readStream.schema(probes.schema)
        .parquet(src)
        .writeStream.foreachBatch(enrich)
        .option("checkpointLocation", str(tmp_path / "asof_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    by_pid = dict(got)
    assert by_pid[100] == 1.0 and by_pid[101] == 2.0
    assert by_pid[102] is None and by_pid[103] is None


def test_forward_direction(frames):
    """direction='forward' picks the nearest state AT or AFTER the
    probe (pandas merge_asof parity), inclusive, LEFT."""
    probes, state = frames
    out = {
        r.pid: r
        for r in asof_join(probes, state, on="uid", direction="forward").collect()
    }
    # probe 10:30 -> next state 11:00
    assert out[100].val_asof == 2.0 and out[100].ts_asof == _ts(11, 0)
    # exactly at 11:00 -> inclusive
    assert out[101].val_asof == 2.0
    # uid 2 probe 10:00 -> forward match at 10:30 (backward had NULL)
    assert out[102].val_asof == 5.0
    # key with no state at all stays NULL
    assert out[103].val_asof is None
    with pytest.raises(ValueError):
        asof_join(probes, state, on="uid", direction="nearest")


def test_forward_tolerance(frames):
    probes, state = frames
    out = {
        r.pid: r
        for r in asof_join(
            probes, state, on="uid", direction="forward", tolerance_seconds=600
        ).collect()
    }
    # 100 matched 11:00 from 10:30 -> 1800s ahead -> nulled
    assert out[100].val_asof is None
    # 101 matched at 0s -> kept
    assert out[101].val_asof == 2.0
