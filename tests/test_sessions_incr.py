"""Fold-equals-batch contract for the incremental sessionization twin
(streaming/sessions_incr.py): drive process_batch over time-ordered
epochs + flush, compare the union against the batch lag/running-sum
sessionization (the q_cdc_sessionize shape). Also pins replay
idempotence, the epoch-boundary stitch/close cases by hand, and
bounded live-dir counts under compaction."""

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from walex_spark.streaming.sessions_incr import IncrementalSessionIndex

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    # the _events loader idiom: nanos read as long under the legacy
    # flag, natively as TIMESTAMP_NTZ otherwise — normalize either to
    # a plain µs TimestampType column
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev.select("user_id", "event_id", "ts")


def _batch_sessions(ev):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.col("ts") - F.lag("ts").over(w)) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("__n", gap)
        .withColumn("session_no", F.sum("__n").over(run))
        .groupBy("user_id", "session_no")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _key(rows):
    return sorted((r.user_id, r.session_no, r.n_events) for r in rows)


def _time_epochs(ev, bounds):
    cuts = [F.lit(b).cast("timestamp") for b in bounds]
    parts = [ev.filter(F.col("ts") < cuts[0])]
    for a, b in zip(cuts, cuts[1:]):
        parts.append(ev.filter((F.col("ts") >= a) & (F.col("ts") < b)))
    parts.append(ev.filter(F.col("ts") >= cuts[-1]))
    return parts


BOUNDS = ["2024-01-11 00:00:00", "2024-01-21 00:00:00"]


def test_sessions_fold_equals_batch(spark, events, tmp_path):
    idx = IncrementalSessionIndex(str(tmp_path / "sidx"))
    emitted = []
    for e, b in enumerate(_time_epochs(events, BOUNDS)):
        emitted.extend(idx.process_batch(b, e).collect())
    emitted.extend(idx.flush(spark).collect())
    assert _key(emitted) == _key(_batch_sessions(events).collect())


def test_sessions_replay_idempotent(spark, events, tmp_path):
    idx = IncrementalSessionIndex(str(tmp_path / "sidx"))
    epochs = _time_epochs(events, BOUNDS)
    emitted = []
    for e, b in enumerate(epochs):
        out = idx.process_batch(b, e).collect()
        if e == 1:
            # crashed-and-replayed micro-batch: same emissions, same state
            replay = idx.process_batch(b, e).collect()
            assert _key(replay) == _key(out)
        emitted.extend(out)
    emitted.extend(idx.flush(spark).collect())
    assert _key(emitted) == _key(_batch_sessions(events).collect())


def test_sessions_stitch_and_close_by_hand(spark, tmp_path):
    def ts(m):
        return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m)

    e0 = [(1, 10, ts(0)), (1, 11, ts(10)), (2, 20, ts(5))]
    # user 1's epoch-1 head arrives 20 min after its open tail -> the
    # open session STITCHES and keeps growing; user 2's head arrives
    # 55 min after -> the open session CLOSES with its old count
    e1 = [(1, 12, ts(30)), (2, 21, ts(60)), (2, 22, ts(65))]
    schema = "user_id long, event_id long, ts timestamp"
    idx = IncrementalSessionIndex(str(tmp_path / "sidx"))
    out0 = idx.process_batch(spark.createDataFrame(e0, schema), 0).collect()
    assert out0 == []  # every first-epoch session still open
    out1 = idx.process_batch(spark.createDataFrame(e1, schema), 1).collect()
    assert _key(out1) == [(2, 1, 1)]  # only user 2's old session closed
    fin = _key(idx.flush(spark).collect())
    assert fin == [(1, 1, 3), (2, 2, 2)]  # stitched 3-event session


def test_sessions_compaction_bounds_dirs_and_preserves_fold(
    spark, events, tmp_path
):
    import os

    idx = IncrementalSessionIndex(str(tmp_path / "sidx"), compact_every=3)
    # 8 time-slice epochs across January
    bounds = [f"2024-01-{d:02d} 00:00:00" for d in range(5, 30, 4)]
    emitted = []
    for e, b in enumerate(_time_epochs(events, bounds)):
        emitted.extend(idx.process_batch(b, e).collect())
    emitted.extend(idx.flush(spark).collect())
    assert _key(emitted) == _key(_batch_sessions(events).collect())
    from walex_spark.streaming.dedup_incr import _epoch_dirs

    live = _epoch_dirs(os.path.join(str(tmp_path / "sidx"), "state"))
    assert len(live) <= 4  # compact_every + 1


def test_sessions_foreachbatch_stream_e2e(spark, events, tmp_path):
    """REAL Structured Streaming wiring (the winnow-twin test's shape):
    time-ordered parquet drops, readStream maxFilesPerTrigger=1,
    writeStream.foreachBatch(idx.process_batch); folded emissions +
    flush equal the batch sessionization."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    for e, b in enumerate(_time_epochs(events, BOUNDS)):
        staged = str(tmp_path / f"stage{e}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{e}.parquet")

    idx = IncrementalSessionIndex(str(tmp_path / "sidx"))
    out_root = str(tmp_path / "out")

    def sink(batch_df, epoch_id):
        idx.process_batch(batch_df, epoch_id).write.mode(
            "overwrite"
        ).parquet(f"{out_root}/e-{epoch_id}")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = spark.read.parquet(f"{out_root}/e-*").collect()
    emitted.extend(idx.flush(spark).collect())
    assert _key(emitted) == _key(_batch_sessions(events).collect())
