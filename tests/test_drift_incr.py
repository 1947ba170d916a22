"""Incremental drift monitor (streaming/drift_incr.py) contracts:
per-epoch emission equals the from-scratch epoch-vs-prefix PSI, epoch
replay is idempotent, compaction preserves the baseline, and epoch 0
emits nothing. The registry oracle (q_doc_drift_incr) spells the same
definition in SQL; these tests pin the pieces the oracle can't see —
state layout, replay, compaction."""

import pytest
from pyspark.sql import functions as F

from walex_spark.streaming.drift_incr import IncrementalDriftMonitor


def _docs(spark, specs):
    # specs: list of (doc_id, n_tokens)
    rows = [(i, " ".join(["w"] * n)) for i, n in specs]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_epoch0_emits_nothing_but_indexes(spark, tmp_path):
    mon = IncrementalDriftMonitor(str(tmp_path / "idx"))
    out = mon.process_batch(_docs(spark, [(1, 5), (2, 25)]), 0)
    assert out.count() == 0
    base = mon.baseline(spark)
    assert {r["bucket"]: r["n"] for r in base.collect()} == {0: 1, 2: 1}


def test_epoch_vs_prefix_hand_replica(spark, tmp_path):
    mon = IncrementalDriftMonitor(str(tmp_path / "idx"))
    # epoch 0: buckets {0: 2, 1: 1}; epoch 1: buckets {0: 1, 2: 2}
    mon.process_batch(_docs(spark, [(1, 3), (2, 7), (3, 12)]), 0)
    row = mon.process_batch(
        _docs(spark, [(4, 5), (5, 21), (6, 27)]), 1
    ).collect()[0].asDict()
    assert row["epoch"] == 1
    assert row["n_docs"] == 3 and row["baseline_docs"] == 3
    # grid (a=epoch, b=baseline): b0 (1,2), b1 (0,1), b2 (2,0)
    # sa=cb=3 so d = 3(a-b), ratios a/b exactly
    # b0: d=-3, hb=-half_bits(2)=-2 -> +6
    # b1: a=0 -> hb=-61, d=-3 -> +183 ; zero_buckets=1
    # b2: b=0 -> hb=+61, d=+6 -> +366 ; new_buckets=1
    assert row["buckets_hit"] == 2
    assert row["zero_buckets"] == 1 and row["new_buckets"] == 1
    assert row["psi_num"] == 6 + 183 + 366 == 555
    assert abs(row["psi_half_bits"] - 555 / 9) < 1e-12


def test_replay_idempotent(spark, tmp_path):
    mon = IncrementalDriftMonitor(str(tmp_path / "idx"))
    e0 = _docs(spark, [(i, 5 * (i % 4)) for i in range(1, 9)])
    e1 = _docs(spark, [(i, 7 * (i % 3)) for i in range(9, 15)])
    mon.process_batch(e0, 0)
    first = sorted(mon.process_batch(e1, 1).collect())
    # crash-and-replay of epoch 1: same rows, and the baseline must
    # not have been polluted by epoch 1's own earlier write
    replay = sorted(mon.process_batch(e1, 1).collect())
    assert first == replay


def test_compaction_preserves_emissions(spark, tmp_path):
    a = IncrementalDriftMonitor(str(tmp_path / "a"))
    b = IncrementalDriftMonitor(str(tmp_path / "b"), compact_every=1)
    epochs = [
        _docs(spark, [(1, 3), (2, 9)]),
        _docs(spark, [(3, 9), (4, 15)]),
        _docs(spark, [(5, 3), (6, 40)]),
    ]
    outs_a, outs_b = [], []
    for e, df in enumerate(epochs):
        outs_a += sorted(a.process_batch(df, e).collect())
        outs_b += sorted(b.process_batch(df, e).collect())
    assert outs_a == outs_b


def test_replay_after_compaction_folded_own_epoch(spark, tmp_path):
    """The r09 ADVICE interleaving: with compact_every>0, compaction
    runs at the start of process_batch, so a crashed-and-replayed
    epoch's e-dir can already be folded into c-<upto> BEFORE the
    replay. The ep-stamped by-value exclusion must still keep the
    replayed epoch's first-attempt rows out of its own baseline —
    a basename exclusion cannot see inside the compacted dir."""
    mon = IncrementalDriftMonitor(str(tmp_path / "idx"), compact_every=1)
    e0 = _docs(spark, [(i, 5 * (i % 4)) for i in range(1, 9)])
    e1 = _docs(spark, [(i, 7 * (i % 3)) for i in range(9, 15)])
    e2 = _docs(spark, [(i, 11 * (i % 5)) for i in range(15, 23)])
    mon.process_batch(e0, 0)
    mon.process_batch(e1, 1)
    first = sorted(mon.process_batch(e2, 2).collect())
    # crash after epoch 2's commit; the replayed process_batch first
    # compacts, folding e-2 into c-2, THEN recomputes the emission
    replay = sorted(mon.process_batch(e2, 2).collect())
    assert first == replay
    # and the baseline really excludes epoch 2 by value post-fold
    base = {
        r["bucket"]: r["n"]
        for r in mon.baseline(spark, exclude_epoch=2).collect()
    }
    full = {r["bucket"]: r["n"] for r in mon.baseline(spark).collect()}
    assert sum(base.values()) == 14  # epochs 0+1 only (8+6 docs)
    assert sum(full.values()) == 22


def test_legacy_index_rows_without_ep_stay_baseline(spark, tmp_path):
    """Pre-ep-column index dirs read back ep=NULL; they must coalesce
    to -1 (unconditionally older than any epoch) rather than vanish
    from — or pollute — a replayed epoch's exclusion."""
    from walex_spark.streaming.dedup_incr import _write_epoch

    idx = tmp_path / "idx"
    legacy = spark.createDataFrame(
        [(0, 3), (2, 1)], "bucket BIGINT, n BIGINT"
    )
    _write_epoch(legacy, str(idx / "hist"), 0)
    mon = IncrementalDriftMonitor(str(idx))
    # epoch 1 sees the legacy rows as baseline (had_baseline True)
    out = mon.process_batch(_docs(spark, [(1, 5), (2, 25)]), 1)
    row = out.collect()[0]
    assert row["baseline_docs"] == 4
    # and excluding epoch 1 by value leaves the legacy rows intact
    base = {
        r["bucket"]: r["n"]
        for r in mon.baseline(spark, exclude_epoch=1).collect()
    }
    assert base == {0: 3, 2: 1}


def test_drift_monitor_foreachbatch_stream_e2e(spark, tmp_path):
    """REAL Structured Streaming wiring for the drift monitor (the
    dedup twins' e2e shape): 3 drops -> maxFilesPerTrigger=1 ->
    foreachBatch(mon.process_batch); streamed emissions equal direct
    per-epoch calls."""
    import glob
    import os
    import shutil

    batches = [
        [(i, 5 * (i % 4)) for i in range(1, 9)],
        [(i, 7 * (i % 3)) for i in range(9, 15)],
        [(i, 11 * (i % 5)) for i in range(15, 23)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for e, b in enumerate(batches):
        staged = str(tmp_path / f"stage{e}")
        _docs(spark, b).coalesce(1).write.parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{e}.parquet")

    mon = IncrementalDriftMonitor(str(tmp_path / "sidx"))
    out_root = str(tmp_path / "out")

    def sink(batch_df, epoch_id):
        mon.process_batch(batch_df, epoch_id).write.mode(
            "overwrite"
        ).parquet(f"{out_root}/e-{epoch_id}")

    schema = _docs(spark, batches[0]).schema
    stream = (
        spark.readStream.schema(schema)
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

    streamed = sorted(
        spark.read.parquet(f"{out_root}/e-*").collect(),
        key=lambda r: r.epoch,
    )
    direct = IncrementalDriftMonitor(str(tmp_path / "didx"))
    rows = []
    for e, b in enumerate(batches):
        rows += direct.process_batch(_docs(spark, b), e).collect()
    assert streamed == sorted(rows, key=lambda r: r.epoch)
    assert len(streamed) == 2
