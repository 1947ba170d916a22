"""Incremental PII-rate monitor (streaming/pii_incr.py) contracts:
per-epoch emission equals the from-scratch epoch-vs-prefix comparison,
epoch 0 emits nothing, replay is idempotent INCLUDING the
replay-after-own-compaction interleaving (the r09 drift-twin ADVICE
class, guarded by value-level ep exclusion from day one), and
compaction preserves emissions."""

from walex_spark.streaming.pii_incr import IncrementalPIIMonitor


def _docs(spark, specs):
    # specs: (doc_id, text)
    return spark.createDataFrame(list(specs), ["doc_id", "text"])


E0 = [
    (1, "plain words only"),
    (2, "mail a@b.io and x@y.dev here"),          # 2 emails
    (3, "visit http://a.io/x now"),               # 1 url
]
E1 = [
    (4, "call 555-123-4567 and 555-987-6543"),    # 2 phones
    (5, "mail c@d.net today"),                    # 1 email
]
E2 = [
    (6, "ssn 123-45-6789 card 4111111111111111"),  # 1 ssn + 1 cc
    (7, "host 10.0.0.1 mail e@f.org"),             # 1 ip + 1 email
    (8, "nothing sensitive"),
]


def test_epoch0_emits_nothing_but_indexes(spark, tmp_path):
    mon = IncrementalPIIMonitor(str(tmp_path / "idx"))
    out = mon.process_batch(_docs(spark, E0), 0)
    assert out.count() == 0
    base = {
        r.pii_class: (r.hits, r.docs_with, r.n_docs)
        for r in mon.baseline(spark).collect()
    }
    assert base["email"] == (2, 1, 3)
    assert base["url"] == (1, 1, 3)
    assert base["phone"] == (0, 0, 3)


def test_epoch_vs_prefix_hand_replica(spark, tmp_path):
    mon = IncrementalPIIMonitor(str(tmp_path / "idx"))
    mon.process_batch(_docs(spark, E0), 0)
    rows = {
        r.pii_class: r for r in mon.process_batch(_docs(spark, E1), 1).collect()
    }
    # email: epoch (1 hit / 2 docs) vs base (2 hits / 3 docs):
    # delta = 1*3 - 2*2 = -1 over 6
    assert rows["email"].delta_num == -1
    assert abs(rows["email"].rate_delta - (-1 / 6)) < 1e-15
    # phone: epoch 2/2 vs base 0/3: delta = 2*3 - 0 = 6 over 6 -> +1.0
    assert rows["phone"].delta_num == 6
    assert rows["phone"].rate_delta == 1.0
    assert rows["url"].delta_num == -2  # 0*3 - 1*2
    assert len(rows) == 6


def test_replay_after_compaction_folded_own_epoch(spark, tmp_path):
    mon = IncrementalPIIMonitor(str(tmp_path / "idx"), compact_every=1)
    mon.process_batch(_docs(spark, E0), 0)
    mon.process_batch(_docs(spark, E1), 1)
    first = sorted(
        mon.process_batch(_docs(spark, E2), 2).collect(),
        key=lambda r: r.pii_class,
    )
    # crash after epoch 2's commit; the replay first compacts (folding
    # e-2 into c-2) then recomputes — the ep-stamped by-value baseline
    # exclusion must keep the emission identical
    replay = sorted(
        mon.process_batch(_docs(spark, E2), 2).collect(),
        key=lambda r: r.pii_class,
    )
    assert first == replay
    base = {
        r.pii_class: r.n_docs
        for r in mon.baseline(spark, exclude_epoch=2).collect()
    }
    assert set(base.values()) == {5}  # epochs 0+1 only


def test_compaction_preserves_emissions(spark, tmp_path):
    a = IncrementalPIIMonitor(str(tmp_path / "a"))
    b = IncrementalPIIMonitor(str(tmp_path / "b"), compact_every=1)
    outs_a, outs_b = [], []
    for e, batch in enumerate((E0, E1, E2)):
        key = lambda r: (r.epoch, r.pii_class)
        outs_a += sorted(a.process_batch(_docs(spark, batch), e).collect(), key=key)
        outs_b += sorted(b.process_batch(_docs(spark, batch), e).collect(), key=key)
    assert outs_a == outs_b and len(outs_a) == 12


def test_pii_monitor_foreachbatch_stream_e2e(spark, tmp_path):
    """REAL Structured Streaming wiring (the dedup twins' e2e shape):
    3 parquet drops -> maxFilesPerTrigger=1 -> one microbatch per drop
    -> writeStream.foreachBatch(mon.process_batch). The union of
    emissions must equal driving the same epochs by direct calls."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = (E0, E1, E2)
    for e, b in enumerate(batches):
        staged = str(tmp_path / f"stage{e}")
        _docs(spark, b).coalesce(1).write.parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{e}.parquet")

    mon = IncrementalPIIMonitor(str(tmp_path / "sidx"))
    out_root = str(tmp_path / "out")

    def sink(batch_df, epoch_id):
        mon.process_batch(batch_df, epoch_id).write.mode(
            "overwrite"
        ).parquet(f"{out_root}/e-{epoch_id}")

    schema = _docs(spark, E0).schema
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

    key = lambda r: (r.epoch, r.pii_class)
    streamed = sorted(spark.read.parquet(f"{out_root}/e-*").collect(), key=key)
    direct = IncrementalPIIMonitor(str(tmp_path / "didx"))
    rows = []
    for e, b in enumerate(batches):
        rows += direct.process_batch(_docs(spark, b), e).collect()
    assert streamed == sorted(rows, key=key) and len(streamed) == 12
