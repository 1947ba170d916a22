"""Fold-equals-batch contract for the incremental novelty twin
(streaming/novelty_incr.py) over id-ascending epochs, plus replay
idempotence, a hand-computed cross-epoch case, and compaction
bounds."""

import os

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions.text import ngram_novelty
from walex_spark.streaming.dedup_incr import _epoch_dirs
from walex_spark.streaming.novelty_incr import IncrementalNoveltyIndex

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _id_epochs(docs, bounds):
    parts = [docs.filter(F.col("doc_id") < bounds[0])]
    for a, b in zip(bounds, bounds[1:]):
        parts.append(docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b)))
    parts.append(docs.filter(F.col("doc_id") >= bounds[-1]))
    return parts


def _key(rows):
    return sorted(
        (r.doc_id, r.n_distinct_ngrams, r.n_novel, r.novelty_ratio)
        for r in rows
    )


def test_novelty_fold_equals_batch(spark, docs, tmp_path):
    idx = IncrementalNoveltyIndex(str(tmp_path / "nidx"), n=3)
    emitted = []
    for e, b in enumerate(_id_epochs(docs, [17, 34])):
        emitted.extend(idx.process_batch(b, e).collect())
    assert _key(emitted) == _key(ngram_novelty(docs, n=3).collect())


def test_novelty_replay_idempotent(spark, docs, tmp_path):
    idx = IncrementalNoveltyIndex(str(tmp_path / "nidx"), n=3)
    emitted = []
    for e, b in enumerate(_id_epochs(docs, [17, 34])):
        out = idx.process_batch(b, e).collect()
        if e == 1:
            assert _key(idx.process_batch(b, e).collect()) == _key(out)
        emitted.extend(out)
    assert _key(emitted) == _key(ngram_novelty(docs, n=3).collect())


def test_novelty_cross_epoch_by_hand(spark, tmp_path):
    idx = IncrementalNoveltyIndex(str(tmp_path / "nidx"), n=2)
    e0 = spark.createDataFrame(
        [(1, "a b c"), (2, "a b")], "doc_id long, text string"
    )
    # doc 1 owns "a b" (min id) and "b c"; doc 2's only bigram is old
    out0 = {r.doc_id: r for r in idx.process_batch(e0, 0).collect()}
    assert out0[1].n_novel == 2 and out0[1].n_distinct_ngrams == 2
    assert out0[2].n_novel == 0
    # epoch 1: "b c" already indexed, "c d" genuinely new
    e1 = spark.createDataFrame([(5, "b c d")], "doc_id long, text string")
    out1 = {r.doc_id: r for r in idx.process_batch(e1, 1).collect()}
    assert out1[5].n_distinct_ngrams == 2 and out1[5].n_novel == 1
    assert out1[5].novelty_ratio == 0.5


def test_novelty_compaction_bounds_dirs(spark, docs, tmp_path):
    idx = IncrementalNoveltyIndex(
        str(tmp_path / "nidx"), n=3, compact_every=3
    )
    bounds = list(range(6, 48, 6))  # 8 id-slice epochs
    emitted = []
    for e, b in enumerate(_id_epochs(docs, bounds)):
        emitted.extend(idx.process_batch(b, e).collect())
    assert _key(emitted) == _key(ngram_novelty(docs, n=3).collect())
    live = _epoch_dirs(os.path.join(str(tmp_path / "nidx"), "grams"))
    assert len(live) <= 4


def test_novelty_foreachbatch_stream_e2e(spark, docs, tmp_path):
    """REAL Structured Streaming wiring: id-ascending parquet drops
    (the module's ordering precondition), maxFilesPerTrigger=1,
    foreachBatch(idx.process_batch); folded emissions equal batch."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    for e, b in enumerate(_id_epochs(docs, [17, 34])):
        staged = str(tmp_path / f"stage{e}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{e}.parquet")

    idx = IncrementalNoveltyIndex(str(tmp_path / "nidx"), n=3)
    out_root = str(tmp_path / "out")

    def sink(batch_df, epoch_id):
        idx.process_batch(batch_df, epoch_id).write.mode(
            "overwrite"
        ).parquet(f"{out_root}/e-{epoch_id}")

    stream = (
        spark.readStream.schema(docs.schema)
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
    assert _key(emitted) == _key(ngram_novelty(docs, n=3).collect())
