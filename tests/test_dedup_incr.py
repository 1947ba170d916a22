"""Fold-equals-batch contracts for the incremental span/winnow dedup
twins (streaming/dedup_incr.py) across >= 2 micro-batches, mirroring
the postings-delta test design: drive process_batch per epoch, fold
the emissions, compare against the batch operator over the full
corpus. Also pins replay idempotence (re-running an epoch changes
nothing) — the at-least-once foreachBatch contract."""

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions import dedup as dd
from walex_spark.streaming.dedup_incr import (
    IncrementalDespanIndex,
    IncrementalPrefixJaccardIndex,
    IncrementalWinnowIndex,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _epochs(docs, n=3):
    # deterministic split: epoch = doc_id mod n — every epoch gets a
    # mix of dup-cluster members, so cross-epoch matches exist
    return [docs.filter(F.col("doc_id") % n == i) for i in range(n)]


def _pairs_key(rows):
    return sorted(
        (r.id_a, r.id_b, r.n_shared, round(r.winnow_sim, 12)) for r in rows
    )


def test_winnow_fold_equals_batch(spark, docs, tmp_path):
    idx = IncrementalWinnowIndex(str(tmp_path / "widx"), k=8, window=4, min_shared=2)
    emitted = []
    for e, b in enumerate(_epochs(docs)):
        emitted.extend(idx.process_batch(b, e).collect())
    batch = dd.winnow_candidate_pairs(
        dd.winnow_fingerprints(docs, 8, 4, positions=False),
        min_shared=2,
        distinct_hashes=True,
    ).collect()
    assert _pairs_key(emitted) == _pairs_key(batch)
    # each pair emitted exactly once across epochs
    seen = [(r.id_a, r.id_b) for r in emitted]
    assert len(seen) == len(set(seen))


def test_winnow_replay_idempotent(spark, docs, tmp_path):
    idx = IncrementalWinnowIndex(str(tmp_path / "widx"), k=8, window=4, min_shared=2)
    e0, e1 = _epochs(docs, 2)
    idx.process_batch(e0, 0)
    first = _pairs_key(idx.process_batch(e1, 1).collect())
    # crash-replay of epoch 1: same rows out, index unchanged
    replay = _pairs_key(idx.process_batch(e1, 1).collect())
    assert replay == first
    assert (
        idx.fingerprints(spark).count()
        == dd.winnow_fingerprints(docs, 8, 4, positions=False).count()
    )


def _latest_per_doc(rows_with_epoch):
    best = {}
    for epoch, r in rows_with_epoch:
        cur = best.get(r.id)
        if cur is None or epoch >= cur[0]:
            best[r.id] = (epoch, r.clean_text, r.n_removed)
    return {i: (t, n) for i, (_, t, n) in best.items()}


def test_despan_fold_equals_batch(spark, docs, tmp_path):
    idx = IncrementalDespanIndex(str(tmp_path / "didx"), win_len=40, min_count=2)
    rows = []
    for e, b in enumerate(_epochs(docs)):
        rows.extend((e, r) for r in idx.process_batch(b, e).collect())
    folded = _latest_per_doc(rows)
    batch = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in dd.remove_duplicate_spans(docs, win_len=40, min_count=2).collect()
    }
    assert folded == batch
    # the retroactive-correction path actually fired: some doc was
    # emitted in more than one epoch (otherwise this test proves less
    # than it claims)
    emitted_ids = [r.id for _, r in rows]
    assert len(emitted_ids) > len(set(emitted_ids)), (
        "no cross-epoch re-emission happened — pick a split that "
        "spreads duplicate spans across epochs"
    )


def test_winnow_foreachbatch_stream_e2e(spark, docs, tmp_path):
    """REAL Structured Streaming wiring, not a direct-call simulation:
    the corpus arrives as 3 parquet file drops, readStream with
    maxFilesPerTrigger=1 turns each drop into its own microbatch, and
    writeStream.foreachBatch(idx.process_batch) — the deployment shape
    the module docstring promises — drives the index. The folded
    emissions must equal the batch operator, same contract as the
    direct-call test."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    for e, b in enumerate(_epochs(docs)):
        staged = str(tmp_path / f"stage{e}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{e}.parquet")

    idx = IncrementalWinnowIndex(
        str(tmp_path / "widx"), k=8, window=4, min_shared=2
    )
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
    batch = dd.winnow_candidate_pairs(
        dd.winnow_fingerprints(docs, 8, 4, positions=False),
        min_shared=2,
        distinct_hashes=True,
    ).collect()
    assert _pairs_key(emitted) == _pairs_key(batch)


def _jac_key(rows):
    return sorted((r.id_a, r.id_b, round(r.jaccard, 12)) for r in rows)


def test_prefix_jaccard_fold_equals_batch(spark, docs, tmp_path):
    """The fixed-order incremental twin must fold to EXACTLY the batch
    prefix_filter_jaccard_pairs output (both equal the naive threshold
    join — the prefix order only affects candidate generation, never
    the accept set)."""
    idx = IncrementalPrefixJaccardIndex(
        str(tmp_path / "pidx"), threshold_num=1, threshold_den=2
    )
    emitted = []
    for e, b in enumerate(_epochs(docs)):
        emitted.extend(idx.process_batch(b, e).collect())
    batch = dd.prefix_filter_jaccard_pairs(
        docs, threshold_num=1, threshold_den=2
    ).collect()
    assert _jac_key(emitted) == _jac_key(batch)
    assert emitted, "empty pair set proves nothing — corpus has near-dups"
    # each pair emitted exactly once across epochs
    seen = [(r.id_a, r.id_b) for r in emitted]
    assert len(seen) == len(set(seen))


def test_prefix_jaccard_replay_idempotent(spark, docs, tmp_path):
    idx = IncrementalPrefixJaccardIndex(
        str(tmp_path / "pidx"), threshold_num=1, threshold_den=2
    )
    e0, e1 = _epochs(docs, 2)
    idx.process_batch(e0, 0)
    first = _jac_key(idx.process_batch(e1, 1).collect())
    replay = _jac_key(idx.process_batch(e1, 1).collect())
    assert replay == first


def test_prefix_jaccard_compaction_identical(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import _epoch_dirs

    n_epochs, k = 8, 3
    idx = IncrementalPrefixJaccardIndex(
        str(tmp_path / "pidx"), threshold_num=1, threshold_den=2, compact_every=k
    )
    emitted = []
    for e in range(n_epochs):
        emitted.extend(
            idx.process_batch(docs.filter(F.col("doc_id") % n_epochs == e), e).collect()
        )
        for kind in ("pre", "toks"):
            assert len(_epoch_dirs(str(tmp_path / "pidx" / kind))) <= k + 1
    batch = dd.prefix_filter_jaccard_pairs(
        docs, threshold_num=1, threshold_den=2
    ).collect()
    assert _jac_key(emitted) == _jac_key(batch)


def _live_file_count(root):
    import glob
    import os

    return len(
        [
            f
            for f in glob.glob(f"{root}/**/*.parquet", recursive=True)
            if not os.path.basename(f).startswith(("_", "."))
        ]
    )


def test_winnow_compaction_bounded_and_identical(spark, docs, tmp_path):
    """Many epochs with compact_every=K: live dir count per root stays
    bounded (~K+1, not O(epochs)), superseded dirs are removed from
    disk, and the folded emissions are identical to the batch operator
    — compaction is pure maintenance, invisible to semantics."""
    from walex_spark.streaming.dedup_incr import _epoch_dirs

    n_epochs, k = 24, 4
    idx = IncrementalWinnowIndex(
        str(tmp_path / "widx"), k=8, window=4, min_shared=2, compact_every=k
    )
    emitted = []
    max_live = 0
    for e in range(n_epochs):
        b = docs.filter(F.col("doc_id") % n_epochs == e)
        emitted.extend(idx.process_batch(b, e).collect())
        max_live = max(max_live, len(_epoch_dirs(str(tmp_path / "widx" / "fps"))))
    assert max_live <= k + 1, f"live dirs grew to {max_live}"
    # on-disk parquet file count is bounded by live dirs x files/dir
    # (superseded dirs removed), not by epoch count: without
    # compaction this root pair would hold ~n_epochs * shuffle
    # partitions * 2 files (~384 here)
    nsp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert _live_file_count(str(tmp_path / "widx")) <= 2 * (k + 1) * (nsp + 1)
    batch = dd.winnow_candidate_pairs(
        dd.winnow_fingerprints(docs, 8, 4, positions=False),
        min_shared=2,
        distinct_hashes=True,
    ).collect()
    assert _pairs_key(emitted) == _pairs_key(batch)


def test_despan_compaction_bounded_and_identical(spark, docs, tmp_path):
    """Same contract for the despan index: with compact_every the cnt
    root's partial counts pre-fold during compaction and the fold
    still equals the batch operator."""
    from walex_spark.streaming.dedup_incr import _epoch_dirs

    n_epochs, k = 12, 3
    idx = IncrementalDespanIndex(
        str(tmp_path / "didx"), win_len=40, min_count=2, compact_every=k
    )
    rows = []
    for e in range(n_epochs):
        b = docs.filter(F.col("doc_id") % n_epochs == e)
        rows.extend((e, r) for r in idx.process_batch(b, e).collect())
        for kind in ("wins", "cnt", "docs"):
            assert (
                len(_epoch_dirs(str(tmp_path / "didx" / kind))) <= k + 1
            )
    folded = _latest_per_doc(rows)
    batch = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in dd.remove_duplicate_spans(docs, win_len=40, min_count=2).collect()
    }
    assert folded == batch


def test_prefix_jaccard_foreachbatch_stream_e2e(spark, docs, tmp_path):
    """Real Structured Streaming wiring for the prefix-Jaccard twin,
    mirroring the winnow e2e: 3 parquet drops -> maxFilesPerTrigger=1
    -> writeStream.foreachBatch(idx.process_batch); folded emissions
    equal the batch operator."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    for e, b in enumerate(_epochs(docs)):
        staged = str(tmp_path / f"stage{e}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{e}.parquet")

    idx = IncrementalPrefixJaccardIndex(
        str(tmp_path / "pidx"), threshold_num=1, threshold_den=2
    )
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
    batch = dd.prefix_filter_jaccard_pairs(
        docs, threshold_num=1, threshold_den=2
    ).collect()
    assert _jac_key(emitted) == _jac_key(batch)


def test_despan_replay_idempotent(spark, docs, tmp_path):
    idx = IncrementalDespanIndex(str(tmp_path / "didx"), win_len=40, min_count=2)
    e0, e1 = _epochs(docs, 2)
    idx.process_batch(e0, 0)
    first = sorted(
        (r.id, r.clean_text, r.n_removed)
        for r in idx.process_batch(e1, 1).collect()
    )
    # the replay arrives at epoch_id == _tot_upto, so the in-memory
    # running total (which already folded epoch 1) is poisoned for it —
    # the index must fall back to the on-disk partials
    replay = sorted(
        (r.id, r.clean_text, r.n_removed)
        for r in idx.process_batch(e1, 1).collect()
    )
    assert replay == first


def test_despan_running_total_warm_equals_cold(spark, docs, tmp_path):
    """The r12 in-memory running-total path (sequential epochs on one
    index instance) must emit exactly what a cold instance rebuilding
    the totals from the on-disk cnt partials emits."""
    e0, e1, e2 = _epochs(docs, 3)

    warm = IncrementalDespanIndex(str(tmp_path / "w"), win_len=40, min_count=2)
    for e, b in enumerate((e0, e1)):
        warm.process_batch(b, e).collect()
    assert warm._tot is not None and warm._tot_upto == 1

    cold = IncrementalDespanIndex(str(tmp_path / "c"), win_len=40, min_count=2)
    for e, b in enumerate((e0, e1)):
        cold.process_batch(b, e).collect()
        cold._tot, cold._tot_upto = None, -1  # force the disk path

    key = lambda rows: sorted((r.id, r.clean_text, r.n_removed) for r in rows)
    got_warm = key(warm.process_batch(e2, 2).collect())
    got_cold = key(cold.process_batch(e2, 2).collect())
    assert got_warm == got_cold and got_warm


# ---------------------------------------------------------------------------
# IncrementalMinHashIndex — LSH band-index twin
# ---------------------------------------------------------------------------


def _mh_key(rows):
    return sorted((r.id_a, r.id_b) for r in rows)


def test_minhash_fold_equals_batch(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalMinHashIndex

    idx = IncrementalMinHashIndex(str(tmp_path / "midx"))
    emitted = []
    for e, b in enumerate(_epochs(docs)):
        emitted.extend(idx.process_batch(b, e).collect())
    batch = dd.minhash_candidate_pairs(docs).collect()
    assert _mh_key(emitted) == _mh_key(batch)
    assert len(emitted) == len(set(_mh_key(emitted)))  # emitted once


def test_minhash_replay_idempotent(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalMinHashIndex

    idx = IncrementalMinHashIndex(str(tmp_path / "midx"))
    e0, e1 = _epochs(docs, 2)
    idx.process_batch(e0, 0)
    first = _mh_key(idx.process_batch(e1, 1).collect())
    replay = _mh_key(idx.process_batch(e1, 1).collect())
    assert replay == first
    # index holds exactly bands x n_docs rows after replay
    n_docs = docs.count()
    assert idx.band_rows(spark).count() == 4 * n_docs


def test_minhash_compaction_bounded_and_identical(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import (
        IncrementalMinHashIndex,
        _epoch_dirs,
    )

    n_epochs, k = 12, 3
    idx = IncrementalMinHashIndex(str(tmp_path / "midx"), compact_every=k)
    emitted = []
    max_live = 0
    for e in range(n_epochs):
        b = docs.filter(F.col("doc_id") % n_epochs == e)
        emitted.extend(idx.process_batch(b, e).collect())
        max_live = max(
            max_live, len(_epoch_dirs(str(tmp_path / "midx" / "bands")))
        )
    assert max_live <= k + 1, f"live dirs grew to {max_live}"
    batch = dd.minhash_candidate_pairs(docs).collect()
    assert _mh_key(emitted) == _mh_key(batch)


def test_minhash_foreachbatch_stream_e2e(spark, docs, tmp_path):
    """Deployment-shape wiring for the LSH twin: 3 parquet file drops
    -> readStream maxFilesPerTrigger=1 -> writeStream.foreachBatch
    driving the band index; folded emissions equal the batch operator."""
    import glob
    import os
    import shutil

    from walex_spark.streaming.dedup_incr import IncrementalMinHashIndex

    src = str(tmp_path / "src")
    os.makedirs(src)
    for e, b in enumerate(_epochs(docs)):
        staged = str(tmp_path / f"stage{e}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{e}.parquet")

    idx = IncrementalMinHashIndex(str(tmp_path / "midx"))
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
    batch = dd.minhash_candidate_pairs(docs).collect()
    assert _mh_key(emitted) == _mh_key(batch)


# ---------------------------------------------------------------------------
# IncrementalExactDedupIndex — exact-dedup upsert twin
# ---------------------------------------------------------------------------


def _latest_hash_state(rows_with_epoch):
    best = {}
    for epoch, r in rows_with_epoch:
        cur = best.get(r.content_hash)
        if cur is None or epoch >= cur[0]:
            best[r.content_hash] = (epoch, r.rep_id, r.dup_count)
    return {h: (rid, cnt) for h, (_, rid, cnt) in best.items()}


def test_exact_dedup_fold_equals_batch(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalExactDedupIndex

    idx = IncrementalExactDedupIndex(str(tmp_path / "eidx"))
    emitted = []
    for e, b in enumerate(_epochs(docs)):
        emitted.extend((e, r) for r in idx.process_batch(b, e).collect())
    got = _latest_hash_state(emitted)
    batch = {
        r.content_hash: (r.rep_id, r.dup_count)
        for r in dd.exact_dedup(docs).collect()
    }
    assert got == batch


def test_exact_dedup_upserts_on_new_copies(spark, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalExactDedupIndex

    idx = IncrementalExactDedupIndex(str(tmp_path / "eidx"))
    e0 = spark.createDataFrame([(5, "same"), (9, "other")], "doc_id long, text string")
    e1 = spark.createDataFrame([(3, "same")], "doc_id long, text string")
    out0 = {r.content_hash: (r.rep_id, r.dup_count) for r in idx.process_batch(e0, 0).collect()}
    out1 = {r.content_hash: (r.rep_id, r.dup_count) for r in idx.process_batch(e1, 1).collect()}
    import hashlib

    h_same = hashlib.md5(b"same").hexdigest()
    h_other = hashlib.md5(b"other").hexdigest()
    assert out0[h_same] == (5, 1) and out0[h_other] == (9, 1)
    # epoch 1 touches only 'same': rep drops to 3, count rises to 2;
    # 'other' is NOT re-emitted
    assert out1 == {h_same: (3, 2)}


def test_exact_dedup_replay_idempotent(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalExactDedupIndex

    idx = IncrementalExactDedupIndex(str(tmp_path / "eidx"))
    e0, e1 = _epochs(docs, 2)
    idx.process_batch(e0, 0)
    first = sorted(
        (r.content_hash, r.rep_id, r.dup_count)
        for r in idx.process_batch(e1, 1).collect()
    )
    replay = sorted(
        (r.content_hash, r.rep_id, r.dup_count)
        for r in idx.process_batch(e1, 1).collect()
    )
    assert replay == first


def test_exact_dedup_compaction_bounded_and_identical(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import (
        IncrementalExactDedupIndex,
        _epoch_dirs,
    )

    n_epochs, k = 12, 3
    idx = IncrementalExactDedupIndex(str(tmp_path / "eidx"), compact_every=k)
    emitted = []
    max_live = 0
    for e in range(n_epochs):
        b = docs.filter(F.col("doc_id") % n_epochs == e)
        emitted.extend((e, r) for r in idx.process_batch(b, e).collect())
        max_live = max(max_live, len(_epoch_dirs(str(tmp_path / "eidx" / "agg"))))
    assert max_live <= k + 1
    got = _latest_hash_state(emitted)
    batch = {
        r.content_hash: (r.rep_id, r.dup_count)
        for r in dd.exact_dedup(docs).collect()
    }
    assert got == batch


# ---------------------------------------------------------------------------
# IncrementalSimHashIndex — banded-hamming twin
# ---------------------------------------------------------------------------


def _sh_key(rows):
    return sorted((r.id_a, r.id_b, r.hamming) for r in rows)


def test_simhash_fold_equals_batch(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalSimHashIndex

    idx = IncrementalSimHashIndex(str(tmp_path / "shidx"))
    emitted = []
    for e, b in enumerate(_epochs(docs)):
        emitted.extend(idx.process_batch(b, e).collect())
    batch = dd.simhash_hamming_pairs(docs).collect()
    assert _sh_key(emitted) == _sh_key(batch)
    assert len(emitted) == len({(r.id_a, r.id_b) for r in emitted})


def test_simhash_replay_idempotent_and_compaction(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import (
        IncrementalSimHashIndex,
        _epoch_dirs,
    )

    n_epochs, k = 8, 2
    idx = IncrementalSimHashIndex(str(tmp_path / "shidx"), compact_every=k)
    emitted = []
    max_live = 0
    for e in range(n_epochs):
        b = docs.filter(F.col("doc_id") % n_epochs == e)
        out = _sh_key(idx.process_batch(b, e).collect())
        assert _sh_key(idx.process_batch(b, e).collect()) == out  # replay
        emitted.extend(out)
        max_live = max(
            max_live, len(_epoch_dirs(str(tmp_path / "shidx" / "bands")))
        )
    assert max_live <= k + 1
    batch = _sh_key(dd.simhash_hamming_pairs(docs).collect())
    assert sorted(emitted) == batch


def test_simhash_incr_validates_threshold(spark, tmp_path):
    import pytest as _pt

    from walex_spark.streaming.dedup_incr import IncrementalSimHashIndex

    with _pt.raises(ValueError, match="exact-recall"):
        IncrementalSimHashIndex(str(tmp_path / "x"), bits=16, band_bits=8,
                                max_hamming=5)


# ---------------------------------------------------------------------------
# IncrementalManifestIndex — shard-manifest maintenance twin
# ---------------------------------------------------------------------------


def _manifest_batch(docs):
    from walex_spark.operators.diff import shard_manifest

    return {
        r.shard: (r.n_rows, r.min_key, r.max_key, r.xor_hash)
        for r in shard_manifest(
            docs, key_col="doc_id", hash_cols=["doc_id", "text"],
            shard_size=7,
        ).collect()
    }


def _manifest_latest(emitted):
    latest = {}
    for e, r in emitted:
        cur = latest.get(r.shard)
        if cur is None or e >= cur[0]:
            latest[r.shard] = (e, (r.n_rows, r.min_key, r.max_key, r.xor_hash))
    return {s: v for s, (_, v) in latest.items()}


def test_manifest_fold_equals_batch(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalManifestIndex

    idx = IncrementalManifestIndex(
        str(tmp_path / "midx"), key_col="doc_id",
        hash_cols=("doc_id", "text"), shard_size=7,
    )
    emitted = []
    for e, b in enumerate(_epochs(docs)):
        emitted.extend((e, r) for r in idx.process_batch(b, e).collect())
    assert _manifest_latest(emitted) == _manifest_batch(docs)


def test_manifest_replay_idempotent(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalManifestIndex

    idx = IncrementalManifestIndex(
        str(tmp_path / "midx"), key_col="doc_id",
        hash_cols=("doc_id", "text"), shard_size=7,
    )
    e0, e1 = _epochs(docs, 2)
    idx.process_batch(e0, 0)
    key = lambda rows: sorted(
        (r.shard, r.n_rows, r.min_key, r.max_key, r.xor_hash) for r in rows
    )
    first = key(idx.process_batch(e1, 1).collect())
    replay = key(idx.process_batch(e1, 1).collect())
    assert replay == first


def test_manifest_upserts_only_touched_shards(spark, tmp_path):
    from walex_spark.streaming.dedup_incr import IncrementalManifestIndex

    idx = IncrementalManifestIndex(
        str(tmp_path / "midx"), key_col="doc_id",
        hash_cols=("doc_id", "text"), shard_size=10,
    )
    e0 = spark.createDataFrame(
        [(1, "a"), (15, "b")], "doc_id long, text string"
    )
    e1 = spark.createDataFrame([(3, "c")], "doc_id long, text string")
    out0 = {r.shard: r.n_rows for r in idx.process_batch(e0, 0).collect()}
    out1 = {r.shard: r.n_rows for r in idx.process_batch(e1, 1).collect()}
    assert out0 == {0: 1, 1: 1}
    # epoch 1 touches only shard 0; shard 1 is NOT re-emitted
    assert out1 == {0: 2}


def test_manifest_compaction_bounded_and_identical(spark, docs, tmp_path):
    from walex_spark.streaming.dedup_incr import (
        IncrementalManifestIndex,
        _epoch_dirs,
    )

    n_epochs, k = 12, 3
    idx = IncrementalManifestIndex(
        str(tmp_path / "midx"), key_col="doc_id",
        hash_cols=("doc_id", "text"), shard_size=7, compact_every=k,
    )
    emitted = []
    max_live = 0
    for e in range(n_epochs):
        b = docs.filter(F.col("doc_id") % n_epochs == e)
        emitted.extend((e, r) for r in idx.process_batch(b, e).collect())
        max_live = max(
            max_live, len(_epoch_dirs(str(tmp_path / "midx" / "agg")))
        )
    assert max_live <= k + 1
    assert _manifest_latest(emitted) == _manifest_batch(docs)


def test_manifest_foreachbatch_stream_e2e(spark, docs, tmp_path):
    """Deployment-shape wiring for the manifest twin: 3 parquet file
    drops -> readStream maxFilesPerTrigger=1 -> writeStream.foreachBatch
    driving the manifest index; the latest emission per shard equals
    the batch shard_manifest. Epoch-stamped outputs stand in for the
    UPSERT sink a real deployment MERGEs into."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F2

    from walex_spark.streaming.dedup_incr import IncrementalManifestIndex

    src = str(tmp_path / "src")
    os.makedirs(src)
    for e, b in enumerate(_epochs(docs)):
        staged = str(tmp_path / f"stage{e}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(f"{staged}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/drop{e}.parquet")

    idx = IncrementalManifestIndex(
        str(tmp_path / "midx"), key_col="doc_id",
        hash_cols=("doc_id", "text"), shard_size=7,
    )
    out_root = str(tmp_path / "out")

    def sink(batch_df, epoch_id):
        idx.process_batch(batch_df, epoch_id).withColumn(
            "epoch", F2.lit(epoch_id)
        ).write.mode("overwrite").parquet(f"{out_root}/e-{epoch_id}")

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

    emitted = [
        (r["epoch"], r)
        for r in spark.read.parquet(f"{out_root}/e-*").collect()
    ]
    assert _manifest_latest(emitted) == _manifest_batch(docs)


def test_prefix_jaccard_legacy_index_without_ep(spark, docs, tmp_path):
    """An index written before PRE_SCHEMA gained the ep arrival stamp
    reads back ep=NULL; the candidate orientation filter must treat
    those rows as unconditionally old (ep=-1) instead of letting NULL
    route every legacy-vs-new pair through the id-order arm — which
    silently dropped the id_n >= id_o half of the cross-epoch
    candidates (r09 ADVICE). Fold-equals-batch must survive a legacy
    epoch-0 index."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    idx = IncrementalPrefixJaccardIndex(
        str(tmp_path / "pidx"), threshold_num=1, threshold_den=2
    )
    e0, e1 = _epochs(docs, 2)
    emitted = idx.process_batch(e0, 0).collect()
    # strip the ep column from the on-disk epoch-0 prefix index,
    # simulating a durable index from the pre-ep format
    d = str(tmp_path / "pidx" / "pre" / "e-0")
    tbl = pq.read_table(d).drop_columns(["ep"])
    shutil.rmtree(d)
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "part-legacy.parquet"))
    assert glob.glob(os.path.join(d, "*.parquet"))
    emitted += idx.process_batch(e1, 1).collect()
    batch = dd.prefix_filter_jaccard_pairs(
        docs, threshold_num=1, threshold_den=2
    ).collect()
    assert _jac_key(emitted) == _jac_key(batch)
    assert emitted
