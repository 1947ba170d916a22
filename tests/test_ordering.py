"""operators/ordering.py + extensions/packing.py — global index,
prefix sums, sequence packing."""

import pytest

from pyspark.sql import functions as F

from walex_spark.operators.ordering import (
    global_sorted_index,
    prefix_sums,
    shuffle_key,
)
from walex_spark.extensions.packing import pack_sequences


def test_global_index_matches_single_partition_rank(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), shuffle_key(F.col("id")).alias("k")
    )
    got = global_sorted_index(df, ["k", "id"], num_partitions=7)
    rows = {r.id: r.pos for r in got.collect()}
    expected = {
        r.id: i + 1
        for i, r in enumerate(df.orderBy("k", "id").collect())
    }
    assert rows == expected


def test_global_index_deterministic_across_runs(spark):
    df = spark.range(0, 500).select(
        F.col("id"), shuffle_key(F.col("id"), "s2").alias("k")
    )
    a = {r.id: r.pos for r in global_sorted_index(df, ["k", "id"]).collect()}
    b = {r.id: r.pos for r in global_sorted_index(df, ["k", "id"]).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, 501))


def test_prefix_sums_exclusive_and_exact(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 11 + 1) for i in range(200)], "id long, v long"
    )
    got = prefix_sums(df, ["id"], "v", num_partitions=5)
    rows = sorted((r.id, r.cum_before, r.v) for r in got.collect())
    running = 0
    for rid, cum, v in rows:
        assert cum == running, (rid, cum, running)
        running += v
    # all original columns preserved
    assert set(got.columns) == {"id", "v", "cum_before"}


def test_pack_sequences_partitions_every_token_once(spark):
    df = spark.createDataFrame(
        [(i, 10 + (i % 30)) for i in range(50)], "doc_id long, n long"
    )
    out = pack_sequences(df, "n", seq_len=64).collect()
    total = sum(r.n_seq_tokens for r in out)
    assert total == sum(10 + (i % 30) for i in range(50))
    # each doc's slices are contiguous, disjoint, and cover [0, n)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, slices in by_doc.items():
        slices.sort(key=lambda r: r.tok_start)
        assert slices[0].tok_start == 0
        assert slices[-1].tok_end == 10 + (doc % 30)
        for a, b in zip(slices, slices[1:]):
            assert a.tok_end == b.tok_start
            assert b.seq_id == a.seq_id + 1  # consecutive sequences
    # every sequence except the last is exactly full
    per_seq = {}
    for r in out:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_seq_tokens
    last = max(per_seq)
    for sid, n in per_seq.items():
        assert n == 64 or sid == last


def test_pack_sequences_drops_empty_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 5)], "doc_id long, n long"
    )
    out = pack_sequences(df, "n", seq_len=8).collect()
    assert {r.doc_id for r in out} == {2}
    with pytest.raises(ValueError):
        pack_sequences(df, "n", seq_len=0)


def test_chunk_manifest_contract(spark):
    """Chunk-layout manifest (chunking.chunk_manifest — identical
    window math to chunk_documents): full coverage with overlap,
    short-doc single chunk, empty-doc zero rows, no redundant tail
    window, and the manifest hash matching a hand-built slice."""
    import hashlib

    import pytest

    from walex_spark.extensions.chunking import (
        chunk_documents,
        chunk_manifest,
    )

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [
            (1, " ".join(words)),   # 10 tokens
            (2, "solo"),            # 1 token -> one chunk
            (3, "   "),             # whitespace-only -> zero rows
        ],
        ["doc_id", "text"],
    )
    out = chunk_manifest(df, chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    assert [(r.chunk_idx, r.start_tok, r.n_tokens) for r in
            sorted(by_doc[2], key=lambda r: r.chunk_idx)] == [(0, 0, 1)]
    # doc 1: stride=2, ceil((10-2)/2)=4 windows — starts 0,2,4,6; the
    # last full window reaches token 10, so NO redundant tail chunk
    got = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.chunk_idx, r.start_tok, r.n_tokens) for r in got] == [
        (0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4)
    ]
    # every token covered: union of [start, start+n) == [0, 10)
    covered = set()
    for r in got:
        covered |= set(range(r.start_tok, r.start_tok + r.n_tokens))
    assert covered == set(range(10))
    # manifest hash == md5 of the actual token slice
    want = hashlib.md5(" ".join(words[2:6]).encode()).hexdigest()
    assert got[1].chunk_hash == want
    # manifest rows mirror chunk_documents' windows one-for-one
    docs_rows = chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    assert sorted((r.doc_id, r.chunk_idx) for r in docs_rows) == sorted(
        (r.doc_id, r.chunk_idx) for r in out
    )
    with pytest.raises(ValueError):
        chunk_manifest(df, chunk_tokens=4, overlap=4)
