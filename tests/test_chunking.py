"""chunk_documents / term_scores / redact_pii semantics
(extensions/chunking.py, extensions/text.py)."""

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions.chunking import chunk_documents, term_scores
from walex_spark.extensions.text import redact_pii


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens, 2 chunks
            (2, "one two three"),                          # < chunk size, 1 chunk
            (3, ""),                                       # empty: no rows
            (4, " ".join(f"w{i}" for i in range(13))),   # exactly 2 windows + tail
        ],
        "doc_id long, text string",
    )


def test_chunk_windows_and_overlap(docs):
    out = chunk_documents(docs, chunk_tokens=8, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r
    # doc 1: 10 tokens, stride 4 -> ceil((10-4)/4)=2 chunks
    assert set(by_doc[1]) == {0, 1}
    assert by_doc[1][0].chunk_text == "t0 t1 t2 t3 t4 t5 t6 t7"
    # overlap: chunk 1 starts at token 4
    assert by_doc[1][1].chunk_text == "t4 t5 t6 t7 t8 t9"
    assert by_doc[1][1].n_chunk_tokens == 6
    # short doc: single whole-doc chunk
    assert set(by_doc[2]) == {0}
    assert by_doc[2][0].chunk_text == "one two three"
    # empty doc yields nothing
    assert 3 not in by_doc
    # n_chunks column consistent with fan-out
    assert all(r.n_chunks == len(by_doc[r.doc_id]) for r in out)


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_term_scores_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "banana cherry shared"),
            (3, "cherry cherry cherry shared"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.rnk): r for r in term_scores(docs, top_k=2).collect()}
    # doc 1: apple tf=2 df=1 -> score 6.0 beats banana (tf=1 df=2 -> 1.5)
    assert out[(1, 1)].term == "apple" and out[(1, 1)].score == 6.0
    # shared appears everywhere -> idf 1, never wins rank 1
    assert all(out[(d, 1)].term != "shared" for d in (1, 2, 3))
    # doc 3: cherry tf=3 df=2 -> 4.5
    assert out[(3, 1)].term == "cherry" and out[(3, 1)].score == 4.5


def test_redact_pii_kinds_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b@test.org or visit https://x.io/y?z=a.b@c.de"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    # the URL-embedded email is consumed by the URL pass (order contract)
    assert out[1].n_urls == 1 and out[1].n_emails == 1
    assert "<URL>" in out[1].redacted_text and "<EMAIL>" in out[1].redacted_text
    assert "a.b@test.org" not in out[1].redacted_text
    assert out[2].n_phones == 1 and "<PHONE>" in out[2].redacted_text
    assert out[3].redacted_text == "clean text only"
    assert (out[3].n_urls, out[3].n_emails, out[3].n_phones) == (0, 0, 0)


def test_hash_embed_sparse_dense_consistency(spark):
    from walex_spark.extensions.chunking import hash_embed, hash_embed_dense

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "cherry"), (3, "")],
        "doc_id long, text string",
    )
    sparse = hash_embed(docs, dim=8).collect()
    dense = {r.doc_id: r.embedding for r in hash_embed_dense(docs, dim=8).collect()}
    # every sparse entry appears at the right dense position
    for r in sparse:
        assert dense[r.doc_id][r.bucket] == float(r.weight)
    # dense non-zeros are exactly the sparse entries
    nnz = {(r.doc_id, r.bucket) for r in sparse}
    for did, vec in dense.items():
        for i, v in enumerate(vec):
            assert (v != 0.0) == ((did, i) in nnz)
    # norm matches the dense vector
    import math

    for did in dense:
        got = {r.norm for r in sparse if r.doc_id == did}
        assert got == {math.sqrt(sum(v * v for v in dense[did]))}
    # empty doc: no rows at all
    assert 3 not in dense and all(r.doc_id != 3 for r in sparse)
    # determinism: same input, same bytes
    again = hash_embed(docs, dim=8).collect()
    assert sorted(map(tuple, sparse)) == sorted(map(tuple, again))


def test_hash_embed_feeds_similarity_ops(spark):
    """The bridge contract: hash_embed_dense output plugs straight
    into the embedding operators."""
    from walex_spark.extensions.chunking import hash_embed_dense
    from walex_spark.extensions.similarity import brute_force_topk

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown foxes"),
            (3, "entirely different words here"),
        ],
        "doc_id long, text string",
    )
    emb = hash_embed_dense(docs, dim=16)
    top = brute_force_topk(
        emb.filter(F.col("doc_id") == 1), emb, k=2, id_col="doc_id", vec_col="embedding"
    ).collect()
    # doc 2 (3 shared tokens) ranks above doc 3
    assert [r.neighbor_id for r in sorted(top, key=lambda r: r.rnk)] == [2, 3]


def test_curriculum_order_rank_and_shards(spark):
    from walex_spark.extensions.packing import curriculum_order

    rows = [
        # doc 1: all common words -> low bits/token (easiest)
        (1, "the the the the the the"),
        # doc 2: mixed
        (2, "the the rare1"),
        # doc 3: all rare words -> highest bits/token
        (3, "rare2 rare3 rare4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curriculum_order(df, shard_size=2).collect()}
    assert [out[i].rank for i in (1, 2, 3)] == [1, 2, 3]
    assert out[1].half_bits_per_token < out[2].half_bits_per_token
    assert out[2].half_bits_per_token < out[3].half_bits_per_token
    # shard_size=2: ranks 1,2 -> shard 0; rank 3 -> shard 1
    assert (out[1].shard_idx, out[2].shard_idx, out[3].shard_idx) == (0, 0, 1)


def test_curriculum_order_validates(spark):
    import pytest as _pt

    from walex_spark.extensions.packing import curriculum_order

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pt.raises(ValueError):
        curriculum_order(df, shard_size=0)
