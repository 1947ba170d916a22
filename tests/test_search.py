"""extensions/search.py — BM25 ranked retrieval + unigram surprisal."""

import pytest

from pyspark.sql import functions as F


def test_bm25_hand_computed(spark):
    from walex_spark.extensions.search import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog fish"),
            (3, "bird bird bird"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in bm25_topk(df, ["cat", "dog"], k=10).collect()
    }
    # doc 3 matches nothing -> absent
    assert set(out) == {1, 2}
    N, total = 3, 8
    avgdl = total / N

    def contrib(tf, dfreq, dl, k1=1.2, b=0.75):
        idf = (N - dfreq + 0.5) / (dfreq + 0.5)
        # NB: idf * (num/den) — the operator multiplies idf by the
        # already-divided tf norm; (idf*num)/den is 1 ulp off
        return idf * (
            (tf * (k1 + 1.0))
            / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
        )

    exp1 = contrib(2, 1, 3) + contrib(1, 2, 3)
    exp2 = contrib(0, 1, 2) * 0 + contrib(1, 2, 2)
    assert out[1].score == pytest.approx(exp1, abs=0)  # bit-exact
    assert out[2].score == pytest.approx(exp2, abs=0)
    assert out[1].n_terms_matched == 2 and out[2].n_terms_matched == 1
    assert out[1].rnk == 1 and out[2].rnk == 2


def test_bm25_validates_terms(spark):
    from walex_spark.extensions.search import bm25_topk

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])
    with pytest.raises(ValueError):
        bm25_topk(df, ["a", "a"])


def test_half_bits_values(spark):
    from walex_spark.extensions.search import half_bits

    rows = spark.range(1).select(
        half_bits(F.lit(1)).alias("one"),
        half_bits(F.lit(2)).alias("two"),
        half_bits(F.lit(3)).alias("three"),
        half_bits(F.lit(1 << 20)).alias("big"),
        half_bits(F.lit((1 << 62))).alias("clamped"),
    ).first()
    assert rows.one == 0          # floor(2*log2(1))
    assert rows.two == 2          # floor(2*log2(2))
    assert rows.three == 3        # floor(2*log2(3)) = floor(3.17)
    assert rows.big == 40         # 2*20
    assert rows.clamped == 61     # 2^62 clamps to (2^31-1)^2


def test_surprisal_hand_computed(spark):
    from walex_spark.extensions.search import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # N=5; counts a=2 b=2 c=1; r_a = 5 div 2 = 2 -> hb 2; r_c = 5 -> hb 4
    out = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    assert out[1].n_tokens == 3 and out[1].total_half_bits == 6
    assert out[2].n_tokens == 2 and out[2].total_half_bits == 6
    assert out[1].half_bits_per_token == 2.0
    assert out[2].half_bits_per_token == 3.0


def test_rrf_fuse_hand_computed(spark):
    from walex_spark.extensions.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rnk long"
    )
    b = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rnk long"
    )
    out = {r.doc_id: r for r in rrf_fuse(a, b).collect()}
    assert out[3].rrf_score == 1.0 / 63.0 + 1.0 / 61.0
    assert out[1].rrf_score == 1.0 / 61.0
    assert out[4].rrf_score == 1.0 / 62.0
    assert out[3].rnk == 1  # present in both lists wins
    assert out[3].rank_a == 3 and out[3].rank_b == 1
    assert out[1].rank_b is None and out[4].rank_a is None


def test_bigram_surprisal_hand_computed(spark):
    from walex_spark.extensions.search import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c"), (3, "z")], "doc_id long, text string"
    )
    # corpus bigrams: doc1 (a,b),(b,a),(a,b); doc2 (b,c)
    # c12: (a,b)=2 (b,a)=1 (b,c)=1 ; context c1: a=2, b=2
    # doc1: hb(2//2)=0, hb(2//1)=2, hb(2//2)=0 -> total 2 over 3
    # doc2: hb(2//1)=2 -> total 2 over 1
    out = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    assert set(out) == {1, 2}  # single-token doc has no bigrams
    assert out[1].n_bigrams == 3 and out[1].total_half_bits == 2
    assert out[2].n_bigrams == 1 and out[2].total_half_bits == 2
    assert out[1].half_bits_per_bigram == 2.0 / 3.0
    assert out[2].half_bits_per_bigram == 2.0


def test_bigram_vs_unigram_repetition_gap(spark):
    """A doc of rare-but-always-adjacent tokens scores high on unigram
    surprisal and LOW on bigram surprisal — the repetition signal."""
    from walex_spark.extensions.search import bigram_surprisal

    rows = [(1, "q w e r t y " * 10)] + [
        # shared context "a" fans out to 28 distinct continuations:
        # every (a, b<i>) transition is a 1-in-28 surprise
        (i, f"a b{i}") for i in range(2, 30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    # doc 1's transitions are deterministic (q->w->e->...): near-zero
    # conditional surprisal despite globally rare tokens
    assert out[1].half_bits_per_bigram < out[2].half_bits_per_bigram


def test_ndcg_hand_computed(spark):
    import math

    from walex_spark.extensions.search import ndcg_at_k

    ranked = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rnk long"
    )
    rel = spark.createDataFrame(
        [(10, 1), (11, 3), (12, 0), (13, 2)], "doc_id long, rel long"
    )
    out = {r.rnk: r for r in ndcg_at_k(ranked, rel, k=3).collect()}
    w = [1.0 / math.log2(r + 1) for r in (1, 2, 3)]
    dcg = [1.0 * w[0]]
    dcg.append(dcg[0] + 7.0 * w[1])
    dcg.append(dcg[1] + 0.0 * w[2])
    # ideal over ALL corpus docs: rel 3 (doc 11), 2 (13), 1 (10)
    idcg = [7.0 * w[0]]
    idcg.append(idcg[0] + 3.0 * w[1])
    idcg.append(idcg[1] + 1.0 * w[2])
    for r in (1, 2, 3):
        assert out[r].dcg_at == dcg[r - 1]     # bit-exact
        assert out[r].idcg_at == idcg[r - 1]
        assert out[r].ndcg_at == dcg[r - 1] / idcg[r - 1]
    assert out[3].rel == 0 and out[2].rel == 3


def test_ndcg_missing_relevance_counts_zero(spark):
    from walex_spark.extensions.search import ndcg_at_k

    ranked = spark.createDataFrame([(99, 1)], "doc_id long, rnk long")
    rel = spark.createDataFrame([(1, 3)], "doc_id long, rel long")
    out = ndcg_at_k(ranked, rel, k=1).collect()
    assert out[0].rel == 0 and out[0].dcg_at == 0.0 and out[0].ndcg_at == 0.0
