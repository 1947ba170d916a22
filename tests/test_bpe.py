"""BPE trainer vs a pure-python reference on seeded random corpora."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions.bpe import merge_pair, train_bpe_merges


def _ref_bpe(texts, n_merges):
    """Reference trainer: dict loop, overlap-counting pairs, greedy
    leftmost merge, (count DESC, pair ASC) tie-break."""
    words = Counter()
    for t in texts:
        for wd in t.lower().split():
            words[wd] += 1
    seqs = {w: list(w) for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for w, cnt in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((step, f"{a} {b}", a + b))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_merge_pair_fold_semantics(spark):
    df = spark.createDataFrame(
        [
            (["a", "b", "a", "b"],),   # both occurrences merge
            (["y", "y", "y"],),        # greedy: yy, y
            (["x", "a"],),             # no match
        ],
        "seq array<string>",
    )
    got = [
        r.m
        for r in df.select(
            merge_pair(F.col("seq"), "a", "b", "ab").alias("m")
        ).collect()
    ]
    assert got[0] == ["ab", "ab"]
    yy = [
        r.m
        for r in df.select(
            merge_pair(F.col("seq"), "y", "y", "yy").alias("m")
        ).collect()
    ]
    assert yy[1] == ["yy", "y"]
    assert got[2] == ["x", "a"]


@pytest.mark.parametrize("seed", [3, 17])
def test_bpe_matches_reference(spark, seed):
    rng = random.Random(seed)
    vocab = ["the", "there", "then", "other", "banana", "bandana", "an"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10)))
        for _ in range(30)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe_merges(df, 6)
    assert got == _ref_bpe(texts, 6)


def test_bpe_early_stop_and_validation(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    # every word unique, every pair count 1 → no merge possible
    assert train_bpe_merges(df, 3) == []
    with pytest.raises(ValueError):
        train_bpe_merges(df, 0)


def test_wordpiece_hand_computed(spark):
    from walex_spark.extensions.bpe import wordpiece_segment

    df = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab cd")], "doc_id long, text string"
    )
    # word counts: abab=2, ab=1, cd=1
    # piece weights (len>=2): ab 2*2+1=5; ba/aba/bab/abab 2 each; cd 1
    # top-2 by (weight desc, piece asc) = [ab, aba]; chars a b c d
    # greedy: abab -> aba|b (2), ab -> ab (1), cd -> c|d (2)
    out = {
        r.doc_id: r
        for r in wordpiece_segment(df, top_pieces=2).collect()
    }
    assert out[1].n_words == 2 and out[1].n_pieces == 3
    assert out[1].pieces_per_word == 1.5
    assert out[2].n_words == 2 and out[2].n_pieces == 4
    assert out[2].pieces_per_word == 2.0


def test_token_id_arrays_hand_case(spark):
    from walex_spark.extensions.bpe import token_id_arrays

    rows = [
        (1, "b a a"),
        (2, "a c b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in token_id_arrays(df).collect()}
    # counts: a=3, b=2, c=1 -> ids a=1, b=2, c=3
    assert out[1].token_ids == [2, 1, 1]
    assert out[2].token_ids == [1, 3, 2]
    assert out[1].n_tokens == 3 and out[2].n_tokens == 3


def test_token_id_arrays_rank_tiebreak_is_lexicographic(spark):
    from walex_spark.extensions.bpe import token_id_arrays

    df = spark.createDataFrame([(1, "zz aa")], "doc_id long, text string")
    out = token_id_arrays(df).collect()[0]
    # equal counts -> 'aa' ranks before 'zz'
    assert out.token_ids == [2, 1]
