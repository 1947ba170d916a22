"""Model tests: ordering/packing/span operators vs pure-python
references on seeded random inputs — the same style as the SCD and
BPE model tests (seeded, not hypothesis: one deterministic dataset
exercises the interesting interactions without per-example Spark
session cost)."""

import random

from pyspark.sql import functions as F

from walex_spark.extensions.packing import pack_sequences
from walex_spark.operators.ordering import prefix_sums


def _py_md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def test_pack_sequences_matches_python_model(spark):
    rng = random.Random(42)
    docs = [(i, rng.randint(0, 200)) for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, n long")
    L = 128
    got = sorted(
        (r.seq_id, r.doc_id, r.tok_start, r.tok_end)
        for r in pack_sequences(df, "n", seq_len=L, salt="m").collect()
    )

    # python model: shuffle by md5('m'||id), lay out, slice
    order = sorted(
        (d for d in docs if d[1] > 0),
        key=lambda d: (_py_md5("m" + str(d[0])), d[0]),
    )
    expected = []
    cum = 0
    for doc_id, n in order:
        start_seq, end_seq = cum // L, (cum + n - 1) // L
        for s in range(start_seq, end_seq + 1):
            t0 = max(0, s * L - cum)
            t1 = min(n, (s + 1) * L - cum)
            expected.append((s, doc_id, t0, t1))
        cum += n
    assert got == sorted(expected)


def test_prefix_sums_matches_python_model_many_partitions(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(-50, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    got = {r.id: r.cum_before for r in prefix_sums(df, ["id"], "v").collect()}
    cum = 0
    for i, v in sorted(rows):
        assert got[i] == cum
        cum += v


def test_prefix_sums_multi_long_and_decimal(spark):
    """prefix_sums_multi: two value columns in one range shuffle, each
    keeping its natural sum type — the long count stays integer-exact,
    the DECIMAL(18,4) sum stays decimal-exact (no long cast)."""
    import decimal

    from walex_spark.operators.ordering import prefix_sums_multi

    rng = random.Random(11)
    rows = [
        (
            i,
            rng.randint(-3, 3),
            decimal.Decimal(rng.randint(-99999, 99999)) / 10000,
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "id long, n long, d decimal(18,4)"
    ).repartition(9)
    out = prefix_sums_multi(df, ["id"], ["n", "d"], ["cn", "cd"])
    got = {r.id: (r.cn, decimal.Decimal(r.cd)) for r in out.collect()}
    cum_n, cum_d = 0, decimal.Decimal(0)
    for i, n, d in sorted(rows):
        assert got[i] == (cum_n, cum_d), i
        cum_n += n
        cum_d += d


def test_prefix_sums_multi_tied_keys_consistent(spark):
    """Rows TIED on the full order key are interchangeable inside an
    order-free sum: with k tied rows of value v after prefix P, the
    tied rows' cums must be exactly the set {P, P+v, …, P+(k-1)v} and
    every strictly-later row must see P + k·v."""
    from walex_spark.operators.ordering import prefix_sums_multi

    rows = [(1, 10)] + [(5, 7)] * 3 + [(9, 100)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(4)
    out = prefix_sums_multi(df, ["k"], ["v"], ["cv"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r.cv)
    assert by_key[1] == [0]
    assert sorted(by_key[5]) == [10, 17, 24]
    assert by_key[9] == [31]


def test_duplicate_spans_matches_python_model(spark):
    from walex_spark.extensions.dedup import duplicate_spans

    rng = random.Random(3)
    alphabet = "abcd"
    W = 8
    # short random strings over a tiny alphabet -> plenty of genuine
    # window collisions to exercise marking + merging
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(4, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, win_len=W).collect()
    )

    # python model
    from collections import Counter

    counts = Counter()
    for _, text in docs:
        for p in range(len(text) - W + 1):
            counts[text[p : p + W]] += 1
    expected = []
    for doc_id, text in docs:
        marked = [
            p + 1
            for p in range(len(text) - W + 1)
            if counts[text[p : p + W]] >= 2
        ]
        if not marked:
            continue
        start = prev = marked[0]
        for p in marked[1:]:
            if p > prev + W:
                expected.append((doc_id, start, prev + W - 1))
                start = p
            prev = p
        expected.append((doc_id, start, prev + W - 1))
    assert got == sorted(expected)
