"""normalize_text + profile_columns unit semantics
(extensions/text.py, extensions/profile.py)."""

import pytest

from walex_spark.extensions.profile import profile_columns
from walex_spark.extensions.text import normalize_text


def test_normalize_collapses_incidental_formatting(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello\t World\r\nagain  "),
            (2, "hello world again"),
            (3, "hello\x01world"),  # control char -> space
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in normalize_text(df).collect()}
    assert rows[1].norm_text == "hello world again"
    # formatting variants of the same text share one fingerprint
    assert rows[1].norm_fingerprint == rows[2].norm_fingerprint
    assert rows[3].norm_text == "hello world"
    assert rows[1].n_chars_norm == len("hello world again")


@pytest.fixture(scope="module")
def profiled(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5),
            (2, "b", -2.0),
            (2, None, None),
            (None, "b", 4.0),
        ],
        ["k", "s", "x"],
    )
    return df


def test_profile_exact_counts(profiled):
    rows = {r.column: r for r in profile_columns(profiled, exact=True).collect()}
    assert set(rows) == {"k", "s", "x"}
    assert all(r.n_rows == 4 for r in rows.values())
    assert rows["k"].n_nulls == 1 and rows["k"].n_distinct == 2
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    # numeric ranges; string column carries NULL min/max
    assert rows["x"].min_num == -2.0 and rows["x"].max_num == 4.0
    assert rows["k"].min_num == 1.0 and rows["k"].max_num == 2.0
    assert rows["s"].min_num is None and rows["s"].max_num is None


def test_profile_approx_path_is_close(profiled):
    rows = {r.column: r for r in profile_columns(profiled).collect()}
    # HLL at this cardinality is exact; the contract is "close", the
    # point is the default path plans no Expand (see test_plans)
    assert rows["k"].n_distinct == 2
    assert rows["k"].n_nulls == 1


def test_ngram_novelty_hand_computed(spark):
    from walex_spark.extensions.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d"),       # trigrams: "a b c", "b c d" — both first here
            (2, "a b c d"),       # same trigrams, first seen in doc 1
            (3, "a b c x y z"),   # "a b c" old; "b c x","c x y","x y z" new
            (4, "t u"),           # < 3 tokens: no trigrams, drops out
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(df, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_distinct_ngrams == 2 and out[1].n_novel == 2
    assert out[1].novelty_ratio == 1.0
    assert out[2].n_novel == 0 and out[2].novelty_ratio == 0.0
    assert out[3].n_distinct_ngrams == 4 and out[3].n_novel == 3
    assert out[3].novelty_ratio == 0.75


def test_ngram_novelty_counts_distinct_grams_once(spark):
    from walex_spark.extensions.text import ngram_novelty

    # "a b a b a" has trigrams "a b a", "b a b", "a b a" — the repeat
    # counts once in the DISTINCT per-doc set
    df = spark.createDataFrame([(7, "a b a b a")], "doc_id long, text string")
    row = ngram_novelty(df, n=3).collect()[0]
    assert row.n_distinct_ngrams == 2 and row.n_novel == 2


def test_nb_classifier_matches_pure_python_replica(spark):
    """nb_lang_classifier vs an independent per-row replica of the
    same half-bit arithmetic (split, hashed features, smoothing,
    argmax tie-break)."""
    import hashlib

    from walex_spark.extensions.text import nb_lang_classifier

    rows = [
        (i, " ".join(["aaa bbb ccc"] * 3) + (" ddd" if i % 2 else ""), "en")
        for i in range(10)
    ] + [
        (i, " ".join(["xxx yyy zzz"] * 3) + (" www" if i % 3 else ""), "de")
        for i in range(10, 20)
    ] + [
        (20, "aaa bbb xxx", "en"),  # mixed doc
        (21, "zzz yyy bbb", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    B, frac = 16, 0.5

    def bucket(salt, key):
        return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:8], 16)

    def hb2(x):
        return (x * x).bit_length() - 1

    thresh = int(frac * (1 << 32))
    train, test = [], []
    for i, txt, lab in rows:
        (train if bucket("nbsplit", i) < thresh else test).append((i, txt, lab))
    assert train and test, "split degenerate — pick different ids"
    model, tot, ndocs = {}, {}, {}
    for i, txt, lab in train:
        ndocs[lab] = ndocs.get(lab, 0) + 1
        for tok in txt.split():
            b = bucket("nbsplit|tok", tok) % B
            model[(lab, b)] = model.get((lab, b), 0) + 1
            tot[lab] = tot.get(lab, 0) + 1
    classes = sorted(ndocs)
    expect = {}
    for i, txt, lab in test:
        scores = {}
        for c in classes:
            s = sum(hb2(model.get((c, bucket("nbsplit|tok", t) % B), 0) + 1)
                    for t in txt.split())
            s -= len(txt.split()) * hb2(tot[c] + B)
            s += hb2(ndocs[c] + 1)
            scores[c] = s
        pred = min(classes, key=lambda c: (-scores[c], c))
        expect[(lab, pred)] = expect.get((lab, pred), 0) + 1

    out = nb_lang_classifier(df, n_buckets=B, train_fraction=frac)
    got = {(r.lang, r.pred): r.n_docs for r in out.collect()}
    assert got == expect


def test_distinct_ngram_diversity_hand_case(spark):
    from walex_spark.extensions.text import distinct_ngram_diversity

    rows = [
        (1, "a b a b", "tmpl"),     # unigrams: 4 tok / 2 distinct
        (2, "a b", "tmpl"),         # bigrams tmpl: "a b","b a","a b","a b"
        (3, "w x y z", "org"),      # all distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in distinct_ngram_diversity(df).collect()}
    t = out["tmpl"]
    assert (t.n_docs, t.n_tokens, t.distinct_unigrams) == (2, 6, 2)
    assert t.distinct_1 == 2.0 / 6.0
    # tmpl bigrams: doc1 -> [a b, b a, a b], doc2 -> [a b]; 4 total, 2 distinct
    assert (t.n_bigrams, t.distinct_bigrams) == (4, 2)
    assert t.distinct_2 == 0.5
    o = out["org"]
    assert o.distinct_1 == 1.0 and o.distinct_2 == 1.0


def test_distinct_ngram_diversity_short_docs_skip_bigrams(spark):
    from walex_spark.extensions.text import distinct_ngram_diversity

    rows = [(1, "solo", "s"), (2, "two words", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = distinct_ngram_diversity(df).collect()[0]
    # the 1-token doc contributes unigrams but no bigrams
    assert (r.n_tokens, r.n_bigrams) == (3, 1)
