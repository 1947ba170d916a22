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
