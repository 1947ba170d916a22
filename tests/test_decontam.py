"""Unit semantics for extensions/decontam.py (the sf0.001 oracle sweep
in test_queries.py covers the registered query end-to-end)."""

from walex_spark.extensions.decontam import ngram_contamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_counts(spark):
    corpus = _docs(
        spark,
        [
            # exactly the benchmark text: every trigram matches
            (1, "the quick brown fox jumps"),
            # shares the leading trigram only
            (2, "the quick brown dog sleeps all day"),
            # disjoint
            (3, "completely different words here"),
            # too short for a trigram -> no row
            (4, "two words"),
        ],
    )
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    out = {
        r.doc_id: r
        for r in ngram_contamination(corpus, bench, n=3, threshold=0.5).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].n_grams == 3 and out[1].n_contaminated == 3
    assert out[1].is_contaminated
    assert out[2].n_grams == 5 and out[2].n_contaminated == 1
    assert not out[2].is_contaminated
    assert out[3].n_contaminated == 0 and out[3].contamination_frac == 0.0


def test_duplicate_grams_count_once(spark):
    corpus = _docs(spark, [(1, "a b c a b c a b c")])
    bench = _docs(spark, [(9, "x a b c y")])
    row = ngram_contamination(corpus, bench, n=3).collect()[0]
    # 9 tokens -> 7 positional trigrams but only 3 distinct ("a b c",
    # "b c a", "c a b"); only "a b c" appears in the benchmark
    assert row.n_grams == 3
    assert row.n_contaminated == 1
