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


def test_cross_jaccard_contamination_hand_case(spark):
    from walex_spark.extensions.decontam import cross_jaccard_contamination

    train = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # shares most shingles with bench 1
            (2, "z y x w v u"),        # disjoint
            (3, "a b c d q r"),        # partial overlap
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "m n o p")], "doc_id long, text string"
    )
    out = {
        (r.train_id, r.bench_id): r.jaccard
        for r in cross_jaccard_contamination(
            train, bench, threshold_num=1, threshold_den=4, id_offset=100
        ).collect()
    }
    # train1 vs bench1: identical shingle sets -> J=1
    assert out[(1, 1)] == 1.0
    # train3 vs bench1: shingles {abc,bcd,cde,def} vs {abc,bcd,cdq,dqr}
    # -> it=2, union=6 -> 1/3 >= 1/4 kept
    assert abs(out[(3, 1)] - 2.0 / 6.0) < 1e-15
    # disjoint and bench2 pairs absent; no train-train pairs leak
    assert set(out) == {(1, 1), (3, 1)}


def test_cross_jaccard_offset_inferred_when_ids_collide(spark):
    from walex_spark.extensions.decontam import cross_jaccard_contamination

    # same doc_id=7 on both sides: inferred offset must keep them apart
    train = spark.createDataFrame([(7, "a b c d")], "doc_id long, text string")
    bench = spark.createDataFrame([(7, "a b c d")], "doc_id long, text string")
    out = cross_jaccard_contamination(
        train, bench, threshold_num=1, threshold_den=2
    ).collect()
    assert [(r.train_id, r.bench_id, r.jaccard) for r in out] == [(7, 7, 1.0)]
