"""duplicate_clusters convergence contract (extensions/dedup.py).

The oracle computes exact transitive closure; a propagation loop that
runs out of iterations with labels still moving would return silently
WRONG cluster ids. The operator must instead fail loudly.
"""

import pytest

from walex_spark.extensions import dedup


def _chain(spark, n):
    """A path graph 0-1-2-...-n: diameter n, worst case for min-label
    propagation (the 0 label walks one hop per round)."""
    nodes = spark.createDataFrame([(i,) for i in range(n + 1)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    return nodes, pairs


def test_clusters_converge_on_chain(spark):
    nodes, pairs = _chain(spark, 6)
    out = dedup.duplicate_clusters(nodes, pairs, max_iters=20).collect()
    assert {r.cluster_id for r in out} == {0}
    assert sum(r.is_survivor for r in out) == 1


def test_clusters_raise_on_exhausted_iters(spark):
    nodes, pairs = _chain(spark, 12)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(nodes, pairs, max_iters=2)


def _edit_pairs(spark, rows, max_dist):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.edit_distance_pairs(df, max_dist=max_dist)
    return {(r.id_a, r.id_b, r.dist) for r in out.collect()}


def test_edit_pairs_same_and_adjacent_buckets(spark):
    # max_dist=5 → bucket width 5. len("aaaaa")=5 (bucket 1),
    # len("aaaa")=4 (bucket 0): adjacent buckets, dist 1 — must be
    # found exactly once. len("aaaab")=5: same bucket as doc 0, dist 1.
    rows = [(0, "aaaaa"), (1, "aaaa"), (2, "aaaab"), (3, "zzzzzzzzzzzzzzzz")]
    got = _edit_pairs(spark, rows, 5)
    assert got == {(0, 1, 1), (0, 2, 1), (1, 2, 1)}


def test_edit_pairs_case_folded_and_threshold(spark):
    rows = [(0, "Hello World"), (1, "hello world"), (2, "hello world!")]
    got = _edit_pairs(spark, rows, 3)
    assert got == {(0, 1, 0), (0, 2, 1), (1, 2, 1)}


def test_edit_pairs_length_gap_blocks(spark):
    # length differs by more than max_dist → lev > max_dist anyway;
    # the pair must simply be absent (blocking is lossless).
    rows = [(0, "abc"), (1, "abcdefghijklmno")]
    assert _edit_pairs(spark, rows, 4) == set()


def test_edit_pairs_validates_and_plans_equi_join(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        dedup.edit_distance_pairs(df, max_dist=0)
    plan = (
        dedup.edit_distance_pairs(df, max_dist=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_mutual_triangles(spark):
    # graph: triangle {1,2,3}, square {4,5,6,7} without diagonals (no
    # triangle), plus pendant edge 3-9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (6, 7), (4, 7), (3, 9)],
        "id_a long, id_b long",
    )
    got = {(r.a, r.b, r.c) for r in dedup.mutual_triangles(pairs).collect()}
    assert got == {(1, 2, 3)}


def test_mutual_triangles_counts_each_once(spark):
    # K4: exactly 4 triangles, each reported once with a < b < c
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = sorted(
        (r.a, r.b, r.c) for r in dedup.mutual_triangles(pairs).collect()
    )
    assert got == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]


def test_duplicate_spans_cross_doc(spark):
    S = "abcdefghij" * 4  # 40 chars
    df = spark.createDataFrame(
        [
            (1, S + "X" + "uvwxyz" * 4),
            (2, "ZZZZZ" + S),
            (3, "completely different text with no forty char repeats at all....."),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in dedup.duplicate_spans(df, win_len=40).collect()
    )
    assert got == [(1, 1, 40, 40), (2, 6, 45, 40)]


def test_duplicate_spans_merge_and_split(spark):
    S = "abcdefghij" * 4
    df = spark.createDataFrame(
        [(1, S + S)], "doc_id long, text string"
    )
    # pos 1 and pos 41 hold the same window; 41 <= 1 + 40 merges
    got = [
        (r.span_start, r.span_end)
        for r in dedup.duplicate_spans(df, win_len=40).collect()
    ]
    assert got == [(1, 80)]
    # filler must not self-repeat ("Q"*50 holds 11 identical Q*40
    # windows that would legitimately bridge the two spans)
    import string

    filler = (string.ascii_uppercase + string.digits + "!@#$%^&*()[]{}")[:50]
    df2 = spark.createDataFrame(
        [(1, S + filler + S)], "doc_id long, text string"
    )
    got2 = sorted(
        (r.span_start, r.span_end)
        for r in dedup.duplicate_spans(df2, win_len=40).collect()
    )
    assert got2 == [(1, 40), (91, 130)]


def test_duplicate_spans_validates(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.duplicate_spans(df, win_len=1)
    with pytest.raises(ValueError):
        dedup.duplicate_spans(df, min_count=1)
    # docs shorter than the window produce no rows, not a crash
    assert dedup.duplicate_spans(df, win_len=40).count() == 0


def test_minhash_estimate_accuracy_properties(spark):
    """Identical docs estimate J=1 exactly; the estimate is always a
    multiple of 1/K; abs_err = |est - exact|."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " with a different tail here")],
        "doc_id long, text string",
    )
    out = dedup.minhash_estimate_accuracy(df).collect()
    rows = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in rows
    r12 = rows[(1, 2)]
    assert r12.n_match == 16 and r12.est_jaccard == 1.0
    assert r12.jaccard == 1.0 and r12.abs_err == 0.0
    for r in out:
        assert 0 <= r.n_match <= 16
        assert abs(r.abs_err - abs(r.est_jaccard - r.jaccard)) == 0.0


def _py_despan(docs, win_len=40, min_count=2):
    """Reference removal: mark every win_len window occurring >=
    min_count times corpus-wide, merge per doc (gap <= win_len), cut."""
    from collections import Counter

    wins = Counter()
    for _, t in docs:
        for i in range(len(t) - win_len + 1):
            wins[t[i : i + win_len]] += 1
    out = []
    for did, t in docs:
        marks = [
            i
            for i in range(len(t) - win_len + 1)
            if wins[t[i : i + win_len]] >= min_count
        ]
        spans = []
        for p in marks:
            if spans and p <= spans[-1][1] - win_len + 1 + win_len:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + win_len - 1))
            else:
                spans.append((p, p + win_len - 1))
        kept = []
        prev = 0
        for s, e in spans:
            kept.append(t[prev:s])
            prev = e + 1
        kept.append(t[prev:])
        clean = "".join(kept)
        out.append((did, clean, len(t) - len(clean)))
    return sorted(out)


def test_remove_spans_cut_and_passthrough(spark):
    S = "abcdefghij" * 4
    docs = [
        (1, S + "X" + "uvwxyz" * 4),
        (2, "ZZZZZ" + S + "TAIL"),
        (3, "completely different text with no forty char repeats at all....."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in dedup.remove_duplicate_spans(df).collect())
    assert got == _py_despan(docs)
    # doc 3 untouched
    assert got[2] == (3, docs[2][1], 0)


def test_remove_spans_fully_duplicated_doc_is_empty(spark):
    S = "abcdefghij" * 4
    df = spark.createDataFrame(
        [(1, S), (2, S)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in
           dedup.remove_duplicate_spans(df).collect()}
    assert got == {1: ("", 40), 2: ("", 40)}


def test_remove_spans_multiple_spans_one_doc(spark):
    import string

    S = "abcdefghij" * 4
    filler = (string.ascii_uppercase + string.digits + "!@#$%^&*()[]{}")[:50]
    docs = [(1, S + filler + S), (2, "pad" + S + "pad")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in dedup.remove_duplicate_spans(df).collect())
    assert got == _py_despan(docs)
    # doc 1 keeps exactly the filler
    assert got[0][1] == filler


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs — hand-computed weights on a 4-doc corpus
# ---------------------------------------------------------------------------


def test_tfidf_cosine_hand_case(spark):
    # 4 docs; 'the' appears in all 4 -> df=4 > 0.5*4? with
    # max_df_ratio=0.5 the cut is df <= 2, so 'the' (df=4) and 'cat'
    # (df=3) drop; 'sat','mat','dog','ran' (df<=2) survive.
    rows = [
        (1, "the cat sat sat"),
        (2, "the cat sat mat"),
        (3, "the dog ran"),
        (4, "the cat dog mat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.tfidf_cosine_pairs(df, max_df_ratio=0.5, min_cos=0.0, k=10)
    got = {(r.doc_a, r.doc_b): r for r in out.collect()}
    # surviving vocab: sat df=2 idf=hb(4//2)=hb(2)=2; mat df=2 idf=2;
    # dog df=2 idf=2; ran df=1 idf=hb(4)=4
    # doc1: sat tf2 -> w=4          |v1|^2 = 16
    # doc2: sat1 w2, mat1 w2        |v2|^2 = 8
    # doc3: dog1 w2, ran1 w4        |v3|^2 = 20
    # doc4: mat1 w2, dog1 w2        |v4|^2 = 8
    import math

    d12 = got[(1, 2)]
    assert d12.n_shared_terms == 1 and d12.dot_ww == 8
    assert d12.cos_sim == 8.0 / (math.sqrt(16.0) * math.sqrt(8.0))
    d24 = got[(2, 4)]
    assert d24.dot_ww == 4 and d24.n_shared_terms == 1
    d34 = got[(3, 4)]
    assert d34.dot_ww == 4
    # docs sharing only cut stop-terms produce NO pair
    assert (1, 3) not in got and (1, 4) not in got
    # ordering: cos desc with (doc_a, doc_b) tie-break
    cs = [r.cos_sim for r in out.collect()]
    assert cs == sorted(cs, reverse=True)


def test_tfidf_cosine_min_cos_filters(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, "delta epsilon zeta"),
        (4, "other words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.tfidf_cosine_pairs(df, max_df_ratio=0.9, min_cos=0.99, k=10)
    got = [(r.doc_a, r.doc_b) for r in out.collect()]
    assert got == [(1, 2)]  # identical docs: cos == 1.0 exactly


def test_tfidf_cosine_zero_idf_terms_dropped(spark):
    # 'the' has df=2 of n=3 -> n div df = 1 -> half-bit idf 0; docs made
    # only of such terms must not produce pairs (and must not 0/0)
    rows = [(1, "the the"), (2, "the"), (3, "unique tokens only")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.tfidf_cosine_pairs(df, max_df_ratio=1.0, min_cos=0.0, k=10)
    assert out.collect() == []


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs
# ---------------------------------------------------------------------------


def test_snm_window_and_jaccard(spark):
    # sort order by key: b1 (id 4), b2 (id 2), x1 (id 1), x2 (id 3)
    rows = [
        (1, "red blue green"),
        (2, "almost same words"),
        (3, "red blue yellow"),
        (4, "almost same words"),
    ]
    df = spark.createDataFrame(rows, "rid long, key string")
    out = dedup.sorted_neighborhood_pairs(
        df, key_col="key", id_col="rid", window=1, min_jaccard=0.0
    )
    got = {(r.id_a, r.id_b): (r.gap, r.key_jaccard) for r in out.collect()}
    # window=1: only adjacent ranks pair; sort is (key, id):
    # "almost same words"(4) < "almost same words"(2)? ids tiebreak: 2 < 4
    # order: (2), (4), (1), (3)
    assert set(got) == {(2, 4), (4, 1), (1, 3)}
    assert got[(2, 4)] == (1, 1.0)  # identical keys
    assert got[(1, 3)][1] == 2.0 / 4.0  # {red,blue} / {red,blue,green,yellow}
    assert got[(4, 1)][1] == 0.0  # disjoint keys still paired at window 1


def test_snm_min_jaccard_and_gap(spark):
    rows = [(i, f"word{i // 2} extra") for i in range(6)]
    df = spark.createDataFrame(rows, "rid long, key string")
    out = dedup.sorted_neighborhood_pairs(
        df, key_col="key", id_col="rid", window=3, min_jaccard=0.9
    )
    got = {(r.id_a, r.id_b): r.gap for r in out.collect()}
    # only the identical-key pairs survive 0.9; each pair is adjacent
    assert got == {(0, 1): 1, (2, 3): 1, (4, 5): 1}


def test_snm_rejects_bad_window(spark):
    df = spark.createDataFrame([(1, "a")], "rid long, key string")
    import pytest as _pt

    with _pt.raises(ValueError, match="window"):
        dedup.sorted_neighborhood_pairs(df, "key", "rid", window=0)


def test_exact_substr_decontam_asymmetric(spark):
    """Cross-corpus span decontamination (decontam.py::
    exact_substr_decontam): only TRAIN windows found in the BENCHMARK
    are cut — train-internal duplicates survive (that's despan's job),
    benchmark-verbatim spans are removed, clean docs pass through,
    and a fully-contaminated doc becomes ''."""
    from walex_spark.extensions.decontam import exact_substr_decontam

    secret = "S" * 45  # one 45-char benchmark passage
    filler = "f" * 50
    train = spark.createDataFrame(
        [
            (1, filler + secret + "x" * 50),      # contaminated middle
            (2, "clean " + "y" * 60),             # untouched
            (3, secret),                          # fully contaminated
            # train-internal duplicate pair - NOT in benchmark:
            (4, "dup" + "z" * 60),
            (5, "dup" + "z" * 60),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "intro " + secret + " outro")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in exact_substr_decontam(train, bench, win_len=40).collect()
    }
    assert len(out) == 5
    assert out[2].n_removed == 0 and out[2].clean_text.startswith("clean")
    assert out[3].clean_text == "" and out[3].n_removed == len(secret)
    # the contaminated middle is excised; flanks survive
    assert out[1].n_removed >= len(secret)
    assert "S" not in out[1].clean_text
    assert out[1].clean_text.startswith("f") and out[1].clean_text.endswith("x")
    # train-internal dup pair untouched (asymmetry vs despan)
    assert out[4].n_removed == 0 and out[5].n_removed == 0
