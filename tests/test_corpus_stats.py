"""Pure-Python-replica / behavioral tests for the fourth-r08-session
operators (zipf_fit, char_entropy, source_overlap_matrix,
wordpiece_fertility, shard_manifest, token_burstiness, heaps_fit,
mmr_select, junk_rank_fusion, prf_expand_topk) — the hand-check
discipline every registry query carries next to its DuckDB oracle."""

import math
from collections import Counter

from pyspark.sql import functions as F

from walex_spark.extensions.text import char_entropy, zipf_fit


def _hb(r: int) -> int:
    r = min(r, (1 << 31) - 1)
    return (r * r).bit_length() - 1


def test_half_bits_is_floor_2log2():
    for r in (1, 2, 3, 4, 7, 8, 100, 12345):
        assert _hb(r) == math.floor(2 * math.log2(r)), r


def test_zipf_fit_replica(spark):
    rows = [
        (0, "a a a a b b c d", "s1"),
        (1, "a b b c c c", "s1"),
        (2, "x x y", "s2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["source"]: r.asDict() for r in zipf_fit(df).collect()}

    for src, texts in [("s1", ["a a a a b b c d", "a b b c c c"]),
                       ("s2", ["x x y"])]:
        cnt = Counter(t for s in texts for t in s.split())
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [(_hb(i + 1), _hb(c)) for i, (_, c) in enumerate(ordered)]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        g = got[src]
        assert (g["n_types"], g["sum_x"], g["sum_y"], g["sum_xy"],
                g["sum_xx"]) == (n, sx, sy, sxy, sxx), src
        den = n * sxx - sx * sx
        num = n * sxy - sx * sy
        if den:
            assert g["zipf_slope"] == num / den
            assert g["zipf_intercept"] == (sy - (num / den) * sx) / n
        else:
            assert g["zipf_slope"] is None


def test_zipf_slope_negative_on_zipfian_counts(spark):
    # counts 64, 32, 16, ... halve by rank: slope in half-bit space
    # is ~ -2 per rank-doubling (i.e. Zipf s=1)
    rows = [(i, " ".join(f"t{i:02d}" for _ in range(64 >> i)), "s")
            for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    slope = zipf_fit(df).collect()[0]["zipf_slope"]
    assert slope < -1.0


def test_char_entropy_replica(spark):
    rows = [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, "hello world")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in char_entropy(df).collect()}
    for doc_id, text in rows:
        cnt = Counter(text)
        n = len(text)
        total = sum(c * _hb(n // c) for c in cnt.values())
        g = got[doc_id]
        assert g["n_chars"] == n
        assert g["n_distinct_chars"] == len(cnt)
        assert g["total_half_bits"] == total, text
        assert g["half_bits_per_char"] == total / n


def test_char_entropy_extremes(spark):
    df = spark.createDataFrame(
        [(0, "zzzzzzzz"), (1, "abcdefgh")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert got[0]["total_half_bits"] == 0          # single-char run
    assert got[1]["half_bits_per_char"] == 6.0     # 8 uniform chars = 3 bits


def test_source_overlap_replica(spark):
    from walex_spark.extensions.decontam import source_overlap_matrix

    rows = [
        (0, "a b c d e", "s1"),        # grams: abc bcd cde
        (1, "a b c x y", "s1"),        # + abx? no: abc bcx cxy
        (2, "a b c d q", "s2"),        # abc bcd cdq
        (3, "z z z", "s3"),            # zzz
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    def sh3(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {}
    for _, t, s in rows:
        sets.setdefault(s, set()).update(sh3(t))
    got = {(r["source_a"], r["source_b"]): r.asDict()
           for r in source_overlap_matrix(df).collect()}
    expected_pairs = {
        (a, b)
        for a in sets for b in sets
        if a != b and sets[a] & sets[b]
    }
    assert set(got) == expected_pairs
    for (a, b), g in got.items():
        inter = len(sets[a] & sets[b])
        assert g["grams_a"] == len(sets[a])
        assert g["grams_b"] == len(sets[b])
        assert g["shared_grams"] == inter
        assert g["containment"] == inter / len(sets[a])
        assert g["jaccard"] == inter / len(sets[a] | sets[b])


def test_shard_manifest_replica(spark):
    import hashlib

    from walex_spark.operators.diff import shard_manifest

    rows = [(i, f"text-{i}", "en") for i in range(7)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r["shard"]: r.asDict() for r in shard_manifest(
        df, key_col="doc_id", hash_cols=["doc_id", "text", "lang"],
        shard_size=3,
    ).collect()}

    def rh(r):
        s = "|".join(str(v) for v in r)
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    shards = {}
    for r in rows:
        shards.setdefault(r[0] // 3, []).append(r)
    assert set(got) == set(shards)
    for s, members in shards.items():
        x = 0
        for m in members:
            x ^= rh(m)
        g = got[s]
        assert g["n_rows"] == len(members)
        assert g["min_key"] == min(m[0] for m in members)
        assert g["max_key"] == max(m[0] for m in members)
        assert g["xor_hash"] == x, s


def test_shard_manifest_order_free(spark):
    from walex_spark.operators.diff import shard_manifest

    rows = [(i, f"t{i}") for i in range(20)]
    a = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    b = spark.createDataFrame(rows[::-1], ["doc_id", "text"]).repartition(2)
    ma = sorted(shard_manifest(a, "doc_id", ["doc_id", "text"], 5).collect())
    mb = sorted(shard_manifest(b, "doc_id", ["doc_id", "text"], 5).collect())
    assert ma == mb


def test_wordpiece_fertility_consistent_with_segment(spark):
    from walex_spark.extensions.bpe import (
        wordpiece_fertility,
        wordpiece_segment,
    )

    rows = [
        (0, "alpha beta beta gamma", "s1", "en"),
        (1, "alpha alpha delta", "s1", "en"),
        (2, "epsilon zeta", "s2", "de"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source", "lang"])
    # slice totals must equal the per-doc totals summed per slice
    per_doc = {r["doc_id"]: r for r in wordpiece_segment(df).collect()}
    got = {(r["source"], r["lang"]): r.asDict()
           for r in wordpiece_fertility(df).collect()}
    agg = {}
    for doc_id, text, src, lang in rows:
        k = (src, lang)
        d = per_doc[doc_id]
        w, p = agg.get(k, (0, 0))
        agg[k] = (w + d["n_words"], p + d["n_pieces"])
    assert set(got) == set(agg)
    for k, (w, p) in agg.items():
        assert (got[k]["n_words"], got[k]["n_pieces"]) == (w, p), k
        assert got[k]["pieces_per_word"] == p / w
        chars = got[k]["n_word_chars"]
        assert chars == sum(
            len(t) for r in rows if (r[2], r[3]) == k for t in r[1].split()
        )
        assert got[k]["chars_per_piece"] == chars / p


def test_token_burstiness_replica(spark):
    from walex_spark.extensions.text import token_burstiness

    rows = [
        (0, "a a a a b"),      # 'a' clumps
        (1, "b c"),
        (2, "b c c"),
        (3, "b d"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["token"]: r.asDict()
           for r in token_burstiness(df, top_k=3).collect()}
    n = len(rows)
    per_doc = [Counter(t.split()) for _, t in rows]
    totals = Counter()
    for c in per_doc:
        totals.update(c)
    top3 = sorted(totals, key=lambda t: (-totals[t], t))[:3]
    assert set(got) == set(top3)
    for tok in top3:
        xs = [c.get(tok, 0) for c in per_doc]
        tot = sum(xs)
        ss = sum(x * x for x in xs)
        dfreq = sum(1 for x in xs if x)
        g = got[tok]
        assert (g["corpus_cnt"], g["df"], g["n_docs"], g["sum_sq"]) == (
            tot, dfreq, n, ss), tok
        assert g["vmr"] == (n * ss - tot * tot) / (n * tot)
        assert g["mean_count"] == tot / n
        assert g["mean_given_present"] == tot / dfreq
    # 'a' (4 in one doc) must be burstier than 'b' (1 in each of 4)
    assert got["a"]["vmr"] > got["b"]["vmr"]
    assert got["b"]["vmr"] == 0.0  # one occurrence in every doc: var = 0


def test_mmr_suppresses_near_duplicate(spark):
    from walex_spark.extensions.search import mmr_select

    rows = [
        # 0 and 1 are near-identical and both highly relevant to
        # "hash join"; 2 is less relevant but diverse
        (0, "hash join hash join fast merge"),
        (1, "hash join hash join fast merge extra"),
        (2, "hash probe build side partition"),
        (3, "totally unrelated text about cats"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # diversity-heavy lambda: at the default 0.7 the twin's much
    # higher BM25 score legitimately outweighs its 0.8 Jaccard to the
    # first pick; at 0.3 the redundancy penalty dominates
    got = [
        (r["pick"], r["doc_id"])
        for r in mmr_select(
            df, ["hash", "join"], k=3, pool=4, lambda_num=3,
        ).orderBy("pick").collect()
    ]
    picks = [d for _, d in got]
    assert picks[0] in (0, 1)            # most relevant first
    assert picks[1] == 2, picks          # diversity beats the twin
    assert len(picks) == 3 and picks[2] in (0, 1)


def test_mmr_reduces_to_relevance_order_at_lambda_one(spark):
    from walex_spark.extensions.search import bm25_topk, mmr_select

    rows = [(i, f"hash join term{i} " + "filler " * i) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    rel = [r["doc_id"] for r in
           bm25_topk(df, ["hash", "join"], k=4).orderBy("rnk").collect()]
    got = [r["doc_id"] for r in
           mmr_select(df, ["hash", "join"], k=4, pool=6,
                      lambda_num=1, lambda_den=1).orderBy("pick").collect()]
    assert got == rel


def test_heaps_fit_replica(spark):
    from walex_spark.extensions.text import heaps_fit

    rows = [
        (0, "a b c"),
        (1, "a b d d"),
        (2, "e f a a a"),
        (3, "a b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    g = heaps_fit(df).collect()[0].asDict()

    seen, ct, cv, pts = set(), 0, 0, []
    for _, t in rows:
        ws = t.split()
        ct += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                cv += 1
        pts.append((_hb(ct), _hb(cv)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    assert (g["n_points"], g["sum_x"], g["sum_y"], g["sum_xy"],
            g["sum_xx"]) == (n, sx, sy, sxy, sxx)
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    assert g["heaps_beta"] == num / den
    assert g["heaps_intercept"] == (sy - (num / den) * sx) / n


def test_heaps_beta_near_one_for_all_new_tokens(spark):
    # every token unique: V = n exactly, so in log-log space beta = 1
    from walex_spark.extensions.text import heaps_fit

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(8))) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    g = heaps_fit(df).collect()[0]
    assert g["heaps_beta"] == 1.0


def test_junk_fusion_ranks_degenerate_docs_first(spark):
    from walex_spark.extensions.search import junk_rank_fusion

    organic = [
        (i, f"the quick brown fox jumps over lazy dog number{i} "
            f"unique{i} words{i} vary{i}")
        for i in range(8)
    ]
    junk = [(100, "spam spam spam spam spam spam spam spam")]
    df = spark.createDataFrame(organic + junk, ["doc_id", "text"])
    top = junk_rank_fusion(df, top_k=3).orderBy("rnk").collect()
    # the degenerate doc tops all three signals, so it must lead
    assert top[0]["doc_id"] == 100
    assert top[0]["rank_rep"] == 1   # most repetitive
    assert top[0]["rank_ent"] == 1   # lowest char entropy
    assert top[0]["rank_sur"] == 1   # lowest surprisal
    # fused score of a triple rank-1: 3/61, written the fixed way
    assert top[0]["rrf_score"] == 1.0 / 61.0 + 1.0 / 61.0 + 1.0 / 61.0


def test_prf_expansion_widens_recall(spark):
    from walex_spark.extensions.search import bm25_topk, prf_expand_topk

    rows = [
        # feedback docs pair 'hash' with 'bucket'
        (0, "hash hash bucket probe"),
        (1, "hash bucket bucket build"),
        (2, "hash bucket probe build"),
        # doc 3 never says 'hash' but is all about 'bucket'
        (3, "bucket bucket bucket probe build"),
        (4, "completely unrelated cats and dogs"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base_ids = {r["doc_id"]
                for r in bm25_topk(df, ["hash"], k=5).collect()}
    prf_ids = {r["doc_id"]
               for r in prf_expand_topk(
                   df, ["hash"], fb_k=3, expand_k=2, k=5).collect()}
    assert 3 not in base_ids          # invisible to the raw query
    assert 3 in prf_ids               # recovered via expansion
    assert 4 not in prf_ids           # junk stays out


def test_dataset_card_replica(spark):
    from walex_spark.extensions.text import dataset_card

    rows = [
        (0, "a b c", "en", "s1"),
        (1, "a b c", "en", "s1"),      # exact dup of 0
        (2, "d e", "de", "s2"),
        (3, "f", "en", "s3"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    g = dataset_card(df).collect()[0].asDict()
    assert g["n_docs"] == 4
    assert g["n_tokens"] == 3 + 3 + 2 + 1
    assert g["total_chars"] == sum(len(t) for _, t, _, _ in rows)
    assert g["vocab_size"] == 6
    assert g["n_sources"] == 3 and g["n_langs"] == 2
    assert g["dup_groups"] == 3 and g["dup_docs"] == 1
    assert g["dup_rate"] == 1 / 4
    assert g["mean_doc_tokens"] == 9 / 4


def test_char_entropy_drops_empty_and_null(spark):
    from pyspark.sql import types as T2

    schema = T2.StructType([
        T2.StructField("doc_id", T2.LongType()),
        T2.StructField("text", T2.StringType()),
    ])
    df = spark.createDataFrame([(0, "abc"), (1, ""), (2, None)], schema)
    got = char_entropy(df).collect()
    assert [r["doc_id"] for r in got] == [0]


# ---------------------------------------------------------------------------
# Property tests (hypothesis) — the exact-arithmetic primitives behind
# the corpus-law fits and the manifest hash, checked against pure
# Python on arbitrary inputs (no Spark in the loop: the replica tests
# above already pin the distributed plumbing)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(min_value=1, max_value=1 << 62))
@settings(max_examples=300, deadline=None)
def test_half_bits_matches_exact_log_under_clamp(r):
    clamped = min(r, (1 << 31) - 1)
    assert _hb(r) == math.floor(2 * math.log2(clamped))


@given(st.lists(st.tuples(st.integers(0, 1 << 40),
                          st.integers(1, 1 << 20)), min_size=2, max_size=50))
@settings(max_examples=100, deadline=None)
def test_llsq_sums_fit_int64_and_slope_is_finite(pts):
    # the zipf/heaps sufficient-statistic bound: with x,y <= 62
    # half-bits, every sum stays far inside int64 for any n
    hpts = [(_hb(max(x, 1)), _hb(c)) for x, c in pts]
    n = len(hpts)
    sx = sum(x for x, _ in hpts)
    sy = sum(y for _, y in hpts)
    sxy = sum(x * y for x, y in hpts)
    sxx = sum(x * x for x, _ in hpts)
    for s in (sx, sy, sxy, sxx, n * sxy, n * sxx, sx * sy, sx * sx):
        assert abs(s) < (1 << 62)
    den = n * sxx - sx * sx
    if den:
        slope = (n * sxy - sx * sy) / den
        assert slope == slope  # finite, not NaN


@given(st.lists(st.tuples(st.integers(0, 10_000), st.text(max_size=30)),
                min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_xor_manifest_hash_is_order_and_partition_free(rows):
    import hashlib

    def rh(doc_id, text):
        s = f"{doc_id}|{text}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    fwd = 0
    for d, t in rows:
        fwd ^= rh(d, t)
    rev = 0
    for d, t in reversed(rows):
        rev ^= rh(d, t)
    # any 2-way split folds to the same value
    mid = len(rows) // 2
    a = 0
    for d, t in rows[:mid]:
        a ^= rh(d, t)
    b = 0
    for d, t in rows[mid:]:
        b ^= rh(d, t)
    assert fwd == rev == (a ^ b)
    # self-inverse: removing a row restores the pre-insert state
    if rows:
        d, t = rows[-1]
        assert (fwd ^ rh(d, t)) == rev ^ rh(d, t)


def test_manifest_diff_localizes_divergence(spark):
    from walex_spark.operators.diff import manifest_diff, shard_manifest

    rows_a = [(i, f"t{i}") for i in range(30)]
    rows_b = (
        [(i, f"t{i}") for i in range(10)]           # shard 0 identical
        + [(i, f"t{i}X" if i == 12 else f"t{i}")    # shard 1: one cell edit
           for i in range(10, 20)]
        + []                                        # shard 2 missing entirely
        + [(35, "new")]                             # shard 3 only in b
    )
    ma = shard_manifest(
        spark.createDataFrame(rows_a, ["doc_id", "text"]),
        "doc_id", ["doc_id", "text"], 10)
    mb = shard_manifest(
        spark.createDataFrame(rows_b, ["doc_id", "text"]),
        "doc_id", ["doc_id", "text"], 10)
    got = {r["shard"]: r.asDict() for r in manifest_diff(ma, mb).collect()}
    assert set(got) == {1, 2, 3}          # shard 0 silent
    assert got[1]["status"] == "changed" and got[1]["hash_match"] is False
    assert got[2]["status"] == "removed"
    assert got[3]["status"] == "added"
    # one-sided shards coalesce hash_match to False (not NULL), so
    # callers filtering hash_match == False see them too
    assert got[2]["hash_match"] is False
    assert got[3]["hash_match"] is False


def test_source_drift_psi_hand_replica(spark):
    from walex_spark.extensions.text import source_drift_psi

    # source X: 3 docs in bucket 0 (1 token), 1 doc in bucket 1
    # source Y: 2 docs in bucket 1 (10 tokens)
    rows = [
        (1, "a", "X"), (2, "b", "X"), (3, "c", "X"),
        (4, " ".join(["w"] * 10), "X"),
        (5, " ".join(["w"] * 10), "Y"), (6, " ".join(["w"] * 10), "Y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["source"]: r.asDict() for r in source_drift_psi(df).collect()}
    # corpus buckets: b0=3 docs, b1=3 docs; B=6; X: A=4, a0=3, a1=1
    # bucket0: aB=18, bA=12 -> hb=half_bits(18 div 12 = 1)=0, d=6
    # bucket1: aB=6,  bA=12 -> hb=-half_bits(2)=-2, d=-6
    assert got["X"]["n_docs"] == 4
    assert got["X"]["buckets_hit"] == 2 and got["X"]["zero_buckets"] == 0
    assert got["X"]["psi_num"] == 6 * 0 + (-6) * (-2) == 12
    assert abs(got["X"]["psi_half_bits"] - 12 / (4 * 6)) < 1e-12
    # Y: A=2, a0=0 (zero bucket -> hb saturates at -61, d=-3*2=-6),
    # a1=2: aB=12, bA=6 -> hb=half_bits(2)=2, d=6
    assert got["Y"]["zero_buckets"] == 1 and got["Y"]["buckets_hit"] == 1
    assert got["Y"]["psi_num"] == (-6) * (-61) + 6 * 2 == 378
    assert abs(got["Y"]["psi_half_bits"] - 378 / (2 * 6)) < 1e-12


def test_source_drift_ks_hand_replica(spark):
    from walex_spark.extensions.text import source_drift_ks

    # same fixture as the PSI replica: X = 3 docs of 1 token + 1 doc
    # of 10 tokens; Y = 2 docs of 10 tokens. corpus: b(1)=3, b(10)=3,
    # B=6. X (A=4): v=1 ca=3 ccum=3 -> d=|18-12|=6; v=10 d=|24-24|=0.
    # Y (A=2): v=1 ca=0 -> d=|0-6|=6; v=10 d=|12-12|=0.
    rows = [
        (1, "a", "X"), (2, "b", "X"), (3, "c", "X"),
        (4, " ".join(["w"] * 10), "X"),
        (5, " ".join(["w"] * 10), "Y"), (6, " ".join(["w"] * 10), "Y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["source"]: r.asDict() for r in source_drift_ks(df).collect()}
    assert got["X"]["n_docs"] == 4 and got["X"]["n_values"] == 2
    assert got["X"]["ks_num"] == 6 and got["X"]["ks_at"] == 1
    assert abs(got["X"]["ks_stat"] - 6 / 24) < 1e-12
    assert got["Y"]["ks_num"] == 6 and got["Y"]["ks_at"] == 1
    assert abs(got["Y"]["ks_stat"] - 6 / 12) < 1e-12


def test_source_drift_ks_tie_breaks_to_smallest_threshold(spark):
    from walex_spark.extensions.text import source_drift_ks

    # X: v=1 x2, v=3 x2; Y: v=2 x4. corpus b(1)=2, b(2)=4, b(3)=2,
    # B=8. X (A=4): v=1 d=|2*8-2*4|=8; v=2 d=|16-24|=8 (TIE);
    # v=3 d=0 -> the deterministic join-back must pick ks_at=1.
    rows = (
        [(i, "w", "X") for i in range(2)]
        + [(10 + i, "w w w", "X") for i in range(2)]
        + [(20 + i, "w w", "Y") for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["source"]: r.asDict() for r in source_drift_ks(df).collect()}
    assert got["X"]["ks_num"] == 8 and got["X"]["ks_at"] == 1
    assert got["X"]["n_values"] == 3


def test_source_drift_ks_identical_slices_score_zero(spark):
    from walex_spark.extensions.text import source_drift_ks

    rows = [
        (i + (100 if s == "Y" else 0), " ".join(["w"] * (5 if i % 2 else 25)), s)
        for s in ("X", "Y") for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    for r in source_drift_ks(df).collect():
        assert r["ks_num"] == 0 and r["ks_stat"] == 0.0
        # every threshold ties at d=0 -> smallest observed value
        assert r["ks_at"] == 5


def test_source_drift_psi_identical_slices_score_zero(spark):
    from walex_spark.extensions.text import source_drift_psi

    # both sources have the same shape -> every d numerator is 0
    rows = [
        (i, " ".join(["w"] * (5 if i % 2 else 25)), s)
        for s in ("X", "Y") for i in range(10)
    ]
    df = spark.createDataFrame(
        [(i + (100 if s == "Y" else 0), t, s) for i, t, s in rows],
        ["doc_id", "text", "source"],
    )
    for r in source_drift_psi(df).collect():
        assert r["psi_num"] == 0 and r["psi_half_bits"] == 0.0
        assert r["zero_buckets"] == 0
