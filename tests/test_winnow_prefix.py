"""Model tests for winnowing fingerprints and the prefix-filtered
exact-Jaccard join (extensions/dedup.py).

Both operators replay against pure-python references on seeded random
corpora: winnowing against a literal implementation of the standard
rightmost-min rule (Schleimer et al. 2003 §4), the prefix join against
the brute-force all-pairs threshold join it must equal exactly (the
filter is lossless by the All-Pairs pigeonhole lemma — any missing or
extra pair is a bug, not noise).
"""

import hashlib
import random

import pytest

from walex_spark.extensions import dedup


def _h32(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _py_winnow(text: str, k: int, window: int) -> set[tuple[int, int]]:
    """Reference winnowing: hash every k-gram of the lowered text,
    pick the min of each window of `window` consecutive hashes,
    rightmost on ties. 1-based positions."""
    t = text.lower()
    if len(t) < k + window - 1:
        return set()
    hashes = [_h32(t[i : i + k]) for i in range(len(t) - k + 1)]
    out = set()
    for s in range(len(hashes) - window + 1):
        frame = hashes[s : s + window]
        m = min(frame)
        # rightmost index holding the min
        pos = s + max(i for i, h in enumerate(frame) if h == m)
        out.add((pos + 1, m))
    return out


def _rand_docs(seed: int, n_docs: int, dup_every: int = 4):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = []
    for i in range(n_docs):
        if i % dup_every == 3 and docs:
            # near-dup of an earlier doc: mutate one word
            base = docs[rng.randrange(len(docs))][1].split()
            base[rng.randrange(len(base))] = rng.choice(vocab)
            docs.append((i, " ".join(base)))
        else:
            docs.append(
                (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 18))))
            )
    return docs


@pytest.mark.parametrize("seed,k,window", [(1, 5, 4), (2, 8, 8), (3, 4, 2)])
def test_winnow_matches_python_reference(spark, seed, k, window):
    docs = _rand_docs(seed, 12)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id, r.fp_pos, r.fp_hash)
        for r in dedup.winnow_fingerprints(df, k=k, window=window).collect()
    }
    want = {
        (i, pos, h) for i, text in docs for (pos, h) in _py_winnow(text, k, window)
    }
    assert got == want


def test_winnow_density_bounds(spark):
    # guaranteed density: every window selects one fingerprint, and
    # adjacent windows share winners — between 1/window and all
    # window-starts distinct positions survive
    docs = _rand_docs(7, 8)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k, window = 6, 5
    per_doc = {}
    for r in dedup.winnow_fingerprints(df, k=k, window=window).collect():
        per_doc[r.id] = per_doc.get(r.id, 0) + 1
    for i, text in docs:
        n_windows = len(text) - k + 1 - window + 1
        if n_windows <= 0:
            assert i not in per_doc
            continue
        assert 1 <= per_doc[i] <= n_windows


def test_winnow_rightmost_tie_break(spark):
    # a period-repeating string makes every k-gram hash recur: the
    # frame minimum appears twice in one window and the paper's
    # standard rule must keep the rightmost occurrence
    text = "abcabcabcabcabc"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {
        (r.fp_pos, r.fp_hash)
        for r in dedup.winnow_fingerprints(df, k=3, window=4).collect()
    }
    assert got == _py_winnow(text, 3, 4)


def test_winnow_validates(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must"):
        dedup.winnow_fingerprints(df, k=1)
    with pytest.raises(ValueError, match="window must"):
        dedup.winnow_fingerprints(df, window=1)


def test_winnow_pairs_counts_and_guard(spark):
    fps = spark.createDataFrame(
        # docs 0/1 share hashes 10,11; hash 99 is in every doc (hot)
        [(0, 1, 10), (0, 2, 11), (0, 3, 99), (1, 1, 10), (1, 5, 11),
         (1, 6, 99), (2, 1, 99)],
        "id long, fp_pos long, fp_hash long",
    )
    got = {
        (r.id_a, r.id_b, r.n_shared)
        for r in dedup.winnow_candidate_pairs(fps, min_shared=2).collect()
    }
    assert got == {(0, 1, 3)}
    # dropping hashes present in > 2 docs removes 99 → 0-1 share 2
    guarded = dedup.winnow_candidate_pairs(
        fps, min_shared=2, max_doc_freq=2
    ).collect()
    assert [(r.id_a, r.id_b, r.n_shared) for r in guarded] == [(0, 1, 2)]
    # winnow_sim uses post-guard set sizes: |A|=|B|=2, shared 2 → 1.0
    assert guarded[0].winnow_sim == 1.0


def _py_shingles(text: str, n: int = 3) -> set[str]:
    ws = [w for w in text.lower().split() if w]
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


@pytest.mark.parametrize("seed,num,den", [(11, 1, 2), (12, 7, 10), (13, 1, 3)])
def test_prefix_join_equals_bruteforce(spark, seed, num, den):
    docs = _rand_docs(seed, 20, dup_every=3)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in dedup.prefix_filter_jaccard_pairs(
            df, threshold_num=num, threshold_den=den
        ).collect()
    }
    sets = {i: _py_shingles(t) for i, t in docs}
    want = set()
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                it = len(sets[a] & sets[b])
                if den * it >= num * (len(sets[a]) + len(sets[b]) - it):
                    want.add((a, b))
    assert got == want


def test_prefix_join_boundary_inclusive(spark):
    # J exactly 1/2: sets {a b c, b c d} vs {b c d, c d e} share 1 of
    # 3 shingles → J = 1/3; craft an exact-1/2 case instead:
    # A = {x,y}, B = {x,z} → J = 1/3. Use containment: A = {x,y},
    # B = {x,y,z,w}... J = 2/4 = 1/2 exactly — must be INCLUDED.
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d e f")],  # shingles: 2 vs 4, inter 2
        "doc_id long, text string",
    )
    out = dedup.prefix_filter_jaccard_pairs(df, 1, 2).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(0, 1)]
    assert out[0].jaccard == 0.5


def test_rarest_first_window_is_keyed_by_token(spark):
    """The df window inside rarest_first_doc_tokens must partition by
    the TOKEN — this stage sits behind prefix_filter_jaccard_pairs'
    localCheckpoint, so the registry-wide global-window lint cannot
    see it; pin it here on the helper's own plan. An empty or
    wrong-keyed partition spec would serialize the token table
    through one task."""
    import re

    from walex_spark.plans import audit

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "b c d e")], "doc_id long, text string"
    )
    toks = dedup.word_shingles(df, 3, "text", "doc_id", dedupe=True)
    r = audit(dedup.rarest_first_doc_tokens(toks))
    specs = re.findall(
        r"Arguments: \[.*?windowspecdefinition\((.*?)\)", r.text
    )
    assert specs, "expected the by-token df Window in the plan"
    for spec in specs:
        assert "token#" in spec.split("specifiedwindowframe")[0]


def test_prefix_join_validates(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        dedup.prefix_filter_jaccard_pairs(df, 3, 2)
    with pytest.raises(ValueError, match="threshold"):
        dedup.prefix_filter_jaccard_pairs(df, 0, 2)


def test_winnow_hashes_only_equals_positions_path(spark):
    docs = _rand_docs(21, 14)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with_pos = dedup.winnow_fingerprints(df, k=5, window=4)
    hash_only = dedup.winnow_fingerprints(df, k=5, window=4, positions=False)
    a = {(r.id, r.fp_hash) for r in with_pos.collect()}
    b = {(r.id, r.fp_hash) for r in hash_only.collect()}
    assert a == b
    pairs_a = {
        tuple(r)
        for r in dedup.winnow_candidate_pairs(with_pos, min_shared=2).collect()
    }
    pairs_b = {
        tuple(r)
        for r in dedup.winnow_candidate_pairs(
            hash_only, min_shared=2, distinct_hashes=True
        ).collect()
    }
    assert pairs_a == pairs_b
