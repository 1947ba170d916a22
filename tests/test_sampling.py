"""Sampling / shard-packing invariants (extensions/sampling.py).

The contract is reproducibility: selection and shard assignment depend
only on row CONTENT (md5 buckets, ordered running sums), never on
partitioning, so replays, retries, and the DuckDB oracle agree."""

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions import sampling as sp

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_sample_partitioning_invariant(docs):
    a = {r.doc_id for r in sp.deterministic_sample(docs.repartition(1), 0.4, "doc_id").collect()}
    b = {r.doc_id for r in sp.deterministic_sample(docs.repartition(7), 0.4, "doc_id").collect()}
    assert a == b and a  # identical AND non-empty


def test_sample_fraction_monotone(docs):
    """A row kept at fraction f stays kept at every f' > f (nested
    samples — the property that lets you grow a sample without
    reshuffling data)."""
    s20 = {r.doc_id for r in sp.deterministic_sample(docs, 0.2, "doc_id").collect()}
    s60 = {r.doc_id for r in sp.deterministic_sample(docs, 0.6, "doc_id").collect()}
    assert s20 <= s60
    n = docs.count()
    assert 0 < len(s20) < len(s60) < n


def test_sample_rejects_bad_fraction(docs):
    with pytest.raises(ValueError):
        sp.deterministic_sample(docs, 1.5, "doc_id")
    with pytest.raises(ValueError):
        sp.stratified_sample(docs, {"en": -0.1}, "lang", "doc_id")


def test_stratified_rates_apply_per_stratum(docs):
    out = sp.stratified_sample(
        docs, {"en": 0.0, "de": 1.0}, "lang", "doc_id", default_rate=0.0
    ).collect()
    langs = {r.lang for r in out}
    assert langs == {"de"}  # en zeroed, others defaulted to 0
    n_de = docs.filter(F.col("lang") == "de").count()
    assert len(out) == n_de  # rate 1.0 keeps every row


def test_pack_shards_budget_and_order(docs):
    budget = 3000
    out = sp.pack_shards(docs, budget, "n_chars", "lang", "doc_id").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r.doc_id)
        running = 0
        for r in rows:
            assert r.shard_idx == running // budget, (lang, r.doc_id)
            running += r.cost
        # shard ids are dense from 0
        shards = sorted({r.shard_idx for r in rows})
        assert shards[0] == 0


def test_temperature_mixture_keeps_smallest_group_whole(spark):
    from walex_spark.extensions.sampling import temperature_mixture

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    kept = temperature_mixture(df, "grp").groupBy("grp").count().collect()
    by = {r.grp: r["count"] for r in kept}
    # rate(small) = sqrt(4/4) = 1.0 -> every row survives
    assert by.get("small") == 4
    # rate(big) = sqrt(4/400) = 0.1 -> md5-uniform keep near 10%
    assert 15 <= by.get("big", 0) <= 70
    # deterministic: same input, same kept set
    again = temperature_mixture(df, "grp").groupBy("grp").count().collect()
    assert {r.grp: r["count"] for r in again} == by


def test_weighted_bernoulli_monotone_and_deterministic(spark):
    from walex_spark.extensions.sampling import weighted_bernoulli_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate([1] * 200 + [100] * 200)],
        "doc_id long, w long",
    )
    kept = weighted_bernoulli_sample(df, "w", rate_at_max=1.0)
    counts = {
        r.w: r.n
        for r in kept.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # weight 100 == wmax → kept with probability 1; weight 1 → ~1%
    assert counts.get(100) == 200
    assert counts.get(1, 0) < 20
    # deterministic across invocations
    a = {r.doc_id for r in kept.collect()}
    b = {
        r.doc_id
        for r in weighted_bernoulli_sample(df, "w", rate_at_max=1.0).collect()
    }
    assert a == b


def test_weighted_bernoulli_drops_nonpositive_and_validates(spark):
    from walex_spark.extensions.sampling import weighted_bernoulli_sample

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, None), (4, 10)],
        "doc_id long, w int",
    )
    kept = {r.doc_id for r in weighted_bernoulli_sample(df, "w").collect()}
    assert kept <= {4} and 1 not in kept and 2 not in kept and 3 not in kept
    import pytest as _pytest

    with _pytest.raises(ValueError):
        weighted_bernoulli_sample(df, "w", rate_at_max=0.0)


def test_weighted_bernoulli_rejects_fractional_weights(spark):
    """A fractional weight column silently truncated to 0 in the
    integer acceptance test (0.9 -> every row dropped); the operator
    must refuse and point at the micro-unit rule instead."""
    from walex_spark.extensions.sampling import weighted_bernoulli_sample

    df = spark.createDataFrame([(1, 0.9)], "doc_id long, w double")
    with pytest.raises(ValueError, match="integer units"):
        weighted_bernoulli_sample(df, "w")


def test_weighted_bernoulli_rejects_overflowing_weights(spark):
    """Weights at or above 2^31 would wrap the int64 acceptance
    product u32 * w_max into engine-dependent garbage; the in-plan
    guard must raise instead of sampling wrong."""
    from walex_spark.extensions.sampling import weighted_bernoulli_sample

    df = spark.createDataFrame(
        [(1, 1 << 31), (2, 5)], "doc_id long, w long"
    )
    with pytest.raises(Exception, match="overflow"):
        weighted_bernoulli_sample(df, "w").collect()
    # just under the bound still works
    ok = spark.createDataFrame(
        [(1, (1 << 31) - 1), (2, (1 << 31) - 1)], "doc_id long, w long"
    )
    assert weighted_bernoulli_sample(ok, "w").count() == 2


def test_leakage_safe_folds_cluster_level(spark):
    """All members of a cluster share the fold; folds span [0, k)."""
    from walex_spark.extensions.sampling import leakage_safe_folds

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(70)], "doc_id long, cluster_id long"
    )
    out = leakage_safe_folds(df, n_folds=5).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.fold)
        assert r.split == ("test" if r.fold == 0 else "train")
        assert 0 <= r.fold < 5
    for folds in by_cluster.values():
        assert len(folds) == 1
    with pytest.raises(ValueError):
        leakage_safe_folds(df, n_folds=1)


def test_weighted_bernoulli_empty_input_returns_empty(spark):
    """Empty input (or all-NULL weights) must return empty, not trip
    the overflow guard on the NULL max."""
    from walex_spark.extensions.sampling import weighted_bernoulli_sample

    empty = spark.createDataFrame([], "doc_id long, w long")
    assert weighted_bernoulli_sample(empty, "w").count() == 0
    nulls = spark.createDataFrame([(1, None)], "doc_id long, w long")
    assert weighted_bernoulli_sample(nulls, "w").count() == 0


def test_dsir_python_replica(spark):
    """dsir_select's half-bit weights match an independent pure-Python
    replica of the hashed-bigram importance model."""
    import hashlib

    from walex_spark.extensions.sampling import dsir_select

    rows = [
        # target docs (is_t): "spark" style
        (1, True, "fast join fast join fast"),
        (2, True, "fast scan fast join"),
        # raw pool: doc 10 target-like, doc 11 alien vocabulary
        (10, False, "fast join fast scan"),
        (11, False, "slow walk slow walk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, is_t boolean, text string")
    out = {
        r.doc_id: r
        for r in dsir_select(
            df, target_pred=F.col("is_t"), n_buckets=64, k=10
        ).collect()
    }

    B = 64

    def bucket(w1, w2):
        return int(hashlib.md5(f"dsir|{w1} {w2}".encode()).hexdigest()[:8], 16) % B

    def hb2(x):
        x = min(x, (1 << 31) - 1)
        return (x * x).bit_length() - 1

    ct, cr, per_doc = {}, {}, {}
    for doc_id, is_t, text in rows:
        toks = text.split()
        for w1, w2 in zip(toks, toks[1:]):
            b = bucket(w1, w2)
            (ct if is_t else cr).__setitem__(b, (ct if is_t else cr).get(b, 0) + 1)
            if not is_t:
                per_doc.setdefault(doc_id, {})
                per_doc[doc_id][b] = per_doc[doc_id].get(b, 0) + 1
    buckets = set(ct) | set(cr)
    s = {b: hb2(ct.get(b, 0) + 1) - hb2(cr.get(b, 0) + 1) for b in buckets}
    k_const = hb2(sum(cr.values()) + B) - hb2(sum(ct.values()) + B)
    for doc_id, bc in per_doc.items():
        n = sum(bc.values())
        w = sum(cnt * s[b] for b, cnt in bc.items()) + n * k_const
        assert out[doc_id].weight_half_bits == w, doc_id
        assert out[doc_id].n_bigrams == n
    # target-like raw doc outranks the alien one
    assert out[10].rnk < out[11].rnk
    # target docs never appear in the output pool
    assert set(out) == {10, 11}


def test_dsir_validates_buckets(spark):
    from walex_spark.extensions.sampling import dsir_select

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_select(df, F.lit(True), n_buckets=1)


def test_token_budget_hamilton_exact(spark):
    from walex_spark.extensions.sampling import token_budget_allocation

    rows = [
        (1, "a b c d", "s1"),        # 4 tokens
        (2, "a b c d e f g h i", "s2"),  # 9 tokens
        (3, "a", "s3"),              # 1 token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    B = 100
    out = {r.source: r for r in token_budget_allocation(df, B).collect()}
    import math

    # weights: 2, 3, 1; W = 6 (exact in doubles)
    assert out["s1"].weight == 2.0 and out["s2"].weight == 3.0
    assert sum(r.alloc_tokens for r in out.values()) == B
    # shares: 33.33., 50, 16.66. -> base 33/50/16, rem=1 -> largest
    # frac .666 (s3)... s1 frac .333, s3 frac .666 -> s3 gets it
    assert out["s2"].alloc_tokens == 50
    assert out["s3"].alloc_tokens == 17
    assert out["s1"].alloc_tokens == 33
    assert out["s3"].epochs == 17.0 / 1.0


def test_token_budget_tie_breaks_to_smaller_group(spark):
    from walex_spark.extensions.sampling import token_budget_allocation

    # two identical groups, odd budget: equal fracs, tie -> sA
    rows = [(1, "x y", "sA"), (2, "p q", "sB")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r.alloc_tokens for r in token_budget_allocation(df, 7).collect()}
    assert out == {"sA": 4, "sB": 3}


def test_token_budget_validates(spark):
    import pytest as _pt

    from walex_spark.extensions.sampling import token_budget_allocation

    df = spark.createDataFrame([(1, "x", "s")], "doc_id long, text string, source string")
    with _pt.raises(ValueError):
        token_budget_allocation(df, -1)


def test_exact_stratified_split_quotas_exact(spark):
    from walex_spark.extensions.sampling import exact_stratified_split

    rows = [(i, f"t{i}", "A") for i in range(10)] + [
        (100 + i, f"u{i}", "B") for i in range(7)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = exact_stratified_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    assert len(out) == 17
    from collections import Counter

    cnt = Counter((r.source, r.split) for r in out)
    # A: n=10 -> base 8/1/1, rem 0
    assert cnt[("A", "train")] == 8 and cnt[("A", "val")] == 1
    assert cnt[("A", "test")] == 1
    # B: n=7 -> shares 5.6/0.7/0.7 -> base 5/0/0, rem 2 -> two largest
    # fracs (.7 val, .7 test; train .6 third) get +1
    assert cnt[("B", "train")] == 5 and cnt[("B", "val")] == 1
    assert cnt[("B", "test")] == 1


def test_exact_stratified_split_deterministic_and_disjoint(spark):
    from walex_spark.extensions.sampling import exact_stratified_split

    rows = [(i, f"t{i}", f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = {(r.doc_id): r.split for r in exact_stratified_split(df).collect()}
    b = {(r.doc_id): r.split for r in exact_stratified_split(df).collect()}
    assert a == b  # replay-stable
    assert len(a) == 30  # every row assigned exactly once


def test_exact_stratified_split_validates(spark):
    import pytest as _pt

    from walex_spark.extensions.sampling import exact_stratified_split

    df = spark.createDataFrame([(1, "x", "s")], "doc_id long, text string, source string")
    with _pt.raises(ValueError):
        exact_stratified_split(df, {"train": 0.5, "val": 0.1})
