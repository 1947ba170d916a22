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
