"""Bloom semi-join: no false negatives, exactness, plan posture."""

import pytest
from pyspark.sql import functions as F

from walex_spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)

M = 1 << 12  # 4096 bits — small enough to exercise collisions
K = 4


@pytest.fixture(scope="module")
def keyed(spark):
    right = spark.range(0, 500, 7).select(F.col("id").alias("k"))  # 72 keys
    left = spark.range(0, 2000).select(F.col("id").alias("k"))
    return left, right


def test_no_false_negatives(spark, keyed):
    left, right = keyed
    words = build_bloom(right, "k", M, K)
    members = right.withColumnRenamed("k", "m")
    missed = members.filter(
        ~bloom_might_contain(F.col("m"), words, M, K)
    ).count()
    assert missed == 0


def test_prefilter_prunes_most_non_members(spark, keyed):
    left, right = keyed
    words = build_bloom(right, "k", M, K)
    passed = left.filter(bloom_might_contain(F.col("k"), words, M, K)).count()
    # 72 real members must pass; false positives must stay a small
    # fraction of the 1928 non-members (m=4096,k=4,n=72 → fpr << 5%)
    assert passed >= 72
    assert passed <= 72 + 0.05 * 1928, passed


def test_semi_join_exact_despite_false_positives(spark, keyed):
    left, right = keyed
    got = {
        r.k for r in bloom_semi_join(left, right, "k", "k", M, K).collect()
    }
    expected = {
        r.k for r in left.join(
            right.distinct(), on="k", how="left_semi"
        ).collect()
    }
    assert got == expected


def test_null_keys_never_pass(spark):
    right = spark.createDataFrame([(1,), (None,)], "k long")
    left = spark.createDataFrame([(1,), (None,)], "k long")
    words = build_bloom(right, "k", M, K)
    out = left.filter(bloom_might_contain(F.col("k"), words, M, K))
    assert [r.k for r in out.collect()] == [1]


def test_build_partitioning_independent(spark):
    df = spark.range(200).select(F.col("id").alias("k"))
    assert build_bloom(df.repartition(1), "k", M, K) == build_bloom(
        df.repartition(13), "k", M, K
    )


def test_validates(spark):
    df = spark.range(4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        build_bloom(df, "k", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom(df, "k", m_bits=64, k=0)


def test_python_reference_matches_jvm_hash(spark):
    """_positions (pure python) must equal the JVM md5 double-hash the
    build and probe use — it is the documented reference for probing
    a shipped bitmap outside Spark."""
    from walex_spark.operators.bloom import _hash_cols, _positions

    vals = [0, 1, 42, 497, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    h1, h2 = _hash_cols(F.col("k"))
    rows = df.select(
        "k", *[((h1 + F.lit(j) * h2) % F.lit(M)).alias(f"p{j}") for j in range(K)]
    ).collect()
    for r in rows:
        assert [r[f"p{j}"] for j in range(K)] == _positions(str(r.k), M, K)


def test_bloom_prefilter_sits_below_the_join(spark, keyed):
    """The whole point: the sketch filter must run on the probe side
    BEFORE the join (scan-side), so only survivors reach the shuffle —
    and the join must stay a hash/merge semi-join, never a nested
    loop."""
    left, right = keyed
    plan = (
        bloom_semi_join(left, right, "k", "k", M, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    join_pos = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
    md5_pos = plan.find("md5")
    assert join_pos != -1 and md5_pos != -1
    # physical plans print operators top-down: a larger offset = deeper
    # in the tree = executed earlier; the md5 filter must be below the join
    assert md5_pos > join_pos, (join_pos, md5_pos)
