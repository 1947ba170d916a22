"""Bucketed sink contract (sinks/bucketed.py): co-bucketed tables join
and aggregate with ZERO exchanges — the write-once-shuffle-never
layout a 100 TB key-keyed pipeline depends on."""

import contextlib

import pytest
from pyspark.sql import functions as F

from walex_spark.plans import audit
from walex_spark.sinks.bucketed import cobucket

SF_DIR = "/root/testdata/sf0.001"


@contextlib.contextmanager
def no_auto_broadcast(spark):
    """At sf0.001 everything fits Spark's broadcast threshold, which
    would hide the bucketing story behind BroadcastHashJoins; at the
    target scale neither side broadcasts, so audit with size-based
    auto-broadcast off — the same convention as test_plans."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # catalog tables land in the session's warehouse dir; unique names
    # keep reruns in one session independent
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cobucket(
        spark,
        {
            "bkt_orders": (orders, ["o_orderkey"]),
            "bkt_lineitem": (lineitem, ["l_orderkey"]),
        },
        num_buckets=8,
    )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_cobucketed_join_is_exchange_free(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    o = spark.table(t_orders)
    l = spark.table(t_lineitem)
    joined = o.join(l, o.o_orderkey == l.l_orderkey).select(
        "o_orderkey", "l_extendedprice"
    )
    with no_auto_broadcast(spark):
        r = audit(joined)
    assert r.shuffle_exchanges == 0, r.text
    assert r.sort_merge_joins == 1
    # and it actually computes the same rows as the plain-parquet join
    plain = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == plain


def test_bucketed_aggregation_is_exchange_free(spark, bucketed_tables):
    _, t_lineitem = bucketed_tables
    agg = spark.table(t_lineitem).groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert audit(agg).shuffle_exchanges == 0


def test_mismatched_bucket_counts_shuffle_one_side(spark, bucketed_tables):
    """The operational hazard the API guards against: joining against a
    differently-bucketed table reintroduces an exchange."""
    t_orders, _ = bucketed_tables
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy(
        "l_orderkey"
    ).format("parquet").saveAsTable("bkt_lineitem4")
    try:
        o = spark.table(t_orders)
        l4 = spark.table("bkt_lineitem4")
        joined = o.join(l4, o.o_orderkey == l4.l_orderkey)
        with no_auto_broadcast(spark):
            assert audit(joined).shuffle_exchanges >= 1
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem4")
