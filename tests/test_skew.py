"""Salting operators: equivalence with unsalted plans + plan shape."""

from pyspark.sql import functions as F

from walex_spark.operators.skew import salted_aggregate, salted_join
from walex_spark.plans import audit


def test_salted_aggregate_matches_plain(spark):
    # 90% of rows share one hot key
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        F.col("id").alias("v"),
    )
    plain = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.sum_v, r.count_v, r.min_v, r.max_v)
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "sum_v": F.sum("v"),
                "count_v": F.count(F.lit(1)),
                "min_v": F.min("v"),
                "max_v": F.max("v"),
            },
            salt_col="v",
            num_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    large = spark.range(0, 5_000).select(
        F.when(F.col("id") % 5 < 4, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = sorted((r.k, r.v, r.w) for r in large.join(small, "k").collect())
    salted = sorted(
        (r.k, r.v, r.w)
        for r in salted_join(large, small, "k", salt_col="v", num_salts=4).collect()
    )
    assert salted == plain


def test_salted_aggregate_two_stage_plan(spark):
    df = spark.range(0, 100).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    out = salted_aggregate(df, ["k"], {"sum_v": F.sum("v")}, salt_col="v", num_salts=4)
    r = audit(out)
    # two aggregation exchanges: (k, salt) then (k)
    assert r.shuffle_exchanges == 2


def test_salted_join_rejects_right_and_full(spark):
    """right/full would emit each unmatched small-side row once per
    salt bucket — the guard rejects them instead of silently duplicating."""
    import pytest
    from walex_spark.operators.skew import salted_join

    df = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(df, df, "k", "k", how=how)
    # the supported spellings still construct
    for how in ("inner", "left", "left_semi", "left_anti", "leftouter"):
        salted_join(df, df, "k", "k", how=how)
