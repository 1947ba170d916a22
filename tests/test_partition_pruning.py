"""Partition-layout contract: a changelog written partitioned by day
prunes whole partitions at the scan for time-bounded queries — the
other half of the 100 TB storage story next to bucketing
(tests/test_bucketed.py)."""

from pyspark.sql import functions as F


def test_day_partitioned_changelog_prunes_at_scan(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("event_id"),
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias("day"),
            (F.col("id") % 7).alias("v"),
        )
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    bounded = spark.read.parquet(path).filter(
        F.col("day") == F.lit("2024-01-05").cast("date")
    )
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    # the day predicate must land in PartitionFilters (directory-level
    # pruning), NOT as a post-scan Filter over all partitions
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf, plan
    assert bounded.count() == 2000 // 30 + (1 if 4 < 2000 % 30 else 0)


def test_partition_plus_predicate_compose(spark, tmp_path):
    """Partition pruning and row-group predicate pushdown compose: the
    day bound prunes directories, the value bound reaches parquet
    PushedFilters within the surviving files."""
    path = str(tmp_path / "events_by_day2")
    ev = spark.range(0, 2000).select(
        F.col("id").alias("event_id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias("day"),
        (F.col("id") % 7).alias("v"),
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    q = spark.read.parquet(path).filter(
        (F.col("day") >= F.lit("2024-01-10").cast("date")) & (F.col("v") == 3)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "v" in pushed, plan
