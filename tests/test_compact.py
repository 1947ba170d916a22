"""Compaction sink (sinks/compact.py): small files merge to the size
target, rows survive exactly, and key-clustered output prunes files
via parquet min/max."""

import os

from pyspark.sql import functions as F

from walex_spark.sinks.compact import compact_parquet, plan_compaction


def _parquet_files(path):
    out = []
    for root, _d, names in os.walk(path):
        out += [
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        ]
    return out


def _fragmented(spark, path, n_files=40):
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compaction_merges_to_target_and_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    _fragmented(spark, src)
    before = plan_compaction(src, target_file_bytes=1 << 30)
    assert before["n_files"] == 40
    plan = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert plan["target_files"] == 1
    assert len(_parquet_files(dst)) == 1
    # exact row preservation, not just counts
    a = spark.read.parquet(src).orderBy("k").collect()
    b = spark.read.parquet(dst).orderBy("k").collect()
    assert a == b


def test_clustered_compaction_enables_file_pruning(spark, tmp_path):
    src, dst = str(tmp_path / "frag2"), str(tmp_path / "clustered")
    _fragmented(spark, src)
    # force 4 output files; range partitioning on k gives each file a
    # disjoint k range
    sizes = plan_compaction(src)["total_bytes"]
    compact_parquet(spark, src, dst, cluster_key="k", target_file_bytes=sizes // 4)
    files = _parquet_files(dst)
    assert len(files) >= 4
    # each file's k-range must be disjoint: collect per-file min/max
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(F.min("k"), F.max("k")).collect()[0]
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping key ranges: {ranges}"
    # and the scan with a point predicate matches the plain read
    assert (
        spark.read.parquet(dst).filter(F.col("k") == 1234).count()
        == spark.read.parquet(src).filter(F.col("k") == 1234).count()
    )
