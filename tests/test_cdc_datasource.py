"""Custom streaming DataSource (walex_cdc): cursor offsets, range
partitions, exactly-once across appends, offset-ack file."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from walex_spark.model import CHANGE_ENVELOPE_SCHEMA
from walex_spark.sources.cdc_datasource import CdcPollingDataSource, CdcStreamReader

TS = dt.datetime(2024, 1, 15, 10, 30)


def _rows(lo, hi):
    return [
        ("INSERT", "public", "user", None, {"id": str(i)}, None, None, TS, 0, i, i, 0)
        for i in range(lo, hi)
    ]


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(CdcPollingDataSource)
    return spark


def test_stream_reads_exactly_once_across_appends(registered, tmp_path):
    spark = registered
    src = str(tmp_path / "table")
    ack = str(tmp_path / "ack.json")
    spark.createDataFrame(_rows(1, 11), CHANGE_ENVELOPE_SCHEMA).write.parquet(src)
    stream = (
        spark.readStream.format("walex_cdc")
        .option("path", src)
        .option("ackpath", ack)
        .option("numpartitions", "3")
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("cdc_src_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("cdc_src_out").count() == 10
        # upstream grows; only the new cursor window is read
        spark.createDataFrame(_rows(11, 16), CHANGE_ENVELOPE_SCHEMA).write.parquet(
            src, mode="append"
        )
        q.processAllAvailable()
        got = [r.lsn_lo for r in spark.table("cdc_src_out").collect()]
    finally:
        q.stop()
    assert sorted(got) == list(range(1, 16))  # no duplicates, no gaps
    # engine acked committed progress to the ack file (slot advance).
    # commit(end) fires as later batches finalize, so the ack can lag
    # the newest batch by one — monotone, never beyond processed data.
    assert json.load(open(ack))["cursor"] >= 10


def test_partition_planning_splits_cursor_window():
    r = CdcStreamReader(CHANGE_ENVELOPE_SCHEMA, {"path": "/nonexistent", "numpartitions": "4"})
    parts = r.partitions({"cursor": 0}, {"cursor": 100})
    assert len(parts) == 4
    assert parts[0].start == 0 and parts[-1].end == 100
    # contiguous, non-overlapping ranges
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start
    # degenerate window → one empty partition, no crash
    empty = r.partitions({"cursor": 5}, {"cursor": 5})
    assert len(empty) == 1 and empty[0].start == empty[0].end


def test_empty_source_reports_initial_offset(tmp_path):
    r = CdcStreamReader(
        CHANGE_ENVELOPE_SCHEMA, {"path": str(tmp_path / "missing"), "startcursor": "-1"}
    )
    assert r.latestOffset() == {"cursor": -1}
    assert r.initialOffset() == {"cursor": -1}


def test_latest_offset_uses_footer_stats(spark, tmp_path):
    """latestOffset must come from row-group statistics, not a data
    read: correct max across multiple files, and the stats path is
    actually taken (fragment fallback unused when footers carry
    min/max)."""
    src = str(tmp_path / "t")
    spark.createDataFrame(_rows(1, 51), CHANGE_ENVELOPE_SCHEMA).write.parquet(src)
    spark.createDataFrame(_rows(51, 91), CHANGE_ENVELOPE_SCHEMA).write.parquet(
        src, mode="append"
    )
    r = CdcStreamReader(CHANGE_ENVELOPE_SCHEMA, {"path": src})
    assert r.latestOffset() == {"cursor": 90}
    # every fragment resolves via stats (Spark writes min/max footers)
    import pyarrow.dataset as ds

    for frag in ds.dataset(src, format="parquet").get_fragments():
        assert r._fragment_max_from_stats(frag) is not None
