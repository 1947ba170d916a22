"""Streaming trending tokens: MG recall across microbatches, window
finalization by watermark, state drop."""

import datetime as dt

from walex_spark.streaming.trending import trending_tokens_stream


def _write(spark, path, rows, mode):
    spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, s), t) for (s, t) in rows],
        "ts timestamp, text string",
    ).write.mode(mode).parquet(path)


def test_trending_window_finalized_by_watermark(spark, tmp_path):
    src = str(tmp_path / "txt")
    # window 0 (sec 0-9): 'hot' x6 across TWO microbatches, tail tokens
    _write(spark, src, [(1, "hot hot alpha"), (2, "hot beta")], "overwrite")
    stream = spark.readStream.schema("ts timestamp, text string").parquet(src)
    out = trending_tokens_stream(
        stream, "ts", "text", window_seconds=10, k=8, watermark="0 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("trend_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # window still open: nothing emitted
        assert spark.table("trend_out").count() == 0
        # second batch: more window-0 rows PLUS a row far past the
        # window end, advancing the watermark → window 0 finalizes
        _write(
            spark, src,
            [(3, "hot hot gamma"), (4, "hot"), (40, "later tokens")],
            "append",
        )
        q.processAllAvailable()
        # one more empty batch so the new watermark triggers timeouts
        _write(spark, src, [(41, "flush")], "append")
        q.processAllAvailable()
        rows = spark.table("trend_out").collect()
    finally:
        q.stop()
    got = {r.token: (r.est_count, r.window_total) for r in rows}
    # window total = 9 tokens; k=8 ≥ vocab, so MG kept exact counts
    assert got["hot"] == (6, 9)
    assert set(got) == {"hot", "alpha", "beta", "gamma"}


def test_trending_mg_recall_above_bound(spark, tmp_path):
    src = str(tmp_path / "txt2")
    # 40 tail singletons + 20 'hot': total 60, k=5 → bound 60/6 = 10;
    # 'hot' (20 > 10) MUST survive even with counters thrashing
    rows = [(i % 9, f"t{i} hot" if i % 2 == 0 else f"t{i}") for i in range(40)]
    _write(spark, src, rows, "overwrite")
    stream = spark.readStream.schema("ts timestamp, text string").parquet(src)
    out = trending_tokens_stream(
        stream, "ts", "text", window_seconds=10, k=5, watermark="0 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("trend_out2")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, src, [(50, "advance"), (51, "advance")], "append")
        q.processAllAvailable()
        _write(spark, src, [(52, "flush")], "append")
        q.processAllAvailable()
        slot0 = int(dt.datetime(2024, 1, 1).timestamp()) // 10
        rows_out = [
            r for r in spark.table("trend_out2").collect() if r.slot == slot0
        ]
    finally:
        q.stop()
    toks = {r.token for r in rows_out}
    assert "hot" in toks
    assert len(toks) <= 5  # state stayed bounded


def test_trending_validates(spark, tmp_path):
    import pytest

    stream = spark.readStream.schema("ts timestamp, text string").parquet(
        str(tmp_path)
    )
    with pytest.raises(ValueError):
        trending_tokens_stream(stream, "ts", "text", 0)
    with pytest.raises(ValueError):
        trending_tokens_stream(stream, "ts", "text", 10, k=1)
