"""operators/signal.py — EWMA fold and CUSUM closed form."""

import datetime as dt

import pytest

from walex_spark.operators.signal import cusum_flags, ewma_last


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, 0, i), uid, float(v))
            for i, (uid, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, value double",
    )


def test_ewma_matches_python_fold(spark):
    vals = [10.0, 20.0, 0.0, 40.0, 5.0]
    df = _ev(spark, [(1, v) for v in vals])
    row = ewma_last(df, "user_id", "ts", "value", alpha=0.25).first()
    acc = vals[0]
    for v in vals[1:]:
        acc = 0.25 * v + 0.75 * acc
    assert row.ewma == acc  # bit-exact
    assert row.last_value == 5.0 and row.n_events == 5


def test_ewma_single_event_and_validation(spark):
    df = _ev(spark, [(1, 42.0)])
    row = ewma_last(df, "user_id", "ts", "value").first()
    assert row.ewma == 42.0 and row.n_events == 1
    with pytest.raises(ValueError, match="binary"):
        ewma_last(df, "user_id", "ts", "value", alpha=0.3)
    with pytest.raises(ValueError):
        ewma_last(df, "user_id", "ts", "value", alpha=0.0)


def test_cusum_flags_drift(spark):
    # user 1: constant 10 -> cusum 0 everywhere, never flags;
    # user 2: five 0s then five 100s -> mean 50, cusum dips to -250
    rows = [(1, 10.0)] * 6 + [(2, 0.0)] * 5 + [(2, 100.0)] * 5
    df = _ev(spark, rows)
    out = cusum_flags(df, "user_id", "ts", "value", threshold=100.0).collect()
    u1 = [r for r in out if r.user_id == 1]
    assert all(r.cusum_scaled == 0 and not r.flagged for r in u1)
    u2 = sorted((r for r in out if r.user_id == 2), key=lambda r: r.us)
    # cusum (unscaled) after i zeros = -50*i; scaled by n_e=10
    expected = [-50 * i for i in range(1, 6)] + [
        -250 + 50 * i for i in range(1, 6)
    ]
    got = [r.cusum_scaled / (10 * 1000000) for r in u2]
    assert got == expected
    # flagged iff |cusum| STRICTLY exceeds 100 (the -100 boundary rows
    # at i=2 and i=8 stay unflagged)
    assert [r.flagged for r in u2] == [
        False, False, True, True, True, True, True, False, False, False
    ]


def test_ewma_stream_folds_to_batch(spark, tmp_path):
    """Streaming EWMA across two microbatches equals the batch fold
    over the full history, bit for bit (state carries the running acc
    and the tie order matches the batch series sort)."""
    import datetime as dt

    from walex_spark.streaming.postings import ewma_stream

    def rows(vals, start):
        return [
            (start + i, dt.datetime(2024, 1, 1, 0, 0, start + i), 1, float(v))
            for i, v in enumerate(vals)
        ]

    schema = "event_id long, ts timestamp_ntz, user_id long, value double"
    b1, b2 = rows([10.0, 20.0, 0.0], 0), rows([40.0, 5.0], 3)
    src = str(tmp_path / "ev")
    spark.createDataFrame(b1, schema).write.parquet(src)
    q = (
        ewma_stream(
            spark.readStream.schema(schema).parquet(src),
            "user_id", "ts", "value",
        )
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # atomic single-file publish: a live write.mode("append") can be
        # half-listed by the running stream, folding events out of order
        # (test_scd._atomic_append's race class)
        import glob as _glob
        import os as _os

        stage = str(tmp_path / "stage_b2")
        spark.createDataFrame(b2, schema).coalesce(1).write.parquet(stage)
        (part,) = _glob.glob(_os.path.join(stage, "part-*"))
        _os.rename(part, _os.path.join(src, _os.path.basename(part)))
        q.processAllAvailable()
        per_batch = spark.table("ewma_out").collect()
        # last emitted row for the entity = final ewma
        final = sorted(per_batch, key=lambda r: r.n_events)[-1]
    finally:
        q.stop()
    batch = ewma_last(
        spark.createDataFrame(b1 + b2, schema), "user_id", "ts", "value"
    ).first()
    assert final.ewma == batch.ewma  # bit-exact
    assert final.n_events == batch.n_events == 5
