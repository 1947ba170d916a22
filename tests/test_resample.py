"""resample_ffill semantics: grid, last-in-slot, forward fill."""

import datetime as dt

import pytest

from walex_spark.operators.resample import resample_ffill


def _df(spark, rows):
    return spark.createDataFrame(
        [(e, dt.datetime(2024, 1, d, h, m, 0), v) for (e, d, h, m, v) in rows],
        "entity long, ts timestamp_ntz, value double",
    )


def _out(df):
    return {
        (r.entity, r.slot, r.slot_ts, r.value, r.filled)
        for r in df.collect()
    }


def test_gap_filled_and_flagged(spark):
    # entity 1: events on Jan 1 and Jan 4 → Jan 2+3 carried forward
    df = _df(spark, [(1, 1, 10, 0, 5.0), (1, 4, 8, 0, 9.0)])
    out = _out(resample_ffill(df, "entity", "ts", "value", 86400))
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert out == {
        (1, d0, d0 * 86400, 5.0, False),
        (1, d0 + 1, (d0 + 1) * 86400, 5.0, True),
        (1, d0 + 2, (d0 + 2) * 86400, 5.0, True),
        (1, d0 + 3, (d0 + 3) * 86400, 9.0, False),
    }


def test_last_observation_in_slot_wins(spark):
    # two same-day events: the later timestamp wins the slot
    df = _df(spark, [(1, 1, 9, 0, 1.0), (1, 1, 17, 30, 2.0)])
    out = _out(resample_ffill(df, "entity", "ts", "value", 86400))
    assert len(out) == 1 and next(iter(out))[3] == 2.0


def test_entities_independent(spark):
    df = _df(spark, [(1, 1, 0, 0, 1.0), (2, 3, 0, 0, 7.0)])
    out = resample_ffill(df, "entity", "ts", "value", 86400)
    per_entity = {r.entity for r in out.collect()}
    assert per_entity == {1, 2}
    assert out.count() == 2  # one slot each — grids do not cross-fill


def test_hourly_step(spark):
    df = _df(spark, [(1, 1, 0, 5, 1.0), (1, 1, 3, 5, 4.0)])
    out = resample_ffill(df, "entity", "ts", "value", 3600)
    rows = sorted(
        (r.slot, r.value, r.filled) for r in out.collect()
    )
    assert len(rows) == 4  # hours 0..3
    assert [v for (_, v, _) in rows] == [1.0, 1.0, 1.0, 4.0]
    assert [f for (_, _, f) in rows] == [False, True, True, False]


def test_validates_step(spark):
    df = _df(spark, [(1, 1, 0, 0, 1.0)])
    with pytest.raises(ValueError):
        resample_ffill(df, "entity", "ts", "value", 0)


def test_pre_epoch_slots_floor_not_truncate(spark):
    """Pre-1970 timestamps must land in negative slots (true floor),
    not collapse into a double-width slot 0 via %'s dividend-sign
    truncation."""
    df = spark.createDataFrame(
        [
            (1, dt.datetime(1969, 12, 31, 12, 0, 0), 1.0),
            (1, dt.datetime(1970, 1, 1, 12, 0, 0), 2.0),
        ],
        "entity long, ts timestamp_ntz, value double",
    )
    out = sorted(
        (r.slot, r.value, r.filled)
        for r in resample_ffill(df, "entity", "ts", "value", 86400).collect()
    )
    assert out == [(-1, 1.0, False), (0, 2.0, False)]
