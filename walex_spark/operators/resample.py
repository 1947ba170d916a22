"""Time-series resampling: regular grid + forward fill per entity.

Event streams are irregular; downstream feature pipelines want one
row per (entity, time slot) with the last observed value carried
forward across empty slots. This is `resample().ffill()` from the
single-node world, re-expressed as three bounded DataFrame stages:

  1. slot assignment — pure integer µs arithmetic (``(us - pmod(us,
     step)) / step`` is an exact multiple divided out — a true floor
     for any sign, bit-identical in any engine, unlike a floating
     floor-divide);
  2. last observation per (entity, slot) — one row_number window with
     a total-order tie-break, never ``last()`` over an unordered agg;
  3. per-entity dense grid via ``sequence(min_slot, max_slot)`` +
     left join, then ``last(value, ignorenulls)`` over the slot order
     to carry values forward.

Scale shape: everything partitions by entity — the grid explode is
map-side from a one-row-per-entity bounds aggregate, and the fill
window runs inside the same entity partitioning the join produced.
Grid size is bounded by span/step per entity; pick ``step`` so the
densest entity stays in memory (the same contract as any windowed
operator). The carried value is the original double — no arithmetic
touches it, so forward-filled outputs are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["resample_ffill", "epoch_micros"]


def epoch_micros(df: DataFrame, ts_col: str) -> "F.Column":
    """Exact epoch microseconds from either timestamp flavor.

    TIMESTAMP_NTZ admits no numeric cast (AnalysisException) and an
    NTZ→LTZ cast would reinterpret wall time in the session zone, so
    both flavors diff against an epoch literal of their OWN type —
    integer µs arithmetic, no zone in play."""
    dt = dict(df.dtypes)[ts_col]
    if dt == "timestamp_ntz":
        epoch = F.lit("1970-01-01 00:00:00").cast(T.TimestampNTZType())
        return F.timestamp_diff("MICROSECOND", epoch, F.col(ts_col))
    return F.unix_micros(F.col(ts_col))


def resample_ffill(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (entity, slot) from each entity's first to last
    observation; ``value`` is the latest observation in or before the
    slot (forward fill), ``filled`` marks carried rows.

    ``tiebreak_col`` orders same-timestamp observations (required for
    a deterministic "last"); defaults to the value column itself.
    """
    if step_seconds <= 0:
        raise ValueError("step_seconds must be > 0")
    step_us = step_seconds * 1_000_000
    tb = tiebreak_col or value_col

    us = epoch_micros(df, ts_col)
    # pmod, not %: Spark's % follows the dividend's sign, so plain
    # (us - us % step) truncates toward zero and pre-1970 timestamps
    # would collapse into a double-width slot 0; pmod keeps the
    # numerator an exact multiple of step for ANY sign (true floor)
    slot = ((us - F.pmod(us, F.lit(step_us))) / F.lit(step_us)).cast(
        T.LongType()
    )
    obs = df.select(
        F.col(entity_col).alias("entity"),
        slot.alias("slot"),
        F.col(value_col).alias("v"),
        F.col(tb).alias("tb"),
        us.alias("us"),
    )
    last_in_slot = (
        obs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("entity", "slot").orderBy(
                    F.col("us").desc(), F.col("tb").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("entity", "slot", "v")
    )
    bounds = obs.groupBy("entity").agg(
        F.min("slot").alias("s0"), F.max("slot").alias("s1")
    )
    grid = bounds.select(
        "entity", F.explode(F.sequence("s0", "s1")).alias("slot")
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_in_slot, ["entity", "slot"], "left")
        .select(
            F.col("entity").alias(entity_col),
            "slot",
            (F.col("slot") * F.lit(step_seconds)).cast(T.LongType()).alias(
                "slot_ts"
            ),
            F.last("v", ignorenulls=True).over(w).alias("value"),
            F.col("v").isNull().alias("filled"),
        )
    )
