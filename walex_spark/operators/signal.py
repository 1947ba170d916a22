"""Per-entity signal operators: exponentially-weighted moving average
and CUSUM change detection — the monitoring layer over an event
stream, engineered for bit-exact cross-engine replay.

Determinism rules (the queries.py conventions applied to recursions):

* EWMA is an inherently ORDERED recursion (acc = α·v + (1−α)·acc), so
  both engines evaluate the identical left fold over the identically
  ordered series: Spark seeds F.aggregate with element 1 and folds the
  tail; DuckDB's list_reduce does exactly that by construction. α must
  be exactly representable in binary (0.25, 0.5, 0.75, 2^-k) so the
  two-multiply-one-add step is the same IEEE sequence everywhere —
  pass 0.3 and the constructor refuses.
* CUSUM avoids recursion entirely: the cumulative deviation from the
  per-entity mean telescopes to ``n_e·cum_v − i·S_e`` (running sum and
  row index against per-entity totals), all integer micro-units, with
  the two products in DECIMAL(38,0) so extreme magnitudes cannot wrap
  — and the final BIGINT output cast guarded by an in-plan raise
  (loud at the exact row, never an opaque ANSI error or a silent
  pre-ANSI wrap).

Scale shape: both operators shuffle ONCE on the entity key. EWMA
collects each entity's series into one row (bounded by per-entity
event count — the same budget as sessionize/funnel); CUSUM stays
row-shaped with three window aggregates sharing the single partition
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from walex_spark.operators.resample import epoch_micros

__all__ = ["ewma_last", "cusum_flags"]

_DEC38 = T.DecimalType(38, 0)


def _is_binary_exact(alpha: float) -> bool:
    # exactly representable with a small denominator power of two
    return alpha == round(alpha * 1024) / 1024.0


def ewma_last(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Final EWMA per entity over its time-ordered series:
    acc_1 = v_1; acc_i = alpha*v_i + (1-alpha)*acc_{i-1}.

    Returns (entity_col, n_events, last_value, ewma). ``alpha`` must
    be binary-exact (k/1024) — see module docstring.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if not _is_binary_exact(alpha):
        raise ValueError(
            f"alpha {alpha} is not exactly representable in binary "
            "(use k/1024, e.g. 0.25): a rounded constant makes the "
            "recursion engine-dependent"
        )
    beta = 1.0 - alpha
    series = F.sort_array(
        F.collect_list(
            F.struct(
                epoch_micros(df, ts_col).alias("us"),
                F.col(tiebreak_col).alias("tb"),
                F.col(value_col).cast(T.DoubleType()).alias("v"),
            )
        )
    )
    g = df.groupBy(entity_col).agg(
        series.alias("__s"), F.count(F.lit(1)).alias("n_events")
    )
    # accumulator is the bare double (Spark's aggregate allows an acc
    # type different from the element type, unlike DuckDB's
    # list_reduce) — the per-step IEEE sequence alpha*v + beta*acc is
    # unchanged, without rebuilding a 3-field struct every step
    folded = F.aggregate(
        F.slice(F.col("__s"), 2, F.greatest(F.size("__s") - 1, F.lit(0))),
        F.element_at(F.col("__s"), 1)["v"],
        lambda acc, x: F.lit(alpha) * x["v"] + F.lit(beta) * acc,
    )
    return g.select(
        F.col(entity_col),
        F.col("n_events").cast(T.LongType()).alias("n_events"),
        F.element_at(F.col("__s"), -1)["v"].alias("last_value"),
        folded.alias("ewma"),
    )


def cusum_flags(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    threshold: float,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """CUSUM drift detection against each entity's own mean, closed
    form: cusum_i = Σ_{j<=i}(v_j − mean_e) = (n_e·cum_v − i·S_e)/n_e
    in exact micro-unit integers (kept SCALED by n_e — no division).
    A row flags when |n_e·cum_v − i·S_e| > threshold·1e6·n_e.

    Returns every event row with (entity, tiebreak, ts epoch µs,
    cusum_scaled as DECIMAL→BIGINT, flagged) — the monitoring signal a
    drifting sensor/source raises. One entity-key shuffle; the three
    window aggregates share it.
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0")
    v_micro = F.floor(F.col(value_col) * F.lit(1000000.0)).cast(T.LongType())
    base = df.select(
        F.col(entity_col),
        F.col(tiebreak_col).alias("tb"),
        epoch_micros(df, ts_col).alias("us"),
        v_micro.alias("vm"),
    )
    wall = Window.partitionBy(entity_col)
    word = (
        Window.partitionBy(entity_col)
        .orderBy("us", "tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_e = F.count(F.lit(1)).over(wall)
    s_e = F.sum("vm").over(wall)
    cum_v = F.sum("vm").over(word)
    i = F.row_number().over(Window.partitionBy(entity_col).orderBy("us", "tb"))
    cusum_scaled = (
        n_e.cast(_DEC38) * cum_v.cast(_DEC38)
        - i.cast(_DEC38) * s_e.cast(_DEC38)
    )
    bound = F.lit(int(threshold * 1000000)).cast(_DEC38) * n_e.cast(_DEC38)
    # the DECIMAL(38,0) products cannot wrap — but the BIGINT output
    # cast could. Fail loud at the exact row instead of crashing with
    # an opaque ANSI cast error (or, pre-ANSI, silently wrapping).
    i64 = F.lit((1 << 63) - 1).cast(_DEC38)
    safe_scaled = F.when(
        F.abs(cusum_scaled) <= i64, cusum_scaled
    ).otherwise(
        F.raise_error(
            F.lit(
                "cusum_flags: |n_e*cum_v - i*S_e| exceeds int64; "
                "rescale values or split the entity's history"
            )
        )
    )
    return base.select(
        F.col(entity_col),
        F.col("tb"),
        F.col("us"),
        safe_scaled.cast(T.LongType()).alias("cusum_scaled"),
        (F.abs(cusum_scaled) > bound).alias("flagged"),
    )
