"""Point-in-time (as-of) join — the state-lookup primitive a CDC
consumer needs: "what was the latest value for this key at time T?".

The reference materializes latest state per key (event.ex latest-record
semantics); an as-of join generalizes that to ANY probe timestamp, so
downstream training pipelines can do leakage-free point-in-time feature
lookups against a change stream (the classic feature-store join).

Spark has no ASOF JOIN operator (DuckDB/Pandas do), but the semantics
decompose into existing relational algebra — the union + windowed
last-value trick:

  1. tag probe rows (side=1) and state rows (side=0) and union them on
     a common schema (state payload columns are NULL on probe rows);
  2. one window, partitioned by key, ordered by (time, side, seq):
     ``last(payload, ignorenulls=True)`` carries the most recent state
     payload forward onto each probe row. ``side`` ordering makes a
     state row at exactly t visible to a probe at t (inclusive
     backward match — DuckDB `ON p.t >= s.t` parity);
  3. keep probe rows; optionally null out matches older than
     ``tolerance_seconds``.

Scale shape: exactly ONE shuffle (the window partitionBy on the join
key) — the same exchange a sort-merge join would pay; no broadcast,
no row explosion, no UDF, and the running-state frame is
unbounded-preceding/current-row so Spark evaluates it in a single
streaming pass per partition. Skewed keys degrade identically to any
keyed shuffle and respond to the same salting/AQE remedies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join"]


def asof_join(
    probes: DataFrame,
    state: DataFrame,
    on: str,
    probe_time: str = "ts",
    state_time: str = "ts",
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join: each probe row gains one state row with
    the same ``on`` key — ``direction='backward'`` (default) picks the
    greatest ``state_time`` <= ``probe_time``, ``'forward'`` (pandas
    merge_asof parity) the smallest ``state_time`` >= ``probe_time``;
    NULLs when no such state exists (LEFT semantics).

    Every probe column survives unchanged; every non-key, non-time
    state column arrives suffixed (``value`` -> ``value_asof``), plus
    ``<state_time><suffix>`` with the matched state timestamp.

    Determinism: ties among state rows at the same (key, time) are
    broken ARBITRARILY (window order is not total across them) —
    callers wanting a stable winner must pre-aggregate state to one
    row per (key, time) (e.g. ``max_by``), which is also what makes a
    SQL oracle's ASOF deterministic.

    ``tolerance_seconds``: matches farther than this from the probe
    (older for backward, later for forward) are nulled out (pandas
    ``merge_asof`` tolerance parity).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction={direction!r}")
    payload_cols = [c for c in state.columns if c not in (on, state_time)]
    if not payload_cols:
        raise ValueError("asof_join: state side has no payload columns")
    out_payload = [f"{c}{suffix}" for c in payload_cols]
    matched_time = f"{state_time}{suffix}"

    probe_cols = probes.columns
    # common union schema: key, time, side, probe payload, state payload
    p = probes.select(
        F.col(on).alias("__k"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in probe_cols],
        *[F.lit(None).cast(state.schema[c].dataType).alias(f"__s_{c}") for c in payload_cols],
        F.lit(None).cast(state.schema[state_time].dataType).alias("__s_t"),
    )
    s = state.select(
        F.col(on).alias("__k"),
        F.col(state_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_cols],
        *[F.col(c).alias(f"__s_{c}") for c in payload_cols],
        F.col(state_time).alias("__s_t"),
    )
    # state rows order before probe rows at equal time -> inclusive
    # match; forward scans time DESCENDING so "last state seen" is the
    # nearest state at-or-after the probe
    t_ord = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_ord, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = p.unionByName(s).select(
        *probe_cols,
        F.col("__side"),
        *[
            F.last(F.col(f"__s_{c}"), ignorenulls=True).over(w).alias(oc)
            for c, oc in zip(payload_cols, out_payload)
        ],
        F.last(F.col("__s_t"), ignorenulls=True).over(w).alias(matched_time),
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        # null out matches beyond the tolerance, including their timestamp
        gap = (
            F.col(probe_time) - F.col(matched_time)
            if direction == "backward"
            else F.col(matched_time) - F.col(probe_time)
        )
        # timestamp columns subtract to an INTERVAL; numeric (epoch
        # seconds) columns — which the rest of asof_join handles
        # transparently — subtract to a number, so the bound must
        # match the column type or the comparison throws AnalysisException
        if isinstance(probes.schema[probe_time].dataType, T.NumericType):
            bound = F.lit(float(tolerance_seconds))
        else:
            bound = F.expr(f"INTERVAL {float(tolerance_seconds)} SECONDS")
        fresh = F.col(matched_time).isNotNull() & (gap <= bound)
        out = out.select(
            *probe_cols,
            *[F.when(fresh, F.col(oc)).alias(oc) for oc in out_payload],
            F.when(fresh, F.col(matched_time)).alias(matched_time),
        )
    return out
