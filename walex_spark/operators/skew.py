"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two cases still need explicit salting at 100 TB:

  - aggregations where one group key dominates (AQE does not split a
    hash-aggregate partition);
  - joins whose build side is too big to broadcast AND whose probe side
    has hot keys, on engines/stages where AQE can't rewrite (e.g.
    stateful streaming stages).

Both forms here are deterministic (salt = pmod(hash(row-identity), N)),
so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, Column],
    salt_col: str | Column,
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups by (key, salt) — the hot key's rows spread over
    ``num_salts`` partitions; stage 2 re-aggregates the (tiny)
    per-salt partials by key. ``aggs`` maps output name → stage-1
    aggregate; stage 2 applies the matching re-combine (sum/min/max by
    name prefix; counts re-sum).

    Only algebraic aggregates (sum/count/min/max) decompose this way —
    the same constraint map-side partial aggregation has.

    ``salt_col``: any column with per-row variation (an id, an lsn);
    salting hashes it rather than using rand() so the plan stays
    deterministic and retries/replays produce identical results.
    """
    salt = F.pmod(
        F.hash(F.col(salt_col) if isinstance(salt_col, str) else salt_col),
        F.lit(num_salts),
    ).alias("__salt")
    stage1 = df.groupBy(*group_cols, salt).agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )

    def recombine(name: str) -> Column:
        p = F.col(f"__p_{name}")
        base = name.split("_", 1)[0]
        if base in ("min",):
            return F.min(p).alias(name)
        if base in ("max",):
            return F.max(p).alias(name)
        # sums and counts both re-combine by summation
        return F.sum(p).alias(name)

    return stage1.groupBy(*group_cols).agg(
        *[recombine(name) for name in aggs]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_col: str | Column,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated across ``num_salts``
    salt buckets so a hot join key's probe rows spread over N tasks.

    The large side salts deterministically from ``salt_col``; the small
    side explodes ×N (its size must tolerate the replication — this is
    the regime where it's too big to broadcast whole but N copies of
    the HOT KEYS' rows are fine). Equivalent rows to a plain join for
    the supported ``how`` values: inner/left/left_semi/left_anti (large
    side preserved exactly once). right/full would emit each unmatched
    SMALL-side row once per salt bucket — rejected rather than silently
    duplicated.
    """
    # normalized against every alias Spark's own JoinType accepts for
    # these four join shapes ('semi' == 'left_semi' == 'leftsemi', etc.)
    if how.lower().replace("_", "") not in {
        "inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"
    }:
        raise ValueError(
            f"salted_join how={how!r}: only inner/left/left_semi/left_anti "
            "preserve plain-join semantics (the exploded small side would "
            "duplicate unmatched rows under right/full)"
        )
    salt = F.pmod(
        F.hash(F.col(salt_col) if isinstance(salt_col, str) else salt_col),
        F.lit(num_salts),
    )
    l = large.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return l.join(s, [on, "__salt"], how).drop("__salt")
