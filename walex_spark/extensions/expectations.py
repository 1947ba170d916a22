"""Data-quality expectation checks over DataFrames.

A production pipeline guards its inputs with declarative expectations
(the Deequ / Great Expectations model): uniqueness, completeness,
accepted sets, value ranges, referential integrity. Each check here
compiles to ONE aggregate pass (or one key-partitioned anti-join for
referential integrity) and returns a single summary row
``(check_name, violations, passed)``; a suite is the union of those
one-row frames — metadata-sized regardless of input scale.

Scale notes (100 TB posture):
  - every non-RI check is a single map-side-combinable aggregate: no
    shuffle carries data rows, only partial counters;
  - uniqueness counts duplicate ROWS (n_rows - n_distinct_keys) via
    count_distinct, which Spark executes as a partial-distinct
    hash aggregate — one shuffle on the key, narrow rows;
  - referential integrity is a LEFT ANTI join on the key: Spark
    broadcasts the parent side when it is small, else sort-merge on
    co-partitioned keys; only violation counts leave the join.

The reference (cpursley/walex) has no validation layer; this module
covers the gap a user migrating a CDC pipeline onto an analytics
engine hits first: asserting the replicated tables are sane.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _summary(df: DataFrame, check: str, violations: Column) -> DataFrame:
    return df.agg(
        F.lit(check).alias("check_name"),
        violations.cast(T.LongType()).alias("violations"),
    ).select(
        "check_name",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def expect_unique(df: DataFrame, *cols: str, check: str | None = None) -> DataFrame:
    """Rows in excess of one per distinct key combination.

    Keys are compared with SQL GROUPING semantics (NULL equals NULL,
    one group) via count_distinct over a STRUCT of the columns — a
    bare count_distinct skips any row containing a NULL key, which
    would flag false violations on unique-but-nullable keys."""
    name = check or f"unique({', '.join(cols)})"
    return _summary(
        df,
        name,
        F.count(F.lit(1))
        - F.count_distinct(F.struct(*[F.col(c) for c in cols])),
    )


def expect_not_null(df: DataFrame, col: str, check: str | None = None) -> DataFrame:
    name = check or f"not_null({col})"
    return _summary(df, name, F.count(F.lit(1)) - F.count(F.col(col)))


def expect_in_set(
    df: DataFrame, col: str, values: list, check: str | None = None
) -> DataFrame:
    """Non-null values outside the accepted set."""
    name = check or f"in_set({col})"
    bad = F.col(col).isNotNull() & ~F.col(col).isin(values)
    return _summary(df, name, F.sum(bad.cast(T.LongType())))


def expect_between(
    df: DataFrame, col: str, lo, hi, check: str | None = None
) -> DataFrame:
    """Non-null values outside the closed interval [lo, hi]."""
    name = check or f"between({col})"
    bad = F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi))
    return _summary(df, name, F.sum(bad.cast(T.LongType())))


def expect_referential(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    check: str | None = None,
) -> DataFrame:
    """Child rows whose non-null key has no parent row (orphans)."""
    name = check or f"referential({child_key} -> {parent_key})"
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            on=child_key,
            how="left_anti",
        )
    )
    return _summary(orphans, name, F.count(F.lit(1)))


def run_suite(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check frames into the suite report.

    Each input is metadata-sized (one row), so the union is free; the
    heavy lifting happened inside each check's own aggregate.
    """
    if not checks:
        raise ValueError("run_suite needs at least one check")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def suppress_rare_groups(
    df: DataFrame, cols: list[str], k: int
) -> DataFrame:
    """k-anonymity suppression: drop every row whose combination of
    quasi-identifier ``cols`` occurs fewer than ``k`` times — the
    governance gate a dataset passes before leaving a trust boundary
    (rare combinations re-identify individuals).

    NULLs group with SQL GROUPING semantics (a NULL-keyed cohort of
    size >= k survives like any other). Scale shape: one
    map-side-combinable count aggregate on the quasi-identifier key,
    joined back as a LEFT SEMI on the same key — two shuffles that
    share the partitioning, data never widens.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    big = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= k)
        .select(*[F.col(c).alias(f"__k_{c}") for c in cols])
    )
    # null-SAFE semi-join: a plain USING equi-join would silently drop
    # every NULL-keyed row even when its cohort is large
    cond = None
    for c in cols:
        term = df[c].eqNullSafe(big[f"__k_{c}"])
        cond = term if cond is None else cond & term
    return df.join(big, cond, "left_semi")
