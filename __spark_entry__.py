"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in walex_spark/queries.py — one entry per
operator from SURVEY.md §2.9 plus the driver-mandated extensions.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# TESTDATA.md registers only the 8 star-schema tables as DuckDB views;
# documents/embeddings exist on disk but may have no view. The driver
# evaluates oracles at sf=0.01 only, so rewrite references to those two
# tables into self-contained read_parquet() calls. Local tools
# (tools/compare.py, tests) keep using the view-based ORACLES so they
# can run at any sf.
_DRIVER_SF_DIR = "/root/testdata/sf0.01"
_UNREGISTERED_TABLES = ("documents", "embeddings")


# Words that can follow "FROM <table>" without being an alias; the
# rewrite must not swallow them into the AS clause.
_NOT_ALIAS = frozenset(
    "where group order join on left right inner cross full union limit "
    "having qualify using natural anti semi asof except intersect "
    "window select values offset fetch tablesample pivot unpivot "
    "lateral sample positional".split()
)


def _self_contained(sql: str) -> str:
    # both FROM- and JOIN-position table references are substituted:
    # "FROM pred p JOIN documents d USING (...)" is as legal as the
    # FROM spelling, and missing it is a DuckDB catalog error the
    # EXPLAIN gate only surfaces after the oracle is written
    for t in _UNREGISTERED_TABLES:

        def repl(m: re.Match, t: str = t) -> str:
            kw = m.group(1).upper()
            scan = f"{kw} read_parquet('{_DRIVER_SF_DIR}/{t}.parquet')"
            alias = m.group(2)
            if alias and alias.lower() not in _NOT_ALIAS:
                # "FROM documents d" → keep the query's own alias.
                return f"{scan} AS {alias}"
            tail = f" {alias}" if alias else ""
            return f"{scan} AS {t}{tail}"

        sql = re.sub(
            rf"\b(FROM|JOIN) {t}\b(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?",
            repl,
            sql,
        )
    return sql


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from walex_spark.queries import QUERIES

    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from walex_spark.queries import QUERIES, driver_ordered

    # driver_ordered: the driver's hard correctness gate covers only
    # the first 50 entries; the window rotates each round (r05 =
    # relational/TPC-H set + touched-operator representatives).
    return driver_ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from walex_spark.queries import ORACLES, driver_ordered

    return driver_ordered(
        {name: _self_contained(sql) for name, sql in ORACLES.items()}
    )
