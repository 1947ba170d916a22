"""Guards added after two near-miss incidents:

1. r10's chunk-manifest addition silently SHADOWED q_doc_chunks in the
   registry for half a session (caught only by a manual audit) —
   `_register` now raises on a duplicate name, and the test proves the
   failure is loud.

2. r10's two red driver rows passed the local comparator because
   pandas' `==` equates Int64 42 with float64 42.0 while the driver's
   hash canonicalizer does not (`tools/compare.py:82` blind spot,
   VERDICT r10 #2) — `compare_frames` now fails on a dtype-CLASS
   mismatch, and the test pins the exact r10 shape (int Spark column
   vs HUGEINT-turned-float64 oracle column, equal values).

No SparkSession needed; pure driver-side logic.
"""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from tools.compare import compare_frames  # noqa: E402
from walex_spark.queries import _register  # noqa: E402


def test_duplicate_registration_fails_loud():
    @_register("_guard_probe_query")
    def probe(spark, sf_dir):  # pragma: no cover - never called
        return None

    try:
        with pytest.raises(ValueError, match="duplicate query registration"):

            @_register("_guard_probe_query")
            def probe2(spark, sf_dir):  # pragma: no cover - never called
                return None

    finally:
        from walex_spark.queries import ORACLES, QUERIES

        QUERIES.pop("_guard_probe_query", None)
        ORACLES.pop("_guard_probe_query", None)


def test_compare_frames_rejects_int_vs_float_dtype():
    # the exact r10 shape: values equal, dtype class differs (DuckDB
    # SUM(BIGINT) -> HUGEINT -> pandas float64 vs Spark int64)
    spark_side = pd.DataFrame({"source": ["a", "b"], "n_url": [42, 7]})
    oracle_side = pd.DataFrame({"source": ["a", "b"], "n_url": [42.0, 7.0]})
    problems = compare_frames(spark_side, oracle_side)
    assert problems, "Int64 vs float64 with equal values must be flagged"
    assert any("dtype" in p for p in problems)


def test_compare_frames_still_passes_matching_classes():
    a = pd.DataFrame({"k": ["x", "y"], "v": [1, 2], "f": [0.5, float("nan")]})
    b = pd.DataFrame({"k": ["x", "y"], "v": [1, 2], "f": [0.5, float("nan")]})
    assert compare_frames(a, b) == []
