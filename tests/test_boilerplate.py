"""Unit tests for cross-document boilerplate detection/removal
(extensions/dedup.py::boilerplate_segments / strip_boilerplate) —
the RefinedWeb/CCNet line-level dedup analog at 8-word-segment
granularity, source-scoped."""

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions.dedup import (
    boilerplate_segments,
    strip_boilerplate,
)

HDR = "nav home about contact search login site acme"  # 8 words


def _docs(spark):
    # 4 docs in source s1 sharing an 8-word header, 1 clean doc, and a
    # doc in ANOTHER source with the same header (must not count
    # toward s1's threshold — source-scoped)
    rows = [
        (1, "s1", HDR + " alpha beta gamma delta one two three four"),
        (2, "s1", HDR + " epsilon zeta eta theta five six seven eight"),
        (3, "s1", HDR + " iota kappa lam mu nine ten eleven twelve"),
        (4, "s1", "totally original words that repeat nowhere else at all"),
        (5, "s2", HDR + " unique tail in the other source entirely here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_detects_source_scoped_boilerplate(spark):
    out = boilerplate_segments(_docs(spark), seg_words=8, min_docs=3)
    rows = {r["source"]: r for r in out.collect()}
    # s1: header appears in 3 docs >= min_docs -> 1 boilerplate segment
    assert rows["s1"]["n_boilerplate_segments"] == 1
    assert rows["s1"]["boilerplate_hits"] == 3
    # s2 has the header only once -> no boilerplate
    assert rows["s2"]["n_boilerplate_segments"] == 0
    # every doc is 16 words -> 2 segments each; s1 has 4 docs
    assert rows["s1"]["n_segments"] == 8
    assert rows["s2"]["n_segments"] == 2


def test_strip_removes_only_boilerplate(spark):
    out = strip_boilerplate(_docs(spark), seg_words=8, min_docs=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["kept_text"] == "alpha beta gamma delta one two three four"
    assert rows[1]["n_dropped"] == 1 and rows[1]["n_segs"] == 2
    # the clean doc and the other-source doc are untouched
    assert rows[4]["n_dropped"] == 0
    assert rows[5]["n_dropped"] == 0
    assert rows[5]["kept_text"].startswith(HDR)


def test_strip_fully_boilerplate_doc_becomes_empty(spark):
    rows = [(i, "s", HDR) for i in range(1, 4)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = strip_boilerplate(df, seg_words=8, min_docs=3).collect()
    assert all(r["kept_text"] == "" and r["n_dropped"] == 1 for r in out)


def test_short_tail_segment_counts(spark):
    # 10 words -> segments of 8 + 2; the 2-word tails are identical
    # across 3 docs -> tail segment is boilerplate too
    rows = [
        (1, "s", "a b c d e f g h shared tail"),
        (2, "s", "i j k l m n o p shared tail"),
        (3, "s", "q r s t u v w x shared tail"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    det = boilerplate_segments(df, seg_words=8, min_docs=3).collect()[0]
    assert det["n_segments"] == 6
    assert det["n_boilerplate_segments"] == 1  # the "shared tail" segment
    out = strip_boilerplate(df, seg_words=8, min_docs=3)
    r1 = {r["doc_id"]: r for r in out.collect()}[1]
    assert r1["kept_text"] == "a b c d e f g h"
