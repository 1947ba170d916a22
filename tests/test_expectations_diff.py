"""Unit tests for the data-quality expectation suite and table_diff."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from walex_spark.extensions import expectations as dq
from walex_spark.operators.diff import table_diff


def _suite_map(df):
    return {r["check_name"]: (r["violations"], r["passed"]) for r in df.collect()}


def test_expectation_checks_count_violations(spark):
    t = spark.createDataFrame(
        [
            Row(k=1, v="a", x=5.0),
            Row(k=1, v="a", x=50.0),   # dup key, x out of range
            Row(k=2, v=None, x=None),  # null v (not_null), null x ignored
            Row(k=3, v="z", x=-1.0),   # v out of set, x out of range
        ]
    )
    report = dq.run_suite(
        [
            dq.expect_unique(t, "k", check="u"),
            dq.expect_not_null(t, "v", check="n"),
            dq.expect_in_set(t, "v", ["a", "b"], check="s"),
            dq.expect_between(t, "x", 0.0, 10.0, check="r"),
        ]
    )
    m = _suite_map(report)
    assert m == {
        "u": (1, False),
        "n": (1, False),
        "s": (1, False),
        "r": (2, False),
    }


def test_expectation_referential_orphans_and_null_keys(spark):
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=1), Row(fk=9), Row(fk=None)]
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    m = _suite_map(
        dq.expect_referential(child, "fk", parent, "pk", check="ri")
    )
    # fk=9 twice? no — one orphan row; NULL fk is excluded by contract
    assert m == {"ri": (1, False)}


def test_expectation_all_green(spark):
    t = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    m = _suite_map(
        dq.run_suite(
            [
                dq.expect_unique(t, "k"),
                dq.expect_not_null(t, "v"),
                dq.expect_in_set(t, "v", ["a", "b"]),
            ]
        )
    )
    assert all(viol == 0 and ok for viol, ok in m.values())


def test_run_suite_empty_raises():
    with pytest.raises(ValueError):
        dq.run_suite([])


def _rows(df):
    return {
        (r["k"], r["status"], r["n_changed_cols"]) for r in df.collect()
    }


def test_table_diff_classifies(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),   # unchanged
            Row(k=2, a="x", b=1.0),   # changed: b
            Row(k=3, a="x", b=1.0),   # removed
            Row(k=4, a=None, b=1.0),  # changed: a null -> value
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),
            Row(k=2, a="x", b=2.0),
            Row(k=4, a="y", b=1.0),
            Row(k=5, a="z", b=0.0),   # added
        ]
    )
    out = table_diff(old, new, ["k"])
    assert _rows(out) == {
        (2, "changed", 1),
        (3, "removed", 0),
        (4, "changed", 1),
        (5, "added", 0),
    }


def test_table_diff_null_equals_null(spark):
    old = spark.createDataFrame([Row(k=1, a=None)], "k INT, a STRING")
    new = spark.createDataFrame([Row(k=1, a=None)], "k INT, a STRING")
    assert table_diff(old, new, ["k"]).count() == 0


def test_table_diff_validates_inputs(spark):
    df = spark.createDataFrame([Row(k=1, a=1)])
    with pytest.raises(ValueError):
        table_diff(df, df, [])
    with pytest.raises(ValueError):
        table_diff(df, df.select("k"), ["k"], ["a"])


def test_table_diff_single_equi_join_plan(spark):
    """The diff must stay ONE equi full-outer join — never a nested-loop
    or cross product (the 100 TB guard)."""
    old = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("a")
    )
    new = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    plan = table_diff(old, new, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_count_distinct_over_null_correction(spark):
    """The dense_rank identity must subtract the NULL tie-group:
    COUNT(DISTINCT) skips NULLs, dense_rank counts them."""
    from pyspark.sql import Row

    from walex_spark.functions.windows import count_distinct_over

    df = spark.createDataFrame(
        [
            Row(p=1, x=10), Row(p=1, x=10), Row(p=1, x=20), Row(p=1, x=None),
            Row(p=2, x=None), Row(p=2, x=None),
            Row(p=3, x=5),
        ],
        "p INT, x INT",
    )
    got = {
        (r.p, r.n)
        for r in df.select(
            "p", count_distinct_over("x", ["p"]).alias("n")
        ).distinct().collect()
    }
    assert got == {(1, 2), (2, 0), (3, 1)}


def test_pagerank_int_hand_computed(spark):
    """Integer PR on a 3-node graph against hand-computed ranks:
    A->B only; C isolated. Base mass = 150000, damping 85/100."""
    from pyspark.sql import Row

    from walex_spark.operators.graph import pagerank_int

    nodes = spark.createDataFrame([Row(id=i) for i in (1, 2, 3)])
    edges = spark.createDataFrame([Row(src=1, dst=2)])
    # iter1: r(1)=150000, r(2)=150000+850000=1000000, r(3)=150000
    # iter2: r(2)=150000+floor(150000*85/100)=277500
    r2 = {
        r.id: r.rank
        for r in pagerank_int(nodes, edges, iters=2).collect()
    }
    assert r2 == {1: 150000, 2: 277500, 3: 150000}


def test_pagerank_int_validates(spark):
    from pyspark.sql import Row

    from walex_spark.operators.graph import pagerank_int

    nodes = spark.createDataFrame([Row(id=1)])
    edges = spark.createDataFrame([Row(src=1, dst=1)])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank_int(nodes, edges, iters=0)
    with _pytest.raises(ValueError):
        pagerank_int(nodes, edges, damping_pct=100)


def test_expect_unique_null_keys_use_grouping_semantics(spark):
    """NULL keys group like SQL DISTINCT (one group per NULL combo) —
    a unique-but-nullable key column must pass its uniqueness gate."""
    from pyspark.sql import Row

    t = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=1, b=2), Row(a=None, b=None)],
        "a INT, b INT",
    )
    m = _suite_map(dq.expect_unique(t, "a", "b", check="u"))
    assert m == {"u": (0, True)}
    dup = spark.createDataFrame(
        [Row(a=None, b=None), Row(a=None, b=None)], "a INT, b INT"
    )
    m2 = _suite_map(dq.expect_unique(dup, "a", "b", check="u"))
    assert m2 == {"u": (1, False)}


def test_suppress_rare_groups_nullsafe_and_threshold(spark):
    from walex_spark.extensions.expectations import suppress_rare_groups

    rows = (
        [("a", 1)] * 5          # cohort (a) size 5 -> survives k=3
        + [("b", 2)] * 2        # size 2 -> suppressed
        + [(None, 3)] * 4       # NULL cohort size 4 -> MUST survive
    )
    df = spark.createDataFrame(rows, "qid string, payload int")
    kept = suppress_rare_groups(df, ["qid"], k=3).collect()
    by = {}
    for r in kept:
        by[r.qid] = by.get(r.qid, 0) + 1
    assert by == {"a": 5, None: 4}
    import pytest as _p

    with _p.raises(ValueError):
        suppress_rare_groups(df, ["qid"], k=0)
