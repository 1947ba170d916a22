"""Misra-Gries two-pass heavy hitters: exactness and recall bounds."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions.sketches import _mg_update, heavy_hitters


def _mg_run(stream, k):
    counters: dict[str, int] = {}
    for tok in stream:
        _mg_update(counters, tok, k)
    return counters


def test_mg_keeps_items_above_bound():
    # 100 'a' + 50 'b' + 150 singletons: n=300, k=5 → bound n/(k+1)=50.
    # 'a' (100 > 50) MUST survive any arrival order.
    stream = ["a"] * 100 + ["b"] * 50 + [f"x{i}" for i in range(150)]
    # adversarial order: singletons interleaved after the heavy runs
    for order in (stream, stream[::-1]):
        assert "a" in _mg_run(order, 5)


def test_mg_bounded_size():
    stream = [f"t{i}" for i in range(10_000)]
    assert len(_mg_run(stream, 8)) <= 8


def _truth(rows, denom):
    c = Counter()
    for (text,) in rows:
        for tok in text.lower().split():
            c[tok] += 1
    total = sum(c.values())
    return {(t, n) for t, n in c.items() if n * denom > total}


@pytest.mark.parametrize("n_parts", [1, 7])
def test_heavy_hitters_exact_at_any_partitioning(spark, n_parts):
    # skewed corpus: 'hot' dominates, 'warm' sits near the threshold,
    # long singleton tail
    rows = (
        [("hot hot hot warm tail%d" % i,) for i in range(30)]
        + [("hot cold%d cold%d" % (i, i + 1),) for i in range(30)]
    )
    df = spark.createDataFrame(rows, "text string").repartition(n_parts)
    got = {
        (r.token, r.cnt)
        for r in heavy_hitters(df, share_denom=20, k=25).collect()
    }
    assert got == _truth(rows, 20)


def test_heavy_hitters_validates():
    with pytest.raises(ValueError):
        heavy_hitters(None, share_denom=1)


def test_heavy_hitters_rejects_recall_breaking_k(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="exact recall"):
        heavy_hitters(df, share_denom=100, k=10)


def test_heavy_hitters_null_text(spark):
    df = spark.createDataFrame(
        [("a a a b",), (None,)], "text string"
    )
    got = {(r.token, r.cnt) for r in heavy_hitters(df, share_denom=2).collect()}
    assert got == {("a", 3)}


def test_heavy_hitters_recount_is_broadcast_semi(spark):
    """The exact recount must restrict via a BROADCAST semi-join on
    the bounded candidate set — a shuffled semi-join would drag the
    full exploded token table through an exchange, which is exactly
    what the sketch exists to avoid."""
    df = spark.createDataFrame(
        [("hot hot cold",), ("hot warm",)], "text string"
    )
    plan = (
        heavy_hitters(df, share_denom=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_heavy_hitters_tokenization_matches_jvm(spark):
    """Pass-1 (Python) and pass-2 (JVM) must tokenize identically:
    Unicode \\s in Python splits on NBSP, the JVM's ASCII \\s does
    not — a mismatch drops the heavy token from the candidate set and
    silently voids the recall guarantee."""
    rows = [("a b",)] * 10 + [("x y",)]
    df = spark.createDataFrame(rows, "text string")
    got = {(r.token, r.cnt) for r in heavy_hitters(df, share_denom=2).collect()}
    assert got == {("a b", 10)}


def test_count_min_matches_pure_python_replica(spark):
    import hashlib

    from walex_spark.extensions.sketches import count_min_estimates

    rows = [
        (1, "aa bb aa cc aa"),
        (2, "bb cc dd dd"),
        (3, "aa ee ff gg dd"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    depth, width = 3, 8  # narrow width forces collisions

    def bucket(r, tok):
        h = hashlib.md5(f"cms|{r}|{tok}".encode()).hexdigest()[:8]
        return int(h, 16) % width

    toks = [t for _, txt in rows for t in txt.split()]
    from collections import Counter

    exact = Counter(toks)
    sketch = Counter()
    for t in toks:
        for r in range(depth):
            sketch[(r, bucket(r, t))] += 1
    out = count_min_estimates(df, depth=depth, width=width, top_k=10).collect()
    assert len(out) == len(exact)  # 7 distinct <= top_k
    for row in out:
        est = min(sketch[(r, bucket(r, row.token))] for r in range(depth))
        assert row.exact_count == exact[row.token]
        assert row.cms_estimate == est
        assert row.overestimate == est - exact[row.token] >= 0
    # ordering: exact desc, token asc
    keys = [(-r.exact_count, r.token) for r in out]
    assert keys == sorted(keys)


def test_count_min_validates(spark):
    import pytest as _pt

    from walex_spark.extensions.sketches import count_min_estimates

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pt.raises(ValueError):
        count_min_estimates(df, depth=0)
    with _pt.raises(ValueError):
        count_min_estimates(df, width=1)
