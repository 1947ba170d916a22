"""Miniature of the driver's t2 gate: every registered query runs at
sf0.001 and matches its DuckDB oracle exactly (tools/compare.py logic)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.compare import compare_frames, duck_connection  # noqa: E402

from walex_spark import queries as Q  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = Q.QUERIES[name](spark, SF_DIR).toPandas()
    if name not in Q.ORACLES:
        pytest.skip("rows-only query (no SQL oracle)")
    ddf = duck.execute(Q.ORACLES[name]).fetchdf()
    problems = compare_frames(sdf, ddf)
    assert not problems, problems


def test_approx_distinct_accuracy(spark):
    """q_approx_distinct's hash-checked surface is the boolean bounds
    verdict (raw HLL sketch values are engine-specific); pin the
    underlying accuracy contract here too: every group's verdict must
    be true, i.e. relative error within 3x the requested rsd."""
    rows = Q.QUERIES["q_approx_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.within_bound, (r.o_orderpriority, r.exact_custs)
