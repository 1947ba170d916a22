"""duplicate_clusters convergence contract (extensions/dedup.py).

The oracle computes exact transitive closure; a propagation loop that
runs out of iterations with labels still moving would return silently
WRONG cluster ids. The operator must instead fail loudly.
"""

import pytest

from walex_spark.extensions import dedup


def _chain(spark, n):
    """A path graph 0-1-2-...-n: diameter n, worst case for min-label
    propagation (the 0 label walks one hop per round)."""
    nodes = spark.createDataFrame([(i,) for i in range(n + 1)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    return nodes, pairs


def test_clusters_converge_on_chain(spark):
    nodes, pairs = _chain(spark, 6)
    out = dedup.duplicate_clusters(nodes, pairs, max_iters=20).collect()
    assert {r.cluster_id for r in out} == {0}
    assert sum(r.is_survivor for r in out) == 1


def test_clusters_raise_on_exhausted_iters(spark):
    nodes, pairs = _chain(spark, 12)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(nodes, pairs, max_iters=2)
