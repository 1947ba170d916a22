"""Iterative graph algorithms as DataFrame loops, cross-engine exact.

PageRank's usual float damping makes results engine- and
order-dependent; this implementation runs the iteration in scaled
INTEGER arithmetic — rank mass in millionths, damping as the rational
85/100, per-edge contribution ``floor(r * 85 / (100 * outdeg))`` — so
every engine that can floor-divide integers produces identical bits.
The floor division is spelled ``(n - n % d) / d``: the numerator is an
exact multiple of d, making the double division exact (same trick as
the resample slot math).

Plan shape per iteration: contributions = edges ⋈ ranks on src (both
sides key-partitioned), one map-side-combined sum per dst, one left
join back to the node set — the standard distributed PR step. Ranks
are localCheckpointed each round (same lineage-cut discipline as
duplicate_clusters) so the plan does not grow with iterations. No
dangling-mass redistribution: callers pass a graph where ranked nodes
have outdegree >= 1 (a symmetrized similarity graph always does);
isolated nodes keep the base mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pagerank_int"]


def _floordiv(num, den):
    return ((num - num % den) / den).cast(T.LongType())


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """``nodes(id)``, directed ``edges(src, dst)`` → (id, rank) after
    ``iters`` synchronous iterations; rank is in units of 1/scale.

    r_0 = scale for every node;
    r_{t+1}(v) = floor(scale*(100-d)/100)
                 + Σ_{u→v} floor(r_t(u) * d / (100 * outdeg(u)))
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 1 <= damping_pct <= 99:
        raise ValueError("damping_pct must be in [1, 99]")
    base = scale * (100 - damping_pct) // 100

    # every iteration joins the edge set; without a lineage cut the
    # (possibly expensive) edge-producing subtree re-executes per
    # consumer per round — the duplicate_clusters lesson applied here.
    # The outdegree is loop-invariant, so it is pre-joined ONCE and
    # the combined (src, dst, outdeg) table checkpointed: otherwise
    # every round re-runs the degree aggregate and its shuffle.
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=False)
    ranks = nodes.select("id", F.lit(scale).cast(T.LongType()).alias("rank"))
    for _ in range(iters):
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                _floordiv(
                    F.col("rank") * F.lit(damping_pct),
                    F.lit(100) * F.col("outdeg"),
                ).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast(T.LongType())
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
