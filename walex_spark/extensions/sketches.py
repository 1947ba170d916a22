"""Bounded-memory sketch operators with exact two-pass refinement.

The 100 TB problem with "which tokens dominate the corpus?" is that a
full token groupBy shuffles one row per token OCCURRENCE — at corpus
scale that shuffle dwarfs everything else. The classic fix is a
two-pass plan:

  pass 1  per-partition Misra-Gries summaries (k counters, constant
          memory, zero shuffle) → a candidate set of at most
          k × n_partitions tokens;
  pass 2  exact recount restricted to the candidates (broadcast
          semi-join before the aggregate) + one scalar total.

Misra-Gries guarantee (public, Misra & Gries 1982): with k counters,
any item whose partition frequency exceeds n_p/(k+1) survives that
partition's summary. If a token's GLOBAL count exceeds N/(k+1), by
pigeonhole it exceeds n_p/(k+1) in at least one partition, so the
candidate union has EXACT recall for every token above that bound.
Choosing k >= share_denom - 1 therefore makes the final exact filter
``count * share_denom > total`` correct — the result is the exact
heavy-hitter set, independent of partitioning (partitioning only
changes how many spurious candidates pass 2 discards).

Python touches data only through Arrow-batched mapInPandas in pass 1;
pass 2 is pure JVM column algebra (split/explode/filter/agg).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# re.ASCII so \s matches exactly Java's default \s (ASCII whitespace):
# Python's Unicode \s also splits on NBSP etc., which the JVM pass-2
# recount treats as ordinary token characters — a mismatch there
# breaks the exact-recall guarantee for tokens containing them
_WS = re.compile(r"\s+", re.ASCII)


def _mg_update(counters: dict[str, int], tok: str, k: int) -> None:
    if tok in counters:
        counters[tok] += 1
    elif len(counters) < k:
        counters[tok] = 1
    else:
        dead = []
        for t in counters:
            counters[t] -= 1
            if counters[t] == 0:
                dead.append(t)
        for t in dead:
            del counters[t]


def heavy_hitters(
    df: DataFrame,
    share_denom: int = 100,
    text_col: str = "text",
    k: int | None = None,
) -> DataFrame:
    """Exact set of tokens with count * share_denom > total_tokens.

    ``share_denom=100`` means "tokens holding more than 1% of all
    token occurrences". ``k`` defaults to ``2 * share_denom`` counters
    (the minimum for exact recall is ``share_denom - 1``; the slack
    cuts spurious candidates). Returns (token, cnt).
    """
    if share_denom < 2:
        raise ValueError("share_denom must be >= 2")
    k_eff = k if k is not None else 2 * share_denom
    if k_eff < share_denom - 1:
        raise ValueError(
            f"k={k_eff} breaks exact recall: need k >= share_denom-1 "
            f"= {share_denom - 1}"
        )

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                for tok in _WS.split(text):
                    if tok:
                        _mg_update(counters, tok, k_eff)
        yield pd.DataFrame({"token": list(counters.keys())})

    # case-fold in the JVM so pass 1 and pass 2 apply the IDENTICAL
    # lower() — Python str.lower disagrees with the JVM on some code
    # points, and any divergence voids the recall guarantee
    candidates = (
        df.select(F.lower(F.col(text_col)).alias(text_col))
        .mapInPandas(mg_partition, schema="token string")
        .distinct()
    )

    toks = df.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("token")
    )
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    counts = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(share_denom) > F.col("total"))
        .select("token", "cnt")
    )


def count_min_estimates(
    df: DataFrame,
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over the token
    stream, evaluated against exact counts for the corpus's ``top_k``
    tokens — completing the sketch quartet (HLL distinct, GK
    quantiles, Misra-Gries heavy hitters, CM frequencies).

    The sketch is a ``depth x width`` integer matrix: occurrence of
    token t increments cell (r, md5(salt|r|t) % width) for each row r;
    the estimate for t is the MIN over its depth cells — always >=
    the true count (collisions only add), within N*e/width with
    probability 1 - exp(-depth) on adversary-free streams. Hashes are
    md5 — the sketch is a DETERMINISTIC function of the corpus, so an
    oracle engine rebuilds it bit-for-bit and the output hash-checks
    without a bounds verdict.

    Returns (token, exact_count, cms_estimate, overestimate) for the
    top_k tokens by exact count (count desc, token asc) —
    ``overestimate = cms_estimate - exact_count >= 0`` by construction.

    Scale shape: the sketch build is ONE map-side-combinable aggregate
    over the exploded (r, bucket) stream — its output is depth*width
    rows NO MATTER the corpus (the whole point: at 100 TB the sketch
    is still 4k rows); the exact top-k pass is the same vocab
    aggregate q_doc_vocab_topk runs; probes meet the sketch via a
    broadcast of the 4k-row matrix. In production the exact pass runs
    ONCE to validate the sketch's error on a slice, then consumers
    query the 4k-row sketch alone.
    """
    if depth < 1 or width < 2:
        raise ValueError("depth >= 1 and width >= 2 required")
    toks = df.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("token")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast(T.IntegerType()).alias("r"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("|", F.lit(salt), F.lit(str(r)), F.col("token"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast(T.LongType()),
                    F.lit(width),
                ).alias("b"),
            )
            for r in range(depth)
        ]
    )
    sketch = (
        toks.select(F.explode(rows).alias("cell"))
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.b").alias("b"))
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("cnt"))
    )
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("token").asc())
        .limit(top_k)
    )
    probe_cells = exact.select(
        "token", "exact_count", F.explode(rows).alias("cell")
    ).select(
        "token", "exact_count", F.col("cell.r").alias("r"), F.col("cell.b").alias("b")
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("token", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.col("exact_count").desc(), F.col("token").asc())
    )
