"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

No reference counterpart (walex is a CDC router) — this is part of the
driver-mandated LLM-data-pipeline extension layer. The standard recipe
(GPT-3 appendix C / PaLM / Llama): a training document is contaminated
if a large enough fraction of its word n-grams also appears anywhere in
the benchmark set; contaminated docs are dropped or flagged before
training.

Scale shape: both sides reduce to distinct (id, gram) rows via
``dedup.word_shingles`` (shuffle-before-fan-out: the corpus ships at
raw-text size, grams explode after the repartition). The membership
probe is a LEFT SEMI equi-join on the gram string — Catalyst shuffles
on the gram key only, so work is bounded by gram frequency, never the
doc cross product. No broadcast hint: a benchmark set is usually tiny
(AQE will broadcast it at runtime), but nothing in the plan *requires*
it to fit in memory, so a pathological "benchmark" the size of the
corpus still executes as a shuffled join instead of an OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from walex_spark.extensions.dedup import word_shingles


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document benchmark-overlap stats.

    For every doc with at least ``n`` tokens: the number of distinct
    word ``n``-grams, how many of them occur anywhere in ``benchmark``,
    the contaminated fraction, and a boolean flag at ``threshold``.
    Docs shorter than ``n`` tokens have no n-grams and produce no row
    (nothing to match on — callers treat them as clean).

    Returns (id_col, n_grams, n_contaminated, contamination_frac,
    is_contaminated). The fraction is a single int/int double division
    over exact counts, so results are bit-stable across engines and
    partitionings.
    """
    doc_grams = word_shingles(docs, n, text_col, id_col, dedupe=True)
    bench_grams = (
        word_shingles(benchmark, n, text_col, id_col, dedupe=True)
        .select("token")
        .distinct()
    )
    sizes = doc_grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        doc_grams.join(bench_grams, "token", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    frac = F.col("n_contaminated").cast(T.DoubleType()) / F.col("n_grams").cast(
        T.DoubleType()
    )
    return (
        sizes.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams"),
            F.coalesce(F.col("n_contaminated"), F.lit(0).cast(T.LongType())).alias(
                "n_contaminated"
            ),
        )
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            frac.alias("contamination_frac"),
            (frac >= F.lit(threshold)).alias("is_contaminated"),
        )
    )
