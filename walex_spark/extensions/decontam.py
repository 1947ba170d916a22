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


def cross_jaccard_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int | None = 3,
    id_offset: int | None = None,
) -> DataFrame:
    """Document-LEVEL contamination audit: every (training doc,
    benchmark doc) pair whose shingle-set Jaccard clears num/den — the
    near-duplicate complement of ``ngram_contamination`` (which flags
    PHRASE overlap; a paraphrased or lightly-edited benchmark copy
    slips past an n-gram probe but not a 0.3-Jaccard one).

    Composition, not new machinery: tag each side, run the LOSSLESS
    prefix-filter join (dedup.py::prefix_filter_jaccard_pairs — the
    All-Pairs/ppjoin plan) over the union, keep cross-side pairs.
    Exactness is inherited: the output is exactly the naive
    threshold join restricted to (train, benchmark) pairs.

    Id spaces may overlap: benchmark ids are offset into a disjoint
    range internally and restored on output. Pass ``id_offset`` (any
    bound > max train id) to skip the one-row max() pre-job — the
    registry uses 2^40 so query construction stays lazy.

    Returns (train_id, bench_id, jaccard) ordered by (jaccard desc,
    train_id, bench_id).

    Scale note: candidate generation is ASYMMETRIC — a ``pair_filter``
    pushed into the prefix join prunes same-side pairs BEFORE the pair
    aggregate and the verify join, so train-train near-dup mass (the
    overwhelming majority at a 100 TB train side) is never aggregated
    or verified; only (train, benchmark) candidates survive the token
    join. Both sides' prefixes still index, as the All-Pairs lemma
    requires.
    """
    from walex_spark.extensions.dedup import prefix_filter_jaccard_pairs

    if id_offset is not None:
        offset = int(id_offset)
    else:
        # one-row metadata aggregate — the only collect in the path
        off = docs.select(F.max(F.col(id_col)).alias("m")).collect()[0].m
        offset = int(off) + 1 if off is not None else 1
    tagged = docs.select(
        F.col(id_col).cast(T.LongType()).alias(id_col),
        F.col(text_col),
    ).unionByName(
        benchmark.select(
            (F.col(id_col).cast(T.LongType()) + F.lit(offset)).alias(id_col),
            F.col(text_col),
        )
    )
    pairs = prefix_filter_jaccard_pairs(
        tagged,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        # ids are disjoint (bench >= offset) and id_a < id_b, so a
        # cross pair is exactly "a below the offset, b at or above it"
        pair_filter=(F.col("id_a") < F.lit(offset))
        & (F.col("id_b") >= F.lit(offset)),
    )
    # the pair_filter guarantees id_a = train, id_b = bench
    return pairs.select(
        F.col("id_a").alias("train_id"),
        (F.col("id_b") - F.lit(offset)).alias("bench_id"),
        F.col("jaccard"),
    ).orderBy(F.col("jaccard").desc(), "train_id", "bench_id")


def source_overlap_matrix(
    df: DataFrame,
    shingle_n: int = 3,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Pairwise slice-overlap matrix: for every ordered pair of corpus
    slices (sources, dumps, snapshots), the shared distinct word
    n-gram count plus containment |A∩B|/|A| and Jaccard — the
    corpus-level redundancy/contamination map a mixture designer
    reads before weighting sources (e.g. two CommonCrawl dumps with
    0.9 containment add little new mass; a benchmark-shaped slice
    with high containment into train is a leak).

    Implementation: the ``word_shingles`` gram expression inlined
    over (slice, text) — NOT ``word_shingles`` itself: that helper
    hash-repartitions raw docs by its id column, and with the SLICE
    as the id the corpus would collapse onto |slices| partitions (a
    skew trap at 100 TB; the (slice, gram) distinct below is the
    right first shuffle and hashes on the gram too). Then a
    gram-keyed self-equi-join and a pair aggregate. All-integer
    counts; two IEEE divisions at the end.

    Returns (source_a, source_b, grams_a, grams_b, shared_grams,
    containment, jaccard) for ordered pairs a ≠ b, sorted.

    Scale shape: the join key is the gram string, so fan-out per gram
    is bounded by |slices| (a gram contributes at most |S|² pair
    rows, and the aggregate is map-side combinable); the output is
    |S|² rows. No broadcast hints: the (slice, gram) side is
    vocabulary-sized (unbounded at 100 TB), the size frames are
    |S|-sized and AQE broadcasts them at runtime.
    """
    from walex_spark.extensions.text import _tokens

    n = shingle_n
    toked = df.select(
        F.col(group_col).alias("id"), _tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast(T.ArrayType(T.StringType())))
    # checkpoint at birth: the gram-set frame feeds the two join
    # sides AND the size aggregate — three consumers would otherwise
    # re-shingle the corpus three times (the tf-idf postings
    # discipline; (slice, gram) rows, the smallest form of the data)
    grams = (
        toked.select("id", F.explode(sh).alias("token"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = grams.groupBy("id").agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("ng")
    )
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, F.col("a.token") == F.col("b.token"))
        .where(F.col("a.id") != F.col("b.id"))
        .groupBy(F.col("a.id").alias("sa"), F.col("b.id").alias("sb"))
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("shared_grams"))
    )
    na = sizes.select(F.col("id").alias("sa"), F.col("ng").alias("grams_a"))
    nb = sizes.select(F.col("id").alias("sb"), F.col("ng").alias("grams_b"))
    return (
        shared.join(na, "sa")
        .join(nb, "sb")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "grams_a",
            "grams_b",
            "shared_grams",
            (
                F.col("shared_grams").cast(T.DoubleType())
                / F.col("grams_a").cast(T.DoubleType())
            ).alias("containment"),
            (
                F.col("shared_grams").cast(T.DoubleType())
                / (
                    F.col("grams_a") + F.col("grams_b")
                    - F.col("shared_grams")
                ).cast(T.DoubleType())
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def exact_substr_decontam(
    train_df: DataFrame,
    bench_df: DataFrame,
    win_len: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Verbatim-overlap decontamination at SPAN granularity — the
    cross-corpus variant of ExactSubstr (Lee et al. 2021 §4 applied
    the way GPT-3's appendix and the FLAN/PaLM cards describe
    benchmark decontamination): every ``win_len``-char window of a
    TRAIN document that appears ANYWHERE in the benchmark corpus
    marks its characters; marked windows merge into maximal spans;
    spans are cut and the kept segments stitched. Unlike the n-gram
    PROBE (ngram_contamination — detection only) this REWRITES the
    training text, and unlike within-corpus despan the index side is
    the benchmark: small, bounded, and the only thing that needs a
    distinct-hash shuffle.

    Returns every train document as (id_col, clean_text, n_removed)
    — remove_duplicate_spans' contract (untouched docs pass through,
    a fully-contaminated doc becomes '', not NULL).

    Scale shape: the benchmark side folds to DISTINCT window hashes
    (benchmark-sized — at 100 TB train vs GB-scale benchmarks this is
    broadcast-able metadata; the left-semi join lets AQE pick the
    broadcast), the train side is the one honest per-character
    window-hash pass (shuffle-before-fan-out + checkpoint, shared
    `_char_windows`), and the merge/stitch runs on narrow span rows
    (dedup.py::_merge_marked_spans / _remove_spans).
    """
    from walex_spark.extensions.dedup import (
        _char_windows,
        _merge_marked_spans,
        _remove_spans,
    )

    if win_len < 2:
        raise ValueError("win_len must be >= 2")
    bench_h = _char_windows(
        bench_df, win_len, text_col, id_col
    ).select("h").distinct()
    train_wins = _char_windows(train_df, win_len, text_col, id_col)
    marked = train_wins.join(bench_h, "h", "left_semi")
    spans = _merge_marked_spans(marked, win_len, id_col).localCheckpoint(
        eager=False
    )
    return _remove_spans(train_df, spans, text_col, id_col)
