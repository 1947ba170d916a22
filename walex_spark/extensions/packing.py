"""Training-sequence packing: concatenate a deterministically-ordered
token stream and slice it into fixed-length sequences, tracking which
slice of which document lands in which sequence.

This is the batch-layout step of an LLM training pipeline: documents
are shuffled (seeded, reproducible — operators/ordering.py), laid end
to end, and cut every ``seq_len`` tokens; a document spans one or more
sequences, and a sequence holds one or more document slices. All of it
is integer arithmetic over exclusive prefix sums, so any engine and
any parallelism produce the identical packing.

Scale shape: one narrow projection (id, token count, shuffle key)
feeds prefix_sums (range shuffle + pid exchange on three-column rows);
the explode emits one row per (document, sequence) crossing —
``1 + n_tokens/seq_len`` rows per doc, proportional to output. The
document TEXT never enters the pipeline; a downstream tokenizer join
consumes the (seq_id, doc, slice) manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from walex_spark.operators.ordering import prefix_sums, shuffle_key

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    seq_len: int,
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Assign every document's tokens to fixed-length training
    sequences under the seeded global shuffle order md5(salt || id).

    Returns one row per (sequence, document-slice):
      (seq_id, id_col, tok_start, tok_end, n_seq_tokens) where
      ``tok_start`` / ``tok_end`` are the 0-based [start, end) slice
      of the document's own tokens and seq_id is 0-based. Documents
      with zero tokens are dropped (they occupy no sequence space).

    Exactness: cum_start/cum_end are integer prefix sums; slice
    bounds are min/max of integer products — identical in any engine.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    narrow = df.select(
        F.col(id_col),
        F.col(token_count_col).cast(T.LongType()).alias("__n"),
        shuffle_key(F.col(id_col), salt).alias("__k"),
    ).filter(F.col("__n") > 0)
    pre = prefix_sums(narrow, ["__k", id_col], "__n", cum_col="__cum")
    L = F.lit(seq_len).cast(T.LongType())
    seq_first = F.expr("__cum div " + str(seq_len))
    seq_last = F.expr(f"(__cum + __n - 1) div {seq_len}")
    exploded = pre.withColumn(
        "seq_id", F.explode(F.sequence(seq_first, seq_last))
    )
    tok_start = F.greatest(F.lit(0).cast(T.LongType()), F.col("seq_id") * L - F.col("__cum"))
    tok_end = F.least(F.col("__n"), (F.col("seq_id") + F.lit(1)) * L - F.col("__cum"))
    return exploded.select(
        F.col("seq_id").cast(T.LongType()).alias("seq_id"),
        F.col(id_col),
        tok_start.cast(T.LongType()).alias("tok_start"),
        tok_end.cast(T.LongType()).alias("tok_end"),
        (tok_end - tok_start).cast(T.LongType()).alias("n_seq_tokens"),
    )


def curriculum_order(
    df: DataFrame,
    shard_size: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum data ordering: rank the corpus easiest-first by
    unigram surprisal (low bits/token = common-word, low-perplexity
    text) and cut the order into fixed-size training shards — the
    curriculum-learning layout step (easy shards first) downstream of
    the quality/novelty signals.

    Determinism: the sort key (half_bits_per_token, id) is a double
    division of exact longs — bit-identical in any engine — with the
    id tiebreak making it a total order; the rank comes from
    operators/ordering.py::global_sorted_index (ONE range sort +
    broadcast offsets, never a single-task window); the shard index is
    exact integer arithmetic on the rank.

    Returns (id_col, half_bits_per_token, rank, shard_idx), rank
    1-based in curriculum order.
    """
    from walex_spark.extensions.search import unigram_surprisal
    from walex_spark.operators.ordering import global_sorted_index

    if shard_size < 1:
        raise ValueError("shard_size must be >= 1")
    scored = (
        unigram_surprisal(df, text_col=text_col, id_col=id_col)
        .select(id_col, "half_bits_per_token")
        # global_sorted_index reads its input twice (ranged rows +
        # per-partition offsets) — materialize the doc-sized, two-
        # column score table once instead of re-running the surprisal
        # shuffles per consumer
        .localCheckpoint(eager=False)
    )
    ranked = global_sorted_index(
        scored,
        [F.col("half_bits_per_token"), F.col(id_col)],
        "rank",
    )
    return ranked.select(
        F.col(id_col),
        "half_bits_per_token",
        F.col("rank").cast(T.LongType()).alias("rank"),
        # exact integer division (a double quotient could round across
        # the shard boundary past 2^53 ranks)
        F.expr(f"(rank - 1) div {shard_size}")
        .cast(T.LongType())
        .alias("shard_idx"),
    )


# chunk layout lives in extensions/chunking.py (chunk_documents emits
# the text windows; chunk_manifest the hash manifest) — packing stays
# the training-sequence side of the layout family.
