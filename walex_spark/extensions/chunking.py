"""Document chunking + term scoring — the retrieval-prep half of a
training/RAG data pipeline (split long documents into overlapping
token windows; score terms by frequency × inverse document frequency).

Driver-mandated extension family (no reference counterpart). Both
operators are Spark-first:

- chunking is an in-partition explode: each doc row fans out to its
  chunk rows inside the partition that already holds the text — ZERO
  shuffles, no UDF (sequence + transform + slice on the token array);
- term scoring is two hash aggregates (term counts per doc, doc
  frequency per term) joined on the term key — the term is the shuffle
  key, fan-out bounded by vocabulary size per doc.

Determinism note (the repo's oracle ruleset): idf here is the RAW
ratio n_docs/df, not log(n_docs/df). Both engines compute the same
IEEE-754 double for an integer ratio and product, so results are
bit-exact cross-engine; a log would differ in the last ulp between
libm implementations and break the hash gate. The ranking is identical
for any monotone transform at fixed tf, and the log variant is a
one-line change where cross-engine exactness is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from walex_spark.extensions.text import _tokens

__all__ = [
    "chunk_documents",
    "chunk_manifest",
    "term_scores",
    "hash_embed",
    "hash_embed_dense",
]


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Returns (id_col, chunk_idx, n_chunks, chunk_text, n_chunk_tokens):
    chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final window is the (possibly
    short) remainder; empty docs yield zero rows. Chunk ids are
    (doc_id, chunk_idx) — deterministic and replay-stable, so
    downstream dedup/embedding stages can key on them.

    Scale shape: tokenize → sequence(0, n_chunks-1) → explode → slice,
    all inside the partition that holds the doc (no shuffle, no UDF).
    The payload fan-out is bounded by len/stride per doc; chunk rows
    drop the full text immediately (only the slice survives).
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"chunk_documents: overlap {overlap} must be < chunk_tokens {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = _tokens(F.col(text_col))
    # ceil((n - overlap) / stride) windows, at least 1 for non-empty docs
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(stride)).cast(T.IntegerType()),
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n"))
        .filter(F.col("__n") > 0)
        .select(
            F.col(id_col),
            F.col("__toks"),
            n_chunks.alias("n_chunks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.col("n_chunks"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens),
                F.size(F.col("__toks")) - F.col("chunk_idx") * stride,
            ).alias("n_chunk_tokens"),
        )
    )


def chunk_manifest(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``chunk_documents``'s MANIFEST twin: identical window math
    (stride = chunk_tokens − overlap, ceil((n − overlap)/stride)
    windows, trailing window short, empty docs emit nothing) but the
    output carries (id_col, chunk_idx, start_tok, n_tokens,
    chunk_hash) instead of the chunk text — the shape a 100 TB
    pipeline actually ships between stages: a downstream embedder or
    packer joins tokens back by (id, start_tok), and chunk_hash (md5
    of the space-joined window) lets an oracle value-check the EXACT
    token content of every chunk without the text ever crossing an
    exchange or landing in a result set.

    Same scale shape as chunk_documents: in-partition explode, zero
    shuffles, no UDF.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"chunk_manifest: overlap {overlap} must be < chunk_tokens {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = _tokens(F.col(text_col))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(stride)).cast(
            T.IntegerType()
        ),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return (
        df.select(
            F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
        )
        .filter(F.col("__n") > 0)
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast(T.LongType()).alias("chunk_idx"),
            (F.col("chunk_idx").cast(T.LongType()) * stride).alias(
                "start_tok"
            ),
            F.size(chunk).cast(T.LongType()).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


def term_scores(
    df: DataFrame,
    top_k: int = 3,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_k`` terms per document by tf × (n_docs/df) inverse-
    document-frequency score (log-free — see module docstring).

    Returns (id_col, term, tf, df, score, rnk), rnk 1..top_k per doc,
    ties broken by term order (deterministic in any engine).

    Scale shape: explode → per-(doc, term) count (map-side combined) →
    doc-frequency aggregate on the term key → equi-join on term →
    per-doc top-k window (bounded partitions: one per doc). n_docs is
    a scalar broadcast join (one-row aggregate), never a collect.
    """
    base = df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
    tf = base.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf"),
            F.col("df"),
            (
                F.col("tf").cast(T.DoubleType())
                * (F.col("n_docs").cast(T.DoubleType()) / F.col("df").cast(T.DoubleType()))
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
    )


def hash_embed(
    df: DataFrame,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hashing-trick text vectorizer (feature hashing, a
    la HashingTF + signs): every token hashes to one of ``dim``
    buckets with a +/-1 sign; a document's vector is the signed
    occurrence count per bucket. No model, no vocabulary, byte-stable
    across runs and engines — the bridge from the text operators to
    the embedding operators (ANN / near-dup) when no learned
    embeddings exist.

    Returns SPARSE rows (id, bucket, weight, norm): weight is an exact
    integer sum, norm = sqrt(sum of squared weights) per doc — sqrt of
    an integer, correctly rounded, so cross-engine comparison is
    bit-exact. Use ``hash_embed_dense`` for an array<double> column.

    Shape: explode → one md5 per token split into two halves
    (bucket / sign — the Kirsch-Mitzenmacher idiom from
    dedup.minhash_signature) → map-side-combined groupBy on
    (id, bucket) → per-doc window for the norm. Empty docs yield no
    rows (a zero vector has no sparse entries).
    """
    from pyspark.sql import Window

    md5 = F.md5(F.col("__tok"))
    h1 = F.conv(F.substring(md5, 1, 13), 16, 10).cast(T.LongType())
    h2 = F.conv(F.substring(md5, 14, 13), 16, 10).cast(T.LongType())
    sums = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__tok"))
        .select(
            F.col(id_col),
            F.pmod(h1, F.lit(dim)).alias("bucket"),
            F.when(h2 % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("__sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("__sign").alias("weight"))
    )
    w = Window.partitionBy(id_col)
    return sums.select(
        F.col(id_col),
        F.col("bucket"),
        F.col("weight").cast(T.LongType()).alias("weight"),
        F.sqrt(F.sum(F.col("weight") * F.col("weight")).over(w).cast(T.DoubleType())).alias("norm"),
    )


def hash_embed_dense(
    df: DataFrame,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense companion of ``hash_embed``: (id, embedding array<double>)
    ready for the similarity operators (brute_force_topk / ann_* /
    near_dup_pairs take any array column). Missing buckets are 0.0;
    docs with no tokens are absent (no zero-vector rows)."""
    sparse = hash_embed(df, dim=dim, text_col=text_col, id_col=id_col)
    entries = sparse.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("weight")))
        ).alias("__m")
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return entries.select(
        F.col(id_col),
        F.transform(
            idx,
            lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0)).cast(
                T.DoubleType()
            ),
        ).alias("embedding"),
    )
