"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata.

Driver-mandated extension. The container has no image/audio codecs, so
the decode kernels are STUBS (clearly marked below) — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` partition flow, and partitioning behavior are exactly
what a production decode path uses; swapping the stub for Pillow/ffmpeg
is a local change inside the pandas function.

Design for 100 TB: media bytes stay in one opaque BinaryType column —
never exploded, never shuffled unless the caller repartitions; feature
extraction is a narrow ``mapInPandas`` (no shuffle) whose output drops
the payload column as early as possible (column pruning does the rest).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB — image decode requires a codec library not in this
    container. Replace with PIL.Image.open(io.BytesIO(payload))."""
    raise NotImplementedError("image decode stubbed: no codec libs in container")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding used in place of a real model:
    byte-histogram moments. Keeps tests meaningful without codecs."""
    if payload is None:
        return [0.0] * dim
    out = []
    for i in range(dim):
        stripe = payload[i::dim]
        out.append((sum(stripe) % 997) / 997.0 if stripe else 0.0)
    return out


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Binary payload → (media_id, n_bytes, sha, feature) via
    mapInPandas — Arrow-batched, per-partition, zero shuffle."""
    import hashlib

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": payloads.map(_fake_feature),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for tests: treat the documents table's text as an opaque
    binary payload with typed metadata (the testdata has no real media
    column)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("format"),
            F.lit(None).cast(T.IntegerType()).alias("width"),
            F.lit(None).cast(T.IntegerType()).alias("height"),
            F.lit(None).cast(T.LongType()).alias("duration_ms"),
        ).alias("meta"),
    )
