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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize kernel — deterministic truncate/pad to width*height
    bytes. Replace with PIL `Image.resize` once codecs exist; the Spark
    plumbing (schema, Arrow batches, meta update) is unchanged."""
    target = width * height
    if payload is None:
        return b"\x00" * target
    return payload[:target] + b"\x00" * max(0, target - len(payload))


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """payload → resized payload with updated meta (1 row in, 1 row out).

    mapInPandas keeps the bytes in Arrow batches end to end; no shuffle.
    The decode/encode kernel is the stub above — marked, swappable."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(lambda b: _fake_resize(b, width, height))
            out["meta"] = out["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, frame_bytes: int = 64, every_ms: int = 1000) -> DataFrame:
    """Video-style frame sampling: each media row fans out to N frame
    rows (media_id, frame_idx, ts_ms, frame) — the 1→N mapInPandas
    pattern a real ffmpeg-backed sampler uses; frames here are byte
    stripes of the payload (STUB kernel, deterministic).

    Scale note: the fan-out happens inside the partition that already
    holds the payload — no shuffle; downstream per-frame work inherits
    the partitioning and can repartition AFTER the payload column is
    dropped (frames are small; payloads are not)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n = max(1, len(payload) // frame_bytes)
                for i in range(n):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame": bytes(payload[i * frame_bytes : (i + 1) * frame_bytes]),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(run, FRAME_SCHEMA)


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
