"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata.

Driver-mandated extension. Three kernel tiers, all through the same
Arrow/mapInPandas plumbing: Pillow when importable (full formats), the
pure-python PPM micro-codec (ppm_codec.py — a REAL decode/resample/
encode path that runs even in this codec-less container), and the
clearly-marked deterministic STUBS for payloads no available codec can
read. Schema, Arrow batch shape, partition flow, and partitioning
behavior are exactly what a production decode path uses; swapping in
ffmpeg/Pillow is a local change inside the pandas function.

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


try:  # optional codec: present in equipped environments, absent here
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - container has no Pillow
    _PILImage = None


def codec_available() -> bool:
    """True when a real image codec (Pillow) is importable. The
    pure-python PPM micro-codec (ppm_codec.py) is ALWAYS available and
    needs no gate — it handles P6 payloads in any environment."""
    return _PILImage is not None


class DecodedImage:
    """Minimal decoded-image handle for the codec-less PPM path —
    width/height/mode/tobytes(), the subset of the Pillow surface the
    feature kernels use."""

    __slots__ = ("width", "height", "mode", "_pixels")

    def __init__(self, width: int, height: int, pixels: bytes):
        self.width, self.height, self.mode = width, height, "RGB"
        self._pixels = pixels

    def tobytes(self) -> bytes:
        return self._pixels


def decode_image(payload: bytes) -> "object":
    """Decode an image payload: Pillow when importable (any format),
    else the pure-python PPM micro-codec for P6 payloads — a REAL
    decode executes even in this codec-less container. Anything else
    raises the clearly-marked NotImplementedError (swap in Pillow for
    full format coverage; the Arrow plumbing is format-agnostic)."""
    if _PILImage is not None:
        import io

        return _PILImage.open(io.BytesIO(payload))
    if payload[:2] == b"P6":
        from walex_spark.extensions.ppm_codec import ppm_decode

        w, h, px = ppm_decode(payload)
        return DecodedImage(w, h, px)
    raise NotImplementedError(
        "non-PPM image decode requires Pillow (not in this container)"
    )


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


def _pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize kernel: decode with Pillow, resize, re-encode PNG
    (deterministic encoder settings so output bytes are stable)."""
    import io

    if payload is None:
        return None
    img = _PILImage.open(io.BytesIO(payload))
    buf = io.BytesIO()
    img.resize((width, height)).save(buf, format="PNG", optimize=False)
    return buf.getvalue()


def _ppm_resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """Real resize kernel with zero native deps: pure-python PPM decode
    → vectorized nearest-neighbor resample → re-encode. Deterministic
    byte output (the format has no encoder freedom)."""
    from walex_spark.extensions.ppm_codec import ppm_resize

    if payload is None:
        return None
    return ppm_resize(payload, width, height)


def _auto_resize(payload: bytes, width: int, height: int) -> bytes:
    """'auto' without Pillow: REAL kernel for P6 payloads, stub kernel
    for undecodable bytes (sniffed per row — media columns are
    heterogeneous in practice)."""
    if payload is not None and payload[:2] == b"P6":
        return _ppm_resize_kernel(payload, width, height)
    return _fake_resize(payload, width, height)


def resize_media(
    df: DataFrame, width: int, height: int, kernel: str = "auto"
) -> DataFrame:
    """payload → resized payload with updated meta (1 row in, 1 row out).

    mapInPandas keeps the bytes in Arrow batches end to end; no shuffle.
    ``kernel``: 'pil' = Pillow decode/resize/re-encode (raises where
    Pillow is absent), 'ppm' = the pure-python P6 micro-codec (REAL
    decode/resample/encode, always available), 'stub' = the
    deterministic fake, 'auto' = pil when importable, else ppm for P6
    payloads with stub fallback per row. Every kernel runs through the
    identical Arrow/mapInPandas plumbing — the only difference is the
    per-row byte transform."""
    import pandas as pd

    if kernel not in ("auto", "pil", "ppm", "stub"):
        raise ValueError(f"resize_media kernel={kernel!r}")
    if kernel == "pil" and _PILImage is None:
        raise NotImplementedError("kernel='pil' requires Pillow")
    if kernel == "pil" or (kernel == "auto" and _PILImage is not None):
        row_fn = _pil_resize
    elif kernel == "ppm":
        row_fn = _ppm_resize_kernel
    elif kernel == "auto":
        row_fn = _auto_resize
    else:
        row_fn = _fake_resize

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(lambda b: row_fn(b, width, height))
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


def audio_pcm_stats(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio-side plumbing: interpret the opaque binary payload as
    16-bit little-endian PCM and compute the waveform screens an audio
    pipeline gates on — sample count, peak amplitude, zero-crossing
    rate (the crude voiced/noise discriminator), mean absolute level
    and RMS. No codec dependency: raw PCM is numpy-decodable, so
    unlike the image kernels this path needs no stub.

    Exactness contract (the oracle-determinism rules): everything that
    crosses the Arrow boundary is an exact INTEGER (counts, peak, sum
    of |s|, sum of s²; |s| <= 2^15 and corpus payloads keep s²-sums
    far under 2^63) — ``rms = sqrt(sum_sq / n)`` is then computed as
    a COLUMN (one division + one sqrt on identical operands in any
    engine). A trailing odd byte is dropped; zero-crossing = strictly
    opposite signs of consecutive samples (product < 0).

    Scale shape: ONE narrow Arrow-batched mapInPandas over the
    payloads (no shuffle; numpy ``frombuffer`` is zero-copy), emitting
    6 integers per media row — payload bytes never re-cross to the
    JVM.
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_samples long, peak_abs long, "
        "n_zero_crossings long, sum_abs long, sum_sq long"
    )

    def batches(it):
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                n = len(buf) // 2
                s = np.frombuffer(buf[: n * 2], dtype="<i2").astype(np.int64)
                if n:
                    rows.append(
                        (
                            int(mid),
                            n,
                            int(np.max(np.abs(s))),
                            int(np.sum(s[:-1] * s[1:] < 0)),
                            int(np.sum(np.abs(s))),
                            int(np.sum(s * s)),
                        )
                    )
                else:
                    rows.append((int(mid), 0, 0, 0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_samples", "peak_abs",
                    "n_zero_crossings", "sum_abs", "sum_sq",
                ],
            )

    stats = media.select(id_col, payload_col).mapInPandas(batches, out_schema)
    return stats.select(
        id_col,
        "n_samples",
        "peak_abs",
        "n_zero_crossings",
        "sum_abs",
        F.when(
            F.col("n_samples") > 0,
            F.sqrt(
                F.col("sum_sq").cast(T.DoubleType())
                / F.col("n_samples").cast(T.DoubleType())
            ),
        ).otherwise(F.lit(0.0)).alias("rms"),
    )
