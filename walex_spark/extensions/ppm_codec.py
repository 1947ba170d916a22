"""Pure-python PPM (P6) micro-codec — a REAL image codec with zero
native dependencies, so the non-stub multimodal kernel can execute in
codec-less CI environments.

PPM binary (P6) is the simplest published raster format (netpbm spec):

    P6 <whitespace> width <ws> height <ws> maxval <single ws> raw RGB

The decode/resize/encode kernels here are exact (no quantization
beyond the format's own 8-bit channels) and deterministic, so resized
outputs are byte-stable across runs and hosts — the property the
multimodal tests need. numpy does the pixel work (vectorized
nearest-neighbor); payloads stay bytes end to end.
"""

from __future__ import annotations

import numpy as np


class PpmError(ValueError):
    """Payload is not a well-formed binary PPM (P6)."""


def _tokens(buf: bytes):
    """Yield header tokens, skipping '#' comments, tracking position."""
    pos = 0
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            end = buf.find(b"\n", pos)
            pos = n if end < 0 else end + 1
        else:
            start = pos
            while pos < n and buf[pos : pos + 1] not in b" \t\r\n":
                pos += 1
            yield buf[start:pos], pos
    raise PpmError("truncated PPM header")


def ppm_decode(payload: bytes) -> tuple[int, int, bytes]:
    """P6 bytes → (width, height, raw RGB bytes, row-major)."""
    if not payload or payload[:2] != b"P6":
        raise PpmError("not a P6 PPM payload")
    it = _tokens(payload)
    magic, _ = next(it)
    if magic != b"P6":
        raise PpmError(f"unsupported magic {magic!r}")
    try:
        (w_tok, _), (h_tok, _), (max_tok, after) = next(it), next(it), next(it)
        width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
    except (StopIteration, ValueError) as e:
        raise PpmError("bad PPM header") from e
    if width <= 0 or height <= 0:
        raise PpmError(f"bad dimensions {width}x{height}")
    if maxval != 255:
        raise PpmError(f"only maxval=255 supported, got {maxval}")
    # exactly ONE whitespace byte separates maxval from the raster
    pixels = payload[after + 1 : after + 1 + width * height * 3]
    if len(pixels) != width * height * 3:
        raise PpmError(
            f"raster truncated: want {width * height * 3}, got {len(pixels)}"
        )
    return width, height, pixels


def ppm_encode(width: int, height: int, pixels: bytes) -> bytes:
    if len(pixels) != width * height * 3:
        raise PpmError(
            f"pixel buffer {len(pixels)} != {width}x{height}x3"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def ppm_resize(payload: bytes, width: int, height: int) -> bytes:
    """Decode → vectorized nearest-neighbor resample → re-encode."""
    w0, h0, px = ppm_decode(payload)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h0, w0, 3)
    ys = (np.arange(height) * h0) // height
    xs = (np.arange(width) * w0) // width
    out = np.ascontiguousarray(arr[ys][:, xs])
    return ppm_encode(width, height, out.tobytes())


def ppm_mean_rgb(payload: bytes) -> list[float]:
    """Per-channel pixel means — a real (if tiny) image feature."""
    w, h, px = ppm_decode(payload)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h * w, 3)
    return [float(x) for x in arr.mean(axis=0)]
