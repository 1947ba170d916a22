"""Multimodal plumbing tests: schema/batch shape of the mapInPandas
kernels (decode itself is stubbed — no codecs in the container)."""

import pytest

from walex_spark.extensions.multimodal import (
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    decode_image,
    documents_as_media,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"a" * 100, {"format": "png", "width": None, "height": None, "duration_ms": None}),
        (2, b"xyz" * 50, {"format": "jpg", "width": None, "height": None, "duration_ms": None}),
        (3, None, {"format": "png", "width": None, "height": None, "duration_ms": None}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_features_shape(media):
    got = {r.media_id: r for r in extract_features(media).collect()}
    assert got[1].n_bytes == 100 and len(got[1].feature) == 8
    assert got[3].n_bytes == 0 and got[3].sha is None
    # deterministic: same payload → same feature
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert got[2].feature == again[2].feature


def test_resize_media_updates_meta_and_payload(media):
    # kernel pinned to the stub: these payloads are text bytes, not
    # decodable images (the pil kernel has its own gated test below)
    out = {r.media_id: r for r in resize_media(media, 8, 4, kernel="stub").collect()}
    assert all(len(r.payload) == 32 for r in out.values())
    assert out[1].meta.width == 8 and out[1].meta.height == 4
    assert out[1].meta.format == "png"  # untouched meta fields survive


def test_sample_frames_fanout(media):
    frames = sample_frames(media, frame_bytes=40, every_ms=500).collect()
    by_media = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f)
    # 100 bytes / 40 → 2 frames; 150 bytes / 40 → 3 frames; None → none
    assert len(by_media[1]) == 2 and len(by_media[2]) == 3
    assert 3 not in by_media
    assert [f.ts_ms for f in sorted(by_media[2], key=lambda f: f.frame_idx)] == [0, 500, 1000]
    assert len(by_media[1][0].frame) == 40


def test_documents_adapter_schema(spark):
    docs = spark.createDataFrame([(7, "hello", "en", "src1", 5)],
                                 "doc_id long, text string, lang string, source string, n_chars long")
    m = documents_as_media(docs)
    assert [f.name for f in m.schema.fields] == ["media_id", "payload", "meta"]
    row = m.collect()[0]
    assert bytes(row.payload) == b"hello" and row.meta.format == "src1"


def test_kernel_selection_contract():
    """kernel='pil' must refuse loudly without Pillow; 'auto' must pick
    the stub; unknown kernels are rejected."""
    from walex_spark.extensions import multimodal as mm

    if not mm.codec_available():
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG")


def test_resize_rejects_unknown_kernel(media):
    from walex_spark.extensions import multimodal as mm

    with pytest.raises(ValueError):
        mm.resize_media(media, 8, 4, kernel="ffmpeg")
    if not mm.codec_available():
        with pytest.raises(NotImplementedError):
            mm.resize_media(media, 8, 4, kernel="pil")


def _ppm(width, height, rgb):
    """Assemble a P6 payload by hand (independent of ppm_codec)."""
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(rgb) * (width * height)


def test_ppm_codec_roundtrip_and_errors():
    from walex_spark.extensions.ppm_codec import (
        PpmError, ppm_decode, ppm_encode, ppm_mean_rgb, ppm_resize,
    )

    payload = _ppm(4, 2, (10, 20, 30))
    w, h, px = ppm_decode(payload)
    assert (w, h) == (4, 2) and len(px) == 24
    assert ppm_encode(w, h, px) == payload
    assert ppm_mean_rgb(payload) == [10.0, 20.0, 30.0]
    # comments + arbitrary header whitespace per the netpbm spec
    commented = b"P6 # a comment\n# another\n 4\t2 \n255\n" + bytes((10, 20, 30)) * 8
    assert ppm_decode(commented)[:2] == (4, 2)
    shrunk = ppm_resize(payload, 2, 1)
    assert ppm_decode(shrunk) == (2, 1, bytes((10, 20, 30)) * 2)
    for bad in (b"", b"P5\n1 1\n255\n\x00", b"P6\n2 2\n255\nxy", b"P6\n1 1\n65535\n" + b"\x00" * 6):
        with pytest.raises(PpmError):
            ppm_decode(bad)


def test_decode_image_real_path_via_ppm_codec():
    """A REAL decode executes in this codec-less container: P6 payloads
    resolve through the pure-python micro-codec."""
    from walex_spark.extensions import multimodal as mm

    img = mm.decode_image(_ppm(4, 2, (1, 2, 3)))
    assert (img.width, img.height, img.mode) == (4, 2, "RGB")
    assert img.tobytes() == bytes((1, 2, 3)) * 8


def test_ppm_resize_real_kernel_same_arrow_path(spark):
    """The non-stub kernel through the SAME mapInPandas plumbing, no
    Pillow required: decode → nearest-neighbor resample → re-encode."""
    from walex_spark.extensions import multimodal as mm
    from walex_spark.extensions.ppm_codec import ppm_decode

    media = spark.createDataFrame(
        [
            (1, _ppm(16, 16, (200, 10, 10)),
             {"format": "ppm", "width": 16, "height": 16, "duration_ms": None}),
            (2, None,
             {"format": "ppm", "width": None, "height": None, "duration_ms": None}),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.resize_media(media, 8, 4, kernel="ppm").collect()}
    w, h, px = ppm_decode(bytes(out[1].payload))
    assert (w, h) == (8, 4) and px == bytes((200, 10, 10)) * 32
    assert out[1].meta.width == 8 and out[1].meta.height == 4
    assert out[2].payload is None  # null payload survives the kernel


def test_auto_kernel_sniffs_per_row(spark):
    """kernel='auto' without Pillow: P6 rows take the real codec, other
    payloads fall back to the stub — in the same batch."""
    from walex_spark.extensions import multimodal as mm
    from walex_spark.extensions.ppm_codec import ppm_decode

    if mm.codec_available():
        pytest.skip("Pillow present: auto resolves to the pil kernel")
    media = spark.createDataFrame(
        [
            (1, _ppm(4, 4, (9, 9, 9)),
             {"format": "ppm", "width": 4, "height": 4, "duration_ms": None}),
            (2, b"not an image",
             {"format": "bin", "width": None, "height": None, "duration_ms": None}),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.resize_media(media, 2, 2, kernel="auto").collect()}
    assert ppm_decode(bytes(out[1].payload))[:2] == (2, 2)  # real kernel
    assert len(out[2].payload) == 4  # stub kernel: 2*2 byte fake


def test_pil_resize_real_kernel_same_arrow_path(spark):
    """Runs ONLY where Pillow exists: a real PNG goes through the same
    mapInPandas plumbing and comes out resized + re-encoded."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from walex_spark.extensions import multimodal as mm

    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (200, 10, 10)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, buf.getvalue(), {"format": "png", "width": 16, "height": 16,
                              "duration_ms": None})],
        mm.MEDIA_SCHEMA,
    )
    out = mm.resize_media(media, 8, 4, kernel="pil").collect()[0]
    img = Image.open(io.BytesIO(out.payload))
    assert img.size == (8, 4)
    assert out.meta.width == 8 and out.meta.height == 4


def test_audio_pcm_stats_hand_case(spark):
    import struct

    from walex_spark.extensions.multimodal import audio_pcm_stats

    # samples: +1000, -2000, +3000, 0  (LE int16) + one trailing odd byte
    pcm = struct.pack("<4h", 1000, -2000, 3000, 0) + b"\x7f"
    df = spark.createDataFrame(
        [(1, bytearray(pcm)), (2, bytearray(b""))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in audio_pcm_stats(df).collect()}
    r = out[1]
    assert r.n_samples == 4               # odd byte dropped
    assert r.peak_abs == 3000
    # sign pattern +,-,+,0 -> crossings at (.,+-.),(-,+): product<0 twice;
    # (+3000, 0) product 0 -> not a crossing
    assert r.n_zero_crossings == 2
    assert r.sum_abs == 6000
    import math

    assert r.rms == math.sqrt((1000**2 + 2000**2 + 3000**2 + 0) / 4.0)
    z = out[2]
    assert (z.n_samples, z.peak_abs, z.rms) == (0, 0, 0.0)
