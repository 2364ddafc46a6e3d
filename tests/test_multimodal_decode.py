"""Unit tests for the pure-Python image container decode
(operators/multimodal.py) — no Spark needed, so these run in
milliseconds and pin the header parsing against hand-built payloads
from the public file-format specs."""

from __future__ import annotations

import struct
import zlib

import pytest

from mapreduce_in_pthreads_spark.operators.multimodal import (
    decode_image,
    encode_bmp,
    resize_bmp_half,
)


def _png(width: int, height: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    return b"\x89PNG\r\n\x1a\n" + chunk


def _gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 4


def _jpeg(width: int, height: int) -> bytes:
    # SOI, APP0 (JFIF stub), SOF0 with dims, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


@pytest.mark.parametrize("payload,expected", [
    (_png(640, 480), ("PNG", 640, 480)),
    (_gif(320, 200), ("GIF", 320, 200)),
    (_jpeg(1024, 768), ("JPEG", 1024, 768)),
    (encode_bmp(17, 5), ("BMP", 17, 5)),
    (encode_bmp(1, 1), ("BMP", 1, 1)),
])
def test_decode_image_formats(payload, expected):
    assert decode_image(payload) == expected


def test_bmp_top_down_height_normalized():
    """Negative BITMAPINFOHEADER height means top-down row order; the
    decoder reports magnitude (spec: biHeight sign is layout only)."""
    bmp = bytearray(encode_bmp(8, 4))
    bmp[22:26] = struct.pack("<i", -4)
    assert decode_image(bytes(bmp)) == ("BMP", 8, 4)


def test_bmp_row_padding_exact_size():
    """BMP rows pad to 4-byte boundaries — size formula must match the
    oracle's arithmetic in IMAGE_DECODE_SQL."""
    for w in range(1, 20):
        for h in (1, 3, 8):
            payload = encode_bmp(w, h, b"seed")
            assert len(payload) == 54 + ((w * 3 + 3) // 4) * 4 * h


def _bmp_pixels(payload: bytes):
    """Read back the (bottom-up) pixel grid of a 24-bit BMP as
    {(x, y): 3-byte bgr} using only header fields."""
    pix_off = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    row_bytes = (w * 3 + 3) & ~3
    return {
        (x, y): payload[pix_off + y * row_bytes + x * 3:
                        pix_off + y * row_bytes + x * 3 + 3]
        for y in range(abs(h)) for x in range(w)
    }


def test_resize_half_dims_and_size():
    for w in (1, 2, 7, 16):
        for h in (1, 2, 5, 8):
            dst = resize_bmp_half(encode_bmp(w, h, b"pattern"))
            dw, dh = max(w // 2, 1), max(h // 2, 1)
            assert decode_image(dst) == ("BMP", dw, dh)
            assert len(dst) == 54 + ((dw * 3 + 3) // 4) * 4 * dh


def test_resize_half_samples_even_pixels():
    """Nearest-neighbor 2:1 must take the pixel at (2x, 2y) — verified
    against a source bitmap whose every pixel is distinct."""
    w, h = 6, 4
    row_bytes = (w * 3 + 3) & ~3
    pixels = bytearray(row_bytes * h)
    for y in range(h):
        for x in range(w):
            pixels[y * row_bytes + x * 3:y * row_bytes + x * 3 + 3] = \
                bytes([x, y, x * 16 + y])
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    dst = resize_bmp_half(header + info + bytes(pixels))
    got = _bmp_pixels(dst)
    assert decode_image(dst) == ("BMP", 3, 2)
    for (x, y), bgr in got.items():
        assert bgr == bytes([2 * x, 2 * y, 2 * x * 16 + 2 * y])


def test_resize_half_rejects_non_bmp():
    with pytest.raises(ValueError):
        resize_bmp_half(b"\x89PNG\r\n\x1a\n" + b"\x00" * 60)


def test_resize_half_rejects_top_down_bmp():
    """A negative-height (top-down) BMP must be rejected, not silently
    flipped: the sampler walks rows in bottom-up order (ADVICE r3)."""
    w, h = 4, 4
    row_bytes = (w * 3 + 3) & ~3
    pixels = bytes(row_bytes * h)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    with pytest.raises(ValueError, match="top-down"):
        resize_bmp_half(header + info + pixels)


def test_audio_rms_matches_reference(spark, sf_dir):
    """Spark-side RMS (numpy over Arrow batches) must equal a pure-
    Python reference computed from the same payload bytes."""
    import math

    from mapreduce_in_pthreads_spark.operators.multimodal import (
        AUDIO_MAX_WIN,
        AUDIO_WIN,
        audio_rms_windows,
    )
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    got = {(r.doc_id, r.win_idx): (r.n_samples, r.rms_milli)
           for r in audio_rms_windows(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").limit(50).collect()
    checked = 0
    for row in docs:
        payload = row.text.encode("utf-8")
        buf = payload[:len(payload) & ~1]
        samples = [int.from_bytes(buf[i:i + 2], "little", signed=True)
                   for i in range(0, len(buf), 2)]
        n = len(samples)
        for wi in range(min(max((n + AUDIO_WIN - 1) // AUDIO_WIN, 1),
                            AUDIO_MAX_WIN)):
            w = samples[wi * AUDIO_WIN:(wi + 1) * AUDIO_WIN]
            rms = math.sqrt(sum(s * s for s in w) / len(w)) if w else 0.0
            assert got[(row.doc_id, wi)] == (len(w), int(rms * 1000)), \
                (row.doc_id, wi)
            checked += 1
    assert checked >= 50


def test_unrecognized_payload_raises_value_error():
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02\x03 definitely not an image")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff")  # truncated JPEG, no SOF


def test_resize_half_fuzz_against_reference():
    """Randomized dims/seeds: resize output must equal an independently
    computed nearest-neighbor reference on every pixel."""
    import random

    rng = random.Random(20260814)
    for _ in range(25):
        w, h = rng.randint(1, 24), rng.randint(1, 12)
        seed = bytes(rng.randrange(256) for _ in range(rng.randint(1, 8)))
        src = encode_bmp(w, h, seed)
        dst = resize_bmp_half(src)
        sp, dp = _bmp_pixels(src), _bmp_pixels(dst)
        dw, dh = max(w // 2, 1), max(h // 2, 1)
        assert decode_image(dst) == ("BMP", dw, dh)
        for y in range(dh):
            for x in range(dw):
                assert dp[(x, y)] == sp[(2 * x, 2 * y)], (w, h, x, y)
