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


def test_unrecognized_payload_raises_value_error():
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02\x03 definitely not an image")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff")  # truncated JPEG, no SOF
