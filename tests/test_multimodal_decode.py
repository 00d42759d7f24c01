"""REAL multimodal decode path (extract_features(fake=False)).

The fake path stays the driver-oracle twin; these tests pin the real
decode on payloads generated in-test: a valid PNG built from stdlib
zlib/struct and a WAV written by stdlib `wave`. The Pillow branch gets
extra coverage when the codec is installed (skipped otherwise).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from t_spoon_spark.operators.multimodal import _decode_real, extract_features


def make_png(w: int, h: int) -> bytes:
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(3 * w) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(n_frames: int, framerate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(b"\x00\x00" * n_frames)
    return buf.getvalue()


def test_decode_real_png_and_wav_direct():
    img = _decode_real(make_png(320, 200), "image")
    assert (img["width"], img["height"], img["n_frames"]) == (320, 200, 1)
    aud = _decode_real(make_wav(4321), "audio")
    assert aud["n_frames"] == 4321
    assert (aud["width"], aud["height"]) == (0, 0)


def test_decode_real_unknown_formats_raise():
    with pytest.raises(NotImplementedError):
        _decode_real(b"not an image", "image")
    with pytest.raises(NotImplementedError):
        _decode_real(b"not audio", "audio")


def test_extract_features_real_path_end_to_end(spark):
    rows = [
        (1, "image", bytearray(make_png(64, 48))),
        (2, "audio", bytearray(make_wav(1000))),
        (3, "image", bytearray(make_png(640, 480))),
    ]
    mm = spark.createDataFrame(rows, "doc_id long, kind string, payload binary")
    out = {
        r["doc_id"]: r
        for r in extract_features(mm, fake=False).collect()
    }
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (64, 48, 1)
    assert (out[3]["width"], out[3]["height"]) == (640, 480)
    assert out[2]["n_frames"] == 1000
    # JVM-side columns survive the real decode unchanged
    assert out[1]["n_bytes"] == len(make_png(64, 48))
    assert len(out[1]["sig"]) == 16


def test_decode_real_pillow_branch():
    pytest.importorskip("PIL")
    # Pillow decodes the same generated PNG through its own codec
    img = _decode_real(make_png(123, 77), "image")
    assert (img["width"], img["height"]) == (123, 77)


def test_jpeg_header_walk_with_fill_bytes_and_rst():
    """A spec-valid JPEG may pad between segments with 0xFF fill bytes
    and carry standalone markers; the header walk must skip both and
    still find SOF0."""
    import struct

    def seg(marker, data):
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    sof0 = seg(0xC0, struct.pack(">BHHB", 8, 77, 123, 3) + b"\x00" * 9)
    payload = (
        b"\xff\xd8"  # SOI
        + seg(0xE0, b"JFIF\x00")  # APP0
        + b"\xff"  # fill byte
        + b"\xff\x01"  # TEM standalone marker
        + sof0
        + b"\xff\xd9"  # EOI
    )
    assert payload[:3] == b"\xff\xd8\xff"
    img = _decode_real(bytes(payload), "image")
    assert (img["width"], img["height"]) == (123, 77)


def test_gif_header_reports_single_frame():
    """Pure header decode cannot count GIF frames reliably (a byte scan
    miscounts on palette/LZW data) — it reports 1; Pillow reports the
    true animated count when installed."""
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 40, 30) + b"\x00" * 20 + b"\x00\x2c" * 3
    img = _decode_real(gif, "image")
    assert (img["width"], img["height"], img["n_frames"]) == (40, 30, 1)
