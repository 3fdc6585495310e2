"""Baseline JPEG codec (tripleforge/jpeg.py): the DCT itself is
verified against the O(n⁴) textbook definition (independent of any
round-trip tautology); round-trips bound reconstruction error on
noise/gradient/uniform content; structural rejections are loud; the
decoder reads its tables from the stream."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tripleforge.codecs import CodecError, decode_payload, image_features
from tripleforge.jpeg import _dct2, _idct2, decode_jpeg, encode_jpeg


def _rng(seed):
    return np.random.RandomState(seed)


def test_dct_matches_textbook_definition():
    blk = _rng(0).randint(0, 256, (8, 8)).astype(np.float64)
    ref = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            au = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
            av = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        blk[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[u, v] = au * av * s
    np.testing.assert_allclose(_dct2(blk), ref, atol=1e-9)
    np.testing.assert_allclose(_idct2(_dct2(blk)), blk, atol=1e-9)


def test_uniform_image_decodes_exactly():
    img = np.full((16, 24), 128, dtype=np.uint8)
    np.testing.assert_array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_gray_roundtrip_nonmultiple_of_8():
    img = _rng(1).randint(0, 256, (17, 23), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 24


def test_smooth_gradient_high_fidelity():
    g = np.add.outer(np.arange(40) * 3, np.arange(56) * 2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert int(np.abs(out.astype(int) - g.astype(int)).max()) <= 3


def test_rgb_roundtrip():
    img = _rng(2).randint(0, 256, (12, 20, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 48
    # channel means survive quantization closely
    for c in range(3):
        assert abs(float(out[..., c].mean()) - float(img[..., c].mean())) < 4


@pytest.mark.parametrize("q,bound", [(50, 96), (75, 64), (95, 24)])
def test_quality_monotonicity(q, bound):
    img = _rng(3).randint(0, 256, (24, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=q))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= bound


def test_progressive_rejected():
    jpg = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = jpg.find(b"\xff\xc0")
    jpg[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(CodecError, match="progressive"):
        decode_jpeg(bytes(jpg))


def test_truncated_scan_rejected():
    jpg = encode_jpeg(_rng(4).randint(0, 256, (16, 16), dtype=np.uint8))
    with pytest.raises(CodecError):
        decode_jpeg(jpg[: len(jpg) // 2])


def test_bad_soi_rejected():
    with pytest.raises(CodecError, match="bad SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_decoder_reads_tables_from_stream():
    """Corrupting a DQT entry must change the decoded pixels — proof
    the decoder uses the stream's tables, not constants."""
    img = np.add.outer(np.arange(16) * 8, np.arange(16) * 5).astype(np.uint8)
    jpg = bytearray(encode_jpeg(img, quality=90))
    i = jpg.find(b"\xff\xdb")
    base = decode_jpeg(bytes(jpg))
    jpg[i + 5] = 255  # DC quant step of table 0 -> 255
    warped = decode_jpeg(bytes(jpg))
    assert not np.array_equal(base, warped)


def test_restart_markers():
    """Insert a DRI header and RST markers between MCU rows by
    re-encoding manually is overkill — instead verify the decoder
    accepts a file with DRI=0 (no restarts) and fill bytes."""
    jpg = bytearray(encode_jpeg(np.full((8, 8), 200, dtype=np.uint8)))
    # inject a DRI segment (interval 0) + an extra fill byte before SOS
    i = jpg.find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 0)
    jpg[i:i] = dri + b"\xff"
    out = decode_jpeg(bytes(jpg))
    assert int(np.abs(out.astype(int) - 200).max()) <= 2


def test_decode_payload_jpeg_dispatch():
    img = _rng(5).randint(0, 256, (16, 16), dtype=np.uint8)
    jpg = encode_jpeg(img, quality=95)
    f = decode_payload(jpg, dim=4)
    np.testing.assert_allclose(
        f, image_features(decode_jpeg(jpg).astype(np.float64), 4)
    )
