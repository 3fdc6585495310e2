"""Pure-stdlib PNG / WAV codecs (r5b) + real decoded features through
the Spark multimodal path. The PNG decoder is additionally checked
against test-side FORWARD filtering (the encoder only emits filter 0,
so Sub/Up/Average/Paeth rows are constructed here by applying the RFC
2083 filter definitions and must unfilter back exactly)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tripleforge.codecs import (
    CodecError,
    _lzw_decode,
    _lzw_encode,
    audio_features,
    decode_gif,
    decode_payload,
    decode_png,
    decode_wav,
    encode_gif,
    encode_png,
    encode_wav,
    image_features,
)


def _rng_img(seed, h, w, ch=None):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8).astype(np.uint8)


# ---------------------------------------------------------------------------
# PNG round-trips
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("ch", [None, 3, 4])
def test_png_roundtrip(ch):
    img = _rng_img(1, 11, 7, ch)
    out = decode_png(encode_png(img))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


def test_png_one_pixel():
    img = np.array([[123]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def _filter_row(ft, row, prev, bpp):
    """FORWARD filter per RFC 2083 (test-side reference)."""
    row = row.astype(np.int64)
    prev = prev.astype(np.int64)
    out = np.zeros_like(row)
    for x in range(row.size):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (row[x] - pred) % 256
    return out.astype(np.uint8)


def test_png_all_filter_types_unfilter_exactly():
    """Craft a PNG whose 5 RGB rows use filters 0,1,2,3,4 and check
    the decoder recovers the original pixels."""
    img = _rng_img(7, 5, 6, 3)
    bpp = 3
    scan = bytearray()
    prev = np.zeros(6 * bpp, dtype=np.uint8)
    for y in range(5):
        row = img[y].reshape(-1)
        scan.append(y)  # filter type = row index
        scan.extend(_filter_row(y, row, prev, bpp).tobytes())
        prev = row

    def chunk(ct, data):
        return (
            struct.pack(">I", len(data)) + ct + data
            + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), img)


def test_png_palette_decode():
    plte = bytes([10, 20, 30, 200, 100, 0])  # 2 entries
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    scan = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()

    def chunk(ct, data):
        return (
            struct.pack(">I", len(data)) + ct + data
            + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert list(out[0, 0]) == [10, 20, 30] and list(out[0, 1]) == [200, 100, 0]


def test_png_loud_rejections():
    img = _rng_img(2, 3, 3, 3)
    good = bytearray(encode_png(img))
    # 16-bit depth
    bad = bytearray(good)
    bad[24] = 16
    with pytest.raises(CodecError, match="bit depth"):
        decode_png(bytes(bad))
    # interlaced
    bad = bytearray(good)
    bad[28] = 1
    with pytest.raises(CodecError, match="interlac"):
        decode_png(bytes(bad))
    # header-only container (synth_media's sniffing fixture shape)
    with pytest.raises(CodecError, match="IDAT"):
        decode_png(
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big") + b"IHDR"
            + struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0) + b"\0\0\0\0"
            + (0).to_bytes(4, "big") + b"IEND" + b"\0\0\0\0"
        )


# ---------------------------------------------------------------------------
# WAV round-trips
# ---------------------------------------------------------------------------
def test_wav_roundtrip_mono_and_stereo():
    mono = (np.sin(np.arange(300) * 0.1) * 20000).astype(np.int16)
    rate, got = decode_wav(encode_wav(mono, rate=44100))
    assert rate == 44100
    np.testing.assert_array_equal(got, mono)
    stereo = np.stack([mono, -mono], axis=1)
    rate, got = decode_wav(encode_wav(stereo, rate=8000))
    assert rate == 8000 and got.shape == (300, 2)
    np.testing.assert_array_equal(got, stereo)


def test_wav_8bit_decode():
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 3) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 3) + data
    )
    rate, got = decode_wav(wav)
    assert rate == 8000
    assert list(got) == [-32768, 0, 32512]


def test_wav_non_pcm_rejected():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(CodecError, match="non-PCM"):
        decode_wav(wav)


# ---------------------------------------------------------------------------
# GIF (LZW)
# ---------------------------------------------------------------------------
def test_lzw_decode_hand_built_kwkwk():
    """Hand-packed stream (min code size 2, clear=4, end=5, 3-bit
    codes LSB-first): CLEAR, literal 1, code 6 — the KwKwK case where
    the code equals next_code and must expand to prev + prev[0].
    Codes 4,1,6,5 pack to 4 | 1<<3 | 6<<6 | 5<<9 = 2956 = b'\\x8c\\x0b'."""
    assert _lzw_decode(b"\x8c\x0b", 2) == b"\x01\x01\x01"


def test_lzw_invalid_code_rejected():
    # codes 4,1,7: 7 is neither in the table nor next_code
    with pytest.raises(CodecError, match="corrupt LZW"):
        _lzw_decode(b"\xcc\x01", 2)


def test_lzw_missing_end_rejected():
    with pytest.raises(CodecError, match="without END"):
        _lzw_decode(b"\x0c", 2)  # CLEAR, literal 1, then stream stops


@pytest.mark.parametrize("min_code", [2, 4, 8])
def test_lzw_roundtrip_long_stream(min_code):
    # long enough to force several re-CLEARs at every width
    n = 4000
    data = bytes((i * 31 + (i >> 3)) % (1 << min_code) for i in range(n))
    assert _lzw_decode(_lzw_encode(data, min_code), min_code) == data


def test_gif_roundtrip():
    h, w = 13, 9
    idx = ((np.arange(h)[:, None] * 3 + np.arange(w)[None, :]) % 6).astype(
        np.uint8
    )
    pal = (np.arange(18, dtype=np.uint8) * 7 % 256).reshape(6, 3)
    out = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(out, pal[idx])


def test_gif_256_color_roundtrip():
    idx = _rng_img(11, 32, 32)  # full 8-bit index range
    pal = _rng_img(12, 256, 3).reshape(256, 3)
    np.testing.assert_array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_gif_interlaced_and_extension_skip():
    """Manually assembled GIF89a: graphic-control extension before the
    frame, interlace flag set, rows stored in pass order — decode must
    skip the extension and de-interlace back to the original image."""
    h, w = 11, 4
    idx = (np.arange(h * w).reshape(h, w) % 8).astype(np.uint8)
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stored = idx[order]
    lzw = _lzw_encode(stored.tobytes(), 3)
    gif = bytearray(b"GIF89a")
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0xA2, 0, 0])  # GCT present, 8 entries
    gif += pal.tobytes()
    gif += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    gif += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0x40])  # interlaced, no local color table
    gif += bytes([3])  # LZW min code size
    for off in range(0, len(lzw), 255):
        sub = lzw[off : off + 255]
        gif += bytes([len(sub)]) + sub
    gif += b"\x00\x3b"
    np.testing.assert_array_equal(decode_gif(bytes(gif)), pal[idx])


def test_gif_first_frame_of_animation():
    idx1 = np.full((4, 4), 1, dtype=np.uint8)
    idx2 = np.full((4, 4), 2, dtype=np.uint8)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    f1 = encode_gif(idx1, pal)
    f2 = encode_gif(idx2, pal)
    # splice frame 2's image block (after header+LSD+GCT) before f1's
    # trailer: header is 6+7+3*4 = 25 bytes, trailer is final "\x3b"
    animated = f1[:-1] + f2[25:]
    np.testing.assert_array_equal(decode_gif(animated), pal[idx1])


def test_gif_loud_rejections():
    idx = np.zeros((3, 3), dtype=np.uint8)
    pal = np.zeros((2, 3), dtype=np.uint8)
    good = encode_gif(idx, pal)
    with pytest.raises(CodecError, match="bad signature"):
        decode_gif(b"GIF90a" + good[6:])
    with pytest.raises(CodecError, match="no image frame"):
        decode_gif(good[:25] + b"\x3b")  # header + GCT, frame stripped
    with pytest.raises(CodecError, match="index beyond palette"):
        encode_gif(np.full((2, 2), 5, dtype=np.uint8), pal)
    # header-only sniffing fixture (synth_media) must stay decodable-
    # rejected, not crash: no color table, no frame
    with pytest.raises(CodecError, match="no image frame"):
        decode_gif(
            b"GIF89a" + (5).to_bytes(2, "little") + (4).to_bytes(2, "little")
            + bytes([0, 0, 0]) + b"\x3b"
        )


def test_gif_decode_payload_dispatch():
    idx = (np.arange(36, dtype=np.uint8).reshape(6, 6)) % 4
    pal = np.array(
        [[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]],
        dtype=np.uint8,
    )
    f = decode_payload(encode_gif(idx.astype(np.uint8), pal), dim=4)
    np.testing.assert_allclose(
        f, image_features(pal[idx].astype(np.float64), 4)
    )


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------
def test_image_features_block_average():
    img = np.zeros((8, 8), dtype=np.uint8)
    img[4:, 4:] = 255  # bottom-right quadrant white
    f = image_features(img, dim=4)
    assert f.shape == (4,)
    np.testing.assert_allclose(f, [0.0, 0.0, 0.0, 1.0])


def test_audio_features_envelope():
    x = np.concatenate(
        [np.zeros(100, dtype=np.int16),
         np.full(100, 16384, dtype=np.int16)]
    )
    f = audio_features(x, dim=2)
    np.testing.assert_allclose(f, [0.0, 0.5], atol=1e-6)


def test_decode_payload_dispatch_and_rejection():
    img = _rng_img(3, 6, 6, 3)
    f = decode_payload(encode_png(img), dim=4)
    np.testing.assert_allclose(f, image_features(img, 4))
    # a malformed JPEG-ish payload goes down the real JPEG path and
    # fails loudly there (r5: JPEG is decoded, not rejected wholesale)
    with pytest.raises(CodecError):
        decode_payload(b"\xff\xd8\xff\xe0 jpeg-ish", dim=4)
    # codec-less container (MP4 ftyp) stays a loud dispatch rejection
    with pytest.raises(CodecError, match="no pure-stdlib codec"):
        decode_payload(bytes(4) + b"ftypisom" + bytes(8), dim=4)


# ---------------------------------------------------------------------------
# Spark path: real decoded features end-to-end
# ---------------------------------------------------------------------------
def test_extract_features_real_decode(spark):
    from tripleforge.multimodal import (
        extract_features,
        synth_decodable_media,
    )

    docs = spark.createDataFrame(
        [(i, 50 + i * 3) for i in range(8)], "doc_id long, n_chars long"
    )
    from pyspark.sql import functions as F

    media = synth_decodable_media(docs).withColumn(
        "kind",
        F.when(F.col("media_id") % 2 == 0, "image").otherwise("audio"),
    )
    feats = extract_features(media, dim=4, fake=False)  # REAL decode only
    rows = {r.media_id: r.feature for r in feats.collect()}
    assert len(rows) == 8
    # cross-check one PNG and one WAV against the local codec path
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid in (0, 1):
        np.testing.assert_allclose(
            rows[mid], decode_payload(payloads[mid], dim=4), rtol=1e-6
        )
    # determinism across partitionings
    rows2 = {
        r.media_id: r.feature
        for r in extract_features(media.repartition(5), dim=4, fake=False).collect()
    }
    assert rows == rows2
