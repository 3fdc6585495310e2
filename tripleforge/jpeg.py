"""Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) in pure
numpy + stdlib — no codec library.

Decoder: full marker walk; quantization and Huffman tables are read
FROM the stream (DQT/DHT), never assumed, so any conforming baseline
file decodes; sampling factors 1/2 per axis (4:4:4, 4:2:2, 4:2:0)
with nearest-neighbor chroma upsampling; restart markers reset the DC
predictors. Progressive (SOF2), arithmetic coding, 12-bit precision,
and hierarchical modes reject loudly — never wrong pixels.

Encoder (fixture generator): 4:4:4 YCbCr (or grayscale), standard
Annex-K-style table shapes scaled by quality, canonical Huffman code
assignment, byte stuffing — emits SOI/APP0/DQT/SOF0/DHT/SOS/EOI. The
tables ride in the file, so the decoder's correctness is independent
of the encoder's constants.

The 8-point DCT is the orthonormal matrix form (F = D·f·Dᵀ), verified
in tests against the O(n⁴) textbook definition — an independent check
of the transform itself, not a round-trip tautology.
"""

from __future__ import annotations

import struct

import numpy as np

from tripleforge.codecs import CodecError

# --- 8-point orthonormal DCT-II matrix ------------------------------------
_D = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        a = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        _D[_u, _x] = a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _D @ block @ _D.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _D.T @ coef @ _D


# --- zigzag ---------------------------------------------------------------
_ZIGZAG = sorted(
    ((i, j) for i in range(8) for j in range(8)),
    key=lambda t: (t[0] + t[1], t[0] if (t[0] + t[1]) % 2 else -t[0]),
)
_ZZ_ROWS = np.array([i for i, _ in _ZIGZAG])
_ZZ_COLS = np.array([j for _, j in _ZIGZAG])


# --- quantization tables (Annex-K shapes; scaled per libjpeg rule) --------
_QLUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
])
_QCHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
])


def _scaled(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --- Huffman (encoder side: canonical assignment) --------------------------
# DC tables: categories 0..11 over short codes; AC tables: simple
# canonical layouts. The exact code lengths need not match Annex K —
# the table is emitted in DHT and the decoder reads it back.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))


def _ac_table() -> tuple[list[int], list[int]]:
    """One canonical AC table covering every (run, size) symbol + EOB
    + ZRL. Layout: EOB and ZRL at length 4 (Kraft 2/16), the 160
    run/size symbols at length 9 (160/512) — total 0.4375 ≤ 1, so the
    canonical assignment is always valid. Compression is worse than
    Annex K's optimized lengths, but the table rides in DHT and any
    decoder reads it back; fixtures don't care about ratio."""
    vals = [0x00, 0xF0]  # EOB, ZRL — the two most frequent symbols
    for run in range(16):
        for size in range(1, 11):
            vals.append((run << 4) | size)
    bits = [0] * 16
    bits[3] = 2  # length 4
    bits[8] = 160  # length 9
    return bits, vals


_AC_BITS, _AC_VALS = _ac_table()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 C.2 ordering)."""
    codes = {}
    code = 0
    k = 0
    for li, n in enumerate(bits, start=1):
        for _ in range(n):
            codes[vals[k]] = (code, li)
            code += 1
            k += 1
        code <<= 1
    return codes


def _check_kraft(bits: list[int]) -> None:
    total = 0.0
    for li, n in enumerate(bits, start=1):
        total += n * 2.0 ** (-li)
    if total > 1.0:
        raise CodecError("JPEG encode: infeasible Huffman BITS")


_check_kraft(_AC_BITS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(
    bw: _BitWriter, blk: np.ndarray, qtbl, dc_codes, ac_codes, pred: int
) -> int:
    coef = _dct2(blk.astype(np.float64) - 128.0)
    q = np.round(coef / qtbl).astype(np.int64)
    zz = q[_ZZ_ROWS, _ZZ_COLS]
    dc = int(zz[0])
    diff = dc - pred
    pred = dc
    t = _category(diff)
    c, ln = dc_codes[t]
    bw.put(c, ln)
    if t:
        bw.put(_mag_bits(diff, t), t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)
            run -= 16
        t = _category(v)
        if t > 10:
            raise CodecError("JPEG encode: coefficient out of range")
        c, ln = ac_codes[(run << 4) | t]
        bw.put(c, ln)
        bw.put(_mag_bits(v, t), t)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.put(c, ln)
    return pred


def _blocks_of(plane: np.ndarray):
    h, w = plane.shape
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            yield padded[by : by + 8, bx : bx + 8]


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG
    (4:4:4, one scan). Lossy by nature; fixtures should use
    quality ≥ 85 for tight round-trips."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise CodecError(f"JPEG encode: unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r = arr[..., 0].astype(np.float64)
        g = arr[..., 1].astype(np.float64)
        b = arr[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]
    qlum = _scaled(_QLUM, quality)
    qchrom = _scaled(_QCHROM, quality)
    qtbls = [qlum] + ([qchrom] if not gray else [])
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + bytes(6)
    for tid, q in enumerate(qtbls):
        zz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    for cls, tid, bits, vals in (
        (0, 0, _DC_BITS, _DC_VALS),
        (1, 0, _AC_BITS, _AC_VALS),
    ):
        seg = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
    out += bytes([0, 63, 0])
    bw = _BitWriter()
    # interleaved scan (Ns = ncomp): data units cycle Y,Cb,Cr per MCU
    # position (4:4:4 → one block per component per MCU); DC predictors
    # are per component across the whole scan (T.81 F.1.1.5.1)
    all_blocks = [list(_blocks_of(p)) for p in planes]
    preds = [0] * ncomp
    for bi in range(len(all_blocks[0])):
        for ci in range(ncomp):
            preds[ci] = _encode_block(
                bw, all_blocks[ci][bi], qtbls[0 if ci == 0 else -1],
                dc_codes, ac_codes, preds[ci],
            )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------
class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise CodecError("JPEG: entropy stream exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    table = {}
    code = 0
    k = 0
    for li, n in enumerate(bits, start=1):
        for _ in range(n):
            table[(li, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for li in range(1, 17):
        code = (code << 1) | br.read_bit()
        if (li, code) in table:
            return table[(li, code)]
    raise CodecError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (h, w) grayscale or (h, w, 3) RGB.
    Tables and sampling structure are read from the stream; SOF0/SOF1
    only (SOF2 progressive, arithmetic, hierarchical, 12-bit reject
    loudly)."""
    if b[:2] != b"\xff\xd8":
        raise CodecError("JPEG: bad SOI")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    scan = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise CodecError(f"JPEG: expected marker at {i}")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RST: no length
            i += 2
            continue
        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise CodecError("JPEG: 16-bit quant tables not supported")
                tbl = np.zeros((8, 8), dtype=np.int64)
                tbl[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    seg[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = tbl
                j += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline/ext sequential
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise CodecError(f"JPEG: {prec}-bit precision not supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise CodecError("JPEG: progressive (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise CodecError("JPEG: non-baseline SOF not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scomps = []
            for ci in range(ns):
                cs, tabs = seg[1 + 2 * ci : 3 + 2 * ci]
                scomps.append({"cs": cs, "dc": tabs >> 4, "ac": tabs & 0x0F})
            # entropy-coded data: up to the next non-RST/non-stuffed marker
            j = i + 2 + seglen
            intervals: list[bytearray] = [bytearray()]
            while j < len(b):
                if b[j] == 0xFF:
                    nxt = b[j + 1] if j + 1 < len(b) else 0xD9
                    if nxt == 0x00:
                        intervals[-1].append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RSTn
                        intervals.append(bytearray())
                        j += 2
                        continue
                    break
                intervals[-1].append(b[j])
                j += 1
            scan = {"comps": scomps, "intervals": intervals}
            i = j
            continue
        i += 2 + seglen
    if sof is None or scan is None:
        raise CodecError("JPEG: missing SOF/SOS")

    h, w = sof["h"], sof["w"]
    comps = sof["comps"]
    if len(scan["comps"]) != len(comps):
        raise CodecError(
            "JPEG: multi-scan (non-interleaved) sequential not supported"
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4) for c in comps):
        raise CodecError("JPEG: unsupported sampling factors")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    by_cs = {c["id"]: k for k, c in enumerate(comps)}
    order = [by_cs[s["cs"]] for s in scan["comps"]]

    n_mcu = mcux * mcuy
    mcu_idx = 0
    preds = [0] * len(comps)
    for interval in scan["intervals"]:
        br = _BitReader(bytes(interval))
        preds = [0] * len(comps)
        end = (
            min(n_mcu, mcu_idx + restart_interval)
            if restart_interval
            else n_mcu
        )
        while mcu_idx < end:
            my, mx = divmod(mcu_idx, mcux)
            for si, ci in enumerate(order):
                c = comps[ci]
                sc = scan["comps"][si]
                dct = huff.get((0, sc["dc"]))
                act = huff.get((1, sc["ac"]))
                if dct is None or act is None:
                    raise CodecError("JPEG: scan references missing DHT")
                q = qt.get(c["tq"])
                if q is None:
                    raise CodecError("JPEG: scan references missing DQT")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(br, dct)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                raise CodecError("JPEG: AC index overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
                        blk = _idct2(coef) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_idx += 1
        if mcu_idx >= n_mcu:
            break
    if mcu_idx < n_mcu:
        raise CodecError("JPEG: truncated scan data")

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise CodecError(f"JPEG: {len(full)}-component images not supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bl], axis=2)), 0, 255).astype(np.uint8)
