"""Pure-stdlib baseline JPEG codec (numpy DCT + canonical Huffman).

Closes the second real-codec seam: the reference decodes JPEG from disk
into its RawImage exactly like PNG (``RawImage::new`` guesses the format,
crates/interface/src/image/mod.rs:155-177). This container ships no
PIL/cv2, but baseline JPEG needs nothing beyond numpy and the public
ITU-T.81 spec: an 8x8 DCT, Annex-K quantization + Huffman tables, and a
byte-stuffed bitstream.

Scope (the JFIF subset the reference's ``image`` crate emits/reads for
photos): baseline sequential DCT (SOF0), 8-bit samples, 1 component
(grayscale) or 3 components (YCbCr, 4:4:4 only — no subsampling), no
restart intervals, no progressive. The decoder accepts any stream inside
that subset (arbitrary DQT/DHT); the encoder writes Annex-K tables scaled
by the usual IJG quality mapping.

Exactness note used by the SQL-oracle entry (queries.media_channel_stats_
jpeg): a flat 8x8 block holds only a DC coefficient, DC = 8*(v-128) under
the orthonormal DCT; with the unscaled Annex-K luminance table (q00 = 16,
quality 50) an EVEN gray v quantizes without remainder, so grid-aligned
flat tiles of even grays survive encode->decode BIT-EXACT while still
exercising differential DC prediction, Huffman coding, byte stuffing and
block rasterization. AC paths are covered by the roundtrip/golden tests.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ITU-T.81 Annex K.1/K.2 quantization tables (natural row-major order)
QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# zigzag scan order as (row, col) index arrays
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal 8x8 DCT-II matrix: S = M @ block @ M.T, block = M.T @ S @ M
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
_M = np.cos((2 * _n + 1) * _k * np.pi / 16) * 0.5
_M[0] *= 1 / np.sqrt(2)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman assignment: symbol -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


@functools.lru_cache(maxsize=16)
def _decode_table_cached(bits: tuple, vals: tuple) -> np.ndarray:
    lut = np.zeros(1 << 16, dtype=np.int32)
    for sym, (code, length) in _canonical_codes(list(bits), list(vals)).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        lut[lo:hi] = sym * 32 + length
    return lut


def _decode_table(bits: list[int], vals: list[int]) -> np.ndarray:
    """16-bit-lookahead decode LUT: index = next 16 bits of the stream,
    value = symbol * 32 + code_length (0 for invalid prefixes). Memoized —
    every baseline decode in practice reuses the same (Annex-K) tables, so
    rebuilding the 256 KB LUT per DHT per image was pure hot-loop waste."""
    return _decode_table_cached(tuple(bits), tuple(vals))


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = the Annex-K table unmodified."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int32)


def _pack_tokens(vals: list[int], lens: list[int]) -> bytes:
    """(value, bit-length) token stream -> byte-stuffed scan bytes, packed
    vectorized (np.packbits) instead of a per-token Python bit writer —
    the encoder's hot loop at corpus scale."""
    lens_arr = np.asarray(lens, dtype=np.int64)
    vals_arr = np.asarray(vals, dtype=np.int64)
    total = int(lens_arr.sum())
    starts = np.concatenate([[0], np.cumsum(lens_arr)[:-1]])
    tok = np.repeat(np.arange(lens_arr.size), lens_arr)
    jloc = np.arange(total) - starts[tok]
    shifts = lens_arr[tok] - 1 - jloc
    bits = ((vals_arr[tok] >> shifts) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])  # pad 1s
    scan = np.packbits(bits)
    ff = np.nonzero(scan == 0xFF)[0]
    if ff.size:  # byte stuffing: 0xFF -> 0xFF 0x00
        scan = np.insert(scan, ff + 1, 0)
    return scan.tobytes()


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) float, H/W multiples of 8 -> (n_blocks, 8, 8) in raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _bit_category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(arr: np.ndarray, quality: int = 50) -> bytes:
    """(H,W) gray or (H,W,3) RGB uint8 -> baseline JFIF bytes (4:4:4)."""
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    planes = (
        [arr.astype(np.float64)]
        if gray
        else [c for c in np.moveaxis(_rgb_to_ycbcr(arr), -1, 0)]
    )
    qts = [_scale_qt(QT_LUM, quality)] + (
        [] if gray else [_scale_qt(QT_CHROMA, quality)]
    )
    # pad to 8x8 multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    dc_codes = [_canonical_codes(*DC_LUM)] + ([] if gray else [_canonical_codes(*DC_CHROMA)])
    ac_codes = [_canonical_codes(*AC_LUM)] + ([] if gray else [_canonical_codes(*AC_CHROMA)])

    # quantized zigzag coefficients per component, all blocks at once
    comp_zz = []
    for ci, p in enumerate(planes):
        blocks = _to_blocks(p - 128.0)
        coef = _M @ blocks @ _M.T  # batched GEMMs (einsum contracts naively)
        q = np.round(coef / qts[min(ci, 1)]).astype(np.int64)
        comp_zz.append(q.reshape(-1, 64)[:, _ZZ])

    # per-component DC differentials + categories, vectorized (the oracle
    # payloads are DC-only, so the per-block Python work below is a handful
    # of list appends; AC blocks take the slower token loop)
    n_blocks = comp_zz[0].shape[0]
    dc_cats, dc_mags, ac_last = [], [], []
    for ci in range(len(planes)):
        d = np.diff(comp_zz[ci][:, 0], prepend=0)
        cat = np.where(
            d == 0, 0, np.frexp(np.abs(d).astype(np.float64))[1]
        ).astype(np.int64)
        dc_cats.append(cat)
        dc_mags.append(np.where(d > 0, d, d + np.left_shift(1, cat) - 1))
        nz = comp_zz[ci][:, 1:] != 0
        has = nz.any(axis=1)
        # zz index of the last nonzero AC: the slice has 63 entries, so
        # reversed-argmax a maps to slice index 62-a = zz index 63-a
        ac_last.append(np.where(has, 63 - np.argmax(nz[:, ::-1], axis=1), 0))

    vals: list[int] = []
    lens: list[int] = []
    eob = [ac_codes[min(ci, 1)][0x00] for ci in range(len(planes))]
    for b in range(n_blocks):  # MCU = one block per component (4:4:4)
        for ci in range(len(planes)):
            t = min(ci, 1)
            cat = int(dc_cats[ci][b])
            code, length = dc_codes[t][cat]
            vals.append(code)
            lens.append(length)
            if cat:
                vals.append(int(dc_mags[ci][b]))
                lens.append(cat)
            last = int(ac_last[ci][b])
            if last:
                zz = comp_zz[ci][b]
                run = 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, length = ac_codes[t][0xF0]  # ZRL
                        vals.append(code)
                        lens.append(length)
                        run -= 16
                    cat = _bit_category(v)
                    code, length = ac_codes[t][(run << 4) | cat]
                    vals.append(code)
                    lens.append(length)
                    vals.append(v if v > 0 else v + (1 << cat) - 1)
                    lens.append(cat)
                    run = 0
            if last < 63:
                code, length = eob[ci]
                vals.append(code)
                lens.append(length)
    scan = _pack_tokens(vals, lens)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qts):
        out += seg(0xFFDB, bytes([i]) + bytes(int(v) for v in qt.reshape(-1)[_ZZ]))
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])  # id, H=V=1, qt id
    out += seg(0xFFC0, sof)
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not gray:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc, (bits, vals) in tables:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    sos = bytes([nf])
    for ci in range(nf):
        td = min(ci, 1)
        sos += bytes([ci + 1, (td << 4) | td])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Bit cursor over the (unstuffed) scan with a precomputed 32-bit
    sliding window per byte offset — one numpy index + shift per access
    instead of slicing bytes (the decoder's hot loop)."""

    def __init__(self, data: bytes) -> None:
        buf = np.frombuffer(data + b"\x00\x00\x00\x00", dtype=np.uint8).astype(
            np.uint64
        )
        self.w32 = (
            (buf[:-3] << 24) | (buf[1:-2] << 16) | (buf[2:-1] << 8) | buf[3:]
        )
        self.pos = 0  # bit position

    def peek16(self) -> int:
        p = self.pos
        return (int(self.w32[p >> 3]) >> (16 - (p & 7))) & 0xFFFF

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        return (int(self.w32[p >> 3]) >> (32 - (p & 7) - n)) & ((1 << n) - 1)


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H,W) or (H,W,3) uint8. Raises ValueError on
    streams outside the supported subset (progressive, subsampled,
    restart-interval, 12-bit)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], np.ndarray] = {}
    sof = None
    scan_comps = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ] = np.frombuffer(payload[i + 1 : i + 65], dtype=np.uint8)
                qts[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nf):
                cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — scan data follows the header
            ns = payload[0]
            scan_comps = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4, payload[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            break
    if sof is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof

    # entropy-coded segment: up to the next real marker, 0xFF00 unstuffed
    end = pos
    while end < len(data) - 1:
        if data[end] == 0xFF and data[end + 1] not in (0x00,):
            break
        end += 1
    scan = data[pos:end].replace(b"\xff\x00", b"\xff")

    nbx, nby = -(-w // 8), -(-h // 8)
    n_blocks = nbx * nby
    coefs = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in comps]
    br = _BitReader(scan)
    pred = [0] * len(comps)
    comp_tables = []
    for cid, tq in comps:
        match = [s for s in scan_comps if s[0] == cid]
        if not match:
            raise ValueError(f"component {cid} missing from scan")
        _, td, ta = match[0]
        comp_tables.append((huff[(0, td)], huff[(1, ta)], tq))

    def read_sym(lut: np.ndarray) -> int:
        entry = int(lut[br.peek16()])
        if entry == 0:
            raise ValueError("invalid Huffman code in scan")
        br.pos += entry & 31
        return entry >> 5

    for b in range(n_blocks):
        for ci, (dc_lut, ac_lut, _tq) in enumerate(comp_tables):
            zz = coefs[ci][b]
            t = read_sym(dc_lut)
            diff = _extend(br.read(t), t) if t else 0
            pred[ci] += diff
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = read_sym(ac_lut)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    if k > 63:  # ZRL may not run past the block either
                        raise ValueError("AC run past end of block")
                    continue
                k += rs >> 4
                size = rs & 0xF
                if size == 0:  # only EOB (0x00) and ZRL (0xF0) have size 0
                    raise ValueError(f"invalid AC symbol 0x{rs:02x}")
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(br.read(size), size)
                k += 1

    planes = []
    for ci, (_cid_tq) in enumerate(comps):
        tq = comp_tables[ci][2]
        deq = np.zeros((n_blocks, 64), dtype=np.float64)
        deq[:, _ZZ] = coefs[ci] * qts[tq].reshape(-1)[_ZZ]
        blocks = _M.T @ deq.reshape(-1, 8, 8) @ _M
        plane = (
            blocks.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        planes.append(plane[:h, :w] + 128.0)
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
