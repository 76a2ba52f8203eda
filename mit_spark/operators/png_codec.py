"""Pure-stdlib PNG codec (zlib + struct + numpy) — closes the real-codec
seam for the reference's native image format.

The reference decodes PNG from disk into its RawImage (``RawImage::new``,
crates/interface/src/image/mod.rs:155-177; every golden fixture in
crates/interface/src/lib.rs:13-292 is a PNG). This container ships no PIL/
cv2/av, but PNG itself needs nothing beyond the stdlib: chunked container
(struct + crc32), one zlib stream, and five per-scanline byte filters that
numpy un-does. Scope: 8-bit depth, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), no interlace — exactly the subset the reference's
fixtures use (RGB/RGBA pages).

Encoder notes: one IDAT chunk, a single filter type applied to every
scanline. Filter selection is a size optimization, not a correctness one,
so the default is 0 (None); the parameter exists so tests can golden-check
every decode path (Sub/Up/Average/Paeth) against the same pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> color type


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4) over int arrays: nearest of
    left/up/up-left to p = left + up - upleft, ties left > up > upleft."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """(H,W) / (H,W,C) uint8 -> PNG bytes. ``filter_type`` (0-4) is applied
    to every scanline; all five produce identical pixels on decode.
    ``level`` is the zlib effort (1 = fast, 6 = default ratio)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    if filter_type not in range(5):
        raise ValueError(f"bad filter type {filter_type}")
    px = arr.astype(np.int64)  # headroom for the filter arithmetic
    rows = px.reshape(h, w * c)
    # neighbor planes seen by the forward filter (original, unfiltered values)
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    left = np.zeros_like(rows)
    left[:, c:] = rows[:, :-c]
    upleft = np.zeros_like(rows)
    upleft[1:, c:] = rows[:-1, :-c]
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - up
    elif filter_type == 3:
        filt = rows - (left + up) // 2
    else:
        filt = rows - _paeth(left, up, upleft)
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = (filt % 256).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H,W,C) uint8 (C=1/2/3/4). Verifies chunk CRCs; rejects
    interlaced / non-8-bit / palette images (outside the reference subset)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color_type} "
            f"interlace={interlace}); codec covers the reference's 8-bit "
            "non-interlaced subset"
        )
    c = _CHANNELS[color_type]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("IDAT size does not match dimensions")
    raw = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.int64)
    zero = np.zeros(c, dtype=np.int64)
    for y in range(h):
        ft = int(raw[y, 0])
        cur = raw[y, 1:].astype(np.int64)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if ft == 0:
            out[y] = cur
        elif ft == 1:  # Sub: per-lane prefix sum, vectorized
            lanes = cur.reshape(-1, c)
            out[y] = (np.cumsum(lanes, axis=0) % 256).reshape(-1)
        elif ft == 2:  # Up
            out[y] = (cur + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: left-recursive, walk pixels
            row = out[y]
            for i in range(w):
                s = i * c
                left = row[s - c : s] if i else zero
                up_px = prev[s : s + c]
                if ft == 3:
                    row[s : s + c] = (cur[s : s + c] + (left + up_px) // 2) % 256
                else:
                    ul = prev[s - c : s] if i else zero
                    row[s : s + c] = (
                        cur[s : s + c] + _paeth(left, up_px, ul)
                    ) % 256
        else:
            raise ValueError(f"bad scanline filter {ft}")
    return out.astype(np.uint8).reshape(h, w, c)
