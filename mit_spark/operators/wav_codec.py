"""Pure-stdlib WAV (RIFF/PCM) codec — the audio half of the multimodal
binary-column story.

The reference's media surface is images (RawImage; crates/interface/src/
image/mod.rs), but a training-data pipeline's media columns also carry
audio; the engine treats audio exactly like image/video — an opaque
``binary`` column with typed metadata — and this codec closes the
real-format seam the way png_codec/jpeg_codec do for images: struct +
numpy over the public RIFF/WAVE layout, no external libs.

Scope: canonical PCM WAV — 'RIFF'/'WAVE' container, one 'fmt ' chunk
(format tag 1 = linear PCM, 16-bit samples, 1..8 channels), one 'data'
chunk; unknown chunks are skipped on decode (players write LIST/INFO
etc.). Float/ADPCM/extensible formats are rejected with ValueError.
PCM is lossless, so encode->decode is bit-exact by construction — the
oracle entry's stats can be stated in closed form.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(N,) or (N,C) int16 -> WAV bytes (PCM 16-bit, interleaved)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or not 1 <= samples.shape[1] <= 8:
        raise ValueError("samples must be (N,) or (N,C) with 1<=C<=8")
    if samples.dtype != np.int16:
        raise ValueError("16-bit PCM requires int16 samples")
    n, c = samples.shape
    data = samples.astype("<i2").tobytes()
    block = c * 2
    fmt = struct.pack("<HHIIHH", 1, c, rate, rate * block, block, 16)
    size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, (N,C) int16). Walks chunks; skips unknown
    ones; rejects non-PCM / non-16-bit streams."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE header missing)")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            pcm = payload
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    tag_fmt, channels, rate, _byterate, _block, bits = fmt
    if tag_fmt != 1:
        raise ValueError(f"only linear PCM supported (format tag {tag_fmt})")
    if bits != 16:
        raise ValueError(f"only 16-bit samples supported (got {bits})")
    arr = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:
        arr = arr[: len(arr) - len(arr) % channels].reshape(-1, channels)
    else:
        arr = arr[:, None]
    return rate, arr.astype(np.int16)
