"""Pure-stdlib Motion-JPEG AVI codec — the video half of the real-format
multimodal seam.

The reference reads images (RawImage); a training pipeline's media column
also carries video. With png/jpeg/wav already closed by stdlib codecs,
video needs only a CONTAINER around per-frame JPEG: Motion-JPEG in the
public RIFF/AVI layout ('hdrl' headers + 'movi' list of '00dc' frame
chunks), every frame encoded/decoded by operators/jpeg_codec.py. No
external libs; no inter-frame prediction (MJPEG is the archival/intraframe
profile, which is also why per-frame decode parallelizes trivially).

Scope: one 'vids' stream, fccHandler 'MJPG', frame chunks '00dc'; unknown
chunks/lists are skipped on decode; non-MJPG streams are rejected. The
same DC-only exactness argument as the JPEG oracle applies per frame, so
a video built from flat even-gray tiles decodes bit-exact end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np

from mit_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpg(
    frames: "list[np.ndarray] | np.ndarray", fps: int = 10, quality: int = 50
) -> bytes:
    """Frames ((H,W) gray or (H,W,3) RGB uint8, uniform size) -> AVI bytes
    with one MJPG video stream."""
    frames = list(frames)
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [encode_jpeg(f, quality=quality) for f in frames]
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        0,  # max bytes/sec (informational)
        0,  # padding granularity
        # AVIF_TRUSTCKTYPE (0x800): chunk fourccs are authoritative. NOT
        # AVIF_HASINDEX (0x10) — this writer emits no idx1 chunk, so
        # advertising an index would make the file spec-inconsistent for
        # strict external parsers.
        0x800,
        len(blobs),
        0,
        1,  # one stream
        max(len(b) for b in blobs),
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, len(blobs),
                      max(len(b) for b in blobs), -1, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", b) for b in blobs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpg(data: bytes) -> list[np.ndarray]:
    """AVI bytes -> list of decoded frames ((H,W) or (H,W,3) uint8).
    Walks the RIFF tree, requires an MJPG 'vids' stream, and decodes the
    compressed-video chunks of THAT stream's index ('NNdc' where NN is the
    vids stream's position among the strh headers — stream numbering is
    positional in AVI, so a file whose audio strl precedes the video one
    carries its frames as '01dc'). Other streams' chunks are ignored
    rather than fed to the JPEG decoder."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    handler = None
    vid_stream = -1
    n_streams = 0
    blobs: list[tuple[bytes, bytes]] = []  # (stream-id fourcc prefix, jpeg)

    def walk(buf: bytes) -> None:
        nonlocal handler, vid_stream, n_streams
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            payload = buf[pos + 8 : pos + 8 + ln]
            if tag == b"LIST":
                walk(payload[4:])  # skip the list-kind fourcc
            elif tag == b"strh":
                if payload[:4] == b"vids" and vid_stream < 0:
                    handler = payload[4:8]
                    vid_stream = n_streams
                n_streams += 1
            elif tag[2:4] == b"dc" and tag[:2].isdigit():
                blobs.append((tag[:2], payload))
            pos += 8 + ln + (ln & 1)

    walk(data[12:])
    if handler is None:
        raise ValueError("no video stream header found")
    if handler != b"MJPG":
        raise ValueError(f"only MJPG streams supported (got {handler!r})")
    want = b"%02d" % vid_stream
    frames = [decode_jpeg(b) for sid, b in blobs if sid == want]
    if not frames:
        raise ValueError("no frame chunks in movi list")
    return frames
