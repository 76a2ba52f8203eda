"""Motion-JPEG AVI container tests: a hand-built container golden (the
frame inside it comes from the already-golden-tested JPEG encoder, so this
isolates the RIFF walk), bit-exact tile roundtrips, lossy bounds, unknown
chunks, and subset rejection."""

import struct

import numpy as np
import pytest

from mit_spark.operators.avi_codec import decode_avi_mjpg, encode_avi_mjpg
from mit_spark.operators.jpeg_codec import encode_jpeg


def _manual_container(frame_blobs, handler=b"MJPG"):
    """Hand-assemble a minimal RIFF/AVI around pre-encoded JPEG blobs,
    WITHOUT encode_avi_mjpg — exercises the decoder's chunk walk alone."""

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    strh = b"vids" + handler + bytes(48)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"strh", strh))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", b) for b in frame_blobs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_hand_built_container_golden():
    img = np.kron(
        np.array([[36, 118]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    raw = _manual_container([encode_jpeg(img)])
    frames = decode_avi_mjpg(raw)
    assert len(frames) == 1
    assert np.array_equal(frames[0], img)


def test_tile_frames_roundtrip_bit_exact():
    from mit_spark.operators.multimodal import jpeg_tile_image

    fr = [jpeg_tile_image(f"r:{i}", 64, 48) for i in range(4)]
    out = decode_avi_mjpg(encode_avi_mjpg(fr))
    assert len(out) == 4
    assert all(np.array_equal(a, b) for a, b in zip(fr, out))


def test_color_frames_bounded():
    rng = np.random.RandomState(2)
    fr = [rng.randint(0, 256, (16, 16, 3)).astype(np.uint8) for _ in range(3)]
    out = decode_avi_mjpg(encode_avi_mjpg(fr, quality=90))
    assert len(out) == 3
    for a, b in zip(fr, out):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 40


def test_unknown_chunks_skipped():
    img = np.full((8, 8), 62, dtype=np.uint8)
    raw = encode_avi_mjpg([img])
    # append an idx1 chunk (writers add indexes; decoder must ignore it)
    idx = b"idx1" + struct.pack("<I", 16) + bytes(16)
    frames = decode_avi_mjpg(raw[:4] + struct.pack("<I", len(raw) - 8 + len(idx)) + raw[8:] + idx)
    assert len(frames) == 1 and np.array_equal(frames[0], img)


def test_unsupported_rejected():
    img = np.full((8, 8), 62, dtype=np.uint8)
    blob = encode_jpeg(img)
    with pytest.raises(ValueError, match="AVI"):
        decode_avi_mjpg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="MJPG"):
        decode_avi_mjpg(_manual_container([blob], handler=b"H264"))
    with pytest.raises(ValueError, match="frame"):
        decode_avi_mjpg(_manual_container([]))


def test_second_stream_video_decoded():
    """AVI stream numbering is positional: a file whose audio strl precedes
    the MJPG vids strl carries frames as '01dc'. The decoder must follow
    the vids stream's index, not assume stream 00."""

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    img = np.full((8, 8), 62, dtype=np.uint8)
    blob = encode_jpeg(img)
    auds = chunk(b"LIST", b"strl" + chunk(b"strh", b"auds" + b"\x00" * 52))
    vids = chunk(b"LIST", b"strl" + chunk(b"strh", b"vids" + b"MJPG" + bytes(48)))
    hdrl = chunk(b"LIST", b"hdrl" + auds + vids)
    movi = chunk(
        b"LIST",
        b"movi" + chunk(b"00wb", bytes(32)) + chunk(b"01dc", blob) + chunk(b"01dc", blob),
    )
    body = b"AVI " + hdrl + movi
    frames = decode_avi_mjpg(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert len(frames) == 2 and np.array_equal(frames[0], img)
