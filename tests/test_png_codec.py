"""Golden tests for the stdlib PNG codec (operators/png_codec.py) — the
real-codec seam for the reference's native fixture format (RawImage::new,
crates/interface/src/image/mod.rs:155-177)."""

import numpy as np
import pytest

from mit_spark.operators.png_codec import decode_png, encode_png


@pytest.mark.parametrize("filter_type", range(5))
@pytest.mark.parametrize(
    "shape", [(1, 1, 1), (5, 3), (16, 16, 3), (33, 7, 4), (40, 25, 2)]
)
def test_round_trip_all_filters(shape, filter_type):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    want = img[:, :, None] if img.ndim == 2 else img
    got = decode_png(encode_png(img, filter_type=filter_type))
    assert got.dtype == np.uint8
    assert got.shape == want.shape
    assert (got == want).all()


def test_round_trip_synth_page():
    """The actual payload the PNG media path carries: a rendered synth page."""
    from mit_spark.synth import render_media

    img = render_media("media-0000000042xx")
    for ft in (0, 1, 4):
        assert (decode_png(encode_png(img, filter_type=ft)) == img).all()


def test_filters_compress_gradients():
    """Sub/Paeth must actually act as predictors (a constant-slope image
    compresses far better than filter 0) — guards against a 'filter byte
    written but identity applied' bug that a round-trip alone can't see."""
    g = np.tile(np.arange(256, dtype=np.uint8), (64, 1))[:, :, None].repeat(3, axis=2)
    sizes = {ft: len(encode_png(g, filter_type=ft)) for ft in range(5)}
    assert sizes[1] < sizes[0] / 2
    assert sizes[4] < sizes[0] / 2


def test_decoder_rejects_out_of_scope():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + bytes(data[4:]))
    # corrupt the IHDR CRC
    bad = bytes(data[:29]) + b"\x00" + bytes(data[30:])
    with pytest.raises(ValueError, match="CRC|IHDR"):
        decode_png(bad)
    with pytest.raises(ValueError, match="channel"):
        encode_png(np.zeros((2, 2, 5), dtype=np.uint8))
    with pytest.raises(ValueError, match="filter"):
        encode_png(img, filter_type=7)


def test_decoder_against_hand_built_bytes():
    """Independent golden: the PNG is assembled BYTE BY BYTE from the spec
    here (filter arithmetic done by hand, not by our encoder), so a
    symmetric encoder+decoder bug — both misreading the same spec clause —
    cannot round-trip its way past this test.

    Image (2x2 RGB):   (10,20,30) (110,120,130)
                       (40,50,60) ( 40, 60, 80)
    Row 0 uses filter 1 (Sub):  10,20,30, then 110-10,120-20,130-30
    Row 1 uses filter 2 (Up):   40-10,50-20,60-30, then 40-110,60-120,80-130
    (mod 256)."""
    import struct
    import zlib

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    row0 = bytes([1, 10, 20, 30, 100, 100, 100])
    row1 = bytes([2, 30, 30, 30, (40 - 110) % 256, (60 - 120) % 256, (80 - 130) % 256])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    want = np.array(
        [[[10, 20, 30], [110, 120, 130]], [[40, 50, 60], [40, 60, 80]]],
        dtype=np.uint8,
    )
    assert (got == want).all()
    # and our encoder reproduces pixel-identical content for the same image
    assert (decode_png(encode_png(want, filter_type=4)) == want).all()


def test_decode_external_png_normalizes_to_rgb():
    """decode_external('png', ...) mirrors the reference's to-RGB load:
    RGBA drops alpha, gray replicates, RGB passes through."""
    from mit_spark.operators.multimodal import decode_external

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert (decode_external("png", encode_png(rgb)) == rgb).all()
    rgba = rng.integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    assert (decode_external("png", encode_png(rgba)) == rgba[:, :, :3]).all()
    gray = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    out = decode_external("png", encode_png(gray))
    assert out.shape == (6, 5, 3)
    assert (out == gray[:, :, None]).all()
