"""Golden + roundtrip tests for the stdlib baseline JPEG codec, mirroring
the PNG codec's test strategy: one HAND-BUILT byte stream decoded against
hand-computed pixels (breaks encode/decode circularity), bit-exact
roundtrips on the DC-only construction the SQL oracle relies on, bounded
lossy error elsewhere, and explicit rejection of the unsupported subset."""

import numpy as np
import pytest

from mit_spark.operators.jpeg_codec import (
    AC_LUM,
    DC_LUM,
    decode_jpeg,
    encode_jpeg,
)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _hand_built_flat136() -> bytes:
    """Minimal 8x8 grayscale JPEG built byte-by-byte WITHOUT the encoder.

    Quant table: all 16s (zigzag of a constant table is the same 64 bytes).
    Scan: flat 136 -> level-shifted 8, DC = 8*8 = 64, quantized 64/16 = 4.
    Annex-K DC-lum canonical codes put category 3 at '100' (lengths
    2,3,3,3,3,3,4,...), so DC emits '100' + '100' (the 3 magnitude bits of
    +4); AC-lum EOB (symbol 0x00) is the first 4-bit code '1010'. Total 10
    bits '1001001010' padded with six 1s -> bytes 0x92 0xBF."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    out += _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUM[0]) + bytes(DC_LUM[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUM[0]) + bytes(AC_LUM[1]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes([0x92, 0xBF])
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_golden_decodes_to_flat_136():
    arr = decode_jpeg(_hand_built_flat136())
    assert arr.shape == (8, 8)
    assert np.array_equal(arr, np.full((8, 8), 136, dtype=np.uint8))


def test_even_gray_tiles_roundtrip_bit_exact():
    """The exactness contract the SQL oracle entry rests on: grid-aligned
    flat 8x8 tiles of EVEN grays survive quality-50 encode->decode exactly
    (DC-only blocks, q00=16), across many DC magnitudes + differential
    prediction signs."""
    rng = np.random.RandomState(7)
    tiles = (rng.randint(0, 128, (9, 13)) * 2).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=50)), img)


def test_odd_gray_tiles_are_not_exact_but_close():
    """Control for the evenness argument: ODD grays quantize with remainder
    1/2 and come back off by exactly +-1 on some tiles."""
    img = np.kron(
        np.array([[17, 131], [255, 43]], dtype=np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    out = decode_jpeg(encode_jpeg(img, quality=50))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 1


def test_random_gray_roundtrip_bounded():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (24, 41)).astype(np.uint8)  # non-multiple-of-8
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 40 and err.mean() < 8  # noise = JPEG's worst case


def test_smooth_color_roundtrip_tight():
    x = np.linspace(0, 255, 64)
    img = np.stack(
        np.meshgrid(x, x) + [np.full((64, 64), 128.0)], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2


def test_byte_stuffing_roundtrip():
    """Drive enough varied content that the scan contains stuffed 0xFF
    bytes, then confirm decode still matches within the lossy bound."""
    rng = np.random.RandomState(3)
    for trial in range(8):
        img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        data = encode_jpeg(img, quality=95)
        sos = data.find(b"\xff\xda")
        if b"\xff\x00" in data[sos:]:
            out = decode_jpeg(data)
            err = np.abs(out.astype(int) - img.astype(int))
            assert err.max() <= 40
            return
    pytest.fail("no trial produced a stuffed scan byte")


def test_unsupported_subset_rejected():
    good = _hand_built_flat136()
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + good)
    # progressive: flip SOF0 -> SOF2
    prog = good.replace(bytes([0xFF, 0xC0]), bytes([0xFF, 0xC2]))
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    # subsampled: claim 2x2 sampling for the single component
    sub = good.replace(bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]),
                       bytes([8, 0, 8, 0, 8, 1, 1, 0x22, 0]))
    with pytest.raises(ValueError, match="subsampl"):
        decode_jpeg(sub)
    # restart interval
    dri = good[:2] + _seg(0xDD, b"\x00\x10") + good[2:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(dri)


def test_decode_external_jpeg_replicates_gray_to_rgb():
    from mit_spark.operators.multimodal import decode_external

    img = np.kron(
        np.array([[10, 200]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    rgb = decode_external("jpeg", encode_jpeg(img))
    assert rgb.shape == (8, 16, 3)
    assert np.array_equal(rgb[:, :, 0], img)
    assert np.array_equal(rgb[:, :, 1], rgb[:, :, 2])


def test_color_jpeg_decodes_as_rgb_through_seam():
    from mit_spark.operators.multimodal import decode_external

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 200  # reddish flat
    rgb = decode_external("jpeg", encode_jpeg(img, quality=95))
    assert rgb.shape == (8, 8, 3)
    err = np.abs(rgb.astype(int) - img.astype(int))
    assert err.max() <= 6  # color transform round trip on a flat patch
