"""Mocked-forward rearrange tests — same technique as the reference's golden
tests (det_arrange.rs:418-481) with synthetically generated forwards instead
of the stripped .npy blobs (FIXTURES.md F5)."""

import numpy as np
import pytest

from mit_spark.operators.imageops import resize_float, transpose as transpose_img
from mit_spark.operators.rearrange import (
    det_rearrange_forward,
    extract_patch,
    patch2batches,
    rearrange_patches,
    should_rearrange,
    square_pad_resize,
)

TGT = 256


def _const_forward(db_val=1.0, mask_val=0.25):
    calls = []

    def fwd(batch):
        calls.append(batch.shape)
        b = batch.shape[0]
        db = np.full((b, 2, TGT, TGT), db_val, dtype=np.float32)
        mask = np.full((b, 1, TGT // 2, TGT // 2), mask_val, dtype=np.float32)
        return db, mask

    fwd.calls = calls
    return fwd


def _gray_forward():
    def fwd(batch):
        outs_db, outs_m = [], []
        for img in batch:
            gray = img.astype(np.float32).mean(axis=2) / 255.0
            db = resize_float(gray, TGT, TGT)
            outs_db.append(np.stack([db, db]))
            m = resize_float(gray, TGT // 2, TGT // 2)
            outs_m.append(m[None])
        return np.stack(outs_db), np.stack(outs_m)

    return fwd


def test_should_rearrange_predicate():
    # det_arrange.rs:205-213: portrait-oriented downscale>2.5 and aspect>3.0
    tall = np.zeros((3000, 400, 3), dtype=np.uint8)
    assert should_rearrange(tall, 1024)
    assert not should_rearrange(tall, 2048)  # downscale 1.46 < 2.5
    wide = np.zeros((400, 3000, 3), dtype=np.uint8)  # landscape orients first
    assert should_rearrange(wide, 1024)
    square = np.zeros((3000, 2900, 3), dtype=np.uint8)
    assert not should_rearrange(square, 1024)  # aspect 1.03 < 3


def test_extract_patch_clamps():
    img = np.arange(10 * 2 * 3, dtype=np.uint8).reshape(10, 2, 3)
    p = extract_patch(img, 8, 14)
    assert p.shape == (2, 2, 3)
    assert np.array_equal(p, img[8:10])


def test_square_pad_resize():
    img = np.full((512, 128, 3), 200, dtype=np.uint8)
    out, dsr, pad_h, pad_w = square_pad_resize(img, TGT)
    assert out.shape == (TGT, TGT, 3)
    assert dsr == pytest.approx(0.5)
    assert pad_w == 384 and pad_h == 0


def test_rearrange_patches_layout():
    # 4 patches of (8, 2) -> 1 super-patch (8, 8); transposed -> (8, 8) swapped
    patches = np.arange(4 * 8 * 2 * 3, dtype=np.uint8).reshape(4, 8, 2, 3)
    out = rearrange_patches(patches, 1, False)
    assert out.shape == (1, 8, 8, 3)
    assert np.array_equal(out[0, :, 0:2], patches[0])
    assert np.array_equal(out[0, :, 6:8], patches[3])
    out_t = rearrange_patches(patches, 1, True)
    assert out_t.shape == (1, 8, 8, 3)
    assert np.array_equal(out_t[0, 0:2], patches[0].transpose(1, 0, 2))


def test_patch2batches_chunking():
    # ph = pw_num*w (det_arrange.rs:236-237) so super-patches are square:
    # 8 patches (256,128), p_num=4 -> pw_num=2 -> supers (256,256)
    patches = [np.zeros((256, 128, 3), dtype=np.uint8) for _ in range(8)]
    batches, dsr, pad = patch2batches(patches, 4, False, 3, TGT)
    assert [len(b) for b in batches] == [3, 1]
    assert dsr == pytest.approx(1.0)
    assert pad == 0


def test_det_rearrange_forward_constant_is_exact():
    """Chosen dims make every rounding exact, so constant-in == constant-out
    through slice/pad/merge (overlap bands sum then halve)."""
    img = np.zeros((1664, 128, 3), dtype=np.uint8)
    db, mask = det_rearrange_forward(img, TGT, 4, _const_forward())
    assert db.shape == (1, 2, 832, 64)
    assert mask.shape == (1, 1, 416, 32)
    assert np.allclose(db, 1.0), f"db values {np.unique(db)}"
    assert np.allclose(mask, 0.25)


def test_det_rearrange_forward_positions_content():
    img = np.zeros((1664, 128, 3), dtype=np.uint8)
    img[800:] = 200  # step at orig row 800 -> output row ~400 of 832
    db, _ = det_rearrange_forward(img, TGT, 4, _gray_forward())
    m = db[0, 0]
    assert m[:380].mean() < 0.05
    assert abs(m[420:].mean() - 200 / 255) < 0.05


def test_det_rearrange_forward_transpose_matches():
    img = np.zeros((1664, 128, 3), dtype=np.uint8)
    img[800:] = 200
    db_v, mask_v = det_rearrange_forward(img, TGT, 4, _gray_forward())
    db_h, mask_h = det_rearrange_forward(transpose_img(img), TGT, 4, _gray_forward())
    # landscape input is transposed internally; outputs are un-transposed back
    assert db_h.shape == (1, 2, 64, 832)
    assert np.allclose(db_h[0, 0], db_v[0, 0].T, atol=1e-5)
    assert np.allclose(mask_h[0, 0], mask_v[0, 0].T, atol=1e-5)


def test_det_rearrange_forward_batches_respect_max():
    img = np.zeros((4000, 100, 3), dtype=np.uint8)
    fwd = _const_forward()
    det_rearrange_forward(img, TGT, 2, fwd)
    assert all(s[0] <= 2 for s in fwd.calls)
