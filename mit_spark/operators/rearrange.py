"""Patch rearrange for tall images — numpy port of det_arrange.

Parity source: /root/reference/crates/util/src/det_arrange.rs
  should_rearrange      :205-213  (sic "shoud_rearrange"): portrait-oriented
                                  downscale > 2.5 and aspect > 3.0
  extract_patch         :185-203  row slice [t, b) clamped
  square_pad_resize     :7-44     pad square, pad to tgt, bilinear downscale
  rearrange_patches     :53-93    regroup patches into p_num side-by-side
                                  super-patches (optionally transposed)
  patch2batches         :95-129   chunk into batches of max_batch_size
  process_arrays        :131-183  strip proportional padding from net output
  det_rearrange_forward :215-344  orchestrator (overlapping tumbling windows
                                  over the pixel-row axis)
  unrearrange           :355-416  scatter-add patches back, halve the
                                  interleaved (overlap) bands

All pure numpy; one image per call (the Spark N-dimension is the Arrow
batch, not this module). ``forward`` is any callable
(B, H, W, 3) uint8 -> ((B, C_db, h, w) f32, (B, C_m, h', w') f32) — the
test seam the reference itself mocks (det_arrange.rs:457-480).
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np

from mit_spark.operators.geometry import rust_round, trunc_i64
from mit_spark.operators.imageops import add_border_wh, resize, transpose as transpose_img

ForwardFn = Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]]


def should_rearrange(img: np.ndarray, tgt_size: int) -> bool:
    h, w = img.shape[:2]
    if h < w:
        w, h = h, w
    asp_ratio = h / w
    down_scale_ratio = h / tgt_size
    return down_scale_ratio > 2.5 and asp_ratio > 3.0


def extract_patch(img: np.ndarray, t: int, b: int) -> np.ndarray:
    h = img.shape[0]
    t, b = min(t, h), min(b, h)
    return img[t:b].copy()


def square_pad_resize(img: np.ndarray, tgt_size: int) -> tuple[np.ndarray, float, int, int]:
    h, w = img.shape[:2]
    pad_h = pad_w = 0
    if w < h:
        pad_w = h - w
    elif h < w:
        pad_h = w - h
        h += pad_h
    pad_size = tgt_size - h
    if pad_size > 0:
        pad_h += pad_size
        pad_w += pad_size
    out = img
    if pad_h > 0 or pad_w > 0:
        out = add_border_wh(out, img.shape[1] + pad_w, img.shape[0] + pad_h)
    down_scale_ratio = tgt_size / img.shape[0]
    assert down_scale_ratio <= 1.0
    if down_scale_ratio < 1.0:
        out = resize(out, tgt_size, tgt_size, "bilinear")
    return out, down_scale_ratio, pad_h, pad_w


def rearrange_patches(patches: np.ndarray, p_num: int, transpose: bool) -> np.ndarray:
    total, ph, pw, c = patches.shape
    assert total % p_num == 0, "Total patches must be divisible by p_num"
    pw_num = total // p_num
    if transpose:
        out = np.zeros((p_num, pw_num * pw, ph, c), dtype=patches.dtype)
        for p in range(p_num):
            for wi in range(pw_num):
                out[p, wi * pw : (wi + 1) * pw] = patches[p * pw_num + wi].transpose(1, 0, 2)
    else:
        out = np.zeros((p_num, ph, pw_num * pw, c), dtype=patches.dtype)
        for p in range(p_num):
            for wi in range(pw_num):
                out[p, :, wi * pw : (wi + 1) * pw] = patches[p * pw_num + wi]
    return out


def patch2batches(
    patch_lst: list[np.ndarray],
    p_num: int,
    transpose: bool,
    max_batch_size: int,
    tgt_size: int,
) -> tuple[list[list[np.ndarray]], float | None, int | None]:
    stacked = np.stack(patch_lst, axis=0)
    super_patches = rearrange_patches(stacked, p_num, transpose)
    batches: list[list[np.ndarray]] = [[]]
    down_scale_ratio = None
    pad_size = None
    for patch in super_patches:
        if len(batches[-1]) >= max_batch_size:
            batches.append([])
        p, dsr, pad_h, pad_w = square_pad_resize(patch, tgt_size)
        assert pad_h == pad_w
        batches[-1].append(p)
        down_scale_ratio = dsr
        pad_size = pad_h
    return batches, down_scale_ratio, pad_size


def process_arrays(
    db: np.ndarray, mask: np.ndarray, tgt_size: int, pad_size: int
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    db_lst, mask_lst = [], []
    if pad_size > 0:
        paddb = int(rust_round(db.shape[3] / tgt_size * pad_size))
        padmsk = int(rust_round(mask.shape[3] / tgt_size * pad_size))
        for d, m in zip(db, mask):
            db_lst.append(d[:, : d.shape[1] - paddb, : d.shape[2] - paddb].copy())
            mask_lst.append(m[:, : m.shape[1] - padmsk, : m.shape[2] - padmsk].copy())
    else:
        for d, m in zip(db, mask):
            db_lst.append(d.copy())
            mask_lst.append(m.copy())
    return db_lst, mask_lst


def unrearrange(
    patch_lst: list[np.ndarray],
    transpose: bool,
    channel: int,
    pad_num: int,
    width: int,
    height: int,
    pw_num: int,
    ph_step: int,
    patch_size: int,
    rel_step_list: list[float],
) -> np.ndarray:
    """det_arrange.rs:355-416: paste patches back at rel-step offsets,
    sum-then-halve the interleaved overlap bands."""
    psize = patch_lst[0].shape[-1]
    step = int(ph_step * psize / patch_size)  # trunc like `as usize`
    pw = int(psize / pw_num)
    h = int(pw / width * height)
    tgtmap = np.zeros((channel, h, pw), dtype=np.float32)
    num_patches = len(patch_lst) * pw_num - pad_num
    done = False
    for ii, p in enumerate(patch_lst):
        if done:
            break
        if transpose:
            p = p.transpose(0, 2, 1)
        for jj in range(pw_num):
            pidx = ii * pw_num + jj
            rel_t = rel_step_list[pidx]
            t = int(rust_round(rel_t * h))
            b = min(h, t + psize)
            l = jj * pw
            r = l + pw
            hslice = b - t
            tgtmap[:, t:b, :] += p[:, 0:hslice, l:r]
            if pidx > 0:
                interleave = psize - step
                end = t + interleave
                tgtmap[:, t:end, :] /= 2.0
            if pidx >= num_patches - 1:
                done = True
                break
    if transpose:
        tgtmap = tgtmap.transpose(0, 2, 1)
    return tgtmap[None, ...]


def det_rearrange_forward(
    img: np.ndarray,
    tgt_size: int,
    max_batch_size: int,
    forward: ForwardFn,
) -> tuple[np.ndarray, np.ndarray]:
    """det_arrange.rs:215-344. Returns (db (1,C,H,W), mask (1,C',H',W'))."""
    h, w = img.shape[:2]
    transpose = h < w
    if transpose:
        w, h = h, w
        img = transpose_img(img)

    pw_num = max(int(math.floor(2.0 * tgt_size / w)), 2)
    ph = pw_num * w
    patch_size = ph
    ph_num = int(math.ceil(h / ph))
    ph_step = int((h - ph) / (ph_num - 1)) if ph_num > 1 else 0

    p_num = int(math.ceil(ph_num / pw_num))
    pad_num = p_num * pw_num - ph_num

    rel_step_list: list[float] = []
    patch_list: list[np.ndarray] = []
    for ii in range(ph_num):
        t = ii * ph_step
        b = t + ph
        patch_list.append(extract_patch(img, t, b))
        rel_step_list.append(t / h)
    if pad_num > 0:
        template = np.zeros_like(patch_list[0])
        for ii in range(ph_num, ph_num + pad_num):
            t = ii * ph_step
            rel_step_list.append(t / h)
            patch_list.append(template.copy())

    batches, _, pad_size = patch2batches(
        patch_list, p_num, transpose, max_batch_size, tgt_size
    )
    if pad_size is None:
        raise ValueError("empty patch list")

    db_lst: list[np.ndarray] = []
    mask_lst: list[np.ndarray] = []
    for batch in batches:
        arr = np.stack(batch, axis=0)
        db, mask = forward(arr)
        d_l, m_l = process_arrays(db, mask, tgt_size, pad_size)
        db_lst.extend(d_l)
        mask_lst.extend(m_l)

    db = unrearrange(
        db_lst, transpose, db_lst[0].shape[0], pad_num, w, h, pw_num, ph_step,
        patch_size, rel_step_list,
    )
    mask = unrearrange(
        mask_lst, transpose, mask_lst[0].shape[0], pad_num, w, h, pw_num, ph_step,
        patch_size, rel_step_list,
    )
    return db, mask
