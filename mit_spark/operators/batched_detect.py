"""Cross-IMAGE forward batch packing for the media UDF (VERDICT r3 #7).

The reference batches detector forwards WITHIN one image (patch rearrange,
det_arrange.rs:95-129 packs up to max_batch_size=4 patches per ONNX call)
but never ACROSS images — each RawImage runs its own session.run. With a
real model the per-call overhead dominates small pages, so the Spark media
UDF packs same-shaped resized tensors from DIFFERENT images in the Arrow
batch into shared (<=max_batch_size, H, W, C) forward calls, behind the
same ForwardFn seam (operators/forward.py). Packing is possible because
resize_aspect_ratio pads every image to a multiple of 256 per side
(imageops.py resize_aspect_ratio), collapsing the corpus into a handful of
distinct tensor shapes.

Output parity: phase A is detect_pre + infer_pre, phase C is infer_post +
detect_post — the exact single-image functions detector.detect composes —
so (kind, text, media_ref, order) rows are identical to the per-span path;
tests/test_batched_detect.py asserts row equality AND a strictly lower
forward-call count.

auto_rotate note: common.rs:40-44 makes the rerun fire unconditionally and
DISCARD the first pass (see detector.detect); the rerun differs only by
auto_rotate=False, so this path computes the rerun directly — one forward
where the per-span path spends two, with bit-identical output.

Poison isolation (SURVEY.md §2.10) is preserved at span granularity: a
failing span in phase A/C errors alone, and a forward that raises on a
PACKED batch falls back to per-image forwards so only the poisoned image
errors — one bad payload can never take its batch-mates down with it.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from mit_spark.config import DetectorOptions, PreprocessorOptions
from mit_spark.operators.detector import (
    detect,
    detect_post,
    detect_pre,
    infer_post,
    infer_pre,
)
from mit_spark.operators.forward import ForwardFn, get_forward
from mit_spark.operators.ocr import decode_quads
from mit_spark.operators.ordering import SPAN_STRIDE, reading_order, span_order
from mit_spark.operators.rearrange import should_rearrange
from mit_spark.synth import render_media


def effective_pre(pre: PreprocessorOptions) -> PreprocessorOptions:
    """The preprocessor flags the (always-firing) auto-rotate rerun actually
    runs with — auto_rotate stripped, everything else kept
    (detectors/mod.rs:59-67)."""
    if not pre.auto_rotate:
        return pre
    return PreprocessorOptions(
        invert=pre.invert,
        gamma_correct=pre.gamma_correct,
        rotate=pre.rotate,
        auto_rotate=False,
    )


def extract_media_spans_batched(
    spans: list[tuple],
    opts: DetectorOptions,
    pre: PreprocessorOptions,
    *,
    forward: ForwardFn | None = None,
    fault_refs: frozenset = frozenset(),
) -> list[tuple]:
    """[(doc_id, media_ref, offset)] -> rows
    (doc_id, kind, text, media_ref, order), packing forwards across spans.

    Three phases over the whole span list:
      A. per span: render + detect_pre + infer_pre -> (tensor, ctx); spans
         on the rearrange path (already patch-batched internally) run the
         single-image detect directly.
      B. group tensors by shape, stack <= opts.max_batch_size per forward
         call; on a packed-call exception, retry each image alone so only
         the poisoned one errors.
      C. per span: infer_post + detect_post -> quads, then OCR + reading
         order exactly as oracle.extract_media_span.
    """
    forward = forward or get_forward("synthetic")
    pre_eff = effective_pre(pre)

    staged = []  # (idx, img, add_border, img_h, tensor, ctx)
    quads_by_idx: dict[int, tuple] = {}  # idx -> (img, quads)
    err_by_idx: dict[int, Exception] = {}

    for idx, (_doc_id, ref, _off) in enumerate(spans):
        try:
            if str(ref) in fault_refs:
                raise RuntimeError("fault injection")
            img = render_media(str(ref))
            work, add_border, img_h = detect_pre(img, pre_eff)
            if should_rearrange(work, opts.detect_size):
                quads, _mask = detect(img, forward, opts, pre_eff)
                quads_by_idx[idx] = (img, quads)
            else:
                tensor, ctx = infer_pre(work, opts)
                staged.append((idx, img, add_border, img_h, tensor, ctx))
        except Exception as e:  # noqa: BLE001 — poison isolation
            err_by_idx[idx] = e

    groups: dict[tuple, list] = defaultdict(list)
    for item in staged:
        groups[item[4].shape].append(item)
    for _shape, items in sorted(groups.items()):
        for i0 in range(0, len(items), opts.max_batch_size):
            chunk = items[i0 : i0 + opts.max_batch_size]
            heads = None
            if len(chunk) > 1:
                try:
                    db, mask = forward(np.stack([it[4] for it in chunk]))
                    heads = [
                        (db[j : j + 1], mask[j : j + 1]) for j in range(len(chunk))
                    ]
                except Exception:  # noqa: BLE001 — fall back to per-image
                    heads = None
            for j, (idx, img, add_border, img_h, tensor, ctx) in enumerate(chunk):
                try:
                    if heads is None:
                        db_j, mask_j = forward(tensor[None, ...])
                    else:
                        db_j, mask_j = heads[j]
                    quads, mask2d = infer_post(db_j, mask_j, ctx, opts)
                    quads, _m = detect_post(quads, mask2d, add_border, pre_eff, img_h)
                    quads_by_idx[idx] = (img, quads)
                except Exception as e:  # noqa: BLE001 — poison isolation
                    err_by_idx[idx] = e

    rows: list[tuple] = []
    for idx, (doc_id, ref, off) in enumerate(spans):
        ref, off = str(ref), int(off)
        if idx in err_by_idx:
            e = err_by_idx[idx]
            rows.append(
                (doc_id, "error", f"{type(e).__name__}: {e}"[:500], ref,
                 off * SPAN_STRIDE)
            )
            continue
        img, quads = quads_by_idx[idx]
        if not quads:
            rows.append((doc_id, "media", "", ref, span_order(off, 0)))
            continue
        ranks = reading_order(quads)
        texts = decode_quads(img, quads)
        for order, text in sorted(
            (span_order(off, int(r)), t) for r, t in zip(ranks, texts)
        ):
            rows.append((doc_id, "media", text, ref, order))
    return rows
