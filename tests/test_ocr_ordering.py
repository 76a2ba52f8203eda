"""Unit tests: reading order rule, OCR decode, synth determinism."""

import numpy as np

from mit_spark.operators.geometry import Quad
from mit_spark.operators.ocr import decode_quad
from mit_spark.operators.ordering import SPAN_STRIDE, reading_order, span_order
from mit_spark.synth import gen_doc, media_ref_for, media_truth, render_media


def _rect_quad(x0, y0, w, h):
    return Quad([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)], 1.0)


def test_reading_order_rtl_ttb():
    # manga panel order: right column first, top-to-bottom, then left column
    right_top = _rect_quad(300, 10, 60, 20)
    right_bottom = _rect_quad(305, 200, 60, 20)
    left_top = _rect_quad(20, 15, 60, 20)
    left_bottom = _rect_quad(25, 210, 60, 20)
    quads = [left_bottom, right_top, left_top, right_bottom]
    ranks = reading_order(quads)
    by_rank = [quads[ranks.index(r)] for r in range(4)]
    assert by_rank[0] is right_top
    assert by_rank[1] is right_bottom
    assert by_rank[2] is left_top
    assert by_rank[3] is left_bottom


def test_reading_order_single_and_empty():
    assert reading_order([]) == []
    assert reading_order([_rect_quad(0, 0, 10, 5)]) == [0]


def test_reading_order_deterministic_permutation():
    quads = [_rect_quad(20 + 50 * i, 10 + 30 * (i % 3), 40, 12) for i in range(6)]
    r1 = reading_order(quads)
    perm = [3, 1, 5, 0, 2, 4]
    r2 = reading_order([quads[i] for i in perm])
    # same quad gets the same rank regardless of input order
    for new_idx, old_idx in enumerate(perm):
        assert r2[new_idx] == r1[old_idx]


def test_span_order_stride():
    assert span_order(3, 5) == 3 * SPAN_STRIDE + 5
    assert span_order(4, 0) > span_order(3, SPAN_STRIDE - 1) - SPAN_STRIDE + 1023


def test_ocr_decodes_exact_rect():
    ref = media_ref_for("doc-00000007", 1)
    truth = media_truth(ref)
    img = render_media(ref)
    for x0, y0, w, h, text, vertical in truth["rects"]:
        # a quad slightly larger than the rect (as unclip produces)
        q = _rect_quad(max(x0 - 9, 0), max(y0 - 9, 0), w + 18, h + 18)
        assert decode_quad(img, q) == text


def test_ocr_empty_region():
    img = np.full((64, 64, 3), 255, dtype=np.uint8)
    assert decode_quad(img, _rect_quad(5, 5, 20, 10)) == ""


def test_gen_doc_deterministic_and_heavy():
    a = gen_doc("doc-00000003")
    b = gen_doc("doc-00000003")
    assert a == b
    heavy = gen_doc("doc-00000049")
    n_media = sum(1 for s in heavy if s["kind"] == "media")
    assert n_media >= 64
    offsets = [s["offset"] for s in a]
    assert offsets == list(range(len(a)))


def test_render_media_deterministic():
    ref = media_ref_for("doc-00000001", 2)
    assert np.array_equal(render_media(ref), render_media(ref))
    t = media_truth(ref)
    img = render_media(ref)
    assert img.shape == (t["height"], t["width"], 3)
