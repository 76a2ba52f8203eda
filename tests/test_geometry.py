"""Ports of the reference's geometry unit tests.

Expected values copied verbatim from
/root/reference/crates/interface/src/detectors/textlines.rs:149-223.
"""

import numpy as np
import pytest

from mit_spark.operators.geometry import (
    Quad,
    convex_hull,
    polygon_area,
    roll_rows,
    rust_round,
    sort_pnts,
    trunc_div,
    trunc_i64,
)


def test_sort_pnts_horizontal():
    # textlines.rs:153-162 — 10x1 rectangle, long sides horizontal
    pts = np.array([(0, 0), (10, 0), (0, 1), (10, 1)])
    out, vertical = sort_pnts(pts)
    assert out.tolist() == [[0, 0], [10, 0], [10, 1], [0, 1]]
    assert vertical is False


def test_sort_pnts_vertical():
    # textlines.rs:164-170
    pts = np.array([(169, 6), (207, 6), (169, 164), (207, 164)])
    out, vertical = sort_pnts(pts)
    assert out.tolist() == [[169, 6], [207, 6], [207, 164], [169, 164]]
    assert vertical is True


def test_quad_new_and_accessors():
    # textlines.rs:175-183
    q = Quad([(0, 0), (10, 0), (10, 1), (0, 1)], 0.9)
    assert q.pts.tolist() == [[0, 0], [10, 0], [10, 1], [0, 1]]
    assert q.score == 0.9
    assert q.vertical is False


def test_area():
    # textlines.rs:185-192
    q = Quad([(0, 0), (4, 0), (4, 3), (0, 3)], 1.0)
    assert q.area() == pytest.approx(12.0, abs=1e-6)


def test_aspect_ratio_horizontal():
    # textlines.rs:194-201
    q = Quad([(0, 0), (10, 0), (10, 2), (0, 2)], 1.0)
    assert 4.5 < q.aspect_ratio() < 5.5


def test_aspect_ratio_vertical():
    # textlines.rs:203-210
    q = Quad([(0, 0), (2, 0), (2, 10), (0, 10)], 1.0)
    assert q.aspect_ratio() < 0.3


def test_structure_midpoints():
    # textlines.rs:212-222
    q = Quad([(0, 0), (10, 0), (10, 4), (0, 4)], 1.0)
    s = q.structure()
    assert s.tolist() == [[5, 0], [5, 4], [10, 2], [0, 2]]


def test_trunc_semantics():
    # Rust i64 `/` truncates toward zero; `as i64` truncates; `round()` half
    # away from zero — the three cast rules SURVEY.md §7 flags as risks.
    assert trunc_div(-3, 2) == -1          # python -3 // 2 == -2
    assert trunc_i64(-1.9) == -1
    assert trunc_i64(1.9) == 1
    assert rust_round(0.5) == 1.0          # numpy rounds 0.5 -> 0
    assert rust_round(-0.5) == -1.0
    assert rust_round(2.5) == 3.0


def test_roll_rows_matches_reference_semantics():
    # dbnet.rs:38-53: split at n - shift, concat(bottom, top)
    a = np.arange(8, dtype=np.float32).reshape(4, 2)
    out = roll_rows(a, 1)
    assert out.tolist() == [[6, 7], [0, 1], [2, 3], [4, 5]]
    out = roll_rows(a, 4 - 2)  # startidx roll as used in boxes_from_bitmap
    assert out.tolist() == [[4, 5], [6, 7], [0, 1], [2, 3]]


def test_convex_hull_degenerate_quad():
    # one point inside the triangle of the other three -> hull is a triangle
    pts = np.array([(0, 0), (10, 0), (0, 10), (1, 1)], dtype=float)
    h = convex_hull(pts)
    assert len(h) == 3
    assert polygon_area(h) == pytest.approx(50.0)
