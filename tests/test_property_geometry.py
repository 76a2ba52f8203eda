"""Property tests, part 3: the unclip/offset and corner-canonicalization
geometry (dbnet_post's A5 + O2 building blocks).

The goldens pin the reference vectors (textlines.rs cases verbatim in
test_geometry.py); these pin the geometric invariants on random inputs:
an offset polygon must CONTAIN its source and stay within the offset
radius, corner canonicalization must be a permutation, and the scalar
measures must transform correctly under similarity maps — the failure
modes a vectorization or orientation bug produces.
"""

from __future__ import annotations

import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import assume, given, settings, strategies as st  # noqa: E402

from mit_spark.operators.contours import (  # noqa: E402
    min_area_rect,
    offset_polygon_round,
    polygon_perimeter,
)
from mit_spark.operators.geometry import convex_hull, polygon_area, sort_pnts  # noqa: E402

COMMON = settings(max_examples=60, deadline=None)


def _convex_poly(seed: int, n: int) -> np.ndarray:
    """Random convex polygon = hull of random integer points."""
    rng = np.random.RandomState(seed)
    pts = rng.randint(0, 100, size=(n, 2)).astype(np.float64)
    return convex_hull(pts)


def _dist_point_to_poly_boundary(q: np.ndarray, poly: np.ndarray) -> float:
    """Min distance from q to the polygon's boundary segments."""
    best = np.inf
    n = len(poly)
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        ab = b - a
        denom = float(ab @ ab)
        t = 0.0 if denom == 0 else float(np.clip((q - a) @ ab / denom, 0, 1))
        best = min(best, float(np.linalg.norm(q - (a + t * ab))))
    return best


def _inside_convex(poly: np.ndarray, q: np.ndarray, eps: float = 1e-6) -> bool:
    n = len(poly)
    sign = 0
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        cr = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if abs(cr) <= eps:
            continue
        s = 1 if cr > 0 else -1
        if sign == 0:
            sign = s
        elif s != sign:
            return False
    return True


@COMMON
@given(st.integers(0, 2**32 - 1), st.integers(4, 12), st.floats(0.5, 20.0))
def test_offset_polygon_contains_source_within_radius(seed, n, delta):
    poly = _convex_poly(seed, n)
    assume(len(poly) >= 3)
    out = offset_polygon_round(poly, delta)
    assert len(out) >= len(poly)
    hull_out = convex_hull(out)
    # 1) every source vertex strictly inside the offset hull
    for v in poly:
        assert _inside_convex(hull_out, v, eps=1e-6)
    # 2) every offset sample within delta of the source boundary
    #    (arc samples sit on vertex circles of radius exactly delta)
    for q in out:
        d = _dist_point_to_poly_boundary(q, poly)
        assert d <= delta + 1e-6, f"sample {q} at {d} > delta {delta}"


@COMMON
@given(st.integers(0, 2**32 - 1), st.integers(4, 12), st.floats(0.5, 20.0))
def test_offset_polygon_orientation_invariant_measures(seed, n, delta):
    """CW input must offset to the same REGION as CCW input (the function
    normalizes orientation): compare hull area + perimeter, not point
    order."""
    poly = _convex_poly(seed, n)
    assume(len(poly) >= 3)
    a = convex_hull(offset_polygon_round(poly, delta))
    b = convex_hull(offset_polygon_round(poly[::-1].copy(), delta))
    assert polygon_area(a.astype(np.float32)) == pytest.approx(
        polygon_area(b.astype(np.float32)), rel=1e-4, abs=1e-3
    )
    assert polygon_perimeter(a) == pytest.approx(polygon_perimeter(b), rel=1e-4)


@COMMON
@given(
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 200)),
        min_size=4,
        max_size=4,
    )
)
def test_sort_pnts_is_a_permutation(pts):
    arr = np.array(pts, dtype=np.int64)
    out, vertical = sort_pnts(arr)
    assert isinstance(vertical, bool)
    assert out.shape == (4, 2)
    assert sorted(map(tuple, out.tolist())) == sorted(map(tuple, arr.tolist()))
    # determinism
    out2, v2 = sort_pnts(arr)
    assert np.array_equal(out, out2) and v2 == vertical


@COMMON
@given(st.integers(0, 2**32 - 1), st.integers(3, 20), st.integers(1, 5))
def test_measures_under_integer_scaling(seed, n, k):
    """Similarity transforms: scale by k multiplies perimeter by k and
    area by k^2; min_area_rect dims scale by k."""
    poly = _convex_poly(seed, n)
    assume(len(poly) >= 3)
    big = poly * k
    assert polygon_perimeter(big) == pytest.approx(k * polygon_perimeter(poly), rel=1e-9)
    assert polygon_area(big.astype(np.float64)) == pytest.approx(
        k * k * polygon_area(poly.astype(np.float64)), rel=1e-6
    )
    _, w0, h0 = min_area_rect(poly)
    _, w1, h1 = min_area_rect(big)
    assert w0 * h0 * k * k == pytest.approx(w1 * h1, rel=1e-4, abs=1e-6)


@COMMON
@given(st.integers(0, 2**32 - 1), st.integers(3, 20))
def test_min_area_rect_rot90_invariant(seed, n):
    """Rotating the point set by 90 degrees must not change the minimal
    area (the rectangle rotates with it)."""
    poly = _convex_poly(seed, n)
    rot = np.stack([-poly[:, 1], poly[:, 0]], axis=1)
    _, w0, h0 = min_area_rect(poly)
    _, w1, h1 = min_area_rect(rot)
    assert w0 * h0 == pytest.approx(w1 * h1, rel=1e-4, abs=1e-6)
