"""Reading order — the deterministic total order over detected quads.

The reference canonicalizes corners WITHIN a quad (textlines.rs:75-147) and
exposes vertical()/aspect_ratio() but defines NO inter-box order — boxes
surface in contour-discovery order (dbnet.rs:243). Span-sequence equality
needs a total order, so this module defines the manga convention
(SURVEY.md §2.6 O7): right-to-left column bands, top-to-bottom within a
band. One implementation, imported by BOTH the oracle and the Spark UDF.

Span ``order`` encoding over a whole document:
    order = offset * SPAN_STRIDE + rank
where ``offset`` is the input span's position and ``rank`` is 0 for text
spans / the reading-order rank of the quad within its media span. Stride
encoding keeps order assignment embarrassingly parallel per span (no
cross-span window/shuffle needed to densify ranks).
"""

from __future__ import annotations

import numpy as np

from mit_spark.operators.geometry import Quad

SPAN_STRIDE = 1024  # > max quads per media (max_candidates = 1000)


def reading_order(quads: list[Quad]) -> list[int]:
    """Return the ranks (position in reading order) of each quad.

    Right-to-left column bands of width = median bbox width, then top-to-
    bottom inside a band; ties broken by (x_center desc, y_top asc) — all
    integer arithmetic on canonical corner points, fully deterministic.
    """
    n = len(quads)
    if n == 0:
        return []
    x_center = np.array([int(q.pts[:, 0].min()) + int(q.pts[:, 0].max()) for q in quads]) / 2.0
    y_top = np.array([int(q.pts[:, 1].min()) for q in quads])
    widths = np.array(
        [int(q.pts[:, 0].max()) - int(q.pts[:, 0].min()) for q in quads], dtype=np.float64
    )
    band_w = max(float(np.median(widths)), 1.0)
    right = float(x_center.max())
    band = np.floor((right - x_center) / band_w).astype(np.int64)
    # lexsort: last key is primary
    perm = np.lexsort((-x_center, y_top, band))
    ranks = np.empty(n, dtype=np.int64)
    ranks[perm] = np.arange(n)
    return ranks.tolist()


def span_order(offset: int, rank: int = 0) -> int:
    return offset * SPAN_STRIDE + rank
