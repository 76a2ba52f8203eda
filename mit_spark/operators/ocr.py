"""OCR stage — per-quad crop + deterministic CTC-style decode.

The reference only defines the trait (`Ocr::detect(image, areas) ->
Vec<Quadrilateral>`, /root/reference/crates/interface/src/ocr/mod.rs:3-11 —
no implementation exists). Our concrete recognizer decodes the synthetic
glyph-bar encoding (mit_spark.synth): within the detected quad's bounding
box it finds the tight ink rectangle, splits it into CELL-px cells along
the text direction, and reads each cell's MARK-band width as a digit —
a greedy argmax/collapse decode over an exact, deterministic "font".

A real CTC/attention recognizer drops in at decode_quad() with the same
signature (crop -> text); everything around it (quad canonical order,
vertical flag, reading order, Spark plumbing) is recognizer-agnostic.
"""

from __future__ import annotations

import numpy as np

from mit_spark.operators.geometry import Quad
from mit_spark.synth import ALPHABET, CELL, MARK


def decode_quad(img: np.ndarray, quad: Quad) -> str:
    """Recover the text inside one detected quad from the ORIGINAL raster
    (quads are in original pixel coordinates after ratio adjustment, so the
    OCR path sees unresampled pixels)."""
    h, w = img.shape[:2]
    xs = quad.pts[:, 0]
    ys = quad.pts[:, 1]
    x0 = int(np.clip(xs.min(), 0, w - 1))
    x1 = int(np.clip(xs.max(), 0, w - 1))
    y0 = int(np.clip(ys.min(), 0, h - 1))
    y1 = int(np.clip(ys.max(), 0, h - 1))
    crop = img[y0 : y1 + 1, x0 : x1 + 1]
    if crop.size == 0:
        return ""

    dark = (crop < 128).all(axis=2)
    if not dark.any():
        return ""
    rows = np.nonzero(dark.any(axis=1))[0]
    cols = np.nonzero(dark.any(axis=0))[0]
    ty0, ty1 = int(rows[0]), int(rows[-1])
    tx0, tx1 = int(cols[0]), int(cols[-1])
    tight = crop[ty0 : ty1 + 1, tx0 : tx1 + 1]
    th, tw = tight.shape[:2]

    horizontal = tw > th
    length = tw if horizontal else th
    n_cells = max(int(round(length / CELL)), 1)

    # mark pixels: the lighter ink band encoding the digit
    mark = (np.abs(tight.astype(np.int16) - MARK) <= 15).all(axis=2)
    out = []
    for i in range(n_cells):
        lo = i * CELL
        hi = min(lo + CELL, length)
        if horizontal:
            cell = mark[:, lo:hi]
            # a column is marked if most of its pixels are MARK
            marked = cell.mean(axis=0) > 0.5
        else:
            cell = mark[lo:hi, :]
            marked = cell.mean(axis=1) > 0.5
        v = int(marked.sum()) - 1
        if 0 <= v < len(ALPHABET):
            out.append(ALPHABET[v])
    return "".join(out)


def decode_quads(img: np.ndarray, quads: list[Quad]) -> list[str]:
    return [decode_quad(img, q) for q in quads]
