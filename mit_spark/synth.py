"""Deterministic synthetic interleaved-docs generator (FIXTURES.md F1/F2).

The engine's input table has exactly the BASELINE.json input_hint shape:

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)

All randomness is hash-derived (md5 of seed:doc_id:offset strings), so any
worker can regenerate any document independently — no driver-side state, no
stored rasters. Media rasters are rendered on demand from ``media_ref``
inside UDFs (render_media), mirroring how the reference decodes images at
the pipeline edge (RawImage::new, crates/interface/src/image/mod.rs:155-177).

Glyph-bar encoding (decodable by mit_spark.operators.ocr):
  * a glyph rectangle is filled with BASE=40 ink on white 255 background;
  * the rect is L cells of CELL=12 px along the text direction
    (horizontal iff rect W > H), thickness 16..32 px across;
  * cell i encodes digit v (0..9) as a MARK=90 band spanning the first
    (v+1) pixels of the cell;
  * rect separation/margins exceed the max unclip dilation so detected
    quads never swallow a neighbour.
"""

from __future__ import annotations

import hashlib

import numpy as np

SEED = 42
BG = 255
BASE = 40
MARK = 90
CELL = 12
ALPHABET = "0123456789"

# boilerplate wrappers for text spans (cleaned by the text branch)
_NAV = "<nav><ul><li>home</li><li>about</li><li>archive</li></ul></nav>"
_SCRIPT = "<script>var t=performance.now();track('pv',t);</script>"
_FOOTER = "<footer>(c) example.org - all rights reserved - terms - privacy</footer>"

_WORDS = (
    "panel speech bubble ink tone frame gutter page spread sketch line art "
    "shadow scene motion sound effect title credit margin note scan raw"
).split()


def _h(*parts) -> bytes:
    # md5 (not sha1) so DuckDB can recompute every derived quantity in pure
    # SQL: the flagship span-count / text-digest oracles re-derive the whole
    # generator chain engine-side (md5 is the one hash primitive Spark,
    # DuckDB 1.0, and hashlib all share bit-identically).
    return hashlib.md5((":".join(str(p) for p in parts)).encode()).digest()


def _ints(*parts, n: int, lo: int, hi: int) -> list[int]:
    """n deterministic ints in [lo, hi] derived from sha1(parts, i)."""
    out = []
    for i in range(n):
        d = _h(SEED, *parts, i)
        out.append(lo + int.from_bytes(d[:4], "big") % (hi - lo + 1))
    return out


# ---------------------------------------------------------------------------
# text spans


def make_text_span(doc_id: str, offset: int) -> tuple[str, str]:
    """Returns (raw_boilerplate_text, expected_clean_text)."""
    (n_sent,) = _ints(doc_id, offset, "ns", n=1, lo=1, hi=3)
    sents = []
    for s in range(n_sent):
        n_words = _ints(doc_id, offset, "nw", s, n=1, lo=4, hi=9)[0]
        idx = _ints(doc_id, offset, "w", s, n=n_words, lo=0, hi=len(_WORDS) - 1)
        sents.append(" ".join(_WORDS[i] for i in idx) + ".")
    clean = " ".join(sents)
    raw = f"{_NAV}<article><p>{clean}</p></article>{_SCRIPT}{_FOOTER}"
    return raw, clean


# ---------------------------------------------------------------------------
# media spans — geometry ground truth + raster rendering


def media_ref_for(doc_id: str, offset: int) -> str:
    return "m" + _h(SEED, doc_id, offset, "media").hex()[:16]


def media_truth(media_ref: str) -> dict:
    """Deterministic page layout for a media_ref: dims + glyph rects.

    Returns {"width", "height", "rects": [(x0, y0, w, h, text, vertical)]}.
    Placement uses a 2x2 cell grid with margins sized so that the max unclip
    dilation (~0.6 * thickness * unclip_ratio) cannot reach a neighbour.
    """
    side_opts = (320, 384, 448, 512)
    (si,) = _ints(media_ref, "side", n=1, lo=0, hi=len(side_opts) - 1)
    (sj,) = _ints(media_ref, "side2", n=1, lo=0, hi=len(side_opts) - 1)
    width, height = side_opts[si], side_opts[sj]
    (n_rects,) = _ints(media_ref, "nr", n=1, lo=1, hi=4)

    # 2x2 grid of cells; each rect centered-ish in its own cell with margin
    cw, ch = width // 2, height // 2
    cells = [(0, 0), (1, 0), (0, 1), (1, 1)]
    order = _ints(media_ref, "cells", n=1, lo=0, hi=3)[0]
    chosen = [cells[(order + k) % 4] for k in range(n_rects)]

    rects = []
    for k, (cx, cy) in enumerate(chosen):
        (L,) = _ints(media_ref, k, "len", n=1, lo=3, hi=6)
        (T4,) = _ints(media_ref, k, "thick", n=1, lo=4, hi=8)
        thick = T4 * 4  # 16..32
        (vert,) = _ints(media_ref, k, "vert", n=1, lo=0, hi=2)
        vertical = vert == 0  # ~1/3 vertical
        rw, rh = (thick, L * CELL) if vertical else (L * CELL, thick)
        # margin inside the cell keeps dilated quads inside + separated
        margin = 44
        max_x = cw - rw - 2 * margin
        max_y = ch - rh - 2 * margin
        if max_x <= 0 or max_y <= 0:
            # cell too small for this rect: shrink to 3 cells horizontal
            L, vertical = 3, False
            rw, rh = L * CELL, 16
            max_x = max(cw - rw - 2 * margin, 1)
            max_y = max(ch - rh - 2 * margin, 1)
        (jx,) = _ints(media_ref, k, "jx", n=1, lo=0, hi=max_x)
        (jy,) = _ints(media_ref, k, "jy", n=1, lo=0, hi=max_y)
        x0 = cx * cw + margin + jx
        y0 = cy * ch + margin + jy
        n_chars = L
        digits = _ints(media_ref, k, "txt", n=n_chars, lo=0, hi=9)
        text = "".join(ALPHABET[d] for d in digits)
        rects.append((x0, y0, rw, rh, text, vertical))
    return {"width": width, "height": height, "rects": rects}


def render_media(media_ref: str) -> np.ndarray:
    """Render the page raster for a media_ref ((H,W,3) uint8, white bg)."""
    t = media_truth(media_ref)
    img = np.full((t["height"], t["width"], 3), BG, dtype=np.uint8)
    for x0, y0, rw, rh, text, vertical in t["rects"]:
        img[y0 : y0 + rh, x0 : x0 + rw] = BASE
        for i, ch in enumerate(text):
            v = ALPHABET.index(ch)
            if vertical:
                cy = y0 + i * CELL
                img[cy : cy + v + 1, x0 : x0 + rw] = MARK
            else:
                cx = x0 + i * CELL
                img[y0 : y0 + rh, cx : cx + v + 1] = MARK
    return img


# ---------------------------------------------------------------------------
# documents


def gen_doc(doc_id: str) -> list[dict]:
    """Deterministic span list for one document (FIXTURES.md F1)."""
    doc_no = int(doc_id.split("-")[-1]) if "-" in doc_id else 0
    heavy = doc_no % 50 == 49
    if heavy:
        (n_media,) = _ints(doc_id, "nheavy", n=1, lo=64, hi=256)
        n_spans = n_media + 4
    else:
        (n_spans,) = _ints(doc_id, "nspans", n=1, lo=1, hi=12)

    spans = []
    for off in range(n_spans):
        if heavy:
            is_media = off >= 4
        else:
            (r,) = _ints(doc_id, off, "kind", n=1, lo=0, hi=9)
            is_media = r < 3  # ~30% media
        if is_media:
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": media_ref_for(doc_id, off),
                    "offset": off,
                }
            )
        else:
            raw, _ = make_text_span(doc_id, off)
            spans.append({"kind": "text", "text": raw, "media_ref": "", "offset": off})
    return spans


def gen_docs(n_docs: int, prefix: str = "doc") -> list[dict]:
    """Small-scale driver for tests/oracle: list of {doc_id, spans} rows."""
    return [
        {"doc_id": f"{prefix}-{i:08d}", "spans": gen_doc(f"{prefix}-{i:08d}")}
        for i in range(n_docs)
    ]
