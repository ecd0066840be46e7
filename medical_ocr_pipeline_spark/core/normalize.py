"""01b layout normalization: adaptive row merge, header/footer band
tagging, two-column stitching — per-turn pure functions.

Reference parity (notebooks/01b_normalize_layout.ipynb cell 0):
  - detect_handwriting (P11): lines 57-65 — native ratio < 0.35 OR median
    height > 22 OR IQR > 18;
  - adaptive_bands (P6): lines 67-71 — header min(0.10H, 140),
    footer min(0.08H, 120); smaller for handwriting pages;
  - merge_rows (A3): lines 88-119 — greedy row assembly on center-y
    within tol_y and x-gap within tol_x, bullet/sentence-end guard
    (should_force_new_row, lines 79-86);
  - maybe_two_columns (A8): lines 121-146 — 8-iteration 1-D 2-means on
    row x-centers seeded at min/max, accepted only if separation >=
    0.12 * page width;
  - normalize_page: lines 148-224 — tolerances tol_y = max(4, 0.60*med_h),
    tol_x = max(10, 0.90*med_h); emits text_lines; final (y,x) sort.
"""

from __future__ import annotations

import re
import statistics

from medical_ocr_pipeline_spark.constants import (
    BASE_LINE_MERGE_TOL_X,
    BASE_LINE_MERGE_TOL_Y,
    FOOT_BAND_FRAC,
    FOOT_BAND_MAX_PX,
    HEAD_BAND_FRAC,
    HEAD_BAND_MAX_PX,
    MIN_TEXT_LEN,
    MIN_TOL_X,
    MIN_TOL_Y,
)

_BULLET_START = re.compile(
    r"""^\s*(?:[•●◦\-–—→]|\(?\d+\)|[A-Za-z]\))\s+"""
)


def block_h(b: dict) -> float:
    return max(1.0, b["bbox"][3] - b["bbox"][1])


def page_height(blocks: list[dict]) -> float:
    ys = [b["bbox"][3] for b in blocks] + [b["bbox"][1] for b in blocks]
    return max(ys) if ys else 842.0


def page_width(blocks: list[dict]) -> float:
    xs = [b["bbox"][2] for b in blocks]
    return max(xs) if xs else 595.0


def detect_handwriting(blocks: list[dict],
                       hts: list[float] | None = None,
                       med_h: float | None = None) -> bool:
    """P11: few native blocks OR very tall/variable text boxes.  hts and
    med_h may be passed in by callers that already computed them (the
    per-turn hot path — avoids re-deriving heights and the median)."""
    if not blocks:
        return False
    n_native = sum(1 for b in blocks if "native" in (b.get("source") or "").lower())
    ratio_native = n_native / len(blocks)
    if hts is None:
        hts = [block_h(b) for b in blocks]
    if med_h is None:
        med_h = statistics.median(hts) if hts else 12
    if len(hts) >= 4:
        q = statistics.quantiles(hts, n=4)
        iqr = q[2] - q[0]
    else:
        iqr = 0
    return (ratio_native < 0.35) or (med_h > 22) or (iqr > 18)


def adaptive_bands(H: float, handwriting: bool) -> tuple[float, float]:
    if handwriting:
        return min(0.06 * H, 70), min(0.05 * H, 60)
    return min(HEAD_BAND_FRAC * H, HEAD_BAND_MAX_PX), min(
        FOOT_BAND_FRAC * H, FOOT_BAND_MAX_PX
    )


def should_force_new_row(prev_txt: str, next_txt: str) -> bool:
    if _BULLET_START.match(next_txt or ""):
        return True
    if prev_txt and prev_txt.rstrip().endswith((".", ";", ":")):
        return True
    return False


def merge_rows(blocks: list[dict], tol_y_px: float, tol_x_px: float) -> list[dict]:
    """A3: greedy row assembly with bullet-aware protection."""
    blocks = sorted(
        blocks, key=lambda b: (round(b["bbox"][1], 1), round(b["bbox"][0], 1))
    )
    rows: list[dict] = []
    for b in blocks:
        t = (b.get("text") or "").strip()
        if not t:
            continue
        x0, y0, x1, y1 = b["bbox"]
        cy = 0.5 * (y0 + y1)
        placed = False
        for r in rows:
            if abs(cy - r["y"]) <= tol_y_px:
                close_x = (x0 - r["xmax"]) <= tol_x_px
                if close_x and not should_force_new_row(
                    r["texts"][-1] if r["texts"] else "", t
                ):
                    r["texts"].append(t)
                    r["xmax"] = max(r["xmax"], x1)
                    r["bbox"][0] = min(r["bbox"][0], x0)
                    r["bbox"][1] = min(r["bbox"][1], y0)
                    r["bbox"][2] = max(r["bbox"][2], x1)
                    r["bbox"][3] = max(r["bbox"][3], y1)
                    r["src"].append(b)
                    placed = True
                    break
        if not placed:
            rows.append(
                {"y": cy, "xmax": x1, "texts": [t], "bbox": [x0, y0, x1, y1],
                 "src": [b]}
            )
    return rows


def maybe_two_columns(rows: list[dict], page_w: float) -> list[list[dict]]:
    """A8: 1-D 2-means on row x-centers; split only if well separated."""
    if len(rows) < 8:
        return [rows]
    xc = [(r["bbox"][0] + r["bbox"][2]) / 2 for r in rows]
    if not xc:
        return [rows]
    c1, c2 = min(xc), max(xc)
    g1: list[int] = []
    g2: list[int] = []
    for _ in range(8):
        g1, g2 = [], []
        for i, x in enumerate(xc):
            (g1 if abs(x - c1) <= abs(x - c2) else g2).append(i)
        if not g1 or not g2:
            break
        c1 = sum(xc[i] for i in g1) / len(g1)
        c2 = sum(xc[i] for i in g2) / len(g2)
    if not g1 or not g2:
        return [rows]
    sep = abs(c1 - c2) / max(1.0, page_w)
    if sep < 0.12:
        return [rows]
    col1 = [rows[i] for i in g1]
    col2 = [rows[i] for i in g2]
    key = lambda r: (round(r["bbox"][1], 1), round(r["bbox"][0], 1))  # noqa: E731
    col1.sort(key=key)
    col2.sort(key=key)
    return [col1, col2]


def normalize_turn(blocks: list[dict]) -> tuple[list[dict], dict]:
    """01b normalize_page: returns (normalized blocks, stats)."""
    if not blocks:
        return [], {"tag_header": 0, "tag_footer": 0, "rows_out": 0, "mode": "none"}

    H = page_height(blocks)
    W = page_width(blocks)
    hts = [block_h(b) for b in blocks]
    med_h = statistics.median(hts) if hts else 12
    handwriting = detect_handwriting(blocks, hts=hts, med_h=med_h)
    tol_y = max(MIN_TOL_Y, BASE_LINE_MERGE_TOL_Y * med_h)
    tol_x = max(MIN_TOL_X, BASE_LINE_MERGE_TOL_X * med_h)

    head_px, foot_px = adaptive_bands(H, handwriting)
    y_head, y_foot = head_px, H - foot_px

    tagged_header = tagged_footer = 0
    kept: list[dict] = []
    for b in blocks:
        t = (b.get("text") or "").strip()
        if not t:
            continue
        x0, y0, x1, y1 = b["bbox"]
        nb = dict(b)
        meta = dict(b.get("stage_meta") or {})
        if y1 <= y_head:
            meta["header_tagged"] = True
            tagged_header += 1
        if y0 >= y_foot:
            meta["footer_tagged"] = True
            tagged_footer += 1
        nb["stage_meta"] = meta
        kept.append(nb)

    rows = merge_rows(kept, tol_y, tol_x)
    groups = maybe_two_columns(rows, W)
    mode = "1col" if len(groups) == 1 else "2col"

    out: list[dict] = []
    for grp in groups:
        for r in grp:
            lines = [t for t in r["texts"] if t.strip()]
            joined = " ".join(lines)
            if len(joined.strip()) < MIN_TEXT_LEN:
                continue
            nb = {**r["src"][0]}
            nb["bbox"] = r["bbox"]
            nb["text"] = joined
            nb["text_lines"] = lines
            meta = dict(nb.get("stage_meta") or {})
            meta["two_column_mode"] = mode == "2col"
            nb["stage_meta"] = meta
            out.append(nb)

    # reference final (y,x) sort — but in 2col mode this would interleave
    # the columns again (reference behaviour at 01b cell 0:222, arguably a
    # bug); we preserve column reading order instead and sort only in 1col
    # mode, as documented deviation.
    if mode == "1col":
        out.sort(key=lambda b: (round(b["bbox"][1], 1), round(b["bbox"][0], 1)))
    stats = {
        "tag_header": tagged_header,
        "tag_footer": tagged_footer,
        "rows_out": len(out),
        "mode": mode,
    }
    return out, stats
