"""Pure-Python bbox geometry shared by the golden oracle and the Spark UDFs.

Reference parity:
  - IoU: notebooks/01_extract_blocks.ipynb cell 4:95-104
  - bbox coercion: mcp/mcp_ocr_docling.py:162-180,
    notebooks/01_blocks_all_mcp_compare.ipynb cell 1:156-170
  - clamp: mcp/mcp_ocr_chandra.py:99-105
"""

from __future__ import annotations

from medical_ocr_pipeline_spark.constants import IOU_EPS, PAGE_H, PAGE_W


def iou(a: list[float], b: list[float]) -> float:
    """Intersection-over-union of two [x0,y0,x1,y1] boxes.

    Exact reference arithmetic (01_extract_blocks cell 4:95-104): returns
    0.0 when the intersection is empty, else inter / max(1e-6, union).
    """
    ix0 = max(a[0], b[0])
    iy0 = max(a[1], b[1])
    ix1 = min(a[2], b[2])
    iy1 = min(a[3], b[3])
    iw = max(0.0, ix1 - ix0)
    ih = max(0.0, iy1 - iy0)
    inter = iw * ih
    if inter <= 0:
        return 0.0
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(IOU_EPS, area_a + area_b - inter)


def coerce_bbox(raw, page_w: float = PAGE_W, page_h: float = PAGE_H) -> list[float]:
    """Normalize any accepted bbox shape into [x0,y0,x1,y1].

    Accepted inputs (reference behaviour): 4-list, dict {x0,y0,x1,y1},
    polygon list-of-[x,y], flat 8-float polygon.  Fallback: full page.
    """
    try:
        if isinstance(raw, dict):
            return [float(raw["x0"]), float(raw["y0"]),
                    float(raw["x1"]), float(raw["y1"])]
        if isinstance(raw, (list, tuple)):
            if len(raw) == 4 and all(isinstance(v, (int, float)) for v in raw):
                return [float(v) for v in raw]
            if len(raw) == 8 and all(isinstance(v, (int, float)) for v in raw):
                xs = [float(raw[i]) for i in range(0, 8, 2)]
                ys = [float(raw[i]) for i in range(1, 8, 2)]
                return [min(xs), min(ys), max(xs), max(ys)]
            if raw and all(isinstance(p, (list, tuple)) and len(p) == 2 for p in raw):
                xs = [float(p[0]) for p in raw]
                ys = [float(p[1]) for p in raw]
                return [min(xs), min(ys), max(xs), max(ys)]
    except (KeyError, TypeError, ValueError):
        pass
    return [0.0, 0.0, float(page_w), float(page_h)]


def clamp_bbox(b: list[float], page_w: float = PAGE_W, page_h: float = PAGE_H) -> list[float]:
    """Clamp coords into page bounds and enforce x1>=x0, y1>=y0."""
    x0 = min(max(b[0], 0.0), page_w)
    y0 = min(max(b[1], 0.0), page_h)
    x1 = min(max(b[2], 0.0), page_w)
    y1 = min(max(b[3], 0.0), page_h)
    return [x0, y0, max(x0, x1), max(y0, y1)]


def norm_conf(c) -> float:
    """Normalize confidence: >1 means percent; clamp to [0,1]; default 0.5.

    Parity: 01_blocks_all_mcp_compare cell 1:172-178; mcp_ocr_surya.py:119-126.
    """
    try:
        v = float(c)
    except (TypeError, ValueError):
        return 0.5
    if v != v:  # NaN
        return 0.5
    if v > 1.0:
        v = v / 100.0
    return min(max(v, 0.0), 1.0)


def union_bbox(boxes: list[list[float]]) -> list[float]:
    """min/min/max/max union of a non-empty list of boxes."""
    return [
        min(b[0] for b in boxes),
        min(b[1] for b in boxes),
        max(b[2] for b in boxes),
        max(b[3] for b in boxes),
    ]
