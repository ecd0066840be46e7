"""J1: per-turn greedy spatial+fuzzy dedup of blocks.

Reference parity: notebooks/01_extract_blocks.ipynb cell 4:374-386 —
iterate blocks sorted by (-confidence, len(text)); drop empty-text blocks;
keep a block unless an already-kept block has IoU >= iou_thr AND fuzzy
similarity of the LOWERCASED texts >= sim_thr; finally re-sort by
(round(y0,1), round(x0,1)).  n per turn is tens, so the O(n^2) in-batch
loop is deliberate; greedy order-dependence means this must never be
distributed mid-group.
"""

from __future__ import annotations

import difflib

from medical_ocr_pipeline_spark.constants import DEDUP_IOU_THR, DEDUP_SIM_THR
from medical_ocr_pipeline_spark.core.geometry import iou


def fuzz_ratio(a: str, b: str) -> float:
    """0..1 similarity; rapidfuzz in the reference (01_extract_blocks cell
    4:34-42) with difflib fallback — the sandbox has no rapidfuzz, so the
    difflib branch IS the deterministic behaviour."""
    return difflib.SequenceMatcher(None, a, b).ratio()


def deduplicate(blocks: list[dict],
                iou_thr: float = DEDUP_IOU_THR,
                sim_thr: float = DEDUP_SIM_THR) -> list[dict]:
    ordered = sorted(
        blocks, key=lambda b: (-b.get("confidence", 1.0), len(b.get("text", "")))
    )
    kept: list[dict] = []
    for b in ordered:
        t = (b.get("text", "") or "").strip()
        if not t:
            continue
        dup = False
        tl = t.lower()
        for k in kept:
            if iou(b["bbox"], k["bbox"]) < iou_thr:
                continue
            kl = k["text"].lower()
            # SequenceMatcher.ratio() <= 2*min(len)/ (len_a+len_b): skip the
            # quadratic match when the length bound already rules out >= thr
            bound = 2.0 * min(len(tl), len(kl)) / max(1, len(tl) + len(kl))
            if bound >= sim_thr and fuzz_ratio(tl, kl) >= sim_thr:
                dup = True
                break
        if not dup:
            kept.append(b)
    kept.sort(key=lambda b: (round(b["bbox"][1], 1), round(b["bbox"][0], 1)))
    return kept
