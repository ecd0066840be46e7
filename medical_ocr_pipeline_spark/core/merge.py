"""A7 deep dict merge + F15 CER/WER metrics — pure per-document functions.

Reference parity:
  - merge_dict: notebooks/05_merge_and_validate.ipynb cell 2:13-33 —
    first-non-empty wins for scalars, recursive for dicts, concatenation
    with exact dedup (sort_keys JSON serialization as the key) for lists,
    'metadata' keys skipped;
  - CER/WER: notebooks/qa_pipeline_evaluator.py:490-509 —
    1 - SequenceMatcher ratio on characters / word lists.
"""

from __future__ import annotations

import difflib
import json


def merge_dict(a: dict, b: dict) -> dict:
    """Recursive merge of chunk JSONs (mutates and returns a)."""
    for k, v in b.items():
        if k == "metadata":
            continue
        if k not in a or a[k] in ("", None, [], {}):
            a[k] = v
            continue
        if isinstance(a[k], dict) and isinstance(v, dict):
            a[k] = merge_dict(a[k], v)
            continue
        if isinstance(a[k], list) and isinstance(v, list):
            seen: set[str] = set()
            out = []
            for it in a[k] + v:
                key = (
                    json.dumps(it, sort_keys=True)
                    if isinstance(it, dict)
                    else str(it)
                )
                if key in seen:
                    continue
                seen.add(key)
                out.append(it)
            a[k] = out
            continue
    return a


def merge_pieces(pieces: list[dict]) -> dict:
    """Fold merge_dict over pieces in deterministic (given) order."""
    merged: dict = {}
    for p in pieces:
        merged = merge_dict(merged, p)
    return merged


def cer(reference: str, hypothesis: str) -> float:
    """Character error rate: 1 - SequenceMatcher ratio on chars."""
    if not reference:
        return 0.0 if not hypothesis else 1.0
    return 1.0 - difflib.SequenceMatcher(None, reference, hypothesis).ratio()


def wer(reference: str, hypothesis: str) -> float:
    """Word error rate: 1 - SequenceMatcher ratio on word lists."""
    rw = reference.split()
    hw = hypothesis.split()
    if not rw:
        return 0.0 if not hw else 1.0
    return 1.0 - difflib.SequenceMatcher(None, rw, hw).ratio()


def unigram_overlap(reference: str, hypothesis: str) -> float:
    """BLEU-ish unigram overlap (qa_pipeline_evaluator.py:504-509)."""
    rw = set(reference.lower().split())
    hw = set(hypothesis.lower().split())
    if not rw:
        return 0.0
    return len(rw & hw) / len(rw)
