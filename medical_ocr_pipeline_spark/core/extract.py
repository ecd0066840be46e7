"""Per-turn main-content extraction: the reference's 01 -> 01b -> 02 ->
final-text path compressed into one pure function.

This function is the single source of truth for per-turn semantics: the
golden oracle (medical_ocr_pipeline_spark.oracle) calls it single-process,
and the Spark pipeline (medical_ocr_pipeline_spark.pipeline) calls it
inside mapInPandas over Arrow batches — so "per-turn text equality under
stable turn ordering" holds by construction, and pytest verifies that
Spark's partitioning/ordering/skew machinery preserves it.

Stage order (reference lifecycle, SURVEY.md §3.1; merge_ensemble at
01_extract_blocks cell 4:388-400 is union -> regroup -> dedup -> section):
  parse payload -> normalize conf/bbox -> confidence gate (P1) ->
  empty filter (P2) -> raw-fragment dedup (J1 applied pre-regroup; our
  documented improvement — cross-source near-duplicates would otherwise
  be " "-joined into the same line by A1 and survive paragraph-level
  dedup) -> line group (A1) + paragraph regroup (A2) -> paragraph dedup
  (J1) -> section tag (P7) -> cleanup rules+dict+fuzzy (F1/J2/J3) ->
  min-length filter (P3) -> final text materialize (A12).
"""

from __future__ import annotations

from typing import NamedTuple

from medical_ocr_pipeline_spark.constants import (
    FOOTER_FRAC,
    HEADER_FRAC,
    MIN_CONF,
    MIN_TEXT_LEN,
    PAGE_H,
)
from medical_ocr_pipeline_spark.core.dedup_blocks import deduplicate
from medical_ocr_pipeline_spark.core.lineify import regroup_lines
from medical_ocr_pipeline_spark.core.parse import parse_payload
from medical_ocr_pipeline_spark.core.textnorm import (
    apply_dictionary,
    apply_fuzzy,
    apply_rules,
)


class ExtractResult(NamedTuple):
    text_final: str
    n_blocks: int
    mean_conf: float
    bytes_stripped: int
    parse_failures: int
    variant: str


def section_of(bbox: list[float], page_h: float = PAGE_H) -> str:
    """P7: center-y < 0.25H -> header, > 0.85H -> footer, else body."""
    cy = (bbox[1] + bbox[3]) / 2.0
    if cy < HEADER_FRAC * page_h:
        return "header"
    if cy > FOOTER_FRAC * page_h:
        return "footer"
    return "body"


def extract_turn(payload: str, enable_fuzzy: bool = True) -> ExtractResult:
    raw_blocks, variant, parse_failures = parse_payload(payload)

    # P1 confidence gate + P2 empty-text filter
    gated = [
        b for b in raw_blocks
        if b["confidence"] >= MIN_CONF and b["text"] and b["text"].strip()
    ]

    prededup = deduplicate(gated)        # J1 on raw fragments (improvement)
    paras = regroup_lines(prededup)      # A1 + A2
    deduped = deduplicate(paras)         # J1 on paragraphs (reference order)

    cleaned: list[dict] = []
    for b in deduped:
        b = dict(b)
        b["section"] = section_of(b["bbox"])       # P7
        t = apply_rules(b["text"])                 # F1
        t, _ = apply_dictionary(t)                 # J2
        if enable_fuzzy:
            t, _ = apply_fuzzy(t)                  # J3
        b["text_cleaned"] = t
        if len(t.strip()) >= MIN_TEXT_LEN:         # P3
            cleaned.append(b)

    # A12: final text in reading order (blocks already y,x-sorted by J1)
    text_final = "\n".join(b["text_cleaned"] for b in cleaned)
    n = len(cleaned)
    mean_conf = (sum(b["confidence"] for b in cleaned) / n) if n else 0.0
    payload_bytes = len(payload.encode("utf-8")) if payload else 0
    bytes_stripped = max(0, payload_bytes - len(text_final.encode("utf-8")))
    return ExtractResult(text_final, n, mean_conf, bytes_stripped,
                         parse_failures, variant)
