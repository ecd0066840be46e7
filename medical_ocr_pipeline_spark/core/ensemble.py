"""K-way parallel engine ensemble: run every extractor family that is
healthy for the payload over the SAME payload, union, J1-dedup.

Reference parity (the one execution shape the variant-dispatched fast
path never exercises end-to-end):
  - `01_extract_blocks.ipynb cell 4:430-434` runs ALL enabled OCR
    engines on the same rasterized page;
  - `merge_ensemble` (cell 4:388-400) unions native + every engine's
    blocks, regroups lines, J1-deduplicates, tags sections;
  - the native text layer is gated at `native_len_gate` chars
    (cell 1:45, cell 4:447-450) before entering the union;
  - per-engine block lists are kept for traceability (cell 4:437-444) —
    our analogue is the per-engine A5-style metrics row with a J8
    argmax `is_best` flag.

Engine registry per payload family ("healthy engines" ≙ the reference's
`use_easyocr`/`use_tesseract`/... flags — an engine that would read
garbage off this family is disabled, exactly like a disabled service):

  html   -> native html DOM-walk + heavy tag-strip
  plain  -> native plain-line    + heavy tag-strip
  layout -> native strict layout + relaxed layout over ALL lines
            (two real-geometry engines; the heavy strip engine is
            unhealthy here — it would read coordinate syntax as prose)
  json   -> native json only (other engines would read JSON source as
            prose; the json parser carries its own fallback chain)

The relaxed layout engine is UNHEALTHY for the html/plain families by
the same rule that excludes heavy from layout: it reads prose that
happens to match coordinate syntax ('20;90;400;120;0.8|...') as real
geometry, emitting the embedded text at parsed-bbox coordinates that
are disjoint from the line-anchored system the rest of the family uses
— undedupable duplication, not signal.

Dedup soundness: within a family the engines share a coordinate system
— strict+relaxed layout emit identical real bboxes for shared lines
(IoU 1.0); plain/heavy use LINE-ANCHORED synthetic bboxes (parse.py
_line_anchored_blocks: block y-span = its payload line's slice of the
page) and the html engine spans its blocks over their full source-line
range.  Same-granularity overlap (two engines reading the same line)
dedups through J1's IoU >= 0.5 AND fuzzy >= 0.92 test exactly like
cross-OCR overlap on the reference's real page coordinates.
Cross-GRANULARITY overlap (a multi-line DOM paragraph vs the heavy
engine's per-line copies of it, or a minified one-line document where
the heavy engine reads everything as one line) cannot pass the fuzzy
test — whole vs part — so for the html/plain families merge_ensemble
additionally applies a containment dedup (_containment_mask): visiting
blocks highest-confidence first, a candidate that spatially co-locates
with a kept block (>= half of the smaller extent on both axes) and
whose entity+whitespace-normalized text contains or is contained in the
kept block's is dropped before the union reaches finish_extract.  The
layout family is exempt — real geometry, where same-band adjacent cells
legitimately hold substring-related text.
"""

from __future__ import annotations

import html as _html
import re

from medical_ocr_pipeline_spark.core.parse import (
    NATIVE_LEN_GATE_CHARS,
    detect_variant,
    heavy_strip_blocks_anchored,
    parse_html_anchored,
    parse_json_fenced,
    parse_layout,
    parse_layout_relaxed,
    parse_plain_anchored,
)


def run_engines(payload: str) -> tuple[list[tuple[str, list[dict]]], str, int]:
    """Run every healthy engine for the sniffed family over the whole
    payload.  Returns ([(engine_name, blocks), ...], variant,
    parse_failures); the first entry is always the native engine."""
    if payload is None or not payload.strip():
        return [], "empty", 0
    variant = detect_variant(payload)
    failures = 0
    if variant == "html":
        engines = [
            ("html", parse_html_anchored(payload)),
            ("heavy", heavy_strip_blocks_anchored(payload)),
        ]
    elif variant == "plain":
        engines = [
            ("plain", parse_plain_anchored(payload)),
            ("heavy", heavy_strip_blocks_anchored(payload)),
        ]
    elif variant == "layout":
        strict, failures = parse_layout(payload)
        engines = [
            ("layout", strict),
            ("relaxed", parse_layout_relaxed(payload, include_strict=True)),
        ]
    else:  # json
        blocks, failures = parse_json_fenced(payload)
        engines = [("json", blocks)]
    return engines, variant, failures


_WS_RE = re.compile(r"\s+")


def _containment_mask(blocks: list[dict]) -> list[bool]:
    """Cross-granularity dedup mask for the SYNTHETIC line-anchored
    families (html/plain): J1 (IoU + fuzzy >= 0.92) absorbs
    same-granularity overlap only — a multi-line DOM paragraph vs the
    heavy engine's per-line copies, or a minified document the heavy
    engine reads as one whole-line block, is whole-vs-part and never
    fuzzy-similar, so without this pass the same content ships twice in
    text_final.

    Rule (J1's own confidence priority extended across granularity):
    blocks are visited highest-confidence first; a candidate is dropped
    when an already-kept block spatially co-locates with it (>= half of
    the smaller extent overlapped on BOTH axes) and either text CONTAINS
    the other after whitespace + HTML-entity normalization (the DOM walk
    unescapes charrefs, the heavy tag-strip does not — without
    html.unescape here an '&amp;' paragraph dodges the substring test
    and duplicates).  Dropping the lower-confidence side of a
    containment pair means a heavy whole-line superset never displaces
    gated-in native blocks (it is the same region read worse, with
    boilerplate glued on); its genuinely co-located surplus is the
    boilerplate the native engine deliberately dropped.  The two-axis
    overlap guard keeps genuine repeats (the same phrase at two distinct
    document positions) intact.

    NOT applied to the layout family: its engines share REAL page
    geometry where horizontally adjacent same-band cells legitimately
    hold substring-related text (e.g. table columns 'patient name' |
    'name'), and strict/relaxed emit identical bboxes for shared lines
    so J1 alone is sound there."""
    n = len(blocks)
    if n < 2:
        return [True] * n
    norm = [
        _WS_RE.sub(" ", _html.unescape(b.get("text") or "")).strip().lower()
        for b in blocks
    ]
    order = sorted(
        range(n),
        key=lambda i: (
            -(blocks[i].get("confidence", 1.0)),
            -len(norm[i]),
            blocks[i]["bbox"][1],
            blocks[i]["bbox"][0],
        ),
    )
    keep = [True] * n
    kept_idx: list[int] = []
    for i in order:
        bi = blocks[i]["bbox"]
        hi = max(bi[3] - bi[1], 1e-6)
        wi = max(bi[2] - bi[0], 1e-6)
        if not norm[i]:
            kept_idx.append(i)
            continue
        for j in kept_idx:
            bj = blocks[j]["bbox"]
            ov_y = min(bi[3], bj[3]) - max(bi[1], bj[1])
            if ov_y / min(hi, max(bj[3] - bj[1], 1e-6)) < 0.5:
                continue
            ov_x = min(bi[2], bj[2]) - max(bi[0], bj[0])
            if ov_x / min(wi, max(bj[2] - bj[0], 1e-6)) < 0.5:
                continue
            if norm[j] and (norm[i] in norm[j] or norm[j] in norm[i]):
                keep[i] = False
                break
        if keep[i]:
            kept_idx.append(i)
    return keep


def merge_ensemble(
    engines: list[tuple[str, list[dict]]],
    native_len_gate: int = NATIVE_LEN_GATE_CHARS,
    containment: bool = False,
) -> tuple[list[dict], list[dict]]:
    """Union of all engine outputs with the native gate (P4) and — for
    the synthetic line-anchored families — the cross-granularity
    containment dedup, plus the per-engine A5-style metrics with the J8
    argmax `is_best` flag.

    Returns (union_blocks, metrics).  metrics rows:
      {engine, n_blocks, n_chars, n_chars_kept, mean_conf, gated_out,
       is_best}
    n_blocks/n_chars/mean_conf describe the engine's RAW output (the
    reference's per-engine traceability lists); n_chars_kept counts only
    the blocks that survive into the shipped union, and the best-engine
    argmax ranks by (n_chars_kept, mean_conf, name) — crediting an
    engine for content the dedup then drops would systematically award
    is_best to the heavy engine for re-reading what native already
    extracted.

    containment defaults to FALSE because the pass is only sound for
    the synthetic line-anchored families — callers must opt in per
    family (extract_turn_ensemble passes variant in ('html', 'plain'));
    a True default would hand layout-family callers the same-band
    substring-cell collapse the family exemption exists to prevent."""
    metrics: list[dict] = []
    union: list[dict] = []
    owner: list[int] = []  # union index -> metrics position
    for pos, (name, blocks) in enumerate(engines):
        n_chars = sum(len(b["text"]) for b in blocks)
        mean_conf = (
            sum(b["confidence"] for b in blocks) / len(blocks) if blocks else 0.0
        )
        # the native gate exists because OCR engines back native up
        # (reference cell 4:449); with a single-engine family there is
        # no fallback, so gating would wipe the page — don't
        gated_out = pos == 0 and len(engines) > 1 and n_chars < native_len_gate
        metrics.append({
            "engine": name,
            "n_blocks": len(blocks),
            "n_chars": n_chars,
            "n_chars_kept": 0,
            "mean_conf": mean_conf,
            "gated_out": gated_out,
            "is_best": False,
        })
        if not gated_out:
            union.extend(blocks)
            owner.extend([pos] * len(blocks))
    mask = _containment_mask(union) if containment else [True] * len(union)
    for b, pos, kept in zip(union, owner, mask):
        if kept:
            metrics[pos]["n_chars_kept"] += len(b["text"])
    contenders = [m for m in metrics if not m["gated_out"] and m["n_blocks"]]
    if contenders:
        best = max(
            contenders,
            key=lambda m: (m["n_chars_kept"], m["mean_conf"], m["engine"]),
        )
        best["is_best"] = True
    return [b for b, kept in zip(union, mask) if kept], metrics


def extract_turn_ensemble(payload: str, enable_fuzzy: bool = True):
    """Full per-turn pipeline over the k-way ensemble union instead of
    the variant-dispatched single parse: engines -> gate -> union ->
    (shared finish_extract: P1/P2 -> J1 -> A1/A2 -> J1 -> P7 -> 01b ->
    02 -> 03 -> 02a -> A12).  The two-pass escalation / grid-rescue
    branches of the fast path are subsumed: the heavy and relaxed
    engines run UNCONDITIONALLY here (the reference runs all healthy
    engines on every page, not only on weak ones).

    Returns (ExtractResult, engine_metrics) — variant is tagged
    '+ens<k>' with the number of engines that contributed blocks.
    """
    from medical_ocr_pipeline_spark.core.extract import finish_extract

    engines, variant, parse_failures = run_engines(payload)
    union, metrics = merge_ensemble(
        engines, containment=variant in ("html", "plain")
    )
    k = sum(1 for m in metrics if not m["gated_out"] and m["n_blocks"])
    result, gated, final_blocks = finish_extract(
        union, f"{variant}+ens{k}", parse_failures, payload,
        enable_fuzzy=enable_fuzzy,
    )
    return result, metrics
