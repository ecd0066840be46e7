"""Payload parsers: turn text payload -> list of raw blocks.

The reference's 13 OCR micro-services each turn an image into the same
block shape ({"text", "confidence", "bbox", "source"}); per the north
rule those service-bound steps become deterministic in-process extractor
functions over the transcript `text` payload.  Four payload families
mirror the engine-input diversity (FIXTURES.md §1):

  1. HTML-ish        -> boilerplate strip via a DOM walk with
                        jusText/Readability-style link-density scoring
  2. layout-blocks   -> "x0,y0,x1,y1,conf,source|text" lines (bbox path)
  3. JSON-fenced     -> fence strip + light repair + parse (F3)
  4. plain text      -> line split + synthetic stacked bboxes (F21)

Reference parity:
  - synthetic bbox stacking: mcp/mcp_ocr_qwen.py:49-81 (img_h // n slices,
    fixed confidence)
  - fence strip / light repair: notebooks/04_json_extraction.ipynb
    cell 2:84-108, mcp/mcp_ocr_docling.py:74-95
  - tag strip seed: notebooks/01_blocks_all_mcp_compare.ipynb cell 1:188
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

from medical_ocr_pipeline_spark.constants import PAGE_H, PAGE_W
from medical_ocr_pipeline_spark.core.geometry import clamp_bbox, coerce_bbox, norm_conf

_LAYOUT_LINE_RE = re.compile(
    r"^\s*(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),"
    r"(-?\d+(?:\.\d+)?),([A-Za-z0-9_\-]+)\|(.*)$"
)
_FENCE_RE = re.compile(r"```(?:json|JSON)?\s*|\s*```")
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")
_HTML_SNIFF_RE = re.compile(r"<\s*(?:!doctype|html|head|body|div|p|nav|span)\b",
                            re.IGNORECASE)

# elements whose entire subtree is boilerplate (jusText-style bad containers)
_DROP_SUBTREE = {"script", "style", "head", "nav", "footer", "aside", "noscript",
                 "header", "form", "button", "iframe", "svg", "template"}
# elements that delimit candidate text blocks
_BLOCK_ELEMS = {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td",
                "th", "article", "section", "main", "blockquote", "pre", "tr",
                "ul", "ol", "table", "body"}
_LINK_DENSITY_MAX = 0.5
_MIN_BLOCK_CHARS = 3
_WS_RE = re.compile(r"\s+")


class _MainContentParser(HTMLParser):
    """Single-pass DOM walk collecting block-level text runs with per-run
    link-character counts (the jusText link-density heuristic, re-expressed
    without an external DOM library so it can run inside Arrow batches)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, chars, link_chars)
        self._drop_depth = 0
        self._link_depth = 0
        self._buf: list[str] = []
        self._link_chars = 0

    def _flush(self) -> None:
        raw = "".join(self._buf)
        text = _WS_RE.sub(" ", raw).strip()
        if len(text) >= _MIN_BLOCK_CHARS:
            self.blocks.append((text, len(text), self._link_chars))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_ELEMS or tag == "br":
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREE:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_ELEMS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._buf.append(data)
        if self._link_depth:
            self._link_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush()


def _stacked_blocks(lines: list[str], source: str, conf: float,
                    page_h: float = PAGE_H) -> list[dict]:
    """F21: distribute n text lines evenly down the page (img_h // n slices)."""
    n = len(lines)
    if n == 0:
        return []
    slice_h = page_h / n
    out = []
    for i, text in enumerate(lines):
        y0 = i * slice_h
        out.append({
            "text": text,
            "confidence": conf,
            "bbox": [0.0, y0, PAGE_W, min(page_h, y0 + slice_h)],
            "source": source,
        })
    return out


def parse_html(payload: str) -> list[dict]:
    """Boilerplate-stripped main-content blocks with link-density gating."""
    p = _MainContentParser()
    try:
        p.feed(payload)
        p.close()
    except Exception:
        pass
    kept = []
    for text, chars, link_chars in p.blocks:
        density = link_chars / chars if chars else 1.0
        if density <= _LINK_DENSITY_MAX:
            kept.append(text)
    return _stacked_blocks(kept, "html", 0.95)


def strip_fences(payload: str) -> str:
    return _FENCE_RE.sub("", payload).strip()


def light_repair(payload: str) -> str:
    """Drop trailing commas; cut to the first '{' or '['."""
    t = _TRAILING_COMMA_RE.sub(r"\1", payload)
    starts = [i for i in (t.find("{"), t.find("[")) if i >= 0]
    if starts:
        t = t[min(starts):]
    return t.strip()


def _json_strings(obj, out: list[str]) -> None:
    """Collect string leaves in deterministic traversal order."""
    if isinstance(obj, str):
        s = obj.strip()
        if s:
            out.append(s)
    elif isinstance(obj, dict):
        for k in obj:  # JSON object order = document order (deterministic)
            _json_strings(obj[k], out)
    elif isinstance(obj, list):
        for v in obj:
            _json_strings(v, out)


# engine-response envelope sniffing (reference: generic MCP response keys
# blocks/lines/results/predictions/preds/data, 01_blocks_all_mcp_compare
# cell 1:181-200; wrapper keys result/document/data then candidate arrays,
# mcp/mcp_ocr_docling.py:183-215)
_CANDIDATE_KEYS = ("blocks", "lines", "results", "predictions", "preds", "data")
_WRAPPER_KEYS = ("result", "document", "data")


def _harvest_block_records(obj) -> list[dict] | None:
    """If the parsed JSON looks like an OCR-engine response envelope,
    coerce its records into canonical blocks (F17 bbox + F18 conf)."""
    if not isinstance(obj, dict):
        return None
    for wk in _WRAPPER_KEYS:
        if isinstance(obj.get(wk), dict):
            inner = _harvest_block_records(obj[wk])
            if inner:
                return inner
    for key in _CANDIDATE_KEYS:
        cand = obj.get(key)
        if not (
            isinstance(cand, list)
            and cand
            and all(isinstance(e, dict) and "text" in e for e in cand)
        ):
            continue
        blocks = []
        for e in cand:
            text = str(e.get("text") or "").strip()
            if not text:
                continue
            bbox = clamp_bbox(coerce_bbox(e.get("bbox")))
            blocks.append({
                "text": text,
                "confidence": norm_conf(e.get("confidence", e.get("conf"))),
                "bbox": bbox,
                "source": str(obj.get("engine") or e.get("source") or "json_engine"),
            })
        if blocks:
            return blocks
    return None


def parse_json_fenced(payload: str) -> tuple[list[dict], int]:
    """F3: fence strip + light repair + parse.  Returns (blocks, failures)."""
    stripped = strip_fences(payload)
    for candidate in (stripped, light_repair(stripped)):
        try:
            obj = json.loads(candidate)
        except (json.JSONDecodeError, ValueError):
            continue
        harvested = _harvest_block_records(obj)
        if harvested is not None:
            return harvested, 0
        leaves: list[str] = []
        _json_strings(obj, leaves)
        return _stacked_blocks(leaves, "json", 0.98), 0
    # unparseable: fall back to fence-stripped raw lines, count the failure
    lines = [ln.strip() for ln in stripped.splitlines() if ln.strip()]
    return _stacked_blocks(lines, "json_raw", 0.60), 1


def parse_layout(payload: str) -> tuple[list[dict], int]:
    """Layout-block lines 'x0,y0,x1,y1,conf,source|text'. Bad lines counted."""
    blocks: list[dict] = []
    failures = 0
    for ln in payload.splitlines():
        if not ln.strip():
            continue
        m = _LAYOUT_LINE_RE.match(ln)
        if not m:
            failures += 1
            continue
        bbox = coerce_bbox([float(m.group(i)) for i in range(1, 5)])
        blocks.append({
            "text": m.group(7).strip(),
            "confidence": norm_conf(m.group(5)),
            "bbox": clamp_bbox(bbox),
            "source": m.group(6),
        })
    return blocks, failures


def parse_plain(payload: str) -> list[dict]:
    lines = [ln.strip() for ln in payload.splitlines() if ln.strip()]
    return _stacked_blocks(lines, "native", 0.98)


def detect_variant(payload: str) -> str:
    s = payload.lstrip()
    if _HTML_SNIFF_RE.search(s[:200]):
        return "html"
    if s.startswith("```") or (s[:1] in "{[" and s.rstrip()[-1:] in "}]"):
        return "json"
    first = s.split("\n", 1)[0]
    if _LAYOUT_LINE_RE.match(first):
        return "layout"
    return "plain"


def parse_payload(payload: str) -> tuple[list[dict], str, int]:
    """Dispatch on sniffed variant -> (raw blocks, variant, parse_failures)."""
    if payload is None or not payload.strip():
        return [], "empty", 0
    variant = detect_variant(payload)
    if variant == "html":
        return parse_html(payload), variant, 0
    if variant == "json":
        blocks, failures = parse_json_fenced(payload)
        return blocks, variant, failures
    if variant == "layout":
        blocks, failures = parse_layout(payload)
        return blocks, variant, failures
    return parse_plain(payload), variant, 0


# --- two-pass escalation (P4/P12/J9 analogues) ------------------------------
# Reference: cheap native pass first; heavy OCR only for pages failing the
# gate (01_extract_blocks cell 1:35-38, cell 2:21-24, cell 4:447-450).
# Our payload analogue: if the structured parse yields little text, run the
# plain-line fallback extractor over the raw payload as the "heavy" second
# pass and union it in; the native-strength gate keeps the primary blocks
# only when they carry enough characters.

ESCALATION_MIN_CHARS = 200   # need_escalation: native < 200 chars
NATIVE_LEN_GATE_CHARS = 100  # native_len_gate (cell 1:45)


def need_escalation(blocks: list[dict]) -> bool:
    """P12: too little extracted text -> run the heavy second pass."""
    total = sum(len(b["text"]) for b in blocks)
    if total >= ESCALATION_MIN_CHARS:
        return False
    if not blocks:
        return True
    mean_conf = sum(b["confidence"] for b in blocks) / len(blocks)
    return total < ESCALATION_MIN_CHARS and (mean_conf < 0.70 or len(blocks) < 10)


def escalate(payload: str, primary: list[dict]) -> list[dict]:
    """J9-style rescue: heavy fallback pass over the raw payload (markup
    and fences stripped first so tag soup never re-enters), union with the
    gated primary (P4: primary kept only if >= 100 chars)."""
    defenced = strip_fences(payload)
    # strip tags line-by-line (keeping newlines so parse_plain still sees
    # line structure)
    stripped = "\n".join(
        re.sub(r"<[^>]+>", " ", ln) for ln in defenced.splitlines()
    )
    heavy = [
        {**b, "source": "heavy", "confidence": 0.60}
        for b in parse_plain(stripped)
    ]
    primary_chars = sum(len(b["text"]) for b in primary)
    gated_primary = primary if primary_chars >= NATIVE_LEN_GATE_CHARS else []
    return gated_primary + heavy
