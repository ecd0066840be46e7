"""Deterministic synthetic transcript generator (seed=42 world).

Every turn is a pure function of (conv_id, turn_idx) via crc32-seeded
``random.Random`` — NO global state, NO wall clock — so the same rows can
be produced:

  * single-process (golden oracle / pytest fixtures), and
  * distributed on executors (``spark_transcripts`` below) for the
    million-turn bench, without ever materializing the table to disk.

Payload variants mirror FIXTURES.md §1 / the reference engines' input
diversity: HTML-ish boilerplate, layout-block lines, plain text with
OCR-ish noise, JSON-fenced model output.  Conversation sizes are
power-law-ish with occasional 500+-turn megaconversations to exercise
skew handling.
"""

from __future__ import annotations

import datetime as dt
import random
import zlib

from medical_ocr_pipeline_spark.constants import PAGE_H, PAGE_W

_WORDS = (
    "patient reports mild fever and cough since two days with stable vitals "
    "the assistant suggested rest fluids and monitoring temperature daily "
    "radiology impression shows clear lungs no acute findings overall "
    "prescription includes paracetamol and rest follow up in one week "
    "tool output contains structured result for the requested query value"
).split()

_MISSPELLINGS = ["toabeculas", "necrosls", "lnflammation", "carclnoma", "flbrosis"]
_NOISY = ["@@", "||", "…", "•", "–", "×"]

_BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)
_ROLES = ("user", "assistant", "tool")


def _h(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


def conv_len(conv_id: str) -> int:
    """Power-law-ish conversation sizes; ~1% megaconversations."""
    r = _h(conv_id + ":len") % 1000
    if r < 700:
        return 2 + _h(conv_id + ":l2") % 9          # 2-10
    if r < 950:
        return 10 + _h(conv_id + ":l3") % 41        # 10-50
    if r < 990:
        return 50 + _h(conv_id + ":l4") % 151       # 50-200
    return 500 + _h(conv_id + ":l5") % 200          # megaconversation


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _html_payload(rng: random.Random) -> str:
    paras = "".join(
        f"<p>{_sentence(rng, 8 + rng.randrange(10))}</p>"
        for _ in range(2 + rng.randrange(4))
    )
    nav = "".join(f'<a href="/{i}">link {i}</a>' for i in range(5))
    return (
        "<html><head><title>t</title><style>.x{color:red}</style></head><body>"
        f"<nav>{nav}</nav><header>site banner</header>"
        f'<div class="content">{paras}</div>'
        f'<div class="sidebar"><a href="/a">more</a> <a href="/b">links</a> '
        f'<a href="/c">here</a> x</div>'
        "<footer>(c) junk footer 2026</footer></body></html>"
    )


def _layout_payload(rng: random.Random) -> str:
    lines = []
    y = 40.0
    # ALL-CAPS heading near top (header band)
    lines.append(f"60,{y:.0f},400,{y + 18:.0f},0.97,native|CLINICAL SUMMARY")
    y += 60
    for _ in range(3 + rng.randrange(5)):
        txt = _sentence(rng, 5 + rng.randrange(6))
        x0 = 50 + rng.randrange(30)
        lines.append(f"{x0},{y:.0f},{x0 + 500},{y + 16:.0f},0.9{rng.randrange(10)},ocr_a|{txt}")
        # near-duplicate from a second source for some lines (dedup exercise)
        if rng.random() < 0.4:
            lines.append(
                f"{x0 + 2},{y + 1:.0f},{x0 + 502},{y + 17:.0f},0.88,ocr_b|{txt}"
            )
        # a low-confidence block that must be gated out
        if rng.random() < 0.3:
            lines.append(f"{x0},{y + 2:.0f},{x0 + 200},{y + 15:.0f},0.30,ocr_b|zzz noise")
        y += 20 + rng.randrange(3) * 14  # some gaps exceed para_join 26
    # bullet list
    for i in range(2):
        lines.append(f"70,{y:.0f},420,{y + 15:.0f},0.95,native|- item {_sentence(rng, 3)}")
        y += 18
    # degraded lines the strict parser rejects (separator variants /
    # missing conf+source) — the fast-pass parse_failures + grid-rescue
    # exercise.  Right-column placement (x >= 700) lands in grid cells
    # the strict blocks never reach, so the cell-scoped rescue recovers
    # them; a same-syntax line in the dense left column is NOT rescued.
    if rng.random() < 0.35:
        x0 = 700 + rng.randrange(60)
        txt = _sentence(rng, 3 + rng.randrange(3))
        if rng.random() < 0.5:
            s = ";"
            lines.append(
                f"{x0}{s}{y:.0f}{s}{x0 + 220}{s}{y + 15:.0f}{s}"
                f"0.8{rng.randrange(10)}{s}ocr_c|{txt}"
            )
        else:
            lines.append(f"{x0},{y:.0f},{x0 + 220},{y + 15:.0f}|{txt}")
        if rng.random() < 0.3:
            lines.append(
                f"80;{y + 18:.0f};300;{y + 33:.0f};0.85;ocr_c|"
                f"{_sentence(rng, 3)}"
            )
        y += 18
    # footer band block
    lines.append(f"60,{PAGE_H - 40:.0f},300,{PAGE_H - 20:.0f},0.92,native|page footer {rng.randrange(99)}")
    return "\n".join(lines)


def _plain_payload(rng: random.Random) -> str:
    out = []
    for _ in range(3 + rng.randrange(5)):
        words = [_sentence(rng, 6 + rng.randrange(6))]
        if rng.random() < 0.5:
            words.append(rng.choice(_MISSPELLINGS))
        if rng.random() < 0.4:
            words.append(rng.choice(_NOISY))
        if rng.random() < 0.5:
            words.append(f"{100 + rng.randrange(900)} mg")
        out.append(" ".join(words))
    return "\n".join(out)


def _json_payload(rng: random.Random) -> str:
    if rng.random() < 0.25:
        # OCR-engine response envelope with mixed bbox/conf shapes
        # (exercises F17 coercion + F18 normalization end-to-end)
        y = 60
        records = []
        for _ in range(2 + rng.randrange(3)):
            shape = rng.randrange(3)
            txt = _sentence(rng, 4 + rng.randrange(4))
            if shape == 0:      # 4-list, fractional conf
                bb = f"[40, {y}, 600, {y + 18}]"
                conf = f"0.8{rng.randrange(10)}"
            elif shape == 1:    # polygon list-of-[x,y], percent conf
                bb = (f"[[40, {y}], [600, {y}], [600, {y + 18}], [40, {y + 18}]]")
                conf = str(80 + rng.randrange(19))
            else:               # dict corners
                bb = f'{{"x0": 40, "y0": {y}, "x1": 600, "y1": {y + 18}}}'
                conf = f"0.9{rng.randrange(10)}"
            records.append(f'{{"text": "{txt}", "confidence": {conf}, "bbox": {bb}}}')
            y += 22 + rng.randrange(2) * 20
        return (
            '{"engine": "eng_%d", "blocks": [%s], "meta": {}}'
            % (rng.randrange(4), ", ".join(records))
        )
    body = (
        '{"summary": "%s", "items": ["%s", "%s"], "dose": "%d mg",}'
        % (_sentence(rng, 6), _sentence(rng, 3), _sentence(rng, 3),
           100 + rng.randrange(400))
    )
    if rng.random() < 0.2:
        # unparseable even after repair -> parse_failures
        body = body[:-8] + '"broken'
    return f"```json\n{body}\n```"


def make_payload(conv_id: str, turn_idx: int) -> str:
    key = f"{conv_id}:{turn_idx}"
    variant = _h(key + ":v") % 4
    rng = random.Random(_h(key + ":seed"))
    if variant == 0:
        return _html_payload(rng)
    if variant == 1:
        return _layout_payload(rng)
    if variant == 2:
        return _plain_payload(rng)
    return _json_payload(rng)


def make_turn(conv_id: str, turn_idx: int) -> tuple:
    role = _ROLES[turn_idx % 3]
    tool = f"tool_{_h(conv_id) % 7}" if role == "tool" else None
    conv_offset = _h(conv_id + ":t0") % 86_400
    ts = _BASE_TS + dt.timedelta(seconds=conv_offset + 13 * turn_idx)
    return (conv_id, turn_idx, role, make_payload(conv_id, turn_idx), tool, ts)


def conv_ids(n_convs: int) -> list[str]:
    return [f"conv_{k:06d}" for k in range(n_convs)]


def iter_turns(n_convs: int):
    """Single-process turn iterator in deliberately shuffled order
    (tests must prove stable reordering via Window(conv_id, turn_idx))."""
    rows = []
    for cid in conv_ids(n_convs):
        for t in range(conv_len(cid)):
            rows.append(make_turn(cid, t))
    rows.sort(key=lambda r: _h(f"{r[0]}:{r[1]}:shuffle"))
    return rows


def total_turns(n_convs: int) -> int:
    return sum(conv_len(c) for c in conv_ids(n_convs))


# --------------------------------------------------------------------------
# Distributed generation: same rows, produced on executors.
# --------------------------------------------------------------------------

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def spark_transcripts(spark, n_convs: int, partitions: int = 32):
    """Generate the transcripts table distributed, one task per slice of
    conversations.  Pure function of (n_convs) — identical rows to
    ``iter_turns`` modulo row order (which the engine must not rely on).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])

    def gen(batches):
        for pdf in batches:
            out = {c: [] for c in TRANSCRIPT_COLUMNS}
            for k in pdf["id"]:
                cid = f"conv_{int(k):06d}"
                for t in range(conv_len(cid)):
                    row = make_turn(cid, t)
                    for c, v in zip(TRANSCRIPT_COLUMNS, row):
                        out[c].append(v)
            yield pd.DataFrame(out)

    base = spark.range(0, n_convs).repartition(partitions, F.col("id"))
    return base.mapInPandas(gen, schema=schema)
