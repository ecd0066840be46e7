"""K-way parallel engine ensemble (U1/S3 full form).

Reference shape (01_extract_blocks.ipynb cell 4:388-400,430-450): run
every healthy engine over the same page, gate the native layer at
native_len_gate chars, union, regroup, J1-dedup, tag sections; keep
per-engine outputs for traceability.  These tests pin our payload
analogue: union provably differs from single-dispatch where an engine
recovers content, exact cross-engine dedup where engines agree, the P4
native gate, and the A5-metrics/J8-argmax traceability rows.
"""

from __future__ import annotations

import pytest

from medical_ocr_pipeline_spark.core.ensemble import (
    extract_turn_ensemble,
    merge_ensemble,
    run_engines,
)
from medical_ocr_pipeline_spark.core.extract import extract_turn

HTML = """<html><head><title>t</title></head><body>
<nav><a href="/">Home</a> <a href="/x">Products</a></nav>
<p>Patient presented with acute symptoms and was advised bed rest for two weeks following the initial consultation at the clinic.</p>
<div>Dosage was adjusted to 20mg twice daily after the follow-up visit showed marked improvement in all vital signs.</div>
<footer>Copyright 2026 Clinic Inc. All rights reserved. Confidential document, do not distribute.</footer>
</body></html>"""

LAYOUT = (
    "10,10,400,40,0.95,tess|Heading line one\n"
    "10,50,400,80,0.9,tess|Body text follows here\n"
    "20;90;400;120;0.8|Relaxed-only line strict missed\n"
)


def test_union_differs_from_single_dispatch_on_html():
    """The heavy engine reads boilerplate subtrees parse_html drops
    (nav/footer text); the union therefore carries strictly more content
    than single dispatch — the reference's all-engines union."""
    single = extract_turn(HTML)
    merged, metrics = extract_turn_ensemble(HTML)
    assert single.variant == "html"
    assert merged.variant == "html+ens2"
    assert "Copyright 2026 Clinic Inc" not in single.text_final
    assert "Copyright 2026 Clinic Inc" in merged.text_final
    # the main content is preserved, and exactly once (cross-engine
    # copies of the same paragraph dedup via line-anchored IoU)
    assert merged.text_final.count("Dosage was adjusted to 20mg") == 1
    assert merged.text_final.count("Patient presented with acute") == 1


def test_cross_engine_dedup_is_exact_on_layout():
    """Strict + relaxed-full layout engines emit identical text+bbox for
    strict lines -> IoU 1.0 / ratio 1.0 -> J1 keeps exactly one copy;
    the relaxed engine contributes only the lines strict rejected."""
    single = extract_turn(LAYOUT)
    merged, metrics = extract_turn_ensemble(LAYOUT)
    for line in ("Heading line one", "Body text follows here",
                 "Relaxed-only line strict missed"):
        assert merged.text_final.count(line) == 1
    # grid-rescue single dispatch already recovers the relaxed line; the
    # ensemble reaches the same text through the parallel-union shape
    assert merged.text_final == single.text_final
    by_name = {m["engine"]: m for m in metrics}
    assert by_name["layout"]["n_blocks"] == 2
    assert by_name["relaxed"]["n_blocks"] == 3  # 2 strict + 1 rescue line


def test_native_gate_drops_weak_native_from_union():
    """P4: a native layer under 100 chars never enters the union
    (reference cell 4:449: `native if native_chars >= native_len_gate
    else []`), but its traceability row survives with gated_out=True."""
    engines, variant, _ = run_engines(LAYOUT)
    union, metrics = merge_ensemble(engines)
    native = metrics[0]
    assert native["engine"] == "layout"
    assert native["n_chars"] < 100 and native["gated_out"]
    assert all(b["source"] != "tess" or ";" not in b["text"] for b in union)
    # gated-out native is not a best-engine contender
    assert not native["is_best"]
    assert metrics[1]["is_best"]


def test_json_family_is_single_engine():
    """Other engines would read JSON source as prose — they are
    'unhealthy' for this family (the reference's use_<engine>=False)."""
    payload = '{"a": "alpha text content", "b": ["beta text content"]}'
    engines, variant, failures = run_engines(payload)
    assert variant == "json"
    assert [name for name, _ in engines] == ["json"]
    merged, metrics = extract_turn_ensemble(payload)
    assert merged.text_final == extract_turn(payload).text_final


def test_best_engine_argmax_deterministic():
    """J8: best = argmax(n_chars_kept, mean_conf, name) over union
    participants — SURVIVING contribution, not raw output (crediting
    containment-dropped re-reads would hand is_best to the heavy engine
    for duplicating native content); exactly one best flag whenever any
    engine yields."""
    for payload in (HTML, LAYOUT, "Short plain line here.\nAnd another."):
        _, metrics = extract_turn_ensemble(payload)
        contenders = [m for m in metrics
                      if not m["gated_out"] and m["n_blocks"]]
        assert sum(m["is_best"] for m in metrics) == (1 if contenders else 0)
        if contenders:
            best = max(contenders, key=lambda m: (m["n_chars_kept"],
                                                  m["mean_conf"],
                                                  m["engine"]))
            assert [m for m in metrics if m["is_best"]] == [best]
            assert all(m["n_chars_kept"] <= m["n_chars"] for m in metrics)


def test_empty_and_none_payloads():
    for payload in (None, "", "   \n  "):
        res, metrics = extract_turn_ensemble(payload)
        assert res.text_final == "" and metrics == []
        assert res.variant == "empty+ens0"


GOLDEN_ENSEMBLE = {
    # payload -> (variant, text_final) pinned; any change to ensemble
    # union/dedup semantics must be a conscious golden update
    "plain": (
        "First observation line noted today.\n"
        "Second line with more detail follows.\n\n"
        "Third paragraph stands alone here.",
        "plain+ens2",
        "First observation line noted today. Second line with more detail "
        "follows.\nThird paragraph stands alone here.",
    ),
}


def test_golden_ensemble_plain_paragraph_break():
    payload, variant, want = GOLDEN_ENSEMBLE["plain"]
    res, metrics = extract_turn_ensemble(payload)
    assert res.variant == variant
    assert res.text_final == want
    # determinism: a second run is bit-identical
    res2, _ = extract_turn_ensemble(payload)
    assert res2.text_final == res.text_final


def test_spark_ensemble_mode_matches_local_core(spark):
    """extract_transcripts(ensemble=True) distributes extract_turn_
    ensemble over Arrow batches; per-turn output must equal the local
    core on the same payloads (the parity invariant, ensemble form)."""
    from medical_ocr_pipeline_spark.pipeline import extract_transcripts
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    df = spark_transcripts(spark, 12, partitions=4)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text_final"], r["variant"])
        for r in extract_transcripts(df, ensemble=True).collect()
    }
    local = {
        (r["conv_id"], r["turn_idx"]):
            extract_turn_ensemble(r["text"])[0]
        for r in df.collect()
    }
    assert set(got) == set(local)
    for k, res in local.items():
        assert got[k] == (res.text_final, res.variant), k


def test_registry_query_shapes(spark):
    from medical_ocr_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["ensemble_engine_metrics"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    per_turn: dict = {}
    for r in rows:
        per_turn.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    for key, grp in per_turn.items():
        assert sum(r["is_best"] for r in grp) <= 1
        assert len({r["engine"] for r in grp}) == len(grp)
        assert all(r["variant"] == grp[0]["variant"] for r in grp)


MULTILINE_HTML = """<html><body>
<p>Patient presented with acute symptoms and was advised
bed rest for two weeks following the initial consultation.</p>
<div>Dosage was adjusted to 20mg twice daily after the follow-up visit showed improvement.</div>
</body></html>"""

MINIFIED_HTML = (
    "<html><body><p>Alpha paragraph content here one.</p>"
    "<p>Beta paragraph content here two.</p>"
    "<p>Gamma paragraph content here three.</p></body></html>"
)

PSEUDO_LAYOUT_PLAIN = (
    "First real sentence of the note goes here.\n"
    "20;90;400;120;0.8|Relaxed separator line content here\n"
    "Last sentence closes the note today."
)


def test_multiline_html_block_not_duplicated():
    """Round-3 review regression: a <p> spanning two payload lines must
    appear ONCE in the ensemble output — the html block spans its full
    source-line range and the containment dedup absorbs the heavy
    engine's per-line copies (anchoring only to the first line left
    lines 2..n spatially disjoint and duplicated the content)."""
    merged, _ = extract_turn_ensemble(MULTILINE_HTML)
    for probe in ("Patient presented with acute",
                  "bed rest for two weeks",
                  "Dosage was adjusted to 20mg"):
        assert merged.text_final.count(probe) == 1, probe


def test_minified_html_single_line_not_duplicated_and_ordered():
    """Minified one-line HTML: every DOM block anchors at line 0 and the
    heavy engine reads the whole document as one line — containment must
    collapse to exactly one copy of each paragraph, in document order."""
    merged, _ = extract_turn_ensemble(MINIFIED_HTML)
    text = merged.text_final
    for probe in ("Alpha paragraph", "Beta paragraph", "Gamma paragraph"):
        assert text.count(probe) == 1, probe
    assert text.index("Alpha") < text.index("Beta") < text.index("Gamma")


def test_plain_family_excludes_relaxed_engine():
    """Round-3 review regression: a plain-prose line that happens to
    match layout coordinate syntax must not be double-extracted (the
    relaxed layout engine is unhealthy for the plain/html families —
    it reads prose as geometry at undedupable real-bbox coordinates)."""
    engines, variant, _ = run_engines(PSEUDO_LAYOUT_PLAIN)
    assert variant == "plain"
    assert [n for n, _ in engines] == ["plain", "heavy"]
    merged, _ = extract_turn_ensemble(PSEUDO_LAYOUT_PLAIN)
    assert merged.text_final.count("Relaxed separator line content here") == 1


def test_containment_dedup_preserves_distinct_repeats():
    """The containment pass must NOT collapse a genuine repeat: the same
    phrase at two distinct document positions survives twice (the
    two-axis overlap guard), while a contained copy at the same
    position is dropped."""
    from medical_ocr_pipeline_spark.core.ensemble import _containment_mask

    blocks = [
        # long block spanning lines 0-1 (y 0..200 of a 1000-high page)
        {"text": "alpha beta gamma delta", "confidence": 0.95,
         "bbox": [0.0, 0.0, 612.0, 200.0], "source": "html"},
        # per-line copy inside the span -> contained, dropped
        {"text": "alpha beta", "confidence": 0.6,
         "bbox": [0.0, 0.0, 612.0, 100.0], "source": "heavy"},
        # same words far away -> genuine repeat, kept
        {"text": "alpha beta", "confidence": 0.6,
         "bbox": [0.0, 800.0, 612.0, 900.0], "source": "heavy"},
    ]
    assert _containment_mask(blocks) == [True, False, True]


def test_containment_drops_lower_confidence_superset():
    """Round-3 review #3: a low-confidence whole-line superset (the
    heavy engine's read of a minified page) must NOT displace the
    gated-in native blocks it merely concatenates — the lower-confidence
    side of a containment pair drops, whichever is longer."""
    from medical_ocr_pipeline_spark.core.ensemble import _containment_mask

    blocks = [
        {"text": "Alpha paragraph.", "confidence": 0.95,
         "bbox": [10.0, 0.0, 200.0, 100.0], "source": "html"},
        {"text": "Beta paragraph.", "confidence": 0.95,
         "bbox": [250.0, 0.0, 440.0, 100.0], "source": "html"},
        # whole-line tag-strip: contains both native blocks + junk
        {"text": "Alpha paragraph. var tracker=99; Beta paragraph.",
         "confidence": 0.6,
         "bbox": [0.0, 0.0, 612.0, 100.0], "source": "heavy"},
    ]
    assert _containment_mask(blocks) == [True, True, False]


def test_containment_entity_normalization():
    """Round-3 review #2: the DOM walk unescapes charrefs, the heavy
    tag-strip does not — containment must compare entity-normalized
    text or an '&amp;' paragraph dodges the substring test and ships
    twice."""
    from medical_ocr_pipeline_spark.core.ensemble import _containment_mask

    blocks = [
        {"text": "symptoms & fever persisted overnight",
         "confidence": 0.95, "bbox": [0.0, 0.0, 612.0, 100.0],
         "source": "html"},
        {"text": "symptoms &amp; fever persisted overnight",
         "confidence": 0.6, "bbox": [0.0, 0.0, 612.0, 100.0],
         "source": "heavy"},
    ]
    assert _containment_mask(blocks) == [True, False]


def test_layout_family_exempt_from_containment():
    """Round-3 review #1: real-geometry side-by-side cells in the same
    y-band with substring-related text ('patient name' | 'name') must
    BOTH survive — the layout family never enters the containment pass."""
    payload = (
        "10,100,200,150,0.9,tess|patient name\n"
        "300,100,500,150,0.9,tess|name\n"
        "10,200,500,250,0.9,tess|some other row content here\n"
    )
    merged, _ = extract_turn_ensemble(payload)
    assert "patient name" in merged.text_final
    # the standalone cell survives: 'name' once inside 'patient name'
    # plus once for the cell itself (containment would leave only 1)
    assert merged.text_final.count("name") == 2
