"""Unit tests for the pure per-turn core (no Spark)."""

from medical_ocr_pipeline_spark.core.dedup_blocks import deduplicate, fuzz_ratio
from medical_ocr_pipeline_spark.core.extract import extract_turn, section_of
from medical_ocr_pipeline_spark.core.geometry import (
    clamp_bbox,
    coerce_bbox,
    iou,
    norm_conf,
)
from medical_ocr_pipeline_spark.core.lineify import group_lines, regroup_lines
from medical_ocr_pipeline_spark.core.parse import (
    detect_variant,
    light_repair,
    parse_json_fenced,
    parse_layout,
    parse_payload,
    strip_fences,
)
from medical_ocr_pipeline_spark.core.textnorm import (
    apply_dictionary,
    apply_fuzzy,
    apply_rules,
    detect_lang_tag,
    digits_fingerprint,
    seq_sim,
    strip_markup,
    word_tokens,
)


def blk(text, conf, bbox, source="t"):
    return {"text": text, "confidence": conf, "bbox": bbox, "source": source}


class TestGeometry:
    def test_iou_identical(self):
        assert iou([0, 0, 10, 10], [0, 0, 10, 10]) > 0.999

    def test_iou_disjoint(self):
        assert iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0

    def test_iou_half(self):
        v = iou([0, 0, 10, 10], [0, 0, 10, 5])
        assert abs(v - 0.5) < 1e-6

    def test_coerce_variants(self):
        assert coerce_bbox([1, 2, 3, 4]) == [1.0, 2.0, 3.0, 4.0]
        assert coerce_bbox({"x0": 1, "y0": 2, "x1": 3, "y1": 4}) == [1, 2, 3, 4]
        assert coerce_bbox([[1, 2], [3, 2], [3, 4], [1, 4]]) == [1, 2, 3, 4]
        assert coerce_bbox([1, 2, 3, 2, 3, 4, 1, 4]) == [1, 2, 3, 4]
        assert coerce_bbox("garbage") == [0.0, 0.0, 1000.0, 1400.0]

    def test_clamp(self):
        assert clamp_bbox([-5, -5, 2000, 9999]) == [0.0, 0.0, 1000.0, 1400.0]
        assert clamp_bbox([10, 10, 5, 5]) == [10.0, 10.0, 10.0, 10.0]

    def test_norm_conf(self):
        assert norm_conf(95) == 0.95
        assert norm_conf(0.3) == 0.3
        assert norm_conf(-1) == 0.0
        assert norm_conf("bad") == 0.5
        assert norm_conf(None) == 0.5


class TestTextNorm:
    def test_rules(self):
        assert apply_rules("a • b – c × d   e") == "a . b - c x d e"

    def test_strip_markup(self):
        assert strip_markup("a<br>b <div>c</div>") == "a b c"

    def test_dictionary_case_aware(self):
        t, n = apply_dictionary("Necrosls and TOABECULAS seen")
        assert t == "Necrosis and TRABECULAE seen"
        assert n == 2

    def test_fuzzy(self):
        t, n = apply_fuzzy("the diagnosi was made")
        assert t == "the diagnosis was made"
        assert n == 1

    def test_fuzzy_do_not_touch_short(self):
        t, n = apply_fuzzy("dose 50 mg bid")
        assert t == "dose 50 mg bid"
        assert n == 0

    def test_digits_survive_cleanup(self):
        src = "take 500 mg 2x daily necrosls"
        t, _ = apply_dictionary(src)
        t, _ = apply_fuzzy(t)
        assert digits_fingerprint(t) == digits_fingerprint(src)

    def test_seq_sim(self):
        assert seq_sim("abc", "abc") == 1.0
        assert seq_sim("abc  d", "abc d") == 1.0

    def test_lang(self):
        assert detect_lang_tag("hello") == "en"
        assert detect_lang_tag("नमस्ते") == "hi"
        assert detect_lang_tag("తెలుగు") == "te"

    def test_word_tokens(self):
        assert word_tokens("A b-c, D2!") == ["a", "b", "c", "d2"]


class TestLineify:
    def test_group_lines_joins_same_y(self):
        blocks = [
            blk("world", 0.8, [50, 10, 90, 22]),
            blk("hello", 0.9, [10, 12, 45, 24]),
        ]
        lines = group_lines(blocks)
        assert len(lines) == 1
        assert lines[0]["text"] == "hello world"
        assert abs(lines[0]["confidence"] - 0.85) < 1e-9
        assert lines[0]["bbox"] == [10, 10, 90, 24]

    def test_line_break_on_gap(self):
        blocks = [
            blk("a", 0.9, [0, 0, 10, 10]),
            blk("b", 0.9, [0, 30, 10, 40]),
        ]
        assert len(group_lines(blocks)) == 2

    def test_paragraph_join(self):
        paras = regroup_lines([
            blk("l1", 0.9, [0, 0, 100, 14], "s1"),
            blk("l2", 0.9, [0, 34, 100, 48], "s2"),   # gap 34-14=20 <= 26
            blk("l3", 0.9, [0, 100, 100, 114], "s1"),  # gap > 26 -> new para
        ])
        assert len(paras) == 2
        assert paras[0]["text"] == "l1 l2"
        assert paras[0]["source"] == "s1+s2"


class TestDedup:
    def test_near_dup_removed(self):
        kept = deduplicate([
            blk("hello world foo", 0.9, [0, 0, 100, 20]),
            blk("hello world foo", 0.8, [1, 1, 101, 21]),
        ])
        assert len(kept) == 1
        assert kept[0]["confidence"] == 0.9

    def test_disjoint_kept(self):
        kept = deduplicate([
            blk("hello world", 0.9, [0, 0, 100, 20]),
            blk("hello world", 0.8, [0, 500, 100, 520]),
        ])
        assert len(kept) == 2

    def test_different_text_kept(self):
        kept = deduplicate([
            blk("completely different words here", 0.9, [0, 0, 100, 20]),
            blk("unrelated sentence content now", 0.8, [1, 1, 101, 21]),
        ])
        assert len(kept) == 2

    def test_output_reading_order(self):
        kept = deduplicate([
            blk("low", 0.7, [0, 100, 10, 110]),
            blk("top", 0.9, [0, 0, 10, 10]),
        ])
        assert [k["text"] for k in kept] == ["top", "low"]

    def test_fuzz_ratio(self):
        assert fuzz_ratio("abc", "abc") == 1.0


class TestParse:
    def test_detect(self):
        assert detect_variant("<html><body>x</body></html>") == "html"
        assert detect_variant("```json\n{}\n```") == "json"
        assert detect_variant('{"a": 1}') == "json"
        assert detect_variant("1,2,3,4,0.9,src|text here") == "layout"
        assert detect_variant("just some words") == "plain"

    def test_layout(self):
        blocks, fails = parse_layout("10,20,30,40,0.9,eng|hello\nbadline")
        assert fails == 1
        assert blocks[0]["bbox"] == [10, 20, 30, 40]
        assert blocks[0]["text"] == "hello"

    def test_layout_percent_conf(self):
        blocks, _ = parse_layout("10,20,30,40,90,eng|hello")
        assert blocks[0]["confidence"] == 0.9

    def test_fences(self):
        assert strip_fences("```json\n{\"a\":1}\n```") == '{"a":1}'
        assert light_repair('noise {"a":1,}') == '{"a":1}'

    def test_json_fenced(self):
        blocks, fails = parse_json_fenced('```json\n{"a": "hi", "b": ["x","y"],}\n```')
        assert fails == 0
        assert [b["text"] for b in blocks] == ["hi", "x", "y"]

    def test_json_broken_counts_failure(self):
        _, fails = parse_json_fenced("```json\n{this is not json\n```")
        assert fails == 1

    def test_html_boilerplate_stripped(self):
        html = (
            "<html><head><style>.x{}</style></head><body>"
            '<nav><a href="/1">l1</a><a href="/2">l2</a></nav>'
            "<div><p>real content sentence here</p></div>"
            "<footer>junk footer</footer></body></html>"
        )
        blocks, variant, fails = parse_payload(html)
        texts = " ".join(b["text"] for b in blocks)
        assert "real content sentence here" in texts
        assert "l1" not in texts            # nav subtree dropped
        assert "junk footer" not in texts   # footer subtree dropped
        assert ".x{}" not in texts          # style dropped

    def test_html_link_density_gate(self):
        html = (
            "<html><body><div><a href='/a'>only links</a> <a href='/b'>in this</a>"
            "</div><p>genuine paragraph of real text</p></body></html>"
        )
        blocks, _, _ = parse_payload(html)
        texts = [b["text"] for b in blocks]
        assert any("genuine paragraph" in t for t in texts)
        assert not any("only links" in t for t in texts)


class TestExtract:
    def test_section_of(self):
        assert section_of([0, 0, 10, 10]) == "header"
        assert section_of([0, 1390, 10, 1399]) == "footer"
        assert section_of([0, 700, 10, 710]) == "body"

    def test_confidence_gate(self):
        payload = "10,20,500,40,0.9,a|kept text here\n10,60,500,80,0.3,a|dropped low conf"
        r = extract_turn(payload)
        assert "kept text here" in r.text_final
        assert "dropped" not in r.text_final

    def test_empty_payload(self):
        r = extract_turn("")
        assert r.text_final == ""
        assert r.n_blocks == 0

    def test_none_payload(self):
        r = extract_turn(None)
        assert r.text_final == ""

    def test_deterministic(self):
        payload = "10,20,500,40,0.9,a|some text with necrosls"
        assert extract_turn(payload) == extract_turn(payload)

    def test_bytes_stripped_positive_for_html(self):
        html = "<html><body><nav>x y z</nav><p>short</p></body></html>"
        r = extract_turn(html)
        assert r.bytes_stripped > 0


class TestEngineEnvelope:
    def test_harvest_envelope_blocks(self):
        payload = (
            '{"engine": "tess", "blocks": ['
            '{"text": "hello world", "confidence": 92, "bbox": [10, 20, 200, 38]},'
            '{"text": "poly block", "confidence": 0.88,'
            ' "bbox": [[10, 60], [200, 60], [200, 78], [10, 78]]},'
            '{"text": "dict block", "confidence": 0.9,'
            ' "bbox": {"x0": 10, "y0": 100, "x1": 200, "y1": 118}}], "meta": {}}'
        )
        blocks, variant, fails = parse_payload(payload)
        assert variant == "json" and fails == 0
        assert [b["text"] for b in blocks] == ["hello world", "poly block",
                                               "dict block"]
        assert blocks[0]["confidence"] == 0.92      # percent normalized
        assert blocks[1]["bbox"] == [10, 60, 200, 78]   # polygon coerced
        assert blocks[2]["bbox"] == [10, 100, 200, 118]  # dict coerced
        assert all(b["source"] == "tess" for b in blocks)

    def test_wrapper_key_unwrapped(self):
        payload = (
            '{"result": {"lines": [{"text": "inner", "conf": 0.7,'
            ' "bbox": [0, 0, 50, 10]}]}}'
        )
        blocks, _, _ = parse_payload(payload)
        assert [b["text"] for b in blocks] == ["inner"]
        assert blocks[0]["confidence"] == 0.7

    def test_plain_json_still_leaves(self):
        blocks, _, fails = parse_payload('{"a": "scalar text", "b": ["x"]}')
        assert [b["text"] for b in blocks] == ["scalar text", "x"]
        assert fails == 0
