"""Unit tests for 01b normalization (A3/P6/A8/P11), 02a segmentation
(W4/F12/F13), and 03 selection (P9/F7/F8)."""

from medical_ocr_pipeline_spark.core.normalize import (
    adaptive_bands,
    detect_handwriting,
    maybe_two_columns,
    merge_rows,
    normalize_turn,
    should_force_new_row,
)
from medical_ocr_pipeline_spark.core.segment import is_heading, segment_turn
from medical_ocr_pipeline_spark.core.select import (
    choose_text,
    digits_pattern,
    select_final,
    should_cleanup,
)


def blk(text, bbox, conf=0.9, source="native"):
    return {"text": text, "confidence": conf, "bbox": list(bbox), "source": source}


class TestNormalize:
    def test_merge_rows_same_baseline(self):
        rows = merge_rows(
            [blk("hello", [0, 10, 40, 22]), blk("world", [45, 11, 90, 23])],
            tol_y_px=6, tol_x_px=10,
        )
        assert len(rows) == 1
        assert rows[0]["texts"] == ["hello", "world"]

    def test_merge_rows_bullet_guard(self):
        rows = merge_rows(
            [blk("intro text", [0, 10, 40, 22]), blk("- item one", [45, 11, 90, 23])],
            tol_y_px=6, tol_x_px=10,
        )
        assert len(rows) == 2

    def test_force_new_row(self):
        assert should_force_new_row("ends here.", "next")
        assert should_force_new_row("x", "- bullet item")
        assert should_force_new_row("x", "1) numbered")
        assert not should_force_new_row("plain", "continuation")

    def test_two_columns_detected(self):
        rows = []
        for i in range(6):
            rows.append({"bbox": [50, 30 * i, 250, 30 * i + 20]})
            rows.append({"bbox": [600, 30 * i, 800, 30 * i + 20]})
        groups = maybe_two_columns(rows, page_w=1000.0)
        assert len(groups) == 2
        assert all(r["bbox"][0] == 50 for r in groups[0])
        assert all(r["bbox"][0] == 600 for r in groups[1])

    def test_two_columns_rejected_when_close(self):
        rows = [{"bbox": [100 + i, 30 * i, 300 + i, 30 * i + 20]} for i in range(10)]
        assert len(maybe_two_columns(rows, page_w=1000.0)) == 1

    def test_handwriting_flags(self):
        tall = [blk("x", [0, 0, 10, 40])] * 5  # med height 40 > 22
        assert detect_handwriting(tall)
        ocr_only = [blk("x", [0, 0, 10, 12], source="ocr_a")] * 5
        assert detect_handwriting(ocr_only)  # native ratio 0 < 0.35
        native = [blk("x", [0, i * 20, 10, i * 20 + 12]) for i in range(5)]
        assert not detect_handwriting(native)

    def test_adaptive_bands(self):
        assert adaptive_bands(1400.0, False) == (140.0, 112.0)
        h, f = adaptive_bands(1400.0, True)
        assert h == 70.0 and f == 60.0

    def test_normalize_tags_header_footer(self):
        blocks = [
            blk("top banner", [0, 0, 100, 20]),
            blk("body text here", [0, 700, 100, 714]),
            blk("page 3", [0, 1390, 100, 1399]),
        ]
        out, stats = normalize_turn(blocks)
        assert stats["tag_header"] == 1
        assert stats["tag_footer"] == 1
        assert stats["mode"] == "1col"
        assert len(out) == 3


class TestSegment:
    def test_is_heading(self):
        assert is_heading("IMPRESSION: normal")
        assert is_heading("Diagnosis - flu")
        assert is_heading("CLINICAL SUMMARY")
        assert not is_heading("a normal sentence of text")
        assert not is_heading("ab")

    def test_segment_on_heading_and_gap(self):
        blocks = [
            blk("DIAGNOSIS", [0, 10, 100, 24]),
            blk("first finding", [0, 30, 100, 44]),
            blk("far away para", [0, 300, 100, 314]),
        ]
        segs = segment_turn(blocks)
        assert len(segs) == 2
        assert segs[0]["title"] == "DIAGNOSIS"
        assert segs[0]["text"] == "DIAGNOSIS first finding"
        assert segs[1]["title"] is None

    def test_bullet_soft_join(self):
        blocks = [
            blk("list intro", [0, 10, 100, 24]),
            blk("- item a", [0, 26, 100, 40]),
        ]
        segs = segment_turn(blocks)
        assert segs[0]["text"] == "list intro\n- item a"


class TestSelect:
    def test_should_cleanup(self):
        assert should_cleanup("weird @@ tokens")
        assert should_cleanup("l1I1l pattern ...")
        assert should_cleanup("short label")
        assert not should_cleanup("A full proper sentence that is long enough.")
        assert not should_cleanup("")

    def test_digits(self):
        assert digits_pattern("500 mg 2.5x") == ["500", "2.5"]

    def test_choose_text_reference_parity(self):
        # the reference's max() always keeps orig (base scores sim=1.0)
        assert choose_text("dose 500 mg", "dose 600 mg")[0] == "orig"
        assert choose_text("abc nolse", "abc noise")[0] == "orig"

    def test_select_final_keeps_digits(self):
        label, _ = select_final("dose 500 mg", "dose 600 mg")
        assert label == "orig"          # cleaned mangled the number
        label, text = select_final("dose 500 mg nolse", "dose 500 mg noise")
        assert label == "02a" and text == "dose 500 mg noise"

    def test_select_final_rejects_truncation(self):
        orig = "a sentence with many words " * 4
        assert select_final(orig, "a sentence")[0] == "orig"
